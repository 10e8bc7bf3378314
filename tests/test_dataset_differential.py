"""Differential: our KWS training datasets vs the reference's, run VERBATIM
(`src/data/dataset.py` loaded with only its unavailable imports stubbed —
torchvision/torchaudio/whisper are untouched by the embedding-based KWS
dataset paths).

Both sides read the SAME on-disk fixture in the reference's native format
(torch-pickled `.bin` hidden-state stacks, keywords.txt, positives.tsv) and
every index of the dataset is compared: label, ghost mask, domain id, and
the similarity features. This pins the intricate index arithmetic the
reference implements inline — Aishell's idx → (utterance, keyword) split
(dataset.py:73-105) and MLS's accumulated per-language offsets with
cross-language negatives (dataset.py:163-200) — plus ghost detection via
zfilled file existence and reverse-lexicographic keyword order.
"""

import os

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.data import AishellKWSDataset, MLSKWSDataset
from ref_shims import (
    load_reference_module,
    restore_modules,
    torchaudio_shim,
    torchvision_shim,
    whisper_audio_shim,
)

N_LAYERS, DIM = 2, 6


@pytest.fixture(scope="module")
def ref_dataset_mod():
    shims = {**torchvision_shim(), **torchaudio_shim(), **whisper_audio_shim()}
    mod, saved = load_reference_module("data/dataset.py", "ref_dataset", shims)
    yield mod
    restore_modules(saved)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _save_bin(path, arr):
    with open(path, "wb") as f:
        torch.save(torch.from_numpy(np.ascontiguousarray(arr)), f)


def _make_kws_tree(root, rng, keywords, ghosts, n_utts, utt_prefix):
    """Reference-format subtree: keywords.txt, positives.tsv, hs/*.bin,
    keywords-hs/{tts,natural}/<zfilled>.bin (ghosts omitted)."""
    os.makedirs(os.path.join(root, "hs"), exist_ok=True)
    with open(os.path.join(root, "keywords.txt"), "w") as f:
        f.write("\n".join(keywords) + "\n")
    zfill = len(str(len(keywords) - 1))
    for kw_type in ("tts", "natural"):
        d = os.path.join(root, "keywords-hs", kw_type)
        os.makedirs(d, exist_ok=True)
        for i in range(len(keywords)):
            if i in ghosts:
                continue
            t = int(rng.integers(2, 6))
            _save_bin(os.path.join(d, str(i).zfill(zfill) + ".bin"),
                      _norm(rng.standard_normal((N_LAYERS, t, DIM)).astype(np.float32)))
    kw_rev = sorted(keywords, key=lambda x: x[::-1])
    lines = []
    for u in range(n_utts):
        code = f"{utt_prefix}{u:03d}"
        t = int(rng.integers(8, 16))
        _save_bin(os.path.join(root, "hs", code + ".bin"),
                  _norm(rng.standard_normal((N_LAYERS, t, DIM)).astype(np.float32)))
        pos = sorted(rng.choice(len(keywords), size=min(2, len(keywords)),
                                replace=False).tolist())
        parts = [code]
        for p in pos:
            parts += [keywords[p], str(p), str(kw_rev.index(keywords[p]))]
        lines.append("\t".join(parts))
    with open(os.path.join(root, "positives.tsv"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _compare_all_items(ours, ref):
    assert len(ours) == len(ref)
    for idx in range(len(ref)):
        want = ref[idx]
        got = ours[idx]
        assert got["label"] == int(want["label"]), f"label@{idx}"
        assert got["mask"] == int(want["mask"]), f"mask@{idx}"
        assert got["domain"] == int(want["domain"]), f"domain@{idx}"
        np.testing.assert_allclose(
            got["features"], want["features"].numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"features@{idx}")


@pytest.mark.parametrize("kw_type", ["tts", "natural"])
def test_aishell_dataset_matches_reference(ref_dataset_mod, tmp_path, kw_type):
    rng = np.random.default_rng(0)
    # 12 keywords => zfill 2; names chosen so reverse-lex != lex order
    keywords = [f"kw{i:02d}{'abcdefghijkl'[11 - i]}" for i in range(12)]
    _make_kws_tree(str(tmp_path / "kws"), rng, keywords, ghosts={4, 7},
                   n_utts=3, utt_prefix="UTT")

    ref = ref_dataset_mod.AishellKWSDataset(str(tmp_path), kw_type=kw_type)
    ours = AishellKWSDataset(str(tmp_path), kw_type=kw_type)

    assert ours.ghost_keyword_indices == ref.ghost_keyword_indices
    assert ours.keywords == ref.keywords
    assert ours.keywords_reverse == ref.keywords_reverse
    assert ours.kw_zfill == ref.kw_zfill
    _compare_all_items(ours, ref)


# Two regimes where the reference is well-defined:
#   * UNSORTED languages + EQUAL per-language keyword counts — the shipped
#     shape (the default language list is unsorted: German before French;
#     every language has the same keyword count).  Exercises the
#     caller-order keywords dict vs sorted self.languages split.
#   * sorted languages + UNEQUAL counts — exercises the accumulated-offset
#     arithmetic and per-language zfill/ghosts.
# Unsorted + unequal CRASHES the reference (the caller-order n_keywords
# buckets map to the wrong sorted language, ghost detection misses, and a
# nonexistent keyword file is opened — dataset.py:189); replicated verbatim,
# documented in the MLSKWSDataset.__init__ comment.
MLS_CASES = {
    "unsorted-equal": (["German", "English", "Spanish"],
                       {"English": (4, 2, {1}), "German": (4, 4, set()),
                        "Spanish": (4, 3, {0, 3})}),
    "sorted-unequal": (["English", "German", "Spanish"],
                       {"English": (5, 2, {1}), "German": (3, 4, set()),
                        "Spanish": (11, 3, {0, 10})}),
}


@pytest.mark.parametrize("case", list(MLS_CASES))
@pytest.mark.parametrize("kw_type", ["tts", "natural"])
def test_mls_dataset_matches_reference(ref_dataset_mod, tmp_path, kw_type, case):
    rng = np.random.default_rng(1)
    langs, spec = MLS_CASES[case]
    for lang, (n_kw, n_utts, ghosts) in spec.items():
        sub = tmp_path / f"mls_{lang.lower()}_opus" / "train"
        keywords = [f"{lang[:2].lower()}{i:02d}" for i in range(n_kw)]
        _make_kws_tree(str(sub), rng, keywords, ghosts=ghosts,
                       n_utts=n_utts, utt_prefix=lang[:2].upper())

    ref = ref_dataset_mod.MLSKWSDataset(str(tmp_path), languages=langs,
                                        kw_type=kw_type)
    ours = MLSKWSDataset(str(tmp_path), languages=langs, kw_type=kw_type)

    assert ours.languages == ref.languages
    assert ours.n_keywords == ref.n_keywords
    assert ours.ghost_keyword_indices == ref.ghost_keyword_indices
    assert ours.kw_zfill == ref.kw_zfill
    assert [m["offset_idx"] for m in ours.metadata] == [
        m["offset_idx"] for m in ref.metadata]
    _compare_all_items(ours, ref)
