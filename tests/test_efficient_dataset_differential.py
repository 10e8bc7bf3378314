"""Differential: our paper-2 training dataset vs the reference's
`src/efficient_kws/dataset.py` MLSKWSDataset run VERBATIM (torchvision/
torchaudio/whisper shims; the embeddings path under test is untouched
torch code).

Both sides read the SAME reference-format fixture (torch-pickled `.bin`
stacks; utterance codes must match the reference's `\\d+_\\d+_\\d+` audio-
path regex, dataset.py:376) and every index is compared: label / ghost
mask / domain / idx plus the returned raw features and masks, for both
`pad_long_before_resize` settings.  This pins the pad-vs-truncate branch
pair (dataset.py:511-568 — with padding off, masks keep the PER-ITEM
truncated length), the trailing `[-n_layers:]` channel slice
(dataset.py:570-573), the ghost stand-in shape inference from the first
non-ghost keyword of the first sorted language (dataset.py:329-346), and
the same accumulated-offset arithmetic as paper 1.
"""

import os

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.efficient_kws.data import EfficientMLSKWSDataset
from ref_shims import (
    load_reference_package_module,
    restore_modules,
    torchaudio_shim,
    torchvision_shim,
    whisper_audio_shim,
)

N_CHANNELS, DIM = 3, 6


@pytest.fixture(scope="module")
def ref_mod():
    shims = {**torchvision_shim(), **torchaudio_shim(), **whisper_audio_shim()}
    mod, saved = load_reference_package_module("efficient_kws.dataset", shims)
    yield mod
    restore_modules(saved)


def _save_bin(path, arr):
    with open(path, "wb") as f:
        torch.save(torch.from_numpy(np.ascontiguousarray(arr)), f)


@pytest.fixture(scope="module")
def mls_root(tmp_path_factory):
    """Reference-format paper-2 MLS tree.  Keyword/utterance lengths
    straddle the features_size caps so both the pad and truncate branches
    fire."""
    root = tmp_path_factory.mktemp("mls_p2")
    rng = np.random.default_rng(5)
    spec = {"English": (4, 3, {1}), "German": (4, 2, set())}
    for lang, (n_kw, n_utts, ghosts) in spec.items():
        sub = os.path.join(str(root), f"mls_{lang.lower()}_opus", "train")
        os.makedirs(os.path.join(sub, "hs"))
        keywords = [f"{lang[:2].lower()}kw{i}" for i in range(n_kw)]
        with open(os.path.join(sub, "keywords.txt"), "w") as f:
            f.write("\n".join(keywords) + "\n")
        for kw_type in ("tts", "natural"):
            d = os.path.join(sub, "keywords-hs", kw_type)
            os.makedirs(d)
            for i in range(n_kw):
                if i in ghosts:
                    continue
                t = int(rng.integers(3, 14))  # straddles the T_k cap of 8
                _save_bin(os.path.join(d, f"{i}.bin"),
                          rng.standard_normal((N_CHANNELS, t, DIM)).astype(np.float32))
        lines = []
        kw_rev = sorted(keywords, key=lambda x: x[::-1])
        for u in range(n_utts):
            code = f"{1000 + u}_{2000 + u}_{u:06d}"  # must match \d+_\d+_\d+
            t = int(rng.integers(6, 22))  # straddles the T_u cap of 14
            _save_bin(os.path.join(sub, "hs", code + ".bin"),
                      rng.standard_normal((N_CHANNELS, t, DIM)).astype(np.float32))
            pos = sorted(rng.choice(n_kw, size=2, replace=False).tolist())
            parts = [code]
            for p in pos:
                parts += [keywords[p], str(p), str(kw_rev.index(keywords[p]))]
            lines.append("\t".join(parts))
        with open(os.path.join(sub, "positives.tsv"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return str(root)


@pytest.mark.parametrize("pad_long", [True, False])
@pytest.mark.parametrize("kw_type", ["tts", "natural"])
def test_mls_items_match_reference(ref_mod, mls_root, kw_type, pad_long):
    langs = ["German", "English"]
    fs, n_layers = (8, 14), 2

    ref = ref_mod.MLSKWSDataset(
        mls_root, languages=langs, kw_type=kw_type, size=fs,
        pad_long_before_resize=pad_long, n_layers=n_layers,
    )
    ours = EfficientMLSKWSDataset(
        mls_root, languages=langs, kw_type=kw_type, features_size=fs,
        pad_long_before_resize=pad_long, n_layers=n_layers,
    )

    assert len(ours) == len(ref)
    assert ours.n_keywords == ref.n_keywords
    assert ours.ghost_keyword_indices == ref.ghost_keyword_indices
    assert (ours.n_channels, ours.hidden_dim) == (ref.n_channels, ref.hidden_dim)

    for idx in range(len(ref)):
        want = ref[idx]
        got = ours[idx]
        for k in ("label", "mask", "domain", "idx"):
            assert got[k] == int(want[k]), f"{k}@{idx}"
        for k in ("utt_features", "kwd_features", "utt_mask", "kwd_mask"):
            np.testing.assert_array_equal(
                np.asarray(got[k]), want[k].numpy(), err_msg=f"{k}@{idx}")
