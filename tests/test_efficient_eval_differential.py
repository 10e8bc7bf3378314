"""Differential: our paper-2 `MLSEvaluationDataset` vs the reference's
(`src/efficient_kws/dataset.py:609-1156`) run VERBATIM over the same
reference-format fixture.

Covers both `pad_long_before_resize` settings and BOTH metadata roots —
the regular dev split and the `is_expanded()` mode, where uttid/
transcripts/positives/hs are read from `root_audios_transcripts` while the
keyword database stays under the split folder (dataset.py:821-826).
Compared per item: grouped hotword labels vs flat, ghost masks, the
pre-padded/truncated keyword stacks + masks (`[-n_layers:]` slice), and
the utterance stack + mask (the same pad-vs-truncate branch pair as the
training dataset, but against the size[1] utterance cap)."""

import os

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.efficient_kws.data import MLSEvaluationDataset
from ref_shims import (
    load_reference_package_module,
    restore_modules,
    torchaudio_shim,
    torchvision_shim,
    whisper_audio_shim,
)

N_CH, DIM = 3, 6
SIZE = (32, 64)  # the eval dataset asserts each edge >= 32
LANG = "English"


@pytest.fixture(scope="module")
def ref_mod():
    shims = {**torchvision_shim(), **torchaudio_shim(), **whisper_audio_shim()}
    mod, saved = load_reference_package_module("efficient_kws.dataset", shims)
    yield mod
    restore_modules(saved)


def _save_bin(path, arr):
    with open(path, "wb") as f:
        torch.save(torch.from_numpy(np.ascontiguousarray(arr)), f)


def _write_eval_meta(base, rng, keywords, n_utts, tag=""):
    """uttid + transcripts.txt + positives.tsv + hs/ under `base`."""
    os.makedirs(os.path.join(base, "hs"), exist_ok=True)
    codes, tlines, plines = [], [], []
    for u in range(n_utts):
        code = f"{100 + u}_{200 + u}_{u:06d}"
        codes.append(code)
        t = int(rng.integers(20, 100))  # straddles the size[1]=64 cap
        _save_bin(os.path.join(base, "hs", code + ".bin"),
                  rng.standard_normal((N_CH, t, DIM)).astype(np.float32))
        kw = keywords[u % len(keywords)]
        transcript = f"{tag}the {kw} appears"
        tlines.append(f"{code}\t{transcript}")
        start = transcript.index(kw)
        plines.append("\t".join([code, kw, str(start), str(start + len(kw))]))
    with open(os.path.join(base, "uttid"), "w") as f:
        f.write("\n".join(codes) + "\n")
    with open(os.path.join(base, "transcripts.txt"), "w") as f:
        f.write("\n".join(tlines) + "\n")
    with open(os.path.join(base, "positives.tsv"), "w") as f:
        f.write("\n".join(plines) + "\n")


def _make_root(root, rng, kw_lo, kw_hi):
    """MLS dev tree; keyword lengths drawn from [kw_lo, kw_hi)."""
    keywords = [f"enkw{i}" for i in range(5)]
    dev = os.path.join(str(root), f"mls_{LANG.lower()}_opus", "dev")
    os.makedirs(dev)
    with open(os.path.join(dev, "keywords.txt"), "w") as f:
        f.write("\n".join(keywords) + "\n")
    d = os.path.join(dev, "keywords-hs", "natural")
    os.makedirs(d)
    for i in range(len(keywords)):
        if i == 3:  # ghost
            continue
        t = int(rng.integers(kw_lo, kw_hi))
        _save_bin(os.path.join(d, f"{i}.bin"),
                  rng.standard_normal((N_CH, t, DIM)).astype(np.float32))
    _write_eval_meta(dev, rng, keywords, n_utts=4)


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    """Three trees: ragged keyword lengths (pad=True — straddle size[0]),
    uniform-truncation lengths (pad=False — all >= size[0]; ragged groups
    crash the REFERENCE's own eval at torch.stack, model.py:314-317), and
    an expanded metadata root."""
    ragged = tmp_path_factory.mktemp("mls_eval_ragged")
    uniform = tmp_path_factory.mktemp("mls_eval_uniform")
    expanded = tmp_path_factory.mktemp("mls_eval_expanded")
    rng = np.random.default_rng(9)
    _make_root(ragged, rng, 8, 48)    # straddles the size[0]=32 cap
    _make_root(uniform, rng, 33, 48)  # every keyword truncates to size[0]
    keywords = [f"enkw{i}" for i in range(5)]
    dev_x = os.path.join(str(expanded), f"mls_{LANG.lower()}_opus", "dev")
    os.makedirs(dev_x)
    _write_eval_meta(dev_x, rng, keywords, n_utts=6, tag="expanded ")
    return str(ragged), str(uniform), str(expanded)


@pytest.mark.parametrize("expanded", [False, True])
@pytest.mark.parametrize("pad_long", [True, False])
def test_mls_eval_items_match_reference(ref_mod, roots, pad_long, expanded):
    ragged_root, uniform_root, expanded_root = roots
    root = ragged_root if pad_long else uniform_root
    kwargs = dict(
        language=LANG.lower(), split="dev", kw_type="natural", size=SIZE,
        keywords_per_group=2, n_layers=2, pad_long_before_resize=pad_long,
        root_audios_transcripts=expanded_root if expanded else "",
    )
    ref = ref_mod.MLSEvaluationDataset(root=root, **kwargs)
    ours = MLSEvaluationDataset(root=root, **kwargs)

    assert ours.is_expanded() == ref.is_expanded() == expanded
    assert len(ours) == len(ref) == (6 if expanded else 4)
    assert ours.keywords == ref.keywords

    for idx in range(len(ref)):
        got, want = ours[idx], ref[idx]

        np.testing.assert_array_equal(
            np.asarray(got["hotword_labels"]),
            np.concatenate([t.numpy() for t in want["hotword_labels"]]),
        )
        np.testing.assert_array_equal(
            np.asarray(got["hotword_mask"]),
            np.concatenate([t.numpy() for t in want["hotword_mask"]]).astype(
                got["hotword_mask"].dtype
            ),
        )
        np.testing.assert_array_equal(
            np.asarray(got["utt"]), want["utt"].numpy(), err_msg=f"utt@{idx}"
        )
        np.testing.assert_array_equal(
            np.asarray(got["utt_mask"]), want["utt_mask"].numpy(),
            err_msg=f"utt_mask@{idx}",
        )
        # the reference keeps mentions/transcript in self.dataset, not the
        # item (dataset.py:913-916); ours carries them through (superset)
        assert got["keywords"] == ref.dataset[idx]["keywords"]
        assert got["transcript"] == ref.dataset[idx]["transcript"]

        # grouped keyword stacks: ref kwd/kwd_mask are lists of per-keyword
        # tensors per group; ours are pre-stacked arrays per group
        assert len(got["groups"]) == len(want["kwd"])
        for gi, group in enumerate(got["groups"]):
            np.testing.assert_array_equal(
                group["kwd"],
                np.stack([t.numpy() for t in want["kwd"][gi]]),
                err_msg=f"kwd@{idx}/{gi}",
            )
            np.testing.assert_array_equal(
                group["kwd_mask"],
                np.stack([t.numpy() for t in want["kwd_mask"][gi]]),
                err_msg=f"kwd_mask@{idx}/{gi}",
            )


def test_ragged_truncation_raises_diagnostic(ref_mod, roots):
    """pad_long_before_resize=False over ragged keyword lengths is not a
    supported configuration in EITHER implementation — the reference
    crashes later at `torch.stack(batch['kwd'][i])` in validation_step
    (efficient_kws/model.py:314-317); we refuse at construction with a
    diagnosis (efficient_kws/data.py:_build_groups)."""
    ragged_root, _, _ = roots
    with pytest.raises(ValueError, match="ragged keyword lengths"):
        MLSEvaluationDataset(
            root=ragged_root, language=LANG.lower(), split="dev",
            kw_type="natural", size=SIZE, keywords_per_group=2, n_layers=2,
            pad_long_before_resize=False,
        )
    # the reference DATASET constructs fine — its failure surfaces only at
    # the model's torch.stack over the ragged group
    ref = ref_mod.MLSEvaluationDataset(
        root=ragged_root, language=LANG.lower(), split="dev",
        kw_type="natural", size=SIZE, keywords_per_group=2, n_layers=2,
        pad_long_before_resize=False,
    )
    with pytest.raises(RuntimeError):
        torch.stack(ref[0]["kwd"][0])
