"""Differential: our grouped-keyword EVAL datasets vs the reference's
`AishellHotwordDataset` (dataset.py:203-344) and `ACL6060KeywordDataset`
(dataset.py:347-495) run VERBATIM over the same reference-format `.bin`
fixture.

Every index is compared across both grouping modes and both resize modes
(fixed `size` and the short-edge `max_length` branch): transcripts,
substring labels vs tagged-mention labels, ghost masks, speakers (XML for
ACL, the `BAC...S(\\d{4})` regex for aishell), and the per-group RESIZED
similarity matrices — the reference computes them per item with torch
matmul + torchvision resize, ours via `item_features` (the reference-parity
path over the `KeywordCatalog`; production scoring is the batched on-device
catalog, pinned against item_features in test_catalog.py)."""

import os

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.data.datasets import (
    ACL6060KeywordDataset,
    AishellHotwordDataset,
)
from fixtures import make_acl, make_aishell_hotword
from ref_shims import (
    load_reference_module,
    restore_modules,
    torchaudio_shim,
    torchvision_shim,
    whisper_audio_shim,
)


@pytest.fixture(scope="module")
def ref_mod():
    shims = {**torchvision_shim(), **torchaudio_shim(), **whisper_audio_shim()}
    mod, saved = load_reference_module("data/dataset.py", "ref_eval_dataset", shims)
    yield mod
    restore_modules(saved)


@pytest.fixture(scope="module")
def aishell_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("aishell_bin")
    make_aishell_hotword(str(root), n_hotwords=5, n_utts=4, ghost=(3,), fmt="bin")
    return str(root)


@pytest.fixture(scope="module")
def acl_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("acl_bin")
    make_acl(str(root), n_keywords=4, n_utts=3, ghost=(2,), split="dev", fmt="bin")
    make_acl(str(root), n_keywords=4, n_utts=3, ghost=(2,), split="eval", fmt="bin")
    return str(root)


def _compare_grouped_item(ours, ref, idx, group, n_keywords):
    got = ours[idx]
    want = ref[idx]

    assert got["transcript"] == want["transcript"]

    want_labels = np.concatenate([t.numpy() for t in want["hotword_labels"]])
    np.testing.assert_array_equal(np.asarray(got["hotword_labels"]), want_labels)

    want_mask = np.concatenate([t.numpy() for t in want["hotword_mask"]])
    np.testing.assert_array_equal(
        np.asarray(got["hotword_mask"]), want_mask.astype(got["hotword_mask"].dtype)
    )

    n_groups = (n_keywords + group - 1) // group
    assert len(want["features"]) == n_groups
    for gi in range(n_groups):
        np.testing.assert_allclose(
            ours.item_features(idx, gi),
            want["features"][gi].numpy(),
            rtol=1e-4, atol=1e-5,
            err_msg=f"features item {idx} group {gi}",
        )


@pytest.mark.parametrize("size", [(32, 48), None])
@pytest.mark.parametrize("group", [2, -1])
def test_aishell_hotword_matches_reference(ref_mod, aishell_root, size, group):
    kwargs = dict(split="dev", size=size, hotwords_per_group=group, kw_type="natural")
    ref = ref_mod.AishellHotwordDataset(
        root=os.path.join(aishell_root, "hotword"), r1_only=False, **kwargs
    )
    ours = AishellHotwordDataset(root=os.path.join(aishell_root, "hotword"), **kwargs)

    assert len(ours) == len(ref)
    assert ours.hotwords == ref.hotwords
    g = len(ref.hotwords) if group == -1 else group
    for idx in range(len(ref)):
        _compare_grouped_item(ours, ref, idx, g, len(ref.hotwords))
        # reference speaker is `.groups('speaker')` — a 1-tuple of the id
        assert (ours[idx]["speaker"],) == ref[idx]["speaker"]


@pytest.mark.parametrize("split", ["dev", "test"])
@pytest.mark.parametrize("size", [(32, 48), None])
def test_acl_matches_reference(ref_mod, acl_root, size, split):
    kwargs = dict(split=split, size=size, keywords_per_group=2, kw_type="tts")
    ref = ref_mod.ACL6060KeywordDataset(root=acl_root, **kwargs)
    ours = ACL6060KeywordDataset(root=acl_root, **kwargs)

    assert len(ours) == len(ref)
    assert ours.keywords == ref.keywords
    for idx in range(len(ref)):
        _compare_grouped_item(ours, ref, idx, 2, len(ref.keywords))
        got, want = ours[idx], ref[idx]
        assert got["speaker"] == want["speaker"]
        assert got["keywords"] == want["keywords"]  # tagged-mention dicts
