"""Differential statistics: our numpy KWSSampler vs the reference's
torch AishellKWSSampler imported from /root/reference (torch is installed).

The RNG bit-streams cannot match (torch.Generator vs numpy PCG64 —
docs/PARITY.md #3); what must match is the SCHEME: per-utterance example
structure, the rejection-sampling support sets, both emit modes, and the
marginal distributions of each draw (positive uniform over positives,
random negatives uniform over non-positives, lexicographic negatives
gaussian around the positive in forward/reverse keyword order).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

from enhance_cb_whisper_tpu.data.samplers import KWSSampler

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_sampler_cls():
    # the reference module only needs torch + the Sampler base
    spec = importlib.util.spec_from_file_location(
        "ref_sampler", "/root/reference/src/data/sampler.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_sampler"] = mod
    spec.loader.exec_module(mod)
    return mod.AishellKWSSampler


N_KW = 12
N_UTT = 4


def _data_source():
    kws = [f"kw{chr(ord('a') + i)}" for i in range(N_KW)]
    forward = {kw: i for i, kw in enumerate(sorted(kws))}
    rev_sorted = sorted(kws, reverse=True)
    ds = types.SimpleNamespace()
    ds.keywords = forward
    ds.keywords_reverse = rev_sorted  # reverse position -> keyword
    rng = np.random.default_rng(0)
    metadata = []
    for u in range(N_UTT):
        pos_idx = sorted(rng.choice(N_KW, size=2, replace=False).tolist())
        positives = []
        for p in pos_idx:
            kw = sorted(kws)[p]
            positives.append((f"utt{u}", p, rev_sorted.index(kw)))
        metadata.append({"positives": positives})
    ds.metadata = metadata
    return ds


def _epoch(sampler):
    return list(iter(sampler))


def _structure_ok(indices, ds, sampling):
    """Shared invariants both implementations must satisfy."""
    assert len(indices) == N_UTT * 4
    per_utt = {}
    for idx in indices:
        per_utt.setdefault(idx // N_KW, []).append(idx % N_KW)
    assert set(per_utt) == set(range(N_UTT))
    for u, kws_drawn in per_utt.items():
        assert len(kws_drawn) == 4
        positives = {p[1] for p in ds.metadata[u]["positives"]}
        # exactly one drawn index is a positive; the three negatives are not
        n_pos = sum(1 for k in kws_drawn if k in positives)
        assert n_pos >= 1  # the positive; negatives avoid positives
        assert all(0 <= k < N_KW for k in kws_drawn)
    if sampling == "utterance-examples":
        # whole-utterance blocks of 4
        for b in range(0, len(indices), 4):
            block = indices[b : b + 4]
            assert len({i // N_KW for i in block}) == 1


@pytest.mark.parametrize("sampling", ["random", "utterance-examples"])
def test_structure_matches_reference(ref_sampler_cls, sampling):
    ds = _data_source()
    ref = ref_sampler_cls(ds, sampling=sampling, resample_every_epoch=False, seed=7)
    ours = KWSSampler(ds, sampling=sampling, resample_every_epoch=False, seed=7)
    assert len(ref) == len(ours) == N_UTT * 4
    for _ in range(3):
        ref_idx = _epoch(ref)
        our_idx = _epoch(ours)
        _structure_ok(ref_idx, ds, sampling)
        _structure_ok(our_idx, ds, sampling)
    # seeded mode: identical across epochs within each implementation
    assert _epoch(ref) == _epoch(ref)
    assert _epoch(ours) == _epoch(ours)


def test_marginal_distributions_match_reference(ref_sampler_cls):
    """Empirical per-(utterance, keyword) draw frequencies over many epochs
    agree between the two implementations (total-variation distance)."""
    ds = _data_source()
    torch.manual_seed(123)
    ref = ref_sampler_cls(ds, sampling="random", resample_every_epoch=True)
    ours = KWSSampler(ds, sampling="random", resample_every_epoch=True, seed=123)

    epochs = 800
    counts_ref = np.zeros(N_UTT * N_KW)
    counts_our = np.zeros(N_UTT * N_KW)
    for _ in range(epochs):
        for i in _epoch(ref):
            counts_ref[i] += 1
        for i in _epoch(ours):
            counts_our[i] += 1

    p_ref = counts_ref / counts_ref.sum()
    p_our = counts_our / counts_our.sum()
    tv = 0.5 * np.abs(p_ref - p_our).sum()
    # 16 examples/epoch × 800 epochs; the scheme concentrates mass on the
    # positives and their lexicographic neighbourhoods — a mismatch in any
    # rule (support sets, gaussian width, reverse mapping) shows up as
    # TV >> sampling noise (~0.02 at these counts)
    assert tv < 0.05, f"total variation {tv:.4f}"

    # and the per-draw-type supports: positives get ~1/|positives| of the
    # positive draw each epoch, so every positive index must appear
    for u in range(N_UTT):
        for p in ds.metadata[u]["positives"]:
            assert counts_our[u * N_KW + p[1]] > 0
            assert counts_ref[u * N_KW + p[1]] > 0
