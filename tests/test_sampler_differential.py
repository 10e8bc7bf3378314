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


# ---------------------------------------------------------------------------
# MLS samplers: the multilingual offset arithmetic, in BOTH reference
# variants (src/data/sampler.py:91 for paper 1, src/efficient_kws/sampler.py
# for paper 2 — same scheme, independently reformatted code).
# ---------------------------------------------------------------------------

LANGS = ["German", "English"]
N_KWS = (5, 7)  # per language; UNEQUAL on purpose (offset-sensitive)
N_UTTS = (3, 4)


@pytest.fixture(scope="module", params=["paper1", "paper2"])
def ref_mls_sampler_cls(request):
    path = ("/root/reference/src/data/sampler.py" if request.param == "paper1"
            else "/root/reference/src/efficient_kws/sampler.py")
    spec = importlib.util.spec_from_file_location(f"ref_sampler_{request.param}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod.MLSKWSSampler


def _mls_data_source(seed=0):
    """The attribute surface both MLS samplers consume (mirrors the
    reference MLSKWSDataset: flat index space ``offset_idx + utt_idx *
    n_keywords_total + lang_offset + in_language_idx``)."""
    ds = types.SimpleNamespace()
    ds.languages = list(LANGS)
    per_lang = {
        lang: sorted(f"{lang[:2].lower()}kw{i:02d}" for i in range(n))
        for lang, n in zip(LANGS, N_KWS)
    }
    ds.keywords = {
        lang: {kw: i for i, kw in enumerate(kws)} for lang, kws in per_lang.items()
    }
    ds.keywords_reverse = {
        lang: sorted(kws, reverse=True) for lang, kws in per_lang.items()
    }
    ds.n_keywords = list(np.cumsum(N_KWS))  # prefix counts (sampler.py:141)
    n_total = int(sum(N_KWS))

    rng = np.random.default_rng(seed)
    metadata, offset = [], 0
    for lang, n_utt in zip(LANGS, N_UTTS):
        n_lang = len(per_lang[lang])
        data = []
        for u in range(n_utt):
            pos_idx = sorted(rng.choice(n_lang, size=2, replace=False).tolist())
            positives = []
            for p in pos_idx:
                kw = per_lang[lang][p]
                positives.append((f"{lang}-utt{u}", p, ds.keywords_reverse[lang].index(kw)))
            data.append({"positives": positives})
        metadata.append({"language": lang, "offset_idx": offset, "data": data})
        offset += n_utt * n_total
    ds.metadata = metadata
    ds._n_total = n_total
    return ds


def _mls_decode(ds, idx):
    """flat index -> (submeta_i, utt_idx, slot in [0, n_keywords_total))."""
    for si, sub in enumerate(ds.metadata):
        span = len(sub["data"]) * ds._n_total
        if sub["offset_idx"] <= idx < sub["offset_idx"] + span:
            rel = idx - sub["offset_idx"]
            return si, rel // ds._n_total, rel % ds._n_total
    raise AssertionError(f"index {idx} outside every submetadata span")


def _mls_structure_ok(indices, ds, sampling):
    n_epoch = sum(N_UTTS) * 4
    assert len(indices) == n_epoch
    per_utt = {}
    for idx in indices:
        si, u, slot = _mls_decode(ds, idx)
        per_utt.setdefault((si, u), []).append(slot)
    assert set(per_utt) == {(si, u) for si in range(len(LANGS)) for u in range(N_UTTS[si])}
    for (si, u), slots in per_utt.items():
        assert len(slots) == 4
        sub = ds.metadata[si]
        lang = sub["language"]
        lang_off = ds.n_keywords[si - 1] if si else 0
        n_lang = len(ds.keywords[lang])
        pos_slots = {lang_off + p[1] for p in sub["data"][u]["positives"]}
        assert any(s in pos_slots for s in slots)
        # random negatives roam the FULL slot range; lexicographic ones are
        # confined to the in-language block — with 1 random negative, at
        # most one slot may fall outside the language block
        outside = [s for s in slots if not (lang_off <= s < lang_off + n_lang)]
        assert len(outside) <= 1
    if sampling == "utterance-examples":
        for b in range(0, len(indices), 4):
            assert len({_mls_decode(ds, i)[:2] for i in indices[b : b + 4]}) == 1


@pytest.mark.parametrize("sampling", ["random", "utterance-examples"])
def test_mls_structure_matches_reference(ref_mls_sampler_cls, sampling):
    ds = _mls_data_source()
    ref = ref_mls_sampler_cls(ds, sampling=sampling, resample_every_epoch=False, seed=7)
    ours = KWSSampler(ds, sampling=sampling, resample_every_epoch=False, seed=7)
    assert len(ref) == len(ours) == sum(N_UTTS) * 4
    for _ in range(3):
        _mls_structure_ok(_epoch(ref), ds, sampling)
        _mls_structure_ok(_epoch(ours), ds, sampling)
    assert _epoch(ref) == _epoch(ref)
    assert _epoch(ours) == _epoch(ours)


def test_mls_marginal_distributions_match_reference(ref_mls_sampler_cls):
    ds = _mls_data_source()
    torch.manual_seed(123)
    ref = ref_mls_sampler_cls(ds, sampling="random", resample_every_epoch=True)
    ours = KWSSampler(ds, sampling="random", resample_every_epoch=True, seed=123)

    size = max(s["offset_idx"] + len(s["data"]) * ds._n_total for s in ds.metadata)
    counts = {"ref": np.zeros(size), "ours": np.zeros(size)}
    for _ in range(600):
        for i in _epoch(ref):
            counts["ref"][i] += 1
        for i in _epoch(ours):
            counts["ours"][i] += 1
    p_ref = counts["ref"] / counts["ref"].sum()
    p_our = counts["ours"] / counts["ours"].sum()
    tv = 0.5 * np.abs(p_ref - p_our).sum()
    assert tv < 0.05, f"total variation {tv:.4f}"


def test_duplicate_negatives_match_reference(ref_sampler_cls):
    """The reference's `indices_to_avoid.union(set(...))` calls DISCARD
    their result (sampler.py:64,70,76), so negative draw types only avoid
    the positives and can duplicate each other.  With a tight gaussian
    (diversity=1) duplicates are frequent; the mean per-epoch duplicate
    count must be far from zero and agree between implementations (a
    mutated avoid set would pin it to exactly 0)."""
    ds = _data_source()
    torch.manual_seed(5)
    kwargs = dict(
        sampling="utterance-examples",
        negative_examples={"random": 2, "lexicographic": 2},
        negative_diversity=1.0,
        resample_every_epoch=True,
    )
    ref = ref_sampler_cls(ds, **kwargs)
    ours = KWSSampler(ds, seed=5, **kwargs)

    def dup_rate(sampler, epochs=300):
        dups = 0
        for _ in range(epochs):
            idx = _epoch(sampler)
            for b in range(0, len(idx), 5):
                block = idx[b : b + 5]
                dups += len(block) - len(set(block))
        return dups / epochs

    r_ref, r_our = dup_rate(ref), dup_rate(ours)
    assert r_ref > 0.2 and r_our > 0.2, (r_ref, r_our)
    assert abs(r_ref - r_our) < 0.25 * max(r_ref, r_our), (r_ref, r_our)
