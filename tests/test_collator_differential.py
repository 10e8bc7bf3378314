"""Differential fuzz: our batch collators vs the reference's, run VERBATIM.

* `src/data/data_collator.py` (paper 1) imports torchvision only for
  `transforms.functional.resize`, which on float tensors lowers to
  `torch.nn.functional.interpolate(mode='bilinear', align_corners=False,
  antialias=…)` — the shim IS that lowering, so the reference path runs the
  real ATen resize and the fuzz pins our matmul-folded resize against it
  end-to-end through the collator (tuple flatten, list flatten with the
  mask→-100 ghost rewrite, flat-path verbatim labels, max(batch,32) floors,
  long-edge zero-pad vs resize, domain passthrough).
* `src/efficient_kws/data_collator.py` (paper 2) is pure torch (stack every
  non-(idx,label,domain,mask) key, labels VERBATIM — the mask is never
  applied there).
"""

import random

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.data.collators import KWSDataCollator
from enhance_cb_whisper_tpu.efficient_kws.data import EfficientKWSDataCollator
from ref_shims import load_reference_module, restore_modules, torchvision_shim


@pytest.fixture(scope="module")
def ref_collators():
    shims = torchvision_shim()
    mod, saved = load_reference_module("data/data_collator.py",
                                       "ref_data_collator", shims)
    mod2, _ = load_reference_module("efficient_kws/data_collator.py",
                                    "ref_eff_data_collator", shims)
    yield mod.KWSDataCollator, mod2.KWSDataCollator
    restore_modules(saved)


def _flat_item(rng, c, with_domain):
    item = {
        "features": rng.standard_normal(
            (c, rng.integers(2, 40), rng.integers(2, 40))).astype(np.float32),
        "label": int(rng.integers(0, 2)),
        "mask": int(rng.integers(0, 2)),
    }
    if with_domain:
        item["domain"] = int(rng.integers(0, 4))
    return item


def _list_item(rng, c):
    n = int(rng.integers(1, 4))
    return {
        "features": [rng.standard_normal(
            (c, rng.integers(2, 40), rng.integers(2, 40))).astype(np.float32)
            for _ in range(n)],
        "label": [int(rng.integers(0, 2)) for _ in range(n)],
        "mask": [int(rng.integers(0, 2)) for _ in range(n)],
    }


def _to_torch(item):
    if isinstance(item, tuple):
        return tuple(_to_torch(i) for i in item)
    out = dict(item)
    f = item["features"]
    out["features"] = ([torch.from_numpy(t) for t in f]
                       if isinstance(f, list) else torch.from_numpy(f))
    return out


@pytest.mark.parametrize("seed", range(4))
def test_paper1_collator_matches_reference(ref_collators, seed):
    ref_cls, _ = ref_collators
    rng = np.random.default_rng(100 + seed)
    pyrng = random.Random(100 + seed)
    for case in range(40):
        size = None if pyrng.random() < 0.5 else (
            int(rng.integers(32, 49)), int(rng.integers(32, 65)))
        c = int(rng.integers(1, 4))
        kind = pyrng.choice(["flat", "tuple", "list"])
        n = int(rng.integers(1, 4))
        if kind == "flat":
            items = [_flat_item(rng, c, True) for _ in range(n)]
        elif kind == "tuple":
            items = [(_flat_item(rng, c, True), _flat_item(rng, c, True))
                     for _ in range(n)]
        else:
            items = [_list_item(rng, c) for _ in range(n)]

        want = ref_cls(size=size)([_to_torch(i) for i in items])
        got = KWSDataCollator(size=size)(items)

        assert got["labels"].tolist() == want["labels"].tolist(), (
            f"seed={seed} case={case} kind={kind} size={size}")
        assert ("domain" in got) == ("domain" in want)
        if "domain" in got:
            assert got["domain"].tolist() == want["domain"].tolist()
        np.testing.assert_allclose(
            got["features"], want["features"].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"seed={seed} case={case} kind={kind} size={size}")


@pytest.mark.parametrize("seed", range(4))
def test_paper2_collator_matches_reference(ref_collators, seed):
    _, ref_cls = ref_collators
    rng = np.random.default_rng(200 + seed)
    pyrng = random.Random(200 + seed)
    for case in range(40):
        n = int(rng.integers(1, 5))
        L, T_k, T_u, D = (int(rng.integers(1, 3)), int(rng.integers(2, 8)),
                          int(rng.integers(4, 16)), 8)
        with_domain = pyrng.random() < 0.5
        items = []
        for _ in range(n):
            item = {
                "kwd_features": rng.standard_normal((L, T_k, D)).astype(np.float32),
                "kwd_mask": (rng.random((L, T_k)) < 0.8).astype(np.float32),
                "utt_features": rng.standard_normal((L, T_u, D)).astype(np.float32),
                "utt_mask": (rng.random((L, T_u)) < 0.8).astype(np.float32),
                "label": int(rng.integers(0, 2)),
                "mask": int(rng.integers(0, 2)),
                "idx": int(rng.integers(0, 1000)),
            }
            if with_domain:
                item["domain"] = int(rng.integers(0, 12))
            items.append(item)

        ref_items = []
        for it in items:
            r = dict(it)
            for k in ("kwd_features", "kwd_mask", "utt_features", "utt_mask"):
                r[k] = torch.from_numpy(it[k])
            ref_items.append(r)
        want = ref_cls()(ref_items)
        got = EfficientKWSDataCollator()(items)

        assert got["labels"].tolist() == want["labels"].tolist()
        assert ("domain" in got) == ("domain" in want)
        if "domain" in got:
            assert got["domain"].tolist() == want["domain"].tolist()
        for k in ("kwd_features", "kwd_mask", "utt_features", "utt_mask"):
            np.testing.assert_array_equal(got[k], want[k].numpy(), err_msg=k)
