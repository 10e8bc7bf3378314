"""int8 calibration robustness: decision-flip rate vs fp32 as a function of
the calibration-set size (the `calibration_batches` knob on all three CLIs).

Static activation scales are maxes over the calibration maps; a one-sample
calibration clips when a later segment's activations exceed the first
segment's range (VERDICT r2 weak #7).  The corpus here includes
outlier-scale utterances (un-normalized caches, 8x the typical magnitude)
placed AFTER the first calibration sample, so single-sample calibration
must clip on them while a multi-batch calibration sees their range.

The measured sweep is recorded in docs/PERF.md.
"""

import jax
import numpy as np
import pytest

from enhance_cb_whisper_tpu.catalog.database import (
    KeywordCatalog,
    calibration_sim_maps_multi,
    device_put_catalog,
    make_catalog_score_fn,
)
from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.models.kws import KWSModel
from enhance_cb_whisper_tpu.models.quant import (
    calibrate_act_scales,
    make_quantized_kws_apply,
    quantize_resnet_classifier,
)
from enhance_cb_whisper_tpu.ops.resize import resize_matrix

TINY = ResNetConfig(
    num_channels=3, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
    depths=(1, 1, 1, 1), num_labels=2,
)
FS = (32, 48)
N_KW = 12
N_UTT = 16
OUTLIERS = (6, 9, 12)  # after the first calibration sample
OUTLIER_SCALE = 8.0


def _corpus(seed=0):
    rng = np.random.default_rng(seed)
    stacks = [
        _n(rng.standard_normal((3, int(rng.integers(3, 7)), 16), dtype=np.float32))
        for _ in range(N_KW)
    ]
    catalog = KeywordCatalog.from_arrays(
        [f"k{i}" for i in range(N_KW)], stacks, group_size=N_KW
    )
    utts = []
    for u in range(N_UTT):
        s = _n(rng.standard_normal((3, int(rng.integers(10, 20)), 16), dtype=np.float32))
        if u in OUTLIERS:
            s = s * OUTLIER_SCALE  # un-normalized cache / pathological input
        utts.append(s)
    return catalog, utts


def _n(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def flip_rates(calibration_batches_sweep=(1, 4, 8), seed=0):
    """Per-size decision-flip rates vs fp32, split outlier/typical."""
    catalog, utts = _corpus(seed)
    model = KWSModel(TINY)
    variables = model.init(jax.random.PRNGKey(seed), np.zeros((1, 3, *FS), np.float32))

    def fp_apply(v, x):
        return model.apply(v, x).logits

    score_fp = make_catalog_score_fn(fp_apply, out_size=FS, chunk=N_KW)
    cat_dev = device_put_catalog(catalog, out_h=FS[0], chunk=N_KW)

    def decisions(score_fn, v):
        out = []
        for u in utts:
            w = resize_matrix(u.shape[1], FS[1], antialias=False)
            probs, logits = score_fn(v, cat_dev, u, w)
            out.append(np.asarray(logits[: N_KW]).argmax(-1))
        return np.stack(out)

    ref = decisions(score_fp, variables)

    qparams = quantize_resnet_classifier(variables, TINY)
    out_mask = np.zeros(N_UTT, bool)
    out_mask[list(OUTLIERS)] = True
    rates = {}
    for n_calib in calibration_batches_sweep:
        maps = calibration_sim_maps_multi(catalog, utts[:n_calib], FS, n_per_utt=8)
        scales = calibrate_act_scales(TINY, qparams, maps)["act_scales"]
        q_apply = make_quantized_kws_apply(TINY, act_scales=scales)
        score_q = make_catalog_score_fn(q_apply, out_size=FS, chunk=N_KW)
        got = decisions(score_q, qparams)
        flips = got != ref
        rates[n_calib] = {
            "overall": float(flips.mean()),
            "outlier": float(flips[out_mask].mean()),
            "typical": float(flips[~out_mask].mean()),
        }
    return rates


def test_calibration_coverage_tradeoff():
    """Measured behavior (docs/PERF.md flip-rate table): max-based scales
    trade outlier clipping against typical-input precision.  A calibration
    set that MISSES the outliers (n=1: only utts[0]) clips them badly; one
    that INCLUDES an outlier (n=8 ⊇ utt 6) widens the input scale ~8x,
    fixing outliers at a bounded cost in typical-input quantization step.
    Overall rate is therefore NOT monotone in set size — the knob's value
    is covering the corpus's real dynamic range, which is why the CLIs
    default to several batches and the docs recommend a representative
    calibration sample."""
    rates = flip_rates()
    # outliers unseen in calibration (n=1 and n=4 both stop before utt 6)
    # clip hard; seeing one (n=8) must cut outlier flips drastically
    assert rates[8]["outlier"] < rates[1]["outlier"] / 2, rates
    # the coarsening cost on typical inputs stays bounded
    assert rates[8]["typical"] <= 0.15, rates
    assert rates[8]["overall"] <= rates[1]["overall"] + 0.05, rates
    # and a calibration set w/o outliers keeps typical inputs near-exact
    assert rates[1]["typical"] <= 0.05, rates


def test_calibration_scales_widen_with_more_batches():
    catalog, utts = _corpus(1)
    model = KWSModel(TINY)
    variables = model.init(jax.random.PRNGKey(1), np.zeros((1, 3, *FS), np.float32))
    qparams = quantize_resnet_classifier(variables, TINY)
    maps1 = calibration_sim_maps_multi(catalog, utts[:1], FS)
    maps8 = calibration_sim_maps_multi(catalog, utts[:8], FS)
    s1 = calibrate_act_scales(TINY, qparams, maps1)["act_scales"]
    s8 = calibrate_act_scales(TINY, qparams, maps8)["act_scales"]
    assert set(s1) == set(s8)
    for site in s1:
        assert s8[site] >= s1[site] - 1e-12  # maxes only widen
    # the outlier utterances must actually widen the input-site scale
    assert s8["input"] > s1["input"] * 2


if __name__ == "__main__":
    # the docs/PERF.md flip-rate table
    for seed in (0, 1, 2):
        print(seed, flip_rates((1, 2, 4, 8), seed=seed))
