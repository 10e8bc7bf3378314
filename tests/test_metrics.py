"""Tests for PR curve / operating points / bootstrap CIs.

The PR-curve oracle is brute-force threshold evaluation: for every
threshold on the curve, precision/recall must equal direct counting with
``pred >= thr`` — the defining property of the torchmetrics/sklearn curve
the reference relies on (src/model/model.py:273-284)."""

import numpy as np
import pytest

from enhance_cb_whisper_tpu.metrics import (
    binary_pr_curve,
    evaluate_with_conf_int,
    find_best_threshold_idx,
    operating_point,
    prf_at_threshold,
    recall_at_k,
)


def _brute(preds, target, thr):
    pred_pos = preds >= thr
    tp = np.sum(pred_pos & (target == 1))
    fp = np.sum(pred_pos & (target == 0))
    fn = np.sum(~pred_pos & (target == 1))
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 1.0
    return p, r


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pr_curve_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    preds = np.round(rng.random(200), 2)  # duplicates on purpose
    target = (rng.random(200) < 0.3).astype(np.int64)
    precision, recall, thresholds = binary_pr_curve(preds, target)
    assert precision.shape == recall.shape == (thresholds.size + 1,)
    assert precision[-1] == 1.0 and recall[-1] == 0.0
    for i, thr in enumerate(thresholds):
        p, r = _brute(preds, target, thr)
        assert precision[i] == pytest.approx(p)
        assert recall[i] == pytest.approx(r)


def test_operating_point_at_half():
    # smallest curve threshold >= 0.5 is the reference's operating point
    preds = np.array([0.1, 0.4, 0.6, 0.9])
    target = np.array([0, 1, 0, 1])
    precision, recall, thresholds = binary_pr_curve(preds, target)
    p, r = operating_point(precision, recall, thresholds, 0.5)
    # at threshold 0.6: predict positive for {0.6, 0.9} → tp=1 fp=1 fn=1
    assert p == pytest.approx(0.5)
    assert r == pytest.approx(0.5)


def test_prf_zero_guard():
    preds = np.array([0.9, 0.8])
    target = np.array([0, 0, ])
    # no positives at all: precision 0 → f1 must be exactly 0, not NaN
    p, r, f1 = prf_at_threshold(preds, target, 0.5)
    assert f1 == 0.0


def test_find_best_threshold_weighted_f():
    precision = np.array([0.5, 0.9, 1.0])
    recall = np.array([1.0, 0.5, 0.0])
    idx = find_best_threshold_idx(precision, recall)
    scores = 5 * precision * recall / (4 * precision + recall)
    assert idx == int(np.nanargmax(scores))


def test_recall_at_k():
    preds = np.array([0.9, 0.1, 0.8, 0.2, 0.3])
    target = np.array([1, 0, 0, 1, 0])
    assert recall_at_k(preds, target, 2) == pytest.approx(0.5)
    assert recall_at_k(preds, target, 5) == pytest.approx(1.0)
    assert recall_at_k(preds, np.zeros(5), 2) == -1.0


def test_bootstrap_center_and_interval():
    rng = np.random.default_rng(0)
    samples = rng.random(400)
    labels = (samples + rng.normal(0, 0.2, 400) > 0.5).astype(float)
    conditions = np.repeat(np.arange(20), 20)

    def metric(lab, smp):
        return float(np.mean((np.asarray(smp) > 0.5) == np.asarray(lab)))

    center, (lo, hi) = evaluate_with_conf_int(
        samples, metric, labels, conditions, num_bootstraps=200
    )
    assert center == pytest.approx(metric(labels, samples))
    assert lo <= center <= hi
    assert hi - lo < 0.3


def test_bootstrap_list_samples():
    # the CB-Whisper path passes python lists of strings (Flexlist in the
    # reference, src/model/cb_whisper.py:283-285)
    samples = ["a", "b", "a", "b"] * 10
    labels = ["a", "a", "a", "b"] * 10

    def metric(lab, smp):
        return sum(x == y for x, y in zip(lab, smp)) / len(smp)

    center, (lo, hi) = evaluate_with_conf_int(samples, metric, labels, None, num_bootstraps=50)
    assert center == pytest.approx(0.75)
    assert 0.0 <= lo <= hi <= 1.0
