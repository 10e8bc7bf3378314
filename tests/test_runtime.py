"""Runtime subsystem tests: checkpoints, early stopping, logging, RTFx."""

import json
import os
import time

import numpy as np
import pytest

from enhance_cb_whisper_tpu.runtime.checkpoint import (
    CheckpointManager,
    EarlyStopping,
    load_checkpoint,
    save_checkpoint,
)
from enhance_cb_whisper_tpu.runtime.logging import MetricsLogger
from enhance_cb_whisper_tpu.runtime.profiler import RTFxMeter


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}, "epoch": 3}
    save_checkpoint(str(tmp_path / "c"), state, {"note": "x"})
    restored, meta = load_checkpoint(str(tmp_path / "c"), template=state)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert meta["note"] == "x"


def test_manager_keeps_best_per_monitor(tmp_path):
    mgr = CheckpointManager(str(tmp_path), {"best": "f1:max", "low": "loss:min"})
    mgr.step(0, {"f1": 0.5, "loss": 1.0}, {"e": np.array(0)})
    mgr.step(1, {"f1": 0.4, "loss": 0.5}, {"e": np.array(1)})
    mgr.step(2, {"f1": 0.7, "loss": 0.9}, {"e": np.array(2)})
    best, meta_b = load_checkpoint(str(tmp_path / "best"))
    low, meta_l = load_checkpoint(str(tmp_path / "low"))
    final, meta_f = load_checkpoint(str(tmp_path / "final"))
    assert meta_b["epoch"] == 2 and meta_b["value"] == 0.7
    assert meta_l["epoch"] == 1 and meta_l["value"] == 0.5
    assert meta_f["epoch"] == 2  # final overwritten every epoch


def test_early_stopping_patience():
    es = EarlyStopping("f1", patience=2, mode="max")
    assert not es.step({"f1": 0.5})
    assert not es.step({"f1": 0.4})
    assert es.step({"f1": 0.45})  # second epoch without improvement
    es2 = EarlyStopping("loss", patience=1, mode="min")
    assert not es2.step({"loss": 1.0})
    assert not es2.step({"loss": 0.5})
    assert es2.step({"loss": 0.6})


def test_metrics_logger_files(tmp_path):
    logger = MetricsLogger(str(tmp_path), run_name="r", verbose=False)
    logger.log_params({"lr": 1e-3})
    logger.log_metrics({"f1": 0.5}, step=10, epoch=1)
    logger.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    record = json.loads(lines[-1])
    assert record["metrics"]["f1"] == 0.5 and record["epoch"] == 1
    assert json.load(open(tmp_path / "params.json"))["lr"] == 1e-3
    assert json.load(open(tmp_path / "run.json"))["run_name"] == "r"


def test_rtfx_meter():
    m = RTFxMeter()
    m.start()
    time.sleep(0.05)
    m.stop(audio_seconds=5.0)
    assert m.rtfx > 1
    assert m.summary()["audio_seconds"] == 5.0
