"""Checkpointing: best-by-metric x3 + final-every-epoch, plus early stopping.

Replaces the reference's Lightning ModelCheckpoint/EarlyStopping stack
(src/run_CLI.py:17-21, configs/train.yaml:48-101): each configured monitor
keeps the best state; ``final`` is overwritten every epoch; hyperparameters
are embedded in the checkpoint metadata (the reference's
``save_hyperparameters()``, model.py:51).

Format: ``<dir>/<name>/state.msgpack`` (flax serialization of the state
pytree) + ``meta.json`` (hparams, monitored values, epoch).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    return obj


def save_checkpoint(path: str, state: Dict[str, Any], meta: Optional[dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(state))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(_to_jsonable(meta or {}), f, indent=2)


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    """Returns (state, meta).  With a ``template`` pytree the state is
    restored with proper array types/shapes; without it, raw nested dicts."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        data = f.read()
    state = (
        serialization.from_bytes(template, data)
        if template is not None
        else serialization.msgpack_restore(data)
    )
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


class CheckpointManager:
    """monitor -> best checkpoint; 'final' saved unconditionally."""

    def __init__(self, directory: str, monitors: Dict[str, str], hparams: Optional[dict] = None):
        """``monitors``: name -> "metric_key:max" or "metric_key:min"."""
        self.directory = directory
        self.monitors = {}
        for name, spec in monitors.items():
            key, _, mode = spec.partition(":")
            self.monitors[name] = (key, mode or "max")
        self.best: Dict[str, float] = {}
        self.hparams = hparams or {}
        os.makedirs(directory, exist_ok=True)

    def restore_best(self) -> Dict[str, float]:
        """Seed ``best`` from the monitor checkpoints already on disk
        (Lightning's ckpt_path resume restores ModelCheckpoint state —
        without this, the first post-resume validation always "improves"
        and can overwrite a far better best checkpoint)."""
        for name in self.monitors:
            meta_path = os.path.join(self.directory, name, "meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                if "value" in meta:
                    self.best[name] = float(meta["value"])
        return dict(self.best)

    def step(self, epoch: int, metrics: Dict[str, float], state: Dict[str, Any]) -> list:
        """Save improved monitors + 'final'; returns the saved paths (fed to
        ``MetricsLogger.log_artifact`` when log_model is enabled)."""
        saved = []
        for name, (key, mode) in self.monitors.items():
            if key not in metrics:
                continue
            value = float(metrics[key])
            best = self.best.get(name)
            improved = best is None or (value > best if mode == "max" else value < best)
            if improved:
                self.best[name] = value
                path = os.path.join(self.directory, name)
                save_checkpoint(
                    path, state,
                    {"epoch": epoch, "monitor": key, "value": value, "hparams": self.hparams},
                )
                saved.append(path)
        final = os.path.join(self.directory, "final")
        save_checkpoint(
            final, state,
            {"epoch": epoch, "metrics": _to_jsonable(metrics), "hparams": self.hparams},
        )
        saved.append(final)
        return saved


class EarlyStopping:
    """Lightning-equivalent early stopping on one monitored metric."""

    def __init__(self, monitor: str, patience: int = 10, mode: str = "max",
                 min_delta: float = 0.0):
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.count = 0

    def step(self, metrics: Dict[str, float]) -> bool:
        """Returns True when training should stop."""
        if self.monitor not in metrics:
            return False
        value = float(metrics[self.monitor])
        improved = self.best is None or (
            value > self.best + self.min_delta
            if self.mode == "max"
            else value < self.best - self.min_delta
        )
        if improved:
            self.best = value
            self.count = 0
        else:
            self.count += 1
        return self.count >= self.patience
