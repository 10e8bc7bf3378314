"""Load reference paper-2 (efficient_kws) torch checkpoints into
:class:`~.model.EfficientKWSModel` variables.

The reference `KWSModel` (src/efficient_kws/model.py:18-127) owns
* ``model`` — a `Resnet` wrapper (HF ResNetModel feature_extractor +
  Sequential[Flatten, Linear] classifier, src/efficient_kws/resnet.py:7-57);
* ``projector`` — per-layer Sequential[Linear(D, D/2), ReLU,
  Linear(D/2, units)] (model.py:87-103), LE/LEF variants only;
* ``time_projector`` — per-layer Sequential[Conv1d(k=3,s=1,p=1),
  BatchNorm1d, MaxPool1d(k=3,s=2,p=1)] (model.py:106-124), LEF only.

This converter maps a Lightning ``state_dict`` (keys relative to the
LightningModule, e.g. ``model.feature_extractor.…``) into our flax
variable tree; pass the raw ``torch.load(ckpt)["state_dict"]`` or an
already-unwrapped mapping.  Verified numerically by
tests/test_efficient_model_differential.py (forward parity vs the
reference model run verbatim).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..models.torch_compat import _np, load_hf_resnet
from .model import EfficientKWSConfig


def load_torch_efficient_kws(
    state_dict: Mapping[str, Any], config: EfficientKWSConfig
) -> Dict[str, Any]:
    """Convert a reference paper-2 checkpoint ``state_dict`` into
    ``{"params": …, "batch_stats": …}`` for :class:`EfficientKWSModel`."""
    if "state_dict" in state_dict and not any(
        k.startswith(("model.", "projector.", "time_projector."))
        for k in state_dict
    ):
        state_dict = state_dict["state_dict"]

    resnet = load_hf_resnet(
        {k: v for k, v in state_dict.items()
         if k.startswith("model.feature_extractor.")},
        config.resnet_config(),
        prefix="model.feature_extractor.",
    )
    params: Dict[str, Any] = {"model": resnet["params"]}
    stats: Dict[str, Any] = {"model": resnet["batch_stats"]}
    params["classifier"] = {
        "kernel": _np(state_dict["model.classifier.1.weight"]).T,
        "bias": _np(state_dict["model.classifier.1.bias"]),
    }

    if config.learn_features and config.proj_mlp:
        proj: Dict[str, Any] = {}
        for i in range(config.n_layers):
            for j, src in ((0, 0), (1, 2)):  # Sequential indices 0 and 2
                proj[f"proj_{i}_{j}"] = {
                    "kernel": _np(state_dict[f"projector.{i}.{src}.weight"]).T,
                    "bias": _np(state_dict[f"projector.{i}.{src}.bias"]),
                }
        params["projector"] = proj
        if config.frames_conv:
            tp: Dict[str, Any] = {}
            tp_stats: Dict[str, Any] = {}
            for i in range(config.n_layers):
                # torch Conv1d kernel [out, in, k] -> flax [k, in, out]
                tp[f"conv_{i}"] = {
                    "kernel": _np(
                        state_dict[f"time_projector.{i}.0.weight"]
                    ).transpose(2, 1, 0),
                    "bias": _np(state_dict[f"time_projector.{i}.0.bias"]),
                }
                tp[f"bn_{i}"] = {
                    "scale": _np(state_dict[f"time_projector.{i}.1.weight"]),
                    "bias": _np(state_dict[f"time_projector.{i}.1.bias"]),
                }
                tp_stats[f"bn_{i}"] = {
                    "mean": _np(state_dict[f"time_projector.{i}.1.running_mean"]),
                    "var": _np(state_dict[f"time_projector.{i}.1.running_var"]),
                }
            params["time_projector"] = tp
            stats["time_projector"] = tp_stats

    params = {k: _as_f32(v) for k, v in params.items()}
    stats = {k: _as_f32(v) for k, v in stats.items()}
    return {"params": params, "batch_stats": stats}


def _as_f32(tree):
    if isinstance(tree, dict):
        return {k: _as_f32(v) for k, v in tree.items()}
    return np.asarray(tree, dtype=np.float32)
