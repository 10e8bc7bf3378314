"""Converters from HF/torch state dicts to this framework's flax params.

Used to (a) golden-parity-test the flax models against their HF
counterparts, and (b) load checkpoints trained with the reference stack
(torch is only imported inside these functions — the framework itself
never depends on it).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .resnet import ResNetConfig


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv_kernel(w) -> np.ndarray:
    # torch OIHW -> flax HWIO
    return np.transpose(_np(w), (2, 3, 1, 0))


def _set(tree: Dict[str, Any], path: list[str], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _convnormact(params, stats, prefix_out: list[str], sd: Mapping[str, Any], prefix_in: str):
    _set(params, prefix_out + ["convolution", "kernel"], _conv_kernel(sd[f"{prefix_in}.convolution.weight"]))
    _set(params, prefix_out + ["normalization", "scale"], _np(sd[f"{prefix_in}.normalization.weight"]))
    _set(params, prefix_out + ["normalization", "bias"], _np(sd[f"{prefix_in}.normalization.bias"]))
    _set(stats, prefix_out + ["normalization", "mean"], _np(sd[f"{prefix_in}.normalization.running_mean"]))
    _set(stats, prefix_out + ["normalization", "var"], _np(sd[f"{prefix_in}.normalization.running_var"]))


def load_hf_resnet(state_dict: Mapping[str, Any], config: ResNetConfig, prefix: str = ""):
    """Convert an HF ``ResNetModel`` state dict into flax variables for
    :class:`~enhance_cb_whisper_tpu.models.resnet.ResNet`.

    ``prefix`` strips a leading path (e.g. ``"model.feature_extractor."``
    when converting a reference KWSModel lightning checkpoint,
    src/model/model.py:434-446 documents that layout).
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    _convnormact(params, stats, ["embedder"], sd, "embedder.embedder")

    n_layers = {"bottleneck": 3, "basic": 2}[config.layer_type]
    for s, depth in enumerate(config.depths):
        for b in range(depth):
            base = f"encoder.stages.{s}.layers.{b}"
            out = [f"stage_{s}_block_{b}"]
            if f"{base}.shortcut.convolution.weight" in sd:
                _set(params, out + ["shortcut", "convolution", "kernel"],
                     _conv_kernel(sd[f"{base}.shortcut.convolution.weight"]))
                _set(params, out + ["shortcut", "normalization", "scale"],
                     _np(sd[f"{base}.shortcut.normalization.weight"]))
                _set(params, out + ["shortcut", "normalization", "bias"],
                     _np(sd[f"{base}.shortcut.normalization.bias"]))
                _set(stats, out + ["shortcut", "normalization", "mean"],
                     _np(sd[f"{base}.shortcut.normalization.running_mean"]))
                _set(stats, out + ["shortcut", "normalization", "var"],
                     _np(sd[f"{base}.shortcut.normalization.running_var"]))
            for i in range(n_layers):
                _convnormact(params, stats, out + [f"layer_{i}"], sd, f"{base}.layer.{i}")

    return {"params": params, "batch_stats": stats}


def migrate_legacy_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Old reference checkpoints use ``model.resnet.*`` keys; migrate them to
    the current ``model.feature_extractor.*`` layout exactly like the
    reference's ``on_load_checkpoint`` shim (src/model/model.py:434-446)."""
    import re

    keys = list(state_dict.keys())
    if not any("resnet." in k for k in keys):
        return dict(state_dict)
    resnet_re = re.compile("resnet.")
    fe_re = re.compile("(model.embedder|model.encoder)")
    out: Dict[str, Any] = {}
    for key in keys:
        new_key = resnet_re.sub("", key)
        if fe_re.search(new_key):
            new_key = new_key[:6] + "feature_extractor." + new_key[6:]
        out[new_key] = state_dict[key]
    return out


def load_hf_resnet_classifier(state_dict: Mapping[str, Any], config: ResNetConfig,
                              prefix: str = "", classifier_prefix: str = "classifier.1"):
    """Convert the reference's Resnet (feature_extractor + Sequential
    [Flatten, Linear] classifier, src/model/resnet.py:18-27) into variables
    for :class:`ResNetClassifier`."""
    inner = load_hf_resnet(
        {k: v for k, v in state_dict.items() if k.startswith(prefix + "feature_extractor.")},
        config,
        prefix=prefix + "feature_extractor.",
    )
    params = {"feature_extractor": inner["params"]}
    stats = {"feature_extractor": inner["batch_stats"]}
    params["classifier"] = {
        "kernel": _np(state_dict[f"{prefix}{classifier_prefix}.weight"]).T,
        "bias": _np(state_dict[f"{prefix}{classifier_prefix}.bias"]),
    }
    return {"params": params, "batch_stats": stats}
