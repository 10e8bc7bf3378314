"""HF → JAX weight conversion for the Whisper model.

Accepts a ``WhisperModel`` or ``WhisperForConditionalGeneration`` state dict
(torch tensors or numpy arrays) and produces the params pytree consumed by
:mod:`.whisper`.  Layout conventions: linear kernels [in, out]; conv1d
kernels [width, in, out]; everything float32 (cast to compute dtype at use).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .whisper import WhisperConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        try:
            return t.numpy()
        except TypeError:
            return t.float().numpy()
    return np.asarray(t)


def _linear(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    out = {"weight": _np(sd[f"{name}.weight"]).T.copy()}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _ln(sd: Mapping[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {"weight": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _attn(sd: Mapping[str, Any], name: str) -> Dict[str, Any]:
    return {
        "q_proj": _linear(sd, f"{name}.q_proj"),
        "k_proj": _linear(sd, f"{name}.k_proj"),  # no bias in whisper
        "v_proj": _linear(sd, f"{name}.v_proj"),
        "out_proj": _linear(sd, f"{name}.out_proj"),
    }


def load_hf_whisper(state_dict: Mapping[str, Any], config: WhisperConfig) -> Dict[str, Any]:
    sd = dict(state_dict)
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    enc: Dict[str, Any] = {
        "conv1": {
            "weight": np.transpose(_np(sd["encoder.conv1.weight"]), (2, 1, 0)),
            "bias": _np(sd["encoder.conv1.bias"]),
        },
        "conv2": {
            "weight": np.transpose(_np(sd["encoder.conv2.weight"]), (2, 1, 0)),
            "bias": _np(sd["encoder.conv2.bias"]),
        },
        "embed_positions": {"weight": _np(sd["encoder.embed_positions.weight"])},
        "layer_norm": _ln(sd, "encoder.layer_norm"),
        "layers": [],
    }
    for i in range(config.encoder_layers):
        base = f"encoder.layers.{i}"
        enc["layers"].append(
            {
                "self_attn": _attn(sd, f"{base}.self_attn"),
                "self_attn_layer_norm": _ln(sd, f"{base}.self_attn_layer_norm"),
                "fc1": _linear(sd, f"{base}.fc1"),
                "fc2": _linear(sd, f"{base}.fc2"),
                "final_layer_norm": _ln(sd, f"{base}.final_layer_norm"),
            }
        )

    dec: Dict[str, Any] = {
        "embed_tokens": {"weight": _np(sd["decoder.embed_tokens.weight"])},
        "embed_positions": {"weight": _np(sd["decoder.embed_positions.weight"])},
        "layer_norm": _ln(sd, "decoder.layer_norm"),
        "layers": [],
    }
    for i in range(config.decoder_layers):
        base = f"decoder.layers.{i}"
        dec["layers"].append(
            {
                "self_attn": _attn(sd, f"{base}.self_attn"),
                "self_attn_layer_norm": _ln(sd, f"{base}.self_attn_layer_norm"),
                "encoder_attn": _attn(sd, f"{base}.encoder_attn"),
                "encoder_attn_layer_norm": _ln(sd, f"{base}.encoder_attn_layer_norm"),
                "fc1": _linear(sd, f"{base}.fc1"),
                "fc2": _linear(sd, f"{base}.fc2"),
                "final_layer_norm": _ln(sd, f"{base}.final_layer_norm"),
            }
        )

    return {"encoder": enc, "decoder": dec}


def load_whisper_from_safetensors(path: str, config: WhisperConfig) -> Dict[str, Any]:
    """Torch-free weight loading straight from ``model.safetensors`` (single
    shard) — the production path on TPU hosts without torch installed."""
    import os

    from safetensors.numpy import load_file

    f = path if path.endswith(".safetensors") else os.path.join(path, "model.safetensors")
    return load_hf_whisper(load_file(f), config)


def load_whisper_from_pretrained(name_or_path: str):
    """Load config + params from a local HF checkpoint directory (zero-egress
    environments must pass a local path).  Returns (config, params).

    Prefers the torch-free safetensors path; falls back to instantiating the
    HF torch model for sharded/.bin checkpoints."""
    import os

    import transformers

    hf_config = transformers.WhisperConfig.from_pretrained(name_or_path)
    config = WhisperConfig.from_hf(hf_config)
    if os.path.isdir(name_or_path) and os.path.exists(
        os.path.join(name_or_path, "model.safetensors")
    ):
        return config, load_whisper_from_safetensors(name_or_path, config)
    model = transformers.WhisperForConditionalGeneration.from_pretrained(name_or_path)
    params = load_hf_whisper(model.state_dict(), config)
    return config, params
