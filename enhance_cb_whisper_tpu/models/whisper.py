"""Whisper encoder-decoder in functional JAX.

A from-scratch TPU implementation of the Whisper architecture the reference
drives through HF ``WhisperModel`` / ``WhisperForConditionalGeneration``
(src/utils.py:130-205 for encoder feature extraction,
src/model/pba_whisper.py for generation).  Design choices:

* **Functional, explicit params**: the model is a set of pure functions over
  a nested dict of arrays (loaded from HF checkpoints by
  :mod:`.whisper_loader`).  No module state — the KV cache is an explicit
  pytree threaded through ``lax.scan`` in the decode loop, which keeps the
  whole autoregressive step jit-compiled with static shapes.
* **Layer-stacked encoder output**: the encoder can return all hidden
  states; the KWS path consumes a slice of them ([10:22] for whisper-medium,
  L2-normalized) as a single stacked array — one device array instead of the
  reference's tuple-of-tensors (src/utils.py:188-195).
* **MXU-friendly**: attention and MLPs are einsums in the compute dtype
  (bfloat16 on TPU), f32 accumulation; LayerNorms in f32.

Weight layout convention (HF names, jax-native layouts):
  linear kernels are stored [in, out]; conv1d kernels [width, in, out].
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 1024
    encoder_layers: int = 24
    encoder_attention_heads: int = 16
    decoder_layers: int = 24
    decoder_attention_heads: int = 16
    encoder_ffn_dim: int = 4096
    decoder_ffn_dim: int = 4096
    max_source_positions: int = 1500
    max_target_positions: int = 448
    # token ids (whisper-multilingual defaults; overridden by the loader
    # from the HF generation config)
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257
    pad_token_id: int = 50257

    @property
    def encoder_head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads

    @classmethod
    def from_hf(cls, hf_config) -> "WhisperConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            num_mel_bins=hf_config.num_mel_bins,
            d_model=hf_config.d_model,
            encoder_layers=hf_config.encoder_layers,
            encoder_attention_heads=hf_config.encoder_attention_heads,
            decoder_layers=hf_config.decoder_layers,
            decoder_attention_heads=hf_config.decoder_attention_heads,
            encoder_ffn_dim=hf_config.encoder_ffn_dim,
            decoder_ffn_dim=hf_config.decoder_ffn_dim,
            max_source_positions=hf_config.max_source_positions,
            max_target_positions=hf_config.max_target_positions,
            decoder_start_token_id=hf_config.decoder_start_token_id,
            eos_token_id=hf_config.eos_token_id,
            pad_token_id=hf_config.pad_token_id,
        )


# ---------------------------------------------------------------------------
# primitives


def _layer_norm(p: Dict[str, Any], x: jax.Array, eps: float = 1e-5) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"] + p["bias"]).astype(x.dtype)


def _linear(p: Dict[str, Any], x: jax.Array) -> jax.Array:
    if "qweight" in p:
        # weight-only int8 (quantize_decoder_layers): XLA fuses the
        # int8→compute-dtype convert into the matmul operand load, so only
        # int8 bytes leave HBM; per-output-channel scales are an f32
        # epilogue (int8 magnitudes are exactly representable in bf16)
        y = jnp.einsum(
            "...i,io->...o",
            x,
            p["qweight"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        y = y * p["scale"]
        if "bias" in p:
            y = y + p["bias"]
        return y.astype(x.dtype)
    y = jnp.einsum("...i,io->...o", x, p["weight"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads)


def _attention(
    q: jax.Array,  # [B, Tq, H, Dh] (already scaled)
    k: jax.Array,  # [B, Tk, H, Dh] (int8 when k_scale is given)
    v: jax.Array,  # [B, Tk, H, Dh] (int8 when v_scale is given)
    mask: Optional[jax.Array] = None,  # broadcastable to [B, H, Tq, Tk], True=keep
    k_scale: Optional[jax.Array] = None,  # [B, Tk] per-token int8 dequant
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """With ``k_scale``/``v_scale`` the K/V operands are int8 codes and the
    per-token scale factors out of the contractions exactly (q·(s·k8) =
    s·(q·k8); on the value side it folds into the softmax weights) — only
    the int8 bytes leave HBM, the convert fuses into the operand load."""
    kq = k.astype(q.dtype) if k.dtype != q.dtype else k
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, kq, preferred_element_type=jnp.float32)
    if k_scale is not None:
        scores = scores * k_scale[:, None, None, :]
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, None, None, :]
    vq = v.astype(q.dtype) if v.dtype != q.dtype else v
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vq.dtype), vq)


def _mha(
    p: Dict[str, Any],
    x_q: jax.Array,
    x_kv: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    head_dim = x_q.shape[-1] // num_heads
    q = _split_heads(_linear(p["q_proj"], x_q), num_heads) * (head_dim**-0.5)
    k = _split_heads(_linear(p["k_proj"], x_kv), num_heads)
    v = _split_heads(_linear(p["v_proj"], x_kv), num_heads)
    o = _attention(q, k, v, mask)
    return _linear(p["out_proj"], o.reshape(*o.shape[:2], -1))


def _conv1d(p: Dict[str, Any], x: jax.Array, stride: int) -> jax.Array:
    # x: [B, T, C_in]; kernel: [W, C_in, C_out]
    y = jax.lax.conv_general_dilated(
        x,
        p["weight"].astype(x.dtype),
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + p["bias"].astype(x.dtype)


def sinusoid_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed encoder positional table (matches the buffer HF stores
    in ``encoder.embed_positions.weight``)."""
    log_timescale_increment = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def init_whisper_params(rng: np.random.Generator, config: WhisperConfig) -> Dict[str, Any]:
    """Random-normal initialized params (for tests/benchmarks; real runs load
    HF checkpoints via :mod:`.whisper_loader`)."""

    def lin(n_in, n_out, bias=True):
        p = {"weight": rng.normal(0, 0.02, (n_in, n_out)).astype(np.float32)}
        if bias:
            p["bias"] = np.zeros((n_out,), np.float32)
        return p

    def ln():
        return {"weight": np.ones((config.d_model,), np.float32),
                "bias": np.zeros((config.d_model,), np.float32)}

    def attn():
        d = config.d_model
        return {
            "q_proj": lin(d, d),
            "k_proj": lin(d, d, bias=False),
            "v_proj": lin(d, d),
            "out_proj": lin(d, d),
        }

    def enc_layer():
        return {
            "self_attn": attn(),
            "self_attn_layer_norm": ln(),
            "fc1": lin(config.d_model, config.encoder_ffn_dim),
            "fc2": lin(config.encoder_ffn_dim, config.d_model),
            "final_layer_norm": ln(),
        }

    def dec_layer():
        return {
            **enc_layer(),
            "fc1": lin(config.d_model, config.decoder_ffn_dim),
            "fc2": lin(config.decoder_ffn_dim, config.d_model),
            "encoder_attn": attn(),
            "encoder_attn_layer_norm": ln(),
        }

    d = config.d_model
    return {
        "encoder": {
            "conv1": {"weight": rng.normal(0, 0.02, (3, config.num_mel_bins, d)).astype(np.float32),
                      "bias": np.zeros((d,), np.float32)},
            "conv2": {"weight": rng.normal(0, 0.02, (3, d, d)).astype(np.float32),
                      "bias": np.zeros((d,), np.float32)},
            "embed_positions": {"weight": sinusoid_positions(config.max_source_positions, d)},
            "layer_norm": ln(),
            "layers": [enc_layer() for _ in range(config.encoder_layers)],
        },
        "decoder": {
            "embed_tokens": {"weight": rng.normal(0, 0.02, (config.vocab_size, d)).astype(np.float32)},
            "embed_positions": {"weight": rng.normal(0, 0.02, (config.max_target_positions, d)).astype(np.float32)},
            "layer_norm": ln(),
            "layers": [dec_layer() for _ in range(config.decoder_layers)],
        },
    }


# ---------------------------------------------------------------------------
# layer stacking (scan-over-layers)
#
# Whisper's encoder/decoder layers are homogeneous, so the per-layer param
# dicts can be stacked leaf-wise into arrays with a leading [n_layers] axis
# and the layer loop rolled into ``lax.scan``.  This shrinks the traced HLO
# ~n_layers× (the layer body appears once instead of 24×) — the difference
# between whisper-medium compiling and the remote-compile relay dropping the
# program (CLAUDE.md).  Numerics are unchanged: the scan body is the exact
# same per-layer computation.  Layout is detected structurally everywhere:
# ``params[...]["layers"]`` is a *list* of per-layer dicts (unrolled) or a
# *dict* of stacked arrays (scan).


def _is_stacked(layers: Any) -> bool:
    return isinstance(layers, dict)


def stack_layer_params(layers: list) -> Dict[str, Any]:
    """List of per-layer param dicts → one dict of [n_layers, ...] arrays."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *layers)


def unstack_layer_params(layers: Dict[str, Any], n_layers: int) -> list:
    """Inverse of :func:`stack_layer_params` (checkpoint export, tests)."""
    return [jax.tree.map(lambda x: x[i], layers) for i in range(n_layers)]


def stack_whisper_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return params with encoder+decoder layer lists stacked for scan
    forwards.  No-op (same objects) if already stacked."""
    out = dict(params)
    for side in ("encoder", "decoder"):
        if side in out and not _is_stacked(out[side]["layers"]):
            out[side] = dict(out[side])
            out[side]["layers"] = stack_layer_params(out[side]["layers"])
    return out


def num_layers(side_params: Dict[str, Any]) -> int:
    layers = side_params["layers"]
    if _is_stacked(layers):
        return jax.tree.leaves(layers)[0].shape[0]
    return len(layers)


def quantize_vocab_projection(params: Dict[str, Any]) -> Dict[str, Any]:
    """Weight-only int8 for the tied vocab projection (serving decode mode).

    The decode-loop profile (BASELINE.md round-2 continuation) shows the
    [vocab, d_model] tied-embedding read is ~half the per-step device time
    and HBM-bound; per-row int8 weights halve that read vs bf16 (XLA fuses
    the int8→compute-dtype convert into the matmul's operand load, so only
    int8 bytes leave HBM).  Row scales are applied as an f32 epilogue on
    the logits.  The fp32 table stays for the input-token gather (a few
    rows/step) and remains the parity default — this is opt-in
    (``WhisperGenerator(vocab_int8=True)`` / ``ECW_RTFX_VOCAB=int8``)."""
    w = np.asarray(params["decoder"]["embed_tokens"]["weight"], dtype=np.float32)
    scale = np.abs(w).max(axis=1, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    out = dict(params)
    out["decoder"] = dict(params["decoder"])
    out["decoder"]["embed_tokens_q"] = {
        "qweight": q,
        "scale": scale[:, 0].astype(np.float32),
    }
    return out


def _quantize_linear_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """Per-output-channel weight-only int8 for one [.., in, out] linear."""
    w = np.asarray(p["weight"], dtype=np.float32)
    scale = np.abs(w).max(axis=-2, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    out = {"qweight": q, "scale": np.squeeze(scale, axis=-2).astype(np.float32)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


# linears that run INSIDE the per-token decode loop.  encoder_attn k/v are
# deliberately absent: they only run once per segment (precompute_cross_kv);
# the cross-K/V SLAB the loop re-reads has its own opt-in int8 mode
# (cross_kv_int8 — precompute_cross_kv(int8=True))
_DECODE_LOOP_LINEARS = (
    ("self_attn", "q_proj"), ("self_attn", "k_proj"),
    ("self_attn", "v_proj"), ("self_attn", "out_proj"),
    ("encoder_attn", "q_proj"), ("encoder_attn", "out_proj"),
    ("fc1",), ("fc2",),
)


def quantize_decoder_layers(params: Dict[str, Any]) -> Dict[str, Any]:
    """Weight-only int8 for every decoder-layer linear in the decode loop.

    The decode loop is HBM-bound on the per-step weight read (BASELINE.md:
    ~5.4 ms/step at whisper-medium b1 — bf16 weights gave +52% over f32);
    int8 weights halve the remaining layer-weight read.  Per-output-channel
    scales, f32 accumulate, f32 scale/bias epilogue — the standard
    near-lossless weight-only recipe (no activation quantization).  Serving
    mode, opt-in (``WhisperGenerator(decoder_int8=True)`` /
    ``ECW_RTFX_DECODER=int8``); fp32 weights stay the parity default.
    Handles stacked ([n_layers, in, out]) and unrolled layer lists."""

    def quantize_layer(layer: Dict[str, Any]) -> Dict[str, Any]:
        out = dict(layer)
        for path in _DECODE_LOOP_LINEARS:
            parent = out
            for key in path[:-1]:
                parent[key] = dict(parent[key])
                parent = parent[key]
            parent[path[-1]] = _quantize_linear_params(parent[path[-1]])
        return out

    out = dict(params)
    out["decoder"] = dict(params["decoder"])
    layers = out["decoder"]["layers"]
    if _is_stacked(layers):
        out["decoder"]["layers"] = quantize_layer(dict(layers))
    else:
        out["decoder"]["layers"] = [quantize_layer(dict(l)) for l in layers]
    return out


# ---------------------------------------------------------------------------
# int8 encoder (extraction / spotting serving mode)
#
# The encoder is MXU compute-bound at batch (unlike the HBM-bound decode
# loop), so weight-only int8 buys nothing here — the win is s8×s8→s32
# matmuls at ~2× the bf16 MXU rate (the same lesson as the int8 ResNet
# catalog scorer, models/quant.py: static calibrated activation scales +
# bf16 intermediates; dynamic per-example quantization was measured 4×
# SLOWER there).  The six per-layer linears (~80% of encoder FLOPs at
# d=1024) quantize; attention scores/probs and LayerNorms stay bf16/f32.
# Opt-in serving mode for the reference's `--extract_hs` dataset builds
# (datasets/aishell/build.sh:74-112 runs whisper-medium over the corpus)
# and KWS spotting; f32/bf16 stays the parity default.

_ENC_ACT_SITES = ("attn_in", "attn_out", "fc1_in", "fc2_in")


def _quantize_act(x: jax.Array, s) -> jax.Array:
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)


def _qlinear(p: Dict[str, Any], xq: jax.Array, s_x) -> jax.Array:
    """s8 activations × per-output-channel s8 weights → s32, f32 dequant
    epilogue (with a static per-layer ``s_x`` the scale vector is a
    compile-time constant XLA fuses into the matmul).  Returns f32."""
    z = jnp.einsum("...i,io->...o", xq, p["qweight"], preferred_element_type=jnp.int32)
    y = z.astype(jnp.float32) * (s_x * p["scale"])
    if "bias" in p:
        y = y + p["bias"]
    return y


def encoder_layer_int8(p: Dict[str, Any], x: jax.Array, num_heads: int) -> jax.Array:
    """int8 twin of :func:`encoder_layer` (same topology, quantized linears)."""
    sc = p["act_scales"]
    head_dim = x.shape[-1] // num_heads
    h = _layer_norm(p["self_attn_layer_norm"], x)
    hq = _quantize_act(h, sc["attn_in"])
    q = _split_heads(
        _qlinear(p["self_attn"]["q_proj"], hq, sc["attn_in"]).astype(x.dtype), num_heads
    ) * (head_dim**-0.5)
    k = _split_heads(
        _qlinear(p["self_attn"]["k_proj"], hq, sc["attn_in"]).astype(x.dtype), num_heads
    )
    v = _split_heads(
        _qlinear(p["self_attn"]["v_proj"], hq, sc["attn_in"]).astype(x.dtype), num_heads
    )
    o = _attention(q, k, v)
    o = o.reshape(*o.shape[:2], -1)
    oq = _quantize_act(o, sc["attn_out"])
    x = x + _qlinear(p["self_attn"]["out_proj"], oq, sc["attn_out"]).astype(x.dtype)
    h = _layer_norm(p["final_layer_norm"], x)
    hq = _quantize_act(h, sc["fc1_in"])
    g = jax.nn.gelu(_qlinear(p["fc1"], hq, sc["fc1_in"]), approximate=False)
    gq = _quantize_act(g, sc["fc2_in"])
    return x + _qlinear(p["fc2"], gq, sc["fc2_in"]).astype(x.dtype)


def _encoder_layer_record_maxes(
    p: Dict[str, Any], x: jax.Array, num_heads: int
) -> Tuple[jax.Array, jax.Array]:
    """f32/bf16 layer forward that also returns max|x| at the four
    activation-quantization sites (calibration pass; mirrors
    models/quant.py:_forward's ``record`` mode)."""
    h = _layer_norm(p["self_attn_layer_norm"], x)
    m_attn_in = jnp.max(jnp.abs(h.astype(jnp.float32)))
    head_dim = x.shape[-1] // num_heads
    q = _split_heads(_linear(p["self_attn"]["q_proj"], h), num_heads) * (head_dim**-0.5)
    k = _split_heads(_linear(p["self_attn"]["k_proj"], h), num_heads)
    v = _split_heads(_linear(p["self_attn"]["v_proj"], h), num_heads)
    o = _attention(q, k, v).reshape(*x.shape[:2], -1)
    m_attn_out = jnp.max(jnp.abs(o.astype(jnp.float32)))
    x = x + _linear(p["self_attn"]["out_proj"], o)
    h = _layer_norm(p["final_layer_norm"], x)
    m_fc1_in = jnp.max(jnp.abs(h.astype(jnp.float32)))
    g = jax.nn.gelu(_linear(p["fc1"], h), approximate=False)
    m_fc2_in = jnp.max(jnp.abs(g.astype(jnp.float32)))
    x = x + _linear(p["fc2"], g)
    return x, jnp.stack([m_attn_in, m_attn_out, m_fc1_in, m_fc2_in])


def calibrate_encoder_act_scales(
    params: Dict[str, Any],
    input_features: jax.Array,  # [B, n_mels, 3000] calibration mels
    config: WhisperConfig,
    dtype: Any = jnp.float32,
) -> np.ndarray:
    """Per-layer static activation scales [n_layers, 4] (sites in
    ``_ENC_ACT_SITES`` order): max|x| over the calibration batch / 127.
    One device forward; the calibration batch should be real audio
    (representativeness matters more than size — docs/PERF.md int8 study)."""
    p = stack_whisper_params(params)["encoder"]
    heads = config.encoder_attention_heads

    @jax.jit
    def run(pp, feats):
        x = jnp.transpose(feats, (0, 2, 1)).astype(dtype)
        x = jax.nn.gelu(_conv1d(pp["conv1"], x, stride=1), approximate=False)
        x = jax.nn.gelu(_conv1d(pp["conv2"], x, stride=2), approximate=False)
        x = x + pp["embed_positions"]["weight"].astype(dtype)

        def body(h, layer_p):
            y, maxes = _encoder_layer_record_maxes(layer_p, h, heads)
            return y, maxes

        _, maxes = jax.lax.scan(body, x, pp["layers"])
        return maxes  # [n_layers, 4]

    maxes = np.asarray(run(p, input_features), dtype=np.float32)
    return np.maximum(maxes / 127.0, 1e-12)


_ENC_LOOP_LINEARS = (
    ("self_attn", "q_proj"), ("self_attn", "k_proj"),
    ("self_attn", "v_proj"), ("self_attn", "out_proj"),
    ("fc1",), ("fc2",),
)


def quantize_encoder_layers(
    params: Dict[str, Any], act_scales: np.ndarray
) -> Dict[str, Any]:
    """int8-quantize every encoder-layer linear (per-output-channel weights)
    and attach the calibrated static activation scales
    (:func:`calibrate_encoder_act_scales`).  conv1/conv2, LayerNorms, and
    the attention einsums stay in the compute dtype.  Returns stacked
    (scan-over-layers) params; :func:`encoder_forward` dispatches on the
    presence of ``layers["act_scales"]``.

    Prefer passing the UNROLLED host (numpy) params: quantization then
    happens host-side and only int8 bytes ever upload.  Stacked device
    params also work, but ``np.asarray`` on them is a full-encoder
    device→host fetch (~1.2 GB f32 at whisper-medium — minutes through the
    18 MB/s relay)."""

    def quantize_paths(layer: Dict[str, Any]) -> Dict[str, Any]:
        layer = dict(layer)
        for path in _ENC_LOOP_LINEARS:
            parent = layer
            for key in path[:-1]:
                parent[key] = dict(parent[key])
                parent = parent[key]
            parent[path[-1]] = _quantize_linear_params(parent[path[-1]])
        return layer

    out = dict(params)
    enc = dict(out["encoder"])
    layers = enc["layers"]
    if _is_stacked(layers):
        n_layers = jax.tree.leaves(layers)[0].shape[0]
        layers = quantize_paths(layers)
    else:
        n_layers = len(layers)
        layers = stack_layer_params([quantize_paths(l) for l in layers])
    act_scales = np.asarray(act_scales, dtype=np.float32)
    if act_scales.shape != (n_layers, len(_ENC_ACT_SITES)):
        raise ValueError(
            f"act_scales must be [{n_layers}, {len(_ENC_ACT_SITES)}], "
            f"got {act_scales.shape}"
        )
    layers["act_scales"] = {
        site: act_scales[:, i] for i, site in enumerate(_ENC_ACT_SITES)
    }
    enc["layers"] = layers
    out["encoder"] = enc
    return out


def quantize_encoder(
    params: Dict[str, Any],
    calibration_features: jax.Array,
    config: WhisperConfig,
    dtype: Any = jnp.float32,
) -> Dict[str, Any]:
    """Calibrate + quantize in one call (see the two pieces for knobs)."""
    scales = calibrate_encoder_act_scales(params, calibration_features, config, dtype)
    return quantize_encoder_layers(params, scales)


# ---------------------------------------------------------------------------
# encoder


def encoder_layer(p: Dict[str, Any], x: jax.Array, num_heads: int) -> jax.Array:
    if "act_scales" in p:
        return encoder_layer_int8(p, x, num_heads)
    h = _layer_norm(p["self_attn_layer_norm"], x)
    x = x + _mha(p["self_attn"], h, h, num_heads)
    h = _layer_norm(p["final_layer_norm"], x)
    h = jax.nn.gelu(_linear(p["fc1"], h), approximate=False)
    return x + _linear(p["fc2"], h)


def encoder_forward(
    params: Dict[str, Any],
    input_features: jax.Array,  # [B, n_mels, 3000]
    config: WhisperConfig,
    output_hidden_states: bool = False,
    dtype: Any = jnp.float32,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Returns (last_hidden_state [B, 1500, D], hidden_states [n_layers+1, B, 1500, D]
    or None).

    ``hidden_states[i]`` is the input to layer i (index 0 = post-conv+pos
    embeddings), matching HF's ``output_hidden_states=True`` tuple that the
    reference slices [10:22] (src/utils.py:188-192).
    """
    p = params["encoder"]
    x = jnp.transpose(input_features, (0, 2, 1)).astype(dtype)  # [B, T, n_mels]
    x = jax.nn.gelu(_conv1d(p["conv1"], x, stride=1), approximate=False)
    x = jax.nn.gelu(_conv1d(p["conv2"], x, stride=2), approximate=False)
    x = x + p["embed_positions"]["weight"].astype(dtype)

    if _is_stacked(p["layers"]):
        # scan-over-layers: the layer body is traced ONCE (HLO ~n_layers×
        # smaller — what lets whisper-medium compile through the relay)
        def body(h, layer_p):
            y = encoder_layer(layer_p, h, config.encoder_attention_heads)
            return y, (y if output_hidden_states else None)

        x0 = x
        x, ys = jax.lax.scan(body, x, p["layers"])
        last = _layer_norm(p["layer_norm"], x)
        if output_hidden_states:
            # HF's tuple: index 0 = post-conv+pos input, then each layer's
            # output, with the final entry replaced by the post-LayerNorm
            # output
            states_arr = jnp.concatenate([x0[None], ys[:-1], last[None]], axis=0)
            return last, states_arr
        return last, None

    states = [x] if output_hidden_states else None
    for i in range(config.encoder_layers):
        x = encoder_layer(p["layers"][i], x, config.encoder_attention_heads)
        if output_hidden_states:
            states.append(x)
    last = _layer_norm(p["layer_norm"], x)
    if output_hidden_states:
        # HF replaces the final entry with the post-LayerNorm output
        states[-1] = last
        return last, jnp.stack(states, axis=0)
    return last, None


def encoder_kws_stack(
    params: Dict[str, Any],
    input_features: jax.Array,
    config: WhisperConfig,
    layer_slice: Tuple[int, int] = (10, 22),
    valid_frames: Optional[jax.Array] = None,
    dtype: Any = jnp.float32,
    return_encoding: bool = False,
):
    """The KWS embedding producer: hidden_states[lo:hi], L2-normalized over
    the embedding dim (reference src/utils.py:188-195, cb_whisper.py:100-106).

    Returns [B, n_slabs, T_enc, D] (or ``(stack, last_hidden_state)`` when
    ``return_encoding=True`` — the single-encode fusion path: one encoder
    forward feeds both KWS and the decoder's cross-attention, replacing the
    reference's two encoder passes per segment, cb_whisper.py:72 vs
    generate's internal encoder).  If ``valid_frames`` is given, frames at
    or beyond it are zeroed (the reference instead truncates to
    ceil(unpadded/2); zero-padding keeps the shape static for XLA).
    """
    lo, hi = layer_slice
    if not (0 <= lo < hi <= config.encoder_layers + 1):
        # slicing past the end would silently produce EMPTY caches (the
        # torch reference instead crashes on torch.cat([]), utils.py:193)
        raise ValueError(
            f"layer_slice {layer_slice} out of range for a "
            f"{config.encoder_layers}-layer encoder"
        )
    last, states = encoder_forward(
        params, input_features, config, output_hidden_states=True, dtype=dtype,
    )
    stack = jnp.transpose(states[lo:hi], (1, 0, 2, 3)).astype(jnp.float32)
    stack = stack / jnp.linalg.norm(stack, axis=-1, keepdims=True)
    if valid_frames is not None:
        t = jnp.arange(stack.shape[2])
        mask = (t[None, :] < valid_frames[:, None])[:, None, :, None]
        stack = jnp.where(mask, stack, 0.0)
    if return_encoding:
        return stack, last
    return stack


# ---------------------------------------------------------------------------
# decoder (explicit KV cache)


def init_cache(
    config: WhisperConfig, batch: int, max_len: int, dtype: Any = jnp.float32,
    stacked: bool = False, kv_int8: bool = False, staging_window: int = 0,
) -> Dict[str, Any]:
    """``kv_int8`` (stacked only): the K/V slabs are stored int8 with
    per-token (per layer, per row) f32 scales — halves the dominant
    per-step cache read of batched beam decode vs bf16.  APPROXIMATE
    (8-bit K/V rounding; the per-token scale is exact w.r.t. the stored
    representation since it factors out of the q·k dot product and folds
    into the softmax weights on the value side).  Serving lever — qualify
    with tools/validate_approx.py like the other int8 modes.

    ``staging_window`` W > 0 (stacked only): staged cache writes.  The
    attention dot forces the big K/V slabs into a position-on-lanes layout
    where every single-token dynamic-update-slice pays a full-slab
    read-modify-write (measured 47% of beam-decode device time at
    whisper-medium — docs/PERF.md round-5 attribution); with staging the
    last ≤W tokens live in small ``ks``/``vs`` window buffers (compute
    dtype) that the attention reads as an extra score block, and the big
    slab is written once every W steps.  Exact for ``dtype`` caches (same
    exponential set, f32-rounding-level concat-order differences); for
    ``kv_int8`` the window tokens are attended at full precision until the
    flush quantizes them — at most MORE accurate than immediate
    quantization, still an approximate serving lever."""
    head_dim = config.d_model // config.decoder_attention_heads
    shape = (batch, max_len, config.decoder_attention_heads, head_dim)
    if kv_int8:
        if not stacked:
            raise ValueError("kv_int8 cache requires scan-over-layers (stacked)")
        lshape = (config.decoder_layers,) + shape
        sshape = (config.decoder_layers, batch, max_len)
        layers = {
            "k": jnp.zeros(lshape, jnp.int8),
            "v": jnp.zeros(lshape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v_scale": jnp.zeros(sshape, jnp.float32),
        }
    elif stacked:
        lshape = (config.decoder_layers,) + shape
        layers = {"k": jnp.zeros(lshape, dtype), "v": jnp.zeros(lshape, dtype)}
    else:
        layers = [
            {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for _ in range(config.decoder_layers)
        ]
    cache = {"index": jnp.zeros((), dtype=jnp.int32), "layers": layers}
    if staging_window:
        if not stacked:
            raise ValueError(
                "staging_window requires scan-over-layers (stacked)")
        if not (0 < staging_window < max_len):
            raise ValueError(
                f"staging_window must be in (0, max_len={max_len}); "
                f"got {staging_window}")
        wshape = (
            config.decoder_layers, batch, staging_window,
            config.decoder_attention_heads, head_dim,
        )
        layers["ks"] = jnp.zeros(wshape, dtype)
        layers["vs"] = jnp.zeros(wshape, dtype)
        cache["base"] = jnp.zeros((), dtype=jnp.int32)
    return cache


def flush_staging(cache: Dict[str, Any]) -> Dict[str, Any]:
    """Commit the staging window into the big K/V slabs (staged-write mode).

    The decode loops call this once every W steps at the window boundary
    (decoding/beam.py) — UNCONDITIONALLY, so the while-loop carry keeps
    aliasing the slabs in place.  A ``lax.cond``-gated per-step flush was
    microbenched at 78-152 us/layer-step (the cond re-copies the slab every
    iteration, ``tools/bench_kv_dus.py``); the window flush pays the
    full-slab read-modify-write once per W steps instead.

    For int8 slabs the W-block quantizes here with the same per-token
    scales the unstaged path would have used.  No-op for non-staged
    caches."""
    if not (isinstance(cache, dict) and "base" in cache):
        return cache
    layers = cache["layers"]
    base = cache["base"]
    W = layers["ks"].shape[2]
    ks, vs = layers["ks"], layers["vs"]
    out = dict(layers)
    if "k_scale" in layers:
        kq, ksc = _quantize_kv(ks)
        vq, vsc = _quantize_kv(vs)
        out["k"] = jax.lax.dynamic_update_slice(
            layers["k"], kq, (0, 0, base, 0, 0))
        out["v"] = jax.lax.dynamic_update_slice(
            layers["v"], vq, (0, 0, base, 0, 0))
        out["k_scale"] = jax.lax.dynamic_update_slice(
            layers["k_scale"], ksc, (0, 0, base))
        out["v_scale"] = jax.lax.dynamic_update_slice(
            layers["v_scale"], vsc, (0, 0, base))
    else:
        out["k"] = jax.lax.dynamic_update_slice(
            layers["k"], ks.astype(layers["k"].dtype), (0, 0, base, 0, 0))
        out["v"] = jax.lax.dynamic_update_slice(
            layers["v"], vs.astype(layers["v"].dtype), (0, 0, base, 0, 0))
    return dict(cache, layers=out, base=base + W)


def _quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token int8: x [..., t, H, Dh] → (int8 same shape, scale [..., t]).

    The scale is per (row, token) over all heads/dims, so dequantization
    factors out of attention contractions exactly: q·(s·k8) = s·(q·k8).
    Works on [B, t, H, Dh] slabs and on [L, B, W, H, Dh] staging blocks
    (staged-write flush) alike — the reduction is over the head/dim axes."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(-2, -1))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None, None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def precompute_cross_kv(
    params: Dict[str, Any], encoder_out: jax.Array, config: WhisperConfig,
    int8: bool = False,
):
    """Cross-attention K/V depend only on the encoder output; compute once
    per segment instead of per decode step.

    Stacked params: all layers' K (and V) projections are ONE einsum over a
    [L, D, D] weight — a single (B·T, D)×(D, L·D) matmul that fills the MXU
    far better than 24 small ones.  Returns a stacked {"k","v"} dict with a
    leading layer axis (list of per-layer dicts in unrolled layout).

    ``int8`` (stacked only, serving approximation): store K/V as int8 with
    per-(layer, row, token) f32 scales — halves the per-step cross-K/V
    read, which is the 1500-frame-per-layer slab every decode step re-reads
    (beam-shared, so ~T_enc·D·2·L bytes per batch item per step).  The
    scale factors out of the attention contractions exactly
    (:func:`_attention`); only the 8-bit K/V rounding is approximate.
    Quantization cost is once per segment, off the decode loop.
    """
    h = config.decoder_attention_heads
    layers = params["decoder"]["layers"]
    if _is_stacked(layers):
        p = layers["encoder_attn"]
        dt = encoder_out.dtype
        k = jnp.einsum("btd,ldo->lbto", encoder_out, p["k_proj"]["weight"].astype(dt))
        v = jnp.einsum("btd,ldo->lbto", encoder_out, p["v_proj"]["weight"].astype(dt))
        v = v + p["v_proj"]["bias"].astype(dt)[:, None, None, :]
        l, b, t, d = k.shape
        k = k.reshape(l, b, t, h, d // h)
        v = v.reshape(l, b, t, h, d // h)
        if int8:
            k8, ks = _quantize_kv(k.reshape(l * b, t, h, d // h))
            v8, vs = _quantize_kv(v.reshape(l * b, t, h, d // h))
            return {
                "k": k8.reshape(l, b, t, h, d // h),
                "v": v8.reshape(l, b, t, h, d // h),
                "k_scale": ks.reshape(l, b, t),
                "v_scale": vs.reshape(l, b, t),
            }
        return {"k": k, "v": v}
    if int8:
        raise ValueError("int8 cross K/V requires scan-over-layers (stacked params)")
    out = []
    for layer in layers:
        p = layer["encoder_attn"]
        out.append(
            {
                "k": _split_heads(_linear(p["k_proj"], encoder_out), h),
                "v": _split_heads(_linear(p["v_proj"], encoder_out), h),
            }
        )
    return out


def _ancestry_attention(
    q: jax.Array,  # [B·K, 1, H, Dh] (already scaled)
    k: jax.Array,  # [B·K, T, H, Dh] cache (rows UNPERMUTED across steps)
    v: jax.Array,  # [B·K, T, H, Dh]
    beam_onehot: jax.Array,  # [B, K, K', T] — 1 where slot t of logical
    #                          beam k lives in physical row k' of the item
    mask: jax.Array,  # [B·K or 1, 1, 1, T], True=keep
) -> jax.Array:
    """Beam-search self-attention WITHOUT per-step KV-cache reordering.

    Standard beam search gathers the whole self-attention cache with the
    beam permutation every step (HF reorder_cache) — at whisper-large-v2
    beam-5 that is ~3 GB/step of pure HBM reorder traffic, 2x the
    attention read itself.  Here the cache rows stay put (each logical
    beam row appends its own K/V in place) and a per-slot ancestry map
    selects the right physical row INSIDE the attention contraction:

        scores[b,k,t] = sum_{k'} (q[b,k] . K[b,k',t]) * onehot[b,k,k',t]

    The k' contraction is exactly-one-hot, so the selected dot product is
    bit-identical to attending a gathered cache; the extra K'x score/value
    FLOPs are MXU noise next to the eliminated HBM reorder (measured
    section in BASELINE.md).  Decode-step (Tq==1) only."""
    Bi, Kb, Kp, T = beam_onehot.shape
    H, Dh = q.shape[2], q.shape[3]
    qb = q.reshape(Bi, Kb, H, Dh)
    kb = k.reshape(Bi, Kp, T, H, Dh)
    vb = v.reshape(Bi, Kp, T, H, Dh)
    scores = jnp.einsum(
        "bkhd,bpthd->bhkpt", qb, kb, preferred_element_type=jnp.float32
    )
    sel = beam_onehot.astype(jnp.float32)
    scores = jnp.einsum("bhkpt,bkpt->bhkt", scores, sel)
    if mask.shape[0] == 1:
        m = mask[:, :, 0, :][:, :, None, :]  # [1, 1, 1, T]
    else:
        m = mask.reshape(Bi, Kb, 1, T).transpose(0, 2, 1, 3)  # [Bi, 1, Kb, T]
    scores = jnp.where(m, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)  # [Bi, H, Kb, T]
    w2 = jnp.einsum("bhkt,bkpt->bhkpt", probs, beam_onehot.astype(v.dtype))
    attn = jnp.einsum("bhkpt,bpthd->bkhd", w2, vb)
    return attn.reshape(Bi * Kb, 1, H, Dh)


def _attention_split(
    q: jax.Array,  # [B, 1, H, Dh] (already scaled)
    k_cache: jax.Array,  # [B, T, H, Dh] — slot `index` STALE (strict-masked)
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, 1, H, Dh] — the current token's K/V
    v_new: jax.Array,
    mask: jax.Array,  # broadcastable [B, H, 1, T], True=keep; STRICT (< index)
    k_scale: Optional[jax.Array] = None,  # [B, T] per-token int8 dequant
    v_scale: Optional[jax.Array] = None,
    stage_k: Optional[jax.Array] = None,  # [B, W, H, Dh] staged recent tokens
    stage_v: Optional[jax.Array] = None,
    stage_mask: Optional[jax.Array] = None,  # broadcastable [B, 1, 1, W]
) -> jax.Array:
    """Decode-step attention that reads the cache WITHOUT writing it first.

    The in-place cache path (decoder_forward, single-token steps) defers
    the K/V cache write to ONE tiny dynamic_update_slice outside the layer
    scan; the current token's K/V therefore isn't in the cache yet and is
    attended via an extra concatenated score column.  Exact (the same set
    of exponentials enters the softmax; only the summation order differs
    at f32 rounding level).  With ``k_scale``/``v_scale`` the cache slabs
    are int8 and the per-token scale factors out of the contractions:
    q·(s·k8) = s·(q·k8) on the score side, (p·s)·v8 on the value side.

    ``stage_k``/``stage_v`` (staged-write serving mode, round 5): the last
    ≤W tokens live in a small position-window buffer instead of the big
    slab (whose dot-forced position-on-lanes layout makes every in-carry
    single-token write a full-slab read-modify-write — docs/PERF.md
    round-5 attribution); they contribute a third score block.  The big
    slab's ``mask`` must already exclude the staged positions (key_pos <
    flush base), so the exponential set is identical to the unstaged
    path."""
    cdt = q.dtype
    scores_c = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k_cache.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    if k_scale is not None:
        scores_c = scores_c * k_scale[:, None, None, :]
    scores_c = jnp.where(mask, scores_c, jnp.finfo(jnp.float32).min)
    blocks = [scores_c]
    if stage_k is not None:
        scores_s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, stage_k.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        scores_s = jnp.where(stage_mask, scores_s, jnp.finfo(jnp.float32).min)
        blocks.append(scores_s)
    score_n = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k_new, preferred_element_type=jnp.float32
    )
    blocks.append(score_n)
    probs = jax.nn.softmax(jnp.concatenate(blocks, axis=-1), axis=-1)
    T = k_cache.shape[1]
    probs_c = probs[..., :T]
    if v_scale is not None:
        probs_c = probs_c * v_scale[:, None, None, :]
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs_c.astype(cdt), v_cache.astype(cdt)
    ) + jnp.einsum("bhqk,bkhd->bqhd", probs[..., -1:].astype(cdt), v_new)
    if stage_k is not None:
        out = out + jnp.einsum(
            "bhqk,bkhd->bqhd", probs[..., T:-1].astype(cdt),
            stage_v.astype(cdt),
        )
    return out


def _ancestry_attention_split(
    q: jax.Array,  # [B·K, 1, H, Dh] (already scaled)
    k_cache: jax.Array,  # [B·K, T, H, Dh] (rows UNPERMUTED; slot index stale)
    v_cache: jax.Array,
    k_new: jax.Array,  # [B·K, 1, H, Dh]
    v_new: jax.Array,
    beam_onehot: jax.Array,  # [B, K, K', T]
    mask: jax.Array,  # [B·K or 1, 1, 1, T], True=keep; STRICT (< index)
    k_scale: Optional[jax.Array] = None,  # [B·K, T] per-token int8 dequant
    v_scale: Optional[jax.Array] = None,
    stage_k: Optional[jax.Array] = None,  # [B·K, W, H, Dh] staged tokens
    stage_v: Optional[jax.Array] = None,
    stage_mask: Optional[jax.Array] = None,  # broadcastable [B·K or 1,1,1,W]
    stage_onehot: Optional[jax.Array] = None,  # [B, K, K', W] — ancestry at
    #                                            the staged positions
) -> jax.Array:
    """`_ancestry_attention` with the deferred-write current-token column.

    History slots resolve through the ancestry one-hot as before; the
    current token always lives in the row's OWN physical slot (each beam
    row appends in place, ancestry at the current slot is identity), so
    its score/value bypass the selector.  int8 per-token cache scales fold
    INTO the one-hot selector (exactly one physical row is selected per
    slot, so scaling the selector scales the selected product).

    ``stage_k``/``stage_v`` (staged-write serving mode): the last ≤W
    tokens live in a small window buffer (see ``_attention_split``); their
    positions resolve through ``stage_onehot`` (the ancestry columns at
    the staged positions) exactly like big-slab history — beam rows stay
    physically unpermuted in the staging buffer too."""
    Bi, Kb, Kp, T = beam_onehot.shape
    H, Dh = q.shape[2], q.shape[3]
    cdt = q.dtype
    qb = q.reshape(Bi, Kb, H, Dh)
    kb = k_cache.reshape(Bi, Kp, T, H, Dh).astype(cdt)
    vb = v_cache.reshape(Bi, Kp, T, H, Dh).astype(cdt)
    scores = jnp.einsum(
        "bkhd,bpthd->bhkpt", qb, kb, preferred_element_type=jnp.float32
    )
    sel = beam_onehot.astype(jnp.float32)
    if k_scale is not None:
        sel = sel * k_scale.reshape(Bi, Kp, T)[:, None, :, :]
    scores = jnp.einsum("bhkpt,bkpt->bhkt", scores, sel)
    if mask.shape[0] == 1:
        m = mask[:, :, 0, :][:, :, None, :]  # [1, 1, 1, T]
    else:
        m = mask.reshape(Bi, Kb, 1, T).transpose(0, 2, 1, 3)  # [Bi, 1, Kb, T]
    scores = jnp.where(m, scores, jnp.finfo(jnp.float32).min)
    blocks = [scores]
    if stage_k is not None:
        W = stage_k.shape[1]
        sb = stage_k.reshape(Bi, Kp, W, H, Dh).astype(cdt)
        scores_s = jnp.einsum(
            "bkhd,bpthd->bhkpt", qb, sb, preferred_element_type=jnp.float32
        )
        scores_s = jnp.einsum(
            "bhkpt,bkpt->bhkt", scores_s, stage_onehot.astype(jnp.float32)
        )
        if stage_mask.shape[0] == 1:
            ms = stage_mask[:, :, 0, :][:, :, None, :]
        else:
            ms = stage_mask.reshape(Bi, Kb, 1, W).transpose(0, 2, 1, 3)
        scores_s = jnp.where(ms, scores_s, jnp.finfo(jnp.float32).min)
        blocks.append(scores_s)
    score_n = jnp.einsum(
        "bkhd,bkhd->bhk", qb, k_new.reshape(Bi, Kb, H, Dh),
        preferred_element_type=jnp.float32,
    )  # own-row current token
    blocks.append(score_n[..., None])
    probs = jax.nn.softmax(jnp.concatenate(blocks, axis=-1), axis=-1)
    sel_v = beam_onehot.astype(jnp.float32)
    if v_scale is not None:
        sel_v = sel_v * v_scale.reshape(Bi, Kp, T)[:, None, :, :]
    w2 = jnp.einsum("bhkt,bkpt->bhkpt", probs[..., :T], sel_v).astype(cdt)
    attn = jnp.einsum("bhkpt,bpthd->bkhd", w2, vb) + jnp.einsum(
        "bhk,bkhd->bkhd", probs[..., -1].astype(cdt), v_new.reshape(Bi, Kb, H, Dh)
    )
    if stage_k is not None:
        vsb = stage_v.reshape(Bi, Kp, W, H, Dh).astype(cdt)
        w2s = jnp.einsum(
            "bhkt,bkpt->bhkpt", probs[..., T:-1],
            stage_onehot.astype(jnp.float32),
        ).astype(cdt)
        attn = attn + jnp.einsum("bhkpt,bpthd->bkhd", w2s, vsb)
    return attn.reshape(Bi * Kb, 1, H, Dh)


def _decoder_layer(
    p: Dict[str, Any],
    x: jax.Array,
    cross_kv: Dict[str, jax.Array],
    num_heads: int,
    self_mask: jax.Array,
    cache_layer: Optional[Dict[str, jax.Array]],
    cache_index: Optional[jax.Array],
    cross_mask: Optional[jax.Array] = None,
    beam_onehot: Optional[jax.Array] = None,
    inplace_cache: bool = False,  # defer the cache write (self_mask STRICT)
    stage_layer: Optional[Dict[str, jax.Array]] = None,  # {"ks","vs"} window
    stage_mask: Optional[jax.Array] = None,
    stage_onehot: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    head_dim = x.shape[-1] // num_heads

    # self attention
    h = _layer_norm(p["self_attn_layer_norm"], x)
    q = _split_heads(_linear(p["self_attn"]["q_proj"], h), num_heads) * (head_dim**-0.5)
    k = _split_heads(_linear(p["self_attn"]["k_proj"], h), num_heads)
    v = _split_heads(_linear(p["self_attn"]["v_proj"], h), num_heads)
    if inplace_cache:
        # in-place KV cache (single-token decode): do NOT rebuild the
        # [B, T, H, Dh] slabs here — the whole-slab dynamic_update_slice
        # plus the layer-scan's ys restack copied the ENTIRE cache every
        # step (profiled at ~50% of beam-decode device time at
        # whisper-medium, docs/PERF.md).  The layer returns just the
        # current token's K/V; decoder_forward commits all layers with one
        # tiny dynamic_update_slice the while-loop carry can alias.
        # With ``stage_layer`` (staged-write mode) that commit goes into
        # the small position-window buffer instead and this layer's
        # attention reads big slab + staging + current token.
        int8_cache = "k_scale" in cache_layer
        ks = cache_layer["k_scale"] if int8_cache else None
        vs = cache_layer["v_scale"] if int8_cache else None
        stage_k = stage_layer["ks"] if stage_layer is not None else None
        stage_v = stage_layer["vs"] if stage_layer is not None else None
        if beam_onehot is not None:
            attn = _ancestry_attention_split(
                q, cache_layer["k"], cache_layer["v"],
                k.astype(q.dtype), v.astype(q.dtype),
                beam_onehot, self_mask, k_scale=ks, v_scale=vs,
                stage_k=stage_k, stage_v=stage_v, stage_mask=stage_mask,
                stage_onehot=stage_onehot,
            )
        else:
            attn = _attention_split(
                q, cache_layer["k"], cache_layer["v"],
                k.astype(q.dtype), v.astype(q.dtype), self_mask,
                k_scale=ks, v_scale=vs,
                stage_k=stage_k, stage_v=stage_v, stage_mask=stage_mask,
            )
        if stage_layer is not None:
            # staged write: keep the token in the compute dtype; int8
            # quantization (if any) happens at flush time on the whole
            # W-block (decoder_forward._flush_staging)
            new_cache_layer = {
                "k": k.astype(stage_layer["ks"].dtype),
                "v": v.astype(stage_layer["vs"].dtype),
            }
        elif int8_cache:
            k_q, k_s = _quantize_kv(k)
            v_q, v_s = _quantize_kv(v)
            new_cache_layer = {
                "k": k_q, "v": v_q, "k_scale": k_s, "v_scale": v_s,
            }
        else:
            new_cache_layer = {
                "k": k.astype(cache_layer["k"].dtype),
                "v": v.astype(cache_layer["v"].dtype),
            }
        x = x + _linear(p["self_attn"]["out_proj"], attn.reshape(*attn.shape[:2], -1))
        return _decoder_layer_tail(
            p, x, cross_kv, num_heads, cross_mask
        ), new_cache_layer
    if cache_layer is not None:
        if "k_scale" in cache_layer:
            # int8 KV cache, multi-token write (prompt prefill): quantize
            # per token, store int8 + scales, attend over the DEQUANTIZED
            # updated slab (prefill happens once per segment — the bf16
            # materialization here is not the hot path)
            k_q, k_s = _quantize_kv(k)
            v_q, v_s = _quantize_kv(v)
            k_slab = jax.lax.dynamic_update_slice(
                cache_layer["k"], k_q, (0, cache_index, 0, 0))
            v_slab = jax.lax.dynamic_update_slice(
                cache_layer["v"], v_q, (0, cache_index, 0, 0))
            k_sc = jax.lax.dynamic_update_slice(
                cache_layer["k_scale"], k_s, (0, cache_index))
            v_sc = jax.lax.dynamic_update_slice(
                cache_layer["v_scale"], v_s, (0, cache_index))
            new_cache_layer = {
                "k": k_slab, "v": v_slab, "k_scale": k_sc, "v_scale": v_sc,
            }
            k = k_slab.astype(q.dtype) * k_sc[:, :, None, None].astype(q.dtype)
            v = v_slab.astype(q.dtype) * v_sc[:, :, None, None].astype(q.dtype)
        else:
            k = jax.lax.dynamic_update_slice(
                cache_layer["k"], k.astype(cache_layer["k"].dtype),
                (0, cache_index, 0, 0))
            v = jax.lax.dynamic_update_slice(
                cache_layer["v"], v.astype(cache_layer["v"].dtype),
                (0, cache_index, 0, 0))
        if "k_scale" not in cache_layer:
            new_cache_layer = {"k": k, "v": v}
    else:
        new_cache_layer = None
    if beam_onehot is not None:
        attn = _ancestry_attention(
            q, k.astype(q.dtype), v.astype(q.dtype), beam_onehot, self_mask
        )
    else:
        attn = _attention(q, k.astype(q.dtype), v.astype(q.dtype), self_mask)
    x = x + _linear(p["self_attn"]["out_proj"], attn.reshape(*attn.shape[:2], -1))
    return _decoder_layer_tail(p, x, cross_kv, num_heads, cross_mask), new_cache_layer


def _decoder_layer_tail(
    p: Dict[str, Any],
    x: jax.Array,
    cross_kv: Dict[str, jax.Array],
    num_heads: int,
    cross_mask: Optional[jax.Array],
) -> jax.Array:
    """Cross attention + MLP (shared by both self-attention cache paths)."""
    head_dim = x.shape[-1] // num_heads

    # cross attention (precomputed K/V; int8 codes + per-token scales when
    # the generator runs the cross_kv_int8 serving mode — the scales factor
    # out of the contractions inside _attention, so the slabs stay int8 in
    # HBM and only the 8-bit rounding approximates)
    h = _layer_norm(p["encoder_attn_layer_norm"], x)
    q = _split_heads(_linear(p["encoder_attn"]["q_proj"], h), num_heads) * (head_dim**-0.5)
    ks = cross_kv.get("k_scale")
    vs = cross_kv.get("v_scale")
    k_c, v_c = cross_kv["k"], cross_kv["v"]
    if ks is None:
        k_c = k_c.astype(q.dtype)
        v_c = v_c.astype(q.dtype)
    if q.shape[0] != k_c.shape[0]:
        # beam search: every beam of a batch item attends the SAME encoder
        # output, so the K/V stay at batch size and the beam dim folds into
        # the query-time axis (beam rows are grouped per item,
        # generate.py:_make_ctx) — cross attention has no positional
        # structure over queries, so this is exact, and it cuts the
        # dominant per-step HBM read (the 1500-frame K/V) by num_beams x.
        reps = q.shape[0] // k_c.shape[0]
        q_folded = q.reshape(k_c.shape[0], reps * q.shape[1], *q.shape[2:])
        attn = _attention(q_folded, k_c, v_c, cross_mask, k_scale=ks, v_scale=vs)
        attn = attn.reshape(*q.shape)
    else:
        attn = _attention(q, k_c, v_c, cross_mask, k_scale=ks, v_scale=vs)
    x = x + _linear(p["encoder_attn"]["out_proj"], attn.reshape(*attn.shape[:2], -1))

    # mlp
    h = _layer_norm(p["final_layer_norm"], x)
    h = jax.nn.gelu(_linear(p["fc1"], h), approximate=False)
    return x + _linear(p["fc2"], h)


def decoder_forward(
    params: Dict[str, Any],
    input_ids: jax.Array,  # [B, T]
    cross_kv: list,
    config: WhisperConfig,
    cache: Optional[Dict[str, Any]] = None,
    attention_mask: Optional[jax.Array] = None,  # [B, T_total] 1=attend
    cross_mask: Optional[jax.Array] = None,  # broadcastable [B, 1, 1, T_enc]
    dtype: Any = jnp.float32,
) -> Tuple[jax.Array, Optional[Dict[str, Any]]]:
    """Teacher-forcing (cache=None) or incremental decoding (cache given).

    With a cache, ``input_ids`` is the next chunk (usually length 1); its
    positions start at ``cache['index']`` (a traced scalar).
    ``attention_mask`` covers the full cached length
    (prompt padding is masked out, reproducing the reference's
    ``decoder_attention_mask`` from pad ids, src/model/pba_whisper.py:543).

    Returns (logits [B, T, vocab], updated cache).
    """
    p = params["decoder"]
    b, t = input_ids.shape
    offset = cache["index"] if cache is not None else 0
    new_base = None  # staged-write mode: set by the flush cond below
    assert jnp.ndim(offset) == 0, (
        "cache['index'] must be a scalar (the per-row vector protocol "
        "left with speculative decoding, round 5)"
    )

    tok = jnp.asarray(p["embed_tokens"]["weight"])[input_ids].astype(dtype)
    positions = jax.lax.dynamic_slice_in_dim(
        jnp.asarray(p["embed_positions"]["weight"]), offset, t, axis=0
    ).astype(dtype)
    x = tok + positions[None]

    if cache is not None:
        if _is_stacked(cache["layers"]):
            max_len = cache["layers"]["k"].shape[2]
        else:
            max_len = cache["layers"][0]["k"].shape[1]
        key_pos = jnp.arange(max_len)
        query_pos = offset + jnp.arange(t)
        mask = key_pos[None, :] <= query_pos[:, None]  # causal over cache
        mask = mask[None, None]  # [1, 1, T, max_len]
        if attention_mask is not None:
            mask = jnp.logical_and(mask, attention_mask[:, None, None, :].astype(bool))
    else:
        causal = jnp.tril(jnp.ones((t, t), dtype=bool))
        mask = causal[None, None]
        if attention_mask is not None:
            mask = jnp.logical_and(mask, attention_mask[:, None, None, :].astype(bool))

    # beam-search ancestry mode (gather-free beam KV cache): the cache
    # carries ``anc`` [B_items, K, T] mapping each logical beam's history
    # slot to the physical row that holds it; the one-hot selector is
    # layer-independent, built once here and closed over by every layer
    beam_onehot = None
    if cache is not None and "anc" in cache:
        if t != 1:
            raise ValueError("ancestry beam cache requires single-token decode steps")
        anc = cache["anc"]
        beam_onehot = (
            anc[:, :, None, :] == jnp.arange(anc.shape[1], dtype=anc.dtype)[None, None, :, None]
        )

    if _is_stacked(p["layers"]):
        # scan-over-layers: per-layer params, cross-KV, and cache slabs all
        # carry a leading [n_layers] axis and ride the scan's xs; the
        # updated cache comes back as the scan's ys (same stacked layout)
        heads = config.decoder_attention_heads

        # single-token decode steps use the IN-PLACE cache protocol (see
        # the carry comment below): the old protocol — each layer rebuilds
        # its full slab, the scan restacks all of them as ys — copied the
        # ENTIRE cache twice per step, profiled at ~50% of beam-decode
        # device time at whisper-medium (docs/PERF.md).
        # ECW_CACHE_INPLACE=0 restores the old lowering for A/B.
        inplace = (
            cache is not None
            and t == 1
            and os.environ.get("ECW_CACHE_INPLACE", "1") != "0"
        )
        staged = inplace and "ks" in cache["layers"]
        if inplace:
            # strict causal mask over cache slots: slot `offset` (the
            # current token, stale in the cache) comes from the split
            # attention's extra column instead.  Staged-write mode
            # additionally excludes [base, offset) — those positions live
            # in the staging window, not the big slab.
            n_layers = cache["layers"]["k"].shape[0]
            scale_keys = [k_ for k_ in ("k_scale", "v_scale")
                          if k_ in cache["layers"]]
            stage_keys, smask, stage_onehot = [], None, None
            if staged:
                stage_keys = ["ks", "vs"]
                W = cache["layers"]["ks"].shape[2]
                base = cache["base"]
                stage_off = offset - base  # this token's staging slot
                strict = key_pos[None, :] < base
                strict = strict[None, None]  # [1, 1, 1, max_len]
                # staged positions base+j: valid iff j < stage_off, and
                # subject to the same per-position attention_mask the big
                # slab applied when it held them (gathered, since base+W
                # can run past max_len near the end — masked slots then)
                spos = base + jnp.arange(W)
                sposc = jnp.clip(spos, 0, max_len - 1)
                svalid = (jnp.arange(W) < stage_off) & (spos < max_len)
                if attention_mask is not None:
                    am_s = jnp.take_along_axis(
                        attention_mask.astype(bool),
                        jnp.broadcast_to(
                            sposc[None, :], (attention_mask.shape[0], W)
                        ),
                        axis=1,
                    )
                    smask = (svalid[None, :] & am_s)[:, None, None, :]
                else:
                    smask = svalid[None, None, None, :]
                if beam_onehot is not None:
                    anc = cache["anc"]
                    anc_s = jnp.take_along_axis(
                        anc,
                        jnp.broadcast_to(
                            sposc[None, None, :],
                            (anc.shape[0], anc.shape[1], W),
                        ),
                        axis=2,
                    )
                    stage_onehot = (
                        anc_s[:, :, None, :]
                        == jnp.arange(anc.shape[1], dtype=anc.dtype)[
                            None, None, :, None
                        ]
                    )
            else:
                strict = key_pos[None, :] < query_pos[:, None]
                strict = strict[None, None]  # [1, 1, 1, max_len]
            if attention_mask is not None:
                strict = jnp.logical_and(
                    strict, attention_mask[:, None, None, :].astype(bool)
                )

            # the cache rides the scan CARRY (the standard JAX decode-cache
            # idiom): each iteration dynamic-slices its layer's slab out
            # for the attention read and commits the current token's K/V
            # with a tiny in-carry dynamic_update_slice.  A first attempt
            # put the cache on xs and committed with ONE post-scan DUS —
            # XLA would not alias a buffer read by the nested scan, so
            # every step still paid a full-cache copy (profiled 712 ms ×2
            # per 462-step launch at medium beam-5); carry DUS aliases.
            # (Round-5 addendum: even the in-carry single-token DUS pays a
            # full-slab read-modify-write under the dot-forced
            # position-on-lanes layout — 47% of beam device time, PERF.md
            # attribution.  Staged-write mode shrinks the per-step r-m-w
            # extent to the W-token window and flushes every W steps.)
            all_keys = ["k", "v"] + scale_keys + stage_keys

            def body(carry, xs):
                h = carry[0]
                slabs = dict(zip(all_keys, carry[1:]))
                layer_p, ckv, i = xs
                cl = {
                    name: jax.lax.dynamic_index_in_dim(
                        slabs[name], i, axis=0, keepdims=False
                    )
                    for name in ["k", "v"] + scale_keys
                }
                sl = None
                if staged:
                    sl = {
                        name: jax.lax.dynamic_index_in_dim(
                            slabs[name], i, axis=0, keepdims=False
                        )
                        for name in stage_keys
                    }
                h, new_kv = _decoder_layer(
                    layer_p, h, ckv, heads, strict, cl, offset, cross_mask,
                    beam_onehot, inplace_cache=True,
                    stage_layer=sl, stage_mask=smask,
                    stage_onehot=stage_onehot,
                )
                if staged:
                    slabs["ks"] = jax.lax.dynamic_update_slice(
                        slabs["ks"], new_kv["k"][None], (i, 0, stage_off, 0, 0)
                    )
                    slabs["vs"] = jax.lax.dynamic_update_slice(
                        slabs["vs"], new_kv["v"][None], (i, 0, stage_off, 0, 0)
                    )
                else:
                    slabs["k"] = jax.lax.dynamic_update_slice(
                        slabs["k"], new_kv["k"][None], (i, 0, offset, 0, 0)
                    )
                    slabs["v"] = jax.lax.dynamic_update_slice(
                        slabs["v"], new_kv["v"][None], (i, 0, offset, 0, 0)
                    )
                    for sk in scale_keys:
                        slabs[sk] = jax.lax.dynamic_update_slice(
                            slabs[sk], new_kv[sk][None], (i, 0, offset)
                        )
                return (h, *[slabs[n] for n in all_keys]), None

            init = (
                x,
                *[cache["layers"][n] for n in all_keys],
            )
            carry, _ = jax.lax.scan(
                body, init,
                (p["layers"], cross_kv, jnp.arange(n_layers, dtype=jnp.int32)),
            )
            x = carry[0]
            new_layers = dict(zip(all_keys, carry[1:]))
            if staged:
                # the flush is the DECODE LOOP's job, once every W steps
                # (beam.py window bodies call flush_staging) — a
                # cond-gated flush here was microbenched at 78-152 us/step
                # (lax.cond breaks the while-carry aliasing and re-copies
                # the slab every step, tools/bench_kv_dus.py); the
                # unconditional window flush aliases and amortizes ÷W
                new_base = base
        elif cache is not None:
            def body(h, xs):
                layer_p, ckv, cl = xs
                h, new_cl = _decoder_layer(
                    layer_p, h, ckv, heads, mask, cl, offset, cross_mask,
                    beam_onehot,
                )
                return h, new_cl

            # staged-write mode: multi-token (prefill) writes go straight
            # to the big slab; the staging buffers don't enter the scan and
            # come back untouched (empty — `base` covers the whole prompt)
            slab_layers = {
                n: buf for n, buf in cache["layers"].items()
                if n not in ("ks", "vs")
            }
            x, new_layers = jax.lax.scan(
                body, x, (p["layers"], cross_kv, slab_layers)
            )
            if "ks" in cache["layers"]:
                new_layers = dict(
                    new_layers,
                    ks=cache["layers"]["ks"],
                    vs=cache["layers"]["vs"],
                )
        else:
            def body(h, xs):
                layer_p, ckv = xs
                h, _ = _decoder_layer(
                    layer_p, h, ckv, heads, mask, None, None, cross_mask
                )
                return h, None

            x, new_layers = jax.lax.scan(body, x, (p["layers"], cross_kv))
    else:
        new_layers = []
        for i in range(config.decoder_layers):
            x, new_cache_layer = _decoder_layer(
                p["layers"][i],
                x,
                cross_kv[i],
                config.decoder_attention_heads,
                mask,
                cache["layers"][i] if cache is not None else None,
                offset if cache is not None else None,
                cross_mask,
                beam_onehot,
            )
            new_layers.append(new_cache_layer)

    x = _layer_norm(p["layer_norm"], x)
    if "embed_tokens_q" in p:
        # weight-only int8 vocab projection (serving mode): the int8→compute
        # convert fuses into the matmul operand load, so the dominant
        # per-step HBM read halves vs bf16; f32 row-scale epilogue
        # (quantize_vocab_projection)
        q = p["embed_tokens_q"]
        logits = jnp.einsum(
            "btd,vd->btv",
            x,
            q["qweight"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        logits = logits * q["scale"].astype(jnp.float32)
    else:
        # vocab projection: read the (tied) embedding in the compute dtype
        # with f32 accumulation — in bf16 mode XLA hoists the loop-invariant
        # weight convert out of the decode loop, halving the dominant
        # per-step HBM read (the [vocab, d_model] matrix); in f32 mode this
        # is unchanged
        logits = jnp.einsum(
            "btd,vd->btv",
            x,
            p["embed_tokens"]["weight"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    if cache is not None:
        new_cache = {"index": offset + t, "layers": new_layers}
        if "anc" in cache:
            new_cache["anc"] = cache["anc"]  # updated by the beam loop, not here
        if "base" in cache:
            # staged-write mode: single-token steps advance the flush base
            # on flush (the cond above); multi-token (prefill) writes went
            # straight to the big slab, so the staging window stays empty
            new_cache["base"] = new_base if new_base is not None else offset + t
    else:
        new_cache = None
    return logits, new_cache
