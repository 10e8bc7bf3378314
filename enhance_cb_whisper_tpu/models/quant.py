"""int8 quantized ResNet inference for catalog scoring.

The catalog-scoring hot loop (sim + resize folded matmuls + ResNet
classification, reference src/model/cb_whisper.py:110-129) is ~88% ResNet
conv FLOPs (20.8 of 23.7 GFLOP/pair at 150x750), and the v5e MXU runs
s8xs8->s32 convolutions ~1.8x faster than bf16 (measured on-chip).  This
module provides a post-training-quantized classifier for the *inference*
paths; training stays bf16/fp32.

Scheme:

* BatchNorm (eval mode, running stats) folded into the preceding conv:
  ``W_eff = W * gamma/sqrt(var+eps)``, ``b_eff = beta - mean*gamma/sqrt(..)``.
* Weights: symmetric per-output-channel int8.
* Activations, two modes:
  - **static** (the fast path): per-site scalar scales from a one-batch
    calibration pass (:func:`calibrate_act_scales`).  Quantization is then
    a constant-scale elementwise op that XLA fuses into the producing
    conv's epilogue (dequant + bias + ReLU + requant = one fused pass),
    intermediates are bf16 and the stem max-pool runs on int8.  This
    matters more than the MXU speedup: profiling the naive dynamic path
    showed the program 2x HBM-bound on f32 quant/dequant round-trips
    (convs were 36 ms of a 1,018 ms launch).
  - **dynamic** (no calibration needed): per-example ``max|x|/127`` on the
    fly.  Numerically self-contained but each scale needs a full extra
    read pass — use static for throughput.
* Conv in int8 with int32 accumulation; residual adds / global-pool / the
  final Dense head stay float.  A block's input is quantized ONCE and
  shared by the shortcut conv and the first block conv.

Parity target: score *ordering* (the argmax / threshold decisions of
src/model/cb_whisper.py:124-129), not bitwise probabilities —
tests/test_quant.py checks argmax agreement and probability closeness
against the fp32 model in both modes.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .resnet import ResNetConfig


def _default_pallas_1x1() -> frozenset:
    """Stage set routed through the Pallas fused s8 matmul+requant kernel
    (:mod:`..ops.matmul_s8`) for 1×1 convs.

    ``ECW_S8_PALLAS="stage_2,stage_3"`` selects stages; ``""``/``"0"``
    disables.  Microbench (tools/bench_s8_matmul.py, round 4): the kernel
    wins 1.151× over the XLA conv+requant chain at C=512 and loses
    (0.973×) at C=256 — deep stages qualify.  The DEFAULT stays empty
    until the full-scorer on-chip A/B wins (the flash-attention rule:
    kernels ship only with a measured end-to-end win)."""
    raw = os.environ.get("ECW_S8_PALLAS", "")
    if raw in ("", "0", "none"):
        return frozenset()
    return frozenset(s for s in raw.split(",") if s)

_EPS = 1e-5  # flax.linen.BatchNorm epsilon used throughout models/resnet.py


def _fold_conv_bn(conv: Dict, bn_params: Dict, bn_stats: Dict) -> Dict[str, np.ndarray]:
    """Fold eval-mode BatchNorm into the conv kernel; quantize per-channel."""
    w = np.asarray(conv["kernel"], np.float32)  # [kh, kw, I, O]
    gamma = np.asarray(bn_params["scale"], np.float32)
    beta = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    scale = gamma / np.sqrt(var + _EPS)
    w_eff = w * scale  # broadcast over O (last axis)
    b_eff = beta - mean * scale
    s_w = np.abs(w_eff).reshape(-1, w_eff.shape[-1]).max(axis=0) / 127.0
    s_w = np.maximum(s_w, 1e-12)
    wq = np.clip(np.rint(w_eff / s_w), -127, 127).astype(np.int8)
    return {"wq": wq, "s_w": s_w.astype(np.float32), "b": b_eff.astype(np.float32)}


def _quantize_resnet_tree(fx_p: Dict, fx_s: Dict, config: ResNetConfig) -> Dict[str, Any]:
    """Fold+quantize a bare `ResNet` param/stats tree (embedder + stages)."""

    def fold(module_p, module_s):
        return _fold_conv_bn(
            module_p["convolution"], module_p["normalization"], module_s["normalization"]
        )

    q: Dict[str, Any] = {"embedder": fold(fx_p["embedder"], fx_s["embedder"])}
    for stage_idx, depth in enumerate(config.depths):
        for block_idx in range(depth):
            name = f"stage_{stage_idx}_block_{block_idx}"
            bp, bs = fx_p[name], fx_s[name]
            block: Dict[str, Any] = {}
            for layer in sorted(k for k in bp if k.startswith("layer_")):
                block[layer] = fold(bp[layer], bs[layer])
            if "shortcut" in bp:
                block["shortcut"] = fold(bp["shortcut"], bs["shortcut"])
            q[name] = block
    return q


def quantize_resnet_classifier(variables: Dict, config: ResNetConfig) -> Dict[str, Any]:
    """Build the int8 parameter pytree from fp32 `ResNetClassifier`/`KWSModel`
    variables (``{'params': ..., 'batch_stats': ...}``)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    if "model" in params:  # KWSModel wraps ResNetClassifier as `model`
        params, stats = params["model"], stats["model"]
    q = _quantize_resnet_tree(
        params["feature_extractor"], stats["feature_extractor"], config
    )
    q["classifier"] = {
        "kernel": np.asarray(params["classifier"]["kernel"], np.float32),
        "bias": np.asarray(params["classifier"]["bias"], np.float32),
    }
    return q


def quantize_efficient_classifier(variables: Dict, config: ResNetConfig) -> Dict[str, Any]:
    """Same for `EfficientKWSModel` variables: its bare `ResNet` lives at
    ``params['model']`` with the Dense head as a sibling ``classifier``
    (efficient_kws/model.py:127-128)."""
    q = _quantize_resnet_tree(
        variables["params"]["model"], variables["batch_stats"]["model"], config
    )
    q["classifier"] = {
        "kernel": np.asarray(variables["params"]["classifier"]["kernel"], np.float32),
        "bias": np.asarray(variables["params"]["classifier"]["bias"], np.float32),
    }
    return q


def _conv_dn(x_shape, w_shape):
    return jax.lax.conv_dimension_numbers(x_shape, w_shape, ("NHWC", "HWIO", "NHWC"))


def _forward(
    config: ResNetConfig,
    qparams: Dict[str, Any],
    pixel_values: jax.Array,
    channels_last: bool,
    record: Optional[Dict[str, jax.Array]],
    float_stages: frozenset = frozenset(),
    pallas_1x1: frozenset = frozenset(),
):
    """Shared topology walker.

    ``record is None``  -> quantized int8 forward (static scales if
    ``qparams['act_scales']`` is present, else per-example dynamic);
    ``record`` a dict   -> f32 forward with the *dequantized* folded
    weights, recording ``max|x|`` at every activation-quantization site
    (the calibration pass; logits are returned but secondary).

    ``float_stages`` (e.g. ``{"stem", "stage_0"}``) runs those parts with
    the dequantized folded weights in the compute dtype and NO activation
    quantization — the mixed-precision boundary.  Motivation (round-4
    profile, docs/PERF.md): ~65% of the all-int8 program is the per-site
    activation requantization, pure elementwise HBM traffic proportional
    to activation bytes; the stem + stage_0 hold ~52% of the activation
    elements but only ~22% of the conv FLOPs (and their 64-channel convs
    under-fill the 128-lane MXU, so int8 buys them the least).  Skipping
    quantization there trades a small MXU loss for the biggest requant
    saving.
    """
    scales = qparams.get("act_scales") if record is None else None
    static = scales is not None

    def in_float(name: str) -> bool:
        if record is not None or not float_stages:
            return False
        stage = name.rsplit("_block_", 1)[0] if "_block_" in name else name
        return stage in float_stages
    # static mode keeps intermediates bf16 (half the HBM traffic); the
    # dynamic fallback and calibration run f32
    cdt = jnp.bfloat16 if static else jnp.float32

    x = pixel_values.astype(cdt)
    if not channels_last:
        x = jnp.transpose(x, (0, 2, 3, 1))

    def quant(site, xf):
        """-> (conv input representation, activation scale)."""
        if record is not None:
            record[site] = jnp.max(jnp.abs(xf))
            return xf, None
        if static:
            s = jnp.float32(scales[site])
        else:
            s = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True).astype(jnp.float32) / 127.0
            s = jnp.maximum(s, 1e-12)
        xq = jnp.clip(jnp.round(xf.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
        return xq, s

    def conv(xr, s_x, qc, stride, kernel_size, act):
        pad = kernel_size // 2
        if record is not None:
            w = qc["wq"].astype(jnp.float32) * qc["s_w"]
            z = jax.lax.conv_general_dilated(
                xr, w, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=_conv_dn(xr.shape, w.shape),
            )
            y = z + qc["b"]
        else:
            z = jax.lax.conv_general_dilated(
                xr, qc["wq"], (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=_conv_dn(xr.shape, qc["wq"].shape),
                preferred_element_type=jnp.int32,
            )
            # dequant + bias (+ ReLU below) — with a static scalar s_x this
            # is a constant-vector epilogue XLA fuses into the conv
            y = (z.astype(jnp.float32) * (s_x * qc["s_w"]) + qc["b"]).astype(cdt)
        return jax.nn.relu(y) if act else y

    def convf(xf, qc, stride, kernel_size, act):
        """Dequantized-folded-weight conv in the compute dtype (the
        mixed-precision float path; weight dequant is weight-sized, XLA
        CSEs it once per launch)."""
        pad = kernel_size // 2
        w = (qc["wq"].astype(jnp.float32) * qc["s_w"]).astype(cdt)
        z = jax.lax.conv_general_dilated(
            xf.astype(cdt), w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=_conv_dn(xf.shape, w.shape),
            preferred_element_type=jnp.float32,
        )
        y = (z + qc["b"]).astype(cdt)
        return jax.nn.relu(y) if act else y

    def chain(xr, s_x, qc, stride, kernel_size, site):
        """conv + ReLU + quantize-for-the-next-conv.  (A variant that folds
        the requantization into the conv epilogue — emitting the next conv's
        int8 input directly — was measured SLOWER on v5e: 5,568 vs 5,894
        pairs/s; XLA's own dequant/requant fusion beats the hand fold, so
        this stays the straightforward two-step.)"""
        h = conv(xr, s_x, qc, stride, kernel_size, act=True)
        return quant(site, h)

    def pmm(xr, s_x, qc, s_out, relu, residual=None, res_scale=None):
        """1×1 conv as the Pallas fused s8 matmul+requant
        (ops/matmul_s8.py): s8 codes in → s8 codes at ``s_out`` directly,
        the whole dequant→bias→ReLU→requant epilogue in registers
        (1 B in + 1 B out per element vs the XLA chain's 6 B)."""
        from ..ops.matmul_s8 import matmul_s8_requant, matmul_s8_requant_reference

        b, h, w, c = xr.shape
        n = qc["wq"].shape[-1]
        scale_v = (s_x * qc["s_w"] / s_out).astype(jnp.float32)
        bias_v = qc["b"] / s_out
        kwargs = dict(
            relu=relu,
            residual=None if residual is None else residual.reshape(b * h * w, n),
            res_scale=res_scale,
        )
        if (b * h * w) % 8:  # kernel wants M%8; XLA fallback is exact-enough
            y = matmul_s8_requant_reference(
                xr.reshape(b * h * w, c), qc["wq"].reshape(c, n),
                scale_v, bias_v, **kwargs,
            )
        else:
            y = matmul_s8_requant(
                xr.reshape(b * h * w, c), qc["wq"].reshape(c, n),
                scale_v, bias_v,
                interpret=jax.default_backend() == "cpu", **kwargs,
            )
        return y.reshape(b, h, w, n)

    def block_residual(x, xr, s_x, qb, stride, pre_quantized):
        if "shortcut" in qb:
            return conv(xr, s_x, qb["shortcut"], stride, 1, act=False)
        if pre_quantized is not None:
            # no shortcut and an int8 input (the pooled stem): dequantize
            return (xr.astype(jnp.float32) * s_x).astype(cdt)
        return x

    def float_input(x, pre_quantized):
        if pre_quantized is not None:  # int8 pooled stem feeding a float block
            xr, s_x = pre_quantized
            return (xr.astype(jnp.float32) * s_x).astype(cdt)
        return x

    def bottleneck(x, name, stride, pre_quantized=None):
        qb = qparams[name]
        if in_float(name):
            x = float_input(x, pre_quantized)
            residual = (
                convf(x, qb["shortcut"], stride, 1, act=False)
                if "shortcut" in qb else x
            )
            h = convf(x, qb["layer_0"], 1, 1, act=True)
            h = convf(h, qb["layer_1"], stride, 3, act=True)
            h = convf(h, qb["layer_2"], 1, 1, act=False)
            return jax.nn.relu(h + residual)
        xr, s_x = pre_quantized if pre_quantized is not None else quant(f"{name}.in", x)
        residual = block_residual(x, xr, s_x, qb, stride, pre_quantized)
        hr, s_h = chain(xr, s_x, qb["layer_0"], 1, 1, f"{name}.a")
        hr, s_h = chain(hr, s_h, qb["layer_1"], stride, 3, f"{name}.b")
        h = conv(hr, s_h, qb["layer_2"], 1, 1, act=False)
        return jax.nn.relu(h + residual)

    def bottleneck_pallas(x, name, stride, pre_quantized, next_site):
        """Bottleneck with its 1×1 convs on the Pallas fused s8 kernel.

        layer_0 (the 1×1 reduce) emits int8 at the ``.a`` scale with the
        whole requant epilogue in registers.  Non-shortcut blocks
        (stride 1, in==out channels) additionally fuse the TAIL —
        layer_2 + residual-add + ReLU + requantization to the NEXT
        block's input scale — into one kernel when the next block also
        runs this path (``next_site``), so the block consumes AND
        produces int8 codes and the only remaining elementwise requant
        is the ``.b`` site after the 3×3.  Shortcut blocks keep the XLA
        float tail (their residual is a strided conv output, not codes)."""
        qb = qparams[name]
        xr, s_x = pre_quantized if pre_quantized is not None else quant(f"{name}.in", x)
        s_a = jnp.float32(scales[f"{name}.a"])
        hr = pmm(xr, s_x, qb["layer_0"], s_a, relu=True)
        hr, s_b = chain(hr, s_a, qb["layer_1"], stride, 3, f"{name}.b")
        if "shortcut" in qb:
            residual = conv(xr, s_x, qb["shortcut"], stride, 1, act=False)
            h = conv(hr, s_b, qb["layer_2"], 1, 1, act=False)
            return jax.nn.relu(h + residual), None
        if next_site is not None:
            s_next = jnp.float32(scales[next_site])
            out = pmm(hr, s_b, qb["layer_2"], s_next, relu=True,
                      residual=xr, res_scale=s_x / s_next)
            return None, (out, s_next)
        h = conv(hr, s_b, qb["layer_2"], 1, 1, act=False)
        residual = (xr.astype(jnp.float32) * s_x).astype(cdt)
        return jax.nn.relu(h + residual), None

    def basic(x, name, stride, pre_quantized=None):
        qb = qparams[name]
        if in_float(name):
            x = float_input(x, pre_quantized)
            residual = (
                convf(x, qb["shortcut"], stride, 1, act=False)
                if "shortcut" in qb else x
            )
            h = convf(x, qb["layer_0"], stride, 3, act=True)
            h = convf(h, qb["layer_1"], 1, 3, act=False)
            return jax.nn.relu(h + residual)
        xr, s_x = pre_quantized if pre_quantized is not None else quant(f"{name}.in", x)
        residual = block_residual(x, xr, s_x, qb, stride, pre_quantized)
        hr, s_h = chain(xr, s_x, qb["layer_0"], stride, 3, f"{name}.a")
        h = conv(hr, s_h, qb["layer_1"], 1, 3, act=False)
        return jax.nn.relu(h + residual)

    # stem
    if in_float("stem"):
        x = convf(x, qparams["embedder"], 2, 7, act=True)
    else:
        xr, s_x = quant("input", x)
        x = conv(xr, s_x, qparams["embedder"], 2, 7, act=True)
    if record is None and static and not in_float("stage_0"):
        # quantization is monotonic, so it commutes with max-pool: quantize
        # the stem output first and pool int8 (1/4 the f32 pool traffic).
        # stage_0_block_0's input site therefore reuses the stem scale.
        s_stem = jnp.float32(scales["stage_0_block_0.in"])
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_stem), -127, 127).astype(jnp.int8)
        x = jax.lax.reduce_window(
            xq, jnp.int8(-128), jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        pooled_q = (x, s_stem)
    else:
        x = jax.lax.reduce_window(
            x, -jnp.inf if x.dtype != jnp.bfloat16 else jnp.bfloat16(-jnp.inf),
            jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        pooled_q = None

    block_fn = bottleneck if config.layer_type == "bottleneck" else basic

    plan = []
    for stage_idx, depth in enumerate(config.depths):
        first_stride = 2 if (stage_idx > 0 or config.downsample_in_first_stage) else 1
        for block_idx in range(depth):
            plan.append(
                (f"stage_{stage_idx}_block_{block_idx}",
                 first_stride if block_idx == 0 else 1)
            )

    use_pallas = (
        record is None and static and bool(pallas_1x1)
        and config.layer_type == "bottleneck"
    )

    def pallas_block(name: str) -> bool:
        if not use_pallas or in_float(name):
            return False
        if name.rsplit("_block_", 1)[0] not in pallas_1x1:
            return False
        qb = qparams[name]  # the kernel wants K, N multiples of 128
        return all(
            qb[l]["wq"].shape[-2] % 128 == 0 and qb[l]["wq"].shape[-1] % 128 == 0
            for l in ("layer_0", "layer_2")
        )

    xq = None  # int8 (codes, scale) handed between fused pallas blocks
    for idx, (name, stride) in enumerate(plan):
        # stage_0_block_0 in static mode consumes the already-int8 pooled
        # stem output instead of re-quantizing; later blocks consume the
        # previous pallas block's fused-tail codes when present
        pre = pooled_q if idx == 0 else xq
        xq = None
        if pallas_block(name):
            nxt = plan[idx + 1][0] if idx + 1 < len(plan) else None
            next_site = f"{nxt}.in" if nxt is not None and pallas_block(nxt) else None
            x, xq = bottleneck_pallas(x, name, stride, pre, next_site)
        else:
            x = block_fn(x, name, stride, pre_quantized=pre)

    features = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    return features @ qparams["classifier"]["kernel"] + qparams["classifier"]["bias"]


def quantized_apply(
    config: ResNetConfig,
    qparams: Dict[str, Any],
    pixel_values: jax.Array,
    channels_last: bool = False,
    float_stages=(),
    pallas_1x1=None,
):
    """int8 forward matching `ResNetClassifier.__call__` (eval mode).

    Returns logits [batch, num_labels].  Input is NCHW ([B, L, H, W]
    similarity maps) unless ``channels_last``.  Runs the fast static-scale
    path when ``qparams['act_scales']`` exists (see
    :func:`calibrate_act_scales`), else per-example dynamic quantization.
    ``float_stages`` (e.g. ``("stem", "stage_0")``) keeps those parts in
    the compute dtype — the mixed-precision boundary (see `_forward`).
    ``pallas_1x1`` selects stages whose bottleneck 1×1 convs run the
    Pallas fused s8 matmul+requant kernel (``None`` → ``ECW_S8_PALLAS``).
    """
    return _forward(
        config, qparams, pixel_values, channels_last, record=None,
        float_stages=frozenset(float_stages),
        pallas_1x1=_default_pallas_1x1() if pallas_1x1 is None
        else frozenset(pallas_1x1),
    )


def calibrate_act_scales(
    config: ResNetConfig,
    qparams: Dict[str, Any],
    images: jax.Array,
    channels_last: bool = False,
    margin: float = 1.0,
) -> Dict[str, Any]:
    """One-pass post-training calibration: run the folded (dequantized-
    weight) f32 network on a representative batch of similarity maps and
    set each site's scale to ``margin * max|x| / 127``.  Returns a new
    qparams pytree with ``act_scales`` — activating the fused static path
    in :func:`quantized_apply`."""
    record: Dict[str, jax.Array] = {}
    _forward(config, qparams, jnp.asarray(images), channels_last, record=record)
    scales = {
        site: float(np.maximum(np.asarray(v), 1e-9)) * margin / 127.0
        for site, v in record.items()
    }
    return {**qparams, "act_scales": scales}


def make_quantized_kws_apply(
    config: ResNetConfig,
    channels_last: bool = False,
    act_scales: Optional[Dict[str, float]] = None,
    float_stages=(),
    pallas_1x1=None,
):
    """Adapter with the `kws_apply(variables, images) -> logits` signature
    expected by `catalog.make_catalog_score_fn`; `variables` is the pytree
    from :func:`quantize_resnet_classifier` (optionally calibrated via
    :func:`calibrate_act_scales`).

    Pass ``act_scales`` here (rather than inside the pytree) to bake the
    calibrated scales in as compile-time constants: the quantize/dequant
    epilogue scale vectors then constant-fold, and — critically through the
    remote relay — they are not re-uploaded per launch.  `device_put` the
    weight pytree once for the same reason."""

    fs = frozenset(float_stages)
    p1 = _default_pallas_1x1() if pallas_1x1 is None else frozenset(pallas_1x1)

    def kws_apply(qparams, images):
        if act_scales is not None:
            qparams = {**qparams, "act_scales": act_scales}
        return quantized_apply(
            config, qparams, images, channels_last=channels_last,
            float_stages=fs, pallas_1x1=p1,
        )

    return kws_apply
