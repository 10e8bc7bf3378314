"""Pallas fused s8×s8→s32 matmul with a requantizing epilogue.

Why this kernel exists (round-4 profile, docs/PERF.md): the int8 catalog
scorer spends ~65% of its device time on activation REQUANTIZATION —
between every pair of convs XLA materializes the dequantized bf16
activation (conv-fusion output, 2 B/elem write) and a separate
`clamp_convert` fusion re-reads it (2 B) and writes int8 (1 B).  XLA will
not emit an int8-typed root from its convolution fusions (the round-2
hand-fold attempt made it materialize the raw s32 conv output instead —
measured slower), so the dequant→bias→ReLU→requant epilogue costs
5 B/elem of HBM traffic that a fused kernel does for free in registers.

This kernel is that fusion for the 1×1 convolutions (plain matmuls over
[B·H·W, C]): s8 input → MXU s8×s8→s32 → per-channel scale+bias (f32) →
optional residual add → optional ReLU → round/clip → s8 output.  Per
activation element it moves 1 B in + 1 B out instead of XLA's 6 B
(2 B conv write + 2 B requant read + 1 B requant write + 1 B next read).

The caller folds the NEXT site's activation scale into ``scale``/``bias``
(and the residual's dequant scale into ``res_scale``) so the epilogue is a
single fused multiply-add chain:

    q = clip(round((acc · s_x·s_w/s_next) + b/s_next [+ r · s_r/s_next]), -127, 127)

Reference behavior being accelerated: the ResNet catalog scorer of
src/model/cb_whisper.py:110-129 / src/model/model.py:78-93 (quantized
variant: models/quant.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kernel_plain(x_ref, w_ref, scale_ref, bias_ref, o_ref, *, relu):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale_ref[...] + bias_ref[...]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[...] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def _kernel_residual(x_ref, w_ref, scale_ref, bias_ref, r_ref, rs_ref, o_ref, *, relu):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale_ref[...] + bias_ref[...]
    y = y + r_ref[...].astype(jnp.float32) * rs_ref[...]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[...] = jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)


def matmul_s8_requant(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    relu: bool = True,
    residual: jax.Array | None = None,
    res_scale: jax.Array | None = None,
    block_m: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """``clip(round(relu((x·w)·scale + bias [+ residual·res_scale])))`` → s8.

    x [M, K] int8, w [K, N] int8, scale/bias [N] f32 (already divided by the
    OUTPUT site's activation scale), residual [M, N] int8 with res_scale
    [N] or scalar f32.  M must be a multiple of 8; K, N of 128 (the caller
    pads channels — ResNet widths already satisfy this).
    """
    from jax.experimental import pallas as pl

    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)
    bm = min(block_m, m)
    while m % bm:
        bm //= 2
    grid = (m // bm,)

    scale2 = jnp.broadcast_to(scale.astype(jnp.float32).reshape(1, -1), (1, n))
    bias2 = jnp.broadcast_to(bias.astype(jnp.float32).reshape(1, -1), (1, n))

    in_specs = [
        pl.BlockSpec((bm, k), lambda i: (i, 0)),
        pl.BlockSpec((k, n), lambda i: (0, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
    ]
    operands = [x, w, scale2, bias2]
    if residual is not None:
        rs = jnp.broadcast_to(
            jnp.asarray(res_scale, jnp.float32).reshape(1, -1), (1, n)
        )
        in_specs += [
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ]
        operands += [residual, rs]
        kernel = functools.partial(_kernel_residual, relu=relu)
    else:
        kernel = functools.partial(_kernel_plain, relu=relu)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        interpret=interpret,
    )(*operands)


def matmul_s8_requant_reference(
    x, w, scale, bias, *, relu=True, residual=None, res_scale=None
):
    """Bit-exact XLA reference for the kernel (tests)."""
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * scale.reshape(1, -1) + bias.reshape(1, -1)
    if residual is not None:
        y = y + residual.astype(jnp.float32) * jnp.asarray(
            res_scale, jnp.float32
        ).reshape(1, -1)
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
