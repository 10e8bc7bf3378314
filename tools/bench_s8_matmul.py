"""On-chip A/B: Pallas fused s8 matmul+requant vs the XLA conv+requant chain.

The int8 catalog scorer's bound is the activation requantization between
convs (~65% of device time, docs/PERF.md): XLA emits conv(+dequant/bias/
ReLU epilogue, bf16 out) then a separate clamp_convert fusion.  The Pallas
kernel (ops/matmul_s8.py) does the whole chain in-register for 1×1 convs.

This microbench times BOTH at scorer-representative dims, relay-safe
(CLAUDE.md): N dependent iterations chained in ONE jit via fori_loop
(the s8 output feeds the next matmul — requires K==N), scalar output.

XLA side uses a real conv_general_dilated over [B, H, W, C] so the fusion
behavior matches the scorer's, then the standard dequant→requant pair.
Pallas side runs the same math on the reshaped [B·H·W, C].

Prints one JSON line {"metric": "s8_matmul_ab", ...}; integrate the kernel
into models/quant.py only if this wins (flash-attention precedent).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from enhance_cb_whisper_tpu.ops.matmul_s8 import matmul_s8_requant

B = int(os.environ.get("ECW_S8_B", "128"))
H = int(os.environ.get("ECW_S8_H", "19"))
W = int(os.environ.get("ECW_S8_W", "94"))
C = int(os.environ.get("ECW_S8_C", "256"))
# ECW_S8_N != C benches the RECTANGULAR pair C->N->C (two matmuls per
# chained iteration, e.g. the stage-3 bottleneck's 1024->512 / 512->2048
# shapes approximated as 1024->512->1024) — the square-C microbench can
# hide dims-specific Mosaic lowering differences
N_OUT = int(os.environ.get("ECW_S8_N", "0")) or C
ITERS = int(os.environ.get("ECW_S8_ITERS", "30"))
BLOCK_M = int(os.environ.get("ECW_S8_BLOCK_M", "1024"))


def _xla_chain(x, w, scale, bias, s_next):
    """conv s8 → s32 → f32 scale+bias+relu → bf16 (the conv fusion's root)
    → separate requant read → s8: the scorer's per-layer pattern
    (models/quant.py chain())."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    z = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    y = jax.nn.relu((z.astype(jnp.float32) * scale + bias).astype(jnp.bfloat16))
    return jnp.clip(
        jnp.round(y.astype(jnp.float32) / s_next), -127, 127
    ).astype(jnp.int8)


def main():
    rng = np.random.default_rng(0)
    x0 = rng.integers(-127, 128, (B, H, W, C)).astype(np.int8)
    w4 = rng.integers(-127, 128, (1, 1, C, N_OUT)).astype(np.int8)
    w4b = rng.integers(-127, 128, (1, 1, N_OUT, C)).astype(np.int8)
    # scales small enough that the chained outputs stay in range
    scale = (rng.uniform(0.5, 1.5, (N_OUT,)) * 2e-5).astype(np.float32)
    bias = rng.normal(0, 0.3, (N_OUT,)).astype(np.float32)
    scale_b = (rng.uniform(0.5, 1.5, (C,)) * 2e-5).astype(np.float32)
    bias_b = rng.normal(0, 0.3, (C,)).astype(np.float32)
    s_next = np.float32(0.8)

    x0j = jax.device_put(jnp.asarray(x0))
    w4j = jax.device_put(jnp.asarray(w4))
    w4bj = jax.device_put(jnp.asarray(w4b))
    w2j = jax.device_put(jnp.asarray(w4.reshape(C, N_OUT)))
    w2bj = jax.device_put(jnp.asarray(w4b.reshape(N_OUT, C)))
    sj = jax.device_put(jnp.asarray(scale))
    bj = jax.device_put(jnp.asarray(bias))
    sbj = jax.device_put(jnp.asarray(scale_b))
    bbj = jax.device_put(jnp.asarray(bias_b))
    # pallas folds the /s_next into scale+bias
    sfj = jax.device_put(jnp.asarray(scale / s_next))
    bfj = jax.device_put(jnp.asarray(bias / s_next))
    sfbj = jax.device_put(jnp.asarray(scale_b / s_next))
    bfbj = jax.device_put(jnp.asarray(bias_b / s_next))
    rect = N_OUT != C
    mms_per_iter = 2 if rect else 1

    @jax.jit
    def run_xla(x):
        def body(_, x):
            y = _xla_chain(x, w4j, sj, bj, s_next)
            if rect:
                y = _xla_chain(y, w4bj, sbj, bbj, s_next)
            return y
        x = jax.lax.fori_loop(0, ITERS, body, x)
        return jnp.sum(x.astype(jnp.int32))

    m = B * H * W

    @jax.jit
    def run_pallas(x):
        def body(_, xf):
            y = matmul_s8_requant(
                xf, w2j, sfj, bfj, relu=True, block_m=BLOCK_M
            )
            if rect:
                y = matmul_s8_requant(
                    y, w2bj, sfbj, bfbj, relu=True, block_m=BLOCK_M
                )
            return y
        xf = jax.lax.fori_loop(0, ITERS, body, x.reshape(m, C))
        return jnp.sum(xf.astype(jnp.int32))

    def timeit(f, x):
        v = f(x)
        np.asarray(v)  # compile barrier
        t0 = time.perf_counter()
        v = f(x)
        out = int(np.asarray(v))
        return (time.perf_counter() - t0) / ITERS * 1e3, out

    xla_ms, v_x = timeit(run_xla, x0j)
    pal_ms, v_p = timeit(run_pallas, x0j)

    flops = 2.0 * m * C * N_OUT * mms_per_iter
    print(json.dumps({
        "metric": "s8_matmul_ab",
        "value": round(xla_ms / pal_ms, 3),
        "unit": "x (pallas speedup over xla conv+requant chain)",
        "xla_ms": round(xla_ms, 4),
        "pallas_ms": round(pal_ms, 4),
        "xla_tops": round(flops / (xla_ms * 1e-3) / 1e12, 1),
        "pallas_tops": round(flops / (pal_ms * 1e-3) / 1e12, 1),
        "dims": [B, H, W, C, N_OUT],
        "iters": ITERS,
        "outputs_equal": v_x == v_p,
    }))


if __name__ == "__main__":
    main()
