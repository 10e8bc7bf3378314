"""Microbench: single-position KV-cache writes under the dot-forced layout.

The round-5 beam-decode profile (docs/profiles/r5_med_beam5) showed the two
in-carry cache dynamic-update-slices at 47% of device time (67 us each per
layer-step).  The compiled HLO (tools/dump_decode_hlo.py) explains why: the
attention dot makes XLA lay the cache out position-minor
(s8[24,20,448,16,64]{2,4,3,1,0:T(8,128)(4,1)}), and a DUS whose dynamic index
lives on the LANES dimension lowers to a lane-shifted read-modify-write of
the touched slab — every sublane row has a written element, so the whole
layer slab is rewritten per step.

This bench isolates that cost at the beam-flagship slab shape
([rows=20, 448, 16, 64], the whisper-medium b4 beam-5 K slab) and measures
the candidate fix: stage writes in a small position-window buffer (the dot
still reads the big slab) so the per-step r-m-w extent shrinks from
448 positions to W.

Protocol (CLAUDE.md): chain iterations inside one jit via fori_loop, reduce
to a scalar, fetch with np.asarray as the completion barrier; run two
iteration counts and take the slope so the relay's per-launch overhead
cancels.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("KV_ROWS", "20"))
T = int(os.environ.get("KV_T", "448"))
H, DH = 16, 64
W = int(os.environ.get("KV_W", "16"))
DTYPE = os.environ.get("KV_DTYPE", "int8")  # int8 | bfloat16


def main() -> None:
    import jax
    import jax.numpy as jnp

    from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    dt = jnp.int8 if DTYPE == "int8" else jnp.bfloat16
    rng = np.random.default_rng(0)
    cache0 = jnp.asarray(
        rng.integers(-127, 127, (ROWS, T, H, DH)).astype(np.float32)
    ).astype(dt)
    stage0 = jnp.zeros((ROWS, W, H, DH), dt)
    q0 = jnp.asarray(rng.standard_normal((ROWS, 1, H, DH)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    upd0 = jnp.asarray(rng.standard_normal((ROWS, 1, H, DH)).astype(np.float32)).astype(dt)

    def dot(q, k):
        # the decode-step qk contraction — forces the cache's dot layout
        return jnp.einsum(
            "bqhd,bkhd->bhqk",
            q,
            k.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ).sum()

    def make(loop_kind):
        def run(n, cache, stage, q, upd):
            def body(i, carry):
                acc, cache, stage = carry
                idx = jax.lax.rem(i, T)
                if loop_kind == "dot_only":
                    acc = acc + dot(q, cache)
                elif loop_kind == "dot_dus":
                    cache = jax.lax.dynamic_update_slice(
                        cache, upd, (0, idx, 0, 0)
                    )
                    acc = acc + dot(q, cache)
                elif loop_kind == "dus_only":
                    cache = jax.lax.dynamic_update_slice(
                        cache, upd, (0, idx, 0, 0)
                    )
                    acc = acc + cache.astype(jnp.float32)[0, 0, 0, 0]
                elif loop_kind == "dot_dus_staged":
                    widx = jax.lax.rem(i, W)
                    stage = jax.lax.dynamic_update_slice(
                        stage, upd, (0, widx, 0, 0)
                    )
                    acc = acc + dot(q, cache) + dot(q, stage)
                elif loop_kind == "dot_dus_staged_flush":
                    # the real protocol: staged single-token writes + a
                    # cond-gated W-block flush into the big slab every W
                    # steps — measures whether lax.cond keeps the carry
                    # aliasing (the known risk of cond-in-while bodies)
                    widx = jax.lax.rem(i, W)
                    stage = jax.lax.dynamic_update_slice(
                        stage, upd, (0, widx, 0, 0)
                    )
                    base = (i // W) * W % (T - W)

                    def flush(args):
                        cache, stage = args
                        return jax.lax.dynamic_update_slice(
                            cache, stage, (0, base, 0, 0)
                        )

                    cache = jax.lax.cond(
                        widx == W - 1, flush, lambda a: a[0], (cache, stage)
                    )
                    acc = acc + dot(q, cache) + dot(q, stage)
                return (acc, cache, stage)

            acc, cache, stage = jax.lax.fori_loop(
                0, n, body, (jnp.float32(0), cache, stage)
            )
            return acc

        return jax.jit(run, static_argnums=(0,))

    out = {}
    for kind in ["dot_only", "dot_dus", "dus_only", "dot_dus_staged", "dot_dus_staged_flush"]:
        f = make(kind)
        times = {}
        for n in (512, 4096):
            np.asarray(f(n, cache0, stage0, q0, upd0))  # compile + warm
            t0 = time.perf_counter()
            np.asarray(f(n, cache0, stage0, q0, upd0))
            times[n] = time.perf_counter() - t0
        us_per_iter = (times[4096] - times[512]) / (4096 - 512) * 1e6
        out[kind] = round(us_per_iter, 2)
        print(f"# {kind}: {us_per_iter:.2f} us/iter", flush=True)

    print(
        json.dumps(
            {
                "metric": "kv_dus_microbench_us_per_iter",
                "shape": [ROWS, T, H, DH],
                "window": W,
                "dtype": DTYPE,
                **out,
            }
        )
    )


if __name__ == "__main__":
    main()
