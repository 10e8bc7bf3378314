"""Round-3 train-step MFU sweep (VERDICT task 5): batch size x layout x
dtype on the reference full config (12-ch ResNet-50, 150x750 maps).

Measures pipelined steps/s (no per-step host fetch — the fit-loop pattern),
prints ex/s + TFLOP/s + MFU per config, then a per-op profile of the best.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache
enable_persistent_cache()

from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.train.kws_train import (
    KWSTrainConfig, init_train_state, make_train_step,
)
from enhance_cb_whisper_tpu.runtime.flops import estimate_flops

PEAK_BF16 = 197e12  # v5e

SWEEP = [
    # (batch, channels_last, remat, steps)
    (20, False, False, 10),
    (20, True, False, 10),
    (32, False, False, 10),
    (32, True, False, 10),
    (64, False, False, 6),
    (64, True, False, 6),
    # remat round (round-3 new idea): block-level jax.checkpoint shrinks the
    # live-activation set — the batch-64 regression was attributed to spills
    (32, False, True, 10),
    (64, False, True, 6),
    (128, False, True, 4),
    # round-4: larger batches WITHOUT remat (the remat round showed b128
    # fits; does plain b96/b128 beat the b32 optimum once XLA schedules
    # the bigger working set?)
    (96, False, False, 5),
    (128, False, False, 4),
    (192, False, False, 4),
    (256, False, False, 3),
]

which = os.environ.get("TRAIN_SWEEP", "")  # e.g. "32,False" or "64,False,remat"
results = {}
for batch_size, cl, remat, n_steps in SWEEP:
    tag = f"{batch_size},{cl}" + (",remat" if remat else "")
    if which and which != tag:
        continue
    cfg = KWSTrainConfig(compute_dtype="bfloat16", channels_last=cl, remat=remat)
    rcfg = ResNetConfig(num_channels=12, num_labels=2)
    shape = (150, 750, 12) if cl else (12, 150, 750)
    rng = jax.random.PRNGKey(0)
    state, (kws, disc, tx) = init_train_state(rng, cfg, rcfg, shape)
    step = make_train_step(cfg, kws, disc, tx)

    nprng = np.random.default_rng(0)
    batch = {
        "features": jnp.asarray(
            nprng.standard_normal((batch_size, *shape)).astype(np.float32)
        ),
        "labels": jnp.asarray(nprng.integers(0, 2, (batch_size,)).astype(np.int32)),
        "domain": jnp.asarray(nprng.integers(0, 2, (batch_size,)).astype(np.int32)),
    }

    args = (state.params, state.batch_stats, state.opt_state, batch,
            jax.random.PRNGKey(1), 0.0, 0.0)
    t0 = time.perf_counter()
    p, s, o, m = step(*args)
    np.asarray(m["class_loss"])
    compile_s = time.perf_counter() - t0

    # pipelined: feed outputs back, fetch only at the end
    t0 = time.perf_counter()
    for i in range(n_steps):
        p, s, o, m = step(p, s, o, batch, jax.random.fold_in(rng, i), 0.0, 0.0)
    np.asarray(m["class_loss"])
    wall = (time.perf_counter() - t0) / n_steps

    flops = estimate_flops(step, *args)
    tflops = flops / wall / 1e12
    exps = batch_size / wall
    mfu = tflops * 1e12 / PEAK_BF16
    key = f"b{batch_size}_{'nhwc' if cl else 'nchw'}{'_remat' if remat else ''}"
    results[key] = (exps, tflops, mfu)
    print(f"{key}: {exps:8.1f} ex/s  {wall*1e3:7.1f} ms/step  "
          f"{tflops:6.1f} TFLOP/s  MFU {mfu*100:5.1f}%  (compile {compile_s:.0f}s)",
          flush=True)

    if os.environ.get("TRAIN_PROFILE"):
        # per-op device-time breakdown of THIS config (pipeline 4 steps
        # inside the trace so per-launch overhead is visible but small)
        from enhance_cb_whisper_tpu.runtime.profiler import (
            device_op_breakdown, trace,
        )

        with trace("/tmp/train_trace"):
            for i in range(4):
                p, s, o, m = step(p, s, o, batch, jax.random.fold_in(rng, 100 + i), 0.0, 0.0)
            np.asarray(m["class_loss"])
        total, ops = device_op_breakdown("/tmp/train_trace")
        lines = [f"# total device s: {total:.3f} over 4 steps"] + [
            f"# {op['seconds']*1e3:9.2f} ms x{op['count']:6d}  {op['name'][:90]}"
            for op in ops[:35]
        ]
        print("\n".join(lines))
        with open("/tmp/train_trace/breakdown.txt", "w") as f:
            f.write("\n".join(lines) + "\n")

print({k: (round(v[0], 1), round(v[2], 3)) for k, v in results.items()})
