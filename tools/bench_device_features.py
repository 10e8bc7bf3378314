"""Device cost of the fused training features (sims + antialiased resize
inside the step) vs the plain host-collated step, at reference dims.

Host-side numbers are already measured (docs/PERF.md: collate 4.8 ex/s on
a core vs 881 ex/s step demand); this bench answers the device half: what
the fused features add to the step. Relay rules apply: weights/batches are
pre-staged device arrays, steps chain through device outputs, and the only
fetch is the final scalar.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from enhance_cb_whisper_tpu.models.resnet import ResNetConfig
from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache
from enhance_cb_whisper_tpu.train.kws_train import (
    KWSTrainConfig,
    init_train_state,
    make_train_step,
)

B = int(os.environ.get("ECW_DF_BATCH", 32))
L = int(os.environ.get("ECW_DF_LAYERS", 12))
D = int(os.environ.get("ECW_DF_DIM", 1280))
T_K = int(os.environ.get("ECW_DF_TK", 32))
T_U = int(os.environ.get("ECW_DF_TU", 768))
SIZE = (int(os.environ.get("ECW_DF_H", 150)), int(os.environ.get("ECW_DF_W", 750)))
STEPS = int(os.environ.get("ECW_DF_STEPS", 8))


def _stage(tree):
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), tree)


def _run(config, batch, tag):
    state, (kws, disc, tx) = init_train_state(
        jax.random.PRNGKey(0), config, ResNetConfig(num_channels=L, num_labels=2),
        (L, *SIZE),
    )
    step = make_train_step(config, kws, disc, tx)
    params = _stage(state.params)
    stats = _stage(state.batch_stats)
    opt_state = _stage(state.opt_state)
    batch = _stage(batch)
    rng = jax.device_put(jax.random.PRNGKey(1))

    t0 = time.time()
    params, stats, opt_state, metrics = step(params, stats, opt_state, batch, rng, 0.0, 0.0)
    float(np.asarray(metrics["class_loss"]))  # host fetch = barrier
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(STEPS):
        params, stats, opt_state, metrics = step(
            params, stats, opt_state, batch, rng, 0.0, 0.0
        )
    float(np.asarray(metrics["class_loss"]))
    dt = (time.time() - t0) / STEPS
    print(f"# {tag}: {dt * 1e3:.1f} ms/step ({B / dt:.0f} ex/s), compile {compile_s:.0f}s",
          flush=True)
    return dt


def main():
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    dtype = os.environ.get("ECW_DF_DTYPE", "bfloat16")

    feats = rng.standard_normal((B, L, *SIZE)).astype(np.float32)
    labels = rng.integers(0, 2, B)
    host_batch = {"features": feats, "labels": labels}

    kwd = rng.standard_normal((B, L, T_K, D)).astype(np.float32)
    utt = rng.standard_normal((B, L, T_U, D)).astype(np.float32)
    raw_batch = {
        "kwd_hs": kwd, "utt_hs": utt,
        "kwd_len": rng.integers(4, T_K, B).astype(np.int32),
        "utt_len": rng.integers(T_U // 2, T_U, B).astype(np.int32),
        "labels": labels,
    }

    dt_host = _run(KWSTrainConfig(compute_dtype=dtype), host_batch, "host-features step")
    dt_dev = _run(
        KWSTrainConfig(compute_dtype=dtype, device_features=SIZE), raw_batch,
        "fused-features step",
    )
    print(json.dumps({
        "metric": "device_features_overhead",
        "value": round((dt_dev - dt_host) * 1e3, 2),
        "unit": "ms/step",
        "host_ms": round(dt_host * 1e3, 2),
        "fused_ms": round(dt_dev * 1e3, 2),
        "batch": B,
        "ex_per_s_fused": round(B / dt_dev, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
