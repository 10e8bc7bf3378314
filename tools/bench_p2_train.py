"""Paper-2 (efficient_kws) training-step throughput at the shipped LEF
reference dims (src/efficient_kws/configs/train-LEF.yaml: n_layers 3,
embedding_dim 1280, proj_mlp_units 64, frames_conv, resnet-50,
features_size (150, 1500), batch 40).

Relay rules: params/batch staged once, steps chain through device
outputs, a single scalar fetch at the end. Prints ONE JSON line with
examples/s and MFU (runtime/flops.py jaxpr counter — XLA's cost analysis
under-reports loop bodies).

Env: ECW_P2_BATCH (default 40), ECW_P2_STEPS (default 6),
ECW_P2_VARIANT (LEF default; LE drops frames_conv; L drops projection),
ECW_P2_DTYPE (float32 default; bfloat16 = MXU-rate projection+ResNet with
f32 params/BN/loss — the paper-1 recipe).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from enhance_cb_whisper_tpu.efficient_kws.engine import (
    EfficientKWSEngine,
    EfficientTrainConfig,
)
from enhance_cb_whisper_tpu.efficient_kws.model import EfficientKWSConfig
from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache

B = int(os.environ.get("ECW_P2_BATCH", 40))
STEPS = int(os.environ.get("ECW_P2_STEPS", 6))
VARIANT = os.environ.get("ECW_P2_VARIANT", "LEF")
L = int(os.environ.get("ECW_P2_LAYERS", 3))
D = int(os.environ.get("ECW_P2_DIM", 1280))
T_K = int(os.environ.get("ECW_P2_TK", 150))
T_U = int(os.environ.get("ECW_P2_TU", 1500))


def main():
    enable_persistent_cache()
    learn = VARIANT != "L"
    cfg = EfficientKWSConfig(
        n_layers=L, embedding_dim=D, learn_features=learn, proj_mlp=learn,
        proj_mlp_units=64, frames_conv=VARIANT == "LEF",
        resnet_version="resnet-50",
    )
    engine = EfficientKWSEngine(
        cfg,
        EfficientTrainConfig(
            compute_dtype=os.environ.get("ECW_P2_DTYPE", "float32")
        ),
    )

    rng = np.random.default_rng(0)
    feat_d = D if learn else L
    batch = {
        "kwd_features": rng.standard_normal((B, L, T_K, feat_d)).astype(np.float32),
        "utt_features": rng.standard_normal((B, L, T_U, feat_d)).astype(np.float32),
        "kwd_mask": np.ones((B, L, T_K), np.float32),
        "utt_mask": np.ones((B, L, T_U), np.float32),
        "labels": rng.integers(0, 2, B),
    }
    params, batch_stats, opt_state = engine.init_state(batch)
    step = engine.make_train_step()

    stage = lambda t: jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), t)
    params, batch_stats, opt_state = stage(params), stage(batch_stats), stage(opt_state)
    dbatch = stage(batch)
    key = jax.device_put(jax.random.PRNGKey(1))

    t0 = time.time()
    params, batch_stats, opt_state, metrics = step(params, batch_stats, opt_state, dbatch, key)
    float(np.asarray(metrics["loss"]))
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(STEPS):
        params, batch_stats, opt_state, metrics = step(
            params, batch_stats, opt_state, dbatch, key
        )
    float(np.asarray(metrics["loss"]))
    dt = (time.time() - t0) / STEPS

    mfu = None
    try:
        from enhance_cb_whisper_tpu.runtime.flops import estimate_flops

        flops = estimate_flops(step, params, batch_stats, opt_state, dbatch, key)
        peak = float(os.environ.get("ECW_PEAK_FLOPS", 394e12 / 2))  # v5e f32
        mfu = round(flops / dt / peak * 100, 1)
    except Exception as e:  # keep the throughput number even if this fails
        print(f"# flops estimate failed: {e}", flush=True)

    print(json.dumps({
        "metric": f"p2_{VARIANT}_train_step",
        "value": round(B / dt, 1),
        "unit": "ex/s",
        "ms_per_step": round(dt * 1e3, 1),
        "batch": B,
        "compile_s": round(compile_s, 0),
        "mfu_pct": mfu,
        "dtype": os.environ.get("ECW_P2_DTYPE", "float32"),
    }), flush=True)

    if os.environ.get("ECW_P2_PROFILE"):
        # per-op device-time breakdown (the 19.6% LEF MFU's bound is
        # undiagnosed — round-5 input)
        from enhance_cb_whisper_tpu.runtime.profiler import (
            device_op_breakdown, trace,
        )

        tdir = os.environ["ECW_P2_PROFILE"]
        with trace(tdir):
            for _ in range(3):
                params, batch_stats, opt_state, metrics = step(
                    params, batch_stats, opt_state, dbatch, key
                )
            float(np.asarray(metrics["loss"]))
        total, ops = device_op_breakdown(tdir)
        lines = [f"# total device s: {total:.3f} over 3 steps"] + [
            f"# {op['seconds']*1e3:9.2f} ms x{op['count']:6d}  {op['name'][:90]}"
            for op in ops[:30]
        ]
        print("\n".join(lines), flush=True)
        with open(f"{tdir}/breakdown.txt", "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
