"""Supplementary benchmark: 100k-keyword open-vocab catalog scoring.

The paper-2 "massive open-vocabulary" configuration: an LEF pre-projected
catalog ([100,352, 3, 75, 64] — raw embeddings would be ~90 GB, projected
~2.9 GB bf16 resident) scored against one utterance in a single `lax.map`
launch (efficient_kws/catalog.py).  Knobs:

  ECW_CAT_DTYPE  bfloat16 (default) | int8  — int8 quantizes the ResNet
                 stack (models/quant.py) with scales calibrated on the
                 first chunk's real similarity maps
  ECW_CAT_CHUNK  lax.map chunk size (default 128, the on-chip sweep optimum)
  ECW_CAT_N      catalog size (default 100352)
  ECW_CAT_SHORTLIST  K>0 switches to the two-stage cascade scorer
                 (make_cascade_score_fn: MaxSim proxy over all N keywords,
                 exact classifier on the static top-K shortlist only —
                 approximate, throughput counts all N keywords ranked)

Prints ONE JSON line.  Random weights/reps — shapes, program structure and
arithmetic match the real config (configs/efficient_kws/train-LEF-expanded.yaml).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from enhance_cb_whisper_tpu.efficient_kws import (
        EfficientKWSConfig,
        EfficientKWSModel,
    )
    from enhance_cb_whisper_tpu.efficient_kws.catalog import (
        make_cascade_score_fn,
        make_projected_score_fn,
    )
    from enhance_cb_whisper_tpu.runtime.flops import device_peak_flops, estimate_flops

    N = int(os.environ.get("ECW_CAT_N", "100352"))
    chunk = int(os.environ.get("ECW_CAT_CHUNK", "128"))
    mode = os.environ.get("ECW_CAT_DTYPE", "bfloat16")
    # ECW_CAT_SHORTLIST=K switches to the two-stage cascade (MaxSim proxy
    # over all N, exact classifier on the static top-K only)
    shortlist = int(os.environ.get("ECW_CAT_SHORTLIST", "0"))
    # ECW_CAT_PROXY: stage-1 proxy einsum dtype A/B (bfloat16 default —
    # maxsim_proxy_fast; float32 = the legacy precision="highest" path)
    proxy_dtype = os.environ.get("ECW_CAT_PROXY", "bfloat16")
    L, D, U, T_K, T_U = 3, 1024, 64, 75, 1500

    config = EfficientKWSConfig(
        n_layers=L, embedding_dim=D, learn_features=True, proj_mlp=True,
        proj_mlp_units=U, frames_conv=True, resnet_version="resnet-50",
    )
    model = EfficientKWSModel(config, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    utt = rng.standard_normal((1, L, T_U, D)).astype(np.float32)
    utt_mask = np.ones((1, L, T_U), np.float32)
    kwd_small = rng.standard_normal((2, L, 150, D)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), kwd_small, utt,
        np.ones((2, L, 150), np.float32), utt_mask,
    )

    # pre-projected LEF reps, straight to device bf16 (2.9 GB at 100k)
    kwd = rng.standard_normal((N, L, T_K, U)).astype(np.float32)
    catalog = {
        "kwd": jnp.asarray(kwd, jnp.bfloat16),
        "kwd_mask": jnp.asarray(np.ones((N, L, T_K), np.float32), jnp.bfloat16),
        "mask": jnp.asarray(np.ones((N,), np.float32)),
        "num_keywords": N,
        "chunk": chunk,
    }
    del kwd

    if mode == "int8":
        from enhance_cb_whisper_tpu.efficient_kws.model import masked_sims
        from enhance_cb_whisper_tpu.models.quant import (
            calibrate_act_scales,
            quantize_efficient_classifier,
        )

        qparams = quantize_efficient_classifier(variables, config.resnet_config())
        utt_p, utt_mask_p = model.apply(
            variables, jnp.asarray(utt), jnp.asarray(utt_mask),
            train=False, method=EfficientKWSModel.project,
        )
        sims = masked_sims(
            catalog["kwd"][:chunk].astype(jnp.float32), utt_p,
            catalog["kwd_mask"][:chunk].astype(jnp.float32), utt_mask_p,
        )
        scales = calibrate_act_scales(config.resnet_config(), qparams, sims)["act_scales"]
        qkw = dict(quantized_params=jax.device_put(qparams), act_scales=scales)
        score = (
            make_cascade_score_fn(model, chunk=chunk, shortlist=shortlist,
                                  proxy_dtype=proxy_dtype, **qkw)
            if shortlist
            else make_projected_score_fn(model, chunk=chunk, **qkw)
        )
    else:
        score = (
            make_cascade_score_fn(model, chunk=chunk, shortlist=shortlist,
                                  proxy_dtype=proxy_dtype)
            if shortlist
            else make_projected_score_fn(model, chunk=chunk)
        )

    utt_j, utt_mask_j = jnp.asarray(utt), jnp.asarray(utt_mask)
    t0 = time.perf_counter()
    np.asarray(score(variables, catalog, utt_j, utt_mask_j))
    compile_s = time.perf_counter() - t0

    iters = 3
    t0 = time.perf_counter()
    outs = [score(variables, catalog, utt_j, utt_mask_j) for _ in range(iters)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / iters

    flops = None
    try:
        flops = estimate_flops(score, variables, catalog, utt_j, utt_mask_j)
    except Exception:
        pass
    peak = device_peak_flops("int8" if mode == "int8" else "bfloat16")

    print(
        json.dumps(
            {
                "metric": "open_vocab_catalog_keywords_per_sec",
                "value": round(N / dt, 2),
                "unit": "keywords/s",
                "seconds_per_utterance": round(dt, 2),
                "dtype": mode,
                "chunk": chunk,
                "shortlist": shortlist or None,
                "proxy_dtype": proxy_dtype if shortlist else None,
                # cascade rows rank all N but exact-score only the shortlist;
                # this distinct metric keeps sweep harvesting from conflating
                # cascade and full-scorer rows under the headline name
                "exact_scored_keywords_per_sec": (
                    round(shortlist / dt, 2) if shortlist else None
                ),
                "compile_seconds": round(compile_s, 1),
                "mfu": round(flops / dt / peak, 4) if flops else None,
            }
        )
    )

    if os.environ.get("ECW_CAT_PROFILE"):
        # per-op device-time breakdown of one scoring launch (the int8
        # catalog's 41%-of-peak bound has never been profiled)
        from enhance_cb_whisper_tpu.runtime.profiler import (
            device_op_breakdown, trace,
        )

        tdir = os.environ["ECW_CAT_PROFILE"]
        with trace(tdir):
            np.asarray(score(variables, catalog, utt_j, utt_mask_j))
        total, ops = device_op_breakdown(tdir)
        lines = [f"# total device s: {total:.3f} per launch"] + [
            f"# {op['seconds']*1e3:9.2f} ms x{op['count']:6d}  {op['name'][:90]}"
            for op in ops[:30]
        ]
        print("\n".join(lines), flush=True)
        with open(f"{tdir}/breakdown.txt", "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
