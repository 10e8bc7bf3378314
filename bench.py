"""Benchmark: fused keyword-catalog KWS scoring throughput on TPU.

Measures the flagship hot loop of CB-Whisper — scoring a keyword catalog
against utterance Whisper-encoder hidden-state stacks (cosine-sim +
bilinear resize folded into matmuls + ResNet-50 classification) — at
whisper-medium dimensions (12 layer slabs, D=1024, 150x750 feature maps,
the reference's configuration: src/configs/train.yaml:127-129).  Several
utterances are scored per launch (the engines' vmapped eval path), so the
number counts keyword-utterance PAIRS per second.

Baseline = the reference's per-keyword host loop (torch CPU matmul +
bilinear interpolate + HF ResNetModel forward, src/data/dataset.py:311-317,
src/model/model.py:78-93), measured on a small sample and extrapolated
per-keyword.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

N_LAYERS = 12
DIM = 1024
OUT = (150, 750)
N_KEYWORDS = 128
# r2 sweep (bf16, v5e): chunk 8 > 16 > 32 at every batch; utt_batch 16 >
# 8, 32.  ECW_BENCH_{CHUNK,UTT_BATCH} re-sweep them (the int8 program's
# cost structure differs — ~65% requantize elementwise, docs/PERF.md)
CHUNK = int(os.environ.get("ECW_BENCH_CHUNK", "8"))
UTT_BATCH = int(os.environ.get("ECW_BENCH_UTT_BATCH", "16"))


def _make_stacks(rng, n):
    stacks = []
    for _ in range(n):
        t = int(rng.integers(4, 40))
        s = rng.standard_normal((N_LAYERS, t, DIM), dtype=np.float32)
        stacks.append(s / np.linalg.norm(s, axis=-1, keepdims=True))
    return stacks


def bench_tpu(stacks, utt, dtype="bfloat16"):
    import os

    import jax
    import jax.numpy as jnp

    from enhance_cb_whisper_tpu.catalog import (
        KeywordCatalog,
        device_put_catalog,
        make_catalog_score_fn,
    )
    from enhance_cb_whisper_tpu.models import ResNetConfig
    from enhance_cb_whisper_tpu.models.kws import KWSModel
    from enhance_cb_whisper_tpu.ops.resize import resize_matrix

    compute_dtype = jnp.float32 if dtype == "float32" else jnp.bfloat16
    catalog = KeywordCatalog.from_arrays(
        [f"kw{i}" for i in range(len(stacks))], stacks, group_size=CHUNK
    )
    cfg = ResNetConfig(num_channels=N_LAYERS, num_labels=2)  # resnet-50
    model = KWSModel(cfg, dtype=compute_dtype)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, N_LAYERS, *OUT), np.float32)
    )

    if dtype == "int8":
        # int8 quantized ResNet inference (models/quant.py): sim + resize
        # einsums stay bf16, the conv stack (~88% of the FLOPs) runs s8xs8
        # ->s32 on the MXU (~1.8x bf16 conv throughput measured on v5e).
        # Static activation scales calibrated on real similarity maps of
        # the first chunk (host-side numpy replica of the scorer's math).
        from enhance_cb_whisper_tpu.models.quant import (
            calibrate_act_scales,
            make_quantized_kws_apply,
            quantize_resnet_classifier,
        )

        utt_rs = np.einsum("pu,lud->lpd", resize_matrix(utt.shape[1], OUT[1], antialias=False), utt)
        calib = []
        for s in stacks[:CHUNK]:
            kw_rs = np.einsum("ok,lkd->lod", resize_matrix(s.shape[1], OUT[0], antialias=False), s)
            calib.append(np.einsum("lod,lpd->lop", kw_rs, utt_rs))
        qparams = quantize_resnet_classifier(variables, cfg)
        scales = calibrate_act_scales(cfg, qparams, np.stack(calib).astype(np.float32))[
            "act_scales"
        ]
        # weights on device once; scales baked as compile-time constants —
        # otherwise every launch re-uploads them through the relay
        variables = jax.device_put(qparams)
        # ECW_QUANT_FLOAT="stem,stage_0" keeps those parts bf16 (mixed
        # boundary: the requant elementwise is ~65% of the all-int8
        # program and stem+stage_0 hold ~52% of the activation bytes for
        # ~22% of the conv FLOPs — docs/PERF.md)
        float_stages = tuple(
            s for s in os.environ.get("ECW_QUANT_FLOAT", "").split(",") if s
        )
        kws_apply = make_quantized_kws_apply(
            cfg, act_scales=scales, float_stages=float_stages
        )
    else:
        def kws_apply(v, x):
            return model.apply(v, x.astype(compute_dtype)).logits

    score = make_catalog_score_fn(
        kws_apply, out_size=OUT, chunk=CHUNK,
        precision="highest" if dtype == "float32" else "default",
    )
    batched = jax.jit(jax.vmap(score, in_axes=(None, None, 0, 0)))
    cat_dev = device_put_catalog(catalog, out_h=OUT[0], chunk=CHUNK, dtype=compute_dtype)
    utt_j = jnp.asarray(np.stack([utt] * UTT_BATCH))
    w1 = resize_matrix(utt.shape[1], OUT[1], antialias=False)
    w = jnp.asarray(np.stack([w1] * UTT_BATCH))

    np.asarray(batched(variables, cat_dev, utt_j, w)[0])  # compile + execute

    # FLOPs for the MFU figure: static jaxpr count (NOT XLA cost_analysis,
    # which counts the lax.map body once regardless of trip count and
    # under-reports this program ~16x — runtime/flops.py)
    from enhance_cb_whisper_tpu.runtime.flops import estimate_flops

    flops = None
    try:
        flops = estimate_flops(batched, variables, cat_dev, utt_j, w)
    except Exception:
        pass

    # pipelined dispatch: enqueue all launches, fetch at the end — the
    # serving pattern (utterance batches stream through), and the relay's
    # ~30 ms round-trip is paid once instead of per launch.  A host fetch is
    # the only reliable completion barrier on this backend
    # (block_until_ready returns early through the remote relay).
    iters = int(os.environ.get("ECW_BENCH_ITERS", 10))
    t0 = time.perf_counter()
    outs = [batched(variables, cat_dev, utt_j, w)[0] for _ in range(iters)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / iters

    # ECW_BENCH_PROFILE=<dir>: per-op device-time breakdown of the scorer
    # (where the int8 program's 32.5%-of-peak goes — VERDICT r3 weak #6)
    profile_dir = os.environ.get("ECW_BENCH_PROFILE", "")
    if profile_dir:
        from enhance_cb_whisper_tpu.runtime.profiler import (
            device_op_breakdown,
            trace,
        )

        with trace(profile_dir):
            np.asarray(batched(variables, cat_dev, utt_j, w)[0])
        total, ops_ = device_op_breakdown(profile_dir)
        lines = [f"# total device s: {total:.3f} per launch"] + [
            f"# {o_['seconds']*1e3:9.2f} ms x{o_['count']:6d}  {o_['name'][:90]}"
            for o_ in ops_[:30]
        ]
        print("\n".join(lines))
        with open(os.path.join(profile_dir, "breakdown.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return UTT_BATCH * catalog.num_padded / dt, (flops / dt if flops else None)


def bench_reference_cpu(stacks, utt, n_sample=4):
    """Reference-style loop: torch matmul + interpolate + HF ResNet per
    keyword (single keyword per forward, as dataset.py feeds them)."""
    import torch
    import torch.nn.functional as F
    import transformers

    hf_cfg = transformers.ResNetConfig()
    hf_cfg.num_channels = N_LAYERS
    model = transformers.ResNetModel(hf_cfg).eval()
    head = torch.nn.Linear(hf_cfg.hidden_sizes[-1], 2)
    utt_t = torch.from_numpy(utt)

    def score_one(s):
        sim = torch.matmul(torch.from_numpy(s), utt_t.transpose(1, 2))
        resized = F.interpolate(
            sim[None], size=OUT, mode="bilinear", align_corners=False, antialias=False
        )
        with torch.no_grad():
            pooled = model(resized).pooler_output.flatten(1)
            return head(pooled).softmax(-1)[:, 1]

    score_one(stacks[0])  # warmup
    t0 = time.perf_counter()
    for s in stacks[:n_sample]:
        score_one(s)
    dt = (time.perf_counter() - t0) / n_sample
    return 1.0 / dt


def _wait_for_relay():
    """The axon relay has multi-hour outages (CLAUDE.md); its backend init
    hangs ~4 min then fails.  Probe in a bounded subprocess loop so a bench
    launched while the relay is flapping still lands — at worst this adds
    ECW_BENCH_RELAY_RETRIES x 2 min before the natural failure.  Returns
    True when the relay answered the probe."""
    import os
    import subprocess
    import sys
    import time as _time

    retries = int(os.environ.get("ECW_BENCH_RELAY_RETRIES", 3))
    probe = ("import jax, numpy as np\n"
             "x = jax.numpy.ones((128, 128))\n"
             "print('probe-ok', float(np.asarray((x @ x).sum())))\n")
    for attempt in range(retries):
        try:
            out = subprocess.run([sys.executable, "-c", probe],
                                 capture_output=True, text=True, timeout=240)
            if out.returncode == 0 and "probe-ok" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt < retries - 1:
            print(f"# relay down (probe {attempt + 1}/{retries}); retrying in 120s",
                  flush=True)
            _time.sleep(120)
    return False


def main():
    global N_KEYWORDS, UTT_BATCH

    import os

    from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache

    relay_up = True
    if os.environ.get("ECW_BENCH_RELAY_RETRIES", "3") != "0":
        relay_up = _wait_for_relay()

    device = "tpu"
    if not relay_up and os.environ.get("ECW_BENCH_CPU_FALLBACK", "1") != "0":
        # The relay can be down for many hours (CLAUDE.md).  Rather than
        # hard-failing (no JSON line recorded at all), fall back to an
        # HONEST scaled-down CPU run of the same program, clearly labeled —
        # the value is NOT a TPU number and must not be compared to one.
        import jax

        jax.config.update("jax_platforms", "cpu")
        device = "cpu-fallback-relay-down"
        N_KEYWORDS = 8
        UTT_BATCH = 2
        os.environ.setdefault("ECW_BENCH_ITERS", "2")
        os.environ.setdefault("ECW_BENCH_DTYPE", "float32")
    enable_persistent_cache()

    rng = np.random.default_rng(0)
    stacks = _make_stacks(rng, N_KEYWORDS)
    t_u = 750
    utt = rng.standard_normal((N_LAYERS, t_u, DIM), dtype=np.float32)
    utt /= np.linalg.norm(utt, axis=-1, keepdims=True)

    # int8 by default since round 2 (5,894 pairs/s vs 4,385 bf16 vs ~2,040
    # fp32 on v5e; threshold-decision parity tested, tests/test_quant.py);
    # the persistent compilation cache (enable_persistent_cache above)
    # amortizes the big remote compile across runs
    dtype = os.environ.get("ECW_BENCH_DTYPE", "int8")
    ours, flops_per_s = bench_tpu(stacks, utt, dtype=dtype)
    # ECW_BENCH_CPU_BASELINE=0 skips the torch-CPU reference loop: on this
    # 1-core box it adds minutes per run and its wall time (hence
    # vs_baseline) swings wildly under sweep contention — A/B sweeps only
    # compare the TPU value
    baseline = None
    if os.environ.get("ECW_BENCH_CPU_BASELINE", "1") != "0":
        try:
            baseline = bench_reference_cpu(stacks, utt)
        except Exception:
            baseline = None

    from enhance_cb_whisper_tpu.runtime.flops import device_peak_flops

    # v5e peak: ~197 TFLOP/s bf16 per chip (ECW_PEAK_TFLOPS overrides);
    # MFU is only meaningful against the TPU peak
    peak = device_peak_flops(dtype)
    result = {
        "metric": "kws_catalog_keywords_per_sec",
        "value": round(ours, 2),
        "unit": "keywords/s",
        "vs_baseline": round(ours / baseline, 2) if baseline else None,
        "mfu": round(flops_per_s / peak, 4)
        if (flops_per_s and device == "tpu")
        else None,
        "dtype": dtype,
    }
    if device != "tpu":
        result["device"] = device
    print(json.dumps(result))


if __name__ == "__main__":
    main()
