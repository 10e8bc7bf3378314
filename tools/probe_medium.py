"""Round-3 probe: does the scan-over-layers whisper-medium ENCODER compile
through the remote-compile relay?  (VERDICT task 1 — round 2's unrolled
24-layer program was dropped with Broken pipe after ~35 min.)

Stages gated by PROBE_STAGE: enc (encoder fwd), dec (one decode step),
full (encoder + greedy longform step fn).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp

from enhance_cb_whisper_tpu.models.whisper import (
    WhisperConfig, init_whisper_params, encoder_forward, stack_whisper_params,
)

stage = os.environ.get("PROBE_STAGE", "enc")
dtype = jnp.bfloat16 if os.environ.get("PROBE_DTYPE", "float32") == "bfloat16" else jnp.float32
batch = int(os.environ.get("PROBE_BATCH", "1"))

cfg = WhisperConfig(
    vocab_size=51865, num_mel_bins=80, d_model=1024,
    encoder_layers=24, encoder_attention_heads=16,
    decoder_layers=24, decoder_attention_heads=16,
    encoder_ffn_dim=4096, decoder_ffn_dim=4096,
    max_source_positions=1500, max_target_positions=448,
)
rng = np.random.default_rng(0)
t0 = time.time()
params = stack_whisper_params(jax.tree.map(
    lambda x: jnp.asarray(x, dtype) if hasattr(x, "dtype") and x.dtype == np.float32 else jnp.asarray(x),
    init_whisper_params(rng, cfg)))
params = jax.device_put(params)
jax.block_until_ready(params)
print(f"params up in {time.time()-t0:.1f}s", flush=True)

if stage == "enc":
    mel = jnp.asarray(rng.standard_normal((batch, 80, 3000)), dtype)
    t0 = time.time()
    fn = jax.jit(lambda p, m: encoder_forward(p, m, cfg)[0])
    out = fn(params, mel)
    host = np.asarray(out)
    print(f"ENC OK: compile+run {time.time()-t0:.1f}s out {host.shape} {host.dtype} finite={np.isfinite(host).all()}", flush=True)
    # steady-state timing: 5 pipelined launches, fetch at end
    t0 = time.time()
    for _ in range(5):
        out = fn(params, mel)
    np.asarray(out)
    dt = (time.time() - t0) / 5
    print(f"ENC steady: {dt*1e3:.1f} ms/launch  ({batch*30/dt:.1f}x realtime audio)", flush=True)
elif stage == "dec":
    from enhance_cb_whisper_tpu.models.whisper import (
        decoder_forward, init_cache, precompute_cross_kv,
    )
    enc = jnp.asarray(rng.standard_normal((batch, 1500, 1024)), dtype)
    ckv = precompute_cross_kv(params, enc, cfg)
    cache = init_cache(cfg, batch, 448, dtype=dtype, stacked=True)
    tok = jnp.full((batch, 1), 50258, jnp.int32)

    def step(p, tok, cache, ckv):
        logits, cache = decoder_forward(p, tok, ckv, cfg, cache=cache)
        return logits.argmax(-1).astype(jnp.int32), cache

    t0 = time.time()
    fn = jax.jit(step, donate_argnums=(2,))
    nxt, cache = fn(params, tok, cache, ckv)
    print(f"DEC step OK: {time.time()-t0:.1f}s tok {np.asarray(nxt).ravel()[:4]}", flush=True)
    t0 = time.time()
    for _ in range(20):
        nxt, cache = fn(params, nxt, cache, ckv)
    np.asarray(nxt)
    print(f"DEC steady: {(time.time()-t0)/20*1e3:.2f} ms/step", flush=True)
print("probe done", flush=True)
