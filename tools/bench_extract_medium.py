"""Round-3: measure the `--extract_hs` hot loop at whisper-medium dims.

The reference extracts KWS hidden-state caches with whisper-medium
(`/root/reference/datasets/aishell/build.sh:74-112`); round 2 could not
compile the 24-layer batched encoder through the remote-compile relay
(unrolled HLO too large).  With the scan-over-layers layout + explicit
params jit args this mirrors `pipeline.py:extract_hidden_states`'s exact
device program (mel fused into the encode launch, per-file truncation,
L2-normalize, deferred fetches, optional f16 caches) on synthetic 30 s
wavs and random medium weights — same program, no disk I/O in the loop.

Knobs: EXT_BATCH (default 8), EXT_FILES (default 32), EXT_DTYPE
(float32|float16 cache fetch dtype).
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
    WhisperConfig,
    encoder_kws_stack,
    init_whisper_params,
    stack_whisper_params,
)
from enhance_cb_whisper_tpu.ops.mel import log_mel_spectrogram

batch = int(os.environ.get("EXT_BATCH", "8"))
n_files = int(os.environ.get("EXT_FILES", "32"))
out_dtype = jnp.dtype(os.environ.get("EXT_DTYPE", "float32"))

if os.environ.get("EXT_MODEL", "medium") == "tiny":  # CPU smoke mode
    cfg = WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=384,
        encoder_layers=4, encoder_attention_heads=6,
        decoder_layers=4, decoder_attention_heads=6,
        encoder_ffn_dim=1536, decoder_ffn_dim=1536,
        max_source_positions=1500, max_target_positions=448,
    )
    kws_slice = (1, 5)
else:
    cfg = WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=1024,
        encoder_layers=24, encoder_attention_heads=16,
        decoder_layers=24, decoder_attention_heads=16,
        encoder_ffn_dim=4096, decoder_ffn_dim=4096,
        max_source_positions=1500, max_target_positions=448,
    )
    kws_slice = (10, 22)
rng = np.random.default_rng(0)
t0 = time.time()
params_host = init_whisper_params(rng, cfg)
compute_dtype = jnp.dtype(os.environ.get("EXT_COMPUTE_DTYPE", "float32"))
if os.environ.get("EXT_INT8", "0") == "1":
    # int8 encoder (EXT_INT8=1): calibrate on one synthetic batch, quantize
    # host-side (mirrors pipeline.py:extract_hidden_states encoder_int8)
    from enhance_cb_whisper_tpu.models.whisper import (
        calibrate_encoder_act_scales,
        quantize_encoder_layers,
    )

    wav0 = (rng.standard_normal((batch, 480000)) * 0.05).astype(np.float32)
    mel0 = jax.jit(lambda w: log_mel_spectrogram(w, n_mels=cfg.num_mel_bins))(wav0)
    f32 = stack_whisper_params(jax.tree.map(jnp.asarray, params_host))
    scales = calibrate_encoder_act_scales(f32, mel0, cfg, dtype=compute_dtype)
    del f32
    params = jax.device_put(quantize_encoder_layers(params_host, scales))
else:
    params = jax.device_put(stack_whisper_params(jax.tree.map(jnp.asarray, params_host)))
np.asarray(jax.tree.leaves(params)[0])
print(f"params up {time.time()-t0:.1f}s", flush=True)


@jax.jit
def _encode_batch(p, wavs, valid_frames):
    mel = log_mel_spectrogram(wavs, n_mels=cfg.num_mel_bins)
    stacks = encoder_kws_stack(
        p, mel, cfg, layer_slice=kws_slice, valid_frames=valid_frames,
        dtype=compute_dtype,
    )
    return stacks.astype(out_dtype)


wav = (rng.standard_normal((batch, 480000)) * 0.05).astype(np.float32)
# 30 s file: 480000/160 = 3000 mel frames -> ceil(3000/2) = 1500 valid
valid = np.full((batch,), 1500, np.int32)

t0 = time.time()
out = _encode_batch(params, wav, valid)
host = np.asarray(out)
print(f"compile+first {time.time()-t0:.1f}s out {host.shape} {host.dtype} "
      f"finite={np.isfinite(host).all()}", flush=True)

# steady state with the pipeline's deferred-fetch depth of 2
in_flight = []
t0 = time.time()
fetched = 0
for i in range(0, n_files, batch):
    in_flight.append(_encode_batch(params, wav, valid))
    while len(in_flight) > 2:
        np.asarray(in_flight.pop(0))
        fetched += batch
while in_flight:
    np.asarray(in_flight.pop(0))
    fetched += batch
wall = time.time() - t0
audio_s = fetched * 30.0
mb = fetched * host[0].nbytes / 1e6
print(f"extract_hs medium: {fetched} files ({audio_s:.0f}s audio) in {wall:.1f}s "
      f"= {audio_s/wall:.1f}x realtime, fetch {mb:.0f} MB ({mb/wall:.1f} MB/s)",
      flush=True)
