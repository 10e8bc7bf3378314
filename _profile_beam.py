"""Profile one longform beam-5 forward (whisper-tiny, batch 1)."""
import numpy as np

from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from enhance_cb_whisper_tpu.catalog import KeywordCatalog
from enhance_cb_whisper_tpu.decoding import GenerationOptions
from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.models.cb_whisper import CBWhisper, CBWhisperConfig
from enhance_cb_whisper_tpu.models.kws import KWSModel
from enhance_cb_whisper_tpu.models.whisper import WhisperConfig, init_whisper_params
from enhance_cb_whisper_tpu.ops.mel import HOP_LENGTH, log_mel_spectrogram
from enhance_cb_whisper_tpu.runtime.profiler import device_op_breakdown, trace

rng = np.random.default_rng(0)
config = WhisperConfig(
    vocab_size=51865, num_mel_bins=80, d_model=384,
    encoder_layers=4, encoder_attention_heads=6,
    decoder_layers=4, decoder_attention_heads=6,
    encoder_ffn_dim=1536, decoder_ffn_dim=1536,
    max_source_positions=1500, max_target_positions=448,
)
params = init_whisper_params(rng, config)
n_kw, n_slabs = 100, 4
stacks = [
    rng.standard_normal((n_slabs, int(rng.integers(4, 20)), 384)).astype(np.float32)
    for _ in range(n_kw)
]
stacks = [s / np.linalg.norm(s, axis=-1, keepdims=True) for s in stacks]
catalog = KeywordCatalog.from_arrays([f"kw{i}" for i in range(n_kw)], stacks, group_size=50)
kws_cfg = ResNetConfig.from_version("resnet-18", num_channels=n_slabs)
kws = KWSModel(kws_cfg)
kws_vars = kws.init(jax.random.PRNGKey(0), np.zeros((1, n_slabs, 150, 750), np.float32))
opts = GenerationOptions(num_beams=5, return_timestamps=True, condition_on_prev_tokens=True)
module = CBWhisper(
    config=CBWhisperConfig(), whisper_config=config, whisper_params=params,
    kws_model=kws, kws_variables=kws_vars, catalog=catalog,
    generation_options=opts,
    prompt_ids_fn=lambda text: [50361] + [100 + (ord(c) % 1000) for c in text][:8],
    decode_fn=lambda toks: " ".join(map(str, toks)),
    kws_layer_slice=(1, 5),
)
seconds = 120
audio = (rng.standard_normal(16000 * seconds) * 0.05).astype(np.float32)
target = ((audio.size + HOP_LENGTH - 1) // HOP_LENGTH) * HOP_LENGTH
padded = np.zeros((target,), np.float32)
padded[: audio.size] = audio
mel = np.asarray(log_mel_spectrogram(padded[None]))

mels4 = [mel] * 4
module.forward_batch(mels4, [None] * 4)  # warm
with trace("/tmp/beam_trace"):
    module.forward_batch(mels4, [None] * 4)
total, ops = device_op_breakdown("/tmp/beam_trace")
print(f"total device s: {total:.3f}")
for o in ops[:30]:
    print(f"{o['seconds']*1e3:9.2f} ms x{o['count']:5d}  {o['name'][:95]}")
