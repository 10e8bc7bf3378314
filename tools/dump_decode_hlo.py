"""Dump the optimized TPU HLO of the flagship decode-loop programs.

The per-op profile breakdowns (`ECW_RTFX_PROFILE`, docs/profiles/*) name ops
by their post-optimization HLO ids (``fusion.503``, ``dynamic_update_slice.59``)
— attribution needs the compiled module text to map those ids to shapes and
source ops.  ``Compiled.as_text()`` works through the axon remote-compile
relay (verified round 5), so this tool:

1. builds the same CBWhisper module as ``bench_rtfx.py`` (env knobs:
   ECW_RTFX_MODEL/DTYPE/BATCH/BEAMS/VOCAB/DECODER/KVCACHE/XKV),
2. spies on the ``beam_search`` / ``greedy_search`` jit call to capture the
   exact runtime arguments of the decode-loop program,
3. AOT-lowers that call and writes ``compiled.as_text()`` to
   ``ECW_HLO_OUT`` (default /tmp/decode_hlo.txt).

Run it like the rtfx bench (TPU via the relay, nohup + poll).  A short clip
(ECW_RTFX_SECONDS=8) hits the same compiled programs as the 120 s bench —
segments are 30 s windows either way.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    if os.environ.get("ECW_RTFX_DEVICE", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from enhance_cb_whisper_tpu.catalog import KeywordCatalog
    from enhance_cb_whisper_tpu.decoding import GenerationOptions
    from enhance_cb_whisper_tpu.decoding import generate as generate_mod
    from enhance_cb_whisper_tpu.models import ResNetConfig
    from enhance_cb_whisper_tpu.models.cb_whisper import CBWhisper, CBWhisperConfig
    from enhance_cb_whisper_tpu.models.kws import KWSModel
    from enhance_cb_whisper_tpu.models.whisper import (
        WhisperConfig,
        init_whisper_params,
    )
    from enhance_cb_whisper_tpu.ops.mel import HOP_LENGTH, log_mel_spectrogram

    rng = np.random.default_rng(0)
    model_size = os.environ.get("ECW_RTFX_MODEL", "medium")
    if model_size == "large":
        config = WhisperConfig(
            vocab_size=51865, num_mel_bins=80, d_model=1280,
            encoder_layers=32, encoder_attention_heads=20,
            decoder_layers=32, decoder_attention_heads=20,
            encoder_ffn_dim=5120, decoder_ffn_dim=5120,
            max_source_positions=1500, max_target_positions=448,
        )
        n_slabs, kws_layer_slice = 12, (10, 22)
    elif model_size == "medium":
        config = WhisperConfig(
            vocab_size=51865, num_mel_bins=80, d_model=1024,
            encoder_layers=24, encoder_attention_heads=16,
            decoder_layers=24, decoder_attention_heads=16,
            encoder_ffn_dim=4096, decoder_ffn_dim=4096,
            max_source_positions=1500, max_target_positions=448,
        )
        n_slabs, kws_layer_slice = 12, (10, 22)
    else:
        config = WhisperConfig(
            vocab_size=51865, num_mel_bins=80, d_model=384,
            encoder_layers=4, encoder_attention_heads=6,
            decoder_layers=4, decoder_attention_heads=6,
            encoder_ffn_dim=1536, decoder_ffn_dim=1536,
            max_source_positions=1500, max_target_positions=448,
        )
        n_slabs, kws_layer_slice = 4, (1, 5)
    params = init_whisper_params(rng, config)

    n_kw = 100
    stacks = [
        rng.standard_normal(
            (n_slabs, int(rng.integers(4, 20)), config.d_model)
        ).astype(np.float32)
        for _ in range(n_kw)
    ]
    stacks = [s / np.linalg.norm(s, axis=-1, keepdims=True) for s in stacks]
    catalog = KeywordCatalog.from_arrays(
        [f"kw{i}" for i in range(n_kw)], stacks, group_size=50
    )
    kws_cfg = ResNetConfig.from_version("resnet-18", num_channels=n_slabs)
    kws = KWSModel(kws_cfg)
    kws_vars = kws.init(
        jax.random.PRNGKey(0), np.zeros((1, n_slabs, 150, 750), np.float32)
    )

    import jax.numpy as jnp

    num_beams = int(os.environ.get("ECW_RTFX_BEAMS", "5"))
    batch_size = int(os.environ.get("ECW_RTFX_BATCH", "4"))
    opts = GenerationOptions(
        num_beams=num_beams, return_timestamps=True,
        condition_on_prev_tokens=True,
    )
    dtype = (
        jnp.bfloat16
        if os.environ.get("ECW_RTFX_DTYPE", "bfloat16") == "bfloat16"
        else jnp.float32
    )
    module = CBWhisper(
        dtype=dtype,
        vocab_int8=os.environ.get("ECW_RTFX_VOCAB", "int8") == "int8",
        decoder_int8=os.environ.get("ECW_RTFX_DECODER", "int8") == "int8",
        cross_kv_int8=os.environ.get("ECW_RTFX_XKV", "int8") == "int8",
        kv_cache_int8=os.environ.get("ECW_RTFX_KVCACHE", "int8") == "int8",
        config=CBWhisperConfig(),
        whisper_config=config,
        whisper_params=params,
        kws_model=kws,
        kws_variables=kws_vars,
        catalog=catalog,
        generation_options=opts,
        prompt_ids_fn=lambda text: [50361] + [100 + (ord(c) % 1000) for c in text][:8],
        decode_fn=lambda toks: " ".join(map(str, toks)),
        kws_layer_slice=kws_layer_slice,
    )

    # spy on the decode-loop jit call: the generator looks the names up in
    # its module globals at call time, so rebinding them there captures the
    # exact (args, kwargs) of the compiled program
    captured = {}
    real = {
        "beam_search": generate_mod.beam_search,
        "greedy_search": generate_mod.greedy_search,
    }

    def make_spy(name):
        def spy(*a, **k):
            captured.setdefault(name, (a, k))
            return real[name](*a, **k)

        return spy

    generate_mod.beam_search = make_spy("beam_search")
    generate_mod.greedy_search = make_spy("greedy_search")

    sec = int(os.environ.get("ECW_RTFX_SECONDS", "8"))
    audio = (rng.standard_normal(16000 * sec) * 0.05).astype(np.float32)
    target = ((audio.size + HOP_LENGTH - 1) // HOP_LENGTH) * HOP_LENGTH
    padded = np.zeros((target,), np.float32)
    padded[: audio.size] = audio
    mel = np.asarray(log_mel_spectrogram(padded[None]))
    module.forward_batch([mel] * batch_size, [None] * batch_size)

    out = os.environ.get("ECW_HLO_OUT", "/tmp/decode_hlo.txt")
    name = "beam_search" if num_beams > 1 else "greedy_search"
    a, k = captured[name]
    lowered = real[name].lower(*a, **k)
    text = lowered.compile().as_text()
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {len(text)} bytes of optimized {name} HLO to {out}")


if __name__ == "__main__":
    main()
