"""Supplementary benchmark: longform CB-Whisper real-time factor on TPU.

End-to-end flagship path on synthetic audio: mel → encoder → per-segment
keyword spotting over a catalog → biased prompt → greedy longform decode
with condition-on-prev.  Whisper-tiny dimensions with random weights (the
shapes and program structure match real checkpoints; only the tokens
decoded differ), 100-keyword catalog.

Prints one JSON line: {"metric": "cb_whisper_rtfx", ...} — seconds of audio
transcribed per wall-clock second (the reference never measured throughput,
BASELINE.md).
"""

import json
import os
import time

import numpy as np


def bench_reference_cpu(seconds: int = 60) -> float:
    """Reference-style longform CB-Whisper on CPU (torch + HF), same dims as
    the TPU path: per 30 s segment, a Whisper-encoder KWS pass (encoder fwd +
    cossim + bilinear resize + ResNet-18 over a 100-keyword DB in groups of
    50, cb_whisper.py:82-149) followed by HF longform generate (greedy,
    condition_on_prev, timestamps).  Returns x-realtime.  This anchors the
    BASELINE.md north-star (>=20x CPU RTFx)."""
    import torch
    import torch.nn.functional as F
    import transformers

    torch.manual_seed(0)
    hf_config = transformers.WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=384,
        encoder_layers=4, encoder_attention_heads=6,
        decoder_layers=4, decoder_attention_heads=6,
        encoder_ffn_dim=1536, decoder_ffn_dim=1536,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=50256, bos_token_id=50257, eos_token_id=50256,
        decoder_start_token_id=50257, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    model = transformers.WhisperForConditionalGeneration(hf_config).eval()

    rng = np.random.default_rng(0)
    n_kw, n_slabs = 100, 4
    kwd_stacks = [
        torch.from_numpy(
            rng.standard_normal((n_slabs, int(rng.integers(4, 20)), 384)).astype(np.float32)
        )
        for _ in range(n_kw)
    ]
    rcfg = transformers.ResNetConfig(
        num_channels=n_slabs, embedding_sizes=None,
        layer_type="basic", hidden_sizes=[64, 128, 256, 512], depths=[2, 2, 2, 2],
    )
    resnet = transformers.ResNetModel(rcfg).eval()
    head = torch.nn.Linear(512, 2)

    fe = transformers.WhisperFeatureExtractor()
    audio = (rng.standard_normal(16000 * seconds) * 0.05).astype(np.float32)

    t0 = time.perf_counter()
    with torch.no_grad():
        for seg_start in range(0, seconds, 30):
            seg = audio[seg_start * 16000 : (seg_start + 30) * 16000]
            feats = fe(seg, sampling_rate=16000, return_tensors="pt").input_features
            # KWS pass: encoder hidden states -> grouped cossim scoring
            enc = model.model.encoder(feats, output_hidden_states=True)
            utt = torch.cat(enc.hidden_states[1:5], dim=0)  # [4, 1500, 384]
            utt = utt / torch.linalg.norm(utt, dim=-1, keepdim=True)
            for lo in range(0, n_kw, 50):
                for s in kwd_stacks[lo : lo + 50]:
                    sim = torch.matmul(s, utt.transpose(1, 2))
                    resized = F.interpolate(
                        sim[None], size=(150, 750), mode="bilinear",
                        align_corners=False, antialias=False,
                    )
                    head(resnet(resized).pooler_output.flatten(1)).softmax(-1)
        # longform biased decode (HF seek loop, greedy, condition_on_prev)
        full = fe(
            audio, sampling_rate=16000, return_tensors="pt",
            truncation=False, padding="longest",
        ).input_features
        gc = transformers.GenerationConfig(
            pad_token_id=50256, bos_token_id=50257, eos_token_id=50256,
            decoder_start_token_id=50257, max_length=448,
            no_timestamps_token_id=50363,
        )
        try:
            model.generate(
                full, generation_config=gc, return_timestamps=True,
                condition_on_prev_tokens=True, num_beams=1, do_sample=False,
            )
        except Exception as e:  # random weights can emit undecodable seeks
            print(f"cpu longform generate stopped early: {e}")
    wall = time.perf_counter() - t0
    return seconds / wall


def main():
    import jax

    if os.environ.get("ECW_RTFX_DEVICE", "") == "cpu":
        # smoke-test escape hatch (sitecustomize pins JAX_PLATFORMS=axon;
        # the env var is too late in-process — must use jax.config)
        jax.config.update("jax_platforms", "cpu")

    from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from enhance_cb_whisper_tpu.catalog import KeywordCatalog
    from enhance_cb_whisper_tpu.decoding import GenerationOptions
    from enhance_cb_whisper_tpu.models import ResNetConfig
    from enhance_cb_whisper_tpu.models.cb_whisper import CBWhisper, CBWhisperConfig
    from enhance_cb_whisper_tpu.models.kws import KWSModel
    from enhance_cb_whisper_tpu.models.whisper import WhisperConfig, init_whisper_params
    from enhance_cb_whisper_tpu.ops.mel import log_mel_spectrogram

    rng = np.random.default_rng(0)
    # ECW_RTFX_MODEL: 'tiny' (4-layer d=384 dims, the fast default) or
    # 'medium' (24-layer d=1024 — the reference's KWS encoder scale,
    # aishell/build.sh:74-112; random weights, real shapes/program)
    model_size = os.environ.get("ECW_RTFX_MODEL", "tiny")
    if model_size == "large":
        # whisper-large-v2 dims — the reference's flagship ASR checkpoint
        # (src/data/data_module.py:31, configs/cb-whisper-acl.yaml)
        config = WhisperConfig(
            vocab_size=51865, num_mel_bins=80, d_model=1280,
            encoder_layers=32, encoder_attention_heads=20,
            decoder_layers=32, decoder_attention_heads=20,
            encoder_ffn_dim=5120, decoder_ffn_dim=5120,
            max_source_positions=1500, max_target_positions=448,
        )
        n_slabs = 12
        kws_layer_slice = (10, 22)
    elif model_size == "medium":
        config = WhisperConfig(
            vocab_size=51865, num_mel_bins=80, d_model=1024,
            encoder_layers=24, encoder_attention_heads=16,
            decoder_layers=24, decoder_attention_heads=16,
            encoder_ffn_dim=4096, decoder_ffn_dim=4096,
            max_source_positions=1500, max_target_positions=448,
        )
        n_slabs = 12
        kws_layer_slice = (10, 22)
    else:
        config = WhisperConfig(
            vocab_size=51865, num_mel_bins=80, d_model=384,
            encoder_layers=4, encoder_attention_heads=6,
            decoder_layers=4, decoder_attention_heads=6,
            encoder_ffn_dim=1536, decoder_ffn_dim=1536,
            max_source_positions=1500, max_target_positions=448,
        )
        n_slabs = 4
        kws_layer_slice = (1, 5)
    params = init_whisper_params(rng, config)

    n_kw = 100
    stacks = [
        rng.standard_normal((n_slabs, int(rng.integers(4, 20)), config.d_model)).astype(np.float32)
        for _ in range(n_kw)
    ]
    stacks = [s / np.linalg.norm(s, axis=-1, keepdims=True) for s in stacks]
    catalog = KeywordCatalog.from_arrays([f"kw{i}" for i in range(n_kw)], stacks, group_size=50)

    kws_cfg = ResNetConfig.from_version("resnet-18", num_channels=n_slabs)
    kws = KWSModel(kws_cfg)
    kws_vars = kws.init(jax.random.PRNGKey(0), np.zeros((1, n_slabs, 150, 750), np.float32))

    # knobs: ECW_RTFX_BEAMS (1 = greedy flagship, 5 = reference beam width),
    # ECW_RTFX_BATCH (>1 decodes several utterances per longform launch via
    # forward_batch — the throughput serving mode)
    num_beams = int(os.environ.get("ECW_RTFX_BEAMS", "1"))
    batch_size = int(os.environ.get("ECW_RTFX_BATCH", "1"))
    opts = GenerationOptions(
        num_beams=num_beams, return_timestamps=True, condition_on_prev_tokens=True,
    )

    import jax.numpy as jnp

    dtype = (
        jnp.bfloat16
        if os.environ.get("ECW_RTFX_DTYPE", "float32") == "bfloat16"
        else jnp.float32
    )
    module = CBWhisper(
        dtype=dtype,
        # ECW_RTFX_VOCAB=int8: weight-only int8 vocab projection (serving
        # mode; halves the decode loop's dominant HBM read)
        vocab_int8=os.environ.get("ECW_RTFX_VOCAB", "") == "int8",
        # ECW_RTFX_DECODER=int8: weight-only int8 for every decoder-layer
        # linear in the decode loop (halves the per-step layer-weight read)
        decoder_int8=os.environ.get("ECW_RTFX_DECODER", "") == "int8",
        # ECW_RTFX_XKV=int8: int8 cross-attention K/V (approximate; halves
        # the per-step 1500-frame cross-K/V slab read — quantized once per
        # segment, read every decode step)
        cross_kv_int8=os.environ.get("ECW_RTFX_XKV", "") == "int8",
        # ECW_RTFX_KVCACHE=int8: int8 self-attention KV cache (approximate;
        # halves the per-step cache read that dominates batched beam decode)
        kv_cache_int8=os.environ.get("ECW_RTFX_KVCACHE", "") == "int8",
        # ECW_RTFX_STAGING=W: staged cache writes — the big-slab
        # read-modify-write (47% of beam decode device time, PERF.md
        # round-5 attribution) amortizes /W
        kv_staging=int(os.environ.get("ECW_RTFX_STAGING", "0")),
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

    from enhance_cb_whisper_tpu.ops.mel import HOP_LENGTH

    def make_mel(sec: int) -> np.ndarray:
        audio = (rng.standard_normal(16000 * sec) * 0.05).astype(np.float32)
        target = ((audio.size + HOP_LENGTH - 1) // HOP_LENGTH) * HOP_LENGTH
        padded = np.zeros((target,), np.float32)
        padded[: audio.size] = audio
        return np.asarray(log_mel_spectrogram(padded[None]))

    # ECW_RTFX_PACKED=1: continuous-batching scheduler (forward_packed,
    # slots=ECW_RTFX_BATCH) instead of fixed groups.  ECW_RTFX_HETERO=1:
    # mixed-length corpus (the workload where packing pays — fixed groups
    # drain to batch 1 at every group tail).  A/B protocol: both modes run
    # condition_on_prev + spotting, so junk decode saturates the prev cap
    # and BOTH sit on the same top prompt bucket with near-equal per-window
    # decode budgets; the packed win isolated here is scheduling, not
    # shorter decode loops.
    packed = os.environ.get("ECW_RTFX_PACKED", "0") == "1"
    hetero = os.environ.get("ECW_RTFX_HETERO", "0") == "1"
    base = int(os.environ.get("ECW_RTFX_SECONDS", "120"))
    if hetero:
        pattern = [base, base // 4, base * 3 // 4, base // 2]
        lengths = pattern * max(1, (2 * batch_size + 3) // 4)
    else:
        lengths = [base] * max(batch_size, 1)
    seconds = sum(lengths)
    mels_list = [make_mel(s) for s in lengths]
    mel = mels_list[0]

    # warm up every compile path (incl. all prompt-length buckets the
    # growing condition-on-prev context will hit) with the same clips
    def decode_once():
        if packed:
            list(
                module.forward_packed(
                    ((m, None) for m in mels_list), slots=max(batch_size, 1)
                )
            )
        elif hetero:
            for i in range(0, len(mels_list), batch_size):
                group = mels_list[i : i + batch_size]
                module.forward_batch(group, [None] * len(group))
        elif batch_size > 1:
            module.forward_batch(mels_list, [None] * batch_size)
        else:
            module.forward(mel)

    t0 = time.perf_counter()
    decode_once()
    compile_s = time.perf_counter() - t0

    # ECW_RTFX_PROFILE=<dir>: capture a device trace of the timed run and
    # print the per-op breakdown (runtime/profiler.py) — how the beam-5
    # bottleneck is attributed at real dims (VERDICT r3 next #3)
    profile_dir = os.environ.get("ECW_RTFX_PROFILE", "")
    t0 = time.perf_counter()
    if profile_dir:
        from enhance_cb_whisper_tpu.runtime.profiler import (
            device_op_breakdown,
            trace,
        )

        with trace(profile_dir):
            decode_once()
    else:
        decode_once()
    wall = time.perf_counter() - t0
    if profile_dir:
        total, ops = device_op_breakdown(profile_dir)
        lines = [f"# total device s: {total:.3f} (wall {wall:.3f})"] + [
            f"# {o['seconds']*1e3:9.2f} ms x{o['count']:6d}  {o['name'][:90]}"
            for o in ops[:40]
        ]
        print("\n".join(lines))
        # the sweep runner keeps only JSON/last stdout lines — persist the
        # breakdown next to the trace
        with open(os.path.join(profile_dir, "breakdown.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    if packed or hetero:
        seconds = float(seconds)  # corpus-level RTFx: total audio / wall
    else:
        seconds = float(lengths[0])
        wall /= max(batch_size, 1)  # per-utterance

    baseline = None
    if os.environ.get("ECW_RTFX_CPU_BASELINE", "1") != "0":
        try:
            baseline = bench_reference_cpu(seconds=60)
        except Exception as e:
            print(f"cpu baseline failed: {e}")

    rtfx = seconds / wall
    print(
        json.dumps(
            {
                "metric": "cb_whisper_longform_rtfx",
                "value": round(rtfx, 2),
                "unit": "x realtime",
                "vs_baseline": round(rtfx / baseline, 2) if baseline else None,
                "cpu_baseline_rtfx": round(baseline, 3) if baseline else None,
                "compile_seconds": round(compile_s, 1),
                "wall_seconds": round(wall, 2),
                "num_beams": num_beams,
                "eval_batch": batch_size,
                **({"packed": True} if packed else {}),
                **({"hetero_corpus_s": lengths} if hetero else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
