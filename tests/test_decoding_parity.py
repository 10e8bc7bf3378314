"""Golden-parity: jit beam/greedy decode + longform driver vs HF generate
on a tiny random Whisper (the engine under src/model/pba_whisper.py)."""

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
from enhance_cb_whisper_tpu.decoding.beam import beam_search, greedy_search
from enhance_cb_whisper_tpu.decoding.logits_process import LogitsProcessorConfig
from enhance_cb_whisper_tpu.models.whisper import WhisperConfig
from enhance_cb_whisper_tpu.models.whisper_loader import load_hf_whisper

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny():
    hf_config = transformers.WhisperConfig(
        vocab_size=128,
        num_mel_bins=8,
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_source_positions=24,
        max_target_positions=40,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))
    return hf, config, params, gen


def _opts(**kw):
    base = dict(
        decoder_start_token_id=3,
        language_token_id=None,
        task_token_id=None,
        no_timestamps_token_id=100,
        prev_sot_token_id=None,
        eos_token_id=2,
        pad_token_id=0,
        suppress_tokens=(),
        begin_suppress_tokens=(),
        max_target_positions=40,
    )
    base.update(kw)
    return GenerationOptions(**base)


def _hf_generate(hf, mel, prompt, num_beams, max_length):
    gc = transformers.GenerationConfig(
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        max_length=max_length,
    )
    from transformers.generation import GenerationMixin

    with torch.no_grad():
        out = GenerationMixin.generate(
            hf,
            torch.from_numpy(mel),
            generation_config=gc,
            decoder_input_ids=torch.tensor(prompt),
            num_beams=num_beams,
            do_sample=False,
        )
    return out.numpy()




@pytest.mark.parametrize("num_beams", [1, 5])
@pytest.mark.parametrize("prompt", [[[3, 4]], [[9, 5, 6, 7, 3, 4]]])
def test_decode_matches_hf(tiny, num_beams, prompt):
    hf, config, params, gen = tiny
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)

    gen_len = 12
    want = _hf_generate(hf, mel, prompt, num_beams, gen_len)

    prompt_np = np.asarray(prompt, dtype=np.int64)
    total_len = prompt_np.shape[1] + gen_len
    opts = _opts(num_beams=num_beams, max_target_positions=total_len)

    enc = gen._encode(mel)
    cross_kv = gen._cross_kv_fn(enc)
    got, _, _ = gen._decode_prompted(cross_kv, prompt_np, None, opts, return_timestamps=False)

    # HF pads to its own length; compare the valid region (pad id 0 after eos)
    want_t = want[0].tolist()
    got_t = got[0].tolist()[: len(want_t)]
    assert got_t == want_t, f"\nours: {got_t}\nhf:   {want_t}"


def test_longform_matches_hf(tiny):
    hf, config, params, gen = tiny
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 8, 130), dtype=np.float32)

    gc = hf.generation_config
    gc.suppress_tokens = None
    gc.begin_suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_timestamps_token_id = 100
    gc.max_initial_timestamp_index = 10
    gc.max_length = 40
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(mel),
            num_beams=1,
            do_sample=False,
            return_timestamps=True,
            condition_on_prev_tokens=True,
            return_segments=True,
        )

    opts = _opts(
        num_beams=1,
        return_timestamps=True,
        condition_on_prev_tokens=True,
        max_initial_timestamp_index=10,
        max_target_positions=40,
    )
    got = gen.generate(mel, opts, return_segments=True)

    want_seq = want["sequences"][0].numpy().tolist()
    got_seq = got["sequences"][0].tolist()
    assert got_seq == want_seq, f"\nours: {got_seq}\nhf:   {want_seq}"

    want_segments = [
        (round(float(s["start"]), 4), round(float(s["end"]), 4), s["tokens"].numpy().tolist())
        for s in want["segments"][0]
    ]
    got_segments = [
        (round(float(s["start"]), 4), round(float(s["end"]), 4), s["tokens"])
        for s in got["segments"][0]
    ]
    assert got_segments == want_segments


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_longform_matches_hf_more_seeds(seed):
    """Longform token parity across differently-initialized models and
    audio — guards against single-seed coincidences."""
    hf_config = transformers.WhisperConfig(
        vocab_size=96, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(seed)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))

    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 8, 150), dtype=np.float32)

    gc = hf.generation_config
    gc.suppress_tokens = None
    gc.begin_suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_timestamps_token_id = 70
    gc.max_initial_timestamp_index = 10
    gc.max_length = 32
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(mel), num_beams=1, do_sample=False,
            return_timestamps=True, condition_on_prev_tokens=True,
            return_segments=True,
        )

    opts = _opts(
        num_beams=1, return_timestamps=True, condition_on_prev_tokens=True,
        max_initial_timestamp_index=10, max_target_positions=32,
        no_timestamps_token_id=70,
    )
    got = gen.generate(mel, opts, return_segments=True)
    assert got["sequences"][0].tolist() == want["sequences"][0].numpy().tolist()


@pytest.mark.parametrize("seed", [4, 5])
def test_beam5_matches_hf_more_seeds(seed):
    """Beam-5 token parity across model seeds (tie-breaking, finished-set
    bookkeeping, early-stopping condition)."""
    hf_config = transformers.WhisperConfig(
        vocab_size=96, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(seed)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))

    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)
    prompt = [[9, 5, 3, 4]]
    want = _hf_generate(hf, mel, prompt, num_beams=5, max_length=24)

    opts = _opts(num_beams=5, max_target_positions=len(prompt[0]) + 24)
    enc = gen._encode(mel)
    cross_kv = gen._cross_kv_fn(enc)
    got, _, _ = gen._decode_prompted(
        cross_kv, np.asarray(prompt, dtype=np.int64), None, opts, return_timestamps=False
    )
    want_t = want[0].tolist()
    assert got[0].tolist()[: len(want_t)] == want_t


def test_batch2_beam_matches_hf():
    """Batched beam search: two utterances decoded together."""
    hf_config = transformers.WhisperConfig(
        vocab_size=96, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(7)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))

    rng = np.random.default_rng(7)
    mel = rng.standard_normal((2, 8, 48), dtype=np.float32)
    prompt = [[3, 4], [3, 4]]
    # NOTE: an explicit max_length != GenerationConfig's default (20) is an
    # ABSOLUTE total length in HF (prompt included) — matching
    # max_target_positions semantics here
    want = _hf_generate(hf, mel, prompt, num_beams=3, max_length=16)

    opts = _opts(num_beams=3, max_target_positions=16)
    enc = gen._encode(mel)
    cross_kv = gen._cross_kv_fn(enc)
    got, _, _ = gen._decode_prompted(
        cross_kv, np.asarray(prompt, dtype=np.int64), None, opts, return_timestamps=False
    )
    for b in range(2):
        want_t = want[b].tolist()
        assert got[b].tolist()[: len(want_t)] == want_t, f"batch row {b}"


@pytest.mark.parametrize("seed", [8, 9])
def test_shortform_timestamps_matches_hf(seed):
    """Shortform via WhisperGenerator.generate with timestamps + injected
    keyword prompt vs HF whisper generate (which strips the prompt)."""
    hf_config = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(seed)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))

    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)
    kw_prompt = [99, 23, 24, 25]

    gc = hf.generation_config
    gc.suppress_tokens = None
    gc.begin_suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_timestamps_token_id = 100
    gc.max_initial_timestamp_index = 10
    gc.max_length = 40
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(mel),
            prompt_ids=torch.tensor(kw_prompt),
            num_beams=1, do_sample=False, return_timestamps=True,
        )[0].numpy().tolist()

    opts = _opts(
        num_beams=1, return_timestamps=True, max_initial_timestamp_index=10,
        max_target_positions=40,
    )
    got = gen.generate(
        mel, opts, keyword_spotting=lambda input_features, start_of_prev: [kw_prompt]
    )[0]
    got = [t for t in got.tolist()]

    # HF strips the prompt AND the <|startoftranscript|> init token from
    # shortform outputs; ours strips the prompt only (pba_whisper.py:338).
    # Compare the generated region after aligning on the init tokens.
    init = opts.init_tokens()
    assert got[: len(init)] == init
    got_gen = got[len(init):]
    # trim trailing pad/eos from both
    def trim(seq):
        out = []
        for t in seq:
            if t in (0, 2):
                break
            out.append(t)
        return out

    # modern HF's unified shortform path post-trims the output after the
    # final complete timestamp segment (docs/PARITY.md #12); the reference's
    # 4.37-era shortform (super().generate) returns the raw sequence like
    # ours.  The decoded tokens must agree over HF's trimmed region.
    want_t = trim(want)
    assert trim(got_gen)[: len(want_t)] == want_t, (
        f"\nours: {trim(got_gen)}\nhf:   {want_t}"
    )


@pytest.mark.parametrize("seed", [10, 11, 12, 13])
def test_decode_fuzz_matches_hf(seed):
    """Randomized decode fuzz: varying beams, prompt lengths, and caps."""
    rng = np.random.default_rng(seed)
    num_beams = int(rng.choice([1, 2, 4, 5]))
    prompt_len = int(rng.integers(1, 7))
    total_len = int(rng.integers(prompt_len + 8, 30))

    hf_config = transformers.WhisperConfig(
        vocab_size=80, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(seed)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))

    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)
    prompt = [[3] + rng.integers(4, 70, prompt_len - 1).tolist()] if prompt_len > 1 else [[3]]

    want = _hf_generate(hf, mel, prompt, num_beams=num_beams, max_length=total_len)
    opts = _opts(num_beams=num_beams, max_target_positions=total_len)
    enc = gen._encode(mel)
    cross_kv = gen._cross_kv_fn(enc)
    got, _, _ = gen._decode_prompted(
        cross_kv, np.asarray(prompt, dtype=np.int64), None, opts, return_timestamps=False
    )
    want_t = want[0].tolist()
    assert got[0].tolist()[: len(want_t)] == want_t, (
        f"beams={num_beams} plen={prompt_len} total={total_len}\n"
        f"ours: {got[0].tolist()[: len(want_t)]}\nhf:   {want_t}"
    )


def test_longform_batch2_with_attention_mask():
    """Batched longform with different audio lengths: the reference's
    dynamic batch reduction (_maybe_reduce_batch, pba_whisper.py:370-376)
    becomes a shrinking active set in our host driver."""
    hf_config = transformers.WhisperConfig(
        vocab_size=96, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(6)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))

    rng = np.random.default_rng(6)
    mel = rng.standard_normal((2, 8, 150), dtype=np.float32)
    attn = np.zeros((2, 150), np.int32)
    attn[0, :150] = 1
    attn[1, :100] = 1
    mel[1, :, 100:] = 0.0

    gc = hf.generation_config
    gc.suppress_tokens = None
    gc.begin_suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_timestamps_token_id = 70
    gc.max_initial_timestamp_index = 10
    gc.max_length = 32
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(mel), attention_mask=torch.from_numpy(attn),
            num_beams=1, do_sample=False, return_timestamps=True,
            condition_on_prev_tokens=True, return_segments=True,
        )

    opts = _opts(
        num_beams=1, return_timestamps=True, condition_on_prev_tokens=True,
        max_initial_timestamp_index=10, max_target_positions=32,
        no_timestamps_token_id=70,
    )
    got = gen.generate(mel, opts, attention_mask=attn, return_segments=True)

    for b in range(2):
        want_b = want["sequences"][b].numpy().tolist()
        got_b = got["sequences"][b].tolist()
        # both right-pad to their own batch max; compare the unpadded region
        n = min(len(want_b), len(got_b))
        trimmed_w = [t for t in want_b if t != 0]
        trimmed_g = [t for t in got_b if t != 0]
        assert trimmed_g == trimmed_w, f"row {b}\nours: {trimmed_g}\nhf:   {trimmed_w}"
