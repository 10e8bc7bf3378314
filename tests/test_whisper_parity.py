"""Golden-parity tests: functional JAX Whisper vs HF WhisperModel (torch CPU)
on a tiny randomly-initialized configuration (SURVEY.md §4 test strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.models.whisper import (
    WhisperConfig,
    decoder_forward,
    encoder_forward,
    encoder_kws_stack,
    init_cache,
    precompute_cross_kv,
    sinusoid_positions,
)
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
        max_target_positions=16,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    hf = transformers.WhisperModel(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    return hf, config, params


def _mel(config, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        (batch, config.num_mel_bins, config.max_source_positions * 2), dtype=np.float32
    )


def test_encoder_matches_hf(tiny):
    hf, config, params = tiny
    mel = _mel(config)
    with torch.no_grad():
        hf_out = hf.encoder(torch.from_numpy(mel), output_hidden_states=True)
    last, states = encoder_forward(params, mel, config, output_hidden_states=True)
    np.testing.assert_allclose(
        np.asarray(last), hf_out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-5
    )
    assert states.shape[0] == config.encoder_layers + 1
    for i, hs in enumerate(hf_out.hidden_states):
        np.testing.assert_allclose(
            np.asarray(states[i]), hs.numpy(), rtol=2e-4, atol=2e-5,
            err_msg=f"hidden state {i}",
        )


def test_encoder_kws_stack_normalized(tiny):
    hf, config, params = tiny
    mel = _mel(config, batch=1)
    stack = encoder_kws_stack(params, mel, config, layer_slice=(1, 3))
    assert stack.shape == (1, 2, config.max_source_positions, config.d_model)
    norms = np.linalg.norm(np.asarray(stack), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    # valid_frames zeroes the tail
    stack2 = encoder_kws_stack(
        params, mel, config, layer_slice=(1, 3), valid_frames=np.array([5])
    )
    assert np.all(np.asarray(stack2)[:, :, 5:, :] == 0)
    np.testing.assert_allclose(
        np.asarray(stack2)[:, :, :5], np.asarray(stack)[:, :, :5], rtol=1e-6
    )


def test_decoder_teacher_forcing_matches_hf(tiny):
    hf, config, params = tiny
    mel = _mel(config)
    ids = np.array([[3, 7, 11, 2], [1, 5, 9, 13]], dtype=np.int64)
    with torch.no_grad():
        enc = hf.encoder(torch.from_numpy(mel)).last_hidden_state
        hf_out = hf.decoder(
            input_ids=torch.from_numpy(ids), encoder_hidden_states=enc
        ).last_hidden_state
        # logits = tied embedding projection
        want = (hf_out @ hf.decoder.embed_tokens.weight.T).numpy()

    enc_j, _ = encoder_forward(params, mel, config)
    cross_kv = precompute_cross_kv(params, enc_j, config)
    logits, _ = decoder_forward(params, ids, cross_kv, config)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4, atol=3e-4)


def test_incremental_decode_matches_teacher_forcing(tiny):
    hf, config, params = tiny
    mel = _mel(config, batch=1)
    ids = np.array([[3, 7, 11, 2, 9]], dtype=np.int64)

    enc_j, _ = encoder_forward(params, mel, config)
    cross_kv = precompute_cross_kv(params, enc_j, config)
    full_logits, _ = decoder_forward(params, ids, cross_kv, config)

    cache = init_cache(config, batch=1, max_len=8)
    step_logits = []
    for t in range(ids.shape[1]):
        logits, cache = decoder_forward(
            params, ids[:, t : t + 1], cross_kv, config, cache=cache
        )
        step_logits.append(np.asarray(logits)[:, 0])
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits), rtol=2e-4, atol=3e-4)


def test_prompt_prefill_then_steps(tiny):
    """Prefill a multi-token prompt through the cache in one call, then step:
    must equal full teacher forcing (this is the biased-prompt decode path)."""
    hf, config, params = tiny
    mel = _mel(config, batch=1)
    ids = np.array([[3, 7, 11, 2, 9, 4]], dtype=np.int64)

    enc_j, _ = encoder_forward(params, mel, config)
    cross_kv = precompute_cross_kv(params, enc_j, config)
    full_logits, _ = decoder_forward(params, ids, cross_kv, config)

    cache = init_cache(config, batch=1, max_len=8)
    prefill_logits, cache = decoder_forward(params, ids[:, :4], cross_kv, config, cache=cache)
    np.testing.assert_allclose(
        np.asarray(prefill_logits), np.asarray(full_logits)[:, :4], rtol=2e-4, atol=3e-4
    )
    logits5, cache = decoder_forward(params, ids[:, 4:5], cross_kv, config, cache=cache)
    np.testing.assert_allclose(
        np.asarray(logits5)[:, 0], np.asarray(full_logits)[:, 4], rtol=2e-4, atol=3e-4
    )


def test_sinusoid_positions_match_hf_buffer(tiny):
    hf, config, params = tiny
    want = hf.encoder.embed_positions.weight.detach().numpy()
    got = sinusoid_positions(config.max_source_positions, config.d_model)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# scan-over-layers (stacked params) vs unrolled layer loop
#
# The stacked layout rolls the homogeneous layer loop into lax.scan so the
# traced HLO is ~n_layers x smaller (what lets whisper-medium compile through
# the remote-compile relay).  The computation per layer is identical; these
# tests pin that the two layouts agree to float roundoff on every surface
# (encoder, hidden-state stack, teacher-forcing decode, incremental decode).


def test_scan_encoder_matches_unrolled(tiny):
    from enhance_cb_whisper_tpu.models.whisper import stack_whisper_params

    _, config, params = tiny
    mel = _mel(config)
    sparams = stack_whisper_params(params)

    last_u, states_u = encoder_forward(params, mel, config, output_hidden_states=True)
    last_s, states_s = encoder_forward(sparams, mel, config, output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(last_s), np.asarray(last_u), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(states_s), np.asarray(states_u), rtol=1e-6, atol=1e-6)

    # and without hidden states
    last_u2, _ = encoder_forward(params, mel, config)
    last_s2, _ = encoder_forward(sparams, mel, config)
    np.testing.assert_allclose(np.asarray(last_s2), np.asarray(last_u2), rtol=1e-6, atol=1e-6)


def test_scan_decoder_matches_unrolled(tiny):
    from enhance_cb_whisper_tpu.models.whisper import stack_whisper_params

    _, config, params = tiny
    sparams = stack_whisper_params(params)
    mel = _mel(config, batch=1)
    ids = np.asarray([[3, 5, 7, 11, 13, 17, 19, 23]], dtype=np.int32)

    enc_u, _ = encoder_forward(params, mel, config)
    ckv_u = precompute_cross_kv(params, enc_u, config)
    logits_u, _ = decoder_forward(params, ids, ckv_u, config)

    enc_s, _ = encoder_forward(sparams, mel, config)
    ckv_s = precompute_cross_kv(sparams, enc_s, config)
    assert isinstance(ckv_s, dict) and ckv_s["k"].shape[0] == config.decoder_layers
    logits_s, _ = decoder_forward(sparams, ids, ckv_s, config)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits_u), rtol=1e-5, atol=1e-5)


def test_scan_incremental_decode_matches_unrolled(tiny):
    from enhance_cb_whisper_tpu.models.whisper import stack_whisper_params

    _, config, params = tiny
    sparams = stack_whisper_params(params)
    mel = _mel(config, batch=1)
    ids = np.asarray([[3, 5, 7, 11, 13, 17, 19, 23]], dtype=np.int32)

    enc_s, _ = encoder_forward(sparams, mel, config)
    ckv_s = precompute_cross_kv(sparams, enc_s, config)
    full_logits, _ = decoder_forward(sparams, ids, ckv_s, config)

    cache = init_cache(config, batch=1, max_len=8, stacked=True)
    step_logits = []
    for t in range(ids.shape[1]):
        logits, cache = decoder_forward(
            sparams, ids[:, t : t + 1], ckv_s, config, cache=cache
        )
        step_logits.append(np.asarray(logits[:, 0]))
    np.testing.assert_allclose(
        np.stack(step_logits, axis=1), np.asarray(full_logits), rtol=1e-5, atol=1e-5
    )


def test_vocab_int8_projection_accuracy(tiny):
    """Weight-only int8 vocab projection (serving mode): logits within int8
    rounding of the fp32 projection, and greedy decisions preserved on the
    teacher-forcing surface."""
    from enhance_cb_whisper_tpu.models.whisper import (
        quantize_vocab_projection,
        stack_whisper_params,
    )

    _, config, params = tiny
    qparams = stack_whisper_params(quantize_vocab_projection(params))
    sparams = stack_whisper_params(params)
    mel = _mel(config, batch=1)
    ids = np.asarray([[3, 5, 7, 11, 13, 17, 19, 23]], dtype=np.int32)

    enc, _ = encoder_forward(sparams, mel, config)
    ckv = precompute_cross_kv(sparams, enc, config)
    ref, _ = decoder_forward(sparams, ids, ckv, config)
    got, _ = decoder_forward(qparams, ids, ckv, config)

    ref = np.asarray(ref)
    got = np.asarray(got)
    # int8 weight rounding: relative error bounded by ~1/127 of the row range
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.02 * scale
    # greedy decisions preserved on this fixture
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_vocab_int8_generator_greedy_close():
    """End-to-end: WhisperGenerator(vocab_int8=True) greedy longform decode
    runs and stays CLOSE to the fp32-projection generator on a tiny model.

    int8 weight rounding is lossy by design (a serving mode, not the parity
    default) — on a RANDOM model the logit gaps are near-tied, so exact
    token parity is not a sound expectation (one flipped near-tie at step k
    changes every later token).  The deterministic quantization math and
    its error bound are pinned by test_vocab_int8_projection_accuracy; here
    we assert the decode surface works end to end and the first flip (if
    any) happens deep into the sequence rather than immediately."""
    import torch
    from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
    from enhance_cb_whisper_tpu.models.whisper import WhisperConfig as WC

    hf_config = transformers.WhisperConfig(
        vocab_size=96, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(3)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WC.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    opts = GenerationOptions(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=70, prev_sot_token_id=None, eos_token_id=2,
        pad_token_id=0, suppress_tokens=(), begin_suppress_tokens=(),
        max_initial_timestamp_index=10, num_beams=1, return_timestamps=True,
        condition_on_prev_tokens=True, max_target_positions=32,
    )
    mel = np.random.default_rng(3).standard_normal((1, 8, 150), dtype=np.float32)
    ref = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32)).generate(mel, opts)
    got = WhisperGenerator(
        config, params, prompt_buckets=(8, 16, 32), vocab_int8=True
    ).generate(mel, opts)
    r, g = ref[0].tolist(), got[0].tolist()
    prefix = next((i for i in range(min(len(r), len(g))) if r[i] != g[i]),
                  min(len(r), len(g)))
    # identical for a long prefix: near-tie flips on a random model are
    # tolerated but must not corrupt the decode from the start
    assert prefix >= 24, (prefix, r, g)


def test_decoder_int8_accuracy(tiny):
    """Weight-only int8 on every decode-loop decoder linear
    (quantize_decoder_layers, serving mode): per-output-channel scales keep
    the teacher-forcing logits within the standard weight-only error bound
    and preserve greedy decisions on this fixture; stacked and unrolled
    layouts quantize identically."""
    import jax

    from enhance_cb_whisper_tpu.models.whisper import (
        quantize_decoder_layers,
        stack_whisper_params,
    )

    _, config, params = tiny
    sparams = stack_whisper_params(params)
    q_unrolled = stack_whisper_params(quantize_decoder_layers(params))
    q_stacked = quantize_decoder_layers(sparams)

    for a, b in zip(jax.tree.leaves(q_unrolled), jax.tree.leaves(q_stacked)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    mel = _mel(config, batch=1)
    ids = np.asarray([[3, 5, 7, 11, 13, 17, 19, 23]], dtype=np.int32)
    enc, _ = encoder_forward(sparams, mel, config)
    ckv = precompute_cross_kv(sparams, enc, config)
    ref, _ = decoder_forward(sparams, ids, ckv, config)
    got, _ = decoder_forward(q_stacked, ids, ckv, config)

    ref, got = np.asarray(ref), np.asarray(got)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.05 * scale
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_decoder_int8_generator_greedy_close():
    """End-to-end: WhisperGenerator(decoder_int8=True, vocab_int8=True)
    longform greedy decode runs and stays close to fp32 on a tiny random
    model (same tolerance rationale as test_vocab_int8_generator_greedy_close
    — near-tie argmax flips on random weights are tolerated, early
    corruption is not)."""
    import torch
    from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
    from enhance_cb_whisper_tpu.models.whisper import WhisperConfig as WC

    hf_config = transformers.WhisperConfig(
        vocab_size=96, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(3)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WC.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    opts = GenerationOptions(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=70, prev_sot_token_id=None, eos_token_id=2,
        pad_token_id=0, suppress_tokens=(), begin_suppress_tokens=(),
        max_initial_timestamp_index=10, num_beams=1, return_timestamps=True,
        condition_on_prev_tokens=True, max_target_positions=32,
    )
    mel = np.random.default_rng(3).standard_normal((1, 8, 150), dtype=np.float32)
    ref = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32)).generate(mel, opts)
    got = WhisperGenerator(
        config, params, prompt_buckets=(8, 16, 32),
        vocab_int8=True, decoder_int8=True,
    ).generate(mel, opts)
    r, g = ref[0].tolist(), got[0].tolist()
    prefix = next((i for i in range(min(len(r), len(g))) if r[i] != g[i]),
                  min(len(r), len(g)))
    assert prefix >= 20, (prefix, r, g)


def test_decoder_int8_beam_runs(tiny):
    """decoder_int8 composes with the ancestry beam cache: beam-5 decode
    executes and returns well-formed sequences."""
    from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator

    hf, config, params = tiny
    gen = WhisperGenerator(
        config, params, prompt_buckets=(8,), decoder_int8=True
    )
    opts = GenerationOptions(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=50, prev_sot_token_id=None, eos_token_id=2,
        pad_token_id=0, suppress_tokens=(), begin_suppress_tokens=(),
        max_target_positions=24, num_beams=5,
    )
    mel = _mel(config, batch=2)
    ckv = gen._cross_kv_fn(gen._encode(mel))
    seqs, scores, _ = gen._decode_prompted(
        ckv, np.full((2, 1), 3, np.int64), None, opts, return_timestamps=False
    )
    seqs = np.asarray(seqs)
    assert seqs.shape == (2, 24)
    assert np.isfinite(np.asarray(scores)).all()
