"""Speculative greedy decoding: output-identical to plain greedy.

The speculative path (decoding/speculative.py) must emit EXACTLY the plain
greedy sequence — the draft model only re-schedules device work.  These
tests pin that equivalence across batch sizes, draft quality (a different
random draft ≈ 0% acceptance; the target itself as draft = 100%), the
timestamp processor stack, eos/max-length boundaries, the longform
seek-loop, and the temperature-fallback ladder (sampled rungs must take
the normal path).  Also covers the per-row machinery the loop relies on:
vector ``cur_len`` logits processing and vector cache indices in
``decoder_forward``."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
from enhance_cb_whisper_tpu.decoding.logits_process import (
    LogitsProcessorConfig,
    apply_logits_processors,
)
from enhance_cb_whisper_tpu.models.whisper import (
    WhisperConfig,
    decoder_forward,
    init_cache,
    precompute_cross_kv,
    stack_whisper_params,
)
from enhance_cb_whisper_tpu.models.whisper_loader import load_hf_whisper

transformers = pytest.importorskip("transformers")


def _make_model(seed: int, d_model: int = 32, layers: int = 2, heads: int = 4):
    hf_config = transformers.WhisperConfig(
        vocab_size=128,
        num_mel_bins=8,
        d_model=d_model,
        encoder_layers=layers,
        encoder_attention_heads=heads,
        decoder_layers=layers,
        decoder_attention_heads=heads,
        encoder_ffn_dim=2 * d_model,
        decoder_ffn_dim=2 * d_model,
        max_source_positions=24,
        max_target_positions=40,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(seed)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    return config, params


@pytest.fixture(scope="module")
def models():
    target = _make_model(0)
    draft = _make_model(7, d_model=16, layers=1, heads=2)
    return target, draft


@pytest.fixture(autouse=True)
def _no_bailout(monkeypatch):
    """Random tiny-vocab drafts sit at ~1 token/window, which would trip
    the acceptance auto-bailout mid-test and silently turn the speculative
    parity tests into plain-vs-plain; disable it here (the bailout has its
    own dedicated test below)."""
    monkeypatch.setenv("ECW_SPEC_MIN_TPW", "0")


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


def _pair(models, speculative_k=4, draft_params=None, **gen_kw):
    """(plain generator, speculative generator) over the same target."""
    (tcfg, tparams), (dcfg, dparams) = models
    if draft_params is not None:
        dcfg, dparams = draft_params
    plain = WhisperGenerator(tcfg, tparams, prompt_buckets=(8, 16, 32), **gen_kw)
    spec = WhisperGenerator(
        tcfg, tparams, prompt_buckets=(8, 16, 32),
        draft=(dcfg, dparams), speculative_k=speculative_k, **gen_kw,
    )
    return plain, spec


# --------------------------------------------------------------------- unit


def test_vector_cur_len_matches_scalar_calls():
    """apply_logits_processors with a [B] cur_len == per-row scalar calls
    (the speculative verify processes rows at different positions)."""
    cfg = LogitsProcessorConfig(
        suppress_tokens=(5, 9),
        begin_suppress_tokens=(11,),
        no_timestamps_token_id=100,
        max_initial_timestamp_index=10,
        return_timestamps=True,
        eos_token_id=2,
        vocab_size=128,
    )
    rng = np.random.default_rng(0)
    B, L = 5, 20
    logits = jnp.asarray(rng.standard_normal((B, 128), dtype=np.float32))
    tokens = jnp.asarray(
        np.where(rng.random((B, L)) < 0.3, rng.integers(101, 128, (B, L)),
                 rng.integers(4, 100, (B, L))).astype(np.int32)
    )
    begin = 6
    cur_lens = np.asarray([6, 7, 9, 12, 19], np.int32)
    vec = apply_logits_processors(cfg, logits, tokens, jnp.asarray(cur_lens), begin)
    for i, cl in enumerate(cur_lens):
        ref = apply_logits_processors(
            cfg, logits[i : i + 1], tokens[i : i + 1], int(cl), begin
        )
        np.testing.assert_array_equal(np.asarray(vec[i]), np.asarray(ref[0]))


@pytest.mark.parametrize("stacked", [False, True])
def test_vector_cache_index_matches_scalar(models, stacked):
    """decoder_forward with a per-row index vector (all rows equal) must be
    bit-identical to the scalar-index path — same writes, masks, positions."""
    (tcfg, tparams), _ = models
    params = stack_whisper_params(jax.tree.map(jnp.asarray, tparams)) if stacked \
        else jax.tree.map(jnp.asarray, tparams)
    rng = np.random.default_rng(1)
    B, T_chunk, max_len = 3, 4, 16
    enc = jnp.asarray(rng.standard_normal((B, 24, 32), dtype=np.float32))
    ckv = precompute_cross_kv(params, enc, tcfg)
    ids = jnp.asarray(rng.integers(4, 100, (B, T_chunk)).astype(np.int32))

    cache_s = init_cache(tcfg, B, max_len, stacked=stacked)
    cache_s = dict(cache_s, index=jnp.asarray(5, jnp.int32))
    logits_s, new_s = decoder_forward(params, ids, ckv, tcfg, cache=cache_s)

    cache_v = init_cache(tcfg, B, max_len, stacked=stacked)
    cache_v = dict(cache_v, index=jnp.full((B,), 5, jnp.int32))
    logits_v, new_v = decoder_forward(params, ids, ckv, tcfg, cache=cache_v)

    np.testing.assert_array_equal(np.asarray(logits_s), np.asarray(logits_v))
    for a, b in zip(jax.tree.leaves(new_s["layers"]), jax.tree.leaves(new_v["layers"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vector_cache_index_per_row_rows_independent(models):
    """Rows at DIFFERENT positions behave like independently-run b=1 rows."""
    (tcfg, tparams), _ = models
    params = stack_whisper_params(jax.tree.map(jnp.asarray, tparams))
    rng = np.random.default_rng(2)
    B, max_len = 3, 16
    enc = jnp.asarray(rng.standard_normal((B, 24, 32), dtype=np.float32))
    ckv = precompute_cross_kv(params, enc, tcfg)
    ids = jnp.asarray(rng.integers(4, 100, (B, 2)).astype(np.int32))
    offsets = np.asarray([1, 4, 9], np.int32)

    # warm each cache with a common prefix write so history isn't empty
    warm = jnp.asarray(rng.integers(4, 100, (B, 1)).astype(np.int32))
    cache = init_cache(tcfg, B, max_len, stacked=True)
    cache = dict(cache, index=jnp.zeros((B,), jnp.int32))
    _, cache = decoder_forward(params, warm, ckv, tcfg, cache=cache)

    cache_v = dict(cache, index=jnp.asarray(offsets))
    logits_v, _ = decoder_forward(params, ids, ckv, tcfg, cache=cache_v)

    for i in range(B):
        ckv_i = jax.tree.map(lambda x: x[:, i : i + 1], ckv)
        c_i = init_cache(tcfg, 1, max_len, stacked=True)
        c_i = dict(c_i, index=jnp.zeros((1,), jnp.int32))
        _, c_i = decoder_forward(params, warm[i : i + 1], ckv_i, tcfg, cache=c_i)
        c_i = dict(c_i, index=jnp.full((1,), offsets[i], jnp.int32))
        logits_i, _ = decoder_forward(params, ids[i : i + 1], ckv_i, tcfg, cache=c_i)
        np.testing.assert_allclose(
            np.asarray(logits_v[i]), np.asarray(logits_i[0]), rtol=0, atol=1e-5
        )


# ------------------------------------------------------------ loop parity


@pytest.mark.parametrize("k", [1, 3, 8])
@pytest.mark.parametrize("batch", [1, 3])
def test_spec_matches_greedy(models, k, batch):
    """Speculative output == plain greedy, any draft quality / k / batch."""
    plain, spec = _pair(models, speculative_k=k)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((batch, 8, 48), dtype=np.float32)
    prompt = np.tile(np.asarray([[9, 5, 3, 4]], np.int64), (batch, 1))
    opts = _opts(num_beams=1, max_target_positions=24)

    def run(g):
        cross_kv = g._cross_kv_fn(g._encode(jnp.asarray(mel)))
        return g._decode_prompted(
            cross_kv, prompt, None, opts, return_timestamps=False,
            draft_cross_kv=g._draft_cross_kv(mel, opts),
        )

    seq_p, score_p, _ = run(plain)
    seq_s, score_s, _ = run(spec)
    np.testing.assert_array_equal(seq_p, seq_s)
    np.testing.assert_allclose(score_p, score_s, atol=1e-4)
    stats = spec.speculative_stats()
    assert stats is not None and stats["windows"] >= 1


def test_spec_with_timestamps_matches_greedy(models):
    """The timestamp processor stack (history-dependent masks) survives the
    chunked verify — per-position processed logits must match."""
    plain, spec = _pair(models, speculative_k=4)
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((2, 8, 48), dtype=np.float32)
    prompt = np.asarray([[3], [3]], np.int64)
    opts = _opts(num_beams=1, max_target_positions=30, return_timestamps=True,
                 max_initial_timestamp_index=10)

    def run(g):
        cross_kv = g._cross_kv_fn(g._encode(jnp.asarray(mel)))
        return g._decode_prompted(
            cross_kv, prompt, None, opts, return_timestamps=True,
            draft_cross_kv=g._draft_cross_kv(mel, opts),
        )[0]

    np.testing.assert_array_equal(run(plain), run(spec))


def test_spec_full_acceptance_with_self_draft(models):
    """Draft == target (same weights): every window accepts all k drafts."""
    (tcfg, tparams), _ = models
    k = 5
    plain, spec = _pair(models, speculative_k=k, draft_params=(tcfg, tparams))
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)
    prompt = np.asarray([[3, 4]], np.int64)
    opts = _opts(num_beams=1, max_target_positions=38)

    def run(g):
        cross_kv = g._cross_kv_fn(g._encode(jnp.asarray(mel)))
        return g._decode_prompted(
            cross_kv, prompt, None, opts, return_timestamps=False,
            draft_cross_kv=g._draft_cross_kv(mel, opts),
        )[0]

    np.testing.assert_array_equal(run(plain), run(spec))
    stats = spec.speculative_stats()
    # full acceptance ⇒ k+1 tokens per window (boundary windows can be short)
    assert stats["tokens_per_window"] > k * 0.75, stats


def test_spec_eos_and_suppress_matches_greedy(models):
    """Suppress lists + an eos-prone target: boundary behavior must match
    (eos inside an accepted window truncates exactly like sequential)."""
    (tcfg, tparams), dmodel = models
    # bias the tied embedding's eos row so eos fires mid-sequence
    tparams_eos = jax.tree.map(np.copy, tparams)
    tparams_eos["decoder"]["embed_tokens"]["weight"][2] *= 3.0
    models_eos = ((tcfg, tparams_eos), dmodel)
    plain, spec = _pair(models_eos, speculative_k=4)
    rng = np.random.default_rng(6)
    opts = _opts(num_beams=1, max_target_positions=32,
                 suppress_tokens=(50, 51), begin_suppress_tokens=(60,))
    for trial in range(4):
        mel = rng.standard_normal((2, 8, 48), dtype=np.float32)
        prompt = np.asarray([[3, 4], [3, 7]], np.int64)

        def run(g):
            cross_kv = g._cross_kv_fn(g._encode(jnp.asarray(mel)))
            return g._decode_prompted(
                cross_kv, prompt, None, opts, return_timestamps=False,
                draft_cross_kv=g._draft_cross_kv(mel, opts),
            )[0]

        np.testing.assert_array_equal(run(plain), run(spec))


# ------------------------------------------------------------- end to end


def test_spec_longform_matches_plain(models):
    """Longform seek loop (condition_on_prev, timestamps) with a draft model
    produces the identical transcript."""
    rng = np.random.default_rng(8)
    mel = rng.standard_normal((2, 8, 130), dtype=np.float32)
    opts = _opts(
        num_beams=1, max_target_positions=40, return_timestamps=True,
        condition_on_prev_tokens=True, prev_sot_token_id=101,
        max_initial_timestamp_index=10,
    )
    plain, spec = _pair(models, speculative_k=4)
    out_p = plain.generate(mel, opts)
    out_s = spec.generate(mel, opts)
    np.testing.assert_array_equal(out_p, out_s)
    assert spec.speculative_stats()["windows"] >= 2


def test_spec_fallback_ladder_matches_plain(models):
    """Thresholds trip the ladder: greedy rung uses the speculative path,
    sampled rungs the normal sampling path — end result identical."""
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((1, 8, 130), dtype=np.float32)
    opts = _opts(
        num_beams=1, max_target_positions=40, return_timestamps=True,
        condition_on_prev_tokens=True, prev_sot_token_id=101,
        max_initial_timestamp_index=10,
        temperature=(0.0, 0.5, 1.0),
        logprob_threshold=0.0,  # always trips: forces the full ladder
    )
    plain, spec = _pair(models, speculative_k=3)
    np.testing.assert_array_equal(plain.generate(mel, opts), spec.generate(mel, opts))


def test_spec_beam_ignores_draft(models):
    """num_beams>1 must not engage the draft (beam path untouched)."""
    rng = np.random.default_rng(10)
    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)
    prompt = np.asarray([[3, 4]], np.int64)
    opts = _opts(num_beams=3, max_target_positions=24)
    plain, spec = _pair(models, speculative_k=4)

    def run(g):
        cross_kv = g._cross_kv_fn(g._encode(jnp.asarray(mel)))
        return g._decode_prompted(
            cross_kv, prompt, None, opts, return_timestamps=False,
            draft_cross_kv=g._draft_cross_kv(mel, opts),
        )[0]

    np.testing.assert_array_equal(run(plain), run(spec))
    assert spec.speculative_stats() is None  # spec path never ran


def test_spec_acceptance_bailout(models, monkeypatch):
    """Below-break-even acceptance (random draft ≈1 token/window < the
    measured 3.2 break-even, docs/PERF.md) must auto-disable the draft;
    output stays identical (fallback IS plain greedy), the draft encoder
    stops launching, and swap_params re-arms the measurement."""
    monkeypatch.setenv("ECW_SPEC_MIN_TPW", "3.2")
    monkeypatch.setattr(WhisperGenerator, "_SPEC_BAILOUT_WINDOWS", 4)
    monkeypatch.setattr(WhisperGenerator, "_SPEC_BAILOUT_EVERY", 1)
    plain, spec = _pair(models, speculative_k=4)
    rng = np.random.default_rng(12)
    mel = rng.standard_normal((2, 8, 130), dtype=np.float32)
    opts = _opts(
        num_beams=1, max_target_positions=40, return_timestamps=True,
        condition_on_prev_tokens=True, prev_sot_token_id=101,
        max_initial_timestamp_index=10,
    )
    out_s = spec.generate(mel, opts)
    assert spec._spec_bailed
    np.testing.assert_array_equal(plain.generate(mel, opts), out_s)
    assert spec._draft_cross_kv(mel, opts) is None  # draft never launches now

    # new weights → fresh measurement window
    (tcfg, tparams), _ = models
    spec.swap_params(tparams)
    assert not spec._spec_bailed and spec.speculative_stats() is None

    # a draft at full acceptance (the target itself) must NOT bail
    _, spec_self = _pair(models, speculative_k=4, draft_params=(tcfg, tparams))
    spec_self.generate(mel, opts)
    assert not spec_self._spec_bailed


def test_draft_vocab_mismatch_rejected(models):
    (tcfg, tparams), _ = models
    bad_cfg, bad_params = _make_model(11, d_model=16, layers=1, heads=2)
    bad_cfg = WhisperConfig(**{**bad_cfg.__dict__, "vocab_size": 64})
    with pytest.raises(ValueError, match="vocabulary"):
        WhisperGenerator(tcfg, tparams, draft=(bad_cfg, bad_params))
