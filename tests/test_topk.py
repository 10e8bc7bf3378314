"""Sort-free exact top-k (decoding/topk.py) vs ``jax.lax.top_k``.

The beam loop's per-beam top-2K over the vocab lowered to a full XLA sort
(59% of beam-decode device time); `exact_top_k` replaces it with k
max+mask passes.  It must be BIT-identical to ``lax.top_k`` — values in
descending order, ties broken by lower index, indices distinct even for
rows of equal values (including ``-inf``, which beam search produces when
NEG_INF-masked logprobs add to NEG_INF dead-beam scores and overflow f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.decoding.logits_process import NEG_INF
from enhance_cb_whisper_tpu.decoding.topk import exact_top_k


def _check(x, k):
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), k)
    v_got, i_got = exact_top_k(jnp.asarray(x), k)
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))


@pytest.mark.parametrize("k", [1, 3, 10])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_matches_lax(seed, k):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((7, 211)).astype(np.float32)
    _check(x, k)


@pytest.mark.parametrize("k", [2, 10])
def test_heavy_ties(k):
    """Quantized values force many exact ties; order must match lax.top_k
    (descending value, ascending index within a tie)."""
    rng = np.random.default_rng(3)
    x = (rng.integers(-3, 4, size=(5, 97)) * 0.5).astype(np.float32)
    _check(x, k)


def test_neg_inf_and_masked_rows():
    """Rows dominated by NEG_INF masks and true -inf (dead-beam overflow)
    must still yield k DISTINCT indices in lax.top_k's order."""
    x = np.full((4, 40), NEG_INF, np.float32)
    x[0, 7] = 1.0  # one live token
    x[1] = -np.inf  # fully dead beam
    x[2, ::3] = -np.inf  # mix of -inf and NEG_INF
    x[3, 5] = 0.5
    x[3, 6] = 0.5  # tie among live tokens
    _check(x, 6)
    for k in (1, 6):
        _, idx = exact_top_k(jnp.asarray(x), k)
        idx = np.asarray(idx)
        for r in range(x.shape[0]):
            assert len(set(idx[r].tolist())) == k, f"row {r} repeated indices"


def test_all_equal_rows():
    _check(np.zeros((3, 33), np.float32), 5)
    _check(np.full((2, 33), -np.inf, np.float32), 5)


def test_large_k_falls_back():
    x = np.random.default_rng(0).standard_normal((2, 64)).astype(np.float32)
    _check(x, 40)  # > _MAX_UNROLLED_K → lax.top_k path
    _check(np.zeros((2, 5), np.float32), 5)  # k == V


def test_vocab_scale_row():
    """Whisper-vocab-sized row (the real operand shape per beam)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((10, 51865)).astype(np.float32)
    x[:, ::5] = NEG_INF  # processor-style masking
    _check(x, 10)


def test_resolve_topk_impl_dims_conditional(monkeypatch):
    """Default "auto" picks iterative below d_model=1024 (tiny/base/small,
    where the vocab sort dominated) and the lax.top_k sort at medium+
    (where the round-3 sweep measured iterative slightly negative:
    15.67x vs 16.1x).  Explicit env values force either path."""
    from enhance_cb_whisper_tpu.decoding.generate import _resolve_topk_impl

    monkeypatch.delenv("ECW_BEAM_TOPK", raising=False)
    assert _resolve_topk_impl(384) == "iterative"  # whisper-tiny
    assert _resolve_topk_impl(768) == "iterative"  # whisper-small
    assert _resolve_topk_impl(1024) == "sort"      # whisper-medium
    assert _resolve_topk_impl(1280) == "sort"      # whisper-large
    monkeypatch.setenv("ECW_BEAM_TOPK", "iterative")
    assert _resolve_topk_impl(1280) == "iterative"
    monkeypatch.setenv("ECW_BEAM_TOPK", "sort")
    assert _resolve_topk_impl(384) == "sort"


# ----------------------------------------------------------------- e2e A/B

transformers = pytest.importorskip("transformers")

from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator  # noqa: E402
from enhance_cb_whisper_tpu.models.whisper import WhisperConfig  # noqa: E402
from enhance_cb_whisper_tpu.models.whisper_loader import load_hf_whisper  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    hf_config = transformers.WhisperConfig(
        vocab_size=64, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=3, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=48,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(1)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    return WhisperGenerator(config, params, prompt_buckets=(8, 16))


def _run(gen, mel, prompt, opts, monkeypatch, impl, **decode_kw):
    monkeypatch.setenv("ECW_BEAM_TOPK", impl)
    enc = gen._encode(mel)
    cross_kv = gen._cross_kv_fn(enc)
    seqs, scores, _ = gen._decode_prompted(
        cross_kv, prompt, None, opts, return_timestamps=False, **decode_kw
    )
    return np.asarray(seqs), np.asarray(scores)


@pytest.mark.parametrize("num_beams", [2, 5])
def test_beam_iterative_matches_sort(tiny, monkeypatch, num_beams):
    rng = np.random.default_rng(11 + num_beams)
    mel = rng.standard_normal((2, 8, 48), dtype=np.float32)
    prompt = np.full((2, 1), 3, dtype=np.int64)
    opts = GenerationOptions(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=50, prev_sot_token_id=None, eos_token_id=2,
        pad_token_id=0, suppress_tokens=(), begin_suppress_tokens=(),
        max_target_positions=30, num_beams=num_beams,
    )
    seqs_i, scores_i = _run(tiny, mel, prompt, opts, monkeypatch, "iterative")
    seqs_s, scores_s = _run(tiny, mel, prompt, opts, monkeypatch, "sort")
    np.testing.assert_array_equal(seqs_i, seqs_s)
    np.testing.assert_array_equal(scores_i, scores_s)


def test_beam_sample_iterative_matches_sort(tiny, monkeypatch):
    """The gumbel-top-k sampling path uses the same top-k operand."""
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)
    prompt = np.full((1, 1), 3, dtype=np.int64)
    opts = GenerationOptions(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=50, prev_sot_token_id=None, eos_token_id=2,
        pad_token_id=0, suppress_tokens=(), begin_suppress_tokens=(),
        max_target_positions=30, num_beams=3,
    )
    kw = dict(temperature=0.7, rng=jax.random.PRNGKey(123))
    seqs_i, scores_i = _run(tiny, mel, prompt, opts, monkeypatch, "iterative", **kw)
    seqs_s, scores_s = _run(tiny, mel, prompt, opts, monkeypatch, "sort", **kw)
    np.testing.assert_array_equal(seqs_i, seqs_s)
    np.testing.assert_array_equal(scores_i, scores_s)
