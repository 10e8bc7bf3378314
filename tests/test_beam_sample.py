"""Beam-sample (num_beams>1, do_sample=True) parity vs HF — the
temperature>0 rungs of Whisper's fallback ladder keep their beams
(reference src/model/pba_whisper.py:425-442 → HF generate_with_fallback →
`_beam_search(do_sample=True)`; VERDICT r1 missing #3).

Exact token parity with a stochastic sampler is only defined where the
distribution collapses, so: (a) at near-zero temperature beam-sample must
equal deterministic beam search on both sides, token-exact; (b) at a real
temperature the OUTPUT DISTRIBUTIONS over many seeds must match HF's
(total-variation check on a tiny model); (c) the logprob threshold now
applies to beam search via the normalized sequence score (HF
_need_fallback reads sequences_scores; VERDICT r1 weak #7).
"""

from collections import Counter

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
from enhance_cb_whisper_tpu.models.whisper import WhisperConfig
from enhance_cb_whisper_tpu.models.whisper_loader import load_hf_whisper

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny():
    hf_config = transformers.WhisperConfig(
        vocab_size=64, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))
    return hf, gen


def _opts(**kw):
    base = dict(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=50, prev_sot_token_id=None, eos_token_id=2,
        pad_token_id=0, suppress_tokens=(), begin_suppress_tokens=(),
        max_target_positions=40,
    )
    base.update(kw)
    return GenerationOptions(**base)


def _hf_beam_sample(hf, mel, prompt, num_beams, max_length, temperature, seed):
    gc = transformers.GenerationConfig(
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        max_length=max_length,
    )
    from transformers.generation import GenerationMixin

    torch.manual_seed(seed)
    with torch.no_grad():
        out = GenerationMixin.generate(
            hf, torch.from_numpy(mel), generation_config=gc,
            decoder_input_ids=torch.tensor(prompt),
            num_beams=num_beams, do_sample=True, temperature=temperature,
        )
    return out.numpy()


@pytest.mark.parametrize("prompt", [[[3, 4]], [[9, 5, 6, 7, 3, 4]]])
def test_beam_sample_near_zero_temperature_is_beam_search(tiny, prompt):
    """temperature→0 collapses beam-sample to beam search; both frameworks
    must emit the deterministic beam-search tokens.  τ=0.01, not smaller:
    below ~1e-3 HF's float32 softmax underflows to a one-hot and its
    without-replacement multinomial draws the remaining 2K-1 candidates
    from all-zero weights (arbitrary indices) — a degenerate regime, not a
    semantic difference."""
    hf, gen = tiny
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)
    gen_len = 10
    prompt_np = np.asarray(prompt, dtype=np.int64)
    total_len = prompt_np.shape[1] + gen_len
    opts = _opts(num_beams=5, max_target_positions=total_len)

    enc = gen._encode(mel)
    cross_kv = gen._cross_kv_fn(enc)
    det, _, _ = gen._decode_prompted(cross_kv, prompt_np, None, opts,
                                     return_timestamps=False)
    import jax

    sampled, _, _ = gen._decode_prompted(
        cross_kv, prompt_np, None, opts, return_timestamps=False,
        temperature=0.01, rng=jax.random.PRNGKey(7),
    )
    want = _hf_beam_sample(hf, mel, prompt, 5, total_len, 0.01, seed=11)

    want_t = want[0].tolist()
    assert sampled[0].tolist()[: len(want_t)] == want_t
    assert sampled[0].tolist() == det[0].tolist()


def test_gumbel_topk_matches_torch_multinomial():
    """The candidate-selection mechanism: Gumbel-top-k over accumulated
    scores must reproduce torch.multinomial(softmax(scores), k)'s
    without-replacement distribution — first-draw marginal (exact softmax)
    and the distribution over drawn SETS, on a fixed score vector."""
    import jax

    rng = np.random.default_rng(3)
    scores = rng.standard_normal(12).astype(np.float32) * 2.0
    k = 4
    n = 4000

    t_scores = torch.from_numpy(scores)
    probs = torch.softmax(t_scores, -1)
    torch.manual_seed(0)
    torch_first = Counter()
    torch_sets = Counter()
    for _ in range(n):
        idx = torch.multinomial(probs, k).tolist()
        torch_first[idx[0]] += 1
        torch_sets[frozenset(idx)] += 1

    jnp_scores = np.asarray(scores)
    ours_first = Counter()
    ours_sets = Counter()
    for s in range(n):
        g = jax.random.gumbel(jax.random.PRNGKey(s), (12,), dtype=np.float32)
        idx = np.argsort(-(jnp_scores + np.asarray(g)))[:k].tolist()
        ours_first[idx[0]] += 1
        ours_sets[frozenset(idx)] += 1

    exact = np.asarray(probs)
    for counts in (torch_first, ours_first):
        emp = np.asarray([counts[i] / n for i in range(12)])
        assert 0.5 * np.abs(emp - exact).sum() < 0.03

    keys = set(torch_sets) | set(ours_sets)
    tv_sets = 0.5 * sum(abs(torch_sets[kk] - ours_sets[kk]) for kk in keys) / n
    assert tv_sets < 0.06, tv_sets


def test_beam_sample_first_token_marginal_matches_hf(tiny):
    """Full-search distributional check: the marginal of the FIRST generated
    token of the returned hypothesis over many seeds must match HF's (the
    samplers share no RNG; full sequences are nearly unique per seed, so
    only low-dimensional marginals carry statistics)."""
    hf, gen = tiny
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)
    prompt = [[3, 4]]
    total_len = 2 + 3
    temperature = 1.0
    n_seeds = 200

    hf_a, hf_b = Counter(), Counter()
    for s in range(2 * n_seeds):
        out = _hf_beam_sample(hf, mel, prompt, 4, total_len, temperature, seed=s)
        (hf_a if s < n_seeds else hf_b)[int(out[0, 2])] += 1

    import jax

    opts = _opts(num_beams=4, max_target_positions=total_len)
    enc = gen._encode(mel)
    cross_kv = gen._cross_kv_fn(enc)
    our_counts = Counter()
    prompt_np = np.asarray(prompt, dtype=np.int64)
    for s in range(n_seeds):
        seqs, _, _ = gen._decode_prompted(
            cross_kv, prompt_np, None, opts, return_timestamps=False,
            temperature=temperature, rng=jax.random.PRNGKey(s),
        )
        our_counts[int(seqs[0, 2])] += 1

    def tv(a, b):
        keys = set(a) | set(b)
        return 0.5 * sum(abs(a[k] - b[k]) for k in keys) / n_seeds

    # calibrate the noise floor with HF's own two independent halves: at
    # this support/sample-size, two draws of the SAME distribution land
    # around TV~0.25; ours must sit in the same band, not far above it
    self_tv = tv(hf_a, hf_b)
    ours_tv = min(tv(our_counts, hf_a), tv(our_counts, hf_b))
    assert ours_tv < self_tv + 0.1, (
        ours_tv, self_tv, our_counts.most_common(8), hf_a.most_common(8),
    )


def test_logprob_threshold_gates_beam_search(tiny, monkeypatch):
    """logprob_threshold must trigger the fallback ladder for num_beams>1
    using the normalized beam score (HF _need_fallback via
    sequences_scores), not only for greedy."""
    _, gen = tiny
    opts = _opts(num_beams=5, temperature=(0.0, 0.4), logprob_threshold=-0.5,
                 max_target_positions=20)

    calls = []

    def fake_decode(cross_kv, decoder_ids, attn, o, return_timestamps,
                    temperature=0.0, rng=None, draft_cross_kv=None):
        calls.append(temperature)
        seqs = np.zeros((1, 20), np.int64)
        seqs[0, :3] = [3, 7, 2]
        return seqs, np.asarray([-1.0]), np.asarray([0.0])  # score < threshold

    monkeypatch.setattr(gen, "_decode_prompted", fake_decode)
    gen._generate_with_fallback(None, np.asarray([[3]]), None, opts, [True], [0])
    assert calls == [0.0, 0.4], calls  # fell back despite num_beams=5
