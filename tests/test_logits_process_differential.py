"""Differential fuzz of the logits-processor stack vs HF's processors.

The e2e decode parity suites pin processors only along the trajectories
greedy/beam search actually visits; this fuzz feeds RANDOM prefixes and
random logits straight through both implementations, covering every
branch of the timestamp rules (pairing, non-decreasing floor, first-token
restriction, max_initial cap, timestamp-probability forcing) plus the
suppress masks, at every prefix length.

Reference consumers: SuppressTokens / SuppressTokensAtBegin /
WhisperTimeStampLogitsProcessor retrieved at
/root/reference/src/model/pba_whisper.py:309-316.
"""

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.decoding.logits_process import (
    NEG_INF,
    LogitsProcessorConfig,
    apply_logits_processors,
)

transformers = pytest.importorskip("transformers")
from transformers.generation.logits_process import (  # noqa: E402
    SuppressTokensAtBeginLogitsProcessor,
    SuppressTokensLogitsProcessor,
    WhisperTimeStampLogitsProcessor,
)

V = 160
TB = 100  # <|notimestamps|> = 99, timestamps = 100..159
EOS = 2
MAX_INITIAL = 12


def _hf_stack(begin_index, suppress, begin_suppress):
    import types

    gc = types.SimpleNamespace(
        no_timestamps_token_id=TB - 1,
        max_initial_timestamp_index=MAX_INITIAL,
        eos_token_id=EOS,
        decoder_start_token_id=3,
        is_multilingual=False,
    )
    procs = []
    if suppress:
        procs.append(SuppressTokensLogitsProcessor(list(suppress), device="cpu"))
    if begin_suppress:
        procs.append(
            SuppressTokensAtBeginLogitsProcessor(
                list(begin_suppress), begin_index, device="cpu"
            )
        )
    procs.append(WhisperTimeStampLogitsProcessor(gc, begin_index=begin_index))
    return procs


def _hf_apply(procs, tokens, logits):
    scores = torch.tensor(logits, dtype=torch.float32)
    ids = torch.tensor(tokens, dtype=torch.long)
    for p in procs:
        scores = p(ids, scores)
    return scores.numpy()


def _our_apply(cfg, tokens, logits, cur_len, begin_index):
    import jax.numpy as jnp

    out = apply_logits_processors(
        cfg,
        jnp.asarray(logits, jnp.float32),
        jnp.asarray(tokens, jnp.int32),
        jnp.asarray(cur_len, jnp.int32),
        jnp.asarray(begin_index, jnp.int32),
    )
    return np.asarray(out)


def _prefix(rng, begin_index, n_gen):
    """decoder prefix: begin_index prompt tokens + n_gen generated ones,
    with timestamp-plausible structure mixed with adversarial randomness."""
    prompt = rng.integers(5, 50, begin_index).tolist()
    gen = []
    t = 0
    for _ in range(n_gen):
        r = rng.random()
        if r < 0.35:
            t = min(t + int(rng.integers(0, 4)), V - 1 - TB)
            gen.append(TB + t)
        elif r < 0.45:
            gen.append(TB + int(rng.integers(0, V - TB)))  # adversarial ts
        else:
            gen.append(int(rng.integers(5, 50)))
    return prompt + gen


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("suppress_on", [False, True])
def test_processor_stack_matches_hf_fuzz(seed, suppress_on):
    rng = np.random.default_rng(seed)
    suppress = (7, 11, 93) if suppress_on else ()
    begin_suppress = (EOS, 5) if suppress_on else ()
    for _ in range(60):
        begin_index = int(rng.integers(1, 6))
        n_gen = int(rng.integers(0, 12))
        tokens = _prefix(rng, begin_index, n_gen)
        cur_len = len(tokens)
        logits = rng.standard_normal((2, V)).astype(np.float32) * 3.0
        batch_tokens = [tokens, _prefix(rng, begin_index, n_gen)]

        cfg = LogitsProcessorConfig(
            suppress_tokens=suppress,
            begin_suppress_tokens=begin_suppress,
            no_timestamps_token_id=TB - 1,
            max_initial_timestamp_index=MAX_INITIAL,
            return_timestamps=True,
            eos_token_id=EOS,
            vocab_size=V,
        )
        procs = _hf_stack(begin_index, suppress, begin_suppress)
        want = _hf_apply(procs, batch_tokens, logits)
        # ours reads a fixed-shape token buffer with cur_len marking validity
        buf = np.zeros((2, cur_len + 4), np.int32)
        for b, row in enumerate(batch_tokens):
            buf[b, :cur_len] = row
        got = _our_apply(cfg, buf, logits, cur_len, begin_index)

        # compare on the masked/unmasked pattern and the surviving values:
        # HF uses -inf, we use float32-min — both are "banned"
        want_banned = ~np.isfinite(want) | (want <= NEG_INF / 2)
        got_banned = got <= NEG_INF / 2
        np.testing.assert_array_equal(got_banned, want_banned, err_msg=str(
            (begin_index, tokens)))
        np.testing.assert_allclose(
            np.where(got_banned, 0.0, got), np.where(want_banned, 0.0, want),
            rtol=1e-5, atol=1e-5,
        )
