"""Whisper logits processors, as pure functions inside the jitted decode step.

Functional equivalents of the HF processors the reference's generate path
relies on (src/model/pba_whisper.py:309-316 retrieves SuppressTokens,
BeginSuppressTokens and the timestamp rules):

* suppress_tokens: always-banned tokens;
* begin_suppress_tokens: banned at the first generated position;
* timestamp rules (``WhisperTimeStampLogitsProcessor``):
  - timestamps must appear in (non-strictly handled) pairs: after a
    timestamp that follows a non-timestamp, only non-timestamps or the same
    behavior per openai's decoding rules;
  - timestamps are non-decreasing;
  - if the total probability mass on timestamps exceeds the mass of any
    single text token, sample a timestamp;
  - the first generated token is restricted to timestamps, and to
    ``<= max_initial_timestamp_index``.

Everything is branch-free masking on a [batch, vocab] logits array so the
whole processor stack stays inside one compiled step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float(np.finfo(np.float32).min)


@dataclasses.dataclass(frozen=True)
class LogitsProcessorConfig:
    """Static processor configuration.  The begin index (first generated
    position) is passed per call as a TRACED value so prompts of any length
    share one compiled program (longform prompts grow every segment)."""

    suppress_tokens: Tuple[int, ...] = ()
    begin_suppress_tokens: Tuple[int, ...] = ()
    no_timestamps_token_id: Optional[int] = None  # timestamps start at +1
    max_initial_timestamp_index: Optional[int] = 50
    return_timestamps: bool = False
    eos_token_id: int = 50257
    vocab_size: int = 51865

    @property
    def timestamp_begin(self) -> Optional[int]:
        if self.no_timestamps_token_id is None:
            return None
        return self.no_timestamps_token_id + 1


def _suppress(logits: jax.Array, token_ids: Sequence[int], vocab: int) -> jax.Array:
    if len(token_ids) == 0:
        return logits
    mask = np.zeros((vocab,), dtype=bool)
    mask[np.asarray(token_ids, dtype=np.int64)] = True
    return jnp.where(jnp.asarray(mask)[None, :], NEG_INF, logits)


def apply_logits_processors(
    cfg: LogitsProcessorConfig,
    logits: jax.Array,  # [B, vocab] raw logits for the next position
    tokens: jax.Array,  # [B, L] all tokens so far (prompt + generated, padded ahead)
    cur_len: jax.Array,  # scalar OR [B]: number of valid tokens in ``tokens``
    begin_index: jax.Array,  # scalar: index of the first generated position
) -> jax.Array:
    """Apply the processor stack; returns processed logits.

    ``cur_len`` may be a per-row [B] vector (rows sitting at different
    positions in one launch) — all masks then broadcast per row; a scalar
    keeps the original single-position semantics bit-for-bit."""
    vocab = cfg.vocab_size
    logits = logits.astype(jnp.float32)
    cur_len = jnp.asarray(cur_len)

    logits = _suppress(logits, cfg.suppress_tokens, vocab)

    if len(cfg.begin_suppress_tokens) > 0:
        at_begin = cur_len == begin_index
        if at_begin.ndim == 1:
            at_begin = at_begin[:, None]
        mask = np.zeros((vocab,), dtype=bool)
        mask[np.asarray(cfg.begin_suppress_tokens, dtype=np.int64)] = True
        logits = jnp.where(
            jnp.logical_and(at_begin, jnp.asarray(mask)[None, :]), NEG_INF, logits
        )

    if cfg.return_timestamps and cfg.no_timestamps_token_id is not None:
        logits = _timestamp_rules(cfg, logits, tokens, cur_len, begin_index)
    return logits


def _timestamp_rules(
    cfg: LogitsProcessorConfig, logits: jax.Array, tokens: jax.Array, cur_len: jax.Array,
    begin_index: jax.Array,
) -> jax.Array:
    ts_begin = cfg.timestamp_begin
    vocab = cfg.vocab_size
    b, L = tokens.shape
    vocab_ids = jnp.arange(vocab)[None, :]
    is_ts_col = vocab_ids >= ts_begin

    # never emit <|notimestamps|>
    logits = jnp.where(vocab_ids == cfg.no_timestamps_token_id, NEG_INF, logits)

    # ``cur_len`` scalar or per-row [B]; ``cl_col`` broadcasts against the
    # [*, L] position grid either way
    cur_len = jnp.asarray(cur_len)
    cl_col = cur_len[:, None] if cur_len.ndim == 1 else cur_len

    # how many tokens were generated after begin_index ([B] or scalar)
    n_generated = cur_len - begin_index

    pos = jnp.arange(L)[None, :]
    last_tok = jnp.where(pos == cl_col - 1, tokens, 0).sum(axis=1)
    penult_tok = jnp.where(pos == cl_col - 2, tokens, 0).sum(axis=1)
    last_was_ts = jnp.logical_and(n_generated >= 1, last_tok >= ts_begin)
    # HF: fewer than two generated tokens counts as "penultimate was timestamp"
    penult_was_ts = jnp.logical_or(n_generated < 2, penult_tok >= ts_begin)

    # pairing rule (HF WhisperTimeStampLogitsProcessor.__call__):
    #   last ts + penultimate ts  -> must be non-timestamp next
    #   last ts + penultimate txt -> bans ids BELOW eos (HF's index trick for
    #                                "no normal text"; eos/specials stay legal)
    after_pair = jnp.logical_and(last_was_ts, penult_was_ts)
    after_single_ts = jnp.logical_and(last_was_ts, jnp.logical_not(penult_was_ts))
    ban_ts = after_pair[:, None] & is_ts_col
    ban_text = after_single_ts[:, None] & (vocab_ids < cfg.eos_token_id)
    logits = jnp.where(ban_ts | ban_text, NEG_INF, logits)

    # timestamps are non-decreasing relative to the LAST generated timestamp:
    # ban [ts_begin, last_ts) after a single ts, [ts_begin, last_ts + 1) else
    gen_mask = jnp.logical_and(pos >= begin_index, pos < cl_col)
    is_gen_ts = jnp.logical_and(gen_mask, tokens >= ts_begin)
    last_ts_pos = jnp.where(is_gen_ts, pos, -1).max(axis=1)  # -1 if none
    has_ts = last_ts_pos >= 0
    last_ts_val = jnp.take_along_axis(
        tokens, jnp.maximum(last_ts_pos, 0)[:, None], axis=1
    )[:, 0]
    threshold = jnp.where(after_single_ts, last_ts_val, last_ts_val + 1)
    ban_lower = has_ts[:, None] & is_ts_col & (vocab_ids < threshold[:, None])
    logits = jnp.where(ban_lower, NEG_INF, logits)

    # first generated token: force a timestamp, capped at max_initial_timestamp
    at_begin = cur_len == begin_index
    if at_begin.ndim == 1:
        at_begin = at_begin[:, None]
    ban_first_text = jnp.logical_not(is_ts_col)
    if cfg.max_initial_timestamp_index is not None:
        last_allowed = ts_begin + cfg.max_initial_timestamp_index
        ban_first_text = jnp.logical_or(ban_first_text, vocab_ids > last_allowed)
    logits = jnp.where(jnp.logical_and(at_begin, ban_first_text), NEG_INF, logits)

    # if total timestamp probability >= max text probability, force a timestamp
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts_col, logprobs, NEG_INF), axis=-1
    )
    max_text_logprob = jnp.max(jnp.where(is_ts_col, NEG_INF, logprobs), axis=-1)
    force_ts = ts_logprob > max_text_logprob
    logits = jnp.where(force_ts[:, None] & jnp.logical_not(is_ts_col), NEG_INF, logits)
    return logits
