"""Speculative greedy decoding: draft-model-assisted, output-identical.

The Whisper decode loop is HBM-bound on the per-step weight read
(BASELINE.md: ~5.4 ms/step at whisper-medium b1); each emitted token pays
one full read of the decoder weights.  Speculative decoding amortizes that
read: a small draft model proposes ``k`` tokens autoregressively (tiny
weight reads), then the target model scores all ``k+1`` positions in ONE
chunked forward (one big weight read).  Accepted tokens are exactly the
target's own greedy choices — the emitted sequence is identical to plain
greedy decoding (same processed-logits argmax at every position), the draft
only decides how many positions each big read covers.

The reference has no equivalent (its decode is HF ``generate`` one token at
a time, src/model/pba_whisper.py:365-465); this is a serving-mode addition.
TPU shape discipline: the whole accept/commit loop is one
``lax.while_loop`` with static shapes — per-row positions (rows accept
different counts) ride a [B] index vector through the KV cache
(models/whisper.py: per-row scatter writes + per-row causal masks).

Cache convention (mirrors generate.py:_prefill): a row whose committed
length is ``pos`` keeps its cache index at ``pos - 1``; the next window
re-feeds the token at ``pos - 1`` (overwriting slot ``pos - 1`` with
identical K/V for the target, and with the draft's first look at the
correction token for the draft) and produces logits for position ``pos``.
The draft loop runs ``k + 1`` steps (the last output is discarded) so the
draft cache holds K/V through slot ``pos + k - 1`` — whatever prefix gets
accepted, both caches stay valid without any rollback.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .logits_process import LogitsProcessorConfig, apply_logits_processors

# chunk_fn(tokens [B, t], cache, ctx) -> (logits [B, t, vocab], new_cache)
ChunkFn = Callable[[jax.Array, Any, Any], Tuple[jax.Array, Any]]


@partial(
    jax.jit,
    static_argnames=(
        "target_fn", "draft_fn", "k", "max_length", "processors",
        "pad_token_id", "eos_token_id", "force_accept",
    ),
)
def speculative_greedy_search(
    target_fn: ChunkFn,
    draft_fn: ChunkFn,
    prompt: jax.Array,  # [B, bucket] right-padded with pad id
    prompt_len,  # TRACED scalar: true prompt length
    target_cache: Any,  # prefilled with the prompt, index at prompt_len - 1
    draft_cache: Any,  # same, for the draft model
    target_ctx: Any,
    draft_ctx: Any,
    processors: LogitsProcessorConfig,
    k: int = 8,
    max_length: int = 448,
    pad_token_id: int = 50257,
    eos_token_id: int = 50257,
    force_accept: bool = False,
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Returns (sequences [B, max_length], sum logprobs [B], stats).

    Token-identical to :func:`..beam.greedy_search` (do_sample=False): every
    emitted token is the argmax of the target's PROCESSED logits given the
    committed history, and the summed logprob uses the same processed
    log-softmax — only the schedule of device work differs.

    ``force_accept=True`` is a TIMING-ONLY knob for benchmarks: it pretends
    every draft token matched, measuring the mechanical upper bound of the
    pipeline at 100% acceptance (random-weight draft/target pairs otherwise
    agree on almost nothing, which is the 0% lower bound).  Its output is
    NOT a real greedy decode.

    ``stats``: {"windows": total verify launches, "emitted": [B] tokens}.
    """
    batch, bucket = prompt.shape
    prompt_len = jnp.asarray(prompt_len, jnp.int32)
    rows = jnp.arange(batch)
    win_idx = jnp.arange(k + 1)[None, :]

    tokens = jnp.full((batch, max_length), pad_token_id, dtype=jnp.int32)
    tokens = tokens.at[:, :bucket].set(prompt)
    pos = jnp.zeros((batch,), jnp.int32) + prompt_len

    # per-row index vectors keep the carry structure fixed across windows
    target_cache = dict(target_cache, index=pos - 1)
    draft_cache = dict(draft_cache, index=pos - 1)

    init = (
        tokens,
        pos,
        target_cache,
        draft_cache,
        jnp.zeros((batch,), jnp.float32),  # sum logprobs (processed)
        jnp.zeros((batch,), jnp.int32),  # generated count (incl. eos)
        pos >= max_length,  # finished
        jnp.zeros((), jnp.int32),  # verify-window counter
    )

    def not_done(state):
        return jnp.logical_not(state[6].all())

    def window(state):
        tokens, pos, tcache, dcache, sum_lp, n_gen, finished, wins = state

        # ---- draft phase: k proposals (+1 cache-fill step, output unused)
        first = jnp.take_along_axis(
            tokens, jnp.maximum(pos - 1, 0)[:, None], axis=1
        )[:, 0]

        def draft_step(carry, i):
            last_tok, dc, tok_spec = carry
            logits, dc = draft_fn(last_tok[:, None], dc, draft_ctx)
            processed = apply_logits_processors(
                processors, logits[:, 0], tok_spec, pos + i, prompt_len
            )
            nxt = jnp.argmax(processed, axis=-1).astype(jnp.int32)
            # drafts enter the history scratch so later positions' timestamp
            # rules see them; rows at the boundary drop the write
            tok_spec = tok_spec.at[rows, pos + i].set(nxt, mode="drop")
            return (nxt, dc, tok_spec), nxt

        dcache = dict(dcache, index=pos - 1)
        (_, dcache, tok_spec), drafts_seq = jax.lax.scan(
            draft_step, (first, dcache, tokens), jnp.arange(k + 1)
        )
        drafts = jnp.transpose(drafts_seq[:k])  # [B, k]

        # ---- verify phase: ONE target forward over [last, d_0..d_{k-1}]
        chunk = jnp.concatenate([first[:, None], drafts], axis=1)  # [B, k+1]
        tcache = dict(tcache, index=pos - 1)
        logits_t, tcache = target_fn(chunk, tcache, target_ctx)  # [B, k+1, V]
        cls = pos[None, :] + jnp.arange(k + 1)[:, None]  # [k+1, B]
        processed = jax.vmap(
            lambda lg, cl: apply_logits_processors(
                processors, lg, tok_spec, cl, prompt_len
            ),
            in_axes=(1, 0),
            out_axes=1,
        )(logits_t.astype(jnp.float32), cls)
        greedy_t = jnp.argmax(processed, axis=-1).astype(jnp.int32)  # [B, k+1]
        logprobs = jax.nn.log_softmax(processed, axis=-1)
        tok_lp = jnp.take_along_axis(logprobs, greedy_t[..., None], axis=-1)[
            ..., 0
        ]  # [B, k+1]

        # ---- acceptance: longest drafted prefix matching the target argmax
        if force_accept:
            match = jnp.ones((batch, k), dtype=bool)
        else:
            match = drafts == greedy_t[:, :k]
        n_acc = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)
        m = n_acc + 1  # emitted tokens incl. the correction/bonus
        # stop after the first eos among the emitted window
        is_eos = (greedy_t == eos_token_id) & (win_idx < m[:, None])
        first_eos = jnp.where(is_eos.any(axis=1), jnp.argmax(is_eos, axis=1), k + 1)
        m = jnp.minimum(m, first_eos + 1)
        m = jnp.minimum(m, jnp.maximum(max_length - pos, 0))
        m = jnp.where(finished, 0, m)
        emit = win_idx < m[:, None]  # [B, k+1]

        # ---- commit: masked scatter (OOB slot = dropped write)
        slots = jnp.where(emit, pos[:, None] + win_idx, max_length)
        tokens = tokens.at[rows[:, None], slots].set(greedy_t, mode="drop")
        sum_lp = sum_lp + jnp.where(emit, tok_lp, 0.0).sum(axis=1)
        n_gen = n_gen + m
        pos = pos + m
        eos_emitted = ((greedy_t == eos_token_id) & emit).any(axis=1)
        finished = finished | eos_emitted | (pos >= max_length)
        return (tokens, pos, tcache, dcache, sum_lp, n_gen, finished, wins + 1)

    (tokens, _, _, _, sum_lp, n_gen, _, wins) = jax.lax.while_loop(
        not_done, window, init
    )
    return tokens, sum_lp, {"windows": wins, "emitted": n_gen}
