"""Fixed-shape beam search and greedy decoding for Whisper, on-device.

Reimplements HF's ``beam_search``/``greedy_search`` semantics (the engine
under the reference's ``generate(..., num_beams=5)``,
src/model/cb_whisper.py:166-178) as a single jit-compiled
``lax.while_loop`` over static shapes:

* scores accumulate log-softmax values with processor masks applied after
  normalization (HF beam-search order);
* eos candidates with rank < num_beams retire into the finished set with
  score ``total / (generated_len + 1)**length_penalty`` — modern HF
  (the vectorized `_beam_search`, transformers >= 4.49) normalizes by the
  length WITHOUT the decoder prompt and WITH the retiring token
  (``_update_finished_beams``); eos is kept in the output sequence;
* a batch is done once all K finished slots are filled and the best
  running score normalized at the current generated length cannot beat the
  worst finished score (``_check_early_stop_heuristic``,
  ``early_stopping=False``);
* when the loop hits max_length, the top running beams retire through the
  same normalization and compete with earlier finished hypotheses.

The KV cache rides in the loop state with leading dim ``batch*beams`` and is
gathered per step with the beam permutation — no host round-trips anywhere
in the decode loop.
"""

from __future__ import annotations


from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper import flush_staging
from .logits_process import NEG_INF, LogitsProcessorConfig, apply_logits_processors
from .topk import exact_top_k

# decode_fn(tokens_chunk [N, 1], cache, ctx) -> (logits [N, vocab], new_cache)
# ``ctx`` carries per-segment operands (cross-attention K/V, masks) through
# jit as data, so new segments never retrigger compilation.
DecodeFn = Callable[[jax.Array, Any, Any], Tuple[jax.Array, Any]]


def _gather_beams(tree: Any, beam_idx: jax.Array, batch: int, beams: int) -> Any:
    """Gather the KV cache's flattened batch*beam dim; beam_idx [B, K].

    Cache K/V leaves are [B·K, T, H, Dh] in the unrolled-layer layout and
    [L, B·K, T, H, Dh] in the stacked (scan-over-layers) layout — either
    way the batch·beam axis sits at ``ndim - 4``.  Scalars (the cache
    ``index``) pass through."""

    def gather(x):
        if not isinstance(x, jnp.ndarray) or x.ndim < 4:
            return x
        axis = x.ndim - 4
        lead = x.shape[:axis]
        shaped = x.reshape(*lead, batch, beams, *x.shape[axis + 1:])
        idx = beam_idx.reshape(
            *([1] * axis), batch, beams, *([1] * (x.ndim - axis - 1))
        )
        picked = jnp.take_along_axis(shaped, idx, axis=axis + 1)
        return picked.reshape(*lead, batch * beams, *x.shape[axis + 1:])

    return jax.tree.map(gather, tree)




def _run_decode_loop(not_done, step, init, cache_idx):
    """``while_loop(not_done, step, init)`` — or, for staged-write KV caches
    (models/whisper.py:init_cache staging_window), a while loop over
    W-step windows with ONE unconditional ``flush_staging`` per window.

    The flush must be unconditional for the while-carry to keep aliasing
    the K/V slabs in place (a ``lax.cond``-gated flush re-copies the slab
    every step — microbenched at 78-152 us/layer-step,
    tools/bench_kv_dus.py).  Steps past the stop condition inside the last
    window run as garbage compute: everything EXCEPT the cache — tokens,
    scores, finished sets, and ``cur_len`` itself — freezes via a
    scalar-pred select, so the loop's observable results are identical to
    the step-granular guard; the cache keeps advancing (its writes land at
    positions the frozen outputs never attend) to keep the staging window
    and flush base in lockstep.  At most W-1 wasted steps per segment
    (~2-4% of a flagship decode at W=16)."""
    cache = init[cache_idx]
    staged = isinstance(cache, dict) and "base" in cache
    if not staged:
        return jax.lax.while_loop(not_done, step, init)

    W = cache["layers"]["ks"].shape[2]

    def window(state):
        def inner(_, s):
            active = not_done(s)
            ns = step(s)
            return tuple(
                n if i == cache_idx
                else jax.tree.map(lambda a, b: jnp.where(active, a, b), n, o)
                for i, (n, o) in enumerate(zip(ns, s))
            )

        state = jax.lax.fori_loop(0, W, inner, state)
        return (
            state[:cache_idx]
            + (flush_staging(state[cache_idx]),)
            + state[cache_idx + 1:]
        )

    return jax.lax.while_loop(not_done, window, init)

@partial(
    jax.jit,
    static_argnames=(
        "decode_fn",
        "num_beams",
        "max_length",
        "processors",
        "length_penalty",
        "pad_token_id",
        "eos_token_id",
        "do_sample",
        "topk_impl",
    ),
)
def beam_search(
    decode_fn: DecodeFn,
    prompt: jax.Array,  # [B, bucket] decoder input ids, right-padded with pad id
    prompt_len,  # TRACED scalar: true prompt length (bucketing avoids
    #              a recompile per longform segment as prompts grow)
    cache: Any,  # cache pytree with leading dim B*K, prefilled with the prompt
    ctx: Any,  # per-segment decode context (cross KV etc.), leading dim B*K
    processors: LogitsProcessorConfig,
    num_beams: int = 5,
    max_length: int = 448,
    length_penalty: float = 1.0,
    pad_token_id: int = 50257,
    eos_token_id: int = 50257,
    decoder_attention_mask: Optional[jax.Array] = None,  # [B, P]
    do_sample: bool = False,
    temperature=1.0,  # TRACED: the fallback ladder revisits several values
    rng: Optional[jax.Array] = None,
    topk_impl: str = "iterative",  # "iterative" (sort-free, decoding/topk.py)
    #                                or "sort" (lax.top_k) — bit-identical
) -> Tuple[jax.Array, jax.Array]:
    """Returns (sequences [B, max_length] right-padded, scores [B]).

    ``cache`` must already contain the prompt prefill for each of the B*K
    beam rows (identical across beams), positioned at ``prompt_len - 1``.

    ``do_sample=True`` is HF's beam-sample (the temperature>0 rungs of
    Whisper's fallback ladder keep ``num_beams`` beams,
    ``generate_with_fallback`` → ``_beam_search(do_sample=True)``): the
    processed log-probs are scaled by 1/temperature (TemperatureLogitsWarper
    runs after log_softmax in modern HF) and the 2K continuation candidates
    are drawn WITHOUT replacement from softmax(accumulated scores) instead
    of top-k — realized here with Gumbel-top-k, which yields exactly the
    sequential sampling-without-replacement distribution of
    ``torch.multinomial``.  Candidate order = sampling order, so eos
    retirement eligibility (first K positions, HF's ``top_num_beam_mask``)
    and running-beam re-selection behave exactly as in HF.
    """
    batch, bucket = prompt.shape
    K = num_beams
    V = processors.vocab_size
    prompt_len = jnp.asarray(prompt_len, jnp.int32)
    temperature = jnp.asarray(temperature, jnp.float32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    tokens = jnp.full((batch, K, max_length), pad_token_id, dtype=jnp.int32)
    # the bucket's pad tail is overwritten as generation reaches those slots
    tokens = tokens.at[:, :, :bucket].set(prompt[:, None, :])

    running_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1), dtype=jnp.float32)[None, :], (batch, 1)
    )
    finished_tokens = jnp.full_like(tokens, pad_token_id)
    finished_scores = jnp.full((batch, K), NEG_INF, dtype=jnp.float32)
    finished_flags = jnp.zeros((batch, K), dtype=bool)

    init_state = (
        prompt_len,  # cur_len
        tokens,
        running_scores,
        cache,
        finished_tokens,
        finished_scores,
        finished_flags,
        jnp.zeros((batch,), dtype=bool),  # batch done flags
    )

    def not_done(state):
        cur_len, _, _, _, _, _, _, done = state
        return jnp.logical_and(cur_len < max_length, jnp.logical_not(done.all()))

    def step(state):
        (cur_len, tokens, running_scores, cache, fin_tokens, fin_scores, fin_flags, done) = state

        last = jax.lax.dynamic_slice_in_dim(tokens, cur_len - 1, 1, axis=2)
        logits, new_cache = decode_fn(last.reshape(batch * K, 1), cache, ctx)
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logprobs = apply_logits_processors(
            processors, logprobs, tokens.reshape(batch * K, max_length), cur_len,
            prompt_len,
        ).reshape(batch, K, V)
        if do_sample:
            logprobs = logprobs / temperature

        total = logprobs + running_scores[:, :, None]  # [B, K, V]
        # Candidate selection in TWO stages: per-beam top-2K over V, then
        # top-2K over the K*2K pooled candidates.  Equivalent to HF's
        # top_k over the flattened [K*V] axis — the global top-2K is a
        # subset of the per-beam top-2Ks, and tie-breaking matches (pool
        # order is beam-major; within a beam, equal scores rank by token
        # id, exactly like flat-index order).  On TPU this is 3.6x faster
        # per step: the flat form needs a physical [K, V] -> [K*V]
        # re-layout (V pads to lane tiles) and a 260k-element top_k custom
        # call per step — profiled at 80% of beam-search device time.
        if do_sample:
            gumbel = jax.random.gumbel(
                jax.random.fold_in(rng, cur_len), total.shape, dtype=jnp.float32
            )
            perturbed = total + gumbel  # sampling order = gumbel-top-k
        else:
            perturbed = total
        # Even on a 2-D [B*K, V] operand the per-beam top-2K lowers to a
        # full O(V log V) variadic sort — profiled at 59% of beam-decode
        # device time (docs/PERF.md).  The sort-free exact_top_k does 2K
        # max+mask passes instead (bit-identical incl. tie order).
        _top_k = exact_top_k if topk_impl == "iterative" else jax.lax.top_k
        per_perturbed, per_token = _top_k(
            perturbed.reshape(batch * K, V), 2 * K
        )  # [B*K, 2K]
        pool_perturbed = per_perturbed.reshape(batch, K * 2 * K)
        pool_token = per_token.reshape(batch, K * 2 * K)
        _, pool_sel = jax.lax.top_k(pool_perturbed, 2 * K)  # [B, 2K]
        cand_beam = pool_sel // (2 * K)
        cand_token = jnp.take_along_axis(pool_token, pool_sel, axis=1)
        if do_sample:
            pool_scores = jnp.take_along_axis(
                total.reshape(batch * K, V), per_token, axis=-1
            ).reshape(batch, K * 2 * K)
            cand_scores = jnp.take_along_axis(pool_scores, pool_sel, axis=1)
        else:
            cand_scores = jnp.take_along_axis(pool_perturbed, pool_sel, axis=1)
        is_eos = cand_token == eos_token_id
        rank = jnp.broadcast_to(jnp.arange(2 * K)[None, :], (batch, 2 * K))

        # --- retire eos candidates (rank < K) into the finished set;
        # normalization length = generated tokens incl. the retiring one
        gen_len = jnp.asarray(cur_len + 1 - prompt_len, jnp.float32)
        new_fin_score = cand_scores / gen_len**length_penalty
        eligible = is_eos & (rank < K) & jnp.logical_not(done[:, None])
        cand_fin_score = jnp.where(eligible, new_fin_score, NEG_INF)

        cand_sequences = jnp.take_along_axis(tokens, cand_beam[:, :, None], axis=1)
        cand_sequences = jax.lax.dynamic_update_slice_in_dim(
            cand_sequences,
            jnp.full((batch, 2 * K, 1), eos_token_id, dtype=cand_sequences.dtype),
            cur_len,
            axis=2,
        )  # [B, 2K, L] with eos re-appended (BeamSearchScorer.finalize does this)

        merged_scores = jnp.concatenate([fin_scores, cand_fin_score], axis=1)  # [B, 3K]
        merged_tokens = jnp.concatenate([fin_tokens, cand_sequences], axis=1)
        merged_flags = jnp.concatenate([fin_flags, eligible], axis=1)
        top_scores, top_idx = jax.lax.top_k(merged_scores, K)
        fin_scores = top_scores
        fin_tokens = jnp.take_along_axis(merged_tokens, top_idx[:, :, None], axis=1)
        fin_flags = jnp.take_along_axis(merged_flags, top_idx, axis=1)

        # --- select the next K running beams: best non-eos candidates in rank order
        running_eligible = jnp.where(is_eos, NEG_INF, cand_scores)
        new_running_scores, sel = jax.lax.top_k(running_eligible, K)  # sel indexes 2K cands
        sel_beam = jnp.take_along_axis(cand_beam, sel, axis=1)  # [B, K]
        sel_token = jnp.take_along_axis(cand_token, sel, axis=1)

        new_tokens = jnp.take_along_axis(tokens, sel_beam[:, :, None], axis=1)
        new_tokens = jax.lax.dynamic_update_slice_in_dim(
            new_tokens, sel_token[:, :, None].astype(jnp.int32), cur_len, axis=2
        )

        if isinstance(new_cache, dict) and "anc" in new_cache:
            # gather-free beam cache: the K/V rows stay put; only the tiny
            # [B, K, T] ancestry map is re-parented with the beam selection.
            # Slots < cur_len (including the K/V appended by THIS step's
            # decode_fn at cur_len-1) inherit the parent's history; slots at
            # or past cur_len stay identity so future appends self-reference
            # (models/whisper.py:_ancestry_attention).
            anc = new_cache["anc"]
            parent = jnp.take_along_axis(anc, sel_beam[:, :, None], axis=1)
            ident = jnp.broadcast_to(
                jnp.arange(K, dtype=anc.dtype)[None, :, None], anc.shape
            )
            slot = jnp.arange(anc.shape[-1], dtype=jnp.int32)[None, None, :]
            new_cache = {
                **new_cache, "anc": jnp.where(slot < cur_len, parent, ident)
            }
        else:
            new_cache = _gather_beams(new_cache, sel_beam, batch, K)

        # frozen batches keep their previous state
        keep = done[:, None]
        new_tokens = jnp.where(keep[:, :, None], tokens, new_tokens)
        new_running_scores = jnp.where(keep, running_scores, new_running_scores)

        # --- done condition (early_stopping=False heuristic): all K slots
        # filled AND the best running beam, normalized at the current
        # generated length, can no longer beat the worst finished score
        best_possible = new_running_scores[:, 0] / gen_len**length_penalty
        worst_finished = fin_scores.min(axis=1)
        newly_done = (fin_flags.sum(axis=1) >= K) & (worst_finished >= best_possible)
        done = done | newly_done

        return (
            cur_len + 1,
            new_tokens,
            new_running_scores,
            new_cache,
            fin_tokens,
            fin_scores,
            fin_flags,
            done,
        )

    (cur_len, tokens, running_scores, _, fin_tokens, fin_scores, fin_flags, done) = (
        _run_decode_loop(not_done, step, init_state, cache_idx=3)
    )

    # finalize: when the loop ended at max_length, the running beams retire
    # through the same normalization (their last token counted, prompt not)
    # and compete with the finished hypotheses; is_done batches keep
    # finished hyps only.
    running_norm = running_scores / (
        jnp.asarray(cur_len - prompt_len, jnp.float32) ** length_penalty
    )
    running_norm = jnp.where(done[:, None], NEG_INF, running_norm)
    all_scores = jnp.concatenate([fin_scores, running_norm], axis=1)  # [B, 2K]
    all_tokens = jnp.concatenate([fin_tokens, tokens], axis=1)  # [B, 2K, L]

    best = jnp.argmax(all_scores, axis=1)
    sequences = jnp.take_along_axis(all_tokens, best[:, None, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(all_scores, best[:, None], axis=1)[:, 0]
    return sequences, scores


@partial(
    jax.jit,
    static_argnames=(
        "decode_fn", "max_length", "processors", "pad_token_id", "eos_token_id",
        "do_sample",
    ),
)
def greedy_search(
    decode_fn: DecodeFn,
    prompt: jax.Array,  # [B, bucket] right-padded with pad id
    prompt_len,  # TRACED scalar: true prompt length
    cache: Any,  # prefilled, leading dim B
    ctx: Any,  # per-segment decode context
    processors: LogitsProcessorConfig,
    max_length: int = 448,
    pad_token_id: int = 50257,
    eos_token_id: int = 50257,
    do_sample: bool = False,
    temperature=1.0,  # TRACED: the fallback ladder revisits several values
    #                   without recompiling the decode loop per rung
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy decode (``do_sample=False``) or multinomial sampling at the
    given temperature (HF's fallback-ladder retries set do_sample=True with
    num_beams=1, generation_whisper.generate_with_fallback); returns
    (sequences [B, max_length], sum logprobs [B]).

    The logprob sum follows HF ``_retrieve_avg_logprobs``: log-softmax of
    the PROCESSED scores (suppress/timestamp masks applied) WITHOUT the
    temperature rescale, summed over generated tokens incl. eos — the
    longform quality threshold consumes it
    (logprob_threshold, src/model/pba_whisper.py:425-442)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    temperature = jnp.asarray(temperature, jnp.float32)
    batch, bucket = prompt.shape
    V = processors.vocab_size
    prompt_len = jnp.asarray(prompt_len, jnp.int32)
    tokens = jnp.full((batch, max_length), pad_token_id, dtype=jnp.int32)
    tokens = tokens.at[:, :bucket].set(prompt)

    init = (
        prompt_len,
        tokens,
        cache,
        jnp.zeros((batch,), jnp.float32),  # sum logprobs
        jnp.zeros((batch,), jnp.int32),  # generated count (incl. eos)
        jnp.zeros((batch,), dtype=bool),  # finished
    )

    def not_done(state):
        cur_len, _, _, _, _, finished = state
        return jnp.logical_and(cur_len < max_length, jnp.logical_not(finished.all()))

    def step(state):
        cur_len, tokens, cache, sum_lp, n_gen, finished = state
        last = jax.lax.dynamic_slice_in_dim(tokens, cur_len - 1, 1, axis=1)
        logits, cache = decode_fn(last, cache, ctx)
        processed = apply_logits_processors(
            processors, logits.astype(jnp.float32), tokens, cur_len, prompt_len
        )
        if do_sample:
            next_tok = jax.random.categorical(
                jax.random.fold_in(rng, cur_len), processed / temperature, axis=-1
            )
        else:
            next_tok = jnp.argmax(processed, axis=-1)
        # HF _retrieve_avg_logprobs: log-softmax of the PROCESSED scores
        # with the temperature warper undone (scores * temperature)
        logprobs = jax.nn.log_softmax(processed, axis=-1)
        tok_lp = jnp.take_along_axis(logprobs, next_tok[:, None], axis=1)[:, 0]

        next_tok = jnp.where(finished, pad_token_id, next_tok)
        sum_lp = sum_lp + jnp.where(finished, 0.0, tok_lp)
        n_gen = n_gen + jnp.where(finished, 0, 1)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, next_tok[:, None].astype(jnp.int32), cur_len, axis=1
        )
        finished = finished | (next_tok == eos_token_id)
        return cur_len + 1, tokens, cache, sum_lp, n_gen, finished

    _, tokens, _, sum_lp, _, _ = _run_decode_loop(not_done, step, init,
                                                   cache_idx=2)
    return tokens, sum_lp
