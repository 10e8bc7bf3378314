"""Exact small-k top-k without the XLA sort.

``jax.lax.top_k`` on a ``[rows, V]`` operand lowers to a full ``O(V log V)``
variadic sort on TPU for the Whisper vocab (V = 51865): profiling the
beam-5 decode loop showed that ONE sort op at 59% of total device time
(2.7 s of 4.5 s — see docs/PERF.md).  Beam search only needs the top
``2·num_beams`` (≤ ~10) entries, so k rounds of (max → first-index →
mask) are exact and read ~k·V elements instead of sorting V — the VPU
reduce is HBM-bound, making this ~log(V)·(sort constant)× cheaper.

Semantics are bit-identical to ``lax.top_k``:
* values in descending order, ties broken by LOWER index first
  (``argmax``/first-True picks the lowest index);
* indices always distinct, even among equal values — including ``-inf``
  rows (possible in beam search: NEG_INF-masked logprobs added to
  NEG_INF dead-beam scores overflow f32 to ``-inf``), which value-masking
  alone cannot guarantee; a ``taken`` mask provides it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_MAX_UNROLLED_K = 32


def exact_top_k(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Drop-in ``lax.top_k`` over the last axis of a 2-D operand.

    Falls back to ``lax.top_k`` when ``k`` is large enough that k linear
    passes would lose to the sort."""
    rows, v = x.shape
    if k > _MAX_UNROLLED_K or k >= v:
        return jax.lax.top_k(x, k)
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, v), 1)
    taken = jnp.zeros((rows, v), dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    vals, idxs = [], []
    for _ in range(k):
        masked = jnp.where(taken, neg_inf, x)
        m = jnp.max(masked, axis=-1)  # exact value, -inf rows included
        # first untaken index attaining the max — argmax over bool picks
        # the first True, reproducing top_k's tie order; `& ~taken` matters
        # when m == -inf (taken entries are -inf in `masked` too)
        cand = (masked == m[:, None]) & ~taken
        idx = jnp.argmax(cand, axis=-1).astype(jnp.int32)
        taken = taken | (iota == idx[:, None])
        vals.append(m)
        idxs.append(idx)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)
