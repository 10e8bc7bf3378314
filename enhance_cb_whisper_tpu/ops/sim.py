"""Cosine-similarity primitives.

The core representation of both papers: a keyword and an utterance are stacks
of (optionally L2-normalized) Whisper encoder hidden states, one slab per
layer, and their interaction is a per-layer cosine-similarity matrix
(keyword-frames x utterance-frames) treated as image channels.

Reference behavior reproduced here:
* L2 normalization over the embedding dim (reference src/utils.py:195,
  src/model/cb_whisper.py:106): ``x / ||x||_2`` with no epsilon.
* Pre-normalized inner product (reference src/data/dataset.py:97,311:
  ``matmul(kwd, utt.T)`` on already-normalized slabs).
* Epsilon-stabilized cosine similarity (reference
  src/efficient_kws/model.py:210-218: norms clamped to ``eps=1e-6``).

TPU notes: everything here is a batched matmul (einsum) so XLA tiles it onto
the MXU; callers keep the layer axis as a leading batch dim rather than
looping over layers in Python.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float | None = None) -> jax.Array:
    """L2-normalize ``x`` along ``axis``.

    With ``eps=None`` this matches the reference's raw
    ``x / linalg.norm(x, dim=-1, keepdim=True)`` (src/utils.py:195) —
    zero vectors become NaN there too, which the reference tolerates because
    ghost keywords are masked out downstream.  Pass ``eps`` to get the
    clamped variant used by efficient_kws (src/efficient_kws/model.py:214-216).

    The eps clamp is applied to the SQUARED norm before the sqrt:
    ``jnp.linalg.norm`` backprops nan at exactly-zero vectors even under a
    ``maximum`` clamp (0/0 in the sqrt VJP — CLAUDE.md; zero-padded frames
    hit this), while ``sqrt(max(sq, eps²)) == max(norm, eps)`` in value with
    a finite gradient (the efficient_kws ``_safe_normalize`` recipe).
    """
    if eps is None:
        return x / jnp.linalg.norm(x, axis=axis, keepdims=True)
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


def cossim_matmul(kwd: jax.Array, utt: jax.Array, precision="highest") -> jax.Array:
    """Inner product of pre-normalized hidden-state stacks.

    kwd: [..., L, T_k, D], utt: [..., L, T_u, D] -> [..., L, T_k, T_u].

    Reference: ``torch.matmul(kwd, utt.transpose(-2, -1))`` in
    src/data/dataset.py:97 / src/model/cb_whisper.py:198 (inputs are already
    L2-normalized at cache-build time).
    """
    return jnp.einsum("...kd,...ud->...ku", kwd, utt, precision=precision,
                      preferred_element_type=jnp.float32)


def sim_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-6, precision="highest") -> jax.Array:
    """Eps-stabilized cosine-similarity matrix between frame sequences.

    a: [..., T_a, D], b: [..., T_b, D] -> [..., T_a, T_b].

    Matches src/efficient_kws/model.py:210-218: both inputs are normalized
    with their norms clamped below at ``eps`` before the batched matmul.
    """
    a_n = l2_normalize(a, axis=-1, eps=eps)
    b_n = l2_normalize(b, axis=-1, eps=eps)
    return jnp.einsum("...ad,...bd->...ab", a_n, b_n, precision=precision,
                      preferred_element_type=jnp.float32)
