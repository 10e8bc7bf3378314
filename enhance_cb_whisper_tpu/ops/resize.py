"""Bilinear resize with PyTorch/torchvision-parity semantics, as matmuls.

The reference resizes cosine-similarity matrices with
``torchvision.transforms.functional.resize`` in two flavours:

* ``antialias=False`` in the eval datasets and CBWhisper
  (src/data/dataset.py:314-317,466-469; src/model/cb_whisper.py:208) —
  plain bilinear interpolation, half-pixel centers, align_corners=False.
* ``antialias=True`` in the train collator (src/data/data_collator.py:44-50)
  — PIL-style triangle-filter antialiasing when downsampling.

TPU-first design: a separable resize is two small dense matmuls
(``W_h @ X @ W_w^T``).  We precompute the interpolation weight matrices on
host (numpy, cached per (in, out, antialias)) and contract on device, which
maps straight onto the MXU instead of the gather-heavy form
``jax.image.resize`` lowers to, and gives us exact control over the weight
semantics (jax.image always antialiases on downsample; torch does not).

Weight construction mirrors ATen:
* non-antialiased: ``src = (i + 0.5) * (in/out) - 0.5`` clamped at 0, two taps.
* antialiased: PIL's algorithm (support = max(scale, 1), triangle filter,
  normalized), which torch replicates bitwise.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=4096)
def _resize_matrix_np(in_size: int, out_size: int, antialias: bool) -> np.ndarray:
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == out_size:
        np.fill_diagonal(w, 1.0)
        return w.astype(np.float32)
    # torch computes source coordinates in the input's opmath type (float32
    # for float32 tensors); mirror that so boundary lambdas match bitwise.
    scale = np.float32(in_size) / np.float32(out_size)
    if not antialias or scale <= 1.0:
        # aten upsample_bilinear2d, align_corners=False.  (For upsampling,
        # the antialiased path degenerates to this same computation.)
        for i in range(out_size):
            src = max(scale * (np.float32(i) + np.float32(0.5)) - np.float32(0.5),
                      np.float32(0.0))
            i0 = min(int(np.floor(src)), in_size - 1)
            i1 = min(i0 + 1, in_size - 1)
            lam = np.float32(src) - np.float32(i0)
            w[i, i0] += float(np.float32(1.0) - lam)
            w[i, i1] += float(lam)
    else:
        # PIL / aten antialiased downsample with the triangle (bilinear) filter.
        support = scale  # filter support 1.0 * scale
        for i in range(out_size):
            center = scale * (np.float32(i) + np.float32(0.5))
            xmin = max(int(center - support + 0.5), 0)
            xmax = min(int(center + support + 0.5), in_size)
            xs = np.arange(xmin, xmax, dtype=np.float32)
            weights = np.maximum(
                np.float32(0.0),
                np.float32(1.0) - np.abs((xs - center + np.float32(0.5)) / scale),
            )
            total = weights.sum(dtype=np.float32)
            if total > 0:
                w[i, xmin:xmax] = (weights / total).astype(np.float64)
    return w.astype(np.float32)


def resize_matrix(in_size: int, out_size: int, antialias: bool) -> np.ndarray:
    """[out_size, in_size] interpolation weights along one axis."""
    return _resize_matrix_np(int(in_size), int(out_size), bool(antialias))


def resize_bilinear(
    x: jax.Array,
    size: tuple[int, int],
    antialias: bool = False,
) -> jax.Array:
    """Resize the trailing two axes of ``x`` to ``size`` (h, w).

    Equivalent to ``torchvision.transforms.functional.resize(x, size,
    antialias=antialias)`` on float tensors (which lowers to
    ``F.interpolate(mode='bilinear', align_corners=False)``).
    """
    in_h, in_w = x.shape[-2], x.shape[-1]
    out_h, out_w = size
    orig_dtype = x.dtype
    y = x.astype(jnp.float32)
    # precision=highest: on TPU the default matmul rounds operands to
    # bfloat16, which would cost ~3 decimal digits of interpolation accuracy;
    # these matrices are tiny so full f32 passes are cheap.
    if in_h != out_h:
        wh = jnp.asarray(resize_matrix(in_h, out_h, antialias))
        y = jnp.einsum("oh,...hw->...ow", wh, y, precision="highest",
                       preferred_element_type=jnp.float32)
    if in_w != out_w:
        ww = jnp.asarray(resize_matrix(in_w, out_w, antialias))
        y = jnp.einsum("ow,...hw->...ho", ww, y, precision="highest",
                       preferred_element_type=jnp.float32)
    return y.astype(orig_dtype)


def resize_matrix_dynamic(
    t_in: jax.Array,
    max_in: int,
    t_out: int,
    antialias: bool,
) -> jax.Array:
    """[t_out, max_in] interpolation weights for a TRACED input length.

    Same semantics as :func:`resize_matrix` (ATen f32 coordinate math, PIL
    triangle filter when antialiased downsampling) but built in-graph from
    a scalar ``t_in``, so one compiled program serves every input length up
    to the static ``max_in`` pad.  Columns at or beyond ``t_in`` are zero —
    padded input frames never leak into the output.  This is what lets the
    training features (sims + resize, reference data_collator.py:44-50)
    move from the host into the jitted train step: the resize is two dense
    matmuls that belong on the MXU, and at the reference's (150, 750)
    target it costs ~2 GFLOP/example — measured 4.8 examples/s on a host
    core vs the 881 examples/s the TPU train step consumes.
    """
    t_in = jnp.asarray(t_in, jnp.float32)
    out_idx = jnp.arange(t_out, dtype=jnp.float32)
    in_idx = jnp.arange(max_in, dtype=jnp.float32)
    scale = t_in / jnp.float32(t_out)

    # --- plain bilinear (upsample, or antialias=False): two taps ----------
    src = jnp.maximum(scale * (out_idx + 0.5) - 0.5, 0.0)
    i0 = jnp.minimum(jnp.floor(src), t_in - 1.0)
    i1 = jnp.minimum(i0 + 1.0, t_in - 1.0)
    lam = src - i0
    plain = (
        (in_idx[None, :] == i0[:, None]) * (1.0 - lam)[:, None]
        + (in_idx[None, :] == i1[:, None]) * lam[:, None]
    )

    if not antialias:
        return plain

    # --- PIL/ATen triangle-filter antialiased downsample ------------------
    center = scale * (out_idx + 0.5)
    support = scale
    # int() truncation in ATen: operands are >= 0 before the clamp
    xmin = jnp.maximum(jnp.floor(center - support + 0.5), 0.0)
    xmax = jnp.minimum(jnp.floor(center + support + 0.5), t_in)
    w = jnp.maximum(0.0, 1.0 - jnp.abs((in_idx[None, :] - center[:, None] + 0.5) / scale))
    w = w * (in_idx[None, :] >= xmin[:, None]) * (in_idx[None, :] < xmax[:, None])
    total = w.sum(axis=1, keepdims=True)
    aa = jnp.where(total > 0, w / total, 0.0)

    # upsampling degenerates to the plain path (resize_matrix:43-53)
    return jnp.where(scale <= 1.0, plain, aa)


def features_from_hidden_states(
    kwd: jax.Array,
    utt: jax.Array,
    kwd_len: jax.Array,
    utt_len: jax.Array,
    size: tuple[int, int],
    antialias: bool = True,
) -> jax.Array:
    """Fused training-feature computation on device: cosine-similarity map
    (the caches are pre-normalized, so an inner product — dataset.py:96-99)
    followed by the antialiased collator resize (data_collator.py:44-50).

    ``kwd [L, T_k_max, D]``, ``utt [L, T_u_max, D]`` are zero-padded past
    ``kwd_len``/``utt_len``; returns ``[L, size0, size1]``.  vmap over the
    batch.  precision="highest": parity-critical einsums (project rule).
    """
    sims = jnp.einsum(
        "lkd,lud->lku", kwd, utt,
        precision="highest", preferred_element_type=jnp.float32,
    )
    wk = resize_matrix_dynamic(kwd_len, kwd.shape[-2], size[0], antialias)
    wu = resize_matrix_dynamic(utt_len, utt.shape[-2], size[1], antialias)
    return jnp.einsum(
        "ok,lku,pu->lop", wk, sims, wu,
        precision="highest", preferred_element_type=jnp.float32,
    )
