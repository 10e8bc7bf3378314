"""Pre-projected keyword catalogs for massive open-vocabulary KWS.

The 100k-keyword multilingual configuration cannot hold raw
[100k, L, 150, 1024] embeddings on device (~90 GB); the LE/LEF projections
compress the embedding dim to 64 (and LEF halves frames), so the projected
catalog is ~40x smaller (SURVEY.md §7 hard parts).  This module:

* :func:`project_catalog` — run the model's projection stack over the
  keyword groups ONCE, returning padded device arrays
  ``{kwd [N_pad, L, T', U], kwd_mask [N_pad, L, T'], mask [N_pad]}``;
* :func:`make_projected_score_fn` — per-utterance scorer: project the
  utterance once, then similarity + ResNet over catalog chunks inside a
  single jit (``lax.map`` bounds working memory); shard the catalog arrays
  over a mesh ``model`` axis (:func:`..parallel.shard_catalog`) to split a
  100k catalog across chips.

Chunk default from the on-chip sweep (v5e, 100,352-keyword bf16 catalog,
pipelined dispatch): 128 → 11,366 kw/s at 58.3% MFU (64: 10,590 / 54.3%;
256: 10,447 / 53.6%) — docs/PERF.md.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .model import EfficientKWSModel


def project_catalog(
    model: EfficientKWSModel,
    variables: Dict[str, Any],
    groups,
    chunk: int = 128,
    dtype=jnp.float32,
) -> Dict[str, jax.Array]:
    """``groups``: the eval datasets' group list ({kwd, kwd_mask, mask})."""

    @jax.jit
    def proj(kwd, mask):
        out, pooled = model.apply(
            variables, kwd, mask, train=False, method=EfficientKWSModel.project
        )
        return out, pooled

    kwds, masks, valid = [], [], []
    for g in groups:
        out, pooled = proj(jnp.asarray(g["kwd"]), jnp.asarray(g["kwd_mask"]))
        kwds.append(np.asarray(out, dtype=np.float32))
        masks.append(
            np.asarray(pooled if pooled is not None else g["kwd_mask"], np.float32)
        )
        valid.append(np.asarray(g["mask"], np.float32))
    kwd = np.concatenate(kwds)
    kwd_mask = np.concatenate(masks)
    valid = np.concatenate(valid)

    n = kwd.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n

    def pad0(x):
        return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    return {
        "kwd": jnp.asarray(pad0(kwd), dtype),
        "kwd_mask": jnp.asarray(pad0(kwd_mask), dtype),
        "mask": jnp.asarray(pad0(valid), jnp.float32),
        "num_keywords": n,
        "chunk": chunk,
    }


def make_projected_score_fn(
    model: EfficientKWSModel,
    chunk: int = 128,
    quantized_params=None,
    act_scales=None,
):
    """Returns jitted ``score(variables, catalog, utt, utt_mask) ->
    probs [N_pad]`` (utt: [1, L, T, D] raw features).

    ``quantized_params`` (from `models.quant.quantize_efficient_classifier`,
    `jax.device_put` it once) switches the ResNet+head to int8 inference;
    pass calibrated ``act_scales`` so they bake in as compile-time
    constants (see models/quant.py — the projection stack and similarity
    einsum stay float)."""
    if quantized_params is not None:
        from ..models.quant import make_quantized_kws_apply

        q_apply = make_quantized_kws_apply(
            model.config.resnet_config(), act_scales=act_scales
        )

    def score(variables, catalog, utt, utt_mask):
        utt_p, utt_mask_p = model.apply(
            variables, utt, utt_mask, train=False, method=EfficientKWSModel.project
        )

        def chunk_fn(args):
            kwd, kwd_mask = args
            if quantized_params is not None:
                from .model import masked_sims

                sims = masked_sims(kwd, utt_p, kwd_mask, utt_mask_p)
                logits = q_apply(quantized_params, sims)
            else:
                logits, _ = model.apply(
                    variables, kwd, utt_p,
                    kwd_mask=kwd_mask, utt_mask=utt_mask_p, train=False,
                    method=EfficientKWSModel.classify_projected,
                )
            return jax.nn.softmax(logits, -1)[:, 1]

        n_pad = catalog["kwd"].shape[0]
        assert n_pad % chunk == 0, (
            f"catalog rows ({n_pad}) must be a multiple of chunk ({chunk}) — "
            "build the catalog with project_catalog(chunk=...) or pad it"
        )
        n_chunks = n_pad // chunk
        kwd = catalog["kwd"].reshape(n_chunks, chunk, *catalog["kwd"].shape[1:])
        km = catalog["kwd_mask"].reshape(n_chunks, chunk, *catalog["kwd_mask"].shape[1:])
        probs = jax.lax.map(chunk_fn, (kwd, km))
        return probs.reshape(-1) * catalog["mask"]

    return jax.jit(score)
