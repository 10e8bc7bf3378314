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


def _make_chunk_classifier(model, quantized_params, act_scales):
    """The exact per-chunk classifier shared by the full and cascade
    scorers: ``chunk_fn(variables, utt_p, utt_mask_p)((kwd, kwd_mask)) ->
    probs [chunk]`` (float path = classify_projected; int8 path =
    masked_sims + quantized ResNet apply)."""
    if quantized_params is not None:
        from ..models.quant import make_quantized_kws_apply

        q_apply = make_quantized_kws_apply(
            model.config.resnet_config(), act_scales=act_scales
        )

    def bind(variables, utt_p, utt_mask_p):
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

        return chunk_fn

    return bind


def _chunked(catalog_arr, chunk):
    n = catalog_arr.shape[0]
    return catalog_arr.reshape(n // chunk, chunk, *catalog_arr.shape[1:])


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
    bind = _make_chunk_classifier(model, quantized_params, act_scales)

    def score(variables, catalog, utt, utt_mask):
        utt_p, utt_mask_p = model.apply(
            variables, utt, utt_mask, train=False, method=EfficientKWSModel.project
        )
        chunk_fn = bind(variables, utt_p, utt_mask_p)

        n_pad = catalog["kwd"].shape[0]
        assert n_pad % chunk == 0, (
            f"catalog rows ({n_pad}) must be a multiple of chunk ({chunk}) — "
            "build the catalog with project_catalog(chunk=...) or pad it"
        )
        probs = jax.lax.map(
            chunk_fn, (_chunked(catalog["kwd"], chunk), _chunked(catalog["kwd_mask"], chunk))
        )
        return probs.reshape(-1) * catalog["mask"]

    return jax.jit(score)


def maxsim_proxy(kwd, utt_p, kwd_mask, utt_mask_p):
    """Stage-1 cascade score: MaxSim retrieval proxy, NO ResNet.

    For each keyword frame take its best cosine match over the utterance
    frames (max over T_u), average over the keyword's valid frames
    (mean over T_k), average over layers — the standard late-interaction
    retrieval score (the reference has no cascade; its per-keyword
    classifier forward IS the score, src/model/model.py:78-93).  Shares
    masked_sims with the exact classifier so stage 1 sees exactly the
    similarity maps stage 2 would.  Returns [chunk] float32."""
    from .model import masked_sims

    sims = masked_sims(kwd, utt_p, kwd_mask, utt_mask_p)  # [c, L, T_k, T_u] f32
    return _maxsim_reduce(sims, kwd_mask, utt_mask_p)


def _maxsim_reduce(sims, kwd_mask, utt_mask_p):
    """max over T_u -> masked mean over T_k -> mean over L (shared by the
    exact-sims and fast proxy paths)."""
    if utt_mask_p is not None:
        # finite sentinel, not -inf: fully-masked keyword rows would
        # otherwise produce -inf * 0 = nan in the masked mean below
        sims = jnp.where(utt_mask_p[:, :, None, :] > 0, sims, -1e30)
    best = jnp.max(sims, axis=-1)  # [c, L, T_k]
    if kwd_mask is not None:
        best = jnp.where(kwd_mask > 0, best, 0.0)
        denom = jnp.maximum(jnp.sum(kwd_mask, axis=-1), 1.0)  # [c, L]
        per_layer = jnp.sum(best, axis=-1) / denom
    else:
        per_layer = jnp.mean(best, axis=-1)
    return jnp.mean(per_layer, axis=-1)


def maxsim_proxy_fast(kwd, utt_n, kwd_mask, utt_mask_p, dtype=jnp.bfloat16):
    """Bandwidth/MXU-lean stage-1 proxy: identical reduction structure to
    :func:`maxsim_proxy`, but the cosine einsum runs at default precision in
    ``dtype`` (bf16 MXU passes instead of the classifier path's
    ``precision="highest"`` 6-pass f32 — a ranking heuristic does not need
    3 extra decimal digits) and the utterance side arrives PRE-normalized
    (``utt_n = _safe_normalize(utt_p)[0]``, computed once per utterance
    instead of once per chunk iteration).  f32 accumulation; returns [chunk]
    float32.  Stage-2 rescoring is exact either way — only shortlist
    membership can differ from the f32 proxy (round-5 sweep: see
    docs/PERF.md cascade section)."""
    from .model import _safe_normalize

    kwd_n = _safe_normalize(kwd, 1e-6).astype(dtype)
    sims = jnp.einsum(
        "lud,clkd->clku",
        utt_n.astype(dtype),
        kwd_n,
        preferred_element_type=jnp.float32,
    )
    mask3 = utt_mask_p[:1] if utt_mask_p is not None else None
    return _maxsim_reduce(sims, kwd_mask, mask3)


def make_cascade_score_fn(
    model: EfficientKWSModel,
    chunk: int = 128,
    shortlist: int = 2048,
    quantized_params=None,
    act_scales=None,
    proxy_dtype="bfloat16",
):
    """Two-stage cascade scorer for massive catalogs: a cheap MaxSim proxy
    (:func:`maxsim_proxy`, reductions over the similarity maps — no ResNet)
    ranks ALL keywords, then the EXACT chunked classifier runs only on the
    static top-``shortlist`` rows.  Returns jitted ``score(variables,
    catalog, utt, utt_mask) -> probs [N_pad]`` where shortlisted rows carry
    the classifier probability (bit-identical to the full scorer's) and
    everything else is exactly 0.0.

    Rationale: the composed serving flagship is bounded by the 100k-catalog
    scorer (77% of serving time, BASELINE.md) and that scorer's cost is
    ~all ResNet forwards; at shortlist=2048 the cascade runs 2% of them.
    Approximate (proxy recall < 1), opt-in — characterize recall@K on your
    corpus first (tests/test_efficient_catalog.py plants matches; the
    synthetic harness is tools/validate_approx.py's pattern).

    ``proxy_dtype``: "bfloat16" (default — :func:`maxsim_proxy_fast`, bf16
    MXU einsum with the utterance normalized once per utterance) or
    "float32" (:func:`maxsim_proxy` on the classifier's exact
    precision="highest" sims).  Stage 2 is exact either way; the knob only
    moves shortlist membership at the ranking margin."""
    assert shortlist % chunk == 0, (
        f"shortlist ({shortlist}) must be a multiple of chunk ({chunk}) so "
        "stage 2 reuses the full scorer's compiled chunk shape"
    )
    bind = _make_chunk_classifier(model, quantized_params, act_scales)

    def score(variables, catalog, utt, utt_mask):
        utt_p, utt_mask_p = model.apply(
            variables, utt, utt_mask, train=False, method=EfficientKWSModel.project
        )

        n_pad = catalog["kwd"].shape[0]
        assert n_pad % chunk == 0, (
            f"catalog rows ({n_pad}) must be a multiple of chunk ({chunk})"
        )
        assert shortlist <= n_pad, (
            f"shortlist ({shortlist}) exceeds catalog rows ({n_pad})"
        )

        # stage 1: proxy over the full catalog (chunked to bound VMEM)
        if proxy_dtype == "float32":
            def proxy_fn(args):
                kwd, kwd_mask = args
                return maxsim_proxy(kwd, utt_p, kwd_mask, utt_mask_p)
        else:
            from .model import _safe_normalize

            utt_n = _safe_normalize(utt_p, 1e-6)[0]  # once, outside the map
            def proxy_fn(args):
                kwd, kwd_mask = args
                return maxsim_proxy_fast(
                    kwd, utt_n, kwd_mask, utt_mask_p, dtype=jnp.dtype(proxy_dtype)
                )

        proxy = jax.lax.map(
            proxy_fn, (_chunked(catalog["kwd"], chunk), _chunked(catalog["kwd_mask"], chunk))
        ).reshape(-1)
        proxy = jnp.where(catalog["mask"] > 0, proxy, -jnp.inf)
        # one 1-D top-k over [N_pad] per utterance — negligible next to the
        # ResNet work it prunes (the [rows, V] beam-decode top-k lesson,
        # decoding/topk.py, does not bite at this shape/frequency)
        _, idx = jax.lax.top_k(proxy, shortlist)

        # stage 2: exact classifier on the shortlist only
        kwd_s = jnp.take(catalog["kwd"], idx, axis=0)
        km_s = jnp.take(catalog["kwd_mask"], idx, axis=0)
        chunk_fn = bind(variables, utt_p, utt_mask_p)
        probs_s = jax.lax.map(
            chunk_fn, (_chunked(kwd_s, chunk), _chunked(km_s, chunk))
        ).reshape(-1)

        probs = jnp.zeros((n_pad,), probs_s.dtype).at[idx].set(probs_s)
        return probs * catalog["mask"]

    return jax.jit(score)
