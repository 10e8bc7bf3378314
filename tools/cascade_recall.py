"""Cascade recall-vs-shortlist characterization (VERDICT r4 next #2).

The two-stage cascade scorer prunes ~98% of the exact classifier's work
with a MaxSim proxy (efficient_kws/catalog.py:make_cascade_score_fn);
this harness measures what that pruning costs in recall, beyond the
planted-match tests, on a synthetic corpus with a GRADED score
distribution (the reference scores every keyword exactly and has no
cascade — src/model/model.py:78-93 — so this qualifies a
beyond-reference approximation).

Method: per utterance, ONE pass computes (a) the full exact scorer's
probabilities over all N keywords, (b) the f32 MaxSim proxy scores, and
(c) the bf16 fast-proxy scores.  Recall@K for EVERY K is then computed
offline from the dump — no per-K reruns.  Reported per utterance set:

* recall@K of the full scorer's accepted set (prob >= 0.5);
* recall@K of the full scorer's top-R rows (R=16 is what the composed
  serving pipeline actually consumes, bench_serving.py:244);
* bf16-vs-f32 proxy shortlist agreement at each K.

Corpus structure (seeded): each utterance embeds planted keyword matches
at graded corruption levels (exact copy, +0.25/+0.5/+1.0 sigma noise,
half-overlap) plus hard negatives (frame-shuffled copies of planted
keywords) over a background of random keywords — a spread of
easy/marginal/absent scores rather than a single planted spike.

Memory/transfer design (the r5c sweep OOMed at 172 GiB): the raw
[100352, 3, 75, 1024] catalog is 86 GiB in f32 — too big for this host
AND for the ~18 MB/s relay link.  Background rows are therefore
generated ON DEVICE (jax.random.normal inside the projection jit, one
key per chunk, projected output only is kept — ~1.5 GB bf16); the only
host→device uploads are the utterances and the ≤2·n_planted·n_utts
special rows (planted keywords + their frame-shuffled hard negatives),
whose projections are scattered over the device catalog.

Env knobs: ECW_REC_N (catalog rows, default 100352), ECW_REC_UTTS (8),
ECW_REC_CHUNK (128), ECW_REC_DIMS=full|tiny (tiny = CPU-sized smoke),
ECW_REC_OUT (npz dump path), ECW_REC_KS (comma Ks).
Prints ONE JSON line with the recall table.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KW_SEED = 7  # per-row stream base for host-defined keyword rows


def kw_raw(row, L, T_K, D):
    """Deterministic host-side content for catalog row ``row`` — regenerable
    on demand so no full raw catalog ever materializes."""
    return np.random.default_rng([KW_SEED, int(row)]).standard_normal(
        (L, T_K, D), dtype=np.float32
    )


def build_corpus(rng, n_cat, n_utts, L, D, T_K, T_U, n_planted=12):
    """Synthetic corpus: per utterance, graded planted matches + hard
    negatives inside a random catalog.  Returns (utts [n,L,T_U,D],
    planted: list of {row: corruption} per utt, overrides: {row ->
    (src_row, frame_perm)} hard-negative catalog patches).  Catalog row
    content: ``kw_raw(row)`` for rows in planted/special sets, iid normal
    (device-generated) otherwise — both N(0,1), so the background
    distribution is unchanged."""
    utts = rng.standard_normal((n_utts, L, T_U, D), dtype=np.float32)
    grades = [0.0, 0.25, 0.5, 1.0, "half"]
    planted = []
    overrides = {}
    all_planted = set()
    for u in range(n_utts):
        rows = rng.choice(n_cat, size=n_planted, replace=False)
        info = {}
        pos = 0
        for i, row in enumerate(rows):
            row = int(row)
            # a later plant supersedes an earlier hard-negative patch (the
            # planted fragment must match the catalog row exactly)
            overrides.pop(row, None)
            g = grades[i % len(grades)]
            kw = kw_raw(row, L, T_K, D)
            if g == "half":  # only the first half of the keyword appears
                span = T_K // 2
                frag = kw[:, :span]
            else:
                span = T_K
                frag = kw + np.float32(g) * rng.standard_normal(
                    kw.shape, dtype=np.float32
                )
            if pos + span > T_U:
                pos = 0
            utts[u, :, pos : pos + span] = frag[:, :span]
            pos += span + 3
            info[row] = str(g)
            all_planted.add(row)
            # hard negative: frame-shuffled copy of this keyword elsewhere
            # in the CATALOG (same marginal stats, no aligned match)
            neg_row = int(rng.integers(n_cat))
            if neg_row not in info and neg_row not in all_planted:
                overrides[neg_row] = (row, rng.permutation(T_K))
        planted.append(info)
    return utts, planted, overrides


def main():
    import jax
    import jax.numpy as jnp

    from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from enhance_cb_whisper_tpu.efficient_kws import (
        EfficientKWSConfig,
        EfficientKWSModel,
    )
    from enhance_cb_whisper_tpu.efficient_kws.catalog import (
        make_projected_score_fn,
        maxsim_proxy,
        maxsim_proxy_fast,
        _chunked,
    )
    from enhance_cb_whisper_tpu.efficient_kws.model import _safe_normalize

    dims = os.environ.get("ECW_REC_DIMS", "full")
    if dims == "full":
        N = int(os.environ.get("ECW_REC_N", "100352"))
        L, D, U, T_K, T_U = 3, 1024, 64, 75, 1500
        chunk = int(os.environ.get("ECW_REC_CHUNK", "128"))
        resnet = "resnet-50"
        model_dtype = jnp.bfloat16
        cat_dtype = jnp.bfloat16
        bs = 512
    else:  # tiny CPU smoke
        N = int(os.environ.get("ECW_REC_N", "256"))
        L, D, U, T_K, T_U = 2, 32, 16, 12, 80
        chunk = int(os.environ.get("ECW_REC_CHUNK", "16"))
        resnet = "resnet-18"
        model_dtype = jnp.float32
        cat_dtype = jnp.float32
        bs = 64
    assert N % bs == 0, f"catalog rows ({N}) must be a multiple of gen batch ({bs})"
    n_utts = int(os.environ.get("ECW_REC_UTTS", "8"))
    ks_env = os.environ.get("ECW_REC_KS", "256,512,1024,2048,4096,8192")
    Ks = [int(k) for k in ks_env.split(",") if 0 < int(k) <= N]

    config = EfficientKWSConfig(
        n_layers=L, embedding_dim=D, learn_features=True, proj_mlp=True,
        proj_mlp_units=U, frames_conv=True, resnet_version=resnet,
    )
    model = EfficientKWSModel(config, dtype=model_dtype)

    rng = np.random.default_rng(0)
    utts, planted, overrides = build_corpus(rng, N, n_utts, L, D, T_K, T_U)
    utt_mask = np.ones((1, L, T_U), np.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.stack([kw_raw(0, L, T_K, D), kw_raw(1, L, T_K, D)]),
        utts[:1],
        np.ones((2, L, T_K), np.float32), utt_mask,
    )

    # ---- catalog projection: device-generated background + host special rows
    ones_mask = jnp.asarray(np.ones((bs, L, T_K), np.float32))

    @jax.jit
    def proj_random_chunk(key):
        raw = jax.random.normal(key, (bs, L, T_K, D), jnp.float32)
        out, pooled = model.apply(
            variables, raw, ones_mask, train=False, method=EfficientKWSModel.project
        )
        return out.astype(cat_dtype), pooled.astype(cat_dtype)

    @jax.jit
    def proj_batch(x):
        out, pooled = model.apply(
            variables, x, ones_mask, train=False, method=EfficientKWSModel.project
        )
        return out.astype(cat_dtype), pooled.astype(cat_dtype)

    base_key = jax.random.PRNGKey(42)
    outs, pmasks = [], []
    for c in range(N // bs):
        o, pm = proj_random_chunk(jax.random.fold_in(base_key, c))
        outs.append(o)  # stays on device — no host round-trip
        pmasks.append(pm)
    kwd = jnp.concatenate(outs)
    kwd_mask = jnp.concatenate(pmasks)
    del outs, pmasks

    # special rows: every planted keyword + every hard negative, projected
    # from host-defined raw content and scattered over the device catalog
    special = sorted(set().union(*[set(p) for p in planted], overrides))
    sp_raw = np.zeros((((len(special) + bs - 1) // bs) * bs, L, T_K, D), np.float32)
    for i, row in enumerate(special):
        if row in overrides:
            src, perm = overrides[row]
            sp_raw[i] = kw_raw(src, L, T_K, D)[:, perm]
        else:
            sp_raw[i] = kw_raw(row, L, T_K, D)
    sp_outs, sp_masks = [], []
    for i in range(0, sp_raw.shape[0], bs):
        o, pm = proj_batch(jnp.asarray(sp_raw[i : i + bs]))
        sp_outs.append(o)
        sp_masks.append(pm)
    sp_idx = jnp.asarray(np.asarray(special, np.int32))
    kwd = kwd.at[sp_idx].set(jnp.concatenate(sp_outs)[: len(special)])
    kwd_mask = kwd_mask.at[sp_idx].set(jnp.concatenate(sp_masks)[: len(special)])
    del sp_raw, sp_outs, sp_masks

    catalog = {
        "kwd": kwd,
        "kwd_mask": kwd_mask,
        "mask": jnp.asarray(np.ones((N,), np.float32)),
        "num_keywords": N,
        "chunk": chunk,
    }

    full = make_projected_score_fn(model, chunk=chunk)

    def make_proxy_fn(fast):
        def score(variables, catalog, utt, utt_mask):
            utt_p, utt_mask_p = model.apply(
                variables, utt, utt_mask, train=False,
                method=EfficientKWSModel.project,
            )
            if fast:
                utt_n = _safe_normalize(utt_p, 1e-6)[0]
                fn = lambda args: maxsim_proxy_fast(args[0], utt_n, args[1], utt_mask_p)
            else:
                fn = lambda args: maxsim_proxy(args[0], utt_p, args[1], utt_mask_p)
            out = jax.lax.map(
                fn, (_chunked(catalog["kwd"], chunk), _chunked(catalog["kwd_mask"], chunk))
            ).reshape(-1)
            return jnp.where(catalog["mask"] > 0, out, -jnp.inf)
        return jax.jit(score)

    proxy_f32 = make_proxy_fn(fast=False)
    proxy_bf16 = make_proxy_fn(fast=True)

    t0 = time.perf_counter()
    rows = []
    for u in range(n_utts):
        utt = jnp.asarray(utts[u][None])
        um = jnp.asarray(utt_mask)
        p_full = np.asarray(full(variables, catalog, utt, um))
        s_f32 = np.asarray(proxy_f32(variables, catalog, utt, um))
        s_bf16 = np.asarray(proxy_bf16(variables, catalog, utt, um))
        rows.append((p_full, s_f32, s_bf16))
    wall = time.perf_counter() - t0

    out_path = os.environ.get("ECW_REC_OUT")
    if out_path:
        np.savez_compressed(
            out_path,
            p_full=np.stack([r[0] for r in rows]),
            s_f32=np.stack([r[1] for r in rows]),
            s_bf16=np.stack([r[2] for r in rows]),
            planted=json.dumps(planted),
        )

    def recall_table(score_idx):
        """recall@K of (a) accepted set (p>=0.5), (b) top-16 by p_full."""
        acc_kept = {k: [0, 0] for k in Ks}   # [kept, total]
        top16_kept = {k: [0, 0] for k in Ks}
        planted_kept = {k: [0, 0] for k in Ks}
        for u, (p_full, *scores) in enumerate(rows):
            s = scores[score_idx]
            order = np.argsort(s)[::-1]
            accepted = np.flatnonzero(p_full >= 0.5)
            top16 = np.argsort(p_full)[::-1][:16]
            pl = np.array(sorted(int(r) for r in planted[u]), int)
            for k in Ks:
                short = set(order[:k].tolist())
                acc_kept[k][0] += sum(int(i) in short for i in accepted)
                acc_kept[k][1] += len(accepted)
                top16_kept[k][0] += sum(int(i) in short for i in top16)
                top16_kept[k][1] += len(top16)
                planted_kept[k][0] += sum(int(i) in short for i in pl)
                planted_kept[k][1] += len(pl)
        def f(d):
            return {str(k): round(v[0] / max(v[1], 1), 4) for k, v in d.items()}
        return {
            "recall_accepted": f(acc_kept),
            "recall_top16": f(top16_kept),
            "recall_planted": f(planted_kept),
            "accepted_total": acc_kept[Ks[0]][1],
        }

    # bf16-vs-f32 proxy shortlist agreement (|intersection| / K)
    agree = {}
    for k in Ks:
        inter = 0
        for p_full, s_f32, s_bf16 in rows:
            a = set(np.argsort(s_f32)[::-1][:k].tolist())
            b = set(np.argsort(s_bf16)[::-1][:k].tolist())
            inter += len(a & b) / k
        agree[str(k)] = round(inter / len(rows), 4)

    print(json.dumps({
        "metric": "cascade_recall_characterization",
        "catalog_n": N,
        "utterances": n_utts,
        "dims": dims,
        "Ks": Ks,
        "proxy_f32": recall_table(0),
        "proxy_bf16": recall_table(1),
        "bf16_f32_shortlist_agreement": agree,
        "wall_seconds": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
