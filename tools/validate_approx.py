"""Qualify the approximate (int8) modes on REAL data before production use.

The int8 scorer/encoder ship with synthetic-only accuracy evidence
(docs/PERF.md: decision flips on stress corpora, frame cosine >=0.999 on
random inputs).  This is the one-command harness VERDICT r3 (missing #5)
asks for: point it at a real corpus + checkpoint (the same YAML configs the
eval CLIs consume) and it reports, as ONE JSON object:

* ``kws``       — int8-vs-fp32 catalog-scoring deltas on the test corpus:
                  decision-flip rate at threshold 0.5, per-group argmax
                  flips, max/mean |dprob|, and P/R/F1 in both modes
                  (reference scoring being approximated:
                  /root/reference/src/model/model.py:78-93).
* ``encoder``   — int8-vs-fp32 Whisper-encoder extraction deltas on audio
                  files: per-frame cosine min/mean/p1 and nearest-keyword
                  decision parity when a catalog is available (reference
                  extraction: /root/reference/src/utils.py:130-205).
* ``entity_recall`` — the end metric, evaluated twice through the
                  cb-whisper eval path (kws_int8 off/on), plus the delta.
* ``decode``    — the approximate DECODE levers (int8 self-KV cache /
                  int8 cross-attention K/V, the beam/large serving
                  recommendation): cb-whisper eval exact vs each lever,
                  reporting transcript-diff rate, mean transcript
                  similarity, and the entity-recall delta
                  (``--decode_int8`` [+ ``--decode_levers kv,xkv,kv+xkv``];
                  reference exact decode:
                  /root/reference/src/model/pba_whisper.py:365-465).
* ``cascade``   — paper-2 cascade retrieval vs the full projected scorer
                  (shortlisted rows are bit-identical, so every diff is a
                  pruned keyword): recall of the exact scorer's accepted
                  keywords, flip rate, top-1 misses — per val dataset.

Usage (each section runs only when its inputs are given):

  python tools/validate_approx.py \
      --kws_config <kws eval yaml> --ckpt <kws ckpt> \
      [--set NAME=value ...] \
      [--encoder_ckpt <whisper ckpt dir> --audio <dir-or-file> ...] \
      [--cbwhisper_config <cb-whisper eval yaml> --cb_ckpt <ckpt>] \
      [--efficient_config <paper-2 yaml> --efficient_ckpt <ckpt> \
       --shortlist K] \
      [--max_utts N] [--calibration_batches N] [--out report.json]

Smoke-tested on the synthetic fixtures (tests/test_validate_approx.py);
the point is that the FIRST run against real data is this command, not a
production cache build.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_sets(pairs):
    import yaml

    out = {}
    for p in pairs or []:
        name, _, value = p.partition("=")
        out[name] = yaml.safe_load(value) if value else value
    return out


def validate_kws(config_path, ckpt, placeholders, max_utts,
                 calibration_batches, resnet_config=None):
    """Score the test corpus fp32 AND int8 with the same engine; diff.

    ``resnet_config`` overrides the production 12-channel ResNet-50 (the
    smoke test drives this with the fixture-sized ResNet)."""
    from enhance_cb_whisper_tpu.cli.config import load_config
    from enhance_cb_whisper_tpu.cli.main import (
        _load_kws_variables,
        filter_kwargs,
        get,
    )
    from enhance_cb_whisper_tpu.data.datamodule import KWSDataMod
    from enhance_cb_whisper_tpu.metrics.pr_curve import prf_at_threshold
    from enhance_cb_whisper_tpu.models.resnet import ResNetConfig
    from enhance_cb_whisper_tpu.runtime.kws_engine import KWSEngine
    from enhance_cb_whisper_tpu.train.kws_train import KWSTrainConfig

    config = load_config(config_path, placeholders=placeholders or None)
    model_args = get(config, "model.init_args", {}) or {}
    data_args = dict(get(config, "data.init_args", {}) or {})
    for key in ("sampling", "resample_every_epoch", "kw_type", "batch_size"):
        if key in model_args:
            data_args[key] = model_args[key]
    datamodule = KWSDataMod(**filter_kwargs(data_args, KWSDataMod))
    engine = KWSEngine(
        KWSTrainConfig(**filter_kwargs(model_args, KWSTrainConfig)),
        resnet_config=resnet_config or ResNetConfig(
            num_channels=model_args.get("num_channels", 12), num_labels=2
        ),
        features_size=tuple(data_args.get("features_size") or (150, 750)),
        ckpt_dir=None,
    )
    variables = _load_kws_variables(
        ckpt or config.get("ckpt_path"), engine.resnet_config
    )
    datamodule.setup("test")
    dataset = datamodule.test_dataset

    n = len(dataset) if max_utts is None else min(max_utts, len(dataset))
    group = dataset.catalog.group_size

    def _score_all(vars_):
        probs, labels, masks = [], [], []
        for i in range(n):
            item = dataset[i]
            p, _ = engine.score_utterance(vars_, dataset, item["utt_hs"])
            probs.append(p)
            labels.append(np.asarray(item["hotword_labels"]))
            masks.append(np.asarray(item["hotword_mask"]))
        return np.stack(probs), np.stack(labels), np.stack(masks)

    p32, labels, masks = _score_all(variables)
    vars_int8 = engine.enable_int8_scoring(
        variables, dataset, calibration_batches=calibration_batches
    )
    p8, _, _ = _score_all(vars_int8)

    valid = masks > 0
    dec32, dec8 = p32 >= 0.5, p8 >= 0.5
    flips = (dec32 != dec8) & valid
    # per-group argmax (the reference's nearest-keyword pick within each
    # scoring group, model.py:78-93)
    def _group_argmax(p):
        out = []
        for row in p:
            out.append([
                int(np.argmax(row[lo : lo + group]))
                for lo in range(0, row.shape[0], group)
            ])
        return np.asarray(out)

    g32, g8 = _group_argmax(p32 * masks), _group_argmax(p8 * masks)
    dprob = np.abs(p32 - p8)[valid]

    def _prf(p):
        pr, rc, f1 = prf_at_threshold(
            (p * masks).reshape(-1), labels.reshape(-1), 0.5
        )
        return {"precision": pr, "recall": rc, "f1": f1}

    return {
        "utterances": int(n),
        "decisions": int(valid.sum()),
        "flip_rate_at_0.5": float(flips.sum() / max(valid.sum(), 1)),
        "group_argmax_flip_rate": float((g32 != g8).mean()),
        "max_abs_dprob": float(dprob.max()) if dprob.size else 0.0,
        "mean_abs_dprob": float(dprob.mean()) if dprob.size else 0.0,
        "fp32": _prf(p32),
        "int8": _prf(p8),
        "calibration_batches": calibration_batches,
    }


def validate_encoder(encoder_ckpt, audio_dir, max_utts, compute_dtype,
                     layer_slice=(10, 22)):
    """Extract hidden-state caches fp32 vs int8 over an audio dir (the same
    `extract_hidden_states` pipeline production caches use) and report
    per-frame cosine deltas."""
    import tempfile

    from enhance_cb_whisper_tpu.catalog.store import load_hidden_states
    from enhance_cb_whisper_tpu.pipeline import extract_hidden_states

    codes_file = None
    if max_utts is not None:
        from enhance_cb_whisper_tpu.pipeline import find_audio_files

        codes = sorted(find_audio_files(audio_dir))[:max_utts]
        codes_file = tempfile.NamedTemporaryFile(
            "w", suffix=".txt", delete=False
        )
        codes_file.write("\n".join(codes))
        codes_file.close()

    with tempfile.TemporaryDirectory() as d32, \
            tempfile.TemporaryDirectory() as d8:
        extract_hidden_states(
            audio_dir, encoder_ckpt, d32,
            codes=codes_file.name if codes_file else None,
            layer_slice=layer_slice,
            encoder_int8=False, compute_dtype="float32",
        )
        extract_hidden_states(
            audio_dir, encoder_ckpt, d8,
            codes=codes_file.name if codes_file else None,
            layer_slice=layer_slice,
            encoder_int8=True, compute_dtype=compute_dtype,
        )
        names = sorted(f for f in os.listdir(d32) if f.endswith(".npy"))
        if not names:
            raise SystemExit(f"no caches extracted from {audio_dir}")
        cos_all = []
        for name in names:
            a = load_hidden_states(os.path.join(d32, name))
            b = load_hidden_states(os.path.join(d8, name))
            a = np.asarray(a, np.float64).reshape(-1, a.shape[-1])
            b = np.asarray(b, np.float64).reshape(-1, b.shape[-1])
            na = np.linalg.norm(a, axis=-1)
            nb = np.linalg.norm(b, axis=-1)
            keep = (na > 0) & (nb > 0)
            cos_all.append((a[keep] * b[keep]).sum(-1) / (na[keep] * nb[keep]))
        cos = np.concatenate(cos_all)
    return {
        "files": len(names),
        "frames": int(cos.size),
        "cosine_min": float(cos.min()),
        "cosine_p1": float(np.percentile(cos, 1)),
        "cosine_mean": float(cos.mean()),
        "compute_dtype": compute_dtype,
    }


def validate_entity_recall(config_path, ckpt, placeholders):
    """cb-whisper eval twice: kws_int8 off vs on; report the delta."""
    from enhance_cb_whisper_tpu.cli.config import load_config
    from enhance_cb_whisper_tpu.cli.main import _run_cbwhisper

    out = {}
    for mode in ("fp32", "int8"):
        config = load_config(config_path, placeholders=placeholders or None)
        if ckpt:
            config["ckpt_path"] = ckpt
        config.setdefault("model", {}).setdefault("init_args", {})[
            "kws_int8"
        ] = mode == "int8"
        res = _run_cbwhisper("test", config)
        out[mode] = {k: float(v) for k, v in res.items() if isinstance(v, (int, float))}
    if "Entity Recall" in out.get("fp32", {}):
        out["delta"] = out["int8"]["Entity Recall"] - out["fp32"]["Entity Recall"]
    return out


def validate_decode(config_path, ckpt, placeholders, levers=None):
    """Qualify the APPROXIMATE decode levers (int8 self-KV cache, int8
    cross-attention K/V — the modes BASELINE.md recommends for beam/large
    serving) through the cb-whisper eval path: the eval runs once exact and
    once per lever combination, and the report carries the transcript-diff
    rate, a mean transcript similarity, and the entity-recall delta for
    each (reference exact decode being approximated:
    /root/reference/src/model/pba_whisper.py:365-465).

    ``levers``: iterable of mode names from {"kv", "xkv", "kv+xkv",
    "kv+stg", "kv+xkv+stg"} (default kv,xkv,kv+xkv).  Exact (all off)
    always runs as the baseline."""
    import difflib

    from enhance_cb_whisper_tpu.cli.config import load_config
    from enhance_cb_whisper_tpu.cli.main import _run_cbwhisper

    mode_flags = {
        "exact": {},
        "kv": {"kv_cache_int8": True},
        "xkv": {"cross_kv_int8": True},
        "kv+xkv": {"kv_cache_int8": True, "cross_kv_int8": True},
        # staged writes (kv_staging) are EXACT for bf16/f32 caches (same
        # attended key set); the qualifiable combination is int8 cache +
        # staging, where window tokens stay unquantized until the flush
        "kv+stg": {"kv_cache_int8": True, "kv_staging": 16},
        "kv+xkv+stg": {"kv_cache_int8": True, "cross_kv_int8": True,
                       "kv_staging": 16},
    }
    modes = ["exact"] + [m for m in (levers or ("kv", "xkv", "kv+xkv"))
                         if m in mode_flags and m != "exact"]

    out, preds = {}, {}
    for mode in modes:
        config = load_config(config_path, placeholders=placeholders or None)
        if ckpt:
            config["ckpt_path"] = ckpt
        init = config.setdefault("model", {}).setdefault("init_args", {})
        init["kv_cache_int8"] = False
        init["cross_kv_int8"] = False
        init["kv_staging"] = 0
        init.update(mode_flags[mode])
        p = []
        res = _run_cbwhisper("test", config, predictions_out=p)
        preds[mode] = p
        out[mode] = {k: float(v) for k, v in res.items()
                     if isinstance(v, (int, float))}

    base = preds["exact"]
    for mode in modes[1:]:
        cur = preds[mode]
        diffs = sum(a != b for a, b in zip(base, cur))
        sim = [difflib.SequenceMatcher(None, a, b).ratio()
               for a, b in zip(base, cur)]
        out[mode]["transcript_diff_rate"] = diffs / max(len(base), 1)
        out[mode]["transcript_similarity_mean"] = (
            float(np.mean(sim)) if sim else 1.0
        )
        if "Entity Recall" in out["exact"]:
            out[mode]["entity_recall_delta"] = (
                out[mode]["Entity Recall"] - out["exact"]["Entity Recall"]
            )
    return out


def validate_cascade(config_path, ckpt, placeholders, shortlist, max_utts,
                     chunk=32):
    """Cascade catalog retrieval vs the full projected scorer on a real
    paper-2 corpus (the config's val datasets — MLSEvaluationDataset, the
    open-vocab configuration the 100k catalogs serve).

    Shortlisted rows are bit-identical to the full scorer by construction
    (efficient_kws/catalog.py:make_cascade_score_fn), so every difference
    IS a pruned keyword: report how much the MaxSim proxy prunes that the
    exact classifier would have kept.  Reference scoring being
    approximated: /root/reference/src/model/model.py:78-93 (per-keyword
    classifier forward — the reference has no cascade)."""
    from enhance_cb_whisper_tpu.cli.config import load_config
    from enhance_cb_whisper_tpu.cli.main import filter_kwargs, get
    from enhance_cb_whisper_tpu.efficient_kws.catalog import (
        make_cascade_score_fn,
        make_projected_score_fn,
        project_catalog,
    )
    from enhance_cb_whisper_tpu.efficient_kws.data import EfficientKWSDataMod
    from enhance_cb_whisper_tpu.efficient_kws.model import (
        EfficientKWSConfig,
        EfficientKWSModel,
    )

    import jax.numpy as jnp

    config = load_config(config_path, placeholders=placeholders or None)
    model_args = get(config, "model.init_args", {}) or {}
    data_args = dict(get(config, "data.init_args", {}) or {})
    # same link_arguments as cli/main.py:_run_paper2
    for key in (
        "n_layers", "sampling", "resample_every_epoch", "batch_size",
        "features_size", "pad_long_before_resize",
        "learn_features", "load_embeddings", "kws_whisper_ckpt",
    ):
        if key in model_args:
            data_args[key] = model_args[key]
    data_args.setdefault("batch_size", 1)

    model_config = EfficientKWSConfig(**filter_kwargs(model_args, EfficientKWSConfig))
    model = EfficientKWSModel(model_config)
    datamodule = EfficientKWSDataMod(**filter_kwargs(data_args, EfficientKWSDataMod))

    ckpt_path = ckpt or config.get("ckpt_path")
    assert ckpt_path, "cascade validation needs --efficient_ckpt or ckpt_path"
    if os.path.isdir(ckpt_path):
        from enhance_cb_whisper_tpu.runtime.checkpoint import load_checkpoint

        state, _ = load_checkpoint(ckpt_path)
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
    else:
        import torch

        from enhance_cb_whisper_tpu.efficient_kws.torch_compat import (
            load_torch_efficient_kws,
        )

        raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        variables = load_torch_efficient_kws(raw.get("state_dict", raw), model_config)

    datamodule.setup("validate")
    report = {}
    for key, dataset in datamodule.val_dataset.items():
        n = len(dataset) if max_utts is None else min(max_utts, len(dataset))
        if n == 0:
            continue
        # the corpus keyword DB (shared across items, engine._eval_dataset)
        catalog = project_catalog(model, variables, dataset[0]["groups"], chunk=chunk)
        n_pad = catalog["kwd"].shape[0]
        k = min(shortlist, n_pad) // chunk * chunk
        if k == 0:
            k = min(chunk, n_pad)
        full = make_projected_score_fn(model, chunk=chunk)
        casc = make_cascade_score_fn(model, chunk=chunk, shortlist=k)

        kept, missed, dec, miss_top1, utts = 0, 0, 0, 0, 0
        for i in range(n):
            item = dataset[i]
            utt = jnp.asarray(item["utt"][None])
            utt_mask = jnp.asarray(item["utt_mask"][None])
            mask = np.asarray(catalog["mask"]) > 0
            p_full = np.asarray(full(variables, catalog, utt, utt_mask))
            p_casc = np.asarray(casc(variables, catalog, utt, utt_mask))
            pos = (p_full >= 0.5) & mask
            surv = p_casc > 0
            kept += int((pos & surv).sum())
            missed += int((pos & ~surv).sum())
            dec += int(mask.sum())
            if pos.any() and not surv[int(np.argmax(p_full * mask))]:
                miss_top1 += 1
            utts += 1
        report[key] = {
            "utterances": utts,
            "catalog_keywords": int(np.asarray(catalog["mask"]).sum()),
            "shortlist": int(k),
            "accepted_kept": kept,
            "accepted_missed": missed,
            "recall_of_accepted": float(kept / max(kept + missed, 1)),
            "flip_rate_at_0.5": float(missed / max(dec, 1)),
            "top1_missed_utterances": miss_top1,
        }
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--kws_config", help="paper-1 KWS eval YAML")
    ap.add_argument("--ckpt", help="KWS checkpoint (overrides ckpt_path)")
    ap.add_argument("--cbwhisper_config", help="cb-whisper eval YAML")
    ap.add_argument("--cb_ckpt", help="cb-whisper KWS checkpoint")
    ap.add_argument("--encoder_ckpt", help="whisper checkpoint dir for extraction")
    ap.add_argument("--audio", help="audio directory for the encoder cosine check")
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--layer_slice", default="10,22",
                    help="encoder hidden-state slice, e.g. 10,22")
    ap.add_argument("--set", action="append", default=[], dest="sets",
                    help="NAME=value placeholder fills for the YAMLs")
    ap.add_argument("--decode_int8", action="store_true",
                    help="also qualify the int8 KV / cross-KV decode levers "
                         "through the cb-whisper path (needs "
                         "--cbwhisper_config)")
    ap.add_argument("--decode_levers", default="kv,xkv,kv+xkv",
                    help="comma list from {kv, xkv, kv+xkv, kv+stg, "
                         "kv+xkv+stg} (stg = staged cache writes, W=16)")
    ap.add_argument("--efficient_config", help="paper-2 (efficient_kws) YAML "
                    "for cascade-retrieval validation")
    ap.add_argument("--efficient_ckpt", help="paper-2 checkpoint "
                    "(dir or Lightning .ckpt; overrides ckpt_path)")
    ap.add_argument("--shortlist", type=int, default=2048,
                    help="cascade top-K (rounded down to a chunk multiple; "
                         "values below one chunk round UP to a single chunk)")
    ap.add_argument("--cascade_chunk", type=int, default=32)
    ap.add_argument("--max_utts", type=int, default=None)
    ap.add_argument("--calibration_batches", type=int, default=4)
    ap.add_argument("--out", help="also write the JSON report here")
    args = ap.parse_args(argv)

    from enhance_cb_whisper_tpu.runtime.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    placeholders = _parse_sets(args.sets)
    report = {}
    if args.kws_config:
        report["kws"] = validate_kws(
            args.kws_config, args.ckpt, placeholders,
            args.max_utts, args.calibration_batches,
        )
    if args.encoder_ckpt and args.audio:
        lo, hi = (int(x) for x in args.layer_slice.split(","))
        report["encoder"] = validate_encoder(
            args.encoder_ckpt, args.audio, args.max_utts, args.compute_dtype,
            layer_slice=(lo, hi),
        )
    if args.cbwhisper_config:
        report["entity_recall"] = validate_entity_recall(
            args.cbwhisper_config, args.cb_ckpt, placeholders
        )
    if args.decode_int8:
        assert args.cbwhisper_config, "--decode_int8 needs --cbwhisper_config"
        report["decode"] = validate_decode(
            args.cbwhisper_config, args.cb_ckpt, placeholders,
            levers=[x for x in args.decode_levers.split(",") if x],
        )
    if args.efficient_config:
        report["cascade"] = validate_cascade(
            args.efficient_config, args.efficient_ckpt, placeholders,
            args.shortlist, args.max_utts, chunk=args.cascade_chunk,
        )
    if not report:
        ap.error("nothing to do: pass --kws_config, --encoder_ckpt+--audio, "
                 "--cbwhisper_config, or --efficient_config")
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return report


if __name__ == "__main__":
    main()
