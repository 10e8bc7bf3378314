"""Paper-2 engine: train / validate / test for the L/LE/LEF models.

Drives what Lightning does around ``efficient_kws.KWSModel``:

* training (model.py:226-296): CE on raw-embedding batches (ghost keywords
  labeled -100), tts/natural coin flip for ``kw_type='all'``; AdamW with
  separate param groups for the ResNet vs the projectors
  (``learning_rate`` / ``learning_rate_sru``) + cosine annealing
  (model.py:684-740);
* validation (model.py:304-667): per (language x kw_type) dataloader, per
  utterance, per group-of-50 scoring; best-F operating point via
  ``5PR/(4P+R)`` search; recall@{1,10,20,50,100,200}; per-language
  aggregates; ``prcurve_{i}.json`` + ``thresdict.json`` dumps next to the
  checkpoint dir;
* test (model.py:748-929): P/R/F1 at the configured operating ``threshold``
  with speaker-conditioned bootstrap CIs; ``pr_data_{dataset}.json`` dump.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..metrics import (
    binary_pr_curve,
    evaluate_with_conf_int,
    find_best_threshold_idx,
    operating_point,
    recall_at_k,
)
from ..models.kws import cross_entropy
from ..runtime.checkpoint import CheckpointManager, EarlyStopping
from ..runtime.logging import MetricsLogger
from ..train.optim import cosine_lr, make_adam, make_multi_optimizer, set_learning_rate
from .model import EfficientKWSConfig, EfficientKWSModel

RECALL_KS = (1, 10, 20, 50, 100, 200)


@dataclasses.dataclass(frozen=True)
class EfficientTrainConfig:
    kw_type: str = "tts"
    kw_p: float = 0.5
    learning_rate: float = 1e-4
    learning_rate_sru: float = 1e-4
    weight_decay: float = 0.0
    beta_1: float = 0.9
    beta_2: float = 0.99
    max_epochs: int = 200
    threshold: float = 0.5
    # TPU-serving extension (fp32 stays the reference-parity default):
    # "bfloat16" runs the projection MLP/Conv matmuls and the ResNet at MXU
    # rate with f32 params, BatchNorm state, loss, and optimizer — the
    # paper-1 recipe (train/kws_train.py, docs/PERF.md)
    compute_dtype: str = "float32"


class EfficientKWSEngine:
    def __init__(
        self,
        model_config: EfficientKWSConfig,
        train_config: EfficientTrainConfig = EfficientTrainConfig(),
        seed: int = 123,
        ckpt_dir: str = "checkpoints/efficient_kws",
        logger: Optional[MetricsLogger] = None,
        whisper: Optional[tuple] = None,  # (WhisperConfig, params) — audio mode
        kws_layer_slice: tuple = (10, 22),
        utt_frames_budget: int = 1500,
    ):
        self.model_config = model_config
        self.train_config = train_config
        self.seed = seed
        self.ckpt_dir = ckpt_dir
        self.logger = logger or MetricsLogger()
        self.model = EfficientKWSModel(
            model_config,
            dtype=jnp.dtype(getattr(train_config, "compute_dtype", "float32")
                            or "float32"),
        )

        # audio-mode embedding producer (load_embeddings=False, reference
        # dataset.py:471-492): mel + frozen Whisper encoder run INSIDE the
        # jitted train step, one fused batch — exactly the cache-producing
        # math of pipeline.extract_hidden_states (utils.py:186-195)
        self._embed_utterances = None
        self._whisper_params = None
        if whisper is not None:
            from ..models.whisper import encoder_kws_stack
            from ..ops.mel import log_mel_spectrogram

            wcfg, wparams = whisper
            wparams = jax.tree.map(jnp.asarray, wparams)
            lo, hi = kws_layer_slice
            n_layers = model_config.n_layers
            budget = min(utt_frames_budget, wcfg.max_source_positions)

            # encoder params as an explicit arg (closure capture would
            # embed them as HLO literals — fatal at large-v2 scale through
            # the remote-compile relay; decoding/generate.py)
            def embed(wp, audio, frames):  # [B, S], [B] -> utt, mask
                mel = log_mel_spectrogram(audio, n_mels=wcfg.num_mel_bins)
                stack = encoder_kws_stack(
                    wp, mel, wcfg, layer_slice=(lo, hi), valid_frames=frames
                )
                # layer slice [-n_layers:] + frame budget (dataset.py:543-573)
                utt = jax.lax.stop_gradient(stack[:, -n_layers:, :budget, :])
                t = jnp.arange(budget)
                m = (t[None, :] < jnp.minimum(frames, budget)[:, None]).astype(jnp.float32)
                return utt, jnp.broadcast_to(m[:, None, :], utt.shape[:3])

            embed_jit = jax.jit(embed)
            self._whisper_params = wparams
            self._embed_utterances = lambda audio, frames: embed_jit(
                self._whisper_params, audio, frames
            )
            self._embed_raw = embed  # un-jitted: inlined into the train step

        @jax.jit
        def _score_group(variables, kwd, utt, kwd_mask, utt_mask):
            logits, _ = self.model.apply(
                variables, kwd, utt, kwd_mask=kwd_mask, utt_mask=utt_mask, train=False
            )
            return jax.nn.softmax(logits, -1)[:, 1], logits

        self._score_group = _score_group

    def enable_int8_scoring(self, variables, item=None, items=None):
        """Swap group scoring to int8 quantized ResNet inference
        (models/quant.py; projection stack + similarity einsum stay float).
        Calibrates on real similarity maps — each item's first keyword
        group vs its utterance — over ``items`` (several eval items; the
        one-sample-clipping guard, docs/PERF.md) or a single ``item``.
        The float ``variables`` keep driving the projection, so callers
        pass them unchanged; only the classifier runs quantized.  Decision
        parity is tested (tests/test_efficient_kws_pipeline.py)."""
        import jax.numpy as jnp

        from ..models.quant import (
            calibrate_act_scales,
            make_quantized_kws_apply,
            quantize_efficient_classifier,
        )
        from .model import EfficientKWSModel, masked_sims

        calib_items = list(items) if items is not None else [item]
        assert calib_items and calib_items[0] is not None

        rcfg = self.model.config.resnet_config()
        qparams = quantize_efficient_classifier(variables, rcfg)

        def item_sims(it):
            g = it["groups"][0]
            kwd_p, kwd_mask_p = self.model.apply(
                variables, jnp.asarray(g["kwd"]), jnp.asarray(g["kwd_mask"]),
                train=False, method=EfficientKWSModel.project,
            )
            utt_p, utt_mask_p = self.model.apply(
                variables, jnp.asarray(it["utt"][None]), jnp.asarray(it["utt_mask"][None]),
                train=False, method=EfficientKWSModel.project,
            )
            return masked_sims(kwd_p, utt_p, kwd_mask_p, utt_mask_p)

        sims = jnp.concatenate([item_sims(it) for it in calib_items])
        scales = calibrate_act_scales(rcfg, qparams, sims)["act_scales"]
        q_apply = make_quantized_kws_apply(rcfg, act_scales=scales)
        q_dev = jax.device_put(qparams)
        model = self.model

        @jax.jit
        def _score_group_q(variables, kwd, utt, kwd_mask, utt_mask):
            kwd_p, kwd_mask_p = model.apply(
                variables, kwd, kwd_mask, train=False, method=EfficientKWSModel.project
            )
            utt_p, utt_mask_p = model.apply(
                variables, utt, utt_mask, train=False, method=EfficientKWSModel.project
            )
            sims = masked_sims(kwd_p, utt_p, kwd_mask_p, utt_mask_p)
            logits = q_apply(q_dev, sims)
            return jax.nn.softmax(logits, -1)[:, 1], logits

        self._score_group = _score_group_q

    # ----------------------------------------------------------------- init

    def init_state(self, sample: Dict[str, np.ndarray]):
        rng = jax.random.PRNGKey(self.seed)
        if "utt_features" not in sample:
            # only the SHAPES matter for model.init — eval_shape traces the
            # embed without compiling it (the batch-1 mel+encoder program is
            # multi-minute through the remote-compile relay and would be
            # compiled purely to be thrown away)
            structs = jax.eval_shape(
                self._embed_raw, self._whisper_params,
                sample["utt_audio"][:1], sample["utt_frames"][:1],
            )
            utt, utt_mask = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), structs
            )
        else:
            utt, utt_mask = sample["utt_features"][:1], sample["utt_mask"][:1]
        variables = self.model.init(
            rng,
            sample["kwd_features"][:1],
            utt,
            sample["kwd_mask"][:1],
            utt_mask,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        tc = self.train_config
        if self.model_config.proj_mlp:
            def label_fn(p):
                return {
                    k: jax.tree.map(
                        lambda _: "proj" if k in ("projector", "time_projector") else "resnet", v
                    )
                    for k, v in p.items()
                }

            tx = make_multi_optimizer(
                label_fn(params),
                {
                    "resnet": make_adam(tc.learning_rate, tc.beta_1, tc.beta_2,
                                        tc.weight_decay, adamw=True),
                    "proj": make_adam(tc.learning_rate_sru, tc.beta_1, tc.beta_2,
                                      tc.weight_decay, adamw=True),
                },
            )
        else:
            tx = make_adam(tc.learning_rate, tc.beta_1, tc.beta_2, tc.weight_decay, adamw=True)
        opt_state = tx.init(params)
        self._tx = tx
        return params, batch_stats, opt_state

    def variables(self, params, batch_stats):
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        return v

    def update_epoch_lr(self, opt_state, epoch: int):
        tc = self.train_config
        if self.model_config.proj_mlp:
            set_learning_rate(
                opt_state.inner_states["resnet"].inner_state,
                cosine_lr(tc.learning_rate, tc.max_epochs)(epoch),
            )
            set_learning_rate(
                opt_state.inner_states["proj"].inner_state,
                cosine_lr(tc.learning_rate_sru, tc.max_epochs)(epoch),
            )
        else:
            set_learning_rate(opt_state, cosine_lr(tc.learning_rate, tc.max_epochs)(epoch))
        return opt_state

    # ------------------------------------------------------------ train step

    def make_train_step(self):
        config = self.train_config
        model = self.model
        tx = self._tx

        def loss_fn(params, batch_stats, batch, train=True):
            # the ResNet (and LEF's Conv1d stack) carry BatchNorm stats
            (logits, _), updated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["kwd_features"], batch["utt_features"],
                kwd_mask=batch["kwd_mask"], utt_mask=batch["utt_mask"],
                train=True, mutable=["batch_stats"],
            )
            loss = cross_entropy(logits, batch["labels"])
            return loss, updated["batch_stats"]

        embed_raw = getattr(self, "_embed_raw", None)

        @jax.jit
        def step(params, batch_stats, opt_state, batch, rng, wp=None):
            # ``wp`` = frozen whisper-encoder params for audio mode, passed
            # explicitly (closure capture would bake them into the program
            # as HLO literals — decoding/generate.py)
            if config.kw_type == "all":
                half = batch["labels"].shape[0] // 2
                pick = jax.random.bernoulli(rng, 1.0 - config.kw_p, (half,)).astype(jnp.int32)
                sel = 2 * jnp.arange(half) + (1 - pick)
                batch = {k: v[sel] for k, v in batch.items()}
            if "utt_audio" in batch:
                # audio mode: fused mel + frozen encoder inside the step
                batch = dict(batch)
                utt, utt_mask = embed_raw(wp, batch.pop("utt_audio"), batch.pop("utt_frames"))
                batch["utt_features"], batch["utt_mask"] = utt, utt_mask
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, batch
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, {"loss": loss}

        def run_step(params, batch_stats, opt_state, batch, rng):
            wp = self._whisper_params if "utt_audio" in batch else None
            return step(params, batch_stats, opt_state, batch, rng, wp)

        return run_step

    # ------------------------------------------------------------------ eval

    def _eval_dataset(self, variables, dataset):
        from ..audio.prefetch import prefetch

        preds, targets, losses = [], [], []
        recalls = {k: [] for k in RECALL_KS}
        speakers = []
        cat_cache = {}
        in_flight = []

        def _finish(item, p, lg):
            probs = np.asarray(p) * np.asarray(item["hotword_mask"])
            logits = np.asarray(lg)
            labels = np.asarray(item["hotword_labels"])
            losses.append(
                sum(
                    self._ce(logits[lo : lo + dataset.keywords_per_group],
                             labels[lo : lo + dataset.keywords_per_group])
                    for lo in range(0, len(labels), dataset.keywords_per_group)
                )
            )
            preds.append(probs)
            targets.append(labels)
            speakers.append(item.get("speaker"))
            for k in RECALL_KS:
                r = recall_at_k(probs, labels, k)
                if r >= 0:
                    recalls[k].append(r)

        def _drain(target_depth):
            while len(in_flight) > target_depth:
                _finish(*in_flight.pop(0))

        for item in prefetch((dataset[i] for i in range(len(dataset))), depth=2):
            utt = item["utt"][None]
            utt_mask = item["utt_mask"][None]
            # the whole keyword DB in ONE launch: groups are pre-padded to a
            # common frame budget, so they concatenate into a single batch
            # (the reference loops groups of 50, model.py:319-345)
            if not cat_cache:
                kwd = np.concatenate([g["kwd"] for g in item["groups"]])
                km = np.concatenate([g["kwd_mask"] for g in item["groups"]])
                cat_cache["kwd"] = jnp.asarray(kwd)
                cat_cache["kwd_mask"] = jnp.asarray(km)
            p, lg = self._score_group(
                variables, cat_cache["kwd"], jnp.asarray(utt),
                cat_cache["kwd_mask"], jnp.asarray(utt_mask),
            )
            # results drain two launches behind so the host fetch's relay
            # round-trip overlaps the next utterance's device scoring
            in_flight.append((item, p, lg))
            _drain(2)
        _drain(0)
        return preds, targets, speakers, float(np.mean(losses)), recalls

    @staticmethod
    def _ce(logits, labels):
        logits = logits - logits.max(-1, keepdims=True)
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        return float(-logp[np.arange(len(labels)), labels].mean())

    def validate(self, variables, datamodule, dump_dir: Optional[str] = None) -> Dict[str, float]:
        datasets = list(datamodule.val_dataset.values())
        n_loaders = len(datasets)
        is_expanded = any(ds.is_expanded() for ds in datasets)
        n_languages = max(1, n_loaders // (4 if is_expanded else 2))
        if n_loaders == 1:
            n_languages = 1

        out: Dict[str, float] = {}
        avg_keys = (
            "metrics/loss", "metrics/precision", "metrics/recall", "metrics/f1",
            "metrics/recall_at_10", "val/recall_at_1", "val/recall_at_20",
            "val/recall_at_50", "val/recall_at_100", "val/recall_at_200",
        )
        avg = {k: 0.0 for k in avg_keys}
        lang = {l: {k: 0.0 for k in avg_keys} for l in range(n_languages)}
        best_thresholds: List[float] = []

        for i, dataset in enumerate(datasets):
            if dataset.is_expanded():
                continue
            preds, targets, _, loss, recalls = self._eval_dataset(variables, dataset)
            flat_p = np.concatenate(preds)
            flat_t = np.concatenate(targets)
            precision, recall, thresholds = binary_pr_curve(flat_p, flat_t)
            bi = find_best_threshold_idx(precision, recall)
            best_thresholds.append(
                float(thresholds[min(bi, len(thresholds) - 1)]) if len(thresholds) else 0.0
            )
            p, r = float(precision[bi]), float(recall[bi])
            f1 = 2 * p * r / (p + r) if (p and r) else 0.0
            metrics = {
                f"metrics/loss_{i}": loss,
                f"metrics/precision_{i}": p,
                f"metrics/recall_{i}": r,
                f"metrics/f1_{i}": f1,
                f"metrics/recall_at_10_{i}": float(np.mean(recalls[10])) if recalls[10] else 0.0,
            }
            for k in RECALL_KS:
                if k != 10:
                    metrics[f"val/recall_at_{k}_{i}"] = (
                        float(np.mean(recalls[k])) if recalls[k] else 0.0
                    )
            out.update(metrics)

            div = n_loaders // 2 if is_expanded else n_loaders
            div = 1 if n_loaders == 1 else div
            # NOTE: non-expanded lang_div=4 although only 2 loaders
            # contribute per language — the reference divides by 4 here
            # (model.py:625-632), halving its own per-language numbers;
            # reproduced faithfully, do not "fix"
            lang_div = 2 if is_expanded else 4
            lang_div = 1 if n_loaders == 1 else lang_div
            l_idx = (i // 2 // 2) if is_expanded else (i // 2)
            l_idx = min(l_idx, n_languages - 1)
            for key in avg_keys:
                mk = f"{key}_{i}"
                if mk in metrics:
                    avg[key] += metrics[mk] / div
                    lang[l_idx][key] += metrics[mk] / lang_div

            if dump_dir is not None:
                os.makedirs(dump_dir, exist_ok=True)
                with open(os.path.join(dump_dir, f"prcurve_{i}.json"), "w") as f:
                    json.dump(
                        {
                            "precision": precision.tolist(),
                            "recall": recall.tolist(),
                            "thresholds": thresholds.tolist(),
                        },
                        f,
                    )

        out.update(avg)
        for l, metrics in lang.items():
            out.update({f"{k}_l{l}": v for k, v in metrics.items()})
        if dump_dir is not None:
            with open(os.path.join(dump_dir, "thresdict.json"), "w") as f:
                json.dump(best_thresholds, f)
        return out

    def test(self, variables, datamodule, dump_dir: Optional[str] = None,
             num_bootstraps: int = 1000) -> Dict[str, float]:
        datamodule.setup("test")
        dataset = datamodule.test_dataset
        preds, targets, speakers, _, _ = self._eval_dataset(variables, dataset)
        flat_p = np.concatenate(preds)
        flat_t = np.concatenate(targets)
        conditions = None
        if speakers[0] is not None:
            speaker2id = {s: i for i, s in enumerate(set(speakers))}
            conditions = np.asarray(
                [speaker2id[s] for s, p in zip(speakers, preds) for _ in range(len(p))]
            )

        threshold = self.model_config.threshold

        def metric(which):
            def f(labels, samples, samples2=None):
                precision, recall, thresholds = binary_pr_curve(samples, labels)
                p, r = operating_point(precision, recall, thresholds, threshold)
                if which == "p":
                    return p
                if which == "r":
                    return r
                return 2 * p * r / (p + r) if (p and r) else 0.0

            return f

        results = {}
        for name, which in (("Precision", "p"), ("Recall", "r"), ("F1", "f1")):
            center, (lb, ub) = evaluate_with_conf_int(
                flat_p, metric(which), flat_t, conditions,
                num_bootstraps=num_bootstraps, alpha=5,
            )
            results[name] = center
            results[f"{name}_LB"] = lb
            results[f"{name}_UB"] = ub

        try:
            import pandas as pd

            print(pd.DataFrame([results]))
        except ImportError:
            print(results)

        if dump_dir is not None:
            precision, recall, thresholds = binary_pr_curve(flat_p, flat_t)
            name = (
                "pr_data_acl6060.json"
                if "ACL6060" in getattr(dataset, "root", "")
                else "pr_data_aishell.json"
            )
            os.makedirs(dump_dir, exist_ok=True)
            with open(os.path.join(dump_dir, name), "w") as f:
                json.dump(
                    {
                        "precision": precision.tolist(),
                        "recall": recall.tolist(),
                        "thresholds": thresholds.tolist(),
                    },
                    f,
                )
        return results

    # -------------------------------------------------------------------- fit

    def fit(self, datamodule, max_epochs: Optional[int] = None,
            early_stopping: Optional[EarlyStopping] = None,
            monitors: Optional[Dict[str, str]] = None,
            limit_train_batches: Optional[int] = None,
            resume_from: Optional[str] = None):
        datamodule.setup("fit")
        max_epochs = max_epochs or self.train_config.max_epochs

        loader = datamodule.train_dataloader()
        sample = next(iter(loader))
        params, batch_stats, opt_state = self.init_state(sample)
        start_epoch, resume_step = 0, 0
        if resume_from is not None:  # Lightning's ckpt_path resume
            from ..runtime.checkpoint import load_checkpoint

            raw, _ = load_checkpoint(resume_from)
            template = {"params": params, "batch_stats": batch_stats,
                        "epoch": 0}
            if "opt_state" in raw:
                template["opt_state"] = opt_state
            if "global_step" in raw:
                template["global_step"] = 0
            ckpt, meta = load_checkpoint(resume_from, template=template)
            params, batch_stats = ckpt["params"], ckpt["batch_stats"]
            if "opt_state" in ckpt:
                opt_state = ckpt["opt_state"]
            start_epoch = int(ckpt.get("epoch", meta.get("epoch", -1))) + 1
            resume_step = int(ckpt.get("global_step", 0))
            print(f"resumed from {resume_from} at epoch {start_epoch}")
        step_fn = self.make_train_step()
        manager = CheckpointManager(
            self.ckpt_dir,
            monitors or {
                "f1_checkpoint": "metrics/f1:max",
                "f1_l4_checkpoint": "metrics/f1_l4:max",
            },
            hparams={
                **dataclasses.asdict(self.train_config),
                **dataclasses.asdict(self.model_config),
            },
        )
        rng = jax.random.PRNGKey(self.seed + 1)

        global_step = resume_step
        if resume_from is not None:
            restored_best = manager.restore_best()
            if restored_best:
                print(f"restored checkpoint bests: {restored_best}")
        for epoch in range(start_epoch, max_epochs):
            opt_state = self.update_epoch_lr(opt_state, epoch)
            metrics = None
            for b_idx, batch in enumerate(datamodule.train_dataloader()):
                if limit_train_batches is not None and b_idx >= limit_train_batches:
                    break
                params, batch_stats, opt_state, metrics = step_fn(
                    params, batch_stats, opt_state,
                    {k: jnp.asarray(v) for k, v in batch.items()},
                    jax.random.fold_in(rng, global_step),
                )
                global_step += 1
            if metrics is not None:  # an epoch can train zero batches
                self.logger.log_metrics({"train/loss": float(metrics["loss"])},
                                        step=global_step, epoch=epoch)
            if getattr(datamodule, "val_dataset", None):
                val = self.validate(self.variables(params, batch_stats), datamodule,
                                    dump_dir=self.ckpt_dir)
                self.logger.log_metrics(val, step=global_step, epoch=epoch)
                saved = manager.step(epoch, val, {"params": params, "batch_stats": batch_stats,
                                                  "epoch": epoch, "opt_state": opt_state,
                                                  "global_step": global_step})
                if self.logger.log_model:
                    for p in saved:
                        self.logger.log_artifact(p)
                if early_stopping is not None and early_stopping.step(val):
                    print(f"early stopping at epoch {epoch}")
                    break
            else:
                saved = manager.step(epoch, {}, {"params": params, "batch_stats": batch_stats,
                                                 "epoch": epoch, "opt_state": opt_state,
                                                 "global_step": global_step})
                if self.logger.log_model:
                    for p in saved:
                        self.logger.log_artifact(p)
        return params, batch_stats
