"""Paper-1 KWS engine: fit / validate / test over the batched catalog path.

Drives what Lightning's Trainer + KWSModel hooks do in the reference:

* ``fit``  — epoch loop over the sampler-driven train loader, one jitted
  train step per batch, StepLR at epoch boundaries, suppression/beta
  schedule prints (model.py:95-107), per-epoch validation, three
  best-checkpoints + final, early stopping (run_CLI.py:17-21);
* ``validate`` — per validation dataset: score every utterance against the
  whole keyword catalog in one device launch, then P/R/F1 at threshold 0.5
  from the PR curve, per-dataloader + averaged + zh/en aggregates
  (model.py:236-307);
* ``test``  — same scoring + speaker-conditioned 1000-bootstrap CIs printed
  as a pandas-style table (model.py:347-432).

Utterance frame counts vary, so utterance stacks are padded into shape
buckets; the width-resize weight matrix is zero-padded alongside, making
padding mathematically invisible (weights of pad columns are 0).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..catalog.database import device_put_catalog, make_catalog_score_fn
from ..metrics import evaluate_with_conf_int, prf_at_threshold
from ..models.kws import KWSModel
from ..models.resnet import ResNetConfig
from ..ops.resize import resize_matrix
from ..train.kws_train import (
    KWSTrainConfig,
    init_train_state,
    make_train_step,
    update_epoch_lr,
)
from .checkpoint import CheckpointManager, EarlyStopping
from .logging import MetricsLogger


def _bucket(n: int, step: int = 128, lo: int = 128) -> int:
    return max(lo, ((n + step - 1) // step) * step)


class KWSEngine:
    def __init__(
        self,
        config: KWSTrainConfig,
        resnet_config: Optional[ResNetConfig] = None,
        features_size: Tuple[int, int] = (150, 750),
        seed: int = 123,
        ckpt_dir: str = "checkpoints/kws",
        logger: Optional[MetricsLogger] = None,
    ):
        self.config = config
        self.resnet_config = resnet_config or ResNetConfig(num_channels=12, num_labels=2)
        self.features_size = tuple(features_size)
        self.seed = seed
        self.ckpt_dir = ckpt_dir
        self.logger = logger or MetricsLogger()

        self.kws = KWSModel(self.resnet_config)

        def kws_apply(variables, images):
            return self.kws.apply(variables, images).logits

        self._score_fn = make_catalog_score_fn(
            kws_apply, out_size=self.features_size, chunk=8
        )
        # batched variant: map the whole-catalog scorer over an utterance axis
        self._batched_score_fn = jax.jit(
            jax.vmap(self._score_fn, in_axes=(None, None, 0, 0))
        )
        self._catalog_cache: Dict[int, Any] = {}
        self.eval_batch_size = 8  # utterances per eval launch (same bucket)

    def enable_int8_scoring(self, variables, dataset, utt_hs: np.ndarray = None,
                            calibration_batches: int = 4):
        """Switch the engine's catalog scoring to int8 quantized inference
        (models/quant.py: BN-fold + per-channel weights + static activation
        scales — 1.34x over bf16 on v5e, BASELINE.md).  Calibrates on real
        similarity maps of ``calibration_batches`` test utterances vs the
        catalog's first keywords (scales are maxes, so more utterances only
        widen them — the one-sample-clipping guard, docs/PERF.md flip-rate
        study); an explicit ``utt_hs`` ([L, T, D] stack) calibrates on that
        single utterance instead.  Returns the device-resident quantized
        pytree — pass it as ``variables`` to every subsequent ``score_*`` /
        eval call.  Threshold/argmax decision parity with the fp32 scorer
        is tested (tests/test_quant.py); training/validation paths are
        unaffected unless handed the quantized pytree."""
        from ..catalog.database import calibration_sim_maps_multi
        from ..models.quant import (
            calibrate_act_scales,
            make_quantized_kws_apply,
            quantize_resnet_classifier,
        )

        if utt_hs is not None:
            utts = [np.asarray(utt_hs)]
        else:
            utts = [
                np.asarray(dataset[i]["utt_hs"])
                for i in range(min(calibration_batches, len(dataset)))
            ]
        qparams = quantize_resnet_classifier(variables, self.resnet_config)
        maps = calibration_sim_maps_multi(dataset.catalog, utts, self.features_size)
        scales = calibrate_act_scales(self.resnet_config, qparams, maps)["act_scales"]
        q_apply = make_quantized_kws_apply(self.resnet_config, act_scales=scales)
        # kept SEPARATE from the fp32 scorer: scoring dispatches on the
        # variables pytree, so validate()/fit() handed fp32 variables keep
        # working after int8 is enabled
        self._score_fn_int8 = make_catalog_score_fn(
            q_apply, out_size=self.features_size, chunk=8
        )
        self._batched_int8 = jax.jit(
            jax.vmap(self._score_fn_int8, in_axes=(None, None, 0, 0))
        )
        return jax.device_put(qparams)

    def _pick_score_fns(self, variables):
        """fp32 variables are {'params', 'batch_stats'}; the quantized
        pytree has neither — dispatch per call."""
        if getattr(self, "_batched_int8", None) is not None and (
            not isinstance(variables, dict) or "params" not in variables
        ):
            return self._score_fn_int8, self._batched_int8
        return self._score_fn, self._batched_score_fn

    # ------------------------------------------------------------------ state

    def init_state(self, sample_shape=None):
        # the training models honor config.channels_last (NHWC inputs);
        # the collators always emit NCHW, so fit() transposes per batch
        default = (
            (*self.features_size, self.resnet_config.num_channels)
            if self.config.channels_last
            else (self.resnet_config.num_channels, *self.features_size)
        )
        shape = sample_shape or default
        rng = jax.random.PRNGKey(self.seed)
        state, (kws, disc, tx) = init_train_state(rng, self.config, self.resnet_config, shape)
        self._models = (kws, disc, tx)
        return state

    def variables(self, state) -> dict:
        return {"params": state.params["kws"], "batch_stats": state.batch_stats["kws"]}

    # ------------------------------------------------------------------- eval

    def _catalog_dev(self, dataset):
        # keyed by id() BUT holding the dataset alongside: a bare-id key can
        # be reused by CPython after the dataset is GC'd, silently serving a
        # stale device catalog to a different dataset
        key = id(dataset)
        hit = self._catalog_cache.get(key)
        if hit is None or hit[0] is not dataset:
            hit = (dataset, device_put_catalog(
                dataset.catalog, out_h=self.features_size[0], chunk=8
            ))
            self._catalog_cache[key] = hit
        return hit[1]

    def _pad_utt(self, utt_hs: np.ndarray):
        t_u = utt_hs.shape[1]
        t_pad = _bucket(t_u)
        utt = np.zeros((utt_hs.shape[0], t_pad, utt_hs.shape[2]), np.float32)
        utt[:, :t_u] = utt_hs
        w = np.zeros((self.features_size[1], t_pad), np.float32)
        w[:, :t_u] = resize_matrix(t_u, self.features_size[1], antialias=False)
        return utt, w

    def score_utterance(self, variables, dataset, utt_hs: np.ndarray):
        """Probabilities + logits for every catalog keyword vs one utterance."""
        catalog_dev = self._catalog_dev(dataset)
        utt, w = self._pad_utt(utt_hs)
        score_fn, _ = self._pick_score_fns(variables)
        probs, logits = score_fn(
            variables, catalog_dev, jnp.asarray(utt), jnp.asarray(w)
        )
        n = dataset.catalog.num_keywords
        return np.asarray(probs)[:n], np.asarray(logits)[:n]

    def score_utterances(self, variables, dataset, utt_hs_list, defer: bool = False):
        """One launch scoring SEVERAL utterances against the whole catalog
        (vmapped over the utterance axis; utterances must share a frame
        bucket, which :meth:`_eval_dataset` arranges).  ``defer=True``
        returns the device arrays without the host fetch so several
        launches can stay in flight (each fetch through the relay costs a
        ~30 ms round-trip)."""
        catalog_dev = self._catalog_dev(dataset)
        padded = [self._pad_utt(u) for u in utt_hs_list]
        utt = jnp.asarray(np.stack([p[0] for p in padded]))
        w = jnp.asarray(np.stack([p[1] for p in padded]))
        _, batched = self._pick_score_fns(variables)
        probs, logits = batched(variables, catalog_dev, utt, w)
        if defer:
            return probs, logits
        n = dataset.catalog.num_keywords
        return np.asarray(probs)[:, :n], np.asarray(logits)[:, :n]

    @staticmethod
    def _ce(logits: np.ndarray, labels: np.ndarray) -> float:
        logits = logits - logits.max(axis=-1, keepdims=True)
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        return float(-logp[np.arange(len(labels)), labels].mean())

    def _eval_dataset(self, variables, dataset):
        from ..audio.prefetch import prefetch

        n_items = len(dataset)
        preds = [None] * n_items
        targets = [None] * n_items
        speakers = [None] * n_items
        losses = [0.0] * n_items
        group = dataset.catalog.group_size

        def _finish(idx, item, probs, logits):
            labels = np.asarray(item["hotword_labels"])
            # per-group CE sum, mirroring the reference's group loop loss
            losses[idx] = sum(
                self._ce(logits[lo : lo + group], labels[lo : lo + group])
                for lo in range(0, len(labels), group)
            )
            preds[idx] = probs * item["hotword_mask"]
            targets[idx] = labels
            speakers[idx] = item.get("speaker")

        # host-side cache loads overlap with device scoring (prefetch);
        # utterances sharing a frame bucket are scored several per launch;
        # launches stay in flight (deferred fetches, depth 2) so the relay
        # round-trip overlaps device compute
        pending: Dict[int, list] = {}
        in_flight: list = []
        n_kw = dataset.catalog.num_keywords

        def _drain(target_depth: int):
            while len(in_flight) > target_depth:
                batch, probs_d, logits_d = in_flight.pop(0)
                probs_b = np.asarray(probs_d)[:, :n_kw]
                logits_b = np.asarray(logits_d)[:, :n_kw]
                for row, (idx, item) in enumerate(batch):
                    _finish(idx, item, probs_b[row], logits_b[row])

        def _flush(bucket):
            batch = pending.pop(bucket)
            utts = [it["utt_hs"] for _, it in batch]
            # pad partial batches by repetition so every launch shares one
            # compiled shape (extra rows discarded)
            while len(utts) < self.eval_batch_size:
                utts.append(utts[-1])
            probs_d, logits_d = self.score_utterances(
                variables, dataset, utts, defer=True
            )
            in_flight.append((batch, probs_d, logits_d))
            _drain(2)

        items = prefetch(((i, dataset[i]) for i in range(n_items)), depth=2)
        for idx, item in items:
            bucket = _bucket(item["utt_hs"].shape[1])
            pending.setdefault(bucket, []).append((idx, item))
            if len(pending[bucket]) == self.eval_batch_size:
                _flush(bucket)
        for bucket in list(pending):
            _flush(bucket)
        _drain(0)

        return (
            np.concatenate(preds),
            np.concatenate(targets),
            speakers,
            float(np.mean(losses)),
        )

    def validate(self, variables, datamodule) -> Dict[str, float]:
        datasets = list(datamodule.val_dataset.values())
        avg = {k: 0.0 for k in ("val/loss", "metrics/precision", "metrics/recall", "metrics/f1")}
        zh = {k + "_zh": 0.0 for k in avg}
        en = {k + "_en": 0.0 for k in avg}
        out: Dict[str, float] = {}
        n = len(datasets)
        for i, dataset in enumerate(datasets):
            preds, targets, _, loss = self._eval_dataset(variables, dataset)
            p, r, f1 = prf_at_threshold(preds, targets, 0.5)
            metrics = {
                f"val/loss_{i}": loss,
                f"metrics/precision_{i}": p,
                f"metrics/recall_{i}": r,
                f"metrics/f1_{i}": f1,
            }
            out.update(metrics)
            for key in avg:
                avg[key] += metrics[f"{key}_{i}"] / n
                if i in (0, 1):
                    zh[key + "_zh"] += metrics[f"{key}_{i}"] / 2
                elif i in (2, 3):
                    en[key + "_en"] += metrics[f"{key}_{i}"] / 2
        out.update(avg)
        if n >= 2:
            out.update(zh)
        if n >= 4:
            out.update(en)
        return out

    def test(self, variables, datamodule) -> Dict[str, float]:
        datamodule.setup("test")
        dataset = datamodule.test_dataset
        preds, targets, speakers, _ = self._eval_dataset(variables, dataset)
        speaker2id = {s: i for i, s in enumerate(set(speakers))}
        conditions = np.asarray(
            [
                speaker2id[s]
                for s, n in zip(speakers, [dataset.catalog.num_keywords] * len(speakers))
                for _ in range(n)
            ]
        )

        def at_threshold(which):
            def f(labels, samples, samples2=None):
                p, r, f1 = prf_at_threshold(samples, labels, 0.5)
                return {"p": p, "r": r, "f1": f1}[which]

            return f

        results = {}
        for name, which in (("Precision", "p"), ("Recall", "r"), ("F1", "f1")):
            center, (lb, ub) = evaluate_with_conf_int(
                preds, at_threshold(which), targets, conditions, num_bootstraps=1000, alpha=5
            )
            results[name] = center
            results[f"{name}_LB"] = lb
            results[f"{name}_UB"] = ub

        try:
            import pandas as pd

            print(pd.DataFrame([results]))
        except ImportError:
            print(results)
        return results

    # -------------------------------------------------------------------- fit

    def fit(
        self,
        datamodule,
        max_epochs: int = 100,
        check_val_every_n_epoch: int = 1,
        early_stopping: Optional[EarlyStopping] = None,
        monitors: Optional[Dict[str, str]] = None,
        limit_train_batches: Optional[int] = None,
        resume_from: Optional[str] = None,
    ):
        datamodule.setup("fit")
        state = self.init_state()
        start_epoch = 0
        if resume_from is not None:  # Lightning's ckpt_path resume
            from .checkpoint import load_checkpoint

            # older checkpoints lack opt_state/global_step — probe first
            raw, _ = load_checkpoint(resume_from)
            template = {"params": state.params, "batch_stats": state.batch_stats,
                        "epoch": 0}
            if "opt_state" in raw:
                template["opt_state"] = state.opt_state
            if "global_step" in raw:
                template["global_step"] = 0
            ckpt, meta = load_checkpoint(resume_from, template=template)
            state.params = ckpt["params"]
            state.batch_stats = ckpt["batch_stats"]
            if "opt_state" in ckpt:
                # Lightning's ckpt_path resume restores the optimizer too;
                # restarting Adam moments from zero mid-run spikes the loss
                state.opt_state = ckpt["opt_state"]
            start_epoch = int(ckpt.get("epoch", meta.get("epoch", -1))) + 1
            resume_step = int(ckpt.get("global_step", 0))
            print(f"resumed from {resume_from} at epoch {start_epoch}")
        kws, disc, tx = self._models
        step_fn = make_train_step(self.config, kws, disc, tx)
        manager = CheckpointManager(
            self.ckpt_dir,
            monitors or {"f1_checkpoint": "metrics/f1:max"},
            hparams=dataclasses.asdict(self.config),
        )
        rng = jax.random.PRNGKey(self.seed + 1)
        params, stats, opt_state = state.params, state.batch_stats, state.opt_state

        global_step = 0
        if resume_from is not None:
            # continue the step counter (per-batch fold_in keys and logged
            # metric steps must not replay the pre-crash series) and the
            # best-by-monitor values (or the first post-resume validation
            # would overwrite a better checkpoint)
            global_step = resume_step
            restored_best = manager.restore_best()
            if restored_best:
                print(f"restored checkpoint bests: {restored_best}")
        for epoch in range(start_epoch, max_epochs):
            state.epoch = epoch
            opt_state = update_epoch_lr(self.config, state, opt_state)
            if self.config.adversarial_training or self.config.entropy:
                print(f"supression={self.config.suppression(epoch):.2f}")
            if self.config.adversarial_training:
                print(f"beta={self.config.beta(epoch):.2f}")

            metrics = None
            # overlap host batch prep (disk loads, sims/resize or raw
            # padding in the collator) with the in-flight device step —
            # async dispatch means step_fn returns before the device
            # finishes, so the worker thread builds batch N+1 while the
            # TPU trains on batch N
            from ..audio.prefetch import prefetch

            loader = prefetch(datamodule.train_dataloader(), depth=2)
            for b_idx, batch in enumerate(loader):
                if limit_train_batches is not None and b_idx >= limit_train_batches:
                    loader.close()  # unblock the worker thread
                    break
                arrays = {k: jnp.asarray(v) for k, v in batch.items()}
                if self.config.channels_last and "features" in arrays:
                    # collators emit NCHW; the channels_last models take
                    # NHWC (raw device_features batches transpose in-step)
                    arrays["features"] = jnp.transpose(
                        arrays["features"], (0, 2, 3, 1)
                    )
                params, stats, opt_state, metrics = step_fn(
                    params,
                    stats,
                    opt_state,
                    arrays,
                    jax.random.fold_in(rng, global_step),
                    self.config.beta(epoch),
                    self.config.suppression(epoch),
                )
                global_step += 1
            if metrics is not None:  # an epoch can train zero batches
                self.logger.log_metrics(
                    {"train/class_loss": float(metrics["class_loss"])},
                    step=global_step, epoch=epoch,
                )

            state = dataclasses.replace(state, params=params, batch_stats=stats,
                                        opt_state=opt_state, epoch=epoch)
            if (epoch + 1) % check_val_every_n_epoch == 0 and datamodule.val_dataset:
                self._catalog_cache.clear()
                val_metrics = self.validate(self.variables(state), datamodule)
                self.logger.log_metrics(val_metrics, step=global_step, epoch=epoch)
                saved = manager.step(epoch, val_metrics,
                             {"params": params, "batch_stats": stats,
                              "epoch": epoch, "opt_state": opt_state,
                              "global_step": global_step})
                if self.logger.log_model:
                    for p in saved:
                        self.logger.log_artifact(p)
                if early_stopping is not None and early_stopping.step(val_metrics):
                    print(f"early stopping at epoch {epoch}")
                    break
            else:
                # keep the SAME payload as the val branch — resuming from a
                # 'final' written here must also restore optimizer + step
                saved = manager.step(epoch, {}, {"params": params,
                                                 "batch_stats": stats,
                                                 "epoch": epoch,
                                                 "opt_state": opt_state,
                                                 "global_step": global_step})
                if self.logger.log_model:
                    for p in saved:
                        self.logger.log_artifact(p)
        return state
