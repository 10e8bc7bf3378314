"""Paper-1 KWS training step: plain CE, DANN adversarial, DANNCE, entropy.

Functional re-implementation of ``KWSModel.training_step`` + DANNCE
(src/model/model.py:95-228, src/model/dannce.py:6-72) as ONE jitted step:

* ``kw_type='all'``: per adjacent (tts, natural) pair a coin flip keeps
  exactly one example (model.py:120-127) — expressed as a static-shape
  gather, not boolean indexing;
* gradient accumulation: the reference's manual minibatch loop backwards a
  summed loss per minibatch; here a ``lax.scan`` over minibatches sums
  gradients (and threads BatchNorm stats sequentially, like torch);
* adversarial mode: discriminator behind the GRL with
  ``beta = domain_adversary_weight * suppression(epoch)``
  (model.py:95-107); three optimizers expressed as one
  ``optax.multi_transform`` keyed on the param subtree;
* entropy regularizer weighted by the same suppression schedule;
* DANNCE: an inner ``lax.fori_loop`` of Adam steps ON THE INPUTS maximizing
  the (non-reversed) discriminator loss + KL anchor to the original class
  distribution; a bernoulli mask selects which examples are perturbed.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.kws import Discriminator, KWSModel, cross_entropy, entropy_loss
from ..models.resnet import ResNetConfig
from .optim import make_adam, make_multi_optimizer, set_learning_rate, step_lr


@dataclasses.dataclass(frozen=True)
class KWSTrainConfig:
    """Mirror of the reference KWSModel hyperparameters
    (src/model/model.py:18-47)."""

    large_heads: bool = False
    adversarial_training: bool = False
    dannce: bool = False
    adversarial_examples_ratio: float = 0.5
    adversarial_examples_lr: float = 1.5e-6
    adversarial_train_steps: int = 5
    adv_kl_weight: float = 1.0
    entropy: bool = False
    domain_adversary_weight: float = 0.1
    entropy_weight: float = 0.1
    supression_decay: float = 1e-3
    early_adversary_supression: bool = True
    num_domains: int = 72
    kw_type: str = "tts"
    kw_p: float = 0.5
    accumulate_grad_batches: int = 1
    learning_rate: float = 1e-4
    features_lr: float = 1e-4
    classifier_lr: float = 1e-4
    discriminator_lr: float = 1e-4
    lr_step: int = 40
    weight_decay: float = 0.0
    beta_1: float = 0.9
    beta_2: float = 0.99
    # TPU extension (not in the reference): bfloat16 activations/conv compute
    # with float32 params, optimizer state and BatchNorm statistics —
    # measured ~2x step throughput on v5e at the reference's full config
    compute_dtype: str = "float32"
    # TPU extension: when set to the collator target (size0, size1), the
    # step consumes RAW hidden-state batches (RawKWSDataCollator) and fuses
    # the similarity einsum + antialiased resize on device
    # (ops/resize.py:features_from_hidden_states) — the host-side resize is
    # ~2 GFLOP/example at (150, 750): a host core collates ~5 examples/s
    # while the TPU step consumes 881, so training at reference dims is
    # input-bound unless this work rides the MXU
    device_features: Optional[Tuple[int, int]] = None
    # TPU extension: feed similarity maps as NHWC ([B, H, W, L]) so the conv
    # stack runs in the TPU-native layout without a leading transpose; the
    # collator emits either layout (docs/PERF.md train-step sweep)
    channels_last: bool = False
    # TPU extension: rematerialize each ResNet block in the backward pass
    # (jax.checkpoint) — numerically identical gradients, smaller
    # live-activation working set.  The batch-64 MFU regression in the
    # docs/PERF.md sweep was attributed to HBM spills; remat is the lever
    # that lets larger batches fit.
    remat: bool = False

    def suppression(self, epoch: int) -> float:
        """2/(1+exp(-decay*epoch)) - 1 (model.py:99)."""
        return 2.0 / (1.0 + np.exp(-self.supression_decay * epoch)) - 1.0

    def beta(self, epoch: int) -> float:
        b = self.domain_adversary_weight
        if self.early_adversary_supression:
            b *= self.suppression(epoch)
        return b


@dataclasses.dataclass
class KWSTrainState:
    params: Dict[str, Any]  # {"kws": ..., "disc": ...?}
    batch_stats: Dict[str, Any]
    opt_state: Any
    epoch: int = 0


def _label_tree(params):
    """Map param subtrees to optimizer labels (model.py:324-331)."""

    def label(path_params):
        return {
            "kws": {
                "model": {
                    "feature_extractor": jax.tree.map(lambda _: "features",
                                                      path_params["kws"]["model"]["feature_extractor"]),
                    "classifier": jax.tree.map(lambda _: "classifier",
                                               path_params["kws"]["model"]["classifier"]),
                }
            },
            **(
                {"disc": jax.tree.map(lambda _: "discriminator", path_params["disc"])}
                if "disc" in path_params
                else {}
            ),
        }

    return label(params)


def build_models(config: KWSTrainConfig, resnet_config: ResNetConfig):
    kws = KWSModel(
        resnet_config,
        dtype=jnp.dtype(config.compute_dtype),
        channels_last=config.channels_last,
        remat=config.remat,
    )
    disc = (
        Discriminator(num_labels=config.num_domains, large=config.large_heads)
        if config.adversarial_training
        else None
    )
    return kws, disc


def init_train_state(
    rng: jax.Array,
    config: KWSTrainConfig,
    resnet_config: ResNetConfig,
    sample_shape: Tuple[int, ...],
) -> Tuple[KWSTrainState, Any, Any]:
    """Returns (state, kws_model, disc_model)."""
    kws, disc = build_models(config, resnet_config)
    dummy = jnp.zeros((1, *sample_shape), jnp.float32)
    variables = kws.init(rng, dummy)
    params = {"kws": variables["params"]}
    batch_stats = {"kws": variables["batch_stats"]}
    if disc is not None:
        feat_dim = resnet_config.hidden_sizes[-1]
        disc_vars = disc.init(rng, jnp.zeros((1, feat_dim)), jnp.zeros((1,), jnp.int32))
        params["disc"] = disc_vars["params"]

    if not config.adversarial_training:
        tx = make_adam(config.learning_rate, config.beta_1, config.beta_2, config.weight_decay)
    else:
        tx = make_multi_optimizer(
            _label_tree(params),
            {
                "features": make_adam(config.features_lr, config.beta_1, config.beta_2,
                                      config.weight_decay),
                "classifier": make_adam(config.classifier_lr, config.beta_1, config.beta_2,
                                        config.weight_decay),
                "discriminator": make_adam(config.discriminator_lr, config.beta_1, config.beta_2,
                                           config.weight_decay),
            },
        )
    opt_state = tx.init(params)
    return KWSTrainState(params, batch_stats, opt_state, 0), (kws, disc, tx)


def update_epoch_lr(config: KWSTrainConfig, state: KWSTrainState, opt_state=None):
    """StepLR at epoch boundaries (model.py:317-338)."""
    epoch = state.epoch
    os_ = opt_state if opt_state is not None else state.opt_state
    if not config.adversarial_training:
        set_learning_rate(os_, step_lr(config.learning_rate, config.lr_step)(epoch))
    else:
        for name, lr in (
            ("features", config.features_lr),
            ("classifier", config.classifier_lr),
            ("discriminator", config.discriminator_lr),
        ):
            set_learning_rate(os_.inner_states[name].inner_state, step_lr(lr, config.lr_step)(epoch))
    return os_


def make_grad_fn(config: KWSTrainConfig, kws: KWSModel, disc: Optional[Discriminator]):
    """The backward half of the reference ``training_step``
    (src/model/model.py:109-228): kw_type='all' selection, optional DANNCE
    input rewriting, then the minibatch loop accumulating SUMMED gradients
    (torch ``manual_backward`` per minibatch accumulates into ``p.grad``)
    with BatchNorm stats threaded sequentially.

    Returns ``grads(params, batch_stats, batch, rng, beta, suppression) ->
    (grads, new_stats, metric_sums, n_examples)``.  Split out from
    :func:`make_train_step` so the torch differential
    (tests/test_model_differential.py) can compare raw gradients against the
    reference's ``p.grad`` without going through an optimizer update.
    """

    n_mb = config.accumulate_grad_batches if config.adversarial_training else 1

    def forward_kws(params, batch_stats, x, train):
        variables = {"params": params["kws"], "batch_stats": batch_stats["kws"]}
        if train:
            out, updated = kws.apply(variables, x, train=True, mutable=["batch_stats"])
            return out, {"kws": updated["batch_stats"]}
        return kws.apply(variables, x, train=False), batch_stats

    def dannce_update(params, batch_stats, x, d_labels, rng, beta):
        """Adversarial-example inner loop (dannce.py:22-71)."""
        adv_mask = jax.random.bernoulli(
            rng, config.adversarial_examples_ratio, (x.shape[0],)
        )
        out0, _ = forward_kws(params, batch_stats, x, train=False)
        old_logp = jax.nn.log_softmax(jax.lax.stop_gradient(out0.logits), axis=-1)

        inner_tx = optax.adam(config.adversarial_examples_lr)
        inner_state = inner_tx.init(x)

        def inner_loss(x_adv):
            out, _ = forward_kws(params, batch_stats, x_adv, train=False)
            _, d_loss = disc.apply(
                {"params": params["disc"]}, out.features, d_labels,
                beta=beta, use_grad_reverse=False,
            )
            new_logp = jax.nn.log_softmax(out.logits, axis=-1)
            # torch kl_div(input=old_logp, target=new_logp, log_target=True),
            # reduction='mean' over ALL elements
            kl = jnp.mean(jnp.exp(new_logp) * (new_logp - old_logp))
            return d_loss * config.domain_adversary_weight + config.adv_kl_weight * kl

        def body(_, carry):
            x_adv, ist = carry
            grads = jax.grad(inner_loss)(x_adv)
            updates, ist = inner_tx.update(grads, ist, x_adv)
            return optax.apply_updates(x_adv, updates), ist

        x_adv, _ = jax.lax.fori_loop(0, config.adversarial_train_steps, body, (x, inner_state))
        return jnp.where(adv_mask[:, None, None, None], x_adv, x)

    def minibatch_loss(params, batch_stats, x, c_labels, d_labels, rng, beta, suppression):
        out, new_stats = forward_kws(params, batch_stats, x, train=True)
        c_loss = cross_entropy(out.logits, c_labels)
        loss = c_loss
        metrics = {"class_loss": c_loss}
        if config.adversarial_training:
            d_logits, d_loss = disc.apply(
                {"params": params["disc"]}, out.features, d_labels,
                beta=beta, use_grad_reverse=True, train=True,
                rngs={"dropout": rng} if config.large_heads else {},
            )
            loss = loss + d_loss
            metrics["domain_loss"] = d_loss
            metrics["disc_correct"] = (jnp.argmax(d_logits, -1) == d_labels).sum()
        if config.entropy:
            e_loss = entropy_loss(out.logits)
            if config.early_adversary_supression:
                e_loss = e_loss * (suppression * config.entropy_weight)
            # NOTE: without suppression the reference adds the entropy term
            # UNWEIGHTED (entropy_weight only scales the suppressed branch,
            # model.py:187-192) — reproduced faithfully, do not "fix"
            loss = loss + e_loss
            metrics["entropy_loss"] = e_loss
        return loss, (new_stats, metrics)

    def accumulate(params, batch_stats, batch, rng, beta, suppression):
        if config.kw_type == "all":
            # coin-flip between the tts/natural member of each adjacent pair
            # (model.py:120-127); applied to EVERY batch leaf (they all lead
            # with the example axis), BEFORE the fused feature computation so
            # the dropped half costs no sims/resize work
            half = batch["labels"].shape[0] // 2
            pick = jax.random.bernoulli(
                jax.random.fold_in(rng, 0), 1.0 - config.kw_p, (half,)
            ).astype(jnp.int32)
            # k_mask = rand > kw_p selects tts (slot 0) with prob 1-kw_p
            sel = 2 * jnp.arange(half) + (1 - pick)
            batch = {k: v[sel] for k, v in batch.items()}

        if config.device_features is not None and "utt_hs" in batch:
            # fused on-device features (see KWSTrainConfig.device_features)
            from ..ops.resize import features_from_hidden_states

            size = tuple(config.device_features)
            feats = jax.vmap(
                lambda k, u, kl, ul: features_from_hidden_states(k, u, kl, ul, size)
            )(batch["kwd_hs"], batch["utt_hs"], batch["kwd_len"], batch["utt_len"])
            if config.channels_last:
                # the host collator's NCHW->NHWC transpose happens in the
                # engine loop; the fused path transposes in-graph
                feats = jnp.transpose(feats, (0, 2, 3, 1))
            batch = {"features": feats, "labels": batch["labels"],
                     **({"domain": batch["domain"]} if "domain" in batch else {})}
        features, c_labels = batch["features"], batch["labels"]
        d_labels = batch.get("domain")

        if config.dannce and config.adversarial_training:
            mb = features.shape[0] // n_mb
            feats = features.reshape(n_mb, mb, *features.shape[1:])
            dl = d_labels.reshape(n_mb, mb)

            def dannce_mb(i, f):
                return dannce_update(
                    params, batch_stats, f[i], dl[i], jax.random.fold_in(rng, 100 + i), beta
                )

            feats = jnp.stack([dannce_mb(i, feats) for i in range(n_mb)])
            features = feats.reshape(-1, *features.shape[1:])

        mb = features.shape[0] // n_mb
        feats = features.reshape(n_mb, mb, *features.shape[1:])
        cl = c_labels.reshape(n_mb, mb)
        dl = d_labels.reshape(n_mb, mb) if d_labels is not None else jnp.zeros((n_mb, mb), jnp.int32)

        def scan_body(carry, xs):
            stats, grad_acc, metric_acc = carry
            f, c, d, i = xs
            (loss, (stats, metrics)), grads = jax.value_and_grad(
                minibatch_loss, has_aux=True
            )(params, stats, f, c, d, jax.random.fold_in(rng, i), beta, suppression)
            grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
            for k, v in metrics.items():
                metric_acc[k] = metric_acc.get(k, 0.0) + v
            return (stats, grad_acc, metric_acc), loss

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        metric_init = {"class_loss": 0.0}
        if config.adversarial_training:
            metric_init.update(domain_loss=0.0, disc_correct=0.0)
        if config.entropy:
            metric_init["entropy_loss"] = 0.0

        (new_stats, grads, metrics), _ = jax.lax.scan(
            scan_body,
            (batch_stats, zero_grads, metric_init),
            (feats, cl, dl, jnp.arange(n_mb)),
        )
        return grads, new_stats, metrics, features.shape[0]

    return accumulate


def make_train_step(config: KWSTrainConfig, kws: KWSModel, disc: Optional[Discriminator], tx):
    """Returns jitted ``step(params, batch_stats, opt_state, batch, rng,
    beta, suppression)`` — gradient accumulation (:func:`make_grad_fn`)
    followed by the three-group optimizer update (model.py:220-228)."""

    accumulate = make_grad_fn(config, kws, disc)
    n_mb = config.accumulate_grad_batches if config.adversarial_training else 1

    @partial(jax.jit, static_argnames=())
    def step(params, batch_stats, opt_state, batch, rng, beta, suppression):
        grads, new_stats, metrics, n_examples = accumulate(
            params, batch_stats, batch, rng, beta, suppression
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        out_metrics = {
            k: (v / n_mb if k != "disc_correct" else v / n_examples)
            for k, v in metrics.items()
        }
        return params, new_stats, opt_state, out_metrics

    return step
