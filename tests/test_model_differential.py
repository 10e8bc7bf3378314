"""Differential: our jitted KWS train step vs the reference's COMPOSED
``KWSModel.training_step`` run VERBATIM (src/model/model.py:109-228).

The piecewise differentials (tests/test_adversarial_differential.py,
test_resnet_parity.py) pin each component; this one pins the composition
the reference actually trains with:

* the suppression/beta epoch schedule (model.py:95-107);
* gradient ACCUMULATION semantics — torch ``manual_backward`` per
  minibatch sums into ``p.grad`` while BatchNorm sees per-minibatch batch
  stats (model.py:159-199); ours is the ``lax.scan`` in
  ``train/kws_train.py:make_grad_fn`` threading stats sequentially;
* the composed loss ``c_loss + d_loss + e_loss*(suppression*entropy_w)``
  and the GRL-reversed discriminator gradient flowing into the feature
  extractor with ``-beta`` (model.py:174-192);
* the logged running losses (divided by num_minibatches) and the
  discriminator accuracy (model.py:204-213);
* the ``kw_type='all'`` paired coin-flip selection (model.py:120-127).

The reference model is built verbatim with a pass-through ``transformers``
shim that only shrinks ``ResNetConfig()`` to test size (the forward is the
real HF ResNet), a Lightning stub providing the manual-optimization
surface, and converted weights (models/torch_compat.py).  DANNCE is
excluded by design (docs/PARITY.md #20: inner-loop BN semantics deviate).
"""

import types

import jax
import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.models.torch_compat import load_hf_resnet_classifier
from enhance_cb_whisper_tpu.train.kws_train import (
    KWSTrainConfig,
    init_train_state,
    make_grad_fn,
)
from ref_shims import (
    confidence_intervals_shim,
    lightning_shim,
    load_reference_package_module,
    restore_modules,
    tiny_resnet_transformers_shim,
    torchmetrics_shim,
)

HIDDEN = (8, 16, 24, 32)
DEPTHS = (1, 1, 1, 1)
EMBED = 8
SHAPE = (12, 32, 32)  # the reference hard-codes 12 input channels
NUM_DOMAINS = 4


@pytest.fixture(scope="module")
def ref_model_mod():
    shims = {
        **lightning_shim(),
        **torchmetrics_shim(),
        **confidence_intervals_shim(),
        **tiny_resnet_transformers_shim(
            embedding_size=EMBED, hidden_sizes=list(HIDDEN), depths=list(DEPTHS)
        ),
    }
    mod, saved = load_reference_package_module("model.model", shims)
    yield mod
    restore_modules(saved)


def _tiny_config(**kw):
    return KWSTrainConfig(num_domains=NUM_DOMAINS, **kw)


def _resnet_config():
    return ResNetConfig(
        num_channels=12, embedding_size=EMBED, hidden_sizes=HIDDEN,
        depths=DEPTHS, num_labels=2,
    )


def _make_ref(ref_model_mod, **hparams):
    torch.manual_seed(0)
    model = ref_model_mod.KWSModel(num_domains=NUM_DOMAINS, **hparams)
    model.train()
    return model


def _convert(model, config):
    """Reference state_dict -> our {params, batch_stats} trees."""
    # clone: the converted arrays must not alias torch storage (the
    # adversarial test runs the reference's in-place opt.step() first)
    sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
    conv = load_hf_resnet_classifier(sd, _resnet_config(), prefix="model.")
    params = {"kws": {"model": conv["params"]}}
    stats = {"kws": {"model": conv["batch_stats"]}}
    if config.adversarial_training:
        params["disc"] = {"head": {"linear": {
            "kernel": sd["discriminator.head.layers.1.weight"].numpy().T,
            "bias": sd["discriminator.head.layers.1.bias"].numpy(),
        }}}
    return params, stats


def _our_state(config, params, stats):
    state, (kws, disc, _tx) = init_train_state(
        jax.random.PRNGKey(0), config, _resnet_config(), SHAPE
    )
    # same tree structure as the initialized state (catches layout drift)
    chex = jax.tree.structure(state.params)
    assert jax.tree.structure(params) == chex
    return (kws, disc)


def _ref_grads(model):
    """named_parameters grads + zero stand-ins for the BN running buffers
    (so the WEIGHT converter's layout map can be reused on the grads)."""
    out = {n: p.grad.detach().numpy() for n, p in model.named_parameters()
           if p.grad is not None}
    for n, buf in model.state_dict().items():
        if n.endswith(("running_mean", "running_var")):
            out[n] = np.zeros(buf.shape, np.float32)
    return out


def _compare_grad_trees(ref_grads, our_grads, config, rtol=2e-3, atol=2e-5):
    conv = load_hf_resnet_classifier(
        {k: torch.from_numpy(v) for k, v in ref_grads.items()
         if k.startswith("model.")},
        _resnet_config(), prefix="model.",
    )["params"]
    want = {"kws": {"model": conv}}
    if config.adversarial_training:
        want["disc"] = {"head": {"linear": {
            "kernel": ref_grads["discriminator.head.layers.1.weight"].T,
            "bias": ref_grads["discriminator.head.layers.1.bias"],
        }}}
    flat_want, tdef_want = jax.tree_util.tree_flatten_with_path(want)
    flat_ours, tdef_ours = jax.tree_util.tree_flatten_with_path(our_grads)
    assert tdef_want == tdef_ours
    for (path, w), (_, g) in zip(flat_want, flat_ours):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


def _batch(n=8, seed=7):
    rng = np.random.default_rng(seed)
    return {
        "features": rng.standard_normal((n, *SHAPE)).astype(np.float32),
        "labels": rng.integers(0, 2, n).astype(np.int64),
        "domain": rng.integers(0, NUM_DOMAINS, n).astype(np.int64),
    }


def _torch_batch(b):
    return {
        "features": torch.from_numpy(b["features"].copy()),
        "labels": torch.from_numpy(b["labels"]),
        "domain": torch.from_numpy(b["domain"]),
    }


@pytest.mark.parametrize("epoch", [0, 3, 500])
def test_suppression_and_beta_schedule(ref_model_mod, epoch):
    model = _make_ref(
        ref_model_mod, adversarial_training=True, entropy=True,
        supression_decay=0.5,
    )
    model.trainer = types.SimpleNamespace(current_epoch=epoch, is_last_batch=False)
    model.on_train_epoch_start()
    config = _tiny_config(
        adversarial_training=True, entropy=True, supression_decay=0.5,
    )
    np.testing.assert_allclose(config.suppression(epoch), model.supression, rtol=1e-12)
    np.testing.assert_allclose(config.beta(epoch), model.beta, rtol=1e-12)
    np.testing.assert_allclose(model.discriminator.beta, model.beta, rtol=1e-12)


def test_plain_step_loss_and_grads_match(ref_model_mod):
    """Non-adversarial branch: training_step returns the CE loss; its
    backward is the reference gradient (automatic optimization)."""
    model = _make_ref(ref_model_mod, adversarial_training=False)
    config = _tiny_config()
    params, stats = _convert(model, config)
    kws, disc = _our_state(config, params, stats)

    b = _batch()
    loss = model.training_step(_torch_batch(b), 0)
    model.zero_grad()
    loss.backward()

    grads, _, metrics, n = jax.jit(make_grad_fn(config, kws, disc))(
        params, stats, b, jax.random.PRNGKey(1), 0.0, 0.0
    )
    assert n == 8
    np.testing.assert_allclose(float(metrics["class_loss"]), float(loss),
                               rtol=1e-5, atol=1e-6)
    _compare_grad_trees(_ref_grads(model), grads, config)


def test_adversarial_entropy_accumulation_matches(ref_model_mod):
    """The full composed step: adversarial + entropy + grad accumulation
    over 2 minibatches at epoch 3 (non-trivial suppression/beta)."""
    hp = dict(
        adversarial_training=True, entropy=True, supression_decay=0.5,
        accumulate_grad_batches=2, domain_adversary_weight=0.3,
        entropy_weight=0.2, features_lr=1e-3, classifier_lr=2e-3,
        discriminator_lr=3e-3,
    )
    model = _make_ref(ref_model_mod, **hp)
    config = _tiny_config(**hp)
    params, stats = _convert(model, config)
    kws, disc = _our_state(config, params, stats)

    epoch = 3
    model.trainer = types.SimpleNamespace(current_epoch=epoch, is_last_batch=False)
    model.on_train_epoch_start()
    opts, scheds = model.configure_optimizers()
    model._optimizers, model._schedulers = opts, scheds

    b = _batch()
    model.training_step(_torch_batch(b), 0)

    grads, _, metrics, n = jax.jit(make_grad_fn(config, kws, disc))(
        params, stats, b, jax.random.PRNGKey(1),
        config.beta(epoch), config.suppression(epoch),
    )
    n_mb = config.accumulate_grad_batches

    np.testing.assert_allclose(float(metrics["class_loss"]) / n_mb,
                               float(model.logged["train/class_loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(metrics["domain_loss"]) / n_mb,
                               float(model.logged["train/domain_loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(metrics["entropy_loss"]) / n_mb,
                               float(model.logged["train/entropy_loss"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(metrics["disc_correct"]) / n,
                               float(model.logged["train/discriminator_acc"]),
                               rtol=1e-6, atol=0)
    _compare_grad_trees(_ref_grads(model), grads, config)


def test_kw_type_all_selection_matches(ref_model_mod):
    """kw_type='all': the reference flips one coin per adjacent (tts,
    natural) pair (rand > kw_p keeps the even slot) and trains on the kept
    half (model.py:120-127).  Replaying the seeded torch.rand draw, the
    reference's loss must equal its own kw_type='natural' loss on that
    subset — and ours on the same subset matches too."""
    model = _make_ref(ref_model_mod, adversarial_training=False, kw_type="all",
                      kw_p=0.5)
    config = _tiny_config()
    params, stats = _convert(model, config)
    kws, disc = _our_state(config, params, stats)

    b = _batch(n=8)
    torch.manual_seed(11)
    loss_all = model.training_step(_torch_batch(b), 0)

    torch.manual_seed(11)
    k_mask = torch.rand(4) > 0.5
    k_mask = torch.stack((k_mask, torch.logical_not(k_mask)), dim=1).flatten().numpy()
    sub = {
        "features": b["features"][k_mask],
        "labels": b["labels"][k_mask],
        "domain": b["domain"][k_mask],
    }
    # exactly one of each adjacent pair survives
    assert k_mask.reshape(4, 2).sum(axis=1).tolist() == [1, 1, 1, 1]

    model2 = _make_ref(ref_model_mod, adversarial_training=False)
    loss_nat = model2.training_step(_torch_batch(sub), 0)
    np.testing.assert_allclose(float(loss_all), float(loss_nat), rtol=1e-6)

    _, _, metrics, _ = jax.jit(make_grad_fn(config, kws, disc))(
        params, stats, sub, jax.random.PRNGKey(1), 0.0, 0.0
    )
    np.testing.assert_allclose(float(metrics["class_loss"]), float(loss_all),
                               rtol=1e-5, atol=1e-6)
