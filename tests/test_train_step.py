"""Smoke + semantics tests for the jitted KWS train step
(reference src/model/model.py:109-228, dannce.py)."""

import jax
import numpy as np
import pytest

from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.train.kws_train import (
    KWSTrainConfig,
    init_train_state,
    make_train_step,
    update_epoch_lr,
)

TINY = ResNetConfig(
    num_channels=3, embedding_size=8, hidden_sizes=(8, 16, 24, 32), depths=(1, 1, 1, 1),
    num_labels=2,
)
SHAPE = (3, 32, 32)


def _batch(rng, n=4, domains=4):
    return {
        "features": rng.standard_normal((n, *SHAPE), dtype=np.float32),
        "labels": rng.integers(0, 2, n),
        "domain": rng.integers(0, domains, n),
    }


def _run(config, n=4, steps=2):
    rng = jax.random.PRNGKey(0)
    state, (kws, disc, tx) = init_train_state(rng, config, TINY, SHAPE)
    step = make_train_step(config, kws, disc, tx)
    nprng = np.random.default_rng(0)
    params, stats, opt_state = state.params, state.batch_stats, state.opt_state
    metrics = None
    for i in range(steps):
        params, stats, opt_state, metrics = step(
            params, stats, opt_state, _batch(nprng, n), jax.random.fold_in(rng, i),
            config.beta(0), config.suppression(0),
        )
    return params, metrics, state


def test_plain_training_reduces_params_change():
    config = KWSTrainConfig(num_domains=4)
    params, metrics, state0 = _run(config)
    assert np.isfinite(float(metrics["class_loss"]))
    # params actually moved
    before = state0.params["kws"]["model"]["classifier"]["kernel"]
    after = params["kws"]["model"]["classifier"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_adversarial_training_with_entropy():
    config = KWSTrainConfig(
        adversarial_training=True, entropy=True, num_domains=4,
        accumulate_grad_batches=2,
    )
    params, metrics, _ = _run(config, n=4)
    for key in ("class_loss", "domain_loss", "entropy_loss", "disc_correct"):
        assert np.isfinite(float(metrics[key])), key
    assert "disc" in params


def test_dannce_runs():
    config = KWSTrainConfig(
        adversarial_training=True, dannce=True, num_domains=4,
        adversarial_train_steps=2, accumulate_grad_batches=1,
    )
    params, metrics, _ = _run(config, n=4, steps=1)
    assert np.isfinite(float(metrics["class_loss"]))


def test_kw_type_all_halves_batch():
    config = KWSTrainConfig(kw_type="all", num_domains=4)
    params, metrics, _ = _run(config, n=8, steps=1)
    assert np.isfinite(float(metrics["class_loss"]))


def test_suppression_schedule():
    config = KWSTrainConfig(supression_decay=1e-3)
    assert config.suppression(0) == 0.0
    assert 0 < config.suppression(100) < config.suppression(1000) < 1
    assert config.beta(0) == 0.0


def test_step_lr_updates():
    config = KWSTrainConfig(num_domains=4, learning_rate=1e-3, lr_step=2)
    rng = jax.random.PRNGKey(0)
    state, (kws, disc, tx) = init_train_state(rng, config, TINY, SHAPE)
    state.epoch = 4
    os_ = update_epoch_lr(config, state)
    assert float(os_.hyperparams["learning_rate"]) == pytest.approx(1e-5)


def test_bfloat16_compute_dtype():
    """TPU extension: compute_dtype='bfloat16' runs the step with bf16
    activations while params/opt state stay float32."""
    import jax.numpy as jnp

    config = KWSTrainConfig(compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    state, (kws, disc, tx) = init_train_state(rng, config, TINY, SHAPE)
    step = make_train_step(config, kws, disc, tx)
    nprng = np.random.default_rng(0)
    params, stats, opt_state, metrics = step(
        state.params, state.batch_stats, state.opt_state, _batch(nprng),
        jax.random.fold_in(rng, 0), 0.0, 0.0,
    )
    assert np.isfinite(float(metrics["class_loss"]))
    leaves = jax.tree.leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    stats_leaves = jax.tree.leaves(stats)
    assert all(l.dtype == jnp.float32 for l in stats_leaves)


def test_remat_parity():
    """TPU extension: remat=True (jax.checkpoint on every ResNet block)
    must be a pure scheduling change — identical param init, identical
    post-step params/metrics (the backward recomputes the same forward).
    Covers the adversarial path so the rematerialized features also feed
    the discriminator through the GRL."""
    base = dict(adversarial_training=True, entropy=True, num_domains=4)
    params_a, metrics_a, state_a = _run(KWSTrainConfig(**base))
    params_b, metrics_b, state_b = _run(KWSTrainConfig(remat=True, **base))
    # same init (remat must not perturb the scope/RNG paths)
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        state_a.params, state_b.params,
    )
    # same trained params + metrics
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7
        ),
        params_a, params_b,
    )
    for key in ("class_loss", "domain_loss", "entropy_loss"):
        assert float(metrics_a[key]) == pytest.approx(float(metrics_b[key]), rel=1e-6)
