"""Tests for the paper-1 KWS model pieces: CE with ignore_index, GRL,
entropy loss (reference src/model/{model,discriminator,entropyLoss}.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from enhance_cb_whisper_tpu.models import KWSModel, ResNetConfig
from enhance_cb_whisper_tpu.models.kws import (
    Discriminator,
    cross_entropy,
    entropy_loss,
    grad_reverse,
)


def test_cross_entropy_matches_torch_ignore_index():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((6, 2), dtype=np.float32)
    labels = np.array([0, 1, -100, 1, 0, -100])
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    assert abs(got - want) < 1e-6


def test_grad_reverse_flips_and_scales_gradient():
    def f(x):
        return jnp.sum(grad_reverse(x, 0.5) ** 2)

    x = jnp.array([1.0, -2.0])
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), -0.5 * 2 * np.asarray(x), rtol=1e-6)


def test_entropy_loss_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((5, 4), dtype=np.float32)
    got = float(entropy_loss(jnp.asarray(logits)))
    t = torch.from_numpy(logits)
    b = F.softmax(t, dim=1) * F.log_softmax(t, dim=1)
    want = (-1.0 * b.sum(dim=1).mean()).item()
    assert abs(got - want) < 1e-6


def test_kws_model_shapes():
    cfg = ResNetConfig(
        num_channels=12,
        embedding_size=8,
        hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1),
        num_labels=2,
    )
    model = KWSModel(cfg)
    x = np.random.default_rng(0).standard_normal((2, 12, 64, 64), dtype=np.float32)
    labels = np.array([0, 1])
    variables = model.init(jax.random.PRNGKey(0), x, labels)
    out = model.apply(variables, x, labels)
    assert out.logits.shape == (2, 2)
    assert out.features.shape == (2, 32)
    assert np.isfinite(float(out.loss))


def test_discriminator_grl_direction():
    """With GRL on, increasing discriminator accuracy must push features the
    other way: the gradient wrt inputs flips sign vs the non-GRL path."""
    disc = Discriminator(num_labels=3)
    feats = np.random.default_rng(2).standard_normal((4, 8), dtype=np.float32)
    labels = np.array([0, 1, 2, 0])
    variables = disc.init(jax.random.PRNGKey(0), feats, labels)

    def loss_with(use_grl):
        def f(x):
            _, loss = disc.apply(variables, x, labels, beta=1.0, use_grad_reverse=use_grl)
            return loss

        return jax.grad(f)(jnp.asarray(feats))

    g_grl = np.asarray(loss_with(True))
    g_plain = np.asarray(loss_with(False))
    np.testing.assert_allclose(g_grl, -g_plain, rtol=1e-5, atol=1e-7)
