"""Learning sanity: the KWS training loop must actually learn a separable
synthetic task (positives = high-similarity diagonal patterns), driving the
loss down and the operating-point F1 up — end-to-end evidence that gradient
flow, BatchNorm state threading, the optimizer and the eval path cohere."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.metrics import prf_at_threshold
from enhance_cb_whisper_tpu.train.kws_train import (
    KWSTrainConfig,
    init_train_state,
    make_train_step,
)

TINY = ResNetConfig(
    num_channels=2, embedding_size=8, hidden_sizes=(8, 16, 24, 32), depths=(1, 1, 1, 1),
    num_labels=2,
)
H, W = 32, 32


def _make_batch(rng, n):
    """Positive examples carry a bright diagonal band (a keyword aligning
    with a span of the utterance); negatives are noise."""
    labels = rng.integers(0, 2, n)
    x = rng.normal(0, 0.3, (n, 2, H, W)).astype(np.float32)
    for i in range(n):
        if labels[i]:
            start = rng.integers(0, W - H // 2)
            for d in range(H // 2):
                x[i, :, d, min(start + d, W - 1)] += 3.0
    return x, labels


def test_training_learns_synthetic_kws():
    config = KWSTrainConfig(learning_rate=3e-3, num_domains=2)
    rng = jax.random.PRNGKey(0)
    state, (kws, disc, tx) = init_train_state(rng, config, TINY, (2, H, W))
    step = make_train_step(config, kws, disc, tx)

    nprng = np.random.default_rng(0)
    params, stats, opt_state = state.params, state.batch_stats, state.opt_state
    losses = []
    for i in range(60):
        x, labels = _make_batch(nprng, 16)
        params, stats, opt_state, metrics = step(
            params, stats, opt_state,
            {"features": jnp.asarray(x), "labels": jnp.asarray(labels)},
            jax.random.fold_in(rng, i), 0.0, 0.0,
        )
        losses.append(float(metrics["class_loss"]))

    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.7, losses

    # eval-mode F1 on held-out data at the 0.5 operating point
    x, labels = _make_batch(np.random.default_rng(1), 64)
    out = kws.apply(
        {"params": params["kws"], "batch_stats": stats["kws"]}, jnp.asarray(x)
    )
    probs = np.asarray(jax.nn.softmax(out.logits, -1))[:, 1]
    p, r, f1 = prf_at_threshold(probs, labels, 0.5)
    assert f1 > 0.8, (p, r, f1)


def test_training_learns_through_device_features():
    """The fused on-device feature path (raw hidden states -> in-step sims
    + antialiased resize) learns the same separable task: positives are
    keyword stacks that ALIGN with a span of the utterance (high cosine
    band in the sim map), negatives are independent noise."""
    size = (32, 32)
    config = KWSTrainConfig(learning_rate=3e-3, num_domains=2,
                            device_features=size)
    rng = jax.random.PRNGKey(0)
    state, (kws, disc, tx) = init_train_state(rng, config, TINY, (2, *size))
    step = make_train_step(config, kws, disc, tx)

    D = 8

    def make_raw_batch(nprng, n):
        labels = nprng.integers(0, 2, n)
        kwd = nprng.normal(0, 1, (n, 2, 6, D)).astype(np.float32)
        utt = nprng.normal(0, 1, (n, 2, 24, D)).astype(np.float32)
        kwd /= np.linalg.norm(kwd, axis=-1, keepdims=True)
        utt /= np.linalg.norm(utt, axis=-1, keepdims=True)
        for i in range(n):
            if labels[i]:
                s = int(nprng.integers(0, 24 - 6))
                utt[i, :, s : s + 6] = kwd[i]  # embedded keyword span
        return {
            "kwd_hs": kwd, "utt_hs": utt,
            "kwd_len": np.full(n, 6, np.int32),
            "utt_len": np.full(n, 24, np.int32),
            "labels": labels,
        }

    nprng = np.random.default_rng(0)
    params, stats, opt_state = state.params, state.batch_stats, state.opt_state
    losses = []
    for i in range(60):
        batch = make_raw_batch(nprng, 16)
        params, stats, opt_state, metrics = step(
            params, stats, opt_state,
            {k: jnp.asarray(v) for k, v in batch.items()},
            jax.random.fold_in(rng, i), 0.0, 0.0,
        )
        losses.append(float(metrics["class_loss"]))

    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.7, losses
