"""Paper-1 KWS classifier: ResNet-50 over stacked cosine-similarity matrices.

Reference: src/model/model.py:17-93 — a 12-input-channel ResNet-50 feature
extractor + Flatten + Linear(2048, 2); ``forward`` takes pre-computed
cosine-similarity "images" [batch, 12, T_kwd, T_utt] and returns logits,
pooled features (fed to the domain discriminator) and optionally the CE loss.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNetClassifier, ResNetConfig


@dataclasses.dataclass
class KWSOutput:
    """Mirror of the reference output dataclass (src/model/utils.py:4-10)."""

    logits: jax.Array
    features: jax.Array
    loss: Optional[jax.Array] = None


class DiscOutput(NamedTuple):
    """Mirror of the reference discriminator output (src/model/utils.py:12-15);
    a NamedTuple so existing ``logits, loss = disc(...)`` unpacking works."""

    logits: jax.Array
    loss: Optional[jax.Array] = None


def cross_entropy(logits: jax.Array, labels: jax.Array, ignore_index: int = -100) -> jax.Array:
    """Mean CE over valid labels; entries equal to ``ignore_index`` are
    masked (torch ``F.cross_entropy`` ignore_index semantics; the collator's
    multi-keyword flatten branch labels ghost keywords -100,
    src/data/data_collator.py:26)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, nll, 0.0).sum() / denom


class KWSModel(nn.Module):
    """ResNet KWS classifier (reference src/model/model.py:53-93)."""

    config: ResNetConfig
    dtype: Any = jnp.float32
    channels_last: bool = False  # input [B, H, W, L] instead of [B, L, H, W]
    remat: bool = False  # checkpoint residual blocks (backward recompute)

    def setup(self):
        self.model = ResNetClassifier(
            self.config,
            dtype=self.dtype,
            channels_last=self.channels_last,
            remat=self.remat,
        )

    def __call__(
        self,
        input_features: jax.Array,
        labels: Optional[jax.Array] = None,
        train: bool = False,
    ) -> KWSOutput:
        logits, features = self.model(input_features, train=train)
        loss = cross_entropy(logits, labels) if labels is not None else None
        return KWSOutput(loss=loss, logits=logits, features=features)


@jax.custom_vjp
def grad_reverse(x: jax.Array, beta: float) -> jax.Array:
    """Gradient-reversal layer (reference src/model/discriminator.py:10-26):
    identity forward, gradient scaled by ``-beta`` backward."""
    return x


def _grad_reverse_fwd(x, beta):
    return x, beta


def _grad_reverse_bwd(beta, g):
    return (-beta * g, None)


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)


class DiscriminatorHead(nn.Module):
    """Linear head (reference src/model/heads.py:4-22)."""

    num_labels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.num_labels, name="linear")(x.reshape(x.shape[0], -1))


class DiscriminatorHeadLarge(nn.Module):
    """3-layer MLP head with ReLU + Dropout(0.5)
    (reference src/model/heads.py:25-50)."""

    num_labels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(hidden, name="dense_0")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(hidden, name="dense_1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_labels, name="dense_2")(x)


class Discriminator(nn.Module):
    """Domain classifier behind a GRL (reference src/model/discriminator.py:29-65).

    ``beta`` is passed per call (the reference mutates it per epoch via
    ``set_beta``; functionally it is just an argument)."""

    num_labels: int
    large: bool = False

    def setup(self):
        head_cls = DiscriminatorHeadLarge if self.large else DiscriminatorHead
        self.head = head_cls(self.num_labels)

    def __call__(
        self,
        input_features: jax.Array,
        labels: Optional[jax.Array] = None,
        beta: float = 0.0,
        use_grad_reverse: bool = True,
        train: bool = False,
    ):
        x = grad_reverse(input_features, beta) if use_grad_reverse else input_features
        logits = self.head(x, train=train)
        loss = cross_entropy(logits, labels) if labels is not None else None
        return DiscOutput(logits=logits, loss=loss)


def entropy_loss(logits: jax.Array) -> jax.Array:
    """HLoss (reference src/model/entropyLoss.py:9-16): mean over the batch of
    the entropy of the softmax distribution."""
    logp = jax.nn.log_softmax(logits, axis=1)
    p = jax.nn.softmax(logits, axis=1)
    return -1.0 * (p * logp).sum(axis=1).mean()
