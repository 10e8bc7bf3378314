"""Paper-2 KWS model: L / LE / LEF projection variants (flax).

Re-implementation of ``src/efficient_kws/model.py:18-221``:

* **L** (``learn_features=False``): eps-stabilized cosine-similarity
  matrices over the raw Whisper embeddings, one channel per layer, fed to a
  configurable ResNet (18/34/50);
* **LE** (``proj_mlp=True``): a per-layer MLP
  ``Linear(D, D/2) → ReLU → Linear(D/2, proj_mlp_units)`` projects both
  sides before the similarity (model.py:92-104);
* **LEF** (``frames_conv=True``): additionally a per-layer temporal
  ``Conv1d(U, U, k=3, s=1, p=1) → BatchNorm1d → MaxPool1d(k=3, s=2, p=1)``
  halves the frame axis (model.py:107-124).

Masking: padded frames are zeroed via
``sim * utt_mask[:, :, None, :] * kwd_mask[:, :, :, None]``
(model.py:187-191).  NOTE: the reference passes full-length masks into the
LEF path, where the frame axes have been halved — the shipped code raises a
broadcast error (verified empirically).  Here LEF masks are max-pooled with
the same (k=3, s=2, p=1) window, the semantically faithful repair: a pooled
frame is valid iff any frame in its window was.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.resnet import ResNet, ResNetConfig


@dataclasses.dataclass(frozen=True)
class EfficientKWSConfig:
    """Mirror of the reference hyperparameters (model.py:19-58)."""

    n_layers: int = 3
    embedding_dim: int = 1024
    learn_features: bool = False
    proj_mlp: bool = False
    proj_mlp_units: int = 64
    frames_conv: bool = False
    resnet_version: str = "resnet-50"
    threshold: float = 0.5

    def resnet_config(self) -> ResNetConfig:
        return ResNetConfig.from_version(self.resnet_version, self.n_layers, 2)


class PerLayerMLP(nn.Module):
    embedding_dim: int
    units: int
    n_layers: int
    dtype: Any = None  # compute dtype (params stay f32); None = float32

    @nn.compact
    def __call__(self, x):  # [B, L, T, D] -> [B, L, T, units]
        outs = []
        for i in range(self.n_layers):
            h = nn.Dense(self.embedding_dim // 2, name=f"proj_{i}_0",
                         dtype=self.dtype)(x[:, i])
            h = nn.relu(h)
            h = nn.Dense(self.units, name=f"proj_{i}_1", dtype=self.dtype)(h)
            outs.append(h)
        return jnp.stack(outs, axis=1)


class PerLayerTimeConv(nn.Module):
    units: int
    n_layers: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, L, T, U] -> [B, L, ceil(T/2), U]
        outs = []
        for i in range(self.n_layers):
            h = nn.Conv(
                self.units, (3,), strides=(1,), padding=[(1, 1)], name=f"conv_{i}",
                dtype=self.dtype,
            )(x[:, i])
            # BatchNorm stays in f32 (the bf16-compute/f32-state recipe —
            # stats reductions are the numerically-required f32 part)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn_{i}",
            )(h.astype(jnp.float32))
            if self.dtype is not None:
                h = h.astype(self.dtype)
            h = nn.max_pool(h, (3,), strides=(2,), padding=[(1, 1)])
            outs.append(h)
        return jnp.stack(outs, axis=1)


def _safe_normalize(x: jax.Array, eps: float) -> jax.Array:
    """x / max(||x||, eps) with a finite gradient at x == 0.

    ``jnp.linalg.norm`` backprops nan at exactly-zero vectors (0/0 in the
    sqrt VJP) even under a ``maximum`` clamp; torch defines that gradient as
    0, which is what zero-padded frames need (they occur whenever a
    zero-init projector maps padding to exactly 0 — LE training diverged on
    this).  Clamping the SQUARED norm before the sqrt keeps both value and
    gradient finite and matches the reference's clamp semantics
    (model.py:210-218).
    """
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


def sim_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-6) -> jax.Array:
    """model.py:210-218 (norms clamped at eps)."""
    a = _safe_normalize(a, eps)
    b = _safe_normalize(b, eps)
    return jnp.einsum("...ud,...kd->...uk", a, b, precision="highest",
                      preferred_element_type=jnp.float32)


def masked_sims(kwd, utt, kwd_mask=None, utt_mask=None) -> jax.Array:
    """The similarity-map construction of ``_classify``: per-layer cosine
    sim stacked into channels [B, L, T_k, T_u], padded frames zeroed
    (reference model.py:174-191; the [T_u, T_k] bmm output is permuted).
    A [1, ...] utterance broadcasts against B keywords."""
    n_keywords = kwd.shape[0]
    if utt.shape[0] == 1 and n_keywords > 1:
        utt = jnp.broadcast_to(utt, (n_keywords, *utt.shape[1:]))
        if utt_mask is not None:
            utt_mask = jnp.broadcast_to(utt_mask, (n_keywords, *utt_mask.shape[1:]))
    sims = jnp.einsum(
        "blud,blkd->blku",
        _safe_normalize(utt, 1e-6),
        _safe_normalize(kwd, 1e-6),
        precision="highest",
        preferred_element_type=jnp.float32,
    )
    if utt_mask is not None:
        sims = sims * utt_mask[:, :, None, :]
    if kwd_mask is not None:
        sims = sims * kwd_mask[:, :, :, None]
    return sims


def _pool_mask(mask: jax.Array) -> jax.Array:
    """Max-pool [B, L, T] masks with (k=3, s=2, p=1), matching the LEF
    frame halving."""
    b, l, t = mask.shape
    return nn.max_pool(
        mask.reshape(b * l, t, 1), (3,), strides=(2,), padding=[(1, 1)]
    ).reshape(b, l, -1)


class EfficientKWSModel(nn.Module):
    config: EfficientKWSConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.model = ResNet(cfg.resnet_config(), dtype=self.dtype)
        self.classifier = nn.Dense(2, name="classifier")
        # dtype=jnp.float32 (the default) keeps the projection stack in f32;
        # bf16 runs the Dense/Conv matmuls — ~75% of the train-step FLOPs —
        # at MXU rate with f32 params/BN (the paper-1 recipe, docs/PERF.md)
        proj_dtype = None if self.dtype == jnp.float32 else self.dtype
        if cfg.learn_features and cfg.proj_mlp:
            self.projector = PerLayerMLP(
                cfg.embedding_dim, cfg.proj_mlp_units, cfg.n_layers,
                dtype=proj_dtype,
            )
            if cfg.frames_conv:
                self.time_projector = PerLayerTimeConv(
                    cfg.proj_mlp_units, cfg.n_layers, dtype=proj_dtype
                )

    def project(self, features: jax.Array, mask: Optional[jax.Array] = None,
                train: bool = False):
        """The learned projection stack alone: [B, L, T, D] → ([B, L, T', U],
        pooled mask).  Used standalone to PRE-PROJECT large keyword catalogs
        (the 100k open-vocab configuration stores 64-dim projected reps on
        device instead of raw 1024-dim embeddings — SURVEY.md §7 hard parts)."""
        cfg = self.config
        if cfg.learn_features and cfg.proj_mlp:
            x = self.projector(features)
            if cfg.frames_conv:
                x = self.time_projector(x, train=train)
                if mask is not None:
                    mask = _pool_mask(mask)
            return x, mask
        return features, mask

    def classify_projected(
        self,
        kwd: jax.Array,
        utt: jax.Array,
        kwd_mask: Optional[jax.Array] = None,
        utt_mask: Optional[jax.Array] = None,
        train: bool = False,
    ):
        """Similarity + ResNet over ALREADY-projected features (masks must be
        the pooled ones returned by :meth:`project`)."""
        return self._classify(kwd, utt, kwd_mask, utt_mask, train)

    def __call__(
        self,
        kwd_features: jax.Array,  # [B, L, T_k, D]
        utt_features: jax.Array,  # [B_u, L, T_u, D] (B_u may be 1 at eval)
        kwd_mask: Optional[jax.Array] = None,  # [B, L, T_k]
        utt_mask: Optional[jax.Array] = None,  # [B_u, L, T_u]
        train: bool = False,
    ):
        kwd, kwd_mask = self.project(kwd_features, kwd_mask, train=train)
        utt, utt_mask = self.project(utt_features, utt_mask, train=train)
        return self._classify(kwd, utt, kwd_mask, utt_mask, train)

    def _classify(self, kwd, utt, kwd_mask, utt_mask, train: bool):
        sims = masked_sims(kwd, utt, kwd_mask, utt_mask)
        pooled = self.model(sims, train=train)
        logits = self.classifier(pooled)
        return logits, sims
