"""ResNet-18/34/50 feature extractor + linear classifier head (flax).

The KWS classifier of both papers: a ResNet whose input channels are the
Whisper-layer axis of the stacked cosine-similarity matrices
(reference: src/model/resnet.py:5-34 — HF ResNetModel, resnet-50 config,
num_channels=12; src/efficient_kws/resnet.py:7-58 — configurable
resnet-18/34/50 with num_channels=n_layers).

Architecture matches HF ``ResNetModel`` exactly (so results and, via the
converter in tests, weights are interchangeable):

* embedder: 7x7 conv stride 2 (pad 3, no bias) + BatchNorm + ReLU,
  then 3x3 max-pool stride 2 pad 1;
* 4 stages; bottleneck blocks (1x1 reduce /4 → 3x3 (stride) → 1x1 expand)
  for resnet-50, basic blocks (3x3 → 3x3) for 18/34; shortcut is a strided
  1x1 conv + BN when shape changes; stage strides (1, 2, 2, 2)
  (``downsample_in_first_stage=False``);
* pooler: global average pool.

TPU-first: internal layout is NHWC (channels-last — the TPU-native conv
layout), inputs arrive NCHW ([batch, layers, T_kwd, T_utt]) and are
transposed once at entry.  Compute dtype is configurable (bfloat16 for
training throughput) with float32 parameters and batch stats.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    num_channels: int = 12
    embedding_size: int = 64
    hidden_sizes: Sequence[int] = (256, 512, 1024, 2048)
    depths: Sequence[int] = (3, 4, 6, 3)
    layer_type: str = "bottleneck"  # "bottleneck" | "basic"
    num_labels: int = 2
    downsample_in_first_stage: bool = False

    @classmethod
    def from_version(cls, version: str, num_channels: int, num_labels: int = 2) -> "ResNetConfig":
        """Reference's version switch (src/efficient_kws/resnet.py:23-30)."""
        if version == "resnet-18":
            return cls(num_channels, 64, (64, 128, 256, 512), (2, 2, 2, 2), "basic", num_labels)
        if version == "resnet-34":
            return cls(num_channels, 64, (64, 128, 256, 512), (3, 4, 6, 3), "basic", num_labels)
        if version == "resnet-50":
            return cls(num_channels=num_channels, num_labels=num_labels)
        raise ValueError(f"unknown resnet version: {version}")


class ConvNormAct(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            name="convolution",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="normalization",
        )(x)
        if self.act:
            x = nn.relu(x)
        return x


class ShortCut(nn.Module):
    out_channels: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels,
            (1, 1),
            strides=(self.stride, self.stride),
            use_bias=False,
            dtype=self.dtype,
            name="convolution",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="normalization",
        )(x)
        return x


class BottleneckBlock(nn.Module):
    out_channels: int
    stride: int = 1
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        needs_shortcut = in_channels != self.out_channels or self.stride != 1
        residual = x
        if needs_shortcut:
            residual = ShortCut(self.out_channels, self.stride, self.dtype, name="shortcut")(
                x, train
            )
        reduced = self.out_channels // self.reduction
        x = ConvNormAct(reduced, 1, 1, dtype=self.dtype, name="layer_0")(x, train)
        x = ConvNormAct(reduced, 3, self.stride, dtype=self.dtype, name="layer_1")(x, train)
        x = ConvNormAct(self.out_channels, 1, 1, act=False, dtype=self.dtype, name="layer_2")(
            x, train
        )
        return nn.relu(x + residual)


class BasicBlock(nn.Module):
    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        needs_shortcut = in_channels != self.out_channels or self.stride != 1
        residual = x
        if needs_shortcut:
            residual = ShortCut(self.out_channels, self.stride, self.dtype, name="shortcut")(
                x, train
            )
        x = ConvNormAct(self.out_channels, 3, self.stride, dtype=self.dtype, name="layer_0")(
            x, train
        )
        x = ConvNormAct(self.out_channels, 3, 1, act=False, dtype=self.dtype, name="layer_1")(
            x, train
        )
        return nn.relu(x + residual)


class ResNet(nn.Module):
    """Feature extractor: NCHW input -> pooled [batch, hidden_sizes[-1]].

    ``channels_last=True`` accepts NHWC input directly (no transpose): the
    catalog scorer emits similarity maps channels-last so the stem conv
    reads them without a 100s-of-MB layout copy (profiled on v5e: the
    NCHW->NHWC copy was ~7% of catalog-scoring runtime).
    """

    config: ResNetConfig
    dtype: Any = jnp.float32
    channels_last: bool = False
    # Rematerialize each residual block's activations in the backward pass
    # (jax.checkpoint via the lifted nn.remat). Numerically identical;
    # shrinks the live-activation working set so larger train batches fit
    # without HBM spills (the batch-64 regression in docs/PERF.md).
    remat: bool = False

    @nn.compact
    def __call__(self, pixel_values, train: bool = False):
        cfg = self.config
        if self.channels_last:
            x = pixel_values.astype(self.dtype)  # already NHWC
        else:
            x = jnp.transpose(pixel_values.astype(self.dtype), (0, 2, 3, 1))  # NCHW -> NHWC

        # embedder
        x = ConvNormAct(cfg.embedding_size, 7, 2, dtype=self.dtype, name="embedder")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block = BottleneckBlock if cfg.layer_type == "bottleneck" else BasicBlock

        def _call_block(mdl, h):
            # `train` rides the closure so jax.checkpoint only sees arrays
            return mdl(h, train)

        call_block = nn.remat(_call_block) if self.remat else _call_block
        for stage_idx, (width, depth) in enumerate(zip(cfg.hidden_sizes, cfg.depths)):
            first_stride = (
                2 if (stage_idx > 0 or cfg.downsample_in_first_stage) else 1
            )
            for block_idx in range(depth):
                blk = block(
                    width,
                    stride=first_stride if block_idx == 0 else 1,
                    dtype=self.dtype,
                    name=f"stage_{stage_idx}_block_{block_idx}",
                )
                x = call_block(blk, x)

        # pooler: global average pool == AdaptiveAvgPool2d((1, 1))
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


class ResNetClassifier(nn.Module):
    """ResNet feature extractor + linear head (reference src/model/resnet.py:24-27).

    Returns (logits, pooled_features); the pooled features feed the domain
    discriminator in adversarial training (src/model/model.py:83-93).
    """

    config: ResNetConfig
    dtype: Any = jnp.float32
    channels_last: bool = False
    remat: bool = False

    def setup(self):
        self.feature_extractor = ResNet(
            self.config,
            dtype=self.dtype,
            channels_last=self.channels_last,
            remat=self.remat,
        )
        self.classifier = nn.Dense(self.config.num_labels, name="classifier")

    def __call__(self, pixel_values, train: bool = False):
        features = self.feature_extractor(pixel_values, train)
        logits = self.classifier(features)
        return logits, features
