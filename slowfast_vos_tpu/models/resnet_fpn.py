"""ResNet-50 + Feature Pyramid Network backbone, channels-last, TPU-first.

TPU-native equivalent of torchvision's `resnet_fpn_backbone` that the reference
drives per frame at `code/helpers/model.py:204` (SURVEY.md §2b). Differences
from a naive translation:

* NHWC layout end to end (XLA's preferred conv layout on TPU; convs land on
  the MXU as large implicit GEMMs).
* FrozenBatchNorm folds to scale+shift (the backbone is frozen in every
  reference workload), so each block is conv->affine->relu, fully fusible.
* Whole clips are processed as one [T, H, W, C] batch — the reference's
  per-frame Python loop + feature cache (`model.py:188-227`) becomes a single
  batched forward; caching is unnecessary because nothing is recomputed.
* `compute_dtype=bfloat16` by default: frozen weights cast on the fly; all
  conv math in bf16 on the MXU, FPN accumulation still in bf16 (validated to
  be well within detection tolerance).

Structure and parameter naming mirror torchvision closely so that
`convert/torchvision_weights.py` is a mechanical rename.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from slowfast_vos_tpu.models.layers import FrozenBatchNorm, conv


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) with projection shortcut on first block."""

    features: int
    stride: int = 1
    use_projection: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if self.use_projection:
            shortcut = conv(self.features * 4, 1, self.stride, name="downsample_conv", dtype=self.dtype)(x)
            shortcut = FrozenBatchNorm(self.features * 4, name="downsample_bn")(shortcut)
        y = conv(self.features, 1, name="conv1", dtype=self.dtype)(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, 3, self.stride, name="conv2", dtype=self.dtype)(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * 4, 1, name="conv3", dtype=self.dtype)(y)
        y = FrozenBatchNorm(self.features * 4, name="bn3")(y)
        return nn.relu(y + shortcut)


class ResNet50(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False, name="conv1", dtype=self.dtype)(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        features = 64
        for stage, nblocks in enumerate(self.stage_sizes):
            stride = 1 if stage == 0 else 2
            for i in range(nblocks):
                x = Bottleneck(
                    features,
                    stride=stride if i == 0 else 1,
                    use_projection=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x)
            outs.append(x)
            features *= 2
        return outs  # [C2 (/4), C3 (/8), C4 (/16), C5 (/32)]


class FPN(nn.Module):
    """Lateral 1x1 + top-down nearest-upsample + 3x3 smoothing, 256 channels,
    plus the extra stride-64 'pool' level used only by the RPN."""

    out_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True, name=f"inner_{i}", dtype=self.dtype)(c)
            for i, c in enumerate(inputs)
        ]
        outs = [None] * len(laterals)
        prev = laterals[-1]
        outs[-1] = prev
        for i in range(len(laterals) - 2, -1, -1):
            h, w = laterals[i].shape[-3:-1]
            up = jnp.repeat(jnp.repeat(prev, 2, axis=-3), 2, axis=-2)[..., :h, :w, :]
            prev = laterals[i] + up
            outs[i] = prev
        outs = [
            conv(self.out_channels, 3, name=f"layer_{i}", use_bias=True, dtype=self.dtype)(o)
            for i, o in enumerate(outs)
        ]
        pool = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return outs + [pool]  # P2, P3, P4, P5, P6('pool')


class ResNet50FPN(nn.Module):
    """Full backbone: images [N, H, W, 3] -> 5 FPN maps (strides 4..64)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cs = ResNet50(dtype=self.dtype, name="body")(x.astype(self.dtype))
        return FPN(dtype=self.dtype, name="fpn")(cs)


FPN_STRIDES = (4, 8, 16, 32, 64)
