"""Shared flax building blocks."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine params.

    torchvision's `maskrcnn_resnet50_fpn` uses FrozenBatchNorm2d throughout the
    backbone (the reference additionally freezes backbone+RPN weights at
    `code/helpers/model.py:176-179`), so the TPU backbone never needs batch
    statistics: BN folds into a per-channel scale+shift that XLA fuses into the
    adjacent convolution.
    """

    features: int
    eps: float = 1e-5  # torchvision FrozenBatchNorm2d adds eps=1e-5 at call time

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # Compute the fold in f32, apply in the activation dtype.
        w = (scale / jnp.sqrt(var + self.eps)).astype(x.dtype)
        b = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(x.dtype)
        return x * w + b


def conv(features, kernel, stride=1, *, use_bias=False, name=None, dtype=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=use_bias,
        name=name,
        dtype=dtype,
    )
