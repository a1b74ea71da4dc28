"""Shared flax building blocks."""
from __future__ import annotations

import jax
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


class Conv1x1MM(nn.Module):
    """1x1 convolution applied as a plain [M, cin] @ [cin, cout] matmul.

    The parameter tree (kernel [1, 1, cin, features] lecun-normal + optional
    bias zeros) is byte-identical to `nn.Conv(features, (1, 1))`, so existing
    checkpoints and the torchvision weight converter are unaffected. Why not
    nn.Conv: XLA:TPU's convolution dispatch at kernel size 1 measured ~5x
    slower than the equivalent dot_general at production P2 shape
    ([34,192,336,64] -> 256: ~8.3 vs ~1.5 ms overhead-corrected,
    scripts/profile_conv.py) — the conv path pays windowing bookkeeping for a
    contraction that is already a matmul. Bottleneck 1x1s carry ~2/3 of the
    backbone's FLOPs, so this is the backbone's main occupancy lever.

    `stride > 1` subsamples rows/cols first (exactly what a padding-0
    strided 1x1 conv computes — torchvision's downsample conv picks the
    top-left element of each stride block).
    """

    features: int
    stride: int = 1
    use_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, cin, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if self.stride != 1:
            x = x[..., :: self.stride, :: self.stride, :]
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.dot_general(
            x.reshape(-1, cin), kernel[0, 0], (((1,), (0,)), ((), ()))
        ).reshape(*x.shape[:-1], self.features)
        if bias is not None:
            y = y + bias
        return y


def conv(features, kernel, stride=1, *, use_bias=False, name=None, dtype=None):
    if kernel == 1:
        return Conv1x1MM(
            features, stride=stride, use_bias=use_bias, name=name, dtype=dtype
        )
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=use_bias,
        name=name,
        dtype=dtype,
    )
