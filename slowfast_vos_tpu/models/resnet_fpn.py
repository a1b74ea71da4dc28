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

from slowfast_vos_tpu.models.layers import Conv1x1MM, FrozenBatchNorm, conv


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


def space_to_depth(x, factor: int = 2):
    """[N, H, W, C] -> [N, H/f, W/f, f*f*C], channel order (p, q, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // factor, w // factor, factor * factor * c)


def stem_kernel_to_s2d(w7: "np.ndarray"):
    """Map the standard 7x7/s2 stem kernel [7,7,3,64] onto the equivalent
    4x4/s1 kernel [4,4,12,64] over the space-to-depth(2) input.

    out[i,j] = sum_e w[e+3] x[2i+e]  ==  sum_{k,p} K[k, (p,·,c)] y[i+k-2, ·]
    with e = 2(k-2)+p; the tap e=-4 (k=0, p=0) is zero. Exact — verified in
    tests/test_s2d_stem.py.
    """
    import numpy as np

    kh, kw, c, o = w7.shape
    assert (kh, kw) == (7, 7)
    out = np.zeros((4, 4, 4 * c, o), w7.dtype)
    for ki in range(4):
        for pi in range(2):
            ei = 2 * (ki - 2) + pi
            if not (-3 <= ei <= 3):
                continue
            for kj in range(4):
                for pj in range(2):
                    ej = 2 * (kj - 2) + pj
                    if not (-3 <= ej <= 3):
                        continue
                    out[ki, kj, (pi * 2 + pj) * c : (pi * 2 + pj + 1) * c] = w7[ei + 3, ej + 3]
    return out


class ResNet50(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    # Space-to-depth stem: the naive 7x7/s2 conv over 3 channels pads 3->128
    # MXU lanes (measured 16 ms of a 37 ms backbone pass on v5e); the exact
    # s2d(2) reformulation runs it over 12 channels at a quarter the cost.
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, x):
        if self.s2d_stem:
            y = space_to_depth(x, 2)
            x = nn.Conv(
                64, (4, 4), strides=(1, 1), padding=[(2, 1), (2, 1)],
                use_bias=False, name="conv1", dtype=self.dtype,
            )(y)
        else:
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
            Conv1x1MM(self.out_channels, use_bias=True, name=f"inner_{i}", dtype=self.dtype)(c)
            for i, c in enumerate(inputs)
        ]
        outs = [None] * len(laterals)
        prev = laterals[-1]
        outs[-1] = prev
        for i in range(len(laterals) - 2, -1, -1):
            lat = laterals[i]
            h, w = lat.shape[-3:-1]
            ph, pw = prev.shape[-3:-1]
            if (h, w) == (2 * ph, 2 * pw):
                # Nearest 2x upsample expressed as a broadcast INSIDE the add
                # (reshape H/W into (h, 2)/(w, 2) pairs — a bitcast in the
                # C-minor conv layout) instead of a materialized repeat: the
                # repeat form cost ~5 ms/superchunk of standalone broadcast
                # ops in the device trace. Same value pairing, bit-identical.
                lat6 = lat.reshape(*lat.shape[:-3], ph, 2, pw, 2, lat.shape[-1])
                prev = (lat6 + prev[..., :, None, :, None, :]).reshape(lat.shape)
            else:
                up = jnp.repeat(jnp.repeat(prev, 2, axis=-3), 2, axis=-2)[..., :h, :w, :]
                prev = lat + up
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
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, x):
        cs = ResNet50(dtype=self.dtype, s2d_stem=self.s2d_stem, name="body")(x.astype(self.dtype))
        return FPN(dtype=self.dtype, name="fpn")(cs)


FPN_STRIDES = (4, 8, 16, 32, 64)
