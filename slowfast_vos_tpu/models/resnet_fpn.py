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

import jax
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


def stem_kernel_from_s2d(w44: "np.ndarray"):
    """Inverse of `stem_kernel_to_s2d`: [4,4,12,64] -> [7,7,3,64].

    Each 7x7 tap (ei, ej) lives at exactly one (ki, pi, kj, pj) with
    e = 2(k-2)+p, p = e mod 2 — exact for kernels produced by
    `stem_kernel_to_s2d` (round-trip test in tests/test_s2d_stem.py).
    The s2d kernel's (k=0, p=0) slots correspond to tap e=-4, outside the
    7x7 receptive field: they are zero in migrated kernels but TRAINABLE in
    OSVOS / trainable_backbone_layers=5 fine-tunes, so a fine-tuned s2d
    checkpoint may carry signal there that this map must drop. We warn when
    the dropped mass is non-negligible instead of silently losing it."""
    import numpy as np

    assert tuple(w44.shape[:2]) == (4, 4)
    c = w44.shape[2] // 4
    w44 = np.asarray(w44)
    # Slots with ei=-4 (ki=0, pi=0 -> channel groups 0,1) or ej=-4
    # (kj=0, pj=0 -> channel groups 0,2) fall outside the 7x7 kernel.
    dropped = float(
        np.abs(w44[0, :, : 2 * c]).sum() + np.abs(w44[:, 0, 0 * c : 1 * c]).sum() + np.abs(w44[:, 0, 2 * c : 3 * c]).sum()
    )
    if dropped > 1e-6 * max(1.0, float(np.abs(w44).sum())):
        import warnings

        warnings.warn(
            f"stem_kernel_from_s2d: dropping non-zero e=-4 taps (|sum|={dropped:.3e}) "
            "from a fine-tuned s2d stem; the migration is lossy for this checkpoint.",
            stacklevel=2,
        )
    out = np.zeros((7, 7, c, w44.shape[3]), w44.dtype)
    for ei in range(-3, 4):
        pi = ei % 2
        ki = (ei - pi) // 2 + 2
        for ej in range(-3, 4):
            pj = ej % 2
            kj = (ej - pj) // 2 + 2
            out[ei + 3, ej + 3] = w44[ki, kj, (pi * 2 + pj) * c : (pi * 2 + pj + 1) * c]
    return out


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
    # Stem choice, settled by direct A/B at the production canvas
    # ([34,768,1344,3], scripts/profile_backbone_variants.py, v5e round 4):
    # naive 7x7/s2 16.2 ms < W-fold-s2d 17.6 < full s2d(2) 23.6 (RTT-corrected).
    # The round-2 "s2d is 4x cheaper" result does not reproduce at this shape:
    # the python-transpose s2d feeds the conv through ~5 ms of relayout copies
    # (trace: copy.120-122) and the 12-channel conv still runs at ~7% MXU, so
    # the standard stem is BOTH simplest and fastest; s2d stays available for
    # old checkpoints (exact both-way kernel remaps + migrate_params).
    s2d_stem: bool = False

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


class _SmoothConv3x3(nn.Module):
    """3x3 SAME conv with the kernel exposed for composition. Param tree
    (kernel [3,3,cin,features] + bias) is byte-identical to
    `nn.Conv(features, (3, 3))`, so checkpoints are unaffected."""

    features: int
    cin: int
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, self.cin, self.features)
        )
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def __call__(self, x):
        x, kernel, bias = nn.dtypes.promote_dtype(x, self.kernel, self.bias, dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias

    def upsampled_kernel(self):
        """K (*) ones(2,2) in f32: conv3x3(nearest_up2(x)) ==
        conv(x, upsampled_kernel, lhs_dilation=2, padding=2) exactly
        (composition of correlations; verified vs the materialized upsample in
        tests/test_torch_parity.py::test_fpn_dilated_p2_combine_matches_materialized
        and scripts/profile_backbone_variants.py)."""
        k = self.kernel.astype(jnp.float32)
        cin, cout = k.shape[2], k.shape[3]
        k4 = jax.lax.conv_general_dilated(
            k.transpose(2, 3, 0, 1).reshape(-1, 1, 3, 3),
            jnp.ones((1, 1, 2, 2), jnp.float32),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return k4.reshape(cin, cout, 4, 4).transpose(2, 3, 0, 1)


class FPN(nn.Module):
    """Lateral 1x1 + top-down nearest-upsample + 3x3 smoothing, 256 channels,
    plus the extra stride-64 'pool' level used only by the RPN.

    The FINAL top-down level (P2, the full-resolution one) never materializes
    `lat + up(P3)`: since no deeper level consumes that sum, it is rewritten
    as smooth(lat) + conv(P3, K (*) ones(2,2), lhs_dilation=2) — the
    zero-stuffed transposed-conv identity for conv-of-nearest-upsample. The
    materialized form's broadcast/reshape/add chain cost ~13 ms/superchunk on
    v5e (trace round 4: broadcast.4 + reshape.44 + fusion.15 at a T(2,128)
    tile); the dilated-conv form measured 27.5 vs 32.8 ms for the whole P2
    combine+smooth (scripts/profile_backbone_variants.py). Upper levels keep
    the exact broadcast-add (their sums feed the chain and are cheap at
    <=1/4 the pixels). Values differ from the sum-then-smooth form only at
    bf16 ulp (conv(a)+conv(b) vs conv(a+b)); with f32 compute it is exact to
    normal accumulation tolerance
    (tests/test_torch_parity.py::test_fpn_dilated_p2_combine_matches_materialized)."""

    out_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, inputs):
        laterals = [
            Conv1x1MM(self.out_channels, use_bias=True, name=f"inner_{i}", dtype=self.dtype)(c)
            for i, c in enumerate(inputs)
        ]

        def combine(lat, prev):
            h, w = lat.shape[-3:-1]
            ph, pw = prev.shape[-3:-1]
            if (h, w) == (2 * ph, 2 * pw):
                lat6 = lat.reshape(*lat.shape[:-3], ph, 2, pw, 2, lat.shape[-1])
                return (lat6 + prev[..., :, None, :, None, :]).reshape(lat.shape)
            up = jnp.repeat(jnp.repeat(prev, 2, axis=-3), 2, axis=-2)[..., :h, :w, :]
            return lat + up

        sums = [None] * len(laterals)
        prev = laterals[-1]
        sums[-1] = prev
        for i in range(len(laterals) - 2, 0, -1):
            prev = combine(laterals[i], prev)
            sums[i] = prev

        lat0 = laterals[0]
        smooth0 = _SmoothConv3x3(
            self.out_channels, cin=lat0.shape[-1], name="layer_0", dtype=self.dtype
        )
        h, w = lat0.shape[-3:-1]
        ph, pw = prev.shape[-3:-1]
        if len(laterals) == 1:
            # Single level: nothing above to combine with (prev aliases lat0).
            out0 = smooth0(lat0)
        elif (h, w) == (2 * ph, 2 * pw):
            k4 = smooth0.upsampled_kernel().astype(self.dtype)
            up_part = jax.lax.conv_general_dilated(
                prev, k4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out0 = smooth0(lat0) + up_part
        else:
            out0 = smooth0(combine(lat0, prev))

        outs = [out0] + [
            conv(self.out_channels, 3, name=f"layer_{i}", use_bias=True, dtype=self.dtype)(sums[i])
            for i in range(1, len(laterals))
        ]
        pool = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return outs + [pool]  # P2, P3, P4, P5, P6('pool')


class ResNet50FPN(nn.Module):
    """Full backbone: images [N, H, W, 3] -> 5 FPN maps (strides 4..64)."""

    dtype: jnp.dtype = jnp.bfloat16
    # Default matches ResNet50 / SlowFastMaskRCNN / build_pipeline (standard
    # 7x7 stem is production since round 4); bare ResNet50FPN() now builds
    # the production graph.
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x):
        cs = ResNet50(dtype=self.dtype, s2d_stem=self.s2d_stem, name="body")(x.astype(self.dtype))
        return FPN(dtype=self.dtype, name="fpn")(cs)


FPN_STRIDES = (4, 8, 16, 32, 64)
