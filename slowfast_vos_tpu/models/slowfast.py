"""SlowFast temporal fusion over FPN features — whole-clip formulation.

The reference (`code/helpers/model.py:30-165`) runs, for every frame, a
two-pathway stack of *valid* 3D convolutions over a temporal window (fast = F
frames, slow = S centered frames), collapsing time to 1 and emitting a
256-channel map (slow 224 + fast 32) per FPN level, with two fast->slow
lateral fusions (1x1x k_f2s convs). Kernel sizes are derived so three valid
convs collapse each pathway (`model.py:96-109`).

TPU-first redesign: because valid convolutions are translation invariant, the
per-frame sliding-window loop is EXACTLY equivalent to running the same convs
once over the whole zero-padded clip:

* pad the T-frame feature sequence with floor(F/2) zeros left and
  ceil(F/2)-1 zeros right (matching the reference's out-of-range zero padding,
  `model.py:215-225`) -> P of length T+F-1;
* the fast chain consumes P; the slow chain consumes
  P[d : d+T+S-1] with d = floor(F/2) - floor(S/2) (the centered slow window,
  `model.py:242-248,336-338`);
* each lateral fusion is a valid temporal conv of the fast sequence whose
  output aligns index-for-index with the slow sequence (window position p of
  output frame t equals sequence position t+p for both chains, by induction
  over the valid convs);
* after three stages both chains have length exactly T — one output per frame.

A unit test verifies sequence mode == per-window mode to float tolerance.

One divergence: training-mode BatchNorm normalizes over the whole clip here
rather than per window. At inference (running stats) the two are bit-identical;
for training it changes only BN statistics, not model capacity. Quantified
(tests/test_slowfast.py BN A/B): the relative output difference shrinks as
1/spatial-extent — 2.2% at 48x48 feature maps, 1.1% at 96x96, ~0.5%
extrapolated at the production 200x336 P2 map.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def temporal_conv_apply(x, kernel, bias, dtype) -> jnp.ndarray:
    """Valid-time (kt, k, k) conv3d computed as kt summed 2D convs.

    XLA's 2D convolution path is markedly better tuned on TPU than conv3d
    with small temporal kernels (measured 1.44x on the enhance stage at
    production shape, scripts/profile_enhance.py); the math is identical:
    out[t] = sum_i conv2d(x[t + i], w[i]).

    The clip stays a plain 4-d [T, H, W, Cin] NHWC batch throughout — an
    earlier [1, T, H, W, C] carry (a conv3d leftover) made XLA relayout
    every stage boundary between a 5-d {4,1,3,2,0} and the convs' 4-d
    {3,0,2,1} tiling (15.7 ms relu+transpose fusions per superchunk in the
    device trace; scripts/profile_trace.py --mode infer).

    x: [T, H, W, Cin], kernel: [kt, k, k, Cin, Cout] ->
    [T - kt + 1, H, W, Cout]."""
    kt, k = kernel.shape[0], kernel.shape[1]
    xc = x.astype(dtype)
    kc = kernel.astype(dtype)
    tout = x.shape[0] - kt + 1
    p = k // 2
    acc = None
    for i in range(kt):
        o = jax.lax.conv_general_dilated(
            xc[i : i + tout],
            kc[i],
            (1, 1),
            [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        acc = o if acc is None else acc + o
    if bias is not None:
        acc = acc + bias.astype(dtype)
    return acc


class TemporalConv(nn.Module):
    """(kt, k, k) valid-time conv3d (see `temporal_conv_apply`). Parameter
    tree (kernel [kt, k, k, cin, cout] + bias) matches `nn.Conv` exactly, so
    existing checkpoints load unchanged.

    `fold_scale`/`fold_shift` fold a downstream per-channel affine (an
    eval-mode BatchNorm) into the weights in f32 BEFORE the compute-dtype
    cast: conv(x, w*s) + (b*s + shift) == s*(conv(x, w) + b) + shift.

    Setup-style (not compact) so `folded()` can expose the weights to the
    stage-1 slow+fast merged conv (`SlowFastTemporal`) without applying them;
    `cin` is therefore an explicit field. Param paths and init values are
    identical to the previous compact form."""

    features: int
    cin: int
    kt: int
    k: int  # spatial kernel side (3 with SAME-style 1-pad, or 1 with none)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kt, self.k, self.k, self.cin, self.features),
        )
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def folded(
        self,
        fold_scale: jnp.ndarray | None = None,
        fold_shift: jnp.ndarray | None = None,
    ):
        """(kernel, bias) with an optional downstream affine folded in (f32)."""
        kernel = self.kernel
        bias = self.bias if self.use_bias else None
        if fold_scale is not None:
            kernel = kernel * fold_scale
            bias = fold_shift if bias is None else bias * fold_scale + fold_shift
        return kernel, bias

    def __call__(
        self,
        x: jnp.ndarray,
        fold_scale: jnp.ndarray | None = None,
        fold_shift: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """x: [T, H, W, Cin] -> [T - kt + 1, H, W, features]."""
        kernel, bias = self.folded(fold_scale, fold_shift)
        return temporal_conv_apply(x, kernel, bias, self.dtype)


class _BNFold(nn.Module):
    """Eval-mode stand-in for `nn.BatchNorm` that declares the IDENTICAL
    parameter/batch_stats tree (so init in either mode yields the same
    checkpointable structure) but, instead of applying the affine as a
    separate op, RETURNS the folded (scale, shift) for the preceding conv to
    absorb into its weights. Why: the separate f32 BN epilogue made XLA
    materialize f32 side copies of every enhance stage output feeding the
    mask-pool flatten path — a 1.85 GB f32 layout copy per superchunk where
    a bf16 one suffices (device trace, copy.647)."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (self.features,)
        )
        var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (self.features,)
        )
        s = scale * jax.lax.rsqrt(var.value + self.epsilon)
        return s, bias - mean.value * s


def pathway_kernel_sizes(pathway_size: int) -> tuple[int, int, int]:
    """Three valid temporal kernel sizes that collapse `pathway_size` -> 1
    (reference `_calc_kernel_sizes`, model.py:96-103)."""
    div = pathway_size // 3
    rem = pathway_size % 3
    if rem == 0:
        return (div, div + 1, div + 1)
    if rem == 1:
        return (div + 1, div + 1, div + 1)
    return (div + 1, div + 1, div + 2)


def fuse_kernel_size(slow_in: int, slow_kernel: int, fast_in: int, fast_kernel: int):
    """Reference `_calc_fuse_kernel_size` (model.py:105-109)."""
    out_slow = slow_in - slow_kernel + 1
    out_fast = fast_in - fast_kernel + 1
    return out_fast - out_slow + 1, out_slow, out_fast


class SlowFastTemporal(nn.Module):
    """Two-pathway temporal fusion applied to one FPN level of a whole clip.

    Input [T, H, W, C] per-frame features; output [T, H, W, C] temporally
    enhanced features (slow 224 ++ fast 32 channels). The same module instance
    (shared weights) is applied to every FPN level, as in the reference
    (`temporally_enhance_features`, model.py:151-165).
    """

    slow: int = 3
    fast: int = 3
    channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    def _conv_bn(self, x, features, kt, name, train):
        # Eval: fold the running-stat BN affine into the conv weights in f32
        # (`_BNFold`) — the conv emits final bf16 values with no separate f32
        # epilogue. Train: real `nn.BatchNorm` in f32 (batch-stat precision,
        # CLAUDE.md dtype policy) with the OUTPUT cast straight back to the
        # compute dtype: the next consumer is either a TemporalConv that
        # casts to bf16 anyway or a monotone relu/concat, so downstream
        # values are bit-identical while the backward graph stops carrying
        # f32 stage activations (183->166 ms/step together with the compact
        # RPN sampling).
        if not train:
            s, b = _BNFold(features, name=f"{name}_bn")()
            return TemporalConv(
                features, cin=x.shape[-1], kt=kt, k=3, name=f"{name}_conv", dtype=self.dtype
            )(x, s, b)
        x = TemporalConv(
            features, cin=x.shape[-1], kt=kt, k=3, name=f"{name}_conv", dtype=self.dtype
        )(x)
        x = nn.BatchNorm(
            use_running_average=False, momentum=0.9, epsilon=1e-5, name=f"{name}_bn", dtype=jnp.float32
        )(x)
        return x.astype(self.dtype)

    def _fuse(self, x, kt, name, train):
        if not train:
            s, b = _BNFold(64, name=f"{name}_bn")()
            return nn.relu(
                TemporalConv(
                    64, cin=x.shape[-1], kt=kt, k=1, use_bias=False, name=f"{name}_conv", dtype=self.dtype
                )(x, s, b)
            )
        x = TemporalConv(
            64, cin=x.shape[-1], kt=kt, k=1, use_bias=False, name=f"{name}_conv", dtype=self.dtype
        )(x)
        x = nn.BatchNorm(
            use_running_average=False, momentum=0.9, epsilon=1e-5, name=f"{name}_bn", dtype=jnp.float32
        )(x)
        return nn.relu(x.astype(self.dtype))

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False, pre_padded: bool = False) -> jnp.ndarray:
        """feats: [T, H, W, C] per-frame features. With `pre_padded=True` the
        input already carries the F-1 halo frames (zero or real neighbors from
        an adjacent chunk) and the output has T-(F-1) frames — the chunked
        streaming mode used by the sequence-eval driver."""
        s, f = self.slow, self.fast
        ks1, ks2, ks3 = pathway_kernel_sizes(s)
        kf1, kf2, kf3 = pathway_kernel_sizes(f)
        kfuse1, out_s1, out_f1 = fuse_kernel_size(s, ks1, f, kf1)
        kfuse2, _, _ = fuse_kernel_size(out_s1, ks2, out_f1, kf2)

        if pre_padded:
            padded = feats
            t = feats.shape[0] - (f - 1)
        else:
            t = feats.shape[0]
            left = f // 2
            right = -(-f // 2) - 1  # ceil(f/2) - 1
            padded = jnp.pad(feats, ((left, right), (0, 0), (0, 0), (0, 0)))
        d = f // 2 - s // 2

        fast_x = padded  # [T+F-1, H, W, C]
        slow_x = padded[d : d + t + s - 1]

        # Stage 1. When s == f the two pathways' stage-1 convs consume the
        # IDENTICAL input with the same temporal kernel (d == 0, ks1 == kf1),
        # so they run as ONE 256 -> 224 conv with kernels concatenated along
        # cout at apply time: bit-identical outputs, unchanged param tree,
        # one pass over the (GB-scale) input instead of two — and the fast
        # conv's cout=32 (a quarter of one 128-lane MXU tile) stops wasting
        # three quarters of the systolic array on its separate dispatch.
        if s == f:
            cin = padded.shape[-1]
            slow_c = TemporalConv(192, cin=cin, kt=ks1, k=3, name="slow1_conv", dtype=self.dtype)
            fast_c = TemporalConv(32, cin=cin, kt=kf1, k=3, name="fast1_conv", dtype=self.dtype)
            if not train:
                s1s, s1b = _BNFold(192, name="slow1_bn")()
                f1s, f1b = _BNFold(32, name="fast1_bn")()
                sk, sb = slow_c.folded(s1s, s1b)
                fk, fb = fast_c.folded(f1s, f1b)
                merged = nn.relu(
                    temporal_conv_apply(
                        fast_x,
                        jnp.concatenate([sk, fk], axis=-1),
                        jnp.concatenate([sb, fb]),
                        self.dtype,
                    )
                )
                slow_x, fast_x = merged[..., :192], merged[..., 192:]
            else:
                sk, sb = slow_c.folded()
                fk, fb = fast_c.folded()
                merged = temporal_conv_apply(
                    fast_x,
                    jnp.concatenate([sk, fk], axis=-1),
                    jnp.concatenate([sb, fb]),
                    self.dtype,
                )
                bn = lambda v, name: nn.BatchNorm(
                    use_running_average=False, momentum=0.9, epsilon=1e-5,
                    name=name, dtype=jnp.float32,
                )(v).astype(self.dtype)
                slow_x = nn.relu(bn(merged[..., :192], "slow1_bn"))
                fast_x = nn.relu(bn(merged[..., 192:], "fast1_bn"))
        elif not train:
            # s != f, eval: ONE 2D conv over the full padded clip with EVERY
            # stage-1 tap kernel concatenated along cout (slow tap i at
            # channel block i*192, fast tap j at ks1*192 + j*32), then
            # per-pathway shifted-slice adds: slow tap i aligns at clip
            # offset d + i, fast tap j at offset j. Shares the one pass over
            # the GB-scale clip between pathways even though their kt and
            # temporal alignment differ, at the cost of computing the slow
            # taps over F-S extra frames (measured win: 157.6 -> 152.2 ms
            # enhance at 3-7 production shape, scripts/profile_enhance.py
            # variant G; bias added after tap accumulation and cross-tap
            # adds in ascending order, matching temporal_conv_apply).
            #
            # Variant G2 (run the concatenated kernel only over the rows the
            # slow pathway consumes + a fast-only conv on the F-S edge rows,
            # removing the slow-tap waste) was REVERTED from production: the
            # input-row slicing adds a second consumer of the padded clip,
            # and XLA:CPU then fuses the backbone->mask->conv chain
            # differently in the carry vs plain superchunk graphs — bf16-ulp
            # enhance differences that flip NMS ties and break the carry
            # bit-exactness contract (test_carry_path_matches_plain_
            # superchunks; reproduced with a FRESH compile cache) — the same
            # failure mode that reverted the round-3 transform rewrite
            # (CLAUDE.md). The math is exact in f32
            # (test_stage1_cross_pathway_merged_conv_equals_separate
            # transcribes G2); it stays staged in scripts/profile_enhance.py
            # (variant G2) for a TPU-measured, both-backend-revalidated
            # future adoption.
            cin = padded.shape[-1]
            slow_c = TemporalConv(192, cin=cin, kt=ks1, k=3, name="slow1_conv", dtype=self.dtype)
            fast_c = TemporalConv(32, cin=cin, kt=kf1, k=3, name="fast1_conv", dtype=self.dtype)
            s1s, s1b = _BNFold(192, name="slow1_bn")()
            f1s, f1b = _BNFold(32, name="fast1_bn")()
            sk, sb = slow_c.folded(s1s, s1b)
            fk, fb = fast_c.folded(f1s, f1b)
            wcat = jnp.concatenate(
                [sk[i] for i in range(ks1)] + [fk[j] for j in range(kf1)], axis=-1
            )
            y = temporal_conv_apply(padded, wcat[None], None, self.dtype)
            s_len = (t + s - 1) - ks1 + 1
            f_len = (t + f - 1) - kf1 + 1
            s_acc = None
            for i in range(ks1):
                sl = y[d + i : d + i + s_len, :, :, i * 192 : (i + 1) * 192]
                s_acc = sl if s_acc is None else s_acc + sl
            base = ks1 * 192
            f_acc = None
            for j in range(kf1):
                sl = y[j : j + f_len, :, :, base + j * 32 : base + (j + 1) * 32]
                f_acc = sl if f_acc is None else f_acc + sl
            slow_x = nn.relu(s_acc + sb.astype(self.dtype))
            fast_x = nn.relu(f_acc + fb.astype(self.dtype))
        else:
            slow_x = nn.relu(self._conv_bn(slow_x, 192, ks1, "slow1", train))
            fast_x = nn.relu(self._conv_bn(fast_x, 32, kf1, "fast1", train))
        slow_x = jnp.concatenate([slow_x, self._fuse(fast_x, kfuse1, "f2s1", train)], axis=-1)

        # Stage 2
        slow_x = nn.relu(self._conv_bn(slow_x, 192, ks2, "slow2", train))
        fast_x = nn.relu(self._conv_bn(fast_x, 32, kf2, "fast2", train))
        slow_x = jnp.concatenate([slow_x, self._fuse(fast_x, kfuse2, "f2s2", train)], axis=-1)

        # Stage 3 (no relu, reference model.py:143-148)
        slow_x = self._conv_bn(slow_x, 224, ks3, "slow3", train)
        fast_x = self._conv_bn(fast_x, 32, kf3, "fast3", train)

        out = jnp.concatenate([slow_x, fast_x], axis=-1)  # [T, H, W, 256]
        # Keep the compute dtype (bf16 in production): at DAVIS resolution the
        # enhanced pyramid is GBs per superchunk in f32.
        return out.astype(self.dtype)


def enhance_fpn_levels(module_apply, feats: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
    """Apply the (weight-shared) SlowFast module to each FPN level."""
    return [module_apply(f) for f in feats]
