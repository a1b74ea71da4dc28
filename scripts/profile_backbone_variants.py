#!/usr/bin/env python
"""A/B device timing of backbone formulation variants, driven by the round-4
trace findings (scripts/profile_trace.py --mode backbone): of the 157.5 ms
device backbone step, 36.6 ms is 'data formatting' (layout copies), the s2d
stem conv runs at ~7% occupancy behind three relayout copies, and the FPN P2
broadcast-upsample-add chain costs ~13 ms.

Variants measured here (each timed loop ends with a scalar fetch, CLAUDE.md):

  stem    A: current s2d(2) python-transpose + 4x4 conv
          B: W-only fold (NHWC [N,H,W,C] -> [N,H,W/2,2C] is a pure bitcast in
             row-major; H handled by conv stride 2) + 7x4 conv
          C: naive 7x7/s2 conv over 3 channels (the round-2 loser, re-pinned)
  l1      A: bottleneck chain with Conv1x1MM reshape-to-2d dot (current)
          B: same chain with the dot taken directly over the 4-d array
             (contract axis -1; no reshape to pin the layout)
  fpn-up  A: 6-d reshape broadcast-add (current)
          B: materialized jnp.repeat + add
          C: lat + zero-stuffed transposed-conv form
             conv3x3(up2(x)) == conv_general_dilated(x, K (*) ones(2,2),
             lhs_dilation=2) -- measured fused with the smoothing conv

Run on TPU:  python scripts/profile_backbone_variants.py [--which stem,l1,fpn]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=34)
    p.add_argument("--which", default="stem,l1,fpn")
    args = p.parse_args()
    which = set(args.which.split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    t = args.frames
    hc, wc = 768, 1344
    rng = np.random.default_rng(0)

    def timeit(name, fn, *a):
        out = fn(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(jnp.sum(jax.tree.leaves(fn(*a))[0]))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:46s} {best * 1e3:8.1f} ms", flush=True)
        return out

    if "stem" in which:
        x = jnp.asarray(rng.normal(size=(t, hc, wc, 3)).astype(np.float32))
        w7 = rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.05
        from slowfast_vos_tpu.models.resnet_fpn import space_to_depth, stem_kernel_to_s2d

        w44 = jnp.asarray(stem_kernel_to_s2d(w7))
        # W-only fold kernel [7, 4, 6, 64]: out[j] = sum_e w[e+3] x[2j+e],
        # x folded pairs (2j', q) -> col 2j'+q; e = 2(kj-2)+q.
        w74 = np.zeros((7, 4, 6, 64), np.float32)
        for kj in range(4):
            for q in range(2):
                e = 2 * (kj - 2) + q
                if -3 <= e <= 3:
                    w74[:, kj, q * 3 : (q + 1) * 3] = w7[:, e + 3]
        w74 = jnp.asarray(w74)
        w7j = jnp.asarray(w7)

        def stem_tail(y):
            y = nn.relu(y * 1.01 + 0.02)
            return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        @jax.jit
        def stem_a(x):
            y = space_to_depth(x.astype(jnp.bfloat16), 2)
            y = jax.lax.conv_general_dilated(
                y, w44.astype(jnp.bfloat16), (1, 1), [(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return stem_tail(y)

        @jax.jit
        def stem_b(x):
            xb = x.astype(jnp.bfloat16)
            y = xb.reshape(t, hc, wc // 2, 6)  # pure bitcast in NHWC row-major
            y = jax.lax.conv_general_dilated(
                y, w74.astype(jnp.bfloat16), (2, 1), [(3, 3), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return stem_tail(y)

        @jax.jit
        def stem_c(x):
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w7j.astype(jnp.bfloat16), (2, 2),
                [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return stem_tail(y)

        a = timeit("stem A: s2d(2) transpose + 4x4 (current)", stem_a, x)
        b = timeit("stem B: W-fold bitcast + 7x4 s(2,1)", stem_b, x)
        c = timeit("stem C: naive 7x7/s2 cin=3", stem_c, x)
        for n, v in (("B", b), ("C", c)):
            d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - v.astype(jnp.float32))))
            print(f"  |A-{n}| max = {d:.3e}")

    if "l1" in which:
        # layer1-shaped bottleneck chain: 256 -> 64 -> 64(3x3) -> 256 + add
        xs = jnp.asarray(rng.normal(size=(t, hc // 4, wc // 4, 256)).astype(np.float32)).astype(jnp.bfloat16)
        k1 = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        k2 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        k3 = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32) * 0.05).astype(jnp.bfloat16)

        def block(x, dot1x1):
            y = nn.relu(dot1x1(x, k1))
            y = jax.lax.conv_general_dilated(
                y, k2, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = nn.relu(y)
            y = dot1x1(y, k3)
            return nn.relu(y + x)

        def dot_reshape(x, k):
            cin = x.shape[-1]
            return jax.lax.dot_general(
                x.reshape(-1, cin), k, (((1,), (0,)), ((), ()))
            ).reshape(*x.shape[:-1], k.shape[1])

        def dot_direct(x, k):
            return jax.lax.dot_general(x, k, (((3,), (0,)), ((), ())))

        def dot_conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k.reshape(1, 1, *k.shape), (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def l1_a(x):
            for _ in range(3):
                x = block(x, dot_reshape)
            return x

        @jax.jit
        def l1_b(x):
            for _ in range(3):
                x = block(x, dot_direct)
            return x

        @jax.jit
        def l1_c(x):
            for _ in range(3):
                x = block(x, dot_conv)
            return x

        a = timeit("l1 A: 3 blocks, 1x1 reshape-dot (current)", l1_a, xs)
        b = timeit("l1 B: 3 blocks, 1x1 direct 4-d dot", l1_b, xs)
        c = timeit("l1 C: 3 blocks, 1x1 as lax.conv", l1_c, xs)
        for n, v in (("B", b), ("C", c)):
            d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - v.astype(jnp.float32))))
            print(f"  |A-{n}| max = {d:.3e}")

    if "fpn" in which:
        ph, pw = hc // 8, wc // 8
        lat = jnp.asarray(rng.normal(size=(t, 2 * ph, 2 * pw, 256)).astype(np.float32)).astype(jnp.bfloat16)
        prev = jnp.asarray(rng.normal(size=(t, ph, pw, 256)).astype(np.float32)).astype(jnp.bfloat16)
        ks = jnp.asarray(rng.normal(size=(3, 3, 256, 256)).astype(np.float32) * 0.05).astype(jnp.bfloat16)

        def smooth(y, pad=1):
            return jax.lax.conv_general_dilated(
                y, ks, (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def fpn_a(lat, prev):
            l6 = lat.reshape(t, ph, 2, pw, 2, 256)
            y = (l6 + prev[:, :, None, :, None, :]).reshape(lat.shape)
            return smooth(y)

        @jax.jit
        def fpn_b(lat, prev):
            up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
            return smooth(lat + up)

        # C: conv3x3(lat) + conv over zero-stuffed prev with K (*) ones(2,2).
        ones22 = jnp.ones((2, 2), ks.dtype)
        k4 = jax.lax.conv_general_dilated(
            ks.transpose(2, 3, 0, 1).reshape(-1, 1, 3, 3).astype(jnp.float32),
            jnp.flip(ones22, (0, 1)).reshape(1, 1, 2, 2).astype(jnp.float32),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ).reshape(256, 256, 4, 4).transpose(2, 3, 0, 1).astype(ks.dtype)

        @jax.jit
        def fpn_c(lat, prev):
            a = smooth(lat)
            b = jax.lax.conv_general_dilated(
                prev, k4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return a + b

        a = timeit("fpn A: 6-d broadcast-add + smooth (current)", fpn_a, lat, prev)
        b = timeit("fpn B: repeat-add + smooth", fpn_b, lat, prev)
        c = timeit("fpn C: smooth(lat) + lhs-dilated conv(prev)", fpn_c, lat, prev)
        for n, v in (("B", b), ("C", c)):
            d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - v.astype(jnp.float32))))
            print(f"  |A-{n}| max = {d:.3e}")


if __name__ == "__main__":
    main()
