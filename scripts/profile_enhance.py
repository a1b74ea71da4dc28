#!/usr/bin/env python
"""Micro-benchmark of the SlowFast enhance stage at production shape
(P2 level: [34, 192, 336, 256] bf16, 3-3 config) and rewrite candidates:

A. current module (BN in f32 at eval)
B. raw-lax replica of A's math with all-bf16 intermediates (BN folded to
   scale/shift)
C. as B, but every (kt,3,3) conv3d decomposed into kt 2D convs summed
   (XLA's 2D conv path is the most tuned)
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import argparse

    argparse.ArgumentParser(description=__doc__).parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slowfast_vos_tpu.models.slowfast import SlowFastTemporal, pathway_kernel_sizes, fuse_kernel_size

    T, H, W, C = 34, 192, 336, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, H, W, C)).astype(np.float32), jnp.bfloat16)

    mod = SlowFastTemporal(slow=3, fast=3)
    params = mod.init(jax.random.PRNGKey(0), x[:3])

    def timeit(name, fn, *args):
        # the tunnel backend defers execution until a device->host fetch
        # forces a flush, so every timed iteration must END with a scalar
        # fetch (block_until_ready alone reports ~0 ms for unfetched work);
        # the fetch adds one ~28 ms RTT, identical across variants.
        _ = float(jnp.sum(fn(*args)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = float(jnp.sum(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:44s} {best*1e3:8.1f} ms")
        return out

    timeit(
        "A: current module (eval)",
        jax.jit(lambda p, v: mod.apply(p, v, train=False, pre_padded=True)),
        params, x,
    )

    # raw weights
    kd = jax.random.PRNGKey(1)
    def w3d(kt, cin, cout, key):
        return jnp.asarray(jax.random.normal(key, (kt, 3, 3, cin, cout)) * 0.05, jnp.bfloat16)
    def w1t(kt, cin, cout, key):
        return jnp.asarray(jax.random.normal(key, (kt, 1, 1, cin, cout)) * 0.05, jnp.bfloat16)

    keys = jax.random.split(kd, 16)
    ks = pathway_kernel_sizes(3)
    kf = pathway_kernel_sizes(3)
    kfuse1, out_s1, out_f1 = fuse_kernel_size(3, ks[0], 3, kf[0])
    kfuse2, _, _ = fuse_kernel_size(out_s1, ks[1], out_f1, kf[1])

    Ws = {
        "s1": w3d(ks[0], 256, 192, keys[0]),
        "f1": w3d(kf[0], 256, 32, keys[1]),
        "u1": w1t(kfuse1, 32, 64, keys[2]),
        "s2": w3d(ks[1], 256, 192, keys[3]),
        "f2": w3d(kf[1], 32, 32, keys[4]),
        "u2": w1t(kfuse2, 32, 64, keys[5]),
        "s3": w3d(ks[2], 256, 224, keys[6]),
        "f3": w3d(kf[2], 32, 32, keys[7]),
    }

    def conv3d(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1, 1), [(0, 0), (1, 1), (1, 1)] if w.shape[1] == 3 else [(0, 0), (0, 0), (0, 0)],
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    def conv3d_as_2d(v, w):
        # sum_i conv2d(v[:, i:i+Tout], w[i]); frames folded into batch
        kt = w.shape[0]
        tout = v.shape[1] - kt + 1
        pad = [(1, 1), (1, 1)] if w.shape[1] == 3 else [(0, 0), (0, 0)]
        acc = None
        for i in range(kt):
            sl = v[0, i : i + tout]  # [Tout, H, W, Cin]
            o = jax.lax.conv_general_dilated(
                sl, w[i], (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )
            acc = o if acc is None else acc + o
        return acc[None]

    def scale_shift(v, cout):
        return v * 1.01 + 0.01  # BN(eval) folded: per-channel affine

    def run(conv, v):
        fast = v[None]
        slow = v[None, 0 : 0 + (T - 2) + 2]  # d=0, t+s-1 frames
        s = jax.nn.relu(scale_shift(conv(slow, Ws["s1"]), 192))
        f = jax.nn.relu(scale_shift(conv(fast, Ws["f1"]), 32))
        s = jnp.concatenate([s, jax.nn.relu(scale_shift(conv(f, Ws["u1"]), 64))], -1)
        s = jax.nn.relu(scale_shift(conv(s, Ws["s2"]), 192))
        f = jax.nn.relu(scale_shift(conv(f, Ws["f2"]), 32))
        s = jnp.concatenate([s, jax.nn.relu(scale_shift(conv(f, Ws["u2"]), 64))], -1)
        s = scale_shift(conv(s, Ws["s3"]), 224)
        f = scale_shift(conv(f, Ws["f3"]), 32)
        return jnp.concatenate([s, f], -1)[0]

    timeit("B: raw conv3d, all-bf16, folded BN", jax.jit(partial(run, conv3d)), x)
    timeit("C: conv3d as summed 2D convs", jax.jit(partial(run, conv3d_as_2d)), x)

    def conv3d_as_2d_outshift(v, w):
        # Variant E: avoid the per-tap INPUT slices (each a leading-dim copy
        # of the whole GB-scale input if XLA materializes them) by running
        # each tap's 2D conv over the FULL T frames and summing shifted
        # OUTPUT slices instead (outputs are cout-sized — up to 8x smaller
        # for the fast pathway).
        kt = w.shape[0]
        tout = v.shape[1] - kt + 1
        pad = [(1, 1), (1, 1)] if w.shape[1] == 3 else [(0, 0), (0, 0)]
        full = [
            jax.lax.conv_general_dilated(
                v[0], w[i], (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )
            for i in range(kt)
        ]
        acc = None
        for i, o in enumerate(full):
            sl = o[i : i + tout]
            acc = sl if acc is None else acc + sl
        return acc[None]

    timeit(
        "E: per-tap full-length convs + shifted output adds",
        jax.jit(partial(run, conv3d_as_2d_outshift)), x,
    )

    def conv3d_as_2d_coutcat(v, w):
        # Variant F: ONE 2D conv over the full T frames with the kt tap
        # kernels concatenated along cout, then sum the shifted per-tap
        # output channel slices: out[t] = sum_i y[t+i, ..., i*cout:(i+1)*cout].
        # Reads the (GB-scale) input ONCE instead of kt times and dispatches
        # kt*cout MXU lanes in one pass; costs writing/reading kt*cout output
        # channels at full T. Bit-identical math to C/E: same per-tap conv2d
        # (conv-internal f32 accumulation), cross-tap adds in bf16 in the
        # same order as C/E.
        kt = w.shape[0]
        cout = w.shape[-1]
        tout = v.shape[1] - kt + 1
        pad = [(1, 1), (1, 1)] if w.shape[1] == 3 else [(0, 0), (0, 0)]
        wcat = jnp.concatenate([w[i] for i in range(kt)], axis=-1)  # [k,k,cin,kt*cout]
        y = jax.lax.conv_general_dilated(
            v[0], wcat, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        acc = None
        for i in range(kt):
            sl = y[i : i + tout, :, :, i * cout : (i + 1) * cout]
            acc = sl if acc is None else acc + sl
        return acc[None]

    timeit(
        "F: one cout-concat conv over full T + shifted slice adds",
        jax.jit(partial(run, conv3d_as_2d_coutcat)), x,
    )


if __name__ == "__main__":
    main()
