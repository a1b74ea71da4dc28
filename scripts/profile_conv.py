#!/usr/bin/env python
"""Microbench of conv formulations at the pipeline's hot shapes.

The backbone (155.9 ms vs 47.8 ms ideal) and SlowFast enhance (152.2 vs
70.5) are both bounded by XLA:TPU conv efficiency at P2-scale NHWC shapes,
not by HBM traffic (arithmetic intensity K = 9*256 is deep). This bench
pits the stock `conv_general_dilated` against alternative formulations of
the SAME math to find the fastest dispatch for each hot shape:

  conv       — stock NHWC conv_general_dilated (what production uses)
  shifted-mm — 3x3 conv as 9 accumulated [M,K]@[K,N] dot_generals over
               shifted slices of a padded input (pure MXU matmuls)
  chanpack   — kt-tap temporal conv as ONE conv over a channel-stacked
               input (cin*kt) instead of kt summed convs
  batch1     — frames folded into H (one [1, T*H, W, C] image, frame
               boundaries handled by halo rows) to probe batch tiling

Timing follows CLAUDE.md tunnel discipline: every timed iteration ends
with a device->host scalar fetch.

Run on TPU:  python scripts/profile_conv.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_BF16_TFLOPS = 197.0


def main(iters: int = 5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)

    def timeit(name, fn, *a, flops=None, n=iters):
        _ = float(jnp.sum(fn(*a)))
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            _ = float(jnp.sum(fn(*a)))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3
        occ = ""
        if flops:
            ideal = flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
            occ = f"  ideal {ideal:6.2f} ms  occ ~{100 * ideal / ms:5.1f}%"
        print(f"  {name:44s} {ms:8.2f} ms{occ}", flush=True)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32), jnp.bfloat16)

    def conv2d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # ---- A: 3x3 single-tap conv at P2 scale (FPN smooth / stage1 merged) ----
    for (t, h, w_, cin, cout), tag in [
        ((34, 192, 336, 256, 256), "P2 3x3 256->256 (FPN smooth)"),
        ((34, 192, 336, 256, 224), "P2 3x3 256->224 (enhance s1)"),
        ((34, 192, 336, 64, 64), "P2 3x3 64->64 (layer1 conv2)"),
        ((34, 48, 84, 256, 256), "P4 3x3 256->256 (layer3-ish)"),
    ]:
        print(f"== {tag}: [{t},{h},{w_},{cin}] -> {cout}")
        x = mk((t, h, w_, cin))
        w = mk((3, 3, cin, cout))
        fl = 2 * t * h * w_ * 9 * cin * cout

        timeit("conv NHWC", jax.jit(conv2d), x, w, flops=fl)

        @jax.jit
        def shifted_mm(x, w):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = None
            for dy in range(3):
                for dx in range(3):
                    xs = xp[:, dy : dy + x.shape[1], dx : dx + x.shape[2], :]
                    m = xs.reshape(-1, x.shape[-1])
                    o = jax.lax.dot_general(
                        m, w[dy, dx], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = o if acc is None else acc + o
            return acc.astype(jnp.bfloat16).reshape(*x.shape[:-1], w.shape[-1])

        timeit("shifted-mm (9 dots, f32 acc)", shifted_mm, x, w, flops=fl)

        @jax.jit
        def batch1(x, w):
            # halo rows between frames give wrong values at 2 rows/frame
            # boundary — fine for a speed probe of the tiling.
            xf = x.reshape(1, -1, x.shape[2], x.shape[3])
            return conv2d(xf, w)

        timeit("batch-folded [1, T*H, W, C]", batch1, x, w, flops=fl)

    # ---- B: kt=2 temporal conv at P2 (enhance stages 2/3) -------------------
    print("== P2 temporal kt=2 3x3 256->224 (enhance s3): [33,192,336,256]")
    t, h, w_, cin, cout, kt = 33, 192, 336, 256, 224, 2
    x = mk((t + kt - 1, h, w_, cin))
    wk = mk((kt, 3, 3, cin, cout))
    fl = 2 * t * h * w_ * 9 * kt * cin * cout

    @jax.jit
    def summed(x, wk):
        acc = None
        for i in range(kt):
            o = conv2d(x[i : i + t], wk[i])
            acc = o if acc is None else acc + o
        return acc

    timeit("summed taps (production form)", summed, x, wk, flops=fl)

    @jax.jit
    def chanpack(x, wk):
        z = jnp.concatenate([x[i : i + t] for i in range(kt)], axis=-1)
        wz = jnp.concatenate([wk[i] for i in range(kt)], axis=2)
        return conv2d(z, wz)

    timeit("channel-packed single conv", chanpack, x, wk, flops=fl)

    @jax.jit
    def cout_stacked(x, wk):
        # one conv over the WHOLE padded clip with kt kernels stacked on
        # cout, then a shifted add of the slabs: input read once.
        wz = jnp.concatenate([wk[i] for i in range(kt)], axis=-1)
        y = conv2d(x, wz)
        return sum(y[i : i + t, ..., i * cout : (i + 1) * cout] for i in range(kt))

    timeit("cout-stacked conv + shifted add", cout_stacked, x, wk, flops=fl)

    # ---- C: bandwidth-bound 1x1 at P2 (bottleneck expand) -------------------
    print("== P2 1x1 64->256 (layer1 conv3): [34,192,336,64]")
    x = mk((34, 192, 336, 64))
    w1 = mk((1, 1, 64, 256))
    fl = 2 * 34 * 192 * 336 * 64 * 256

    @jax.jit
    def conv1x1(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    timeit("conv NHWC 1x1", conv1x1, x, w1, flops=fl)

    @jax.jit
    def mm1x1(x, w):
        return jax.lax.dot_general(
            x.reshape(-1, x.shape[-1]), w[0, 0], (((1,), (0,)), ((), ())),
        ).reshape(*x.shape[:-1], w.shape[-1])

    timeit("plain matmul", mm1x1, x, w1, flops=fl)


if __name__ == "__main__":
    import argparse

    # Parse BEFORE importing jax (inside main): `--help` must never touch the
    # device — a profiling CLI that seizes the TPU to print usage is a footgun.
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument(
        "-n", "--iters", type=int, default=5, help="timed iterations per variant"
    )
    args = parser.parse_args()
    main(iters=args.iters)
