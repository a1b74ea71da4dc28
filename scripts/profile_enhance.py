#!/usr/bin/env python
"""Micro-benchmark of the SlowFast enhance stage at production shape
(P2 level: [T + fast - 1, 192, 336, 256] bf16, T=32 superchunk) and rewrite
candidates, for any (slow, fast) config (`--slow/--fast`):

A. current module (BN folded at eval; merged stage-1 when s == f)
B. raw conv3d replica of A's math with all-bf16 intermediates
C. every (kt,3,3) conv3d decomposed into kt summed 2D convs (the
   production form, temporal_conv_apply)
E. per-tap full-length convs + shifted OUTPUT adds
F. one cout-concat conv over the full clip per stage + shifted slice adds
G. stage-1 only: ONE conv over the full padded clip with ALL stage-1 tap
   kernels (slow ks1 x 192 ++ fast kf1 x 32) concatenated along cout, then
   shifted-slice adds per pathway; stages 2-3 in C form. Generalizes the
   production s==f merged stage-1 to s != f (where the slow chain reads a
   d-offset slice of the same padded clip) at the cost of computing the
   slow taps over F-S extra frames.
G2. G, but the full concatenated kernel runs only over the slow window's
   rows and a fast-channels-only conv covers the F-S edge rows — no
   slow-tap waste. Reverted from production round 5 for TWO measured
   reasons: (a) the extra input consumer breaks the carry bit-exactness
   contract on XLA:CPU at bf16 ulp (see the variant-G comment in
   models/slowfast.py), and (b) it LOSES on v5e anyway — 167.4 ms vs G's
   154.6 at 3-7 production shape (round-5 run below): the edge/mid/edge
   fast-row reassembly concat costs more than the F-S frames of saved
   192-channel slow-tap compute (~4 ms ideal). The single-pass G
   structure stands.
H. fast-pathway cin=32 stages (f2, f3, u1, u2) with the kt taps folded
   into cin: one conv over concat(x[t..t+kt-1], axis=-1) with the tap
   kernels concatenated along cin. Raises MXU row occupancy 32 -> kt*32;
   cross-tap accumulation moves inside the conv (f32) — NOT bit-identical
   to C (it is more accurate), so adoption requires re-validating the
   carry contract (CLAUDE.md round-3 lesson).
I. G + H combined.

Measured (TPU v5e behind the tunnel, best of 3):
  3-3: A 120.4 | B 179.6 | C 125.8 | E 134.6 | F 136.4  -> production form
       (A = C + merged stage-1 + BN fold) stands; E/F retired.
  3-7: A 157.6 | B 214.2 | C 158.2 | E 166.6 | F 158.7 | G 152.2 | H 160.7
       | I 152.9; groups: slow chain 111.8, fast chain + fuses 74.1.
       -> G ADOPTED as the s != f eval stage-1 (models/slowfast.py);
       H/I retired (the cin-concat copies eat the occupancy win).
  3-7 round 5 (hotter link, ~+45 ms RTT baseline vs the r4 run; compare
       WITHIN the run): F 159.2 | G 154.6 | G2 167.4 | H 160.1 | I 152.4;
       groups: slow 113.5, fast + fuses 75.5. G2 loses to G by 13 ms —
       VERDICT r4 item 8's slow-tap-waste hypothesis measured and
       falsified; I's 2 ms on G is within link noise and stays retired.
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--slow", type=int, default=3)
    ap.add_argument("--fast", type=int, default=3)
    ap.add_argument("--frames", type=int, default=32, help="superchunk frames (pre-halo)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from slowfast_vos_tpu.models.slowfast import (
        SlowFastTemporal,
        fuse_kernel_size,
        pathway_kernel_sizes,
    )

    S, F = args.slow, args.fast
    T = args.frames + F - 1  # pre-padded clip length
    H, W, C = 192, 336, 256
    t_out = args.frames
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(T, H, W, C)).astype(np.float32), jnp.bfloat16)

    mod = SlowFastTemporal(slow=S, fast=F)
    params = mod.init(jax.random.PRNGKey(0), x[:F])

    def timeit(name, fn, *args_):
        # the tunnel backend defers execution until a device->host fetch
        # forces a flush, so every timed iteration must END with a scalar
        # fetch (block_until_ready alone reports ~0 ms for unfetched work);
        # the fetch adds one ~28 ms RTT, identical across variants.
        _ = float(jnp.sum(fn(*args_)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = float(jnp.sum(fn(*args_)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:56s} {best*1e3:8.1f} ms")
        return out

    print(f"config {S}-{F}, clip [{T}, {H}, {W}, {C}] bf16 (T={t_out} + halo)")
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
    ks = pathway_kernel_sizes(S)
    kf = pathway_kernel_sizes(F)
    kfuse1, out_s1, out_f1 = fuse_kernel_size(S, ks[0], F, kf[0])
    kfuse2, _, _ = fuse_kernel_size(out_s1, ks[1], out_f1, kf[1])
    d = F // 2 - S // 2

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

    def conv2d(v, w):
        pad = [(1, 1), (1, 1)] if w.shape[0] == 3 else [(0, 0), (0, 0)]
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    def conv3d_as_2d(v, w):
        # sum_i conv2d(v[:, i:i+Tout], w[i]); frames folded into batch
        kt = w.shape[0]
        tout = v.shape[1] - kt + 1
        acc = None
        for i in range(kt):
            o = conv2d(v[0, i : i + tout], w[i])
            acc = o if acc is None else acc + o
        return acc[None]

    def scale_shift(v, cout):
        return v * 1.01 + 0.01  # BN(eval) folded: per-channel affine

    def run(conv, v):
        fast = v[None]
        slow = v[None, d : d + t_out + S - 1]
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
    timeit("C: conv3d as summed 2D convs (production form)", jax.jit(partial(run, conv3d_as_2d)), x)

    def conv3d_as_2d_outshift(v, w):
        # Variant E: avoid the per-tap INPUT slices by running each tap's 2D
        # conv over the FULL length and summing shifted OUTPUT slices.
        kt = w.shape[0]
        tout = v.shape[1] - kt + 1
        full = [conv2d(v[0], w[i]) for i in range(kt)]
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
        # Variant F: ONE 2D conv over the full length with the kt tap
        # kernels concatenated along cout, then sum the shifted per-tap
        # output channel slices. Reads the input ONCE instead of kt times;
        # costs writing/reading kt*cout output channels at full length.
        # Bit-identical math to C/E: same per-tap conv2d (conv-internal f32
        # accumulation), cross-tap adds in bf16 in the same order as C/E.
        kt = w.shape[0]
        cout = w.shape[-1]
        tout = v.shape[1] - kt + 1
        wcat = jnp.concatenate([w[i] for i in range(kt)], axis=-1)
        y = conv2d(v[0], wcat)
        acc = None
        for i in range(kt):
            sl = y[i : i + tout, :, :, i * cout : (i + 1) * cout]
            acc = sl if acc is None else acc + sl
        return acc[None]

    timeit(
        "F: one cout-concat conv over full T + shifted slice adds",
        jax.jit(partial(run, conv3d_as_2d_coutcat)), x,
    )

    def stage1_merged_all(v):
        # Variant G stage 1: one conv over the FULL padded clip with every
        # stage-1 tap kernel along cout — slow tap i lives at channel block
        # i*192, fast tap j at ks1*192 + j*32. Pathway outputs assemble from
        # shifted slices: slow tap i aligns at clip offset d + i, fast tap j
        # at offset j. Cross-tap adds in bf16, ascending tap order (same as C).
        ks1, kf1 = ks[0], kf[0]
        wcat = jnp.concatenate(
            [Ws["s1"][i] for i in range(ks1)] + [Ws["f1"][j] for j in range(kf1)],
            axis=-1,
        )
        y = conv2d(v, wcat)
        s_len = (t_out + S - 1) - ks1 + 1
        f_len = (t_out + F - 1) - kf1 + 1
        s_acc = None
        for i in range(ks1):
            sl = y[d + i : d + i + s_len, :, :, i * 192 : (i + 1) * 192]
            s_acc = sl if s_acc is None else s_acc + sl
        f_acc = None
        base = ks1 * 192
        for j in range(kf1):
            sl = y[j : j + f_len, :, :, base + j * 32 : base + (j + 1) * 32]
            f_acc = sl if f_acc is None else f_acc + sl
        return s_acc[None], f_acc[None]

    def stage1_merged_mid_edge(v):
        # Variant G2: G's concatenated slow+fast stage-1 kernel runs only
        # over the rows the SLOW pathway consumes (v[d : d+t+S-1]); the F-S
        # edge rows feed only fast taps, so a fast-channels-only conv covers
        # them — removing G's slow-tap compute over the F-S extra frames
        # (VERDICT r4 item 8). REVERTED from production after measurement
        # of exactness: the extra input consumer lets XLA:CPU fuse the
        # feature->mask->conv chain differently in the carry vs plain
        # superchunk graphs, and the bf16-ulp enhance drift flips NMS ties —
        # breaking test_carry_path_matches_plain_superchunks (reproduced
        # with a fresh compile cache). Exact in f32
        # (test_stage1_cross_pathway_merged_conv_equals_separate). Staged
        # here for a future TPU-measured, both-backend-revalidated adoption.
        ks1, kf1 = ks[0], kf[0]
        wfast = jnp.concatenate([Ws["f1"][j] for j in range(kf1)], axis=-1)
        wcat = jnp.concatenate([Ws["s1"][i] for i in range(ks1)] + [wfast], axis=-1)
        ncs = ks1 * 192
        mid = v[d : d + t_out + S - 1]
        y_mid = conv2d(mid, wcat)
        edges = jnp.concatenate([v[:d], v[d + t_out + S - 1 :]])
        y_edge = conv2d(edges, wfast)
        fast_rows = jnp.concatenate([y_edge[:d], y_mid[..., ncs:], y_edge[d:]])
        s_len = (t_out + S - 1) - ks1 + 1
        f_len = (t_out + F - 1) - kf1 + 1
        s_acc = None
        for i in range(ks1):
            sl = y_mid[i : i + s_len, :, :, i * 192 : (i + 1) * 192]
            s_acc = sl if s_acc is None else s_acc + sl
        f_acc = None
        for j in range(kf1):
            sl = fast_rows[j : j + f_len, :, :, j * 32 : (j + 1) * 32]
            f_acc = sl if f_acc is None else f_acc + sl
        return s_acc[None], f_acc[None]

    def run_G(v, fast_conv, stage1=stage1_merged_all):
        s, f = stage1(v)
        s = jax.nn.relu(scale_shift(s, 192))
        f = jax.nn.relu(scale_shift(f, 32))
        s = jnp.concatenate([s, jax.nn.relu(scale_shift(fast_conv(f, Ws["u1"]), 64))], -1)
        s = jax.nn.relu(scale_shift(conv3d_as_2d(s, Ws["s2"]), 192))
        f = jax.nn.relu(scale_shift(fast_conv(f, Ws["f2"]), 32))
        s = jnp.concatenate([s, jax.nn.relu(scale_shift(fast_conv(f, Ws["u2"]), 64))], -1)
        s = scale_shift(conv3d_as_2d(s, Ws["s3"]), 224)
        f = scale_shift(fast_conv(f, Ws["f3"]), 32)
        return jnp.concatenate([s, f], -1)[0]

    ref = np.asarray(jax.jit(partial(run, conv3d_as_2d))(x), np.float32)

    def check(name, fn):
        got = np.asarray(jax.jit(fn)(x), np.float32)
        print(f"   max|{name} - C| = {np.abs(got - ref).max():.2e}")

    timeit(
        "G: stage-1 one conv over clip, all taps/pathways in cout",
        jax.jit(partial(run_G, fast_conv=conv3d_as_2d)), x,
    )
    check("G", partial(run_G, fast_conv=conv3d_as_2d))

    timeit(
        "G2: G but slow-window-only full kernel + fast-only edge conv",
        jax.jit(partial(run_G, fast_conv=conv3d_as_2d, stage1=stage1_merged_mid_edge)), x,
    )
    check("G2", partial(run_G, fast_conv=conv3d_as_2d, stage1=stage1_merged_mid_edge))

    def conv_cincat(v, w):
        # Variant H: taps folded into cin. X'[t] = concat(x[t+i] for i),
        # one conv with [k, k, kt*cin, cout]. Accumulation across taps moves
        # INSIDE the conv (f32) — more accurate than C, not bit-identical.
        kt = w.shape[0]
        tout = v.shape[1] - kt + 1
        if kt == 1:
            return conv2d(v[0], w[0])[None]
        xcat = jnp.concatenate([v[0, i : i + tout] for i in range(kt)], axis=-1)
        wcat = jnp.concatenate([w[i] for i in range(kt)], axis=2)
        return conv2d(xcat, wcat)[None]

    def run_H(v):
        fast = v[None]
        slow = v[None, d : d + t_out + S - 1]
        s = jax.nn.relu(scale_shift(conv3d_as_2d(slow, Ws["s1"]), 192))
        f = jax.nn.relu(scale_shift(conv3d_as_2d(fast, Ws["f1"]), 32))
        s = jnp.concatenate([s, jax.nn.relu(scale_shift(conv_cincat(f, Ws["u1"]), 64))], -1)
        s = jax.nn.relu(scale_shift(conv3d_as_2d(s, Ws["s2"]), 192))
        f = jax.nn.relu(scale_shift(conv_cincat(f, Ws["f2"]), 32))
        s = jnp.concatenate([s, jax.nn.relu(scale_shift(conv_cincat(f, Ws["u2"]), 64))], -1)
        s = scale_shift(conv3d_as_2d(s, Ws["s3"]), 224)
        f = scale_shift(conv_cincat(f, Ws["f3"]), 32)
        return jnp.concatenate([s, f], -1)[0]

    timeit("H: fast-pathway cin=32 stages tap-folded into cin", jax.jit(run_H), x)
    check("H", run_H)

    timeit(
        "I: G + H combined",
        jax.jit(partial(run_G, fast_conv=conv_cincat)), x,
    )
    check("I", partial(run_G, fast_conv=conv_cincat))

    # Component-group timings (each group in isolation; not additive with
    # the full pipeline — consumers' fusions differ — but ranks the spend).
    def slow_only(v):
        slow = v[None, d : d + t_out + S - 1]
        s = jax.nn.relu(scale_shift(conv3d_as_2d(slow, Ws["s1"]), 192))
        s = jnp.pad(s[0], ((0, 0), (0, 0), (0, 0), (0, 64)))[None]
        s = jax.nn.relu(scale_shift(conv3d_as_2d(s, Ws["s2"]), 192))
        s = jnp.pad(s[0], ((0, 0), (0, 0), (0, 0), (0, 64)))[None]
        return scale_shift(conv3d_as_2d(s, Ws["s3"]), 224)[0]

    def fast_only(v):
        f = jax.nn.relu(scale_shift(conv3d_as_2d(v[None], Ws["f1"]), 32))
        u1 = jax.nn.relu(scale_shift(conv3d_as_2d(f, Ws["u1"]), 64))
        f = jax.nn.relu(scale_shift(conv3d_as_2d(f, Ws["f2"]), 32))
        u2 = jax.nn.relu(scale_shift(conv3d_as_2d(f, Ws["u2"]), 64))
        f = scale_shift(conv3d_as_2d(f, Ws["f3"]), 32)
        return (
            jnp.sum(f, axis=-1, keepdims=True)
            + jnp.sum(u1[:, : f.shape[1]], axis=-1, keepdims=True)
            + jnp.sum(u2[:, : f.shape[1]], axis=-1, keepdims=True)
        )[0]

    timeit("  [group] slow chain only (s1,s2,s3)", jax.jit(slow_only), x)
    timeit("  [group] fast chain + fuses (f1..f3,u1,u2)", jax.jit(fast_only), x)


if __name__ == "__main__":
    main()
