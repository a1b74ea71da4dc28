#!/usr/bin/env python
"""Stage-level device timing of the ResNet-50+FPN backbone at production
shape ([34, 768, 1344, 3] canvas, bf16), with a theoretical-FLOP column so
MXU occupancy per stage is visible — the round-3 target is the documented
~40% overall occupancy (docs/STATUS.md).

Run on TPU:  python scripts/profile_backbone.py [--frames 34]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_BF16_TFLOPS = 197.0  # MXU peak, bf16


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=34)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from slowfast_vos_tpu.models.resnet_fpn import FPN, ResNet50, ResNet50FPN

    t = args.frames
    hc, wc = 768, 1344
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(t, hc, wc, 3)).astype(np.float32))

    model = ResNet50FPN()
    print(f"stem: {'s2d 4x4/s1' if model.s2d_stem else 'standard 7x7/s2'} (production default)")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def timeit(name, fn, *a, flops=None):
        _ = float(jnp.sum(jax.tree.leaves(fn(*a))[0]))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(jnp.sum(jax.tree.leaves(fn(*a))[0]))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3
        occ = ""
        if flops:
            ideal = flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
            occ = f"  ideal {ideal:6.1f} ms  occ ~{100 * ideal / ms:4.1f}%"
        print(f"{name:34s} {ms:8.1f} ms{occ}")

    # conv FLOPs helper: 2 * out_px * k*k * cin * cout
    def cflops(hw, k, cin, cout):
        return 2 * t * hw[0] * hw[1] * k * k * cin * cout

    c2 = (hc // 4, wc // 4)
    c3 = (hc // 8, wc // 8)
    c4 = (hc // 16, wc // 16)
    c5 = (hc // 32, wc // 32)

    def bottleneck_flops(hw_out, cin, mid, nblocks, first_proj):
        f = 0
        for i in range(nblocks):
            ci = cin if i == 0 else mid * 4
            f += cflops(hw_out, 1, ci, mid)
            f += cflops(hw_out, 3, mid, mid)
            f += cflops(hw_out, 1, mid, mid * 4)
            if i == 0 and first_proj:
                f += cflops(hw_out, 1, ci, mid * 4)
        return f

    # s2d stem: conv 4x4/s1 over [hc/2, wc/2, 12] -> 64
    stem_f = cflops((hc // 2, wc // 2), 4, 12, 64)
    l1_f = bottleneck_flops(c2, 64, 64, 3, True)
    l2_f = bottleneck_flops(c3, 256, 128, 4, True)
    l3_f = bottleneck_flops(c4, 512, 256, 6, True)
    l4_f = bottleneck_flops(c5, 1024, 512, 3, True)
    fpn_f = sum(
        cflops(hw, 1, cin, 256) + cflops(hw, 3, 256, 256)
        for hw, cin in [(c2, 256), (c3, 512), (c4, 1024), (c5, 2048)]
    )

    whole = jax.jit(lambda v, a: model.apply(v, a))
    timeit("whole backbone (R50+FPN)", whole, variables, x,
           flops=stem_f + l1_f + l2_f + l3_f + l4_f + fpn_f)

    # per-stage: run the body up to each stage boundary via intermediate taps
    body = ResNet50()
    bvars = {"params": variables["params"]["body"]}

    def up_to(stage):
        @jax.jit
        def f(v, a):
            outs = body.apply(v, a)
            return outs[stage]
        return f

    csf = [l1_f, l2_f, l3_f, l4_f]
    cum = stem_f
    for s in range(4):
        cum += csf[s]
        timeit(f"body through layer{s+1}", up_to(s), bvars, x, flops=cum)

    fpn = FPN()
    fvars = {"params": variables["params"]["fpn"]}
    cs = jax.jit(lambda v, a: body.apply(v, a))(bvars, x)
    cs = jax.block_until_ready(cs)
    timeit("FPN alone (on cached C2-C5)", jax.jit(lambda v, c: fpn.apply(v, c)), fvars, cs, flops=fpn_f)


if __name__ == "__main__":
    main()
