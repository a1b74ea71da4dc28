#!/usr/bin/env python
"""Tunnel behavior experiments: dispatch latency, upload asynchrony, overlap.

Decides how to structure the bench-path driver (per-chunk dispatch vs one
fused scan dispatch)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import argparse

    argparse.ArgumentParser(description=__doc__).parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables

    pipe, model = build_pipeline(3, 3, (480, 854))
    variables = init_variables(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(63)
    f = pipe.sf.fast
    sc = pipe.superchunk
    w0 = rng.integers(0, 255, (sc + f - 1, 480, 854, 3), dtype=np.uint8)
    w1 = rng.integers(0, 255, (sc + f - 1, 480, 854, 3), dtype=np.uint8)
    valid = np.ones((sc + f - 1,), bool)

    # warm
    v = jnp.asarray(valid)
    out = pipe._superchunk(variables, jnp.asarray(w0), v)
    jax.block_until_ready(out)

    def t():
        return time.perf_counter()

    print("== experiment 1: upload asynchrony ==")
    t0 = t(); x0 = jnp.asarray(w0); t1 = t()
    jax.block_until_ready(x0); t2 = t()
    print(f"jnp.asarray returned in {1e3*(t1-t0):.1f} ms; blocked +{1e3*(t2-t1):.1f} ms")

    print("== experiment 2: dispatch latency (args resident) ==")
    t0 = t(); r = pipe._superchunk(variables, x0, v); t1 = t()
    jax.block_until_ready(r); t2 = t()
    print(f"dispatch returned in {1e3*(t1-t0):.1f} ms; compute blocked +{1e3*(t2-t1):.1f} ms")

    print("== experiment 3: serialized vs pipelined 2 chunks (incl uploads) ==")
    for mode in ("serialized", "pipelined"):
        best = float("inf")
        for _ in range(3):
            t0 = t()
            if mode == "serialized":
                ra = pipe._superchunk(variables, jnp.asarray(w0), v)
                jax.block_until_ready(ra)
                rb = pipe._superchunk(variables, jnp.asarray(w1), v)
                jax.block_until_ready(rb)
            else:
                xa = jnp.asarray(w0)
                xb = jnp.asarray(w1)
                ra = pipe._superchunk(variables, xa, v)
                rb = pipe._superchunk(variables, xb, v)
                jax.block_until_ready((ra, rb))
            best = min(best, t() - t0)
        print(f"{mode}: {1e3*best:.1f} ms for 64 frames = {64/best:.1f} fps")

    print("== experiment 4: fetch cost ==")
    cat = [jnp.concatenate([ra[i], rb[i]]) for i in range(5)]
    jax.block_until_ready(cat)
    t0 = t(); got = jax.device_get(cat); t1 = t()
    nbytes = sum(g.nbytes for g in got)
    print(f"device_get {nbytes/1e6:.1f} MB: {1e3*(t1-t0):.1f} ms")

    print("== experiment 5: backbone sub-stages (34f canvas) ==")
    canvas = pipe.transform(jnp.asarray(w0))
    jax.block_until_ready(canvas)
    # whole backbone again for reference
    bb = jax.jit(lambda vv, c: model.apply(vv, c, method="backbone_feats"))
    r = bb(variables, canvas); jax.block_until_ready(r)
    for _ in range(2):
        t0 = t(); r = bb(variables, canvas); jax.block_until_ready(r); t1 = t()
        print(f"backbone_feats: {1e3*(t1-t0):.1f} ms")
    # f32 vs bf16 input irrelevant; check single-frame scaling
    c8 = canvas[:8]
    bb8 = jax.jit(lambda vv, c: model.apply(vv, c, method="backbone_feats"))
    r = bb8(variables, c8); jax.block_until_ready(r)
    t0 = t(); r = bb8(variables, c8); jax.block_until_ready(r); t1 = t()
    print(f"backbone_feats on 8 frames: {1e3*(t1-t0):.1f} ms")


if __name__ == "__main__":
    main()
