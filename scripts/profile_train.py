#!/usr/bin/env python
"""Train-step breakdown at production shape (2-frame window + halo, 480x854,
3-3 config): full step vs loss-only vs stage pieces. Fetch-forced timing
(this backend needs a d2h fetch to flush work)."""
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
    from slowfast_vos_tpu.train.train_step import Trainer

    pipe, model = build_pipeline(slow=3, fast=3, original_hw=(480, 854))
    variables = init_variables(model, jax.random.PRNGKey(0))
    trainer = Trainer(pipe, lr=1e-3)
    state = trainer.init_state(variables)

    rng = np.random.default_rng(63)
    n, f, g = trainer.n_center, pipe.sf.fast, pipe.cfg.max_gt
    w = n + f - 1
    masks = np.zeros((n, g, 480, 854), np.uint8)
    masks[:, 0, 100:300, 200:500] = 1
    batch = {
        "images": jnp.asarray(rng.random((w, 480, 854, 3), np.float32)),
        "feat_valid": jnp.ones((w,), bool),
        "frame_valid": jnp.ones((n,), bool),
        "boxes": jnp.tile(jnp.asarray([[200.0, 100, 500, 300]])[None], (n, g, 1)),
        "labels": jnp.ones((n, g), jnp.int32),
        "gt_valid": jnp.asarray(np.tile([True] + [False] * (g - 1), (n, 1))),
        "masks": jnp.asarray(masks),
    }
    key = jax.random.PRNGKey(0)

    def timeit(name, fn, *args):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jnp.sum(jax.tree.leaves(out)[0]))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:40s} {best*1e3:8.1f} ms")

    timeit("full train step (fwd+bwd+sgd)", lambda: trainer.step(state, key, batch)[1]["loss"])

    loss_only = jax.jit(lambda p, fz, bs, k, b: trainer._loss_fn(p, fz, bs, k, b)[0])
    timeit("loss only (fwd)", loss_only, state.params, state.frozen, state.batch_stats, key, batch)

    grad_fn = jax.jit(
        lambda p, fz, bs, k, b: jax.tree.leaves(
            jax.grad(lambda pp: trainer._loss_fn(pp, fz, bs, k, b)[0])(p)
        )[0]
    )
    timeit("fwd + bwd (no sgd)", grad_fn, state.params, state.frozen, state.batch_stats, key, batch)

    # stages
    images = pipe.transform(batch["images"])
    vs = {"params": {**state.params, **state.frozen}, "batch_stats": state.batch_stats}
    bb = jax.jit(lambda v, c: model.apply(v, c, method="backbone_feats")[0])
    timeit("backbone fwd (4 frames)", bb, vs, images)

    feats = model.apply(vs, images, method="backbone_feats")
    enh = jax.jit(
        lambda v, fs: model.apply(v, fs, method="enhance", train=True, pre_padded=True,
                                  mutable=["batch_stats"])[0][0]
    )
    timeit("enhance fwd train (window)", enh, vs, feats[:4])

    enh_grad = jax.jit(
        lambda v, fs: jax.grad(
            lambda f4: sum(
                jnp.sum(e) for e in model.apply(
                    v, f4, method="enhance", train=True, pre_padded=True,
                    mutable=["batch_stats"],
                )[0]
            )
        )(fs)[0]
    )
    timeit("enhance fwd+bwd", enh_grad, vs, feats[:4])


if __name__ == "__main__":
    main()
