#!/usr/bin/env python
"""XLA op ranking for the production train step / inference superchunk via
jax.profiler trace.

Stage-level wall timing through the tunnel carries ~28 ms RTT noise per
fetch; the device trace ranks actual on-device op time (the technique that
found the mask-projection gathers in round 2 — CLAUDE.md). Parses the
trace.json.gz Chrome-trace events of the newest capture, keeps only the
device "XLA Ops" lane, and aggregates by `hlo_category` plus a top-op list
with shaped `long_name` snippets.

Run on TPU:
  python scripts/profile_trace.py --mode train [--steps 3] [--top 30]
  python scripts/profile_trace.py --mode infer [--steps 3]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def rank_trace(log_dir: str, top: int, steps: int):
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace.json.gz found under", log_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    cats = defaultdict(float)
    ops = defaultdict(float)
    long_names = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if tid_names.get((e.get("pid"), e.get("tid")), "") != "XLA Ops":
            continue
        args = e.get("args", {})
        dur = e.get("dur", 0) / 1e3  # us -> ms
        cats[args.get("hlo_category", "?")] += dur
        name = e.get("name", "?")
        ops[name] += dur
        long_names.setdefault(name, args.get("long_name", "")[:160])
        total += dur
    print(f"trace: {path}")
    print(f"device XLA-Ops total: {total:.1f} ms = {total / steps:.1f} ms/step")
    print("\n-- by hlo_category (ms/step) --")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        if v / steps >= 0.05:
            print(f"{k:30s} {v / steps:8.2f}")
    print(f"\n-- top {top} ops (ms/step) --")
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{k:26s} {v / steps:7.2f}  {long_names[k]}")


def make_train_step():
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
    masks[:, 1, 50:150, 600:800] = 1
    batch = {
        "images": jnp.asarray(rng.random((w, 480, 854, 3), np.float32)),
        "feat_valid": jnp.ones((w,), bool),
        "frame_valid": jnp.ones((n,), bool),
        "boxes": jnp.tile(
            jnp.asarray([[200.0, 100, 500, 300], [600, 50, 800, 150]])[None],
            (n, g // 2, 1),
        )[:, :g],
        "labels": jnp.ones((n, g), jnp.int32),
        "gt_valid": jnp.asarray(np.tile([True, True] + [False] * (g - 2), (n, 1))),
        "masks": jnp.asarray(masks),
    }
    key = jax.random.PRNGKey(0)
    carry = {"state": state}

    def run(i):
        carry["state"], _ = trainer.step(carry["state"], jax.random.fold_in(key, i), batch)

    def block():
        jax.block_until_ready(carry["state"].params)

    return run, block


def make_infer_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables

    pipe, model = build_pipeline(slow=3, fast=3, original_hw=(480, 854), superchunk=32)
    variables = init_variables(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(63)
    f = pipe.sf.fast
    win = jnp.asarray(
        rng.integers(0, 255, (32 + f - 1, 480, 854, 3), dtype=np.uint8)
    )
    valid = jnp.ones((32 + f - 1,), bool)
    out = {}

    def run(i):
        out["o"] = pipe._superchunk(variables, win, valid)

    def block():
        jax.block_until_ready(out["o"])

    return run, block


def make_backbone_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from slowfast_vos_tpu.models.resnet_fpn import ResNet50FPN

    model = ResNet50FPN()
    print(f"stem: {'s2d 4x4/s1' if model.s2d_stem else 'standard 7x7/s2'} (production default)")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(34, 768, 1344, 3)).astype(np.float32))
    fn = jax.jit(lambda v, a: model.apply(v, a))
    out = {}

    def run(i):
        out["o"] = fn(variables, x)

    def block():
        jax.block_until_ready(out["o"])

    return run, block


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("train", "infer", "backbone"), default="train")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--log-dir", default=None)
    args = ap.parse_args()

    import jax

    makers = {"train": make_train_step, "infer": make_infer_step, "backbone": make_backbone_step}
    run, block = makers[args.mode]()
    run(0)  # compile
    block()

    log_dir = args.log_dir or tempfile.mkdtemp(prefix=f"{args.mode}_trace_")
    jax.profiler.start_trace(log_dir)
    for i in range(args.steps):
        run(i + 1)
    block()
    jax.profiler.stop_trace()
    rank_trace(log_dir, args.top, args.steps)


if __name__ == "__main__":
    main()
