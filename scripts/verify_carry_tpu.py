#!/usr/bin/env python
"""Verify the carry contract on a SINGLE device: steady-state superchunks
that reuse the carried overlap features (`_superchunk_carry_impl`) must be
bit-identical to running every chunk through the plain full-window graph.

Exactness scope (measured, round 5 — see the `_superchunk_carry_impl`
docstring): bit-exact on single-device XLA:CPU; NOT bit-exact wherever XLA
lowers the batch-SC carry backbone and the batch-SC+F-1 plain backbone
differently. Measured results at this script's tiny shape (1-3 config,
60x100, 10 frames, random weights):

  * single-device XLA:CPU — 10/10 frames bit-identical (exit 0).
  * 8-virtual-device XLA:CPU (the test suite's mesh) — per-frame backbone
    outputs differ at bf16 ulp (max 6.3e-2, 6-11% of elements per FPN
    level); NMS ties flip.
  * TPU v5e (axon) — bounded drift on every carry-path frame: boxes
    <= 0.28 px, scores <= 2.1e-3, isolated mask boundary pixels. Far
    inside the 0.5-pt J&F parity budget; documented, not hidden.

    python scripts/verify_carry_tpu.py                # axon/TPU backend
    python scripts/verify_carry_tpu.py --platform cpu # single-device CPU

Exit code 0 = every frame's boxes/scores/labels/valid/union-mask bit-equal;
on violation it prints the per-frame max deltas (the bounds above) and
exits 1.
`tests/test_pipeline_inference.py::test_carry_path_matches_plain_superchunks`
runs this in a single-device CPU subprocess.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run(platform: str | None = None) -> list[str]:
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    import numpy as np

    from slowfast_vos_tpu.models.config import DetectionConfig
    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables

    cfg = DetectionConfig(
        rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=32,
        rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=32,
        box_batch_size_per_image=32, mask_train_rois=8,
        detections_per_img=5, max_gt=3,
    )
    pipe, model = build_pipeline(
        slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
        cfg=cfg, backbone_batch=4, chunk=4, superchunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    t, sc = 10, 4
    hl, hr = pipe.halo_left, pipe.halo_right
    rng = np.random.default_rng(11)
    images = rng.integers(0, 255, (t, 60, 100, 3), dtype=np.uint8)

    dets = pipe.infer_sequence(variables, images)  # carry path

    plain = []
    for c in range(0, t, sc):
        idxs = np.arange(c - hl, c + sc + hr)
        in_range = (idxs >= 0) & (idxs < t)
        window = images[np.clip(idxs, 0, t - 1)].copy()
        window[~in_range] = 0
        outs = pipe._superchunk(variables, jnp.asarray(window), jnp.asarray(in_range))
        n = min(sc, t - c)
        for f in range(n):
            plain.append([np.asarray(o[f]) for o in outs])

    w = images.shape[2]
    mismatches = []
    for g, (d, p) in enumerate(zip(dets, plain)):
        union = np.unpackbits(p[4], axis=-1, count=w).astype(bool)
        for key, want in [
            ("boxes", p[0]), ("scores", p[1]), ("labels", p[2]),
            ("valid", p[3]), ("union_mask", union),
        ]:
            if not np.array_equal(d[key], want):
                delta = float(
                    np.max(np.abs(np.asarray(d[key], np.float64) - np.asarray(want, np.float64)))
                )
                mismatches.append(f"frame {g}: {key} maxdiff={delta:.3e}")
    return mismatches


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default=None, help="jax platform override (e.g. cpu)")
    args = ap.parse_args()
    mismatches = run(args.platform)
    import jax

    backend = jax.default_backend()
    if mismatches:
        print(f"carry contract VIOLATED on {backend} ({len(mismatches)} fields):")
        for m in mismatches:
            print(" ", m)
        sys.exit(1)
    print(f"carry contract holds on {backend}: 10/10 frames bit-identical")


if __name__ == "__main__":
    main()
