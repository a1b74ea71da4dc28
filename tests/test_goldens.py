"""Golden-activation parity against a captured torchvision reference run.

Skipped unless `tests/goldens/maskrcnn_goldens.npz` exists (produced by
`scripts/capture_goldens.py` in an environment with torchvision + the real
reference weights — see docs/STATUS.md gap #1). When present, this closes
the final numeric-parity risks: resize conventions, backbone/FPN numerics,
RPN proposal filtering, NMS tie-breaking, and mask pasting.
"""
import os

import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "maskrcnn_goldens.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDENS), reason="no captured goldens (needs torchvision env)"
)


@pytest.fixture(scope="module")
def setup():
    import jax

    from slowfast_vos_tpu.convert import convert_state_dict, load_torch_checkpoint
    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables

    data = np.load(GOLDENS)
    img = data["image"]
    ckpt_path = os.environ.get("GOLDEN_CHECKPOINT", "maskrcnn_model.pth")
    pipe, model = build_pipeline(slow=1, fast=1, original_hw=img.shape[:2], use_slow_fast=False)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sd = load_torch_checkpoint(ckpt_path)
    variables, report = convert_state_dict(sd, variables)
    assert report["unused_source_keys"] == []
    import jax.numpy as jnp

    variables = jax.tree.map(jnp.asarray, variables)
    return pipe, variables, data, img


def test_preprocess_parity(setup):
    pipe, _v, data, img = setup
    import jax.numpy as jnp

    ours = np.asarray(pipe.transform(jnp.asarray(img[None])))[0]
    want = data["preprocessed"].transpose(1, 2, 0)  # CHW -> HWC
    h, w = want.shape[:2]
    np.testing.assert_allclose(ours[:h, :w], want, atol=2e-2)


def test_fpn_parity(setup):
    pipe, variables, data, img = setup
    import jax.numpy as jnp

    canvas = pipe.transform(jnp.asarray(img[None]))
    feats = pipe.model.apply(variables, canvas, method="backbone_feats")
    for i, key in enumerate(["0", "1", "2", "3"]):
        want = data[f"fpn_{key}"].transpose(1, 2, 0)
        h, w = want.shape[:2]
        got = np.asarray(feats[i], np.float32)[0, :h, :w]
        # bf16 backbone: tolerate accumulated rounding
        assert np.median(np.abs(got - want)) < 3e-2


def test_detection_parity(setup):
    pipe, variables, data, img = setup
    dets = pipe.infer_sequence(variables, img[None], instance_masks=True)
    got, want_boxes = dets[0], data["det_boxes"]
    n = min(int(got["valid"].sum()), len(want_boxes))
    assert n > 0
    # top detections agree in box (1px), score (1e-2) and mask IoU (0.95)
    for i in range(min(n, 3)):
        np.testing.assert_allclose(got["boxes"][i], want_boxes[i], atol=1.5)
        np.testing.assert_allclose(got["scores"][i], data["det_scores"][i], atol=1e-2)
        a = got["masks"][i] >= 0.5
        b = data["det_masks"][i] >= 0.5
        union = (a | b).sum()
        assert union == 0 or (a & b).sum() / union > 0.95


def test_manifest_covers_production_graphs(setup):
    """The goldens must exercise the SHIPPED graphs (VERDICT r4 item 7):
    standard 7x7 stem + dilated P2 combine (on every backbone_feats call the
    other tests drive), and — when the capture included a slow_fast
    checkpoint — the SlowFast enhance path. Fails on goldens captured before
    the manifest existed, forcing a re-capture against current production."""
    import json

    from slowfast_vos_tpu.models.resnet_fpn import ResNet50, ResNet50FPN

    _pipe, _v, data, _img = setup
    assert "manifest" in data.files, "goldens predate the manifest; re-capture"
    manifest = json.loads(str(data["manifest"]))
    assert "stem_7x7" in manifest and "fpn_dilated_p2_combine" in manifest
    # The manifest's claims hold only while these production defaults do.
    assert ResNet50.s2d_stem is False and ResNet50FPN.s2d_stem is False


def test_enhance_parity(setup):
    """Replay the captured reference `SlowFastLayers` window (eval-mode BN)
    through our `SlowFastTemporal` — for s != f captures this drives the
    variant-G merged stage-1 eval path (`models/slowfast.py`), the one
    production graph the Mask-R-CNN-only goldens cannot reach. f32 build for
    a tight bound (CLAUDE.md dtype policy)."""
    import jax
    import jax.numpy as jnp

    from slowfast_vos_tpu.convert import convert_state_dict, load_torch_checkpoint
    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables

    _pipe, _v, data, img = setup
    if "enhance_window" not in data.files:
        pytest.skip("goldens captured without --slowfast-checkpoint")
    slow, fast = (int(v) for v in data["enhance_config"])
    ckpt = os.environ.get(
        "GOLDEN_SF_CHECKPOINT", os.environ.get("GOLDEN_CHECKPOINT", "maskrcnn_model.pth")
    )
    import jax.numpy as jnp

    pipe, model = build_pipeline(
        slow=slow, fast=fast, original_hw=img.shape[:2], dtype=jnp.float32
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    variables, _report = convert_state_dict(load_torch_checkpoint(ckpt), variables)
    variables = jax.tree.map(jnp.asarray, variables)

    window = jnp.asarray(data["enhance_window"])  # [F, h, w, 256]
    out = pipe.model.apply(variables, [window], method="enhance", pre_padded=True)[0]
    got = np.asarray(out, np.float32)[0]
    np.testing.assert_allclose(got, data["enhance_out"], atol=1e-3, rtol=1e-3)
