"""Weight-converter tests: numerical parity of each layout transform against
torch (cpu torch is available; torchvision is not, so torchvision-equivalent
modules are built from raw torch.nn layers), plus a full-name-coverage check
that every torchvision-style key is consumed with the right target shape."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from flax import linen as nn

from slowfast_vos_tpu.convert.torchvision_weights import (
    _conv,
    _conv3d,
    _deconv,
    _fc6,
    _linear,
    convert_state_dict,
)


def test_conv2d_parity():
    tconv = torch.nn.Conv2d(3, 8, 3, padding=1)
    x = np.random.default_rng(0).normal(size=(2, 6, 6, 3)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    fconv = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)])
    variables = {
        "params": {
            "kernel": jnp.asarray(_conv(tconv.weight.detach().numpy())),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    got = np.asarray(fconv.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_transpose_parity():
    """conv5_mask: ConvTranspose2d(256->256, 2, stride 2) layout."""
    tdeconv = torch.nn.ConvTranspose2d(4, 6, 2, stride=2)
    x = np.random.default_rng(1).normal(size=(2, 5, 5, 4)).astype(np.float32)
    with torch.no_grad():
        want = tdeconv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    fdeconv = nn.ConvTranspose(6, (2, 2), strides=(2, 2))
    variables = {
        "params": {
            "kernel": jnp.asarray(_deconv(tdeconv.weight.detach().numpy())),
            "bias": jnp.asarray(tdeconv.bias.detach().numpy()),
        }
    }
    got = np.asarray(fdeconv.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv3d_parity():
    tconv = torch.nn.Conv3d(3, 5, (2, 3, 3), padding=(0, 1, 1))
    x = np.random.default_rng(2).normal(size=(1, 4, 6, 6, 3)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.tensor(x.transpose(0, 4, 1, 2, 3))).numpy().transpose(0, 2, 3, 4, 1)

    fconv = nn.Conv(5, (2, 3, 3), padding=[(0, 0), (1, 1), (1, 1)])
    variables = {
        "params": {
            "kernel": jnp.asarray(_conv3d(tconv.weight.detach().numpy())),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    got = np.asarray(fconv.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fc6_flatten_permutation():
    """torch flattens CHW, we flatten HWC: the converted fc6 must give the
    same output on the same (channels-last) pooled features."""
    rng = np.random.default_rng(3)
    pooled_hwc = rng.normal(size=(2, 7, 7, 16)).astype(np.float32)
    tfc = torch.nn.Linear(16 * 49, 32)
    with torch.no_grad():
        flat_chw = torch.tensor(pooled_hwc.transpose(0, 3, 1, 2).reshape(2, -1))
        want = tfc(flat_chw).numpy()

    kernel = _fc6(tfc.weight.detach().numpy(), pooled=7, channels=16)
    got = pooled_hwc.reshape(2, -1) @ kernel + tfc.bias.detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_linear_parity():
    tl = torch.nn.Linear(8, 4)
    x = np.random.default_rng(4).normal(size=(3, 8)).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.tensor(x)).numpy()
    got = x @ _linear(tl.weight.detach().numpy()) + tl.bias.detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_frozen_bn_matches_torch_eval_bn():
    from slowfast_vos_tpu.models.layers import FrozenBatchNorm

    tbn = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(6) + 0.5)
        tbn.bias.copy_(torch.rand(6))
        tbn.running_mean.copy_(torch.rand(6))
        tbn.running_var.copy_(torch.rand(6) + 0.5)
    tbn.eval()
    x = np.random.default_rng(5).normal(size=(2, 4, 4, 6)).astype(np.float32)
    with torch.no_grad():
        want = tbn(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    fbn = FrozenBatchNorm(6)
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
            "mean": jnp.asarray(tbn.running_mean.numpy()),
            "var": jnp.asarray(tbn.running_var.numpy()),
        }
    }
    got = np.asarray(fbn.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _fake_torchvision_state_dict(variables):
    """Build a torchvision-named state dict with shapes derived by inverting
    our param tree — covers every backbone/rpn/head/slow_fast leaf."""
    import re as _re

    sd = {}
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    rng = np.random.default_rng(0)

    def rand(shape):
        return rng.normal(size=shape).astype(np.float32)

    def randvar(shape):
        # running variances must be positive (sqrt(var+eps) downstream)
        return (rng.random(shape) + 0.5).astype(np.float32)

    def inv_conv(k):
        return rand(np.transpose(k, (3, 2, 0, 1)).shape)

    # backbone body (conv1 source is always the torchvision [64,3,7,7] stem,
    # regardless of whether the target uses the space-to-depth layout)
    body = params["backbone"]["body"]
    sd["backbone.body.conv1.weight"] = rand((64, 3, 7, 7))
    for sfx, tgt in [("weight", "scale"), ("bias", "bias"), ("running_mean", "mean"), ("running_var", "var")]:
        sd[f"backbone.body.bn1.{sfx}"] = (randvar if sfx == "running_var" else rand)(body["bn1"][tgt].shape)
    for name, sub in body.items():
        m = _re.match(r"layer(\d)_(\d+)$", name)
        if not m:
            continue
        st, blk = m.groups()
        for ci in "123":
            sd[f"backbone.body.layer{st}.{blk}.conv{ci}.weight"] = inv_conv(sub[f"conv{ci}"]["kernel"])
            for sfx, tgt in [("weight", "scale"), ("bias", "bias"), ("running_mean", "mean"), ("running_var", "var")]:
                sd[f"backbone.body.layer{st}.{blk}.bn{ci}.{sfx}"] = (randvar if sfx == "running_var" else rand)(sub[f"bn{ci}"][tgt].shape)
        if "downsample_conv" in sub:
            sd[f"backbone.body.layer{st}.{blk}.downsample.0.weight"] = inv_conv(sub["downsample_conv"]["kernel"])
            for sfx, tgt in [("weight", "scale"), ("bias", "bias"), ("running_mean", "mean"), ("running_var", "var")]:
                sd[f"backbone.body.layer{st}.{blk}.downsample.1.{sfx}"] = (randvar if sfx == "running_var" else rand)(sub["downsample_bn"][tgt].shape)
    # fpn
    for i in range(4):
        sd[f"backbone.fpn.inner_blocks.{i}.weight"] = inv_conv(params["backbone"]["fpn"][f"inner_{i}"]["kernel"])
        sd[f"backbone.fpn.inner_blocks.{i}.bias"] = rand(params["backbone"]["fpn"][f"inner_{i}"]["bias"].shape)
        sd[f"backbone.fpn.layer_blocks.{i}.weight"] = inv_conv(params["backbone"]["fpn"][f"layer_{i}"]["kernel"])
        sd[f"backbone.fpn.layer_blocks.{i}.bias"] = rand(params["backbone"]["fpn"][f"layer_{i}"]["bias"].shape)
    # rpn
    for mod in ("conv", "cls_logits", "bbox_pred"):
        sd[f"rpn.head.{mod}.weight"] = inv_conv(params["rpn"][mod]["kernel"])
        sd[f"rpn.head.{mod}.bias"] = rand(params["rpn"][mod]["bias"].shape)
    # box head
    sd["roi_heads.box_head.fc6.weight"] = rand(params["box_head"]["fc6"]["kernel"].shape[::-1])
    sd["roi_heads.box_head.fc6.bias"] = rand(params["box_head"]["fc6"]["bias"].shape)
    sd["roi_heads.box_head.fc7.weight"] = rand(params["box_head"]["fc7"]["kernel"].shape[::-1])
    sd["roi_heads.box_head.fc7.bias"] = rand(params["box_head"]["fc7"]["bias"].shape)
    for mod in ("cls_score", "bbox_pred"):
        sd[f"roi_heads.box_predictor.{mod}.weight"] = rand(params["box_head"][mod]["kernel"].shape[::-1])
        sd[f"roi_heads.box_predictor.{mod}.bias"] = rand(params["box_head"][mod]["bias"].shape)
    # mask head
    for i in "1234":
        sd[f"roi_heads.mask_head.mask_fcn{i}.weight"] = inv_conv(params["mask_head"][f"mask_fcn{i}"]["kernel"])
        sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = rand(params["mask_head"][f"mask_fcn{i}"]["bias"].shape)
    k = params["mask_head"]["conv5_mask"]["kernel"]
    sd["roi_heads.mask_predictor.conv5_mask.weight"] = rand(np.transpose(k, (2, 3, 0, 1)).shape)
    sd["roi_heads.mask_predictor.conv5_mask.bias"] = rand(params["mask_head"]["conv5_mask"]["bias"].shape)
    sd["roi_heads.mask_predictor.mask_fcn_logits.weight"] = inv_conv(params["mask_head"]["mask_fcn_logits"]["kernel"])
    sd["roi_heads.mask_predictor.mask_fcn_logits.bias"] = rand(params["mask_head"]["mask_fcn_logits"]["bias"].shape)
    # slow_fast (full SegmentationModel checkpoints)
    from slowfast_vos_tpu.convert.torchvision_weights import _SF_MAP

    for src, tgt in _SF_MAP.items():
        if tgt.endswith("_bn"):
            sd[f"slow_fast.{src}.weight"] = rand(params["slow_fast"][tgt]["scale"].shape)
            sd[f"slow_fast.{src}.bias"] = rand(params["slow_fast"][tgt]["bias"].shape)
            sd[f"slow_fast.{src}.running_mean"] = rand(bstats["slow_fast"][tgt]["mean"].shape)
            sd[f"slow_fast.{src}.running_var"] = randvar(bstats["slow_fast"][tgt]["var"].shape)
        else:
            kk = params["slow_fast"][tgt]["kernel"]
            sd[f"slow_fast.{src}.weight"] = rand(np.transpose(kk, (4, 3, 0, 1, 2)).shape)
            if "bias" in params["slow_fast"][tgt]:
                sd[f"slow_fast.{src}.bias"] = rand(params["slow_fast"][tgt]["bias"].shape)
    return sd


def test_full_state_dict_coverage():
    from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables

    pipe, model = build_pipeline(slow=3, fast=3, original_hw=(60, 100), min_size=64, max_size=128)
    variables = init_variables(model, jax.random.PRNGKey(0))
    sd = _fake_torchvision_state_dict(variables)
    new_vars, report = convert_state_dict(sd, variables)
    assert report["unused_source_keys"] == [], report["unused_source_keys"][:10]
    assert report["converted"] == len(sd)
    # converted values landed (not still the init values)
    got = new_vars["params"]["box_head"]["fc7"]["kernel"]
    np.testing.assert_allclose(got, _linear(sd["roi_heads.box_head.fc7.weight"]))
    # tree structure identical
    assert jax.tree_util.tree_structure(jax.tree.map(np.shape, new_vars)) == jax.tree_util.tree_structure(
        jax.tree.map(np.shape, jax.tree.map(np.asarray, variables))
    )


def test_full_segmentation_pth_roundtrips_into_running_pipeline(tmp_path):
    """Day-one real-weight validation must be ONE command (RUNBOOK steps 0-2):
    a reference `model_slow_fast_*.pth` — a full SegmentationModel state dict
    whose Mask R-CNN keys are prefixed `maskrcnn_model.` and whose temporal
    keys are `slow_fast.*` (reference `code/train.py:112-121` saves the whole
    module) — must load through the drivers' `_load_init` (`scripts/train.py`)
    with zero unused keys AND produce a pipeline that runs end to end."""
    from scripts.train import _load_init
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
        cfg=cfg, backbone_batch=4, chunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))

    bare = _fake_torchvision_state_dict(variables)
    # N(0,1) conv weights overflow bf16 through 50 layers; shrink them so the
    # converted net produces finite detections (BN shifts keep signals alive).
    bare = {k: (v * 0.02 if v.ndim >= 2 else v) for k, v in bare.items()}
    # Real full-checkpoint layout: SegmentationModel attributes are
    # `maskrcnn_model` and `slow_fast`, so every Mask R-CNN key is prefixed.
    full = {
        (k if k.startswith("slow_fast.") else f"maskrcnn_model.{k}"): torch.tensor(v)
        for k, v in bare.items()
    }
    # num_batches_tracked buffers ride along in real torch checkpoints and
    # must be ignored, not reported unused.
    full["maskrcnn_model.backbone.body.bn1.num_batches_tracked"] = torch.tensor(0)
    path = str(tmp_path / "model_slow_fast_1_3.pth")
    torch.save(full, path)

    from slowfast_vos_tpu.convert import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    _, report = convert_state_dict(sd, variables)
    assert report["unused_source_keys"] == [], report["unused_source_keys"][:10]
    assert report["converted"] == len(bare)

    loaded = _load_init(path, variables)
    # the prefixed keys landed (not still init values)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["box_head"]["fc7"]["kernel"]),
        _linear(bare["roi_heads.box_head.fc7.weight"]),
    )
    dets = pipe.infer_sequence(loaded, np.zeros((3, 60, 100, 3), np.uint8))
    assert len(dets) == 3
    for det in dets:
        assert np.isfinite(det["boxes"]).all()
        assert det["union_mask"].shape == (60, 100)
