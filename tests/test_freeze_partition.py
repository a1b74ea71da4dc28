"""Leaf-level freeze partition for train_backbone=True workloads.

torchvision's FrozenBatchNorm2d tensors are buffers: `backbone.parameters()`
never yields them, so the reference never updates or weight-decays them even
under the OSVOS freeze='none' policy (`code/osvos/osvos_model.py:25-27`).
The pretrain path additionally inherits torchvision's
`trainable_backbone_layers=3` default (conv1/bn1/layer1 frozen,
`code/maskrcnn/maskrcnn_src.py:190,253-255`). These tests pin both:

* trainable_labels marks exactly the right leaves;
* a real optimizer step with train_backbone=True leaves every FrozenBN leaf
  (and, in pretrain mode, conv1/layer1) bit-identical while still updating
  every backbone conv kernel it should (OSVOS 'none' trains all of them).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowfast_vos_tpu.models.pipeline import build_pipeline, init_variables
from slowfast_vos_tpu.train import Trainer
from slowfast_vos_tpu.train.train_step import trainable_labels

from tests.test_train_step import TINY_CFG, make_batch


def _get(tree, *keys):
    for k in keys:
        tree = tree[k]
    return tree


def _flatten_with_labels(params, labels):
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_l = jax.tree_util.tree_leaves(labels)
    assert len(flat_p) == len(flat_l)
    return [(jax.tree_util.keystr(p), leaf, lab) for (p, leaf), lab in zip(flat_p, flat_l)]


@pytest.fixture(scope="module")
def setup():
    pipe, model = build_pipeline(
        slow=1, fast=3, original_hw=(60, 100), min_size=64, max_size=128,
        cfg=TINY_CFG, backbone_batch=4, chunk=4,
    )
    variables = init_variables(model, jax.random.PRNGKey(0))
    return pipe, variables


def test_trainable_labels_structure(setup):
    _, variables = setup
    params = variables["params"]

    # OSVOS 'none': whole backbone trainable except FrozenBN leaves.
    lab = trainable_labels(params)
    assert _get(lab, "backbone", "body", "conv1", "kernel") == "train"
    assert _get(lab, "backbone", "body", "layer1_0", "conv1", "kernel") == "train"
    for leaf in ("scale", "bias", "mean", "var"):
        assert _get(lab, "backbone", "body", "bn1", leaf) == "freeze"
        assert _get(lab, "backbone", "body", "layer3_2", "bn2", leaf) == "freeze"
        assert _get(lab, "backbone", "body", "layer1_0", "downsample_bn", leaf) == "freeze"
    assert _get(lab, "backbone", "fpn", "inner_0", "kernel") == "train"
    assert set(jax.tree_util.tree_leaves(lab["box_head"])) == {"train"}
    assert set(jax.tree_util.tree_leaves(lab["rpn"])) == {"train"}
    # SlowFast's train-mode BN keeps mean/var in batch_stats, so its params
    # must NOT be caught by the FrozenBN key-set detector.
    assert set(jax.tree_util.tree_leaves(lab["slow_fast"])) == {"train"}

    # Pretrain: torchvision trainable_backbone_layers=3.
    lab3 = trainable_labels(params, 3)
    assert _get(lab3, "backbone", "body", "conv1", "kernel") == "freeze"
    assert _get(lab3, "backbone", "body", "layer1_2", "conv3", "kernel") == "freeze"
    assert _get(lab3, "backbone", "body", "layer1_0", "downsample_conv", "kernel") == "freeze"
    assert _get(lab3, "backbone", "body", "layer2_0", "conv1", "kernel") == "train"
    assert _get(lab3, "backbone", "body", "layer4_0", "conv2", "kernel") == "train"
    assert _get(lab3, "backbone", "fpn", "layer_0", "kernel") == "train"
    # FrozenBN stays frozen inside trainable stages too (buffers).
    assert _get(lab3, "backbone", "body", "layer2_0", "bn1", "scale") == "freeze"

    # trainable_backbone_layers=5 unfreezes everything except FrozenBN buffers.
    lab5 = trainable_labels(params, 5)
    assert _get(lab5, "backbone", "body", "conv1", "kernel") == "train"
    assert _get(lab5, "backbone", "body", "bn1", "scale") == "freeze"


def _run_one_step(pipe, variables, **trainer_kw):
    trainer = Trainer(pipe, lr=0.05, train_backbone=True, **trainer_kw)
    state = trainer.init_state(variables)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    batch = make_batch(np.random.default_rng(0))
    state, metrics = trainer.step(state, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(metrics["loss"]))
    return before, state.params, trainer


def test_osvos_none_step_freezes_only_frozen_bn(setup):
    pipe, variables = setup
    before, after, _ = _run_one_step(pipe, variables)
    labels = trainable_labels(before)
    n_changed = n_frozen = 0
    for (path, b, lab), (_, a, _) in zip(
        _flatten_with_labels(before, labels), _flatten_with_labels(after, labels)
    ):
        if lab == "freeze":
            np.testing.assert_array_equal(b, np.asarray(a), err_msg=path)
            n_frozen += 1
        elif not np.array_equal(b, np.asarray(a)):
            n_changed += 1
    assert n_frozen > 100  # the backbone has 53 FrozenBN modules x 4 leaves
    # OSVOS 'none' must still update (essentially) every backbone conv: check
    # the stem and one kernel from each stage explicitly.
    for keys in (
        ("backbone", "body", "conv1", "kernel"),
        ("backbone", "body", "layer1_0", "conv2", "kernel"),
        ("backbone", "body", "layer4_2", "conv3", "kernel"),
        ("backbone", "fpn", "inner_0", "kernel"),
    ):
        assert not np.array_equal(_get(before, *keys), np.asarray(_get(after, *keys))), keys
    assert n_changed > 50


def test_pretrain_step_freezes_conv1_layer1_and_frozen_bn(setup):
    pipe, variables = setup
    before, after, _ = _run_one_step(pipe, variables, trainable_backbone_layers=3)
    labels = trainable_labels(before, 3)
    for (path, b, lab), (_, a, _) in zip(
        _flatten_with_labels(before, labels), _flatten_with_labels(after, labels)
    ):
        if lab == "freeze":
            np.testing.assert_array_equal(b, np.asarray(a), err_msg=path)
    # conv1 + all of layer1 bit-identical…
    np.testing.assert_array_equal(
        _get(before, "backbone", "body", "conv1", "kernel"),
        np.asarray(_get(after, "backbone", "body", "conv1", "kernel")),
    )
    for leaf_path, b in jax.tree_util.tree_leaves_with_path(
        _get(before, "backbone", "body", "layer1_1")
    ):
        a = _get(after, "backbone", "body", "layer1_1")
        for k in leaf_path:
            a = a[k.key]
        np.testing.assert_array_equal(b, np.asarray(a))
    # …while layer2..4 conv kernels and the FPN still train.
    for keys in (
        ("backbone", "body", "layer2_0", "conv1", "kernel"),
        ("backbone", "body", "layer3_1", "conv2", "kernel"),
        ("backbone", "fpn", "layer_1", "kernel"),
    ):
        assert not np.array_equal(_get(before, *keys), np.asarray(_get(after, *keys))), keys
