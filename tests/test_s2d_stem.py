"""The space-to-depth stem must be EXACTLY equivalent to the standard
7x7/stride-2 stem under the kernel remapping."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from slowfast_vos_tpu.models.resnet_fpn import (
    ResNet50,
    space_to_depth,
    stem_kernel_to_s2d,
)


def test_s2d_matches_standard_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)).astype(np.float32))
    w7 = rng.normal(size=(7, 7, 3, 8)).astype(np.float32)

    std = jax.lax.conv_general_dilated(
        x, jnp.asarray(w7), window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = space_to_depth(x, 2)
    s2d = jax.lax.conv_general_dilated(
        y, jnp.asarray(stem_kernel_to_s2d(w7)), window_strides=(1, 1),
        padding=[(2, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert s2d.shape == std.shape
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(std), atol=1e-4)


def test_resnet_s2d_vs_standard_stem_outputs():
    """Full ResNet: s2d model with remapped conv1 == standard model."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))

    std = ResNet50(dtype=jnp.float32, s2d_stem=False)
    vstd = std.init(jax.random.PRNGKey(0), x)
    s2d = ResNet50(dtype=jnp.float32, s2d_stem=True)
    vs2d = s2d.init(jax.random.PRNGKey(0), x)

    # copy all params; remap conv1
    import copy

    p = copy.deepcopy(jax.tree.map(np.asarray, vstd["params"]))
    p["conv1"] = {"kernel": stem_kernel_to_s2d(p["conv1"]["kernel"])}
    out_std = std.apply(vstd, x)
    out_s2d = s2d.apply({"params": p}, x)
    for a, b in zip(out_std, out_s2d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_migrate_params_converts_old_stem():
    """Pre-s2d checkpoints (7x7 stem) load into s2d models exactly."""
    from slowfast_vos_tpu.utils.checkpoint import migrate_params

    rng = np.random.default_rng(2)
    w7 = rng.normal(size=(7, 7, 3, 64)).astype(np.float32)
    loaded = {"backbone": {"body": {"conv1": {"kernel": w7}}}}
    target = {"backbone": {"body": {"conv1": {"kernel": np.zeros((4, 4, 12, 64))}}}}
    out = migrate_params(loaded, target)
    np.testing.assert_array_equal(
        out["backbone"]["body"]["conv1"]["kernel"], stem_kernel_to_s2d(w7)
    )
    # same-layout passthrough
    same = migrate_params(loaded, loaded)
    assert same["backbone"]["body"]["conv1"]["kernel"] is w7


def test_stem_kernel_roundtrip_both_ways():
    """stem_kernel_from_s2d is the exact inverse of stem_kernel_to_s2d, so
    s2d-era checkpoints load into the (now default) standard-stem models."""
    from slowfast_vos_tpu.models.resnet_fpn import stem_kernel_from_s2d

    rng = np.random.default_rng(7)
    w7 = rng.normal(size=(7, 7, 3, 64)).astype(np.float32)
    np.testing.assert_array_equal(stem_kernel_from_s2d(stem_kernel_to_s2d(w7)), w7)


def test_migrate_params_converts_s2d_to_standard():
    from slowfast_vos_tpu.utils.checkpoint import migrate_params
    from slowfast_vos_tpu.models.resnet_fpn import stem_kernel_from_s2d

    rng = np.random.default_rng(8)
    w44 = rng.normal(size=(4, 4, 12, 64)).astype(np.float32)
    loaded = {"backbone": {"body": {"conv1": {"kernel": w44}}}}
    target = {"backbone": {"body": {"conv1": {"kernel": np.zeros((7, 7, 3, 64))}}}}
    out = migrate_params(loaded, target)
    np.testing.assert_array_equal(
        out["backbone"]["body"]["conv1"]["kernel"], stem_kernel_from_s2d(w44)
    )


def test_from_s2d_warns_on_trained_out_of_field_taps():
    """The s2d kernel's (k=0, p=0) slots sit at tap e=-4, outside the 7x7
    receptive field. They are zero for any kernel produced by
    `stem_kernel_to_s2d` (no warning), but a fine-tuned s2d checkpoint can
    carry signal there; dropping it silently would make the migration lossy
    without notice (ADVICE r4)."""
    import warnings

    from slowfast_vos_tpu.models.resnet_fpn import stem_kernel_from_s2d

    rng = np.random.default_rng(9)
    w7 = rng.normal(size=(7, 7, 3, 64)).astype(np.float32)
    clean = stem_kernel_to_s2d(w7)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        stem_kernel_from_s2d(clean)  # migrated kernel: silent

    trained = clean.copy()
    trained[0, 2, 0:3] = 0.5  # ki=0, pi=0 slot (tap ei=-4): fine-tuned signal
    with pytest.warns(UserWarning, match="lossy"):
        stem_kernel_from_s2d(trained)
