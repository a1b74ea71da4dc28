"""The load-bearing test for the TPU redesign: the reference computes SlowFast
features per frame over a sliding window (code/helpers/model.py:318-340); we
compute them with ONE valid-conv pass over the whole padded clip. These must be
numerically identical (eval-mode BN)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slowfast_vos_tpu.models.slowfast import (
    SlowFastTemporal,
    pathway_kernel_sizes,
    fuse_kernel_size,
)


@pytest.mark.parametrize("slow,fast", [(1, 1), (3, 3), (7, 7), (1, 7), (3, 7)])
def test_kernel_sizes_collapse_pathway(slow, fast):
    for p in (slow, fast):
        ks = pathway_kernel_sizes(p)
        # three valid convs collapse p -> 1
        out = p
        for k in ks:
            out = out - k + 1
        assert out == 1, (p, ks)
    ks = pathway_kernel_sizes(slow)
    kf = pathway_kernel_sizes(fast)
    kfuse1, out_s1, out_f1 = fuse_kernel_size(slow, ks[0], fast, kf[0])
    assert out_f1 - kfuse1 + 1 == out_s1


@pytest.mark.parametrize("slow,fast", [(1, 1), (3, 3), (1, 7), (3, 7)])
def test_sequence_mode_equals_window_mode(slow, fast):
    t, h, w, c = 6, 8, 8, 16
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(t, h, w, c)).astype(np.float32))

    mod = SlowFastTemporal(slow=slow, fast=fast, channels=c, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), feats)

    seq_out = mod.apply(variables, feats)  # [T, H, W, 256]
    assert seq_out.shape == (t, h, w, 224 + 32)

    left = fast // 2
    right = -(-fast // 2) - 1
    padded = jnp.pad(feats, ((left, right), (0, 0), (0, 0), (0, 0)))
    for frame in range(t):
        window = padded[frame : frame + fast]
        win_out = mod.apply(variables, window, pre_padded=True)
        assert win_out.shape == (1, h, w, 256)
        np.testing.assert_allclose(
            np.asarray(win_out[0]), np.asarray(seq_out[frame]), atol=2e-4,
            err_msg=f"frame {frame} slow={slow} fast={fast}",
        )


def test_training_mode_updates_batch_stats():
    mod = SlowFastTemporal(slow=1, fast=1, channels=8, dtype=jnp.float32)
    feats = jnp.ones((2, 4, 4, 8))
    variables = mod.init(jax.random.PRNGKey(0), feats)
    out, updates = mod.apply(variables, feats, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 4, 4, 256)
    before = variables["batch_stats"]["slow1_bn"]["mean"]
    after = updates["batch_stats"]["slow1_bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
