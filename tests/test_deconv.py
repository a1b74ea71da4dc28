"""Matmul+depth-to-space deconv must equal nn.ConvTranspose exactly (same
parameter layout), and stay parity with torch ConvTranspose2d through the
converter's kernel mapping."""
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from slowfast_vos_tpu.ops.deconv import deconv2x2_stride2


def test_matches_flax_conv_transpose():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 5, 7, 6)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(2, 2, 6, 4)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    ref_mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    want = ref_mod.apply({"params": {"kernel": kernel, "bias": bias}}, x)
    got = deconv2x2_stride2(x, kernel, bias)
    assert got.shape == (3, 10, 14, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_mask_head_uses_same_param_layout():
    from slowfast_vos_tpu.models.heads import MaskHead

    head = MaskHead(num_classes=2, channels=8, dtype=jnp.float32)
    x = jnp.zeros((1, 14, 14, 8))
    v = head.init(jax.random.PRNGKey(0), x)
    assert v["params"]["conv5_mask"]["kernel"].shape == (2, 2, 8, 8)
    out = head.apply(v, x)
    assert out.shape == (1, 28, 28, 2)
