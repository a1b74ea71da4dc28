import numpy as np
import jax.numpy as jnp

from slowfast_vos_tpu.ops import paste_masks_in_image


def test_constant_mask_fills_box():
    masks = jnp.ones((1, 28, 28), jnp.float32)
    boxes = jnp.array([[10.0, 20.0, 30.0, 50.0]])
    out = np.asarray(paste_masks_in_image(masks, boxes, (64, 64)))
    assert out.shape == (1, 64, 64)
    # interior of the box is 1, outside 0
    assert np.allclose(out[0, 21:50, 11:30], 1.0)
    assert out[0, :20, :].max() == 0.0
    assert out[0, :, :10].max() == 0.0
    assert out[0, 51:, :].max() == 0.0


def test_valid_mask_zeroes_output():
    masks = jnp.ones((2, 28, 28), jnp.float32)
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]] * 2)
    out = np.asarray(
        paste_masks_in_image(masks, boxes, (16, 16), valid=jnp.array([True, False]))
    )
    assert out[0].max() > 0
    assert out[1].max() == 0


def test_mask_values_interpolated():
    # gradient mask: left half 0, right half 1 -> pasted keeps ordering
    m = np.zeros((1, 28, 28), np.float32)
    m[:, :, 14:] = 1.0
    boxes = jnp.array([[0.0, 0.0, 27.0, 27.0]])
    out = np.asarray(paste_masks_in_image(jnp.asarray(m), boxes, (28, 28)))
    assert out[0, 10, 2] < 0.1 and out[0, 10, 25] > 0.9
