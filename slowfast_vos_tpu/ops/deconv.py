"""Mask-head deconvolution as matmul + depth-to-space — MXU-native.

BASELINE.json's north star names the mask-head deconv among the ops to
implement TPU-natively. The head's ConvTranspose2d(256->256, 2x2, stride 2)
has non-overlapping taps, so it is EXACTLY four independent [HW, C] @ [C, O]
matmuls (one per output sub-pixel phase) followed by a depth-to-space
interleave — pure MXU work with no conv_transpose lowering.

Consumes the flax `nn.ConvTranspose` kernel layout [kh, kw, I, O]
(transpose_kernel=False convention, same as the converted torch weights), so
it is a drop-in compute path for the same parameters.
"""
from __future__ import annotations

import jax.numpy as jnp


def deconv2x2_stride2(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """x: [N, H, W, C]; kernel: [2, 2, C, O] (flax ConvTranspose layout);
    returns [N, 2H, 2W, O], identical to nn.ConvTranspose(strides=(2,2)).

    With stride == kernel size, output pixel (2i+di, 2j+dj) receives exactly
    one tap. flax's transpose_kernel=False convention applies the SPATIALLY
    FLIPPED kernel: out[2i+d] = x[i] * K[1-d] (verified exactly in
    tests/test_deconv.py).
    """
    n, h, w, c = x.shape
    o = kernel.shape[-1]
    flat = x.reshape(n * h * w, c)
    # [4, C, O] phase kernels (flipped phases) -> one matmul [N*H*W, 4*O]
    k4 = kernel[::-1, ::-1].reshape(4, c, o).transpose(1, 0, 2).reshape(c, 4 * o)
    y = (flat @ k4).reshape(n, h, w, 2, 2, o)
    # depth-to-space: (i, di) -> 2i+di
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, o)
    if bias is not None:
        y = y + bias
    return y
