"""BT.601 color transforms as single fused matmuls.

Reference parity: ``ivclab/signal/color.py:3-63`` and the duplicate pair in
``ivclab/image/yuv420codec.py:8-29`` (identical math, one implementation
here). All functions are jit-safe and batch over arbitrary leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Forward BT.601 RGB -> YCbCr (full-range, JPEG convention)
_RGB2YCBCR = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ],
    dtype=np.float32,
)
_YCBCR_OFFSET = np.array([0.0, 128.0, 128.0], dtype=np.float32)

# Exact inverse used by the reference (ivclab/signal/color.py:50-60)
_YCBCR2RGB = np.array(
    [
        [1.0, 0.0, 1.402],
        [1.0, -0.344136, -0.714136],
        [1.0, 1.772, 0.0],
    ],
    dtype=np.float32,
)


# Irreversible Color Transform (JPEG2000 ICT) — the reference's ch1 ICT
# study uses these rounded coefficient sets and NO chroma offset
# (exercises/ch1/ex_ict.py:7-38); kept distinct from the BT.601 pair above
# so the study's numbers match the reference's constants exactly.
_RGB2YCBCR_ICT = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.16875, -0.33126, 0.5],
        [0.5, -0.41869, -0.08131],
    ],
    dtype=np.float32,
)
_YCBCR2RGB_ICT = np.array(
    [
        [1.0, 0.0, 1.402],
        [1.0, -0.34413, -0.71414],
        [1.0, 1.772, 0.0],
    ],
    dtype=np.float32,
)


def rgb2ycbcr_ict(image):
    """RGB -> ICT YCbCr (no chroma offset; Cb/Cr centered at 0).

    Reference parity: ``exercises/ch1/ex_ict.py:7-23``."""
    x = jnp.asarray(image, dtype=jnp.float32)
    return jnp.dot(x, _RGB2YCBCR_ICT.T, precision="highest")


def ycbcr2rgb_ict(image):
    """ICT YCbCr -> RGB, unclipped (callers round+clip at the end, as the
    reference does; exercises/ch1/ex_ict.py:25-38)."""
    x = jnp.asarray(image, dtype=jnp.float32)
    return jnp.dot(x, _YCBCR2RGB_ICT.T, precision="highest")


def rgb2gray(image):
    """Channel-mean grayscale, keepdims (ivclab/signal/color.py:3-13)."""
    x = jnp.asarray(image, dtype=jnp.float32)
    return jnp.mean(x, axis=-1, keepdims=True)


def rgb2ycbcr(image):
    """RGB -> YCbCr: ``x @ M.T + (0, 128, 128)``."""
    x = jnp.asarray(image, dtype=jnp.float32)
    return jnp.dot(x, _RGB2YCBCR.T, precision="highest") + _YCBCR_OFFSET


def ycbcr2rgb(image):
    """YCbCr -> RGB with clip to [0, 255]."""
    x = jnp.asarray(image, dtype=jnp.float32) - _YCBCR_OFFSET
    rgb = jnp.dot(x, _YCBCR2RGB.T, precision="highest")
    return jnp.clip(rgb, 0.0, 255.0)
