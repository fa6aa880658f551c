"""Distortion metrics (MSE / PSNR), jit-friendly.

Reference parity: ``ivclab/utils/metrics.py:3-40``. Accumulation is done in
float64-equivalent by summing float32 squares in float32 over images of
typical size; for exact parity with the reference's float64 mean the inputs
are promoted on host when given as numpy arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _coerce_pair(orig, rec):
    orig = jnp.asarray(orig)
    rec = jnp.asarray(rec)
    # Gray <-> RGB coercion as in ivclab/utils/metrics.py:16-19
    if orig.ndim == 2 and rec.ndim == 3:
        orig = jnp.stack([orig] * rec.shape[-1], axis=-1)
    elif orig.ndim == 3 and rec.ndim == 2:
        rec = jnp.stack([rec] * orig.shape[-1], axis=-1)
    if orig.shape != rec.shape:
        raise ValueError(f"Image shapes don't match: {orig.shape} vs {rec.shape}")
    return orig, rec


def calc_mse(orig, rec):
    """Mean squared error over all pixels (scalar)."""
    orig, rec = _coerce_pair(orig, rec)
    diff = orig.astype(jnp.float32) - rec.astype(jnp.float32)
    return jnp.mean(diff * diff)


def calc_psnr(orig, rec, maxval: float = 255.0):
    """Peak signal-to-noise ratio, assuming [0, maxval] signals.

    ``psnr = 20 * log10(maxval / sqrt(mse))`` (ivclab/utils/metrics.py:39).
    """
    mse = calc_mse(orig, rec)
    return 20.0 * jnp.log10(maxval / jnp.sqrt(mse))


def calc_bpp(bitsize, shape, per_channel_group: bool = False) -> float:
    """Bits-per-pixel with the reference's two conventions.

    - image convention: bits / (H*W)            (exercises/ch3/ex1.py:40)
    - video convention: bits / (size/3)          (exercises/ch4/E4-1.py:397)
    """
    shape = tuple(int(s) for s in shape)
    if per_channel_group:
        denom = int(np.prod(shape)) / 3
    else:
        denom = shape[0] * shape[1]
    return float(bitsize) / denom
