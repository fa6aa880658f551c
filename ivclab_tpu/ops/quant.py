"""Per-coefficient block quantization with JPEG Annex-K tables.

Reference parity: ``ivclab/quantization/patchquant.py:3-78``. The tables are
the standard JPEG (ITU-T T.81 Annex K.1) example luminance/chrominance
matrices. Rounding is round-half-to-even (numpy/XLA default), dequantization
truncates toward zero to int32 exactly as the reference's
``astype(np.int32)`` does.

The codec hot path does not call the 5-D facade below: it uses the
scan-ordered flat tables (``quant_table_zigzag``) so quantization fuses into
the Kronecker DCT matmul epilogue (see ``ivclab_tpu/ops/transform.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ivclab_tpu.utils.shape import zigzag_gather_indices

# ITU-T T.81 (JPEG) Annex K.1 example quantization tables.
JPEG_LUMINANCE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 55, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)

# The reference deviates from Annex K at [2,1] (13 instead of 26,
# ivclab/quantization/patchquant.py:30) — matched for parity.
JPEG_CHROMINANCE = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 13, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float32,
)


def quant_tables(num_channels: int = 3, luminance=None, chrominance=None) -> np.ndarray:
    """``[C, 8, 8]`` stack: luminance for channel 0, chrominance for the rest."""
    lum = np.asarray(JPEG_LUMINANCE if luminance is None else luminance, dtype=np.float32)
    chrom = np.asarray(JPEG_CHROMINANCE if chrominance is None else chrominance, dtype=np.float32)
    return np.stack([lum] + [chrom] * (num_channels - 1), axis=0)


def quant_table_zigzag(scale: float, num_channels: int = 3, luminance=None, chrominance=None) -> np.ndarray:
    """Scan-ordered flat tables ``[C, 64]`` scaled by ``scale``."""
    tables = quant_tables(num_channels, luminance, chrominance) * np.float32(scale)
    flat = tables.reshape(num_channels, 64)
    return np.ascontiguousarray(flat[:, zigzag_gather_indices(8)])


def quantize_flat(coeffs, table_flat):
    """``round(c / t)`` -> int32 over ``[..., C, 64]`` scan-ordered coefficients."""
    c = jnp.asarray(coeffs, dtype=jnp.float32)
    inv = jnp.asarray(1.0 / np.asarray(table_flat, dtype=np.float32))
    return jnp.round(c * inv).astype(jnp.int32)


def dequantize_flat(symbols, table_flat):
    """``int(s * t)`` (truncation toward zero) over ``[..., C, 64]``."""
    s = jnp.asarray(symbols, dtype=jnp.float32)
    t = jnp.asarray(table_flat, dtype=jnp.float32)
    return (s * t).astype(jnp.int32)


class PatchQuant:
    """Facade matching ``ivclab/quantization/patchquant.py``.

    Operates on ``[H_patch, W_patch, C, 8, 8]`` block tensors.
    """

    def __init__(self, quantization_scale: float = 1.0, luminance=None, chrominance=None):
        self.quantization_scale = float(quantization_scale)
        self.luminance = np.asarray(JPEG_LUMINANCE if luminance is None else luminance, dtype=np.float32)
        self.chrominance = np.asarray(JPEG_CHROMINANCE if chrominance is None else chrominance, dtype=np.float32)

    def get_quantization_table(self):
        table = np.stack([self.luminance, self.chrominance, self.chrominance], axis=0)
        return table * self.quantization_scale

    def quantize(self, patched_img):
        table = jnp.asarray(self.get_quantization_table())
        x = jnp.asarray(patched_img, dtype=jnp.float32)
        return jnp.round(x / table[None, None, : x.shape[2]]).astype(jnp.int32)

    def dequantize(self, quantized_img):
        table = jnp.asarray(self.get_quantization_table())
        x = jnp.asarray(quantized_img, dtype=jnp.float32)
        return (x * table[None, None, : x.shape[2]]).astype(jnp.int32)
