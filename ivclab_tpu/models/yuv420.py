"""YUV 4:2:0 chroma subsampling codec.

Reference parity: ``ivclab/image/yuv420codec.py:61-118`` — chroma planes
are symmetrically padded, FIR-decimated by 2 per axis (zero phase),
rounded, re-padded, FFT-resampled back, cropped, recombined and converted
to RGB. All stages run on device through the XLA resampling ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ivclab_tpu.ops.color import rgb2ycbcr, ycbcr2rgb
from ivclab_tpu.ops.resample import decimate, fft_resample

_PAD_HIGH = 4
_PAD_LOW = 2


def pad_image(img, resolution: str = "high"):
    """Symmetric padding: 4 px at full resolution, 2 px at half."""
    pad = _PAD_HIGH if resolution == "high" else _PAD_LOW
    return jnp.pad(jnp.asarray(img), ((pad, pad), (pad, pad)), mode="symmetric")

def crop_image(img, resolution: str = "high"):
    pad = _PAD_HIGH if resolution == "high" else _PAD_LOW
    return jnp.asarray(img)[pad:-pad, pad:-pad]


def yuv420compression(image):
    """RGB -> YCbCr 4:2:0 -> reconstructed RGB uint8."""
    x = jnp.asarray(image, dtype=jnp.float32)
    ycbcr = rgb2ycbcr(x)
    Y, Cb, Cr = ycbcr[:, :, 0], ycbcr[:, :, 1], ycbcr[:, :, 2]

    def down(plane):
        p = pad_image(plane, "high")
        return jnp.round(decimate(decimate(p, 2, axis=0), 2, axis=1))

    cb_ds, cr_ds = down(Cb), down(Cr)

    Hp, Wp = Y.shape[0] + 2 * _PAD_HIGH, Y.shape[1] + 2 * _PAD_HIGH

    def up(plane):
        p = pad_image(plane, "low")
        p = fft_resample(fft_resample(p, Hp, axis=0), Wp, axis=1)
        return crop_image(p, "high")

    ycbcr_rec = jnp.stack([jnp.round(Y), up(cb_ds), up(cr_ds)], axis=2)
    rgb = ycbcr2rgb(ycbcr_rec)
    return np.asarray(jnp.clip(jnp.round(rgb), 0, 255)).astype(np.uint8)
