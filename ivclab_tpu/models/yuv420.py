"""YUV 4:2:0 chroma subsampling codec.

Reference parity: ``ivclab/image/yuv420codec.py:61-118`` — chroma planes
are symmetrically padded, FIR-decimated by 2 per axis (zero phase),
rounded, re-padded, FFT-resampled back, cropped, recombined and converted
to RGB. All stages run on device through the XLA resampling ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ivclab_tpu.ops.color import rgb2ycbcr, rgb2ycbcr_ict, ycbcr2rgb, ycbcr2rgb_ict
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


def ict_compression(image, chroma_mode: str = "fft"):
    """ICT (offset-free) + 4:2:0 chroma subsampling codec.

    Reference parity for the two ch1 ICT study variants:

    - ``chroma_mode="fft"`` — mirror-pad-4 + FFT-resample down with
      centered crop, mirror-pad-4 + FFT-resample up
      (``exercises/ch1/ex_ict.py:53-135``);
    - ``chroma_mode="fir"`` — zero-phase FIR decimate down, plain FFT
      resample up (``exercises/ch1/ex_ict_decimate.py:85-141``).

    Returns the reconstructed RGB uint8 image (Y is kept full-resolution
    and rounded; only chroma is subsampled, so the nominal rate is
    8 * (1 + 2/4) = 12 bpp as charged by ``exercises/ch1/ex_comparison.py:49``).
    """
    if chroma_mode not in ("fft", "fir"):
        raise ValueError("chroma_mode must be 'fft' or 'fir'")
    x = jnp.asarray(image, dtype=jnp.float32)
    ycbcr = rgb2ycbcr_ict(x)
    Y, Cb, Cr = ycbcr[:, :, 0], ycbcr[:, :, 1], ycbcr[:, :, 2]
    H, W = Y.shape

    if chroma_mode == "fft":

        def down(plane):
            p = jnp.pad(plane, ((4, 4), (4, 4)), mode="symmetric")
            d = fft_resample(fft_resample(p, p.shape[0] // 2, axis=0), p.shape[1] // 2, axis=1)
            cy = (d.shape[0] - H // 2) // 2
            cx = (d.shape[1] - W // 2) // 2
            return jnp.round(d[cy:-cy, cx:-cx])

        def up(plane):
            p = jnp.pad(plane, ((4, 4), (4, 4)), mode="symmetric")
            u = fft_resample(fft_resample(p, H + 8, axis=0), W + 8, axis=1)
            return u[4:-4, 4:-4]

    else:

        def down(plane):
            return jnp.round(decimate(decimate(plane, 2, axis=0), 2, axis=1))

        def up(plane):
            return fft_resample(fft_resample(plane, H, axis=0), W, axis=1)

    ycbcr_rec = jnp.stack([jnp.round(Y), up(down(Cb)), up(down(Cr))], axis=2)
    rgb = ycbcr2rgb_ict(ycbcr_rec)
    return np.asarray(jnp.clip(jnp.round(rgb), 0, 255)).astype(np.uint8)
