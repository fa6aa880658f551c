"""Predictive (DPCM) still-image codec with in-loop residual quantization.

Reference parity: the ch2 DPCM codec exercises — 3-pixel closed-loop
predictor + optional 4:2:0 chroma subsampling + per-image Huffman over the
residuals, swept over quantization steps
(``exercises/ch2/ex_final_codec.py:57-102``, ``ex_codec_working.py``).

The closed loop (prediction from *reconstructed* neighbors, residual
quantized in-loop) runs as the anti-diagonal wavefront kernel; the decoder
rebuilds from residuals + the verbatim first row/column.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ivclab_tpu.entropy.huffman import HuffmanCoder
from ivclab_tpu.entropy.stats import smooth_pmf
from ivclab_tpu.models.predictive import COEFFS_CBCR, COEFFS_Y
from ivclab_tpu.models.intracodec import bucket_bounds
from ivclab_tpu.ops.color import rgb2ycbcr, ycbcr2rgb
from ivclab_tpu.ops.predictive import predict_from_neighbors, reconstruct_from_residual
from ivclab_tpu.ops.resample import decimate, fft_resample


class PredictiveCodec:
    """3-pixel DPCM codec: encode_decode -> (recon_rgb, total_bits)."""

    def __init__(self, quant_step: float = 1.0, subsample_chroma: bool = True):
        self.quant_step = float(quant_step)
        self.subsample_chroma = bool(subsample_chroma)
        self.huffman: HuffmanCoder | None = None

    def _residuals(self, img_rgb):
        x = jnp.asarray(img_rgb, dtype=jnp.float32)
        ycbcr = rgb2ycbcr(x)
        Y = ycbcr[:, :, 0:1]
        CbCr = ycbcr[:, :, 1:3]
        if self.subsample_chroma:
            cb = decimate(decimate(CbCr[:, :, 0], 2, axis=0), 2, axis=1)
            cr = decimate(decimate(CbCr[:, :, 1], 2, axis=0), 2, axis=1)
            CbCr = jnp.stack([cb, cr], axis=-1)
        res_Y, rec_Y = predict_from_neighbors(Y, COEFFS_Y, self.quant_step, return_recon=True)
        res_C, rec_C = predict_from_neighbors(CbCr, COEFFS_CBCR, self.quant_step, return_recon=True)
        return (res_Y, rec_Y, Y), (res_C, rec_C, CbCr)

    def encode_decode(self, img_rgb, return_bpp: bool = False):
        img_rgb = np.asarray(img_rgb)
        H, W = img_rgb.shape[:2]
        (res_Y, _, Y), (res_C, _, CbCr) = self._residuals(img_rgb)

        all_res = np.concatenate(
            [np.asarray(res_Y).ravel(), np.asarray(res_C).ravel()]
        ).astype(np.int64)
        lo, hi = bucket_bounds(int(all_res.min()), int(all_res.max()), margin=1, bucket=16)
        hist = np.bincount((all_res - lo).astype(np.int64), minlength=hi - lo)
        pmf = np.asarray(smooth_pmf(hist / hist.sum()), dtype=np.float64)
        self.huffman = HuffmanCoder(lower_bound=lo).train(pmf)

        total_bits = 0
        for res in (np.asarray(res_Y), np.asarray(res_C)):
            _, bits = self.huffman.encode(np.round(res).astype(np.int64).ravel())
            total_bits += int(bits)

        # decoder side: rebuild from residuals + verbatim borders
        recon_Y = reconstruct_from_residual(
            res_Y, Y[0, :, :], Y[:, 0, :], COEFFS_Y, self.quant_step
        )
        recon_C = reconstruct_from_residual(
            res_C, CbCr[0, :, :], CbCr[:, 0, :], COEFFS_CBCR, self.quant_step
        )
        if self.subsample_chroma:
            cb = fft_resample(fft_resample(recon_C[:, :, 0], H, axis=0), W, axis=1)
            cr = fft_resample(fft_resample(recon_C[:, :, 1], H, axis=0), W, axis=1)
            recon_C = jnp.stack([cb, cr], axis=-1)
        recon_Y = jnp.asarray(recon_Y)
        if recon_Y.ndim == 2:
            recon_Y = recon_Y[:, :, None]
        ycbcr = jnp.concatenate([recon_Y, recon_C], axis=-1)
        recon = np.asarray(jnp.clip(jnp.round(ycbcr2rgb(ycbcr)), 0, 255)).astype(np.uint8)

        if return_bpp:
            return recon, total_bits, total_bits / (H * W)
        return recon, total_bits
