"""Closed-loop DPCM prediction as an anti-diagonal wavefront scan.

Reference parity: ``ivclab/image/predictive.py`` — the sequential
top-left -> bottom-right triple loop (`_predict_from_neighbors`,
predictive.py:36-88, hot loop #2 in SURVEY.md §3.4) becomes a
``lax.fori_loop`` over the 2H+2W anti-diagonals: every pixel on a diagonal
depends only on the two previous diagonals, so each step updates a whole
diagonal vector at once. Sequential depth drops from H*W to H+W.

The same kernel runs the codec's closed loop with in-loop residual
quantization (``quant_step`` > 1), which the ch2 DPCM codec RD sweep needs
(reference exercises/ch2/ex_final_codec.py:57-102).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("coefficients",))
def _wavefront_dpcm(original, coefficients, quant_step):
    """Forward closed-loop DPCM over ``[H, W, C]``.

    prediction = a*recon(left) + b*recon(top-left) + c*recon(top)
    error      = round((orig - prediction) / q)
    recon      = prediction + error * q

    First row and column are copied verbatim (reference
    predictive.py:64-66; their residual is zero and they ship as raw
    samples). Returns (residual_error, reconstruction).
    """
    a, b, c = (jnp.float32(v) for v in coefficients)
    x = jnp.asarray(original, dtype=jnp.float32)
    H, W, C = x.shape
    q = jnp.float32(quant_step)

    recon = jnp.zeros_like(x)
    recon = recon.at[0, :, :].set(x[0, :, :])
    recon = recon.at[:, 0, :].set(x[:, 0, :])
    residual = jnp.zeros_like(x)

    ii = jnp.arange(1, H, dtype=jnp.int32)  # candidate rows of a diagonal

    def body(d, carry):
        recon, residual = carry
        jj = d - ii
        valid = (jj >= 1) & (jj <= W - 1)
        jc = jnp.where(valid, jj, 1)
        left = recon[ii, jc - 1]
        top = recon[ii - 1, jc]
        top_left = recon[ii - 1, jc - 1]
        pred = a * left + b * top_left + c * top
        err = jnp.round((x[ii, jc] - pred) / q)
        rec = pred + err * q
        jd = jnp.where(valid, jc, W)  # out-of-bounds -> dropped
        recon = recon.at[ii, jd].set(rec, mode="drop")
        residual = residual.at[ii, jd].set(err, mode="drop")
        return recon, residual

    recon, residual = jax.lax.fori_loop(2, H + W - 1, body, (recon, residual))
    return residual, recon


def predict_from_neighbors(original, coefficients, quant_step: float = 1.0, return_recon: bool = False):
    """Wavefront closed-loop DPCM; facade over the jitted kernel.

    original: ``[H, W]`` or ``[H, W, C]``. Residual shape matches the
    reference squeeze behavior (predictive.py:88).
    """
    x = jnp.asarray(original, dtype=jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, :, None]
    residual, recon = _wavefront_dpcm(x, tuple(float(v) for v in coefficients), quant_step)
    if squeeze or x.shape[2] == 1:
        residual = residual[:, :, 0] if squeeze else residual.squeeze(-1)
        recon = recon[:, :, 0] if squeeze else recon.squeeze(-1)
    if return_recon:
        return residual, recon
    return residual


@partial(jax.jit, static_argnames=("coefficients",))
def _wavefront_dpcm_inverse(residual, first_row, first_col, coefficients, quant_step):
    """Decoder wavefront: rebuild the reconstruction from residuals."""
    a, b, c = (jnp.float32(v) for v in coefficients)
    r = jnp.asarray(residual, dtype=jnp.float32)
    H, W, C = r.shape
    q = jnp.float32(quant_step)

    recon = jnp.zeros_like(r)
    recon = recon.at[0, :, :].set(first_row)
    recon = recon.at[:, 0, :].set(first_col)

    ii = jnp.arange(1, H, dtype=jnp.int32)

    def body(d, recon):
        jj = d - ii
        valid = (jj >= 1) & (jj <= W - 1)
        jc = jnp.where(valid, jj, 1)
        left = recon[ii, jc - 1]
        top = recon[ii - 1, jc]
        top_left = recon[ii - 1, jc - 1]
        pred = a * left + b * top_left + c * top
        rec = pred + r[ii, jc] * q
        jd = jnp.where(valid, jc, W)
        return recon.at[ii, jd].set(rec, mode="drop")

    return jax.lax.fori_loop(2, H + W - 1, body, recon)


def reconstruct_from_residual(residual, first_row, first_col, coefficients, quant_step: float = 1.0):
    """Inverse closed-loop DPCM (decoder side of the ch2 codec)."""
    r = jnp.asarray(residual, dtype=jnp.float32)
    squeeze = r.ndim == 2
    if squeeze:
        r = r[:, :, None]
        first_row = jnp.asarray(first_row, jnp.float32).reshape(-1, 1)
        first_col = jnp.asarray(first_col, jnp.float32).reshape(-1, 1)
    out = _wavefront_dpcm_inverse(r, first_row, first_col, tuple(float(v) for v in coefficients), quant_step)
    return out[:, :, 0] if squeeze else out
