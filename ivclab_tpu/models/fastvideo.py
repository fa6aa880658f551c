"""Fused single-chip GOP codec: the throughput path.

The facade ``VideoCodec`` mirrors the reference API frame by frame, paying
host round trips per frame. This module is the production path: one jitted
program per GOP for each phase, everything resident on device.

  encode:  lax.scan over frames — halo-free single-chip ME (dense candidate
           scan), MC, fused DCT+quant, zero-run — emitting per-frame
           quantized symbol buffers, motion fields, reconstructions and
           exact coded bit counts;
  pack:    per-frame Huffman prefix-sum packing of residual + MV streams
           into u32 words with per-block offsets (the container sidecar);
  decode:  per-frame parallel canonical decode + zero-run decode + fused
           IDCT, then a scan rebuilds the recon chain through MC.

Codebooks are fixed per sequence (the first-p-frame policy of
exercises/ch4/ex1.py), which keeps the GOP recursion free of host syncs;
per-frame adaptive codebooks remain available through ``VideoCodec``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ivclab_tpu.entropy.codebook import CanonicalCode, build_canonical_code
from ivclab_tpu.entropy.stats import smooth_pmf
from ivclab_tpu.models.intracodec import IntraCodec, bucket_bounds
from ivclab_tpu.ops.bitpack import decode_blocks_device, decode_tables
from ivclab_tpu.ops.dct import dct2_fused, idct2_fused
from ivclab_tpu.ops.motion import motion_compensate, motion_search, motion_search_auto
from ivclab_tpu.ops.quant import quant_table_zigzag
from ivclab_tpu.ops.transform import pack_symbols_grouped
from ivclab_tpu.ops.zerorun import (
    BLOCK_CAP,
    zerorun_decode_blocks,
    zerorun_encode_blocks,
)

EOB = 4000


def _plane_to_blocks(y):
    H, W = y.shape
    return y.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)


def _blocks_to_plane(blocks, H, W):
    return blocks.reshape(H // 8, W // 8, 8, 8).transpose(0, 2, 1, 3).reshape(H, W)


class FusedVideoCodec:
    """Fixed-codebook hybrid codec with fully device-resident GOP phases."""

    def __init__(self, quantization_scale: float = 1.0, search_range: int = 4):
        self.q = float(quantization_scale)
        self.sr = int(search_range)
        qt = quant_table_zigzag(self.q, 1)[0]
        self.qt = jnp.asarray(qt)
        self.inv_qt = jnp.asarray((1.0 / qt).astype(np.float32))
        self.residual_code: CanonicalCode | None = None
        self.mv_code: CanonicalCode | None = None

    # ------------------------------------------------------------ training

    def train(self, frames_y: np.ndarray):
        """Fit residual + MV codebooks from a few frames (host, once)."""
        frames_y = np.asarray(frames_y, dtype=np.float32)
        probe = IntraCodec(quantization_scale=self.q)
        # I-frame stats from frame 0; P-residual stats from frame 1 if present
        planes = [frames_y[0]]
        if frames_y.shape[0] > 1:
            mv = motion_search(frames_y[0], frames_y[1], self.sr)
            pred = np.asarray(motion_compensate(frames_y[0], mv, self.sr))
            planes.append(frames_y[1] - pred)
        from ivclab_tpu.ops.transform import forward_symbolize, symbol_histogram
        from ivclab_tpu.models.intracodec import _sym_min_max

        bufs = []
        for p in planes:
            buf, valid, _ = forward_symbolize(p[:, :, None], self.inv_qt[None], EOB)
            bufs.append((buf, valid))
        mn = min(int(_sym_min_max(b, v)[0]) for b, v in bufs)
        mx = max(int(_sym_min_max(b, v)[1]) for b, v in bufs)
        lo, hi = bucket_bounds(mn, mx)
        hist = sum(np.asarray(symbol_histogram(b, v, lo, hi)) for b, v in bufs)
        pmf = np.asarray(smooth_pmf(hist / hist.sum()), dtype=np.float64)
        self.residual_code = build_canonical_code(pmf, lower_bound=lo)

        n_mv = (2 * self.sr + 1) ** 2
        self.mv_code = build_canonical_code(np.full(n_mv, 1.0 / n_mv), lower_bound=0)
        del probe
        return self

    # ------------------------------------------------------------ phases

    @partial(jax.jit, static_argnames=("self",))
    def encode_gop(self, frames_y):
        """[T, H, W] float32 -> per-frame symbols/motion/recon/bits."""
        mv_lens = jnp.asarray(self.mv_code.lengths)
        T, H, W = frames_y.shape

        def symbolize(plane):
            coeffs = dct2_fused(_plane_to_blocks(plane))
            qsym = jnp.round(coeffs * self.inv_qt[None, :]).astype(jnp.int32)
            deq = (qsym.astype(jnp.float32) * self.qt[None, :]).astype(jnp.int32)
            recon = _blocks_to_plane(idct2_fused(deq.astype(jnp.float32)), H, W)
            return qsym, recon

        def frame_step(recon_prev, inputs):
            t, y = inputs

            def intra():
                qsym, recon = symbolize(y)
                mv = jnp.full((H // 8, W // 8), (self.sr * (2 * self.sr + 1)) + self.sr, jnp.int32)
                return qsym, mv, jnp.int32(0), recon

            def inter():
                mv = motion_search_auto(recon_prev, y, self.sr)
                pred = motion_compensate(recon_prev, mv, self.sr)
                qsym, rrec = symbolize(y - pred)
                mv_bits = jnp.sum(mv_lens[jnp.clip(mv, 0, mv_lens.shape[0] - 1)])
                return qsym, mv, mv_bits, pred + rrec

            qsym, mv, bits, recon = jax.lax.cond(t == 0, intra, inter)
            return recon, (qsym, mv, bits, recon)

        ts = jnp.arange(T, dtype=jnp.int32)
        _, (qsyms, mvs, mv_bits, recons) = jax.lax.scan(
            frame_step, jnp.zeros((H, W), jnp.float32), (ts, frames_y)
        )
        return qsyms, mvs, mv_bits, recons

    @partial(jax.jit, static_argnames=("self",))
    def pack_gop(self, qsyms):
        """Per-frame Huffman packing of the residual symbol buffers.

        Grouped two-level pack (word-aligned 16-block substreams, see
        ``ops.transform.pack_symbols_grouped``). qsyms: [T, N, 64] ->
        (group_words [T, G, GW] u32, total_bits [T],
         block_offsets [T, N], block_counts [T, N]).
        """
        code = self.residual_code
        enc_codes = jnp.asarray(code.codes)
        enc_lens = jnp.asarray(code.lengths)

        def one(qsym):
            buf, valid = zerorun_encode_blocks(qsym, 64, EOB)
            group_words, _, offsets, total = pack_symbols_grouped(
                buf, valid, enc_codes, enc_lens, code.lower_bound
            )
            return group_words, total, offsets, valid

        return jax.vmap(one)(qsyms)

    @partial(jax.jit, static_argnames=("self", "H", "W"))
    def decode_gop(self, words, block_offsets, block_counts, mvs, H: int, W: int):
        """Entropy decode + reconstruct the GOP from the packed streams."""
        code = self.residual_code
        tables = decode_tables(code)
        N = block_offsets.shape[1]

        def entropy_one(w, off, cnt):
            sym_idx = decode_blocks_device(w.reshape(-1), off, cnt, tables, BLOCK_CAP)
            syms = jnp.where(
                jnp.arange(BLOCK_CAP)[None, :] < cnt[:, None],
                sym_idx + code.lower_bound,
                0,
            )
            blocks, ok = zerorun_decode_blocks(syms, cnt, 64, EOB)
            deq = (blocks.astype(jnp.float32) * self.qt[None, :]).astype(jnp.int32)
            plane = _blocks_to_plane(idct2_fused(deq.astype(jnp.float32)), H, W)
            return plane, ok

        planes, oks = jax.vmap(entropy_one)(words, block_offsets, block_counts)

        def rebuild(recon_prev, inputs):
            t, residual, mv = inputs
            pred = jnp.where(
                t == 0,
                jnp.zeros_like(recon_prev),
                motion_compensate(recon_prev, mv, self.sr),
            )
            recon = pred + residual
            return recon, recon

        T = planes.shape[0]
        ts = jnp.arange(T, dtype=jnp.int32)
        _, recons = jax.lax.scan(rebuild, jnp.zeros((H, W), jnp.float32), (ts, planes, mvs))
        return recons, jnp.all(oks)

    # ------------------------------------------------------------ one-call

    def encode_decode_gop(self, frames_y):
        """Full encode -> pack -> decode round trip; host-friendly wrapper.

        Returns (recons, bits_per_frame, ok).
        """
        frames_y = jnp.asarray(frames_y, dtype=jnp.float32)
        qsyms, mvs, mv_bits, enc_recons = self.encode_gop(frames_y)
        words, totals, offsets, counts = self.pack_gop(qsyms)
        bits = totals + mv_bits
        T, H, W = frames_y.shape
        recons, ok = self.decode_gop(words, offsets, counts, mvs, H, W)
        return recons, bits, ok, enc_recons
