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

All jitted phases are module-level functions taking the codebook/quant
tables as *traced* array arguments: retraining a codec or sweeping
quantization scales never bakes stale constants into a cached program and
never retraces (shapes being equal, one compile serves every q / codebook).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ivclab_tpu.entropy.codebook import CanonicalCode, build_canonical_code, decode_lut16
from ivclab_tpu.entropy.stats import smooth_pmf
from ivclab_tpu.models.intracodec import bucket_bounds
from ivclab_tpu.ops.bitpack import decode_blocks_lut
from ivclab_tpu.ops.dct import dct2_fused, idct2_fused
from ivclab_tpu.ops.motion import motion_compensate, motion_search, motion_search_auto
from ivclab_tpu.ops.quant import quant_table_zigzag
from ivclab_tpu.ops.transform import (
    FAST_MAX_LEN,
    block_words_for_cap,
    cap_from_group_words,
    pack_symbols_grouped_cap,
)
from ivclab_tpu.ops.zerorun import (
    zerorun_counts,
    zerorun_decode_blocks_dense,
    zerorun_encode_blocks_dense,
)

EOB = 4000

# Static symbol-capacity buckets: each bucket is a separately compiled
# pack/decode program; the per-GOP max symbol count (zerorun_counts) picks
# the smallest adequate bucket. 128 covers the 97-symbol worst case.
CAP_BUCKETS = (32, 64, 128)


def _plane_to_blocks(y):
    H, W = y.shape
    return y.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)


def _blocks_to_plane(blocks, H, W):
    return blocks.reshape(H // 8, W // 8, 8, 8).transpose(0, 2, 1, 3).reshape(H, W)


# --------------------------------------------------------------- jitted phases
#
# Module-level so the compile cache is keyed on shapes + static ints only;
# tables/codebooks flow through as traced operands.


@partial(jax.jit, static_argnames=("sr",))
def _encode_gop(frames_y, qt, inv_qt, mv_lens, sr: int):
    """[T, H, W] float32 -> per-frame (qsyms, mvs, mv_bits, recons)."""
    T, H, W = frames_y.shape

    def symbolize(plane):
        coeffs = dct2_fused(_plane_to_blocks(plane))
        qsym = jnp.round(coeffs * inv_qt[None, :]).astype(jnp.int32)
        deq = (qsym.astype(jnp.float32) * qt[None, :]).astype(jnp.int32)
        recon = _blocks_to_plane(idct2_fused(deq.astype(jnp.float32)), H, W)
        return qsym, recon

    def frame_step(recon_prev, inputs):
        t, y = inputs

        def intra():
            qsym, recon = symbolize(y)
            mv = jnp.full((H // 8, W // 8), (sr * (2 * sr + 1)) + sr, jnp.int32)
            return qsym, mv, jnp.int32(0), recon

        def inter():
            mv = motion_search_auto(recon_prev, y, sr)
            pred = motion_compensate(recon_prev, mv, sr)
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


@jax.jit
def _gop_counts_max(qsyms):
    """Max zero-run symbol count over a GOP (the bucket-picking pre-pass).

    Module-level jit: building this inside ``pack_gop`` retraced on every
    call (measured 1,256 ms/call fresh vs 57 ms cached on v5e).
    """
    return jnp.max(jax.vmap(zerorun_counts)(qsyms.reshape(qsyms.shape[0], -1, 64)))


@partial(jax.jit, static_argnames=("cap",))
def _pack_gop_cap(qsyms, enc_fused, lower_bound, cap: int):
    """Pack a GOP's residual symbols: one flat pass over all T*N blocks.

    Frames are folded into the block axis instead of vmapped: N is a
    multiple of PACK_GROUP, so frames occupy whole word-aligned groups and
    the flat stream reshapes exactly into per-frame [G, GW] streams.
    (vmap-of-while-loop over the frame axis miscompiled on TPU — the
    batched pack emitted streams whose total bit counts differed from the
    per-frame pack; the flat form is also one bigger, better-tiled program.)
    """
    T, N, _ = qsyms.shape
    buf, valid = zerorun_encode_blocks_dense(qsyms.reshape(T * N, 64), 64, EOB, cap)
    group_words, group_bits, offsets, _ = pack_symbols_grouped_cap(
        buf - lower_bound, valid, enc_fused, cap
    )
    G = group_words.shape[0] // T
    GW = group_words.shape[1]
    words = group_words.reshape(T, G, GW)
    # per-frame bit offsets (the container sidecar is frame-relative)
    frame_base = (jnp.arange(T, dtype=jnp.int32) * (G * GW * 32))[:, None]
    offs = offsets.reshape(T, N) - frame_base
    totals = jnp.sum(group_bits.reshape(T, G), axis=1)
    return words, totals, offs, valid.reshape(T, N)


@partial(jax.jit, static_argnames=("H", "W", "cap", "sr"))
def _decode_gop_cap(words, block_offsets, block_counts, mvs, dec_lut, qt,
                    lower_bound, H: int, W: int, cap: int, sr: int):
    """Entropy decode + reconstruct: one flat block-parallel pass, no vmap
    (see :func:`_pack_gop_cap` for why the frame axis is folded in)."""
    lw = block_words_for_cap(cap)
    T, G, GW = words.shape
    N = block_counts.shape[1]

    frame_base = (jnp.arange(T, dtype=jnp.int32) * (G * GW * 32))[:, None]
    offs = (block_offsets + frame_base).reshape(-1)
    cnts = block_counts.reshape(-1)
    sym_idx = decode_blocks_lut(words.reshape(-1), offs, cnts, dec_lut, cap, lw)
    syms = jnp.where(
        jnp.arange(cap)[None, :] < cnts[:, None],
        sym_idx + lower_bound,
        0,
    )
    blocks, ok = zerorun_decode_blocks_dense(syms, cnts, 64, EOB)
    deq = (blocks.astype(jnp.float32) * qt[None, :]).astype(jnp.int32)
    pix = idct2_fused(deq.astype(jnp.float32))
    planes = (
        pix.reshape(T, H // 8, W // 8, 8, 8).transpose(0, 1, 3, 2, 4).reshape(T, H, W)
    )
    oks = ok

    def rebuild(recon_prev, inputs):
        t, residual, mv = inputs
        pred = jnp.where(
            t == 0,
            jnp.zeros_like(recon_prev),
            motion_compensate(recon_prev, mv, sr),
        )
        recon = pred + residual
        return recon, recon

    T = planes.shape[0]
    ts = jnp.arange(T, dtype=jnp.int32)
    _, recons = jax.lax.scan(rebuild, jnp.zeros((H, W), jnp.float32), (ts, planes, mvs))
    return recons, jnp.all(oks)


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
        self.set_residual_code(
            build_canonical_code(pmf, lower_bound=lo, max_len=FAST_MAX_LEN)
        )
        n_mv = (2 * self.sr + 1) ** 2
        self.mv_code = build_canonical_code(
            np.full(n_mv, 1.0 / n_mv), lower_bound=0, max_len=FAST_MAX_LEN
        )
        return self

    def set_residual_code(self, code: CanonicalCode):
        """Install a residual codebook (16-bit length-limited) + device tables.

        The 16-bit length limit costs negligible rate on smoothed pmfs, and
        it enables the flat-LUT decoder + halves worst-case buffer widths.
        """
        if code.max_len > FAST_MAX_LEN:
            raise ValueError(f"fused path needs code lengths <= {FAST_MAX_LEN}")
        self.residual_code = code
        self._dec_lut = jnp.asarray(decode_lut16(code))
        self._enc_fused = jnp.asarray(
            (code.codes.astype(np.uint32) << 6) | code.lengths.astype(np.uint32)
        )
        return self

    # ------------------------------------------------------------ phases

    def encode_gop(self, frames_y):
        """[T, H, W] float32 -> per-frame symbols/motion/recon/bits."""
        mv_lens = jnp.asarray(self.mv_code.lengths)
        return _encode_gop(frames_y, self.qt, self.inv_qt, mv_lens, self.sr)

    def pack_gop(self, qsyms):
        """Per-frame Huffman packing of the residual symbol buffers.

        Host dispatcher: a cheap counts-only pre-pass picks the smallest
        symbol-capacity bucket covering the GOP, then the cap-specialized
        jitted program runs (dense zero-run encode + fused-table grouped
        pack). qsyms: [T, N, 64] -> (group_words [T, G, GW] u32,
        total_bits [T], block_offsets [T, N], block_counts [T, N]).
        The decoder recovers the bucket from GW — no side channel.
        """
        counts_max = int(_gop_counts_max(qsyms))
        cap = next(c for c in CAP_BUCKETS if c >= counts_max)
        lo = jnp.int32(self.residual_code.lower_bound)
        return _pack_gop_cap(qsyms, self._enc_fused, lo, cap)

    def decode_gop(self, words, block_offsets, block_counts, mvs, H: int, W: int):
        """Entropy decode + reconstruct the GOP from the packed streams."""
        cap = cap_from_group_words(words.shape[-1])
        lo = jnp.int32(self.residual_code.lower_bound)
        return _decode_gop_cap(
            words, block_offsets, block_counts, mvs,
            self._dec_lut, self.qt, lo, H, W, cap, self.sr,
        )

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
