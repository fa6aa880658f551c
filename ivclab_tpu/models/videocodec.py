"""Hybrid I/P video codec: motion-compensated prediction + intra residuals.

Reference parity: ``ivclab/video/videocodec.py:12-104`` plus the three ch4
exercise variants, collapsed into one codec with a ``codebook_policy``
(SURVEY.md §7 step 7):

- ``"per-frame"``   — retrain the residual codebook every frame (library
  VideoCodec behavior, videocodec.py:72; codebook transmission not counted,
  as in the reference).
- ``"adaptive"``    — per-frame retrain AND the serialized codebook bits
  are charged to the stream (AdaptiveVideoCodec, exercises/ch4/E4-1.py).
- ``"first-p-frame"`` — train once on the first P-frame and reuse;
  out-of-alphabet symbols clamp to the nearest trained symbol
  (SimpleVideoCodec, exercises/ch4/ex1.py:163-176).

Deviations by design:
- The reference's ``motion_huffman`` is built with
  ``lower_bound = -((2sr+1)^2 - 1)//2`` but fed 0-based packed indices
  (videocodec.py:30,62) — any index > 40 raises. Here MV symbols are
  0-based over the (2sr+1)^2 alphabet.
- Grayscale planes quantize with the luminance table only (see
  ivclab_tpu/models/intracodec.py notes).

Frame recursion runs against the *decoder* reconstruction
(videocodec.py:51-52,75), so encoder and decoder stay in lockstep.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ivclab_tpu.entropy.huffman import HuffmanCoder
from ivclab_tpu.models.intracodec import IntraCodec, IntraCodecAdaptive
from ivclab_tpu.ops.color import rgb2ycbcr, ycbcr2rgb
from ivclab_tpu.ops.motion import motion_compensate, motion_search

CODEBOOK_POLICIES = ("per-frame", "adaptive", "first-p-frame")


class VideoCodec:
    def __init__(
        self,
        quantization_scale: float = 1.0,
        bounds=None,
        end_of_block: int = 4000,
        block_shape=(8, 8),
        search_range: int = 4,
        codebook_policy: str = "per-frame",
    ):
        if codebook_policy not in CODEBOOK_POLICIES:
            raise ValueError(f"codebook_policy must be one of {CODEBOOK_POLICIES}")
        self.quantization_scale = float(quantization_scale)
        self.bounds = bounds
        self.end_of_block = int(end_of_block)
        self.block_shape = tuple(block_shape)
        self.search_range = int(search_range)
        self.codebook_policy = codebook_policy

        codec_cls = IntraCodecAdaptive if codebook_policy == "adaptive" else IntraCodec
        self.intra_codec = codec_cls(
            quantization_scale=quantization_scale,
            bounds=bounds,
            end_of_block=end_of_block,
            block_shape=block_shape,
        )
        self.residual_codec = codec_cls(
            quantization_scale=quantization_scale,
            bounds=bounds,
            end_of_block=end_of_block,
            block_shape=block_shape,
        )

        self.motion_huffman = HuffmanCoder(lower_bound=0)
        self._motion_trained = False
        self.decoder_recon = None

    # ------------------------------------------------------------------

    def _code_motion(self, mv_grid: np.ndarray):
        """Huffman-code the packed motion field; returns (words, bits, decoded)."""
        num_symbols = (2 * self.search_range + 1) ** 2
        if not self._motion_trained:
            uniform = np.full(num_symbols, 1.0 / num_symbols)
            self.motion_huffman.train(uniform)
            self._motion_trained = True
        flat = mv_grid.reshape(-1)
        words, bits = self.motion_huffman.encode(flat)
        decoded = self.motion_huffman.decode(words, flat.size).reshape(mv_grid.shape)
        return words, bits, decoded.astype(np.int32)

    def _code_residual_plane(self, plane):
        """Train-per-policy + encode/decode one plane; returns (recon, bits)."""
        codec = self.residual_codec
        policy = self.codebook_policy
        codebook_bits = 0
        if policy == "adaptive":
            packed, bitsize = codec.intra_encode(np.asarray(plane), is_source_rgb=False)
            codebook_len, _, _, n_syms = packed
            codebook_bits = 8 * (codebook_len + 12)  # blob + (len,num_symbols) header
            recon = codec.intra_decode(packed, np.asarray(plane).shape)
            return recon, int(bitsize) + codebook_bits
        if policy == "per-frame" or codec.huffman is None:
            codec.train_huffman_from_image(plane, is_source_rgb=False)
        # first-p-frame reuses the codebook; the pack stage clamps
        # out-of-alphabet symbols to the alphabet edge (nearest trained value)
        verify = policy == "first-p-frame"
        recon, _, bitsize = codec.encode_decode(
            plane, is_source_rgb=False, verify_entropy=verify
        )
        return recon, int(bitsize)

    # ------------------------------------------------------------------

    def encode_decode(self, frame, frame_num: int = 0, is_source_rgb: bool = False):
        """Encode+decode one frame; returns (recon_rgb u8, bitstream, bitsize).

        Frame 0 is an I-frame; later frames are P-frames predicted from the
        decoder reconstruction of the previous frame. Only luma is coded;
        chroma passes through (reference videocodec.py:77-80).
        """
        frame_ycbcr = np.asarray(rgb2ycbcr(np.asarray(frame, dtype=np.float32)))
        y_channel = frame_ycbcr[..., 0]

        if frame_num == 0:
            if self.codebook_policy != "adaptive":
                self.intra_codec.train_huffman_from_image(y_channel, is_source_rgb=False)
                recon_y, bitstream, residual_bits = self.intra_codec.encode_decode(
                    y_channel, is_source_rgb=False
                )
            else:
                bitstream, residual_bits = self.intra_codec.intra_encode(
                    y_channel, is_source_rgb=False
                )
                recon_y = self.intra_codec.intra_decode(bitstream, y_channel.shape)
            motion_bits = 0
            self.decoder_recon = np.asarray(recon_y)
        else:
            ref_y = self.decoder_recon
            mv = np.asarray(motion_search(ref_y, y_channel, self.search_range))
            bitstream, motion_bits, mv_decoded = self._code_motion(mv)
            prediction = np.asarray(
                motion_compensate(ref_y, jnp.asarray(mv_decoded), self.search_range)
            )
            residual = y_channel - prediction
            recon_residual, residual_bits = self._code_residual_plane(residual)
            recon_y = prediction + np.asarray(recon_residual)
            self.decoder_recon = recon_y

        recon_ycbcr = frame_ycbcr.copy()
        recon_ycbcr[..., 0] = np.clip(recon_y, 0, 255)
        recon_rgb = np.asarray(ycbcr2rgb(recon_ycbcr)).astype(np.uint8)
        return recon_rgb, bitstream, int(residual_bits) + int(motion_bits)

    def encode_decode_sequence_checkpointed(self, frames, gop_size: int, checkpointer):
        """GOP-granular fault-tolerant encode (SURVEY.md §5 'Failure
        detection'): completed GOPs are loaded from the checkpointer, the
        rest are encoded and persisted atomically. A crashed run resumes
        re-encoding only its unfinished GOPs.
        """
        frames = np.asarray(frames)
        T = frames.shape[0]
        n_gops = -(-T // gop_size)
        recons = np.zeros_like(frames)
        bits = np.zeros(T, dtype=np.int64)
        for g in range(n_gops):
            lo, hi = g * gop_size, min((g + 1) * gop_size, T)
            cached = checkpointer.load_gop(g)
            if cached is not None:
                # GOPs open with an I-frame, so no cross-GOP state is
                # needed: restore outputs and skip the compute entirely
                _, gop_recons, gop_bits = cached
                recons[lo:hi] = gop_recons
                bits[lo:hi] = gop_bits
                continue
            gop_recons, gop_bits = [], []
            for t in range(lo, hi):
                recon, _, b = self.encode_decode(frames[t], frame_num=t - lo)
                gop_recons.append(recon)
                gop_bits.append(b)
            recons[lo:hi] = np.stack(gop_recons)
            bits[lo:hi] = gop_bits
            checkpointer.save_gop(
                g, b"", np.stack(gop_recons), np.asarray(gop_bits, dtype=np.int64)
            )
        return recons, bits

    def encode_decode_sequence(self, frames, gop_size: int | None = None):
        """Encode a whole sequence; returns (recons, bits_per_frame).

        ``gop_size`` restarts an I-frame every N frames (the GOP structure
        multi-host sharding keys on, SURVEY.md §5 'long-context' row).
        """
        recons, bits = [], []
        for t, frame in enumerate(np.asarray(frames)):
            local_t = t if gop_size is None else t % gop_size
            recon, _, bitsize = self.encode_decode(frame, frame_num=local_t)
            recons.append(recon)
            bits.append(bitsize)
        return np.stack(recons), np.asarray(bits)
