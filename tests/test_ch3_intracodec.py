"""Intra codec end-to-end tests: round trips, RD behavior, device decode parity."""

import numpy as np
import pytest

from ivclab_tpu.models import IntraCodec, IntraCodecAdaptive
from ivclab_tpu.utils import calc_psnr


def test_encode_decode_rgb(lena_small):
    codec = IntraCodec(quantization_scale=1.0)
    codec.train_huffman_from_image(lena_small)
    recon, bitstream, bitsize, bpp = codec.encode_decode(lena_small, return_bpp=True)
    assert recon.shape == lena_small.shape
    psnr = float(calc_psnr(lena_small, recon))
    assert psnr > 26.0
    assert 0.1 < bpp < 8.0
    assert bitsize == pytest.approx(bpp * lena_small.shape[0] * lena_small.shape[1])


def test_entropy_roundtrip_is_lossless(lena_small):
    """Full Huffman+zero-run decode must reproduce the direct reconstruction."""
    codec = IntraCodec(quantization_scale=0.5)
    codec.train_huffman_from_image(lena_small)
    direct, _, _ = codec.encode_decode(lena_small, verify_entropy=False)
    full, _, _ = codec.encode_decode(lena_small, verify_entropy=True)
    assert np.abs(direct.astype(np.float64) - full.astype(np.float64)).max() < 1e-3


def test_intra_encode_then_decode(lena_small):
    codec = IntraCodec(quantization_scale=0.3)
    codec.train_huffman_from_image(lena_small)
    bitstream, bpp = codec.intra_encode(lena_small, return_bpp=True)
    recon = codec.intra_decode(bitstream, lena_small.shape)
    ref, _, _ = codec.encode_decode(lena_small)
    assert np.abs(recon.astype(np.float64) - ref.astype(np.float64)).max() < 1e-3


def test_symbols_roundtrip(lena_small):
    codec = IntraCodec(quantization_scale=1.0)
    symbols = codec.image2symbols(lena_small)
    recon = codec.symbols2image(symbols, lena_small.shape)
    assert recon.shape == lena_small.shape
    assert float(calc_psnr(lena_small, recon)) > 26.0


def test_grayscale_plane(lena_small):
    y = lena_small.astype(np.float32).mean(axis=-1)
    codec = IntraCodec(quantization_scale=1.0)
    codec.train_huffman_from_image(y, is_source_rgb=False)
    recon, _, bits = codec.encode_decode(y, is_source_rgb=False)
    assert recon.shape == y.shape
    assert float(calc_psnr(y, recon)) > 28.0


def test_rd_monotonicity(lena_small, lena):
    """Finer quantization -> more bits, higher PSNR (the ch3 RD contract)."""
    bpps, psnrs = [], []
    for q in [2.0, 0.5, 0.15]:
        codec = IntraCodec(quantization_scale=q)
        codec.train_huffman_from_image(lena_small)
        recon, _, _, bpp = codec.encode_decode(lena, return_bpp=True)
        bpps.append(bpp)
        psnrs.append(float(calc_psnr(lena, recon)))
    assert bpps[0] < bpps[1] < bpps[2]
    assert psnrs[0] < psnrs[1] < psnrs[2]


def test_golden_rd_point(lena_small, lena):
    """Pinned RD point: train on lena_small, code lena at q=0.15
    (the canonical ch3 workload, exercises/ch3/ex1.py:21-51)."""
    codec = IntraCodec(quantization_scale=0.15)
    codec.train_huffman_from_image(lena_small)
    recon, _, _, bpp = codec.encode_decode(lena, return_bpp=True)
    psnr = float(calc_psnr(lena, recon))
    assert abs(psnr - GOLDEN_PSNR_Q015) < 0.3
    assert abs(bpp - GOLDEN_BPP_Q015) < 0.15


def test_non_multiple_of_8_shapes(rng):
    img = (rng.random((45, 61, 3)) * 255).astype(np.uint8)
    codec = IntraCodec(quantization_scale=0.5)
    codec.train_huffman_from_image(img)
    recon, _, _ = codec.encode_decode(img)
    assert recon.shape == img.shape
    assert float(calc_psnr(img, recon)) > 15.0


def test_adaptive_codec_roundtrip(lena_small):
    codec = IntraCodecAdaptive(quantization_scale=0.5)
    packed, bitsize = codec.intra_encode(lena_small)
    codebook_len, blob, bitstream, num_symbols = packed
    assert codebook_len == len(blob)

    fresh = IntraCodecAdaptive(quantization_scale=0.5)
    recon = fresh.intra_decode(packed, lena_small.shape)
    assert float(calc_psnr(lena_small, recon)) > 25.0


def test_device_parallel_decode_matches_serial(lena_small):
    codec = IntraCodec(quantization_scale=0.5)
    codec.train_huffman_from_image(lena_small)
    x, orig_shape = codec._prepare(lena_small, True)
    words, total_bits, block_offsets, valid_len, _ = codec._encode_device(x)
    recon_dev, ok = codec.decode_device(words, block_offsets, valid_len, orig_shape)
    assert bool(ok)
    serial_bits = np.asarray(words[: (int(total_bits) + 31) // 32])
    codec.num_symbols = int(np.asarray(valid_len).sum())
    recon_serial = codec.intra_decode(serial_bits, orig_shape)
    assert np.abs(recon_dev.astype(np.float64) - recon_serial.astype(np.float64)).max() < 1e-3


# Pinned from the deterministic synthetic fixtures.
GOLDEN_PSNR_Q015 = 38.93
GOLDEN_BPP_Q015 = 4.518
