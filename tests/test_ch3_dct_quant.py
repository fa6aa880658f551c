"""ch3-style DCT + quantization tests (reference tests/ch3.py) + scipy parity."""

import numpy as np
import scipy.fft as sfft

from ivclab_tpu.ops.dct import dct2, dct2_fused, idct2, idct2_fused
from ivclab_tpu.ops.quant import PatchQuant, quant_table_zigzag
from ivclab_tpu.utils import Patcher, ZigZag
from ivclab_tpu.utils.metrics import calc_mse
from ivclab_tpu.utils.shape import zigzag_gather_indices


def test_dct_matches_scipy(rng):
    x = (rng.random((6, 7, 3, 8, 8)) * 255).astype(np.float32)
    ref = sfft.dct(sfft.dct(x, axis=-1, norm="ortho"), axis=-2, norm="ortho")
    ours = np.asarray(dct2(x))
    assert np.abs(ours - ref).max() < 2e-2


def test_idct_roundtrip_allclose(satpic1):
    patched = np.asarray(Patcher().patch(satpic1)).astype(np.float32)
    rec = np.asarray(idct2(dct2(patched)))
    assert np.allclose(rec, patched, atol=1e-2)


def test_fused_equals_separable(rng):
    x = (rng.random((50, 64)) * 255).astype(np.float32)
    sep = np.asarray(dct2(x.reshape(50, 8, 8))).reshape(50, 64)[:, zigzag_gather_indices(8)]
    fused = np.asarray(dct2_fused(x))
    assert np.abs(fused - sep).max() < 2e-2
    back = np.asarray(idct2_fused(fused))
    assert np.abs(back - x).max() < 2e-2


def test_dct_energy_golden(satpic1):
    patched = np.asarray(Patcher().patch(satpic1)).astype(np.float32)
    transformed = np.asarray(dct2(patched))
    energy = float(np.mean(transformed**2))
    # Parseval: energy preserved by the orthonormal transform
    assert abs(energy - float(np.mean(patched.astype(np.float64) ** 2))) / energy < 1e-5
    assert abs(energy - GOLDEN_DCT_ENERGY) < 100


def test_quantization_golden(satpic1):
    patched = Patcher().patch(satpic1)
    q = PatchQuant(quantization_scale=1.0)
    quantized = np.asarray(q.quantize(patched))
    assert quantized.dtype == np.int32
    assert abs(float(np.mean(quantized.astype(np.float64) ** 2)) - GOLDEN_QUANT_ENERGY) < 0.1


def test_quant_roundtrip_mse_golden(satpic1):
    patcher = Patcher()
    q = PatchQuant(quantization_scale=1.0)
    quantized = q.quantize(patcher.patch(satpic1))
    deq = q.dequantize(quantized)
    recon = np.asarray(patcher.unpatch(deq))
    mse = float(calc_mse(satpic1, recon))
    assert abs(mse - GOLDEN_QUANT_MSE) < 5


def test_quant_rounding_half_even():
    """np.round semantics (half to even) must hold on device."""
    q = PatchQuant(quantization_scale=1.0)
    coeffs = np.zeros((1, 1, 3, 8, 8), np.float32)
    coeffs[0, 0, 0, 0, 0] = 24.0  # 24/16 = 1.5 -> 2
    coeffs[0, 0, 0, 0, 1] = 5.5  # 5.5/11 = 0.5 -> 0
    out = np.asarray(q.quantize(coeffs))
    assert out[0, 0, 0, 0, 0] == 2
    assert out[0, 0, 0, 0, 1] == 0


def test_dequantize_truncates(satpic1):
    """Dequantization casts toward zero to int32 like the reference."""
    q = PatchQuant(quantization_scale=0.15)
    sym = np.full((1, 1, 3, 8, 8), 3, np.int32)
    out = np.asarray(q.dequantize(sym))
    table = q.get_quantization_table()
    assert np.array_equal(out[0, 0], (3 * table).astype(np.int32))


def test_zigzag_facade_roundtrip(rng):
    z = ZigZag()
    x = rng.integers(-50, 50, size=(4, 5, 3, 8, 8)).astype(np.int32)
    flat = z.flatten(x)
    assert flat.shape == (4, 5, 3, 64)
    back = np.asarray(z.unflatten(flat))
    assert np.array_equal(back, x)


def test_quant_table_zigzag_consistency():
    qt = quant_table_zigzag(1.0, 3)
    q = PatchQuant(1.0)
    tables = q.get_quantization_table().reshape(3, 64)
    assert np.array_equal(qt, tables[:, zigzag_gather_indices(8)])


# Golden values pinned from the deterministic synthetic fixtures.
GOLDEN_DCT_ENERGY = 17048.0
GOLDEN_QUANT_ENERGY = 14.3108
GOLDEN_QUANT_MSE = 552.8058
