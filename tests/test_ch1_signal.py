"""Signal-processing parity tests vs the scipy oracles the reference uses."""

import numpy as np
import pytest
import scipy.signal as ssig
from scipy.ndimage import zoom

from ivclab_tpu.ops.resample import (
    FilterPipeline,
    decimate,
    downsample,
    fft_resample,
    interpolation_upsample,
    lowpass_filter,
    upsample,
)
from ivclab_tpu.models.yuv420 import yuv420compression
from ivclab_tpu.utils import calc_psnr


def test_downsample_upsample(rng):
    x = rng.random((16, 20, 3)).astype(np.float32)
    d = np.asarray(downsample(x))
    assert d.shape == (8, 10, 3)
    assert np.array_equal(d, x[::2, ::2])
    u = np.asarray(upsample(d))
    assert u.shape == (16, 20, 3)
    assert np.array_equal(u[::2, ::2], d)
    assert u[1::2].sum() == 0


def test_interpolation_upsample_matches_zoom(rng):
    x = rng.random((12, 14)).astype(np.float32)
    ours = np.asarray(interpolation_upsample(x, 2))
    ref = zoom(x, 2, order=1)
    assert ours.shape == ref.shape
    # interior agreement (edge extrapolation conventions differ slightly)
    assert np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2]).max() < 0.08


def test_lowpass_filter_matches_convolve2d(rng):
    x = rng.random((24, 30)).astype(np.float64) * 255
    kernel = np.array([[1.0, 2, 1], [2, 4, 2], [1, 2, 1]])
    ref = ssig.convolve2d(x, kernel / kernel.sum(), mode="same", boundary="symm")
    ours = np.asarray(lowpass_filter(x, kernel))
    assert np.abs(ours - ref).max() < 1e-2


def test_decimate_matches_scipy(rng):
    x = (rng.random((64, 80)) * 255).astype(np.float64)
    for axis in (0, 1):
        ref = ssig.decimate(x, 2, axis=axis, ftype="fir", zero_phase=True)
        ours = np.asarray(decimate(x, 2, axis=axis))
        assert ours.shape == ref.shape
        assert np.abs(ours - ref).max() < 1e-3


def test_fft_resample_matches_scipy(rng):
    for n, num in [(40, 80), (80, 40), (31, 62), (62, 31)]:
        x = rng.random((n, 8)).astype(np.float64)
        ref = ssig.resample(x, num, axis=0)
        ours = np.asarray(fft_resample(x, num, axis=0))
        assert np.abs(ours - ref).max() < 1e-4, (n, num)


def test_filter_pipeline_runs(lena):
    pipe = FilterPipeline()
    out = np.asarray(pipe.filter_img(lena[:64, :64]))
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.uint8
    # lowpassed output should still be a decent reconstruction
    assert float(calc_psnr(lena[:64, :64], out)) > 20.0


def test_yuv420_psnr(lena):
    rec = yuv420compression(lena)
    assert rec.shape == lena.shape and rec.dtype == np.uint8
    psnr = float(calc_psnr(lena, rec))
    # chroma-only degradation: high PSNR expected
    assert psnr > 30.0


@pytest.mark.parametrize("shape", [(16, 16), (16, 16, 3)])
def test_pipeline_shapes(rng, shape):
    x = (rng.random(shape) * 255).astype(np.float32)
    out = np.asarray(FilterPipeline().filter_img(x))
    assert out.shape == shape
