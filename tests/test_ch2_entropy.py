"""ch2-style entropy statistics tests (reference tests/ch2.py) + numpy oracles."""

import numpy as np

from ivclab_tpu.entropy import (
    calc_entropy,
    min_code_length,
    smooth_pmf,
    stats_cond,
    stats_joint,
    stats_marg,
)
from ivclab_tpu.models import single_pixel_predictor, three_pixels_predictor


def _np_stats_marg(image, pixel_range):
    counts, _ = np.histogram(image.astype(np.float64).flatten(), bins=pixel_range)
    return counts / image.size


def test_stats_marg_matches_numpy(satpic1):
    ours = np.asarray(stats_marg(satpic1, np.arange(256)))
    ref = _np_stats_marg(satpic1, np.arange(256))
    assert np.abs(ours - ref).max() < 1e-7


def test_stats_marg_residual_range(sail):
    res = single_pixel_predictor(sail)
    ours = np.asarray(stats_marg(res, np.arange(-255, 255)))
    ref = _np_stats_marg(np.asarray(res), np.arange(-255, 255))
    assert np.abs(ours - ref).max() < 1e-7


def test_smooth_pmf():
    pmf = np.array([0.5, 0.5, 0.0])
    sm = np.asarray(smooth_pmf(pmf))
    assert sm.min() > 0
    assert abs(sm.sum() - 1.0) < 1e-6


def test_entropy_golden(satpic1):
    pmf = stats_marg(satpic1, np.arange(256))
    h = float(calc_entropy(pmf))
    assert abs(h - GOLDEN_ENTROPY) < 0.2


def test_cross_entropy_golden(satpic1, lena):
    target = stats_marg(satpic1, np.arange(256))
    common = stats_marg(lena, np.arange(256))
    cl = float(min_code_length(target, common))
    assert cl >= float(calc_entropy(target)) - 1e-3
    assert abs(cl - GOLDEN_CROSS) < 0.2


def test_joint_entropy_golden(satpic1):
    joint = stats_joint(satpic1, np.arange(256))
    hj = float(calc_entropy(joint))
    # joint entropy of pairs is between H and 2H
    hm = float(calc_entropy(stats_marg(satpic1, np.arange(256))))
    assert hm <= hj + 1e-2 <= 2 * hm + 0.5
    assert abs(hj - GOLDEN_JOINT) < 0.2


def test_joint_matches_histogram2d(satpic1):
    img = satpic1
    pairs = img[:, : img.shape[1] // 2 * 2].reshape(img.shape[0], -1, 2, 3)
    pairs = pairs.transpose(0, 1, 3, 2).reshape(-1, 2)
    hist_range = np.arange(257)
    ref, _, _ = np.histogram2d(pairs[:, 0], pairs[:, 1], bins=[hist_range, hist_range])
    ref = (ref / ref.sum()).flatten()
    ours = np.asarray(stats_joint(img, np.arange(256)))
    assert np.abs(ours - ref).max() < 1e-7


def test_cond_entropy_golden(satpic1):
    hc = float(stats_cond(satpic1, np.arange(256)))
    hm = float(calc_entropy(stats_marg(satpic1, np.arange(256))))
    assert 0 < hc <= hm + 0.05
    assert abs(hc - GOLDEN_COND) < 0.2


def test_single_pixel_predictor_entropy(sail):
    res = single_pixel_predictor(sail)
    assert res.shape == sail.shape
    h = float(calc_entropy(stats_marg(res, np.arange(-255, 255))))
    assert abs(h - GOLDEN_SINGLE_PRED) < 0.2


def test_three_pixels_predictor_entropy(sail):
    res_y, res_c = three_pixels_predictor(sail, subsample_color_channels=False)
    merged = np.concatenate([res_y.ravel(), res_c.ravel()])
    h = float(calc_entropy(stats_marg(merged, np.arange(-255, 255))))
    # residual entropy must beat the raw-pixel entropy by a wide margin
    hm = float(calc_entropy(stats_marg(sail, np.arange(256))))
    assert h < hm
    assert abs(h - GOLDEN_THREE_PRED) < 0.2


def test_three_pixels_predictor_subsampled_shapes(sail):
    res_y, res_c = three_pixels_predictor(sail, subsample_color_channels=True)
    H, W = sail.shape[:2]
    assert res_y.shape == (H, W)
    assert res_c.shape == (H // 2, W // 2, 2)


def test_wavefront_matches_sequential_oracle(rng):
    """The anti-diagonal wavefront must equal the textbook raster-order DPCM."""
    from ivclab_tpu.ops.predictive import predict_from_neighbors

    x = (rng.random((12, 9, 2)) * 255).astype(np.float64)
    coeffs = (7 / 8, -4 / 8, 5 / 8)

    recon = np.zeros_like(x)
    recon[0, :, :] = x[0, :, :]
    recon[:, 0, :] = x[:, 0, :]
    resid = np.zeros_like(x)
    H, W, C = x.shape
    for i in range(1, H):
        for j in range(1, W):
            for c in range(C):
                pred = (
                    coeffs[0] * recon[i, j - 1, c]
                    + coeffs[1] * recon[i - 1, j - 1, c]
                    + coeffs[2] * recon[i - 1, j, c]
                )
                err = np.round(x[i, j, c] - pred)
                resid[i, j, c] = err
                recon[i, j, c] = pred + err

    ours = np.asarray(predict_from_neighbors(x, coeffs))
    assert np.abs(ours - resid).max() < 1e-3


# Golden values pinned from the deterministic synthetic fixtures.
GOLDEN_ENTROPY = 7.3263
GOLDEN_CROSS = 7.4665
GOLDEN_JOINT = 12.9829
GOLDEN_COND = 5.6948
GOLDEN_SINGLE_PRED = 5.7509
GOLDEN_THREE_PRED = 3.38
