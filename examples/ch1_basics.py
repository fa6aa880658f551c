"""Chapter-1-style basics: color, metrics, filtering, sampling, YUV 4:2:0.

Workload parity with the reference exercise drivers
(``exercises/ch1/ex1.py``–``exE.py``, ``ex_ict*.py``, ``ex_aliasing.py``):
grayscale conversion, PSNR of degraded pairs, the filter/decimate
pipelines, aliasing study via FFT spectra, and the ICT + chroma
subsampling codec comparison.

Run: python examples/ch1_basics.py [--plot out_dir]
"""

import argparse

import jax.numpy as jnp
import numpy as np

import ivclab_tpu as ivc
from ivclab_tpu.ops.resample import decimate, downsample, fft_resample, interpolation_upsample, upsample
from ivclab_tpu.utils import fixtures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", default=None, help="directory for output PNGs")
    args = ap.parse_args()

    lena = fixtures.image("lena")
    lena_rec = fixtures.degraded("lena")
    sail = fixtures.image("sail")

    # ex1: grayscale conversion
    gray = np.asarray(ivc.rgb2gray(lena))
    print(f"rgb2gray: shape={gray.shape} mean={gray.mean():.2f}")

    # ex2: PSNR of a precompressed pair
    print(f"MSE(lena, lena_rec)  = {float(ivc.calc_mse(lena, lena_rec)):.4f}")
    print(f"PSNR(lena, lena_rec) = {float(ivc.calc_psnr(lena, lena_rec)):.4f} dB")

    # ex3: filter pipeline (prefilter -> decimate -> resample -> postfilter)
    pipe = ivc.FilterPipeline()
    for prefilter in (True, False):
        out = pipe.filter_img(lena, prefilter=prefilter)
        print(f"filter pipeline prefilter={prefilter}: PSNR={float(ivc.calc_psnr(lena, out)):.2f} dB")

    # ex4: YUV 4:2:0 chroma subsampling codec
    for name, img in (("lena", lena), ("sail", sail)):
        rec = ivc.yuv420compression(img)
        print(f"yuv420 {name}: PSNR={float(ivc.calc_psnr(img, rec)):.2f} dB")

    # aliasing study: naive downsample vs anti-aliased decimate, spectra
    y = np.asarray(ivc.rgb2gray(lena))[:, :, 0]
    naive = np.asarray(downsample(y))
    aa = np.asarray(decimate(decimate(jnp.asarray(y), 2, axis=0), 2, axis=1))
    spec = lambda p: np.log1p(np.abs(np.fft.fftshift(np.fft.fft2(p))))
    e_naive = float(spec(naive)[: naive.shape[0] // 4].mean())
    e_aa = float(spec(aa)[: aa.shape[0] // 4].mean())
    print(f"aliasing: high-band spectral energy naive={e_naive:.3f} vs anti-aliased={e_aa:.3f}")

    # sampling: zero-insertion vs bilinear vs FFT upsampling of the decimated plane
    up0 = np.asarray(upsample(jnp.asarray(aa)))
    up1 = np.asarray(interpolation_upsample(jnp.asarray(aa)))
    up2 = np.asarray(fft_resample(fft_resample(jnp.asarray(aa), y.shape[0], axis=0), y.shape[1], axis=1))
    for name, up in (("zero-insert", up0), ("bilinear", up1), ("fft", up2)):
        print(f"upsample {name}: PSNR={float(ivc.calc_psnr(y, up)):.2f} dB")

    if args.plot:
        import pathlib

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        outdir = pathlib.Path(args.plot)
        outdir.mkdir(parents=True, exist_ok=True)
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        ivc.imshow(axes[0], lena, "original")
        ivc.imshow(axes[1], ivc.yuv420compression(lena), "yuv420")
        ivc.imshow(axes[2], pipe.filter_img(lena), "filter pipeline")
        fig.savefig(outdir / "ch1_basics.png", dpi=90)
        print(f"wrote {outdir/'ch1_basics.png'}")


if __name__ == "__main__":
    main()
