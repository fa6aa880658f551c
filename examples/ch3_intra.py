"""Chapter-3-style intra codec studies: manual pipeline, coefficient
dropping, and the canonical image RD sweep.

Workload parity with ``exercises/ch3`` (``E3-1.py``, ``K3-1.py``,
``ex1.py:21-51``: train Huffman on lena_small, code lena over
q in {0.05, 0.1, 0.15, 0.2, 0.3}).

Run: python examples/ch3_intra.py [--plot out_dir]
"""

import argparse

import jax.numpy as jnp
import numpy as np

import ivclab_tpu as ivc
from ivclab_tpu.config import SweepConfig
from ivclab_tpu.ops.dct import dct2, idct2
from ivclab_tpu.utils import Patcher, fixtures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()

    lena = fixtures.image("lena")
    lena_small = fixtures.image("lena_small")

    # E3-1: manual pipeline walk with symbol statistics
    codec = ivc.IntraCodec(quantization_scale=1.0)
    symbols = codec.image2symbols(lena_small)
    uniq = np.unique(symbols)
    print(f"manual pipeline: {symbols.size} symbols, {uniq.size} unique, "
          f"range [{symbols.min()}, {symbols.max()}]")
    recon = codec.symbols2image(symbols, lena_small.shape)
    print(f"  round trip PSNR = {float(ivc.calc_psnr(lena_small, recon)):.2f} dB")

    # K3-1: full-image DCT coefficient-dropping study (K3-1.py:17-39) —
    # zero the top-|magnitude| 1/5/10% of whole-image DCT coefficients and
    # measure the PSNR collapse (the energy-compaction ablation)
    gray = jnp.asarray(ivc.rgb2gray(lena))[:, :, 0].astype(jnp.float32)
    full_coeffs = dct2(gray)
    order = jnp.argsort(-jnp.abs(full_coeffs).reshape(-1))
    for perc in (0.01, 0.05, 0.10):
        n_drop = int(perc * full_coeffs.size)
        dropped = full_coeffs.reshape(-1).at[order[:n_drop]].set(0.0)
        rec = jnp.clip(idct2(dropped.reshape(full_coeffs.shape)), 0, 255)
        psnr = float(ivc.calc_psnr(gray, rec))
        print(f"drop top {int(perc * 100):2d}% |DCT| coefficients: PSNR = {psnr:.2f} dB")

    # zig-zag retention variant: keep only the first k scan coefficients
    patcher = Patcher()
    patched = jnp.asarray(patcher.patch(lena_small), dtype=jnp.float32)
    coeffs = dct2(patched)
    zz = ivc.ZigZag()
    flat = zz.flatten(coeffs)
    for keep in (1, 4, 16, 32, 64):
        mask = jnp.arange(64) < keep
        rec = patcher.unpatch(idct2(zz.unflatten(flat * mask)))
        psnr = float(ivc.calc_psnr(lena_small, jnp.clip(rec, 0, 255)))
        print(f"keep {keep:2d}/64 coefficients: PSNR = {psnr:.2f} dB")

    # ex1: canonical RD sweep — train on lena_small, code lena
    points = []
    for q in SweepConfig().image_q_scales:
        c = ivc.IntraCodec(quantization_scale=q)
        c.train_huffman_from_image(lena_small)
        recon, _, _, bpp = c.encode_decode(lena, return_bpp=True)
        psnr = float(ivc.calc_psnr(lena, recon))
        points.append((q, bpp, psnr))
        print(f"q={q:<5}: bpp={bpp:.4f}  PSNR={psnr:.2f} dB")

    if args.plot:
        import pathlib

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        outdir = pathlib.Path(args.plot)
        outdir.mkdir(parents=True, exist_ok=True)
        bpps = [p[1] for p in points]
        psnrs = [p[2] for p in points]
        plt.figure()
        plt.plot(bpps, psnrs, "o-")
        plt.xlabel("bpp")
        plt.ylabel("PSNR [dB]")
        plt.title("Intra codec RD curve (train lena_small, code lena)")
        plt.grid(True)
        plt.savefig(outdir / "ch3_rd_curve.png", dpi=90)
        print(f"wrote {outdir/'ch3_rd_curve.png'}")


if __name__ == "__main__":
    main()
