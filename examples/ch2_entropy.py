"""Chapter-2-style entropy studies and the DPCM codec RD sweep.

Workload parity with ``exercises/ch2``: marginal/joint/conditional
entropies, predictor residual entropies, common-codebook cross-entropy,
Huffman coding of min-entropy predictor residuals, and the full
3-pixel-predictor DPCM codec swept over quantization steps
(``ex_final_codec.py:57-102``).

Run: python examples/ch2_entropy.py
"""

import numpy as np

import ivclab_tpu as ivc
from ivclab_tpu.config import SweepConfig
from ivclab_tpu.models.dpcm import PredictiveCodec
from ivclab_tpu.utils import fixtures


def main():
    names = ["lena", "sail", "peppers"]
    images = {n: fixtures.image(n) for n in names}
    rng = np.arange(256)

    # ex1-4: marginal / joint / conditional entropies
    pmfs = {}
    for n, img in images.items():
        pmfs[n] = ivc.stats_marg(img, rng)
        h = float(ivc.calc_entropy(pmfs[n]))
        hj = float(ivc.calc_entropy(ivc.stats_joint(img, rng)))
        hc = float(ivc.stats_cond(img, rng))
        print(f"{n}: H={h:.4f}  H_joint={hj:.4f}  H_cond={hc:.4f} bits")

    # common-codebook cross-entropy (ex_comparison.py)
    common = np.mean([np.asarray(p) for p in pmfs.values()], axis=0)
    for n in names:
        cl = float(ivc.min_code_length(pmfs[n], common))
        print(f"{n}: min code length under common pmf = {cl:.4f} bits")

    # ex5/ex6: predictor residual entropies
    sail = images["sail"]
    res1 = ivc.single_pixel_predictor(sail)
    h1 = float(ivc.calc_entropy(ivc.stats_marg(res1, np.arange(-255, 255))))
    ry, rc = ivc.three_pixels_predictor(sail)
    merged = np.concatenate([ry.ravel(), rc.ravel()])
    h3 = float(ivc.calc_entropy(ivc.stats_marg(merged, np.arange(-255, 255))))
    print(f"predictor entropies: single={h1:.4f}  three-pixel={h3:.4f} bits")

    # ex_huffcoder: Huffman on the min-entropy (LOCO-I/median) predictor
    # residuals (exercises/ch2/ex_huffcoder.py:76-116 workload)
    from ivclab_tpu.entropy.huffman import HuffmanCoder
    from ivclab_tpu.models.predictive import min_entropy_predictor

    gray = np.asarray(ivc.rgb2gray(images["lena"])).astype(np.int32)
    res, _ = min_entropy_predictor(gray)
    res_pmf = ivc.stats_marg(res, np.arange(-255, 257))
    h_me = float(ivc.calc_entropy(res_pmf))
    coder_me = HuffmanCoder(lower_bound=-255).train(
        np.asarray(ivc.smooth_pmf(res_pmf), dtype=np.float64)
    )
    _, me_bits = coder_me.encode(res)
    print(
        f"min-entropy predictor: residual entropy={h_me:.4f} bits, "
        f"huffman rate={me_bits / res.size:.4f} bpp"
    )

    # my_utils parity helper: Huffman on three-pixel residuals
    from ivclab_tpu.utils.huffman_helpers import huffman_encoding, train_huffman

    coder, res_y, res_cbcr = train_huffman(images["lena"])
    streams, bitrates, total_bits, shapes = huffman_encoding(
        [res_y, res_cbcr[:, :, 0], res_cbcr[:, :, 1]], coder
    )
    n_px = images["lena"].shape[0] * images["lena"].shape[1]
    print(
        f"huffman on residuals: {total_bits} stream bits, "
        f"{sum(bitrates) / n_px:.4f} payload bpp, prefix-free={coder.is_prefix_free()}"
    )

    # ex_final_codec: DPCM codec RD sweep
    lena = images["lena"]
    print("DPCM codec RD sweep (3-pixel predictor + chroma subsample):")
    for q in SweepConfig().dpcm_quant_steps:
        recon, _, bpp = PredictiveCodec(quant_step=float(q)).encode_decode(lena, return_bpp=True)
        print(f"  q={q:3d}: bpp={bpp:.4f}  PSNR={float(ivc.calc_psnr(lena, recon)):.2f} dB")


if __name__ == "__main__":
    main()
