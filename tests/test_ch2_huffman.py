"""Canonical Huffman engine tests: optimality, losslessness, limits, parity."""

import numpy as np
import pytest

from ivclab_tpu.entropy import (
    HuffmanCoder,
    build_canonical_code,
    calc_entropy,
    huffman_code_lengths,
    limit_code_lengths,
    smooth_pmf,
)
from ivclab_tpu.runtime import native


def random_pmf(rng, n):
    p = rng.random(n) ** 3 + 1e-9
    return p / p.sum()


@pytest.mark.parametrize("n", [2, 3, 17, 256, 1000])
def test_lengths_near_entropy(n):
    rng = np.random.default_rng(n)
    pmf = random_pmf(rng, n)
    lengths = huffman_code_lengths(pmf)
    mean_len = float(np.sum(pmf * lengths))
    h = float(calc_entropy(pmf))
    assert h - 1e-6 <= mean_len <= h + 1.0  # Huffman optimality bound


def test_kraft_equality():
    rng = np.random.default_rng(0)
    pmf = random_pmf(rng, 300)
    lengths = huffman_code_lengths(pmf)
    assert abs(np.sum(2.0 ** (-lengths.astype(np.float64))) - 1.0) < 1e-9


def test_length_limit():
    # extremely skewed pmf forces deep trees
    n = 64
    pmf = np.array([2.0 ** (-i) for i in range(1, n + 1)])
    pmf /= pmf.sum()
    lengths = huffman_code_lengths(pmf)
    assert lengths.max() > 32  # unrestricted would overflow a u32 code
    limited = limit_code_lengths(lengths, 32)
    assert limited.max() <= 32
    assert abs(np.sum(2.0 ** (-limited.astype(np.float64))) - 1.0) < 1e-9
    # rate loss from limiting must be tiny
    assert np.sum(pmf * limited) - np.sum(pmf * np.minimum(lengths, 64)) < 1.0


def test_roundtrip_exact():
    rng = np.random.default_rng(7)
    pmf = random_pmf(rng, 500)
    coder = HuffmanCoder(lower_bound=-100).train(pmf)
    msg = rng.integers(-100, 400, size=20000)
    words, bits = coder.encode(msg)
    assert bits == float(np.sum(coder.code.lengths[msg + 100]))
    decoded = coder.decode(words, msg.size)
    assert np.array_equal(decoded, msg)


def test_smoothed_codec_roundtrip():
    """The codec-path pmf shape: huge epsilon-smoothed alphabet."""
    rng = np.random.default_rng(3)
    hist = np.zeros(5120)
    hist[2000:2100] = rng.integers(1, 10000, size=100)
    pmf = np.asarray(smooth_pmf(hist / hist.sum()), dtype=np.float64)
    coder = HuffmanCoder(lower_bound=-1024).train(pmf)
    assert coder.code.max_len <= 32
    msg = rng.integers(976, 1076, size=5000)
    words, _ = coder.encode(msg)
    assert np.array_equal(coder.decode(words, msg.size), msg)


def test_prefix_free():
    rng = np.random.default_rng(5)
    coder = HuffmanCoder().train(random_pmf(rng, 40))
    assert coder.is_prefix_free()


def test_zero_prob_rejected():
    with pytest.raises(ValueError):
        HuffmanCoder().train(np.array([0.5, 0.0, 0.5]))


def test_out_of_range_rejected():
    coder = HuffmanCoder(lower_bound=0).train(np.array([0.5, 0.25, 0.25]))
    with pytest.raises(ValueError):
        coder.encode(np.array([0, 1, 3]))


def test_native_vs_python_fallback():
    rng = np.random.default_rng(11)
    pmf = random_pmf(rng, 64)
    code = build_canonical_code(pmf)
    msg = rng.integers(0, 64, size=500)
    words_c, bits_c = native.pack_bits(code.codes[msg], code.lengths[msg])
    out_np = np.zeros(words_c.size + 1, dtype=np.uint32)
    bits_np = native._pack_bits_np(code.codes[msg], code.lengths[msg].astype(np.int32), out_np)
    assert bits_np == bits_c
    assert np.array_equal(out_np[: words_c.size], words_c)
    dec_c = native.decode_symbols(words_c, msg.size, code)
    dec_np = native._decode_symbols_np(
        words_c, msg.size, code.lj_next_minus1, code.first_code,
        code.group_offset, code.sorted_syms, 0, code.min_len,
    )
    assert np.array_equal(dec_c, msg)
    assert np.array_equal(dec_np, msg)


def test_native_available():
    """The C++ engine must build in this environment."""
    assert native.available()


def test_mean_code_length_close_to_entropy():
    rng = np.random.default_rng(13)
    pmf = random_pmf(rng, 200)
    coder = HuffmanCoder().train(pmf)
    h = float(calc_entropy(pmf))
    assert h <= coder.mean_code_length() <= h + 1.0


@pytest.mark.parametrize("q", [0.5, 1.0, 3.0])
def test_hot_escape_rate_within_2pct_of_full_huffman(q):
    """The hot/escape code's claimed rate bound (codebook.py HotCode
    docstring: within ~1% of the full-alphabet Huffman) holds on real
    codec streams: residual and MV symbol streams across q scales."""
    import jax.numpy as jnp

    from ivclab_tpu.entropy.codebook import build_hot_code
    from ivclab_tpu.entropy.stats import smooth_pmf
    from ivclab_tpu.models.fastvideo import EOB, FusedVideoCodec
    from ivclab_tpu.ops.transform import symbol_histogram
    from ivclab_tpu.ops.zerorun import zerorun_encode_blocks
    from ivclab_tpu.utils import fixtures

    frames = fixtures.video("hotrate", num_frames=4, shape=(96, 128))
    y = np.ascontiguousarray(frames.astype(np.float32).mean(axis=-1))
    codec = FusedVideoCodec(quantization_scale=q).train(y[:2])
    qsyms, mvs, _, _ = codec.encode_gop(jnp.asarray(y))

    def rates(flat_syms, lo, alphabet_n):
        """(full-alphabet Huffman bits, hot/escape bits) on one stream."""
        hist = np.bincount(flat_syms - lo, minlength=alphabet_n).astype(np.float64)
        pmf = np.asarray(smooth_pmf(hist / hist.sum()), dtype=np.float64)
        full = build_canonical_code(pmf, lower_bound=lo)
        full_bits = int(full.lengths[flat_syms - lo].sum())
        hc = build_hot_code(hist, lower_bound=lo)
        per_alpha = np.full(
            alphabet_n, int(hc.code.lengths[hc.K]) + hc.raw_bits, dtype=np.int64
        )
        per_alpha[hc.hot_values] = hc.code.lengths[: hc.K]
        hot_bits = int(per_alpha[flat_syms - lo].sum())
        return full_bits, hot_bits

    # residual zero-run stream
    buf, valid = zerorun_encode_blocks(qsyms.reshape(-1, 64), 64, EOB)
    mask = np.arange(buf.shape[1])[None, :] < np.asarray(valid)[:, None]
    syms = np.asarray(buf)[mask]
    lo = codec.residual_code.lower_bound
    full_bits, hot_bits = rates(syms, lo, codec.residual_code.alphabet_n)
    assert hot_bits <= 1.02 * full_bits, (q, "residual", hot_bits / full_bits)

    # motion-vector stream (frames 1..T-1)
    mv_syms = np.asarray(mvs)[1:].reshape(-1)
    n_mv = (2 * codec.sr + 1) ** 2
    full_bits, hot_bits = rates(mv_syms, 0, n_mv)
    assert hot_bits <= 1.02 * full_bits, (q, "mv", hot_bits / full_bits)
