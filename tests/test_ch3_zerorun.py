"""Zero-run coder tests: vectorized vs C++ oracle, round trips, edge cases."""

import numpy as np
import pytest

from ivclab_tpu.ops.zerorun import (
    ZeroRunCoder,
    compact_symbols,
    zerorun_decode_stream,
    zerorun_encode_blocks,
)
from ivclab_tpu.runtime import native

EOB = 4000


def random_blocks(rng, n, sparsity=0.8):
    x = rng.integers(-300, 300, size=(n, 64)).astype(np.int32)
    mask = rng.random((n, 64)) < sparsity
    x[mask] = 0
    x[x == EOB] = 0
    return x


def encode_compact(blocks):
    import jax.numpy as jnp

    buf, valid = zerorun_encode_blocks(jnp.asarray(blocks), 64, EOB)
    stream, total = compact_symbols(buf, valid)
    return np.asarray(stream)[: int(total)]


@pytest.mark.parametrize("sparsity", [0.0, 0.5, 0.9, 1.0])
def test_vectorized_matches_native_oracle(rng, sparsity):
    blocks = random_blocks(rng, 37, sparsity)
    ours = encode_compact(blocks)
    oracle = native.zerorun_encode(blocks, EOB)
    assert np.array_equal(ours, oracle)


def test_decode_roundtrip(rng):
    blocks = random_blocks(rng, 53, 0.85)
    stream = encode_compact(blocks)
    import jax.numpy as jnp

    out, ok = zerorun_decode_stream(jnp.asarray(stream), stream.size, 53, 64, EOB)
    assert bool(ok)
    assert np.array_equal(np.asarray(out), blocks)


def test_decode_matches_native(rng):
    blocks = random_blocks(rng, 20, 0.7)
    stream = encode_compact(blocks)
    oracle = native.zerorun_decode(stream, 20, 64, EOB)
    assert np.array_equal(oracle, blocks)


def test_all_zero_block():
    blocks = np.zeros((3, 64), np.int32)
    stream = encode_compact(blocks)
    assert np.array_equal(stream, [EOB, EOB, EOB])


def test_dense_block():
    blocks = np.arange(1, 65, dtype=np.int32).reshape(1, 64)
    stream = encode_compact(blocks)
    assert stream.size == 65
    assert stream[-1] == EOB


def test_trailing_zeros_dropped():
    blocks = np.zeros((1, 64), np.int32)
    blocks[0, 0] = 7
    stream = encode_compact(blocks)
    assert np.array_equal(stream, [7, EOB])


def test_interior_run():
    blocks = np.zeros((1, 64), np.int32)
    blocks[0, 0] = 5
    blocks[0, 10] = -3
    stream = encode_compact(blocks)
    assert np.array_equal(stream, [5, 0, 9, -3, EOB])


def test_facade_roundtrip(rng):
    coder = ZeroRunCoder()
    x = random_blocks(rng, 4 * 5 * 3, 0.8).reshape(4, 5, 3, 64)
    symbols = coder.encode(x)
    back = coder.decode(symbols, (4, 5, 3))
    assert np.array_equal(back, x)


def test_corrupt_stream_detected():
    coder = ZeroRunCoder()
    with pytest.raises(ValueError):
        coder.decode(np.array([1, 2, 3], dtype=np.int32), (2, 2, 1))


def test_forward_symbolize_capacity_cond_parity(rng):
    """forward_symbolize's capacity-bucketed zero-run encode (fast 32-slot
    branch vs full BLOCK_CAP fallback) must match the reference scatter
    encoder on both smooth content (fast branch) and dense noise content
    that overflows 32 symbols per block (full branch)."""
    import jax.numpy as jnp

    from ivclab_tpu.ops.quant import quant_table_zigzag
    from ivclab_tpu.ops.transform import forward_symbolize
    from ivclab_tpu.ops.zerorun import zerorun_encode_blocks

    qt = quant_table_zigzag(1.0, 1)
    inv = jnp.asarray((1.0 / qt).astype(np.float32))
    smooth = np.tile(np.linspace(0, 255, 32, dtype=np.float32)[:, None], (1, 32))[..., None]
    noise = (rng.random((32, 32, 1)) * 255).astype(np.float32) * 40  # dense coeffs
    for img in (smooth, noise):
        buf, valid, qsym = forward_symbolize(jnp.asarray(img), inv, 4000)
        want_buf, want_valid = zerorun_encode_blocks(qsym, 64, 4000)
        assert np.array_equal(np.asarray(valid), np.asarray(want_valid))
        assert np.array_equal(np.asarray(buf), np.asarray(want_buf))
    # the noise content actually exercised the full branch
    _, valid_n, _ = forward_symbolize(jnp.asarray(noise), inv, 4000)
    assert int(np.asarray(valid_n).max()) > 32


def test_sized_pack_long_codes_not_truncated():
    """Codes longer than FUSED_TABLE_MAX_LEN bits must take the two-gather
    path (the fused (code<<6|len) u32 entry would drop their top bits).
    A geometric pmf forces canonical lengths deep past 26 bits."""
    import jax.numpy as jnp

    from ivclab_tpu.entropy.codebook import build_canonical_code
    from ivclab_tpu.ops.transform import (
        FUSED_TABLE_MAX_LEN, pack_symbols_grouped, pack_symbols_grouped_sized,
    )

    n = 40
    pmf = np.power(0.5, np.arange(1, n + 1))
    pmf /= pmf.sum()
    # explicit max_len=32: the format allows long codes (the DEFAULT
    # build caps at 26 so production tables always fit the fused entry)
    code = build_canonical_code(pmf, lower_bound=0, max_len=32)
    assert code.max_len > FUSED_TABLE_MAX_LEN  # the hazardous regime

    rng = np.random.default_rng(5)
    # skew draws toward the long-code tail so truncation would show
    syms = rng.integers(n - 8, n, size=(16, 32)).astype(np.int32)
    valid = np.full(16, 32, np.int32)
    want = pack_symbols_grouped(
        jnp.asarray(syms), jnp.asarray(valid),
        jnp.asarray(code.codes), jnp.asarray(code.lengths), 0,
    )
    # buckets sized for the long-code content (production detects the
    # ADAPTIVE_WPG/ADAPTIVE_BW overflow via _sized_buckets_ok and falls
    # back; here only the gather fusion is under test)
    got = pack_symbols_grouped_sized(
        jnp.asarray(syms), jnp.asarray(valid),
        jnp.asarray(code.codes), jnp.asarray(code.lengths), jnp.int32(0),
        1024, 64,
        fuse_table=bool(code.max_len <= FUSED_TABLE_MAX_LEN),  # -> False
    )
    assert np.array_equal(np.asarray(want[1]), np.asarray(got[1]))  # group bits
    used = int((np.asarray(want[1]).max() + 31) // 32)
    assert np.array_equal(
        np.asarray(want[0])[:, :used], np.asarray(got[0])[:, :used]
    )
