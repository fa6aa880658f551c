"""Per-phase TPU profile of the fused 1080p pipeline (round-2 perf work).

Times encode / pack / decode separately, and breaks pack into its
sub-steps (zero-run dense encode, deposit loop, placement rolls) and
decode into (LUT loop, zero-run decode + IDCT, MC rebuild).

Usage: python tools/profile_phases.py [H W T]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1088
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from ivclab_tpu.models.fastvideo import FusedVideoCodec, CAP_BUCKETS
    from ivclab_tpu.utils import fixtures
    from ivclab_tpu.ops import zerorun as zr
    from ivclab_tpu.ops.transform import pack_symbols_grouped_cap
    from ivclab_tpu.ops.bitpack import decode_blocks_lut
    from ivclab_tpu.ops.transform import block_words_for_cap

    print(f"backend={jax.default_backend()} shape={H}x{W}x{T}")
    frames = fixtures.video("bench", num_frames=T, shape=(H, W))
    y = np.ascontiguousarray(frames.astype(np.float32).mean(axis=-1))

    codec = FusedVideoCodec(quantization_scale=1.0)
    codec.train(y[:2])
    dev_y = jax.device_put(y)

    t_enc, (qsyms, mvs, mv_bits, enc_recons) = timeit(codec.encode_gop, dev_y)
    print(f"encode_gop:      {t_enc*1e3:8.1f} ms")

    counts_max = int(jnp.max(jax.vmap(zr.zerorun_counts)(qsyms.reshape(T, -1, 64))))
    cap = next(c for c in CAP_BUCKETS if c >= counts_max)
    print(f"counts_max={counts_max} cap={cap}")

    t_pack, (words, totals, offsets, counts) = timeit(codec._pack_gop_cap, qsyms, cap)
    print(f"pack_gop:        {t_pack*1e3:8.1f} ms")

    # pack sub-steps (single frame, then x T estimate)
    q0 = qsyms[0]
    t_zr, (buf, valid) = timeit(
        jax.jit(lambda q: zr.zerorun_encode_blocks_dense(q, 64, 4000, cap)), q0
    )
    print(f"  zerorun_dense (1 frame):  {t_zr*1e3:8.1f} ms  (xT={t_zr*T*1e3:.1f})")

    lo = codec.residual_code.lower_bound
    t_pk, _ = timeit(
        jax.jit(lambda b, v: pack_symbols_grouped_cap(b - lo, v, codec._enc_fused, cap)),
        buf, valid,
    )
    print(f"  grouped pack (1 frame):   {t_pk*1e3:8.1f} ms  (xT={t_pk*T*1e3:.1f})")

    t_dec, (recons, ok) = timeit(
        lambda w, o, c, m: codec._decode_gop_cap(w, o, c, m, H, W, cap),
        words, offsets, counts, mvs,
    )
    print(f"decode_gop:      {t_dec*1e3:8.1f} ms  ok={bool(ok)}")

    lw = block_words_for_cap(cap)
    t_lut, _ = timeit(
        jax.jit(
            lambda w, o, c: decode_blocks_lut(
                w.reshape(-1), o, c, codec._dec_lut, cap, lw
            )
        ),
        words[0], offsets[0], counts[0],
    )
    print(f"  lut decode (1 frame):     {t_lut*1e3:8.1f} ms  (xT={t_lut*T*1e3:.1f})")

    total = t_enc + t_pack + t_dec
    fps = T / total
    print(f"TOTAL: {total*1e3:.1f} ms -> {fps:.2f} fps ({fps*H*W/1e6:.1f} Mpix/s)")


if __name__ == "__main__":
    main()
