"""Component-level TPU profile: ME, DCT, zerorun variants, MC variants."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


H, W = 1088, 1920
N = (H // 8) * (W // 8)
CAP = 64

from ivclab_tpu.ops.motion import (
    motion_compensate,
    motion_compensate_dense,
    motion_search,
    motion_search_auto,
)
from ivclab_tpu.ops.dct import dct2_fused, idct2_fused
from ivclab_tpu.ops import zerorun as zr

key = jax.random.PRNGKey(0)
ref = jax.random.uniform(key, (H, W), jnp.float32) * 255
cur = jnp.clip(ref + jax.random.normal(key, (H, W)) * 10, 0, 255)

print(f"backend={jax.default_backend()}  {H}x{W}  N={N}")

t = timeit(jax.jit(lambda a, b: motion_search(a, b, 4)), ref, cur)
print(f"motion_search XLA scan:      {t*1e3:7.2f} ms")
t = timeit(jax.jit(lambda a, b: motion_search_auto(a, b, 4)), ref, cur)
print(f"motion_search auto (pallas): {t*1e3:7.2f} ms")

mv = motion_search(ref, cur, 4)
t = timeit(jax.jit(lambda r, m: motion_compensate(r, m, 4)), ref, mv)
print(f"motion_compensate gather:    {t*1e3:7.2f} ms")
t = timeit(jax.jit(lambda r, m: motion_compensate_dense(r, m, 4)), ref, mv)
print(f"motion_compensate dense:     {t*1e3:7.2f} ms")

blocks = jax.random.normal(key, (N, 64), jnp.float32) * 50
t = timeit(jax.jit(dct2_fused), blocks)
print(f"dct2_fused [N,64]:           {t*1e3:7.2f} ms")
t = timeit(jax.jit(idct2_fused), blocks)
print(f"idct2_fused [N,64]:          {t*1e3:7.2f} ms")

# realistic sparse quantized blocks
qsym = jnp.where(jax.random.uniform(key, (N, 64)) < 0.15,
                 jax.random.randint(key, (N, 64), -30, 30, dtype=jnp.int32), 0)
qsym = qsym.at[:, 0].set(jax.random.randint(key, (N,), -100, 100, dtype=jnp.int32))

t = timeit(jax.jit(lambda q: zr.zerorun_encode_blocks(q, 64, 4000)), qsym)
print(f"zerorun encode scatter:      {t*1e3:7.2f} ms")
t = timeit(jax.jit(lambda q: zr.zerorun_encode_blocks_dense(q, 64, 4000, CAP)), qsym)
print(f"zerorun encode dense:        {t*1e3:7.2f} ms")
t = timeit(jax.jit(lambda q: zr.zerorun_counts(q, 64)), qsym)
print(f"zerorun counts:              {t*1e3:7.2f} ms")

buf, vl = zr.zerorun_encode_blocks(qsym, 64, 4000)
buf64 = buf[:, :CAP]
t = timeit(jax.jit(lambda b, v: zr.zerorun_decode_blocks(b, v, 64, 4000)), buf64, vl)
print(f"zerorun decode scatter:      {t*1e3:7.2f} ms")
t = timeit(jax.jit(lambda b, v: zr.zerorun_decode_blocks_dense(b, v, 64, 4000)), buf64, vl)
print(f"zerorun decode dense:        {t*1e3:7.2f} ms")
