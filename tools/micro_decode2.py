"""Which part of decode_blocks_lut is slow? Isolate the initial row gather."""

from __future__ import annotations

import time
from functools import partial

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


B = 32640
LW = 34
L = 16320 * 32  # stream words

key = jax.random.PRNGKey(0)
words = jax.random.randint(key, (L,), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
offs = jnp.sort(jax.random.randint(key, (B,), 0, L * 32 - LW * 32, dtype=jnp.int32))


@jax.jit
def row_gather(words, offs):
    w0 = offs >> 5
    idx = jnp.clip(w0[:, None] + jnp.arange(LW, dtype=jnp.int32)[None, :], 0, L - 1)
    return words[idx]


@jax.jit
def row_gather_take(words, offs):
    w0 = offs >> 5
    idx = jnp.clip(w0[:, None] + jnp.arange(LW, dtype=jnp.int32)[None, :], 0, L - 1)
    return jnp.take(words, idx.reshape(-1), axis=0).reshape(B, LW)

@jax.jit
def flat_gather_1d(words, idx_flat):
    return words[idx_flat]


def main():
    print(f"backend={jax.default_backend()} B={B} LW={LW} L={L}")
    t = timeit(row_gather, words, offs)
    print(f"row gather 2D [B,LW]:        {t*1e3:7.2f} ms ({t/(B*LW)*1e9:.2f} ns/elem)")
    t = timeit(row_gather_take, words, offs)
    print(f"row gather take flat:        {t*1e3:7.2f} ms")
    w0 = offs >> 5
    idx = jnp.clip(w0[:, None] + jnp.arange(LW, dtype=jnp.int32)[None, :], 0, L - 1).reshape(-1)
    t = timeit(flat_gather_1d, words, idx)
    print(f"flat 1D gather {idx.size}:   {t*1e3:7.2f} ms ({t/idx.size*1e9:.2f} ns/elem)")
    lut = jax.random.randint(key, (1 << 16,), 0, 2**20, dtype=jnp.int32)
    for n in (32640, 261120, 1109760):
        i1 = jax.random.randint(key, (n,), 0, 1 << 16, dtype=jnp.int32)
        t = timeit(flat_gather_1d, lut, i1)
        print(f"lut 1D gather n={n}:      {t*1e3:7.2f} ms ({t/n*1e9:.2f} ns/elem)")


if __name__ == "__main__":
    main()
