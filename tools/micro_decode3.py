"""Profile decode_blocks_lut itself + variants to find the real cost."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ivclab_tpu.ops.bitpack import decode_blocks_lut


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
CAP = 64
LW = 34
GW = 512
G = B // 16
L = G * GW

key = jax.random.PRNGKey(0)
words = jax.random.randint(key, (L,), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
base = jnp.repeat(jnp.arange(G) * (GW * 32), 16)
offs = (base + jnp.tile(jnp.arange(16) * 900, G)).astype(jnp.int32)
counts = jax.random.randint(key, (B,), 5, 51, dtype=jnp.int32)
lut = ((jax.random.randint(key, (1 << 16,), 0, 200, dtype=jnp.int32) << 5)
       | jax.random.randint(key, (1 << 16,), 1, 17, dtype=jnp.int32))


def variant_fori(words, block_bit_offsets, block_sym_counts, lut, max_syms: int, local_words: int):
    """Same as decode_blocks_lut but fori_loop with static trip count."""
    U32 = jnp.uint32
    words = words.reshape(-1)
    offs = block_bit_offsets
    counts = block_sym_counts
    B = offs.shape[0]
    L = words.shape[0]

    w0 = offs >> 5
    phase = (offs & 31).astype(U32)[:, None]
    idx = jnp.clip(w0[:, None] + jnp.arange(local_words, dtype=jnp.int32)[None, :], 0, L - 1)
    local = words[idx]
    nxt = jnp.concatenate([local[:, 1:], jnp.zeros((B, 1), U32)], axis=1)
    local = jnp.where(phase == 0, local, (local << phase) | (nxt >> (jnp.uint32(32) - phase)))

    def body(i, carry):
        local, out = carry
        entry = lut[(local[:, 0] >> jnp.uint32(16)).astype(jnp.int32)]
        length = entry & 31
        sym = entry >> 5
        active = i < counts
        out = out.at[i].set(jnp.where(active, sym, 0))
        lu = length.astype(U32)[:, None]
        nxt = jnp.concatenate([local[:, 1:], jnp.zeros((B, 1), U32)], axis=1)
        local = jnp.where(active[:, None], (local << lu) | (nxt >> (jnp.uint32(32) - lu)), local)
        return local, out

    out0 = jnp.zeros((max_syms, B), dtype=jnp.int32)
    _, out = jax.lax.fori_loop(0, max_syms, body, (local, out0))
    return out.T


def main():
    print(f"backend={jax.default_backend()} B={B} CAP={CAP}")
    f = jax.jit(lambda w, o, c: decode_blocks_lut(w, o, c, lut, CAP, LW))
    t = timeit(f, words, offs, counts)
    print(f"decode_blocks_lut (as-is):     {t*1e3:7.2f} ms")

    f2 = jax.jit(lambda w, o, c: variant_fori(w, o, c, lut, CAP, LW))
    t = timeit(f2, words, offs, counts)
    print(f"variant fori static {CAP}:        {t*1e3:7.2f} ms")

    f3 = jax.jit(lambda w, o, c: variant_fori(w, o, c, lut, 50, LW))
    t = timeit(f3, words, offs, counts)
    print(f"variant fori static 50:        {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
