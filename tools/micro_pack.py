"""Prototype loop-free packers; check bit-exactness vs pack_codes_grouped_dense2.

Two candidates:
  A) flat scatter-add: every symbol's two word-parts scatter-add into the
     grouped stream (disjoint bits => add == or).
  B) searchsorted gather-OR: for each output word, gather its <=K
     contributing symbols and OR them in.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np



U32 = jnp.uint32
PACK_GROUP = 16


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@partial(jax.jit, static_argnames=("words_per_group",))
def pack_scatter(codes, lens, words_per_group: int):
    """A) flat scatter-add pack into grouped layout."""
    N, S = lens.shape
    G = N // PACK_GROUP
    lens = lens.astype(jnp.int32)
    codes = codes.astype(U32)

    csum = jnp.cumsum(lens, axis=1)
    inblock = csum - lens
    block_bits = csum[:, -1]

    Lg = block_bits.reshape(G, PACK_GROUP)
    O = jnp.cumsum(Lg, axis=1) - Lg
    group_bits = jnp.sum(Lg, axis=1)
    base = (jnp.arange(G, dtype=jnp.int32) * (words_per_group * 32))[:, None]
    block_off = (base + O).reshape(N)  # global bit offset per block

    off = block_off[:, None] + inblock  # [N, S] global bit offsets
    shift_lj = ((32 - lens) & 31).astype(U32)
    lj = jnp.where(lens > 0, codes << shift_lj, U32(0))
    word = off >> 5
    sh = (off & 31).astype(U32)
    p1 = lj >> sh
    p2 = jnp.where(sh == 0, U32(0), lj << (U32(32) - sh))

    num_words = G * words_per_group
    word = jnp.where(lens > 0, word, num_words + 1).reshape(-1)
    out = jnp.zeros((num_words,), U32)
    out = out.at[word].add(p1.reshape(-1), mode="drop")
    out = out.at[word + 1].add(p2.reshape(-1), mode="drop")
    return out.reshape(G, words_per_group), group_bits, block_off.reshape(-1)


@partial(jax.jit, static_argnames=("words_per_group", "k_max"))
def pack_gatheror(codes, lens, words_per_group: int, k_max: int):
    """B) searchsorted + K-unrolled gather-OR pack."""
    N, S = lens.shape
    G = N // PACK_GROUP
    lens = lens.astype(jnp.int32)
    codes = codes.astype(U32)

    csum = jnp.cumsum(lens, axis=1)
    inblock = csum - lens
    block_bits = csum[:, -1]
    Lg = block_bits.reshape(G, PACK_GROUP)
    O = jnp.cumsum(Lg, axis=1) - Lg
    group_bits = jnp.sum(Lg, axis=1)
    base = (jnp.arange(G, dtype=jnp.int32) * (words_per_group * 32))[:, None]
    block_off = (base + O).reshape(N)

    start = (block_off[:, None] + inblock).reshape(-1)
    lenf = lens.reshape(-1)
    shift_lj = ((32 - lens) & 31).astype(U32).reshape(-1)
    lj = jnp.where(lenf > 0, codes.reshape(-1) << shift_lj, U32(0))

    # compact valid symbols
    mask = lenf > 0
    M = jnp.cumsum(mask.astype(jnp.int32)) - 1
    cap_slots = start.shape[0]
    INF = jnp.int32(2**31 - 1)
    dst = jnp.where(mask, M, cap_slots)
    c_start = jnp.full((cap_slots,), INF, jnp.int32).at[dst].set(start, mode="drop")
    c_end = jnp.full((cap_slots,), INF, jnp.int32).at[dst].set(start + lenf, mode="drop")
    c_lj = jnp.zeros((cap_slots,), U32).at[dst].set(lj, mode="drop")

    num_words = G * words_per_group
    ws = jnp.arange(num_words, dtype=jnp.int32) * 32
    j0 = jnp.searchsorted(c_end, ws, side="right")
    acc = jnp.zeros((num_words,), U32)
    for k in range(k_max):
        j = jnp.minimum(j0 + k, cap_slots - 1)
        st = c_start[j]
        ljk = c_lj[j]
        rel = st - ws
        ok = (rel < 32) & (st != INF)
        relc = jnp.clip(rel, -31, 31)
        contrib = jnp.where(
            relc >= 0,
            ljk >> relc.astype(U32),
            ljk << (-relc).astype(U32),
        )
        acc = acc | jnp.where(ok, contrib, U32(0))
    return acc.reshape(G, words_per_group), group_bits, block_off


def gen(N, S, rng):
    counts = np.minimum(rng.geometric(0.09, N) + 1, S)
    for_pos = np.arange(S)[None, :]
    msk = for_pos < counts[:, None]
    ln = rng.integers(2, 17, (N, S))
    lens_np = np.where(msk, ln, 0).astype(np.int32)
    codes_np = (rng.integers(0, 1 << 16, (N, S)) & ((1 << ln) - 1)).astype(np.uint32)
    codes_np = np.where(msk, codes_np, 0)
    return lens_np, codes_np


def oracle(lens_np, codes_np, GW):
    N, S = lens_np.shape
    ref_w = np.zeros((N // PACK_GROUP) * GW, np.uint32)
    ref_off = np.zeros(N, np.int64)
    bit = 0
    for b in range(N):
        g = b // PACK_GROUP
        if b % PACK_GROUP == 0:
            bit = g * GW * 32
        ref_off[b] = bit
        for s in range(S):
            L = int(lens_np[b, s])
            if L == 0:
                continue
            cw = int(codes_np[b, s])
            w, sh = bit >> 5, bit & 31
            lj = (cw << (32 - L)) & 0xFFFFFFFF
            ref_w[w] |= np.uint32(lj >> sh)
            if sh:
                ref_w[w + 1] |= np.uint32((lj << (32 - sh)) & 0xFFFFFFFF)
            bit += L
    return ref_w, ref_off.astype(np.int32)


def main():
    N, S = 32640, 64
    GW = PACK_GROUP * S * 16 // 32  # group_words_for_cap
    rng = np.random.default_rng(0)
    lens_np, codes_np = gen(N, S, rng)
    codes = jnp.asarray(codes_np)
    lens = jnp.asarray(lens_np)

    # correctness at small N against the serial oracle
    Nc = 1600
    lc, cc = gen(Nc, S, np.random.default_rng(1))
    ow, ooff = oracle(lc, cc, GW)
    aw, agb, aoff = jax.jit(lambda c, l: pack_scatter(c, l, GW))(jnp.asarray(cc), jnp.asarray(lc))
    print("scatter exact:", bool(jnp.array_equal(aw.reshape(-1), jnp.asarray(ow)) and jnp.array_equal(aoff, jnp.asarray(ooff))), flush=True)
    bw, bgb, boff = jax.jit(lambda c, l: pack_gatheror(c, l, GW, 32 // 2 + 2))(jnp.asarray(cc), jnp.asarray(lc))
    print("gather-OR exact:", bool(jnp.array_equal(bw.reshape(-1), jnp.asarray(ow)) and jnp.array_equal(boff, jnp.asarray(ooff))), flush=True)

    f_a = jax.jit(lambda c, l: pack_scatter(c, l, GW))
    t = timeit(f_a, codes, lens)
    print(f"scatter pack:       {t*1e3:8.2f} ms", flush=True)

    K = 32 // 2 + 2
    f_b = jax.jit(lambda c, l: pack_gatheror(c, l, GW, K))
    t = timeit(f_b, codes, lens)
    print(f"gather-OR pack K={K}: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
