"""Microbenchmarks isolating decode-loop cost drivers on TPU.

Answers: is the LUT-decode cost (a) while_loop per-iteration overhead,
(b) the 64k-LUT gather, or (c) the dense shift-register update?
"""

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


N = 32640 * 8  # all-frames lanes
LW = 34
STEPS = 50

key = jax.random.PRNGKey(0)
local = jax.random.randint(key, (N, LW), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
lut = jax.random.randint(key, (1 << 16,), 0, 2**20, dtype=jnp.int32)
counts = jax.random.randint(key, (N,), 5, STEPS, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("steps",))
def loop_overhead(local, steps: int):
    def body(carry):
        i, acc = carry
        return i + 1, acc + 1
    _, acc = jax.lax.while_loop(lambda c: c[0] < steps, body, (jnp.int32(0), local[:, 0]))
    return acc


@partial(jax.jit, static_argnames=("steps",))
def gather_loop(local, lut, steps: int):
    def body(carry):
        i, w, acc = carry
        e = lut[(w >> jnp.uint32(16)).astype(jnp.int32)]
        return i + 1, w + jnp.uint32(1), acc + e
    _, _, acc = jax.lax.while_loop(
        lambda c: c[0] < steps, body, (jnp.int32(0), local[:, 0], jnp.zeros((N,), jnp.int32))
    )
    return acc


@partial(jax.jit, static_argnames=("steps",))
def shift_loop(local, steps: int):
    def body(carry):
        i, loc = carry
        lu = (loc[:, 0] & jnp.uint32(15))[:, None] + jnp.uint32(1)
        nxt = jnp.concatenate([loc[:, 1:], jnp.zeros((N, 1), jnp.uint32)], axis=1)
        loc = (loc << lu) | (nxt >> (jnp.uint32(32) - lu))
        return i + 1, loc
    _, loc = jax.lax.while_loop(lambda c: c[0] < steps, body, (jnp.int32(0), local))
    return loc


@partial(jax.jit, static_argnames=("steps",))
def full_loop(local, lut, counts, steps: int):
    """The actual decode loop body shape (LUT + shift + out write)."""
    def body(carry):
        i, loc, out = carry
        e = lut[(loc[:, 0] >> jnp.uint32(16)).astype(jnp.int32)]
        length = e & 31
        sym = e >> 5
        active = i < counts
        out = out.at[i].set(jnp.where(active, sym, 0))
        lu = jnp.uint32(1) + (length.astype(jnp.uint32) & jnp.uint32(15))
        lu = lu[:, None]
        nxt = jnp.concatenate([loc[:, 1:], jnp.zeros((N, 1), jnp.uint32)], axis=1)
        loc = jnp.where(active[:, None], (loc << lu) | (nxt >> (jnp.uint32(32) - lu)), loc)
        return i + 1, loc, out
    out0 = jnp.zeros((steps, N), dtype=jnp.int32)
    _, _, out = jax.lax.while_loop(lambda c: c[0] < steps, body, (jnp.int32(0), local, out0))
    return out


def main():
    print(f"backend={jax.default_backend()} N={N} LW={LW} STEPS={STEPS}")
    t = timeit(loop_overhead, local, STEPS)
    print(f"loop overhead ({STEPS} trivial steps):   {t*1e3:7.2f} ms  ({t/STEPS*1e6:.0f} us/step)")
    t = timeit(gather_loop, local, lut, STEPS)
    print(f"gather loop ({STEPS} x {N} lut gathers):  {t*1e3:7.2f} ms  ({t/(STEPS*N)*1e9:.2f} ns/gather)")
    t = timeit(shift_loop, local, STEPS)
    print(f"shift loop ({STEPS} x [N,{LW}] funnel):   {t*1e3:7.2f} ms")
    t = timeit(full_loop, local, lut, counts, STEPS)
    print(f"full decode-shaped loop:                {t*1e3:7.2f} ms")

    # one-shot big gather for comparison
    idx = (local[:, :16] >> jnp.uint32(16)).astype(jnp.int32)
    f = jax.jit(lambda i: lut[i])
    t = timeit(f, idx)
    print(f"bulk gather {N*16} elems:              {t*1e3:7.2f} ms  ({t/(N*16)*1e9:.2f} ns/elem)")


if __name__ == "__main__":
    main()
