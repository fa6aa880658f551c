"""Bisect the decode loop body: which op costs 20ms?"""

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
STEPS = 50
U32 = jnp.uint32

key = jax.random.PRNGKey(0)
local0 = jax.random.randint(key, (B, LW), 0, 2**31 - 1, dtype=jnp.int32).astype(U32)
counts = jax.random.randint(key, (B,), 5, 51, dtype=jnp.int32)
lut = jax.random.randint(key, (1 << 16,), 0, 2**20, dtype=jnp.int32)


def make(gather: bool, write: bool, shift: bool, where_active: bool, out_layout: str):
    def body(i, carry):
        local, out = carry
        if gather:
            entry = lut[(local[:, 0] >> U32(16)).astype(jnp.int32)]
        else:
            entry = (local[:, 0] >> U32(12)).astype(jnp.int32)
        length = (entry & 15) + 1
        sym = entry >> 5
        active = i < counts
        if write:
            if out_layout == "sb":
                out = out.at[i].set(jnp.where(active, sym, 0))
            else:
                out = out.at[:, i].set(jnp.where(active, sym, 0))
        if shift:
            lu = length.astype(U32)[:, None]
            nxt = jnp.concatenate([local[:, 1:], jnp.zeros((B, 1), U32)], axis=1)
            shifted = (local << lu) | (nxt >> (U32(32) - lu))
            if where_active:
                local = jnp.where(active[:, None], shifted, local)
            else:
                local = shifted
        return local, out

    @jax.jit
    def run(local):
        shape = (STEPS, B) if out_layout == "sb" else (B, STEPS)
        out0 = jnp.zeros(shape, dtype=jnp.int32)
        local, out = jax.lax.fori_loop(0, STEPS, body, (local, out0))
        return out

    return run


def main():
    print(f"backend={jax.default_backend()} B={B} LW={LW} STEPS={STEPS}")
    cases = [
        ("full (gather+write+shift+where, sb)", make(True, True, True, True, "sb")),
        ("no gather", make(False, True, True, True, "sb")),
        ("no write", make(True, False, True, True, "sb")),
        ("no shift", make(True, True, False, True, "sb")),
        ("no where on shift", make(True, True, True, False, "sb")),
        ("out layout [B, steps]", make(True, True, True, True, "bs")),
    ]
    for name, f in cases:
        t = timeit(f, local0)
        print(f"{name:40s} {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
