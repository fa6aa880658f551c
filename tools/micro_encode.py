"""Why is encode_gop 178ms when its components sum to ~4ms?"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ivclab_tpu.ops.dct import dct2_fused, idct2_fused
from ivclab_tpu.ops.motion import motion_compensate, motion_search, motion_search_auto
from ivclab_tpu.ops.quant import quant_table_zigzag


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


H, W, T = 1088, 1920, 8
SR = 4
key = jax.random.PRNGKey(0)
frames = jnp.clip(
    jax.random.uniform(key, (T, H, W), jnp.float32) * 40
    + jnp.arange(T, dtype=jnp.float32)[:, None, None], 0, 255)

qt = jnp.asarray(quant_table_zigzag(1.0, 1)[0])
inv_qt = 1.0 / qt


def _plane_to_blocks(y):
    return y.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 64)


def _blocks_to_plane(blocks):
    return blocks.reshape(H // 8, W // 8, 8, 8).transpose(0, 2, 1, 3).reshape(H, W)


def symbolize(plane):
    coeffs = dct2_fused(_plane_to_blocks(plane))
    qsym = jnp.round(coeffs * inv_qt[None, :]).astype(jnp.int32)
    deq = (qsym.astype(jnp.float32) * qt[None, :]).astype(jnp.int32)
    recon = _blocks_to_plane(idct2_fused(deq.astype(jnp.float32)))
    return qsym, recon


def make_gop(use_pallas: bool, use_cond: bool, use_scan: bool):
    ms = motion_search_auto if use_pallas else (lambda a, b, s: motion_search(a, b, s))

    def inter_only(recon_prev, y):
        mv = ms(recon_prev, y, SR)
        pred = motion_compensate(recon_prev, mv, SR)
        qsym, rrec = symbolize(y - pred)
        return qsym, mv, pred + rrec

    def frame_step(recon_prev, inputs):
        t, y = inputs
        if use_cond:
            def intra():
                qsym, recon = symbolize(y)
                mv = jnp.full((H // 8, W // 8), SR * (2 * SR + 1) + SR, jnp.int32)
                return qsym, mv, recon
            def inter():
                return inter_only(recon_prev, y)
            qsym, mv, recon = jax.lax.cond(t == 0, intra, inter)
        else:
            qsym, mv, recon = inter_only(recon_prev, y)
        return recon, (qsym, mv, recon)

    if use_scan:
        @jax.jit
        def run(frames):
            ts = jnp.arange(T, dtype=jnp.int32)
            _, out = jax.lax.scan(frame_step, jnp.zeros((H, W), jnp.float32), (ts, frames))
            return out
    else:
        @jax.jit
        def run(frames):
            outs = []
            recon_prev = jnp.zeros((H, W), jnp.float32)
            for t in range(T):
                recon_prev, o = frame_step(recon_prev, (jnp.int32(t), frames[t]))
                outs.append(o)
            return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    return run


if __name__ == "__main__":
    import sys
    pallas, cond, scan = (bool(int(x)) for x in sys.argv[1:4])
    f = make_gop(pallas, cond, scan)
    t0 = time.perf_counter()
    f(frames)
    jax.block_until_ready(f(frames))
    compile_t = time.perf_counter() - t0
    t = timeit(f, frames)
    print(f"pallas={pallas} cond={cond} scan={scan}: {t*1e3:8.1f} ms (compile {compile_t:.1f}s)", flush=True)
