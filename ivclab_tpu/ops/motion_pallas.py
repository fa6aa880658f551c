"""Full-search block motion estimation as a Pallas TPU kernel.

The XLA scan formulation (``ivclab_tpu/ops/motion.py``) re-reads the full
reference frame once per candidate displacement — 81 HBM passes for
search_range 4. This kernel holds the padded reference and a column panel
of the current frame in VMEM and evaluates every candidate with full
on-chip reuse: HBM traffic drops to one read of each frame.

Grid: one step per column panel. Per step the 81 (dy, dx) candidates are a
fully unrolled compile-time loop of static-slice + subtract + square +
blockwise reduction on the VPU, with a running (min SSD, argmin) pair kept
in registers. Bounds masking reproduces the reference's out-of-bounds
candidate skip (ivclab/video/motion.py:39-42), and strict-< updates keep
the reference's first-in-scan-order tie-breaking, so motion fields are
bit-identical to the XLA and reference-oracle searches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _me_kernel(ref_ref, cur_ref, out_ref, *, sr, block, panel_w, H, W):
    p = pl.program_id(0)
    hb = H // block
    pwb = panel_w // block

    cur = cur_ref[:, :]  # [H, panel_w]
    col0 = p * panel_w

    by = jax.lax.broadcasted_iota(jnp.int32, (hb, pwb), 0) * block
    bx = jax.lax.broadcasted_iota(jnp.int32, (hb, pwb), 1) * block + col0

    best_ssd = jnp.full((hb, pwb), jnp.inf, dtype=jnp.float32)
    best_idx = jnp.zeros((hb, pwb), dtype=jnp.int32)

    for dy in range(-sr, sr + 1):
        for dx in range(-sr, sr + 1):
            # ref is padded by sr on all sides; candidate window start:
            ref_win = ref_ref[
                pl.ds(sr + dy, H), pl.ds(pl.multiple_of(col0 + sr + dx, 1), panel_w)
            ]
            diff = cur - ref_win
            ssd = (diff * diff).reshape(hb, block, pwb, block).sum(axis=(1, 3))
            valid = (
                (by + dy >= 0)
                & (by + dy + block <= H)
                & (bx + dx >= 0)
                & (bx + dx + block <= W)
            )
            ssd = jnp.where(valid, ssd, jnp.inf)
            idx = (dy + sr) * (2 * sr + 1) + (dx + sr)
            take = ssd < best_ssd
            best_ssd = jnp.where(take, ssd, best_ssd)
            best_idx = jnp.where(take, idx, best_idx)

    out_ref[:, :] = best_idx


@partial(jax.jit, static_argnames=("search_range", "block", "interpret"))
def motion_search_pallas(ref_image, image, search_range: int = 4, block: int = 8, interpret: bool = False):
    """Pallas full-search ME; drop-in for :func:`ops.motion.motion_search`."""
    sr = search_range
    ref = jnp.asarray(ref_image, dtype=jnp.float32)
    cur = jnp.asarray(image, dtype=jnp.float32)
    H, W = cur.shape

    # pick a panel width that divides W, is a multiple of the block size,
    # and keeps the cur panel comfortably inside VMEM
    panel_w = W
    for cand in (512, 384, 256, 128, 64):
        if W % cand == 0 and cand >= block:
            panel_w = cand
            break
    n_panels = W // panel_w

    ref_pad = jnp.pad(ref, ((sr, sr), (sr, sr)))

    kernel = partial(
        _me_kernel, sr=sr, block=block, panel_w=panel_w, H=H, W=W
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_panels,),
        in_specs=[
            # full padded reference resident in VMEM across all panels
            pl.BlockSpec((H + 2 * sr, W + 2 * sr), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, panel_w), lambda p: (0, p), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (H // block, panel_w // block), lambda p: (0, p), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H // block, W // block), jnp.int32),
        interpret=interpret,
    )(ref_pad, cur)
    return out
