"""Block motion estimation / compensation, data-parallel.

Reference parity: ``ivclab/video/motion.py:3-97`` (MotionCompensator).
The reference runs a triple-nested Python loop — (H/8)x(W/8) blocks x
(2*sr+1)^2 candidates x 8x8 SSD — the #1 hot loop (SURVEY.md §3.3).

Here the candidate loop is a ``lax.scan`` whose body evaluates ONE
displacement for EVERY block at once (full-frame subtract/square + blockwise
reduction on the VPU), carrying the running (min SSD, argmin) pair. Memory
stays O(frame), sequential depth is the candidate count (81 for sr=4), and
XLA fuses each step into a single pass over the frame. Candidate order and
the strict-< tie-breaking replicate the reference scan order exactly, so
motion fields match block for block.

Out-of-bounds candidates are masked per block (reference 'continue',
ivclab/video/motion.py:39-42). The packed index convention matches
``(dy + sr) * (2 sr + 1) + (dx + sr)`` (ivclab/video/motion.py:55).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("search_range", "block"))
def motion_search(ref_image, image, search_range: int = 4, block: int = 8):
    """Full-search block matching -> packed motion index grid.

    ref_image, image: ``[H, W]`` float32 (H, W multiples of ``block``)
    returns: ``[H/block, W/block]`` int32 packed indices
    """
    sr = search_range
    ref = jnp.asarray(ref_image, dtype=jnp.float32)
    cur = jnp.asarray(image, dtype=jnp.float32)
    H, W = cur.shape
    hb, wb = H // block, W // block

    dys, dxs = np.meshgrid(np.arange(-sr, sr + 1), np.arange(-sr, sr + 1), indexing="ij")
    candidates = jnp.asarray(np.stack([dys.ravel(), dxs.ravel()], axis=1), dtype=jnp.int32)

    by = jnp.arange(hb, dtype=jnp.int32) * block  # top row of each block
    bx = jnp.arange(wb, dtype=jnp.int32) * block

    cur_blocks = cur.reshape(hb, block, wb, block)

    def body(carry, cand):
        min_ssd, best = carry
        dy, dx = cand[0], cand[1]
        shifted = jnp.roll(ref, shift=(-dy, -dx), axis=(0, 1))
        diff = cur - shifted
        ssd = (diff * diff).reshape(hb, block, wb, block).sum(axis=(1, 3))
        valid_y = (by + dy >= 0) & (by + dy + block <= H)
        valid_x = (bx + dx >= 0) & (bx + dx + block <= W)
        valid = valid_y[:, None] & valid_x[None, :]
        ssd = jnp.where(valid, ssd, jnp.inf)
        idx = (dy + sr) * (2 * sr + 1) + (dx + sr)
        take = ssd < min_ssd  # strict: first candidate in scan order wins ties
        return (jnp.where(take, ssd, min_ssd), jnp.where(take, idx, best)), None

    init = (jnp.full((hb, wb), jnp.inf, dtype=jnp.float32), jnp.zeros((hb, wb), jnp.int32))
    (min_ssd, best), _ = jax.lax.scan(body, init, candidates)
    del min_ssd, cur_blocks
    return best


@partial(jax.jit, static_argnames=("search_range", "block"))
def motion_compensate(ref_image, motion_idx, search_range: int = 4, block: int = 8):
    """Displace ``block`` x ``block`` tiles of ``ref_image`` by the motion field.

    ref_image: ``[H, W]`` or ``[H, W, C]``; motion_idx: ``[H/block, W/block]``
    packed indices. Gather-based: per-pixel source coordinates are computed
    from the per-block displacement and clipped to the frame (the reference
    skips impossible out-of-bounds blocks, ivclab/video/motion.py:89-93).
    """
    sr = search_range
    ref = jnp.asarray(ref_image, dtype=jnp.float32)
    squeeze = ref.ndim == 2
    if squeeze:
        ref = ref[:, :, None]
    H, W, C = ref.shape
    total = 2 * sr + 1
    mv = jnp.asarray(motion_idx, dtype=jnp.int32)
    dy = mv // total - sr
    dx = mv % total - sr
    dy_pix = jnp.repeat(jnp.repeat(dy, block, axis=0), block, axis=1)
    dx_pix = jnp.repeat(jnp.repeat(dx, block, axis=0), block, axis=1)
    yy = jnp.clip(jnp.arange(H, dtype=jnp.int32)[:, None] + dy_pix, 0, H - 1)
    xx = jnp.clip(jnp.arange(W, dtype=jnp.int32)[None, :] + dx_pix, 0, W - 1)
    out = ref[yy, xx]
    return out[:, :, 0] if squeeze else out


class MotionCompensator:
    """Facade matching ``ivclab/video/motion.py`` (packed-index convention)."""

    def __init__(self, search_range: int = 4):
        self.search_range = int(search_range)

    def compute_motion_vector(self, ref_image, image):
        mv = motion_search(ref_image, image, self.search_range)
        return np.asarray(mv)[..., None].astype(int)

    def reconstruct_with_motion_vector(self, ref_image, motion_vector):
        mv = jnp.asarray(np.asarray(motion_vector)[..., 0], dtype=jnp.int32)
        return np.asarray(motion_compensate(ref_image, mv, self.search_range))


# Mosaic stack-allocates the unrolled candidate search's temporaries at
# up to ~1.44x the naive working-set model at the pinned 128-wide panel
# (hardware anchor: 1080p/sr=4 naive 11.2 MiB runs within the 16 MiB
# scoped-vmem limit; at wider panels the ratio grew to 2.2-2.7x and
# overflowed, which is why the panel is pinned). The dispatch rules admit
# a shape only when naive * the margin stays under the hardware limit.
_VMEM_LIMIT = 16 * 1024 * 1024
_VMEM_STACK_MARGIN = 1.44


def pallas_vmem_fits(H: int, W: int, search_range: int, budget: int | None = None) -> bool:
    """True when the Pallas ME kernel's per-panel working set fits VMEM.

    The kernel always runs the hardware-validated 128-wide panel (see
    ``motion_pallas.motion_search_pallas``): it holds the (2sr+1)-way
    column-shift stack of the padded reference plus the current panel in
    VMEM, double-buffered; the naive model is multiplied by the measured
    Mosaic stack margin (see ``_VMEM_STACK_MARGIN``). Widths that no
    128-multiple panel divides are rejected outright (their full-width
    fallback panels blew the limit on hardware: 22.06 MiB at a 384-wide
    panel on 256x384, 17.6 MiB at full-width 352).
    """
    if W % 128:
        return False
    # an explicit ``budget`` keeps the legacy naive-model semantics
    limit = _VMEM_LIMIT if budget is None else int(budget * _VMEM_STACK_MARGIN)
    panel_w = 128
    hp = -(-(H + 2 * search_range) // 8) * 8
    total = 2 * search_range + 1
    return (total * hp + H) * panel_w * 8 * _VMEM_STACK_MARGIN < limit


def pallas_tile_vmem_fits(band_h: int, W: int, search_range: int,
                          budget: int = 12 * 1024 * 1024) -> bool:
    """VMEM-fits rule for the halo-aware tile kernel (one sharded band).

    The tile kernel always runs the 128-wide panel (see
    ``motion_pallas.motion_search_tile_pallas``); the working-set model —
    column-shift stack of the halo-extended band plus the current panel,
    double-buffered — is multiplied by an empirical 2.2x factor for
    Mosaic's stack allocation of the unrolled search's per-candidate
    temporaries (measured: 17.67 MiB actual vs 8.1 MiB naive on a
    256-row band at a 384-wide panel).
    """
    if W % 128:
        return False
    panel_w = 128
    htp = -(-(band_h + 2 * search_range) // 8) * 8
    total = 2 * search_range + 1
    return (total * htp + band_h) * panel_w * 8 * 2.2 < budget


def motion_search_auto(ref_image, image, search_range: int = 4, block: int = 8):
    """Backend dispatcher: Pallas kernel on TPU (when the padded reference
    fits VMEM), XLA candidate scan elsewhere. Results are bit-identical."""
    import jax

    H, W = image.shape[-2], image.shape[-1]
    if jax.default_backend() == "tpu" and pallas_vmem_fits(H, W, search_range):
        from ivclab_tpu.ops.motion_pallas import motion_search_pallas

        return motion_search_pallas(ref_image, image, search_range, block)
    return motion_search(ref_image, image, search_range, block)


@partial(jax.jit, static_argnames=("search_range", "block"))
def motion_compensate_dense(ref_image, motion_idx, search_range: int = 4, block: int = 8):
    """Select-based MC: accumulate the 81 shifted references under the
    per-block motion masks. Replaces the per-pixel gather (TPU gathers are
    latency-bound) with candidate-count dense passes; bit-identical to
    :func:`motion_compensate` for in-bounds motion fields (the only fields
    the encoder emits).
    """
    sr = search_range
    ref = jnp.asarray(ref_image, dtype=jnp.float32)
    if ref.ndim != 2:
        raise ValueError("dense MC expects a single plane")
    H, W = ref.shape
    total = 2 * sr + 1
    mv = jnp.asarray(motion_idx, dtype=jnp.int32)
    mv_pix = jnp.repeat(jnp.repeat(mv, block, axis=0), block, axis=1)

    ref_pad = jnp.pad(ref, ((sr, sr), (sr, sr)))
    dys, dxs = np.meshgrid(np.arange(-sr, sr + 1), np.arange(-sr, sr + 1), indexing="ij")
    candidates = jnp.asarray(np.stack([dys.ravel(), dxs.ravel()], axis=1), dtype=jnp.int32)

    def body(acc, cand):
        dy, dx = cand[0], cand[1]
        idx = (dy + sr) * total + (dx + sr)
        shifted = jax.lax.dynamic_slice(ref_pad, (sr + dy, sr + dx), (H, W))
        return acc + jnp.where(mv_pix == idx, shifted, 0.0), None

    acc, _ = jax.lax.scan(body, jnp.zeros((H, W), jnp.float32), candidates)
    return acc
