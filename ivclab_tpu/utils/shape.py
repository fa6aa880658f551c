"""Block (un)patching and JPEG zig-zag reordering as pure layout transforms.

Reference parity: ``ivclab/utils/shape.py:4-65`` (ZigZag, Patcher). The
reference scatters through a hard-coded permutation table; here the zig-zag
permutation is *derived* from the anti-diagonal traversal rule and applied
as a static gather, which XLA folds into surrounding ops (and which the
fused transform kernels fold directly into the DCT matrix, see
``ivclab_tpu/ops/dct.py``).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def zigzag_scan_positions(n: int = 8) -> tuple[tuple[int, int], ...]:
    """(row, col) positions of an n x n block in JPEG zig-zag scan order.

    Standard JPEG traversal: walk anti-diagonals d = r + c from 0 to 2n-2;
    even diagonals run bottom-left -> top-right, odd ones top-right ->
    bottom-left.
    """
    positions = []
    for d in range(2 * n - 1):
        rng = range(max(0, d - n + 1), min(d, n - 1) + 1)
        rows = list(rng)[::-1] if d % 2 == 0 else list(rng)
        for r in rows:
            positions.append((r, d - r))
    return tuple(positions)


@functools.lru_cache(maxsize=None)
def zigzag_gather_indices(n: int = 8) -> np.ndarray:
    """Flat row-major indices such that ``flat[idx]`` is in scan order.

    ``zigzagged[k] = block.reshape(-1)[idx[k]]``.
    """
    return np.asarray([r * n + c for r, c in zigzag_scan_positions(n)], dtype=np.int32)


@functools.lru_cache(maxsize=None)
def zigzag_scatter_indices(n: int = 8) -> np.ndarray:
    """Inverse permutation: scan index of each row-major position.

    Equals the reference's ``ZigZag.zigzag_order`` table
    (``ivclab/utils/shape.py:10-19``), but derived rather than hard-coded.
    """
    gather = zigzag_gather_indices(n)
    inv = np.empty_like(gather)
    inv[gather] = np.arange(n * n, dtype=np.int32)
    return inv


class ZigZag:
    """Flattens ``[..., n, n]`` blocks into zig-zag-ordered ``[..., n*n]``.

    Matches ``ivclab/utils/shape.py:4-36`` but accepts any leading batch
    shape (the reference fixes ``[H_patch, W_patch, C, 8, 8]``).
    """

    def __init__(self, n: int = 8):
        self.n = n
        self._gather = jnp.asarray(zigzag_gather_indices(n))

    def flatten(self, patched_img):
        x = jnp.asarray(patched_img)
        flat = x.reshape(*x.shape[:-2], self.n * self.n)
        return flat[..., self._gather]

    def unflatten(self, zigzagged):
        z = jnp.asarray(zigzagged)
        flat = jnp.empty_like(z).at[..., self._gather].set(z)
        return flat.reshape(*z.shape[:-1], self.n, self.n)


class Patcher:
    """Image ``[H, W, C]`` <-> blocks ``[H/ph, W/pw, C, ph, pw]``.

    Matches ``ivclab/utils/shape.py:38-65``; implemented as a
    reshape+transpose (free under XLA layout assignment) instead of einops.
    """

    def __init__(self, window_size=(8, 8)):
        self.window_size = tuple(window_size)

    def patch(self, img):
        x = jnp.asarray(img)
        if x.ndim == 2:
            x = x[:, :, None]
        H, W, C = x.shape
        ph, pw = self.window_size
        if H % ph or W % pw:
            raise ValueError(f"image {H}x{W} not a multiple of window {self.window_size}")
        x = x.reshape(H // ph, ph, W // pw, pw, C)
        return x.transpose(0, 2, 4, 1, 3)

    def unpatch(self, patched_img):
        x = jnp.asarray(patched_img)
        hp, wp, C, ph, pw = x.shape
        return x.transpose(0, 3, 1, 4, 2).reshape(hp * ph, wp * pw, C)


def pad_to_block_multiple(img, block=(8, 8), mode: str = "edge"):
    """Pad ``[H, W, C]`` so H, W are multiples of the block size.

    Mirrors the edge-mode padding in ``ivclab/image/intracodec.py:55-63``.
    Returns (padded, (H, W)) with the original spatial shape for cropping.
    """
    x = jnp.asarray(img)
    H, W = x.shape[0], x.shape[1]
    ph = (-H) % block[0]
    pw = (-W) % block[1]
    if ph or pw:
        pad_width = [(0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 2)
        x = jnp.pad(x, pad_width, mode=mode)
    return x, (H, W)
