"""Image file I/O and display.

Reference parity: ``ivclab/utils/io.py:5-22`` (imread/imshow), plus imwrite.
PIL handles the container formats; matplotlib import is deferred so headless
pipelines never pay for it.
"""

from __future__ import annotations

import numpy as np


def imread(filepath: str) -> np.ndarray:
    from PIL import Image

    with Image.open(filepath) as data:
        return np.asarray(data)


def imwrite(filepath: str, img) -> None:
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(np.round(arr), 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(filepath)


def imshow(ax, img, title=None, hide_ticks: bool = True):
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        ax.imshow(arr[..., 0], cmap="gray")
    elif arr.ndim == 2:
        ax.imshow(arr, cmap="gray")
    else:
        ax.imshow(arr)
    if title is not None:
        ax.set_title(title)
    if hide_ticks:
        ax.set_xticks([])
        ax.set_yticks([])
    return ax
