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


def write_video(filepath: str, frames, fps: int = 10) -> str:
    """Export RGB frames ``[T, H, W, 3]`` u8 to a video file.

    Reference parity: the ch4 driver's cv2 mp4 export
    (``exercises/ch4/E4-1.py:416-424``). Backends are probed in order
    (cv2, imageio); when neither is installed (this environment ships
    none) the frames are written as numbered PNGs next to the target with
    the same stem — the lossless fallback — and the frame directory is
    returned.
    """
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = np.clip(np.round(frames), 0, 255).astype(np.uint8)
    try:
        import cv2

        H, W = frames.shape[1:3]
        out = cv2.VideoWriter(
            filepath, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H)
        )
        if out.isOpened():  # codec/container mismatches fail silently
            # otherwise — every write() becomes a no-op and the caller
            # gets a zero-byte file reported as success
            for frame in frames:
                out.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            out.release()
            return filepath
        out.release()
    except ImportError:
        pass
    try:
        import imageio

        imageio.mimwrite(filepath, list(frames), fps=fps)
        return filepath
    except ImportError:
        pass
    from pathlib import Path

    p = Path(filepath)
    outdir = p.with_suffix("")
    outdir.mkdir(parents=True, exist_ok=True)
    for t, frame in enumerate(frames):
        imwrite(str(outdir / f"frame{t:04d}.png"), frame)
    return str(outdir)


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
