"""Distribution plotting helpers.

Reference parity: ``ivclab/entropy/probability.py:71-138``
(plot_histogram, plot_image_and_joint_histogram). Redesigned for headless
use: figures are returned (and optionally saved) instead of ``plt.show``-n,
so they work in CI and batch pipelines; pass ``show=True`` for the
reference's interactive behavior.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    if matplotlib.get_backend().lower() not in ("agg", "module://matplotlib_inline.backend_inline"):
        try:
            import sys

            if not sys.stdout.isatty():
                matplotlib.use("Agg")
        except Exception:
            pass
    import matplotlib.pyplot as plt

    return plt


def plot_histogram(image, grayscale: bool = False, title: str | None = None,
                   save_path: str | None = None, show: bool = False):
    """Image + per-channel intensity histograms (one panel per channel).

    ``image`` is an array or a file path (the reference takes a path,
    ``ivclab/entropy/probability.py:71``). Returns the figure.
    """
    plt = _plt()
    if isinstance(image, str):
        from ivclab_tpu.utils.io import imread

        if title is None:
            title = image.rsplit("/", 1)[-1]
        image = imread(image)
    img = np.asarray(image)
    if grayscale and img.ndim == 3:
        from ivclab_tpu.ops.color import rgb2gray

        img = np.asarray(rgb2gray(img.astype(np.float32)))
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)

    gray = img.ndim == 2
    ncols = 2 if gray else 4
    fig, axes = plt.subplots(1, ncols, figsize=(18, 4))
    fig.suptitle(f"Histogram for {title}" if title else "Histogram")

    axes[0].imshow(img, cmap="gray" if gray else None)
    axes[0].set_axis_off()
    axes[0].set_title("Original Image")

    if gray:
        hist = np.bincount(img.reshape(-1), minlength=256)
        axes[1].bar(range(256), hist, color="gray")
        axes[1].set_title("Grayscale Histogram")
        axes[1].set_xlabel("Intensity")
        axes[1].set_ylabel("Frequency")
    else:
        for i, color in enumerate(("red", "green", "blue")):
            hist = np.bincount(img[:, :, i].reshape(-1), minlength=256)
            axes[i + 1].bar(range(256), hist, color=color)
            axes[i + 1].set_title(f"{color.upper()} Channel")
            axes[i + 1].set_xlabel("Intensity")
            axes[i + 1].set_ylabel("Frequency")

    fig.tight_layout()
    fig.subplots_adjust(top=0.85)
    if save_path:
        fig.savefig(save_path)
    if show:
        plt.show()
    return fig


def plot_image_and_joint_histogram(image, joint_pmf, title: str = "",
                                   to_gray: bool = False,
                                   save_path: str | None = None,
                                   show: bool = False):
    """Image beside its horizontal-pair joint pmf as a heat map.

    ``joint_pmf`` may be the flattened ``[B*B]`` pmf that
    :func:`ivclab_tpu.entropy.stats.stats_joint` returns, or an already
    square ``[B, B]`` matrix. Returns the figure.
    """
    plt = _plt()
    pmf = np.asarray(joint_pmf)
    if pmf.ndim == 1:
        b = int(round(np.sqrt(pmf.size)))
        pmf = pmf.reshape(b, b)

    fig, (ax_img, ax_joint) = plt.subplots(1, 2, figsize=(10, 4))
    ax_img.imshow(np.asarray(image), cmap=None if to_gray else "gray")
    ax_img.set_title(f"Original Image: {title}")
    ax_img.set_axis_off()

    im = ax_joint.imshow(pmf, cmap="hot", interpolation="nearest")
    ax_joint.set_title("Joint Histogram (horizontal pairs)")
    ax_joint.set_xlabel("Pixel i")
    ax_joint.set_ylabel("Pixel i+1")
    fig.colorbar(im, ax=ax_joint, label="Probability")

    fig.tight_layout()
    if save_path:
        fig.savefig(save_path)
    if show:
        plt.show()
    return fig
