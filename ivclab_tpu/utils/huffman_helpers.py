"""Residual-coding helpers (parity with the reference's ``my_utils``).

Reference: ``my_utils/huffman.py:10-48`` — train a Huffman coder on
3-pixel-predictor residuals (with chroma subsampling) and encode single or
multiple residual planes, reporting stream word counts. The per-value
Python histogram loop becomes a bincount.
"""

from __future__ import annotations

import numpy as np

from ivclab_tpu.entropy.huffman import HuffmanCoder
from ivclab_tpu.models.predictive import three_pixels_predictor


def train_huffman(img_rgb):
    """Huffman coder fit on 3-pixel-predictor residuals (subsampled chroma).

    Returns (coder, residual_Y, residual_CbCr).
    """
    residual_Y, residual_CbCr = three_pixels_predictor(img_rgb, subsample_color_channels=True)
    all_res = np.concatenate(
        [residual_Y.ravel(), residual_CbCr[:, :, 0].ravel(), residual_CbCr[:, :, 1].ravel()]
    ).astype(np.int64)
    min_val = int(all_res.min())
    max_val = int(all_res.max())
    hist = np.bincount(all_res - min_val, minlength=max_val - min_val + 1)
    pmf = hist / hist.sum()
    # the reference trains on the raw pmf (zeros rejected) — smooth only the
    # zero bins so every in-range symbol stays encodable
    pmf = np.where(pmf == 0, 1e-12, pmf)
    pmf = pmf / pmf.sum()
    coder = HuffmanCoder(lower_bound=min_val).train(pmf)
    return coder, residual_Y, residual_CbCr


def huffman_encoding(message, encoder: HuffmanCoder):
    """Encode one residual plane or a list of planes.

    Single plane -> (words, bitrate, stream_bits, shape);
    list -> (streams, bitrates, total_stream_bits, shapes).
    ``stream_bits`` counts 32 bits per emitted u32 word
    (my_utils/huffman.py:42).
    """
    if isinstance(message, list):
        streams, bitrates, shapes = [], [], []
        total_bits = 0
        for plane in message:
            words, bitrate = encoder.encode(np.asarray(plane).ravel())
            streams.append(words)
            bitrates.append(bitrate)
            total_bits += words.size * 32
            shapes.append(np.asarray(plane).shape)
        return streams, bitrates, total_bits, shapes
    words, bitrate = encoder.encode(np.asarray(message).ravel())
    return words, bitrate, words.size * 32, np.asarray(message).shape
