"""Hostile-bytes fuzzing of every IVC1 payload parser.

The reference's decoders validate stream structure defensively
(``ivclab/entropy/zerorun.py:66-84`` raises on malformed block layouts);
the IVC1 parsers owe the same ethos at the container level: a truncated,
bit-flipped, or deliberately oversized-count blob must fail with a clean
``ValueError`` — never a ``struct.error``/numpy traceback, and never an
allocation driven by a wire-supplied count beyond the bytes present
(``runtime/container.py:_Reader``).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ivclab_tpu.runtime.container import (
    AdaptiveVideoPayload,
    IntraPayload,
    PFramePayload,
    VideoPayload,
)

# 32x32 -> 16 blocks/frame: the fused GOP packer's group math needs at
# least one full PACK_GROUP of blocks
_H = _W = 32


def _blobs():
    """One valid blob per payload kind, tiny content (built once)."""
    from ivclab_tpu.models import IntraCodec
    from ivclab_tpu.models.fastvideo import FusedVideoCodec
    from ivclab_tpu.models.videocodec import VideoCodec

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(_H, _W, 3)).astype(np.uint8)
    frames = rng.integers(0, 256, size=(3, _H, _W)).astype(np.float32)

    intra = IntraCodec(quantization_scale=1.0)
    intra.train_huffman_from_image(img)
    intra_blob = intra.encode_to_container(img)

    fused = FusedVideoCodec(quantization_scale=1.0)
    fused.train(frames[:2])
    gop_blob = fused.encode_to_container(frames)

    adaptive = VideoCodec(quantization_scale=1.0, codebook_policy="per-frame")
    adaptive_blob = adaptive.encode_to_container(frames)

    facade = VideoCodec(quantization_scale=1.0)
    facade.encode_decode(np.repeat(frames[0][..., None], 3, axis=-1), frame_num=0)
    _, pframe_blob, _ = facade.encode_decode(
        np.repeat(frames[1][..., None], 3, axis=-1), frame_num=1
    )

    return {
        "intra": (intra_blob, IntraPayload.from_bytes),
        "video_gop": (gop_blob, VideoPayload.from_bytes),
        "adaptive": (adaptive_blob, AdaptiveVideoPayload.from_bytes),
        "pframe": (pframe_blob, PFramePayload.from_bytes),
    }


@pytest.fixture(scope="module")
def blobs():
    return _blobs()


@pytest.mark.parametrize("kind", ["intra", "video_gop", "adaptive", "pframe"])
def test_valid_blob_parses(blobs, kind):
    blob, parse = blobs[kind]
    parse(blob)  # sanity: the uncorrupted blob is accepted


@pytest.mark.parametrize("kind", ["intra", "video_gop", "adaptive", "pframe"])
def test_truncations_raise_value_error(blobs, kind):
    blob, parse = blobs[kind]
    # every truncation length (stride 7 keeps the sweep dense but fast,
    # and the +/-1 edges around the full length are always included)
    lengths = set(range(0, len(blob), 7)) | {len(blob) - 1}
    for n in lengths:
        with pytest.raises(ValueError):
            parse(blob[:n])


@pytest.mark.parametrize("kind", ["intra", "video_gop", "adaptive", "pframe"])
def test_single_byte_flips_never_traceback(blobs, kind):
    """Any single-byte corruption either still parses (payload-word flips
    are the entropy decoder's job) or raises a clean ValueError."""
    blob, parse = blobs[kind]
    rng = np.random.default_rng(kind.__hash__() & 0xFFFF)
    positions = set(range(min(64, len(blob))))  # exhaustive over the header
    positions |= {int(p) for p in rng.integers(0, len(blob), size=256)}
    for pos in positions:
        for flip in (0xFF, 0x80, 0x01):
            mutated = bytearray(blob)
            mutated[pos] ^= flip
            try:
                parse(bytes(mutated))
            except ValueError:
                pass  # the only acceptable failure mode


@pytest.mark.parametrize("kind", ["intra", "video_gop", "adaptive", "pframe"])
def test_oversized_u32_counts_raise_value_error(blobs, kind):
    """Smash every aligned u32 in the structural region to huge values:
    wire-driven counts (codebook sizes, group counts, words_per_group,
    word totals) must be rejected before any allocation, not trusted."""
    blob, parse = blobs[kind]
    for off in range(8, min(len(blob) - 4, 160), 4):
        for val in (0xFFFFFFFF, 0x7FFFFFFF, 1 << 24):
            mutated = bytearray(blob)
            struct.pack_into("<I", mutated, off, val)
            try:
                parse(bytes(mutated))
            except ValueError:
                pass


def test_oversized_counts_do_not_allocate(blobs):
    """An oversized group count must fail the bounds check, not allocate:
    n_groups claims 2^31 groups but the buffer is tiny."""
    blob, parse = blobs["video_gop"]
    p = VideoPayload.from_bytes(blob)
    # locate the residual section header by re-serializing its prefix
    prefix = blob.find(p.residual.to_bytes()[:16])
    assert prefix > 0
    mutated = bytearray(blob)
    # GroupedSection header: <HIIQ> = group_size, wpg, n_groups, n_blocks
    struct.pack_into("<I", mutated, prefix + 6, 1 << 31)
    with pytest.raises(ValueError):
        parse(bytes(mutated))


def test_foreign_and_empty_buffers():
    for parse in (IntraPayload.from_bytes, VideoPayload.from_bytes,
                  AdaptiveVideoPayload.from_bytes, PFramePayload.from_bytes):
        with pytest.raises(ValueError):
            parse(b"")
        with pytest.raises(ValueError):
            parse(b"\x00" * 64)
        with pytest.raises(ValueError):
            parse(b"PNG\x89 not ours, definitely not an IVC1 container....")


def test_decode_frame_payload_rejects_short_and_foreign():
    from ivclab_tpu.models.videocodec import VideoCodec

    for bad in (b"", b"IV", b"IVC1\x00\x00", b"XXXXXXXXXXXX"):
        with pytest.raises(ValueError):
            VideoCodec.decode_frame_payload(bad)


def test_video_stream_file_truncations(tmp_path):
    """The IVCS stream framing rejects truncated/hostile length fields."""
    from ivclab_tpu.cli import read_video_stream, write_video_stream

    path = tmp_path / "s.ivc"
    write_video_stream(path, [b"A" * 40, b"B" * 17])
    assert [len(b) for b in read_video_stream(path)] == [40, 17]

    data = path.read_bytes()
    for n in list(range(0, len(data), 5)) + [len(data) - 1]:
        (tmp_path / "t.ivc").write_bytes(data[:n])
        try:
            read_video_stream(tmp_path / "t.ivc")
        except ValueError:
            pass
    # oversized GOP length field
    mutated = bytearray(data)
    struct.pack_into("<Q", mutated, 10, 1 << 60)
    (tmp_path / "u.ivc").write_bytes(bytes(mutated))
    with pytest.raises(ValueError):
        read_video_stream(tmp_path / "u.ivc")


def test_grouped_section_allocation_amplification_rejected():
    """A hostile (n_groups, wpg) pair with all-zero word counts passes the
    byte-level bounds checks but would materialize gigabytes; the decoder
    allocation cap must reject it."""
    from ivclab_tpu.runtime.container import GroupedSection, _Reader

    n_groups, wpg, gs = 2_000_000, 2048, 1
    head = struct.pack("<HIIQ", gs, wpg, n_groups, n_groups * gs)
    body = (
        head
        + b"\x00" * (4 * n_groups)   # gwc all zero
        + b"\x00" * (2 * n_groups)   # offsets
        + b"\x00" * (1 * n_groups)   # counts
    )
    with pytest.raises(ValueError, match="allocation cap"):
        GroupedSection.from_buffer(_Reader(memoryview(body)))
