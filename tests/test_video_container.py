"""Video bitstream container: file round-trips decode bit-for-bit.

The reference's video decoder reads motion vectors and symbol counts from
encoder state (``ivclab/video/videocodec.py:57-86``); these tests prove the
IVC1 video payload is self-contained — a fresh codec reconstructs the GOP
from bytes alone, bit-identically to the encoder's own reconstruction.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from ivclab_tpu.models.fastvideo import FusedVideoCodec
from ivclab_tpu.runtime.container import VideoPayload
from ivclab_tpu.utils import fixtures


@pytest.fixture(scope="module")
def small_video():
    frames = fixtures.video("container", num_frames=4, shape=(96, 128))
    return np.ascontiguousarray(frames.astype(np.float32).mean(axis=-1))


@pytest.fixture(scope="module")
def trained_codec(small_video):
    return FusedVideoCodec(quantization_scale=1.0).train(small_video[:2])


def test_container_roundtrip_bit_exact(small_video, trained_codec):
    enc_recons, bits, ok, _ = trained_codec.encode_decode_gop(small_video)
    assert bool(ok)
    blob = trained_codec.encode_to_container(small_video)
    # a FRESH codec, from bytes alone
    recons, ok2 = FusedVideoCodec.decode_from_container(blob)
    assert bool(ok2)
    np.testing.assert_array_equal(np.asarray(recons), np.asarray(enc_recons))


def test_container_fields(small_video, trained_codec):
    blob = trained_codec.encode_to_container(small_video)
    p = VideoPayload.from_bytes(blob)
    T, H, W = p.shape
    assert (T, H, W) == small_video.shape
    assert p.quantization_scale == pytest.approx(1.0)
    assert p.search_range == 4
    assert p.payload_bits > 0
    assert p.frame_bits.sum() <= p.payload_bits  # MV bits on top of residual
    assert p.frame_bits[0] > p.frame_bits[1:].min()  # I-frame is the big one
    assert p.container_bytes == len(blob)


def test_container_rate_accounting(small_video, trained_codec):
    """payload_bits equals the in-memory pipeline's exact rate."""
    import jax.numpy as jnp

    y = jnp.asarray(small_video)
    qsyms, mvs, mv_bits, _ = trained_codec.encode_gop(y)
    packed = trained_codec.pack_gop(qsyms)
    blob = trained_codec.encode_to_container(small_video)
    p = VideoPayload.from_bytes(blob)
    np.testing.assert_array_equal(
        p.frame_bits, np.asarray(packed.totals, dtype=np.uint64)
    )
    # container MV rate == encoder's mv-length accounting
    assert p.payload_bits - int(p.frame_bits.sum()) == int(np.asarray(mv_bits).sum())


def test_container_rejects_corruption(small_video, trained_codec):
    blob = bytearray(trained_codec.encode_to_container(small_video))
    blob[0] ^= 0xFF
    with pytest.raises(ValueError):
        VideoPayload.from_bytes(bytes(blob))


def test_cli_video_roundtrip(tmp_path, small_video):
    from ivclab_tpu import cli

    out = tmp_path / "seq.ivc"
    dec = tmp_path / "recon.npy"
    cli.main([
        "encode-video", "fixture:container", str(out),
        "--q", "1.0", "--frames", "4",
    ])
    assert out.exists() and out.stat().st_size > 0
    cli.main(["decode-video", str(out), str(dec)])
    recon = np.load(dec)
    assert recon.shape[0] == 4
    # CLI codes the BT.601 luma of the RGB fixture
    from ivclab_tpu.ops.color import rgb2ycbcr

    frames = fixtures.video("container", num_frames=4)
    yq = np.asarray(rgb2ycbcr(frames.astype(np.float32)))[..., 0]
    psnr = 10 * np.log10(255.0**2 / np.mean((recon.astype(np.float64) - yq) ** 2))
    assert psnr > 28.0


def test_cli_info_video(tmp_path, capsys):
    from ivclab_tpu import cli

    out = tmp_path / "seq.ivc"
    cli.main(["encode-video", "fixture:container", str(out), "--frames", "4"])
    capsys.readouterr()
    cli.main(["info", str(out)])
    report = json.loads(capsys.readouterr().out)
    assert report["kind"] == "video-stream"
    gop = report["gops"][0]
    assert len(gop["per_frame_bits"]) == 4
    assert gop["payload_bits"] >= sum(gop["per_frame_bits"])


def test_pack_gop_deferred_check_and_repack(small_video):
    """check=False packs with zero host syncs, carrying bucket adequacy as
    a device bool; a violation (content outgrew the sticky buckets) reads
    False and ``repack_gop`` recovers with identical streams."""
    import jax.numpy as jnp

    codec = FusedVideoCodec(quantization_scale=1.0).train(small_video[:2])
    y = jnp.asarray(small_video)
    qsyms, mvs, _, _ = codec.encode_gop(y)
    ref = codec.pack_gop(qsyms)             # picks + validates the buckets
    p = codec.pack_gop(qsyms, check=False)  # sticky speculative path
    assert p.ok is not None and bool(p.ok)
    np.testing.assert_array_equal(np.asarray(p.words), np.asarray(ref.words))
    np.testing.assert_array_equal(np.asarray(p.totals), np.asarray(ref.totals))

    # force a violation: shrink the sticky buckets below the content
    cap, bw, gw = codec._buckets
    from ivclab_tpu.models.fastvideo import GW_BUCKETS
    if GW_BUCKETS.index(gw) > 0:
        codec._buckets = (cap, bw, GW_BUCKETS[GW_BUCKETS.index(gw) - 1])
        bad = codec.pack_gop(qsyms, check=False)
        assert not bool(bad.ok)
        fixed = codec.repack_gop(qsyms)
        np.testing.assert_array_equal(np.asarray(fixed.words), np.asarray(ref.words))
    # check=True self-heals from the same violation
    codec._buckets = (cap, bw, GW_BUCKETS[0])
    healed = codec.pack_gop(qsyms)
    np.testing.assert_array_equal(np.asarray(healed.words), np.asarray(ref.words))
