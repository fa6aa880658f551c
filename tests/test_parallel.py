"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivclab_tpu.models.fastvideo import FusedVideoCodec
from ivclab_tpu.ops.motion import motion_compensate, motion_search
from ivclab_tpu.parallel import (
    build_sharded_video_encoder,
    make_mesh,
    shard_frames,
)
from ivclab_tpu.utils import calc_psnr


def test_mesh_factorization():
    mesh = make_mesh()
    assert mesh.shape["gop"] * mesh.shape["tile"] == len(jax.devices())


def test_halo_motion_matches_global(rng):
    """Tile-sharded ME with ppermute halos == single-device dense search."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ivclab_tpu.parallel.halo import exchange_row_halo, motion_search_tile

    mesh = make_mesh(n_gop=2, n_tile=4)
    n_tile = 4
    H, W, sr = 64, 48, 4
    band = H // n_tile
    ref = (rng.random((H, W)) * 255).astype(np.float32)
    cur = np.roll(ref, (3, -2), axis=(0, 1)).astype(np.float32)
    cur += rng.normal(0, 0.5, cur.shape).astype(np.float32)

    def shard_fn(ref_t, cur_t):
        row0 = jax.lax.axis_index("tile").astype(jnp.int32) * band
        ext = exchange_row_halo(ref_t, sr, "tile")
        return motion_search_tile(ext, cur_t, row0, H, sr)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("tile"), P("tile")),
        out_specs=P("tile"),
        check_vma=False,
    )
    mv_sharded = np.asarray(jax.jit(fn)(ref, cur))
    mv_global = np.asarray(motion_search(ref, cur, sr))
    assert np.array_equal(mv_sharded, mv_global)


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    recon, nsym = out
    assert recon.shape == (64, 64, 3)
    assert int(nsym) > 0


def test_sharded_encoder_monotone_bits(foreman):
    """The sharded encoder's P-frames must be cheaper than I-frames."""
    mesh = make_mesh(n_gop=2, n_tile=4)
    y = foreman[:4].astype(np.float32).mean(axis=-1)  # [4, 288, 352] gray
    band_h = 288 // 4
    step = build_sharded_video_encoder(
        mesh, gop_len=2, band_h=band_h, width=352, quantization_scale=1.0
    )
    frames = shard_frames(y, mesh)
    recons, bits = step(frames)
    bits = np.asarray(bits)
    assert bits.shape == (4,)
    # frames 0, 2 are I-frames of their GOPs; 1, 3 are P-frames
    assert bits[1] < bits[0]
    assert bits[3] < bits[2]
    assert float(calc_psnr(y[1], np.asarray(recons[1]))) > 28.0


def test_sharded_codec_bitstream_matches_fused(foreman):
    """Distributed entropy coding (SURVEY §7.6): the (gop x tile)-sharded
    encode+pack must be bit-identical to the single-device fused pack on
    the same frames, and the assembled container must decode from bytes
    alone to the encoder reconstruction."""
    from ivclab_tpu.parallel import (
        assemble_video_payloads,
        build_sharded_video_codec,
    )

    gop_len, n_tile = 2, 4
    mesh = make_mesh(n_gop=2, n_tile=n_tile)
    # crop so each band's block count is a multiple of PACK_GROUP
    y = foreman[:4, :256, :352].astype(np.float32).mean(axis=-1)
    T, H, W = y.shape
    band_h = H // n_tile
    codec = FusedVideoCodec(quantization_scale=1.0).train(y[:2])

    # single-device reference per GOP (also establishes the pack buckets)
    refs = []
    for g in range(2):
        qs, mvs, _, recons = codec.encode_gop(jnp.asarray(y[g * 2:(g + 1) * 2]))
        refs.append((codec.pack_gop(qs), mvs, recons))
    cap, bw, gw = codec._buckets

    step = build_sharded_video_codec(
        mesh, codec, gop_len, band_h, W, cap=cap, group_words=gw, block_words=bw
    )
    out = step(shard_frames(y, mesh))

    for g, (p, mvs, recons) in enumerate(refs):
        sl = slice(g * gop_len, (g + 1) * gop_len)
        assert np.array_equal(np.asarray(out.mvs[sl]), np.asarray(mvs))
        assert np.array_equal(np.asarray(out.recons[sl]), np.asarray(recons))
        assert np.array_equal(np.asarray(out.counts[sl]), np.asarray(p.counts))
        assert np.array_equal(np.asarray(out.offsets[sl]), np.asarray(p.offsets))
        assert np.array_equal(np.asarray(out.group_bits[sl]), np.asarray(p.group_bits))
        assert np.array_equal(np.asarray(out.totals[sl]), np.asarray(p.totals))
        # the headline claim: the gathered multi-device stream is the
        # single-device stream, word for word
        assert np.array_equal(np.asarray(out.words[sl]), np.asarray(p.words))

    # host-0 assembly -> self-contained bytes -> fresh decode
    payloads = assemble_video_payloads(codec, out, gop_len)
    for g, blob in enumerate(payloads):
        recons, ok = FusedVideoCodec.decode_from_container(blob)
        assert bool(ok)
        sl = slice(g * gop_len, (g + 1) * gop_len)
        assert np.abs(np.asarray(recons) - np.asarray(out.recons[sl])).max() < 1e-2


def test_sharded_codec_pallas_me_bit_identical(foreman):
    """The sharded path dispatches the halo-aware Pallas ME kernel
    (VERDICT r3 #4): with me_backend='pallas-interpret' the full sharded
    encode+pack emits streams bit-identical to the XLA-scan build."""
    from ivclab_tpu.parallel import build_sharded_video_codec
    from ivclab_tpu.parallel.video import _resolve_me_backend

    gop_len, n_tile = 2, 4
    mesh = make_mesh(n_gop=2, n_tile=n_tile)
    # W = 256 is 128-aligned (the Pallas lane-panel requirement)
    y = foreman[:4, :256, :256].astype(np.float32).mean(axis=-1)
    T, H, W = y.shape
    band_h = H // n_tile
    codec = FusedVideoCodec(quantization_scale=1.0).train(y[:2])
    qs, _, _, _ = codec.encode_gop(jnp.asarray(y))
    codec.pack_gop(qs)
    cap, bw, gw = codec._buckets

    kw = dict(cap=cap, group_words=gw, block_words=bw)
    step_scan = build_sharded_video_codec(
        mesh, codec, gop_len, band_h, W, me_backend="scan", **kw
    )
    step_pal = build_sharded_video_codec(
        mesh, codec, gop_len, band_h, W, me_backend="pallas-interpret", **kw
    )
    frames = shard_frames(y, mesh)
    a = step_scan(frames)
    b = step_pal(frames)
    assert np.array_equal(np.asarray(a.mvs), np.asarray(b.mvs))
    assert np.array_equal(np.asarray(a.words), np.asarray(b.words))
    assert np.array_equal(np.asarray(a.offsets), np.asarray(b.offsets))
    assert np.array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert np.array_equal(np.asarray(a.recons), np.asarray(b.recons))

    # the auto rule resolves to the scan on CPU and validates its inputs
    assert _resolve_me_backend(None, band_h, W, 4) == "scan"
    with pytest.raises(ValueError):
        _resolve_me_backend("bogus", band_h, W, 4)


def test_fused_video_codec_roundtrip(foreman):
    y = foreman[:4].astype(np.float32).mean(axis=-1)
    codec = FusedVideoCodec(quantization_scale=1.0).train(y[:2])
    recons, bits, ok, enc_recons = codec.encode_decode_gop(y)
    assert bool(ok)
    # decoder output must equal the encoder's closed-loop reconstruction
    assert np.abs(np.asarray(recons) - np.asarray(enc_recons)).max() < 1e-2
    for t in range(4):
        assert float(calc_psnr(y[t], np.asarray(recons[t]))) > 28.0
    assert int(bits[1]) < int(bits[0])


def test_fused_matches_facade_rate(foreman):
    """Fused codec rate should be in the same ballpark as the facade
    (same transform, same codebook family)."""
    from ivclab_tpu.models import VideoCodec

    y = foreman[:3].astype(np.float32).mean(axis=-1)
    fused = FusedVideoCodec(quantization_scale=1.0).train(y[:2])
    _, bits_fused, _, _ = fused.encode_decode_gop(y)

    facade = VideoCodec(quantization_scale=1.0, codebook_policy="first-p-frame")
    bits_facade = []
    for t in range(3):
        rgb = np.repeat(y[t][..., None], 3, axis=-1)
        _, _, b = facade.encode_decode(rgb, frame_num=t)
        bits_facade.append(b)
    total_fused = float(np.sum(np.asarray(bits_fused)))
    total_facade = float(np.sum(bits_facade))
    assert 0.5 < total_fused / total_facade < 2.0


@pytest.mark.parametrize("policy", ["per-frame", "adaptive"])
def test_sharded_adaptive_container_matches_single_device(foreman, policy):
    """VERDICT r4 item 3: per-frame codebooks under the (gop, tile) mesh.

    The sharded adaptive encoder (per-frame histograms psum-reduced over
    tiles, host tree builds, per-shard packing) must produce
    AdaptiveVideoPayload bytes IDENTICAL to the single-device
    ``VideoCodec.encode_to_container`` on the same frames — and the blobs
    must decode from bytes alone to the same reconstructions.
    """
    from ivclab_tpu.models.videocodec import VideoCodec
    from ivclab_tpu.parallel.video import ShardedAdaptiveEncoder

    gop_len, n_tile = 3, 4
    mesh = make_mesh(n_gop=2, n_tile=n_tile)
    # crop so each band's block count is a multiple of PACK_GROUP
    y = foreman[: 2 * gop_len, :256, :352].astype(np.float32).mean(axis=-1)
    T, H, W = y.shape
    band_h = H // n_tile

    enc = ShardedAdaptiveEncoder(
        mesh, gop_len, band_h, W, quantization_scale=1.0, codebook_policy=policy
    )
    blobs = enc.encode(y)
    assert len(blobs) == 2

    for g in range(2):
        chunk = y[g * gop_len : (g + 1) * gop_len]
        ref_blob = VideoCodec(
            quantization_scale=1.0, codebook_policy=policy
        ).encode_to_container(chunk)
        assert blobs[g] == ref_blob  # byte-for-byte
        recons = VideoCodec.decode_from_container(blobs[g])
        ref_recons = VideoCodec.decode_from_container(ref_blob)
        assert np.array_equal(recons, ref_recons)


def test_sharded_adaptive_pack_fallback_byte_identical(foreman, monkeypatch):
    """Forcing the sharded adaptive encoder's speculative pack buckets to
    overflow must route through the full-stride fallback with identical
    container bytes."""
    import ivclab_tpu.ops.transform as tf
    from ivclab_tpu.parallel.video import ShardedAdaptiveEncoder

    gop_len, n_tile = 2, 4
    mesh = make_mesh(n_gop=2, n_tile=n_tile)
    y = foreman[:4, :256, :352].astype(np.float32).mean(axis=-1)
    band_h = y.shape[1] // n_tile

    want = ShardedAdaptiveEncoder(mesh, gop_len, band_h, y.shape[2]).encode(y)
    monkeypatch.setattr(tf, "ADAPTIVE_WPG", 8)
    monkeypatch.setattr(tf, "ADAPTIVE_BW", 2)
    enc = ShardedAdaptiveEncoder(mesh, gop_len, band_h, y.shape[2])
    got = enc.encode(y)
    assert enc._phase2_full is not None  # the fallback actually ran
    assert got == want
