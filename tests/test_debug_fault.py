"""Sanitizer layer + fault-injection/resume tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from ivclab_tpu.runtime.debug import assert_finite, assert_in_range, checked
from ivclab_tpu.runtime.checkpoint import GopCheckpointer


def test_checked_passes():
    fn = checked(lambda x: assert_finite(x * 2, "x"))
    out = fn(jnp.ones(4))
    assert np.allclose(np.asarray(out), 2.0)


def test_checked_catches_nonfinite():
    fn = checked(lambda x: assert_finite(jnp.log(x), "logx"))
    with pytest.raises(Exception, match="non-finite"):
        fn(jnp.zeros(4) - 1.0)


def test_range_check():
    fn = checked(lambda x: assert_in_range(x, 0, 10, "sym"))
    fn(jnp.arange(10))
    with pytest.raises(Exception, match="outside"):
        fn(jnp.arange(12))


def test_fault_injection_resume(tmp_path, foreman):
    """Kill the run after GOP 0; a fresh codec resumes and completes."""
    from ivclab_tpu.models import VideoCodec

    frames = foreman[:4]
    ck = GopCheckpointer(tmp_path)

    codec = VideoCodec(quantization_scale=2.0)
    # simulate: first run completes GOP 0 then dies
    gop0 = []
    for t in range(2):
        recon, _, b = codec.encode_decode(frames[t], frame_num=t)
        gop0.append(recon)
    ck.save_gop(0, b"", np.stack(gop0), np.array([1, 1]))
    assert ck.resume_plan(2) == [1]

    # second run (fresh process) completes everything
    codec2 = VideoCodec(quantization_scale=2.0)
    recons, bits = codec2.encode_decode_sequence_checkpointed(frames, 2, ck)
    assert recons.shape == frames.shape
    assert ck.resume_plan(2) == []
    assert (bits > 0).all()
    # GOP 0 came from the checkpoint (bits were stored as the sentinel 1s)
    assert bits[0] == 1 and bits[1] == 1
    # cached recons are the real first-run outputs
    assert np.array_equal(recons[0], gop0[0])


def test_heartbeat_monitor_detects_drop():
    from ivclab_tpu.runtime.elastic import HeartbeatMonitor

    t = [0.0]
    mon = HeartbeatMonitor(hosts=[0, 1, 2, 3], timeout_s=5.0, clock=lambda: t[0])
    t[0] = 3.0
    mon.report(0); mon.report(1); mon.report(3)
    assert mon.dead_hosts() == []
    t[0] = 7.0  # host 2 last seen at 0.0 -> dead; others at 3.0 -> alive
    assert mon.dead_hosts() == [2]
    assert sorted(mon.alive_hosts()) == [0, 1, 3]
    mon.report(2)  # host rejoins
    assert mon.dead_hosts() == []


def test_simulated_host_drop_recovery(foreman):
    """Fault injection (SURVEY.md §5): drop one GOP-owning host from a
    sharded encode; the survivor re-encodes only that GOP and the repaired
    stream decodes identically to the unbroken run."""
    import numpy as np

    from ivclab_tpu.models.fastvideo import FusedVideoCodec
    from ivclab_tpu.runtime.elastic import reencode_missing_gops

    gop_len = 2
    y = foreman[:6, :96, :128].astype(np.float32).mean(axis=-1)
    codec = FusedVideoCodec(quantization_scale=1.0).train(y[:2])

    full = [codec.encode_to_container(y[g * gop_len:(g + 1) * gop_len]) for g in range(3)]
    # host owning GOP 1 dies mid-run
    broken = [full[0], None, full[2]]
    repaired = reencode_missing_gops(codec, y, broken, gop_len)
    assert repaired[1] == full[1]  # bit-identical recovery
    for g in range(3):
        recons, ok = FusedVideoCodec.decode_from_container(repaired[g])
        ref, _ = FusedVideoCodec.decode_from_container(full[g])
        assert bool(ok)
        assert np.array_equal(np.asarray(recons), np.asarray(ref))
