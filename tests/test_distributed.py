"""Multi-process distributed runtime: ``init_distributed`` executes for real.

SURVEY.md §5 'Distributed communication backend': two OS processes bring
up ``jax.distributed.initialize`` through the environment variables
``init_distributed`` reads, build a (gop, tile) mesh whose tile axis
crosses the process boundary, run the sharded codec step (ppermute halo
motion search + psum rate reduction + per-shard entropy packing across
processes), and the host-0-assembled bitstream must match the
single-process encode word for word.
"""

from __future__ import annotations

import json
import os
import socket
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ivclab_tpu.models.fastvideo import FusedVideoCodec
from ivclab_tpu.utils import fixtures

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _golden_payloads():
    """Single-process per-GOP encode -> (container bytes, pack buckets)."""
    frames = fixtures.video("dist", num_frames=4, shape=(64, 64))
    y = np.ascontiguousarray(frames.astype(np.float32).mean(axis=-1))
    codec = FusedVideoCodec(quantization_scale=1.0).train(y[:2])
    payloads = []
    for g in range(2):
        chunk = jnp.asarray(y[g * 2:(g + 1) * 2])
        qs, mvs, _, _ = codec.encode_gop(chunk)
        p = codec.pack_gop(qs)
        payloads.append(codec.container_from_packed(p, mvs, (2, 64, 64)))
    return payloads, codec._buckets


def test_init_distributed_two_processes(tmp_path):
    golden, (cap, bw, gw) = _golden_payloads()
    out = tmp_path / "dist_payloads.bin"
    port = _free_port()

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            PYTHONPATH=os.pathsep.join(
                filter(None, [str(REPO), env.get("PYTHONPATH", "")])
            ),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "distributed_worker.py"),
                 str(out), str(cap), str(bw), str(gw)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{stdout[-4000:]}"
        assert f"WORKER_OK {pid}" in stdout

    data = out.read_bytes()
    (hlen,) = struct.unpack_from("<I", data, 0)
    head = json.loads(data[4 : 4 + hlen])
    assert head == {"processes": 2, "devices": 4, "gops": 2}
    off = 4 + hlen
    for g in range(2):
        (ln,) = struct.unpack_from("<Q", data, off)
        off += 8
        blob = data[off : off + ln]
        off += ln
        # the distributed 2-process stream IS the single-process stream
        assert blob == golden[g], f"GOP {g} bytes differ"
        recons, ok = FusedVideoCodec.decode_from_container(blob)
        assert bool(ok)
    assert off == len(data)
