"""Scaling benchmark: frames/s vs device count on the virtual CPU mesh.

BASELINE.md targets >= 80% frames/s scaling efficiency from 1 to 2 hosts.
Real multi-chip hardware is not available in this environment (one TPU chip
behind a tunnel), so this harness measures the *sharded program* — the full
distributed codec of ``ivclab_tpu.parallel.video.build_sharded_video_codec``
(halo motion search, per-shard entropy packing, psum reductions) — on
1/2/4/8 virtual CPU devices (``xla_force_host_platform_device_count``).

Weak scaling on the ``gop`` axis: each device owns one GOP of ``gop_len``
frames, so per-device work is constant and ideal wall time is flat; the
reported efficiency is ``fps(N) / (N * fps(1))``.

Caveat recorded in the output: virtual CPU devices share this host's
physical cores (2 here), so beyond n_devices == n_cores the measurement is
core-contention-bound, not communication-bound — the collectives in this
program (two sr-row ppermutes per P-frame + one scalar psum per frame, a
few KB per GOP vs ~MB of band compute) are the quantity the 2-host target
actually stresses, and they are orders of magnitude below the compute.

Each device count runs in a fresh subprocess (the device count must be
fixed before JAX initializes). Results land in SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

GOP_LEN = 4
H, W = 256, 384
ITERS = 3


def child(n_devices: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ivclab_tpu.models.fastvideo import FusedVideoCodec
    from ivclab_tpu.parallel.mesh import make_mesh
    from ivclab_tpu.parallel.video import build_sharded_video_codec, shard_frames
    from ivclab_tpu.utils import fixtures

    mesh = make_mesh(n_gop=n_devices, n_tile=1, devices=jax.devices()[:n_devices])
    T = n_devices * GOP_LEN
    frames = fixtures.video("scaling", num_frames=T, shape=(H, W))
    y = np.ascontiguousarray(frames.astype(np.float32).mean(axis=-1))

    codec = FusedVideoCodec(quantization_scale=1.0).train(y[:2])
    qs, _, _, _ = codec.encode_gop(y[:GOP_LEN])
    codec.pack_gop(qs)  # establish the pack buckets
    cap, bw, gw = codec._buckets

    step = build_sharded_video_codec(
        mesh, codec, gop_len=GOP_LEN, band_h=H, width=W,
        cap=cap, group_words=gw, block_words=bw,
    )
    frames_dev = shard_frames(y, mesh)
    out = step(frames_dev)  # compile + warmup
    jax.block_until_ready(out.words)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(frames_dev)
    jax.block_until_ready(out.words)
    dt = time.perf_counter() - t0

    fps = T * ITERS / dt
    print(json.dumps({"n_devices": n_devices, "fps": fps, "frames": T, "iters": ITERS}))


def main() -> None:
    results = []
    for n in (1, 2, 4, 8):
        proc = subprocess.run(
            [sys.executable, __file__, "--child", str(n)],
            capture_output=True, text=True, timeout=1200,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if proc.returncode != 0 or not line.startswith("{"):
            sys.stderr.write(proc.stderr[-2000:])
            raise RuntimeError(f"child n={n} failed")
        results.append(json.loads(line))

    base = results[0]["fps"]
    for r in results:
        r["efficiency"] = round(r["fps"] / (r["n_devices"] * base), 3)

    n_cores = os.cpu_count() or 1
    eff2 = next(r["efficiency"] for r in results if r["n_devices"] == 2)
    report = {
        "metric": f"weak-scaling frames/s, gop axis, {W}x{H} q=1.0 full sharded codec",
        "unit": "fps",
        "host_cores": n_cores,
        "baseline_target": "efficiency >= 0.8 at 2 devices (BASELINE.md 2-host target)",
        "results": results,
        "efficiency_at_2": eff2,
        "analysis": (
            "Virtual CPU devices time-share this host's physical cores "
            f"(n_cores={n_cores}), so efficiency beyond n_devices==n_cores measures "
            "core contention, not the codec's communication overhead. The sharded "
            "program's collectives are two search_range-row ppermutes per P-frame "
            "plus one scalar psum per frame (~KB per GOP) against ~MB of per-band "
            "transform/pack compute, i.e. a sub-1% communication fraction on real "
            "ICI/DCN; the gop axis additionally shares nothing frame-to-frame. "
            "The 1->2 device point is the meaningful proxy for the 2-host target "
            "on this 2-core host."
        ),
    }
    with open(os.path.join(os.path.dirname(__file__) or ".", "SCALING.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "metric": report["metric"], "value": eff2, "unit": "efficiency@2dev",
        "vs_baseline": round(eff2 / 0.8, 3),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
