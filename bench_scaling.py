"""Scaling benchmark: throughput vs device count on the virtual CPU mesh.

BASELINE.md targets >= 80% frames/s scaling efficiency from 1 to 2 hosts.
Real multi-chip hardware is not available in this environment (one TPU chip
behind a tunnel), so this harness measures the *sharded program* — the full
distributed codec of ``ivclab_tpu.parallel.video.build_sharded_video_codec``
(halo motion search, per-shard entropy packing, psum reductions) — on
1/2/4/8 virtual CPU devices (``xla_force_host_platform_device_count``),
weak-scaling BOTH mesh axes:

- ``gop`` axis: each device owns one GOP of ``GOP_LEN`` frames
  (embarrassingly parallel; no frame-to-frame sharing);
- ``tile`` axis: each device owns one 1080p row band (136 x 1920 — at 8
  devices the frame is exactly 1920x1088), exercising the per-P-frame
  ppermute halo exchange and psum rate reduction across devices.

Per-device work is constant along each sweep, so ideal wall time is flat
and efficiency is ``throughput(N) / (N * throughput(1))`` in pixels/s.
The tile sweep pins the pack buckets to one generous static size so every
device count runs the identical per-band program (content-adaptive
buckets would confound the scaling signal).

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
import shutil
import subprocess
import sys
import time

GOP_LEN = 4
H, W = 256, 384
ITERS = 3
REPEATS = 6  # best-of-N timed loops per point (host contention noise on
             # the 2-core host swings single runs by >15%)

# tile sweep: one 1080p row band per device (8 devices = 1920x1088)
TILE_BAND_H, TILE_W = 136, 1920
TILE_GOP_LEN = 2
# static pack buckets spanning every device count's content (see module
# docstring); adequacy is asserted per run
TILE_CAP, TILE_BW, TILE_GW = 64, 36, 576


def _setup_devices(n_devices: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def child_gop(n_devices: int) -> None:
    jax = _setup_devices(n_devices)
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

    dts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = step(frames_dev)
        jax.block_until_ready(out.words)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)  # best-of: shields against transient host contention

    print(json.dumps({
        "n_devices": n_devices,
        "fps": T * ITERS / dt,
        "mpix_per_s": T * H * W * ITERS / dt / 1e6,
        "repeats_mpix_per_s": [round(T * H * W * ITERS / d / 1e6, 3) for d in dts],
        "frames": T, "iters": ITERS,
    }))


def child_tile(n_devices: int) -> None:
    jax = _setup_devices(n_devices)
    import numpy as np

    from ivclab_tpu.models.fastvideo import FusedVideoCodec
    from ivclab_tpu.parallel.mesh import make_mesh
    from ivclab_tpu.parallel.video import build_sharded_video_codec, shard_frames
    from ivclab_tpu.utils import fixtures

    mesh = make_mesh(n_gop=1, n_tile=n_devices, devices=jax.devices()[:n_devices])
    Hf = TILE_BAND_H * n_devices
    frames = fixtures.video("scaling-tile", num_frames=TILE_GOP_LEN, shape=(Hf, TILE_W))
    y = np.ascontiguousarray(frames.astype(np.float32).mean(axis=-1))

    codec = FusedVideoCodec(quantization_scale=1.0).train(y[:2])
    step = build_sharded_video_codec(
        mesh, codec, gop_len=TILE_GOP_LEN, band_h=TILE_BAND_H, width=TILE_W,
        cap=TILE_CAP, group_words=TILE_GW, block_words=TILE_BW,
    )
    frames_dev = shard_frames(y, mesh)
    out = step(frames_dev)  # compile + warmup
    jax.block_until_ready(out.words)
    # static-bucket adequacy: every block's symbols fit, no group overflow
    assert int(np.asarray(out.counts).max()) <= TILE_CAP
    assert int((np.asarray(out.group_bits).max() + 31) // 32) <= TILE_GW

    dts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = step(frames_dev)
        jax.block_until_ready(out.words)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)

    print(json.dumps({
        "n_devices": n_devices,
        "fps": TILE_GOP_LEN * ITERS / dt,
        "mpix_per_s": TILE_GOP_LEN * Hf * TILE_W * ITERS / dt / 1e6,
        "repeats_mpix_per_s": [
            round(TILE_GOP_LEN * Hf * TILE_W * ITERS / d / 1e6, 3) for d in dts
        ],
        "frame": [Hf, TILE_W], "iters": ITERS,
        "collective_census": _collective_census(step, frames_dev) if n_devices > 1 else [],
    }))


def _collective_census(step, frames_dev) -> list:
    """Collective instructions of the COMPILED sharded program, with their
    operand shapes and per-execution payload bytes — measured from the HLO,
    not asserted. Each entry: [op, shape, bytes]."""
    import re

    txt = step.lower(frames_dev).compile().as_text()
    out = []
    for m in re.finditer(
        r"=\s*(\w+)\[([\d,]*)\]\S*\s+(collective-permute|all-reduce)\(", txt
    ):
        dtype, dims, op = m.group(1), m.group(2), m.group(3)
        itemsize = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                    "bf16": 2, "pred": 1}.get(dtype, 4)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append([op, f"{dtype}[{dims}]", n * itemsize])
    return out


def comm_model() -> dict:
    """Exact per-device collective payload bytes per GOP for the tile-axis
    sharded codec, computed from shapes (VERDICT r4 item 4).

    Per P-frame, ``exchange_row_halo`` sends the top and bottom
    ``search_range`` reconstruction rows to each ring neighbor (two
    ppermutes of ``sr x W`` f32), and the per-frame rate reduction psums
    one i32 scalar. The compute side is modeled as HBM traffic: the band
    pipeline makes ~9 full passes over the band per frame (ME window
    reads, dense MC accumulate, DCT/quant read+write, zero-run + code map,
    grouped pack read+write) at 4 B/px.
    """
    sr = 4
    p_frames = TILE_GOP_LEN - 1
    halo = 2 * sr * TILE_W * 4 * p_frames
    psum = TILE_GOP_LEN * 4
    comm_total = halo + psum
    band_bytes = TILE_BAND_H * TILE_W * 4
    compute_passes = 9
    compute_total = compute_passes * band_bytes * TILE_GOP_LEN
    return {
        "per_device_per_gop": {
            "halo_ppermute_bytes": halo,
            "psum_payload_bytes": psum,
            "total_comm_bytes": comm_total,
        },
        "compute_hbm_bytes_model": compute_total,
        "comm_fraction_model": round(comm_total / (comm_total + compute_total), 5),
        "assumptions": (
            f"search_range=4 halos, {TILE_GOP_LEN}-frame GOP, one "
            f"{TILE_BAND_H}x{TILE_W} f32 band per device; compute side = "
            f"{compute_passes} HBM passes over the band per frame (ME/MC/"
            "DCT/quant/zero-run/pack). Collective shapes cross-checked "
            "against the compiled HLO census in tile_axis.results."
        ),
    }


def _run_sweep(mode: str, counts=(1, 2, 4, 8)):
    """Each device count in a fresh subprocess, CPU-affinity-pinned to
    min(n, n_cores) cores: a single XLA CPU device otherwise spreads its
    intra-op thread pool over every host core, making the '1-device'
    baseline already multi-core and silently deflating every efficiency
    (observed: unpinned tile-axis throughput was flat at ~2 Mpix/s for
    all N because each point was the same 2 cores)."""
    n_cores = os.cpu_count() or 1
    have_taskset = shutil.which("taskset") is not None
    if not have_taskset:
        sys.stderr.write(
            "warning: taskset not found; children run unpinned — efficiency "
            "numbers will overstate the 1-device baseline's core budget\n"
        )
    results = []
    for n in counts:
        cores = f"0-{min(n, n_cores) - 1}" if min(n, n_cores) > 1 else "0"
        pin = ["taskset", "-c", cores] if have_taskset else []
        # two independent child invocations, keep the faster: between-run
        # contention on this shared 2-core host only ever slows a point,
        # so best-of is the consistent estimator for every device count
        best = None
        for _ in range(2):
            proc = subprocess.run(
                pin + [sys.executable, __file__, f"--child-{mode}", str(n)],
                capture_output=True, text=True, timeout=1200,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            if proc.returncode != 0 or not line.startswith("{"):
                sys.stderr.write(proc.stderr[-2000:])
                raise RuntimeError(f"child {mode} n={n} failed")
            r = json.loads(line)
            if best is None or r["mpix_per_s"] > best["mpix_per_s"]:
                best = r
        results.append(best)
    base = results[0]["mpix_per_s"]
    for r in results:
        r["efficiency"] = round(r["mpix_per_s"] / (r["n_devices"] * base), 3)
    return results


def main() -> None:
    gop_results = _run_sweep("gop")
    tile_results = _run_sweep("tile")

    n_cores = os.cpu_count() or 1
    eff2 = next(r["efficiency"] for r in gop_results if r["n_devices"] == 2)
    eff2_tile = next(r["efficiency"] for r in tile_results if r["n_devices"] == 2)
    report = {
        "metric": "weak-scaling pixel throughput, full sharded codec, q=1.0",
        "unit": "Mpix/s",
        "host_cores": n_cores,
        "baseline_target": "efficiency >= 0.8 at 2 devices (BASELINE.md 2-host target)",
        "gop_axis": {
            "config": f"{W}x{H}, {GOP_LEN}-frame GOP per device",
            "results": gop_results,
            "efficiency_at_2": eff2,
        },
        "tile_axis": {
            "config": (
                f"one {TILE_W}x{TILE_BAND_H} row band per device "
                f"(8 devices = 1920x{TILE_BAND_H * 8} — the 1080p bench frame), "
                f"{TILE_GOP_LEN}-frame GOP, static pack buckets "
                f"cap={TILE_CAP}/bw={TILE_BW}/gw={TILE_GW}"
            ),
            "results": tile_results,
            "efficiency_at_2": eff2_tile,
        },
        "comm_model": comm_model(),
    }
    cm = report["comm_model"]["per_device_per_gop"]
    report["analysis"] = (
        "Virtual CPU devices time-share this host's physical cores "
        f"(n_cores={n_cores}), so efficiency beyond n_devices==n_cores measures "
        "core contention, not the codec's communication overhead. The sharded "
        f"program moves {cm['total_comm_bytes']} collective bytes per device "
        f"per GOP ({cm['halo_ppermute_bytes']} B of sr-row ppermute halos + "
        f"{cm['psum_payload_bytes']} B of psum scalars; shapes verified "
        "against the compiled HLO census in tile_axis.results) against "
        f"~{report['comm_model']['compute_hbm_bytes_model'] // 10**6} MB of "
        "modeled per-band HBM traffic — a communication fraction of "
        f"{report['comm_model']['comm_fraction_model']:.4%}. The gop axis "
        "additionally shares nothing frame-to-frame. The 1->2 device points "
        "are the meaningful proxies for the 2-host target on this 2-core host."
    )
    with open(os.path.join(os.path.dirname(__file__) or ".", "SCALING.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "metric": report["metric"],
        "value": eff2,
        "unit": "efficiency@2dev (gop axis; tile axis " + str(eff2_tile) + ")",
        "vs_baseline": round(eff2 / 0.8, 3),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child-gop":
        child_gop(int(sys.argv[2]))
    elif len(sys.argv) > 2 and sys.argv[1] == "--child-tile":
        child_tile(int(sys.argv[2]))
    elif len(sys.argv) > 2 and sys.argv[1] == "--child":  # back-compat
        child_gop(int(sys.argv[2]))
    else:
        main()
