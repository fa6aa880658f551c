"""Benchmark: 1080p hybrid video encode+decode throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

The workload is the BASELINE.md headline: full hybrid coding of a 1080p
sequence — motion search, motion compensation, fused DCT+quant, zero-run,
canonical Huffman pack, parallel entropy decode, inverse transform, MC
reconstruction chain — through the fused device GOP pipeline
(``ivclab_tpu.models.fastvideo``). The baseline is real-time 30 fps at the
same resolution (BASELINE.json: ">= 30 fps 1080p on one v5e chip"), so
``vs_baseline = fps / 30``.

Env knobs: IVC_BENCH_H/W/FRAMES/ITERS/Q (defaults 1088/1920/8/3/1.0).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time


def _tpu_alive(timeout_s: int = 90) -> bool:
    """Probe device init with an alarm — the TPU tunnel can hang."""

    class _Timeout(Exception):
        pass

    def _raise(*_):
        raise _Timeout

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(timeout_s)
    try:
        import jax

        jax.devices()
        return True
    except Exception:
        return False
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main():
    H = int(os.environ.get("IVC_BENCH_H", 1088))
    W = int(os.environ.get("IVC_BENCH_W", 1920))
    T = int(os.environ.get("IVC_BENCH_FRAMES", 8))
    iters = int(os.environ.get("IVC_BENCH_ITERS", 3))
    q = float(os.environ.get("IVC_BENCH_Q", 1.0))

    if not _tpu_alive():
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    # persistent compile cache: repeat runs skip the ~30s warmup compiles
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/ivclab_jaxcache"),
    )

    from ivclab_tpu.models.fastvideo import FusedVideoCodec
    from ivclab_tpu.utils import fixtures

    frames = fixtures.video("bench", num_frames=T, shape=(H, W))
    y = np.ascontiguousarray(frames.astype(np.float32).mean(axis=-1))

    from ivclab_tpu.runtime.trace import StageTimer

    codec = FusedVideoCodec(quantization_scale=q)
    codec.train(y[:2])

    dev_y = jax.device_put(y)

    def roundtrip(timer=None):
        """One GOP encode->pack->decode. With a timer, each stage blocks
        (honest per-stage wall time). Without one, every phase is
        dispatched back-to-back with ZERO host syncs — the tunnel round
        trip (~26 ms here) otherwise serializes ahead of device compute
        (~117 ms/GOP) three times per GOP; bucket adequacy rides along as
        the device bool ``p.ok`` checked at the caller's sync point.
        """
        blocking = timer is not None
        t = timer or StageTimer(enabled=False)
        with t.stage("encode"):
            qsyms, mvs, mv_bits, enc_recons = codec.encode_gop(dev_y)
            if blocking:
                jax.block_until_ready(qsyms)
        with t.stage("pack"):
            p = codec.pack_gop(qsyms, check=blocking)
            if blocking:
                jax.block_until_ready(p.words)
        with t.stage("decode"):
            recons, ok = codec.decode_gop(
                p.words, p.offsets, p.counts, mvs, H, W, p.block_words, p.cap
            )
            if blocking:
                jax.block_until_ready(recons)
        return recons, p.totals + mv_bits, ok, enc_recons, p

    # warmup / compile + correctness check
    recons, bits, ok, enc_recons, p = roundtrip(StageTimer(enabled=False))
    recons.block_until_ready()
    assert bool(ok), "entropy decode failed"
    err = float(abs(np.asarray(recons) - np.asarray(enc_recons)).max())
    assert err < 1e-2, f"decoder mismatch: {err}"

    # instrumented blocking pass: per-stage wall times (not in the timed loop)
    timer = StageTimer(annotate=False)
    roundtrip(timer)

    t0 = time.perf_counter()
    all_ok = None
    for _ in range(iters):
        recons, bits, ok, _, p = roundtrip()
        # accumulate device-side so no iteration's flags are discarded
        it_ok = ok if p.ok is None else ok & p.ok
        all_ok = it_ok if all_ok is None else all_ok & it_ok
    recons.block_until_ready()
    dt = time.perf_counter() - t0
    assert bool(all_ok), "entropy decode / pack buckets failed in timed loop"

    pixels = H * W * T * iters
    mpix_per_s = pixels / dt / 1e6
    fps = pixels / (H * W) / dt
    baseline_mpix = H * W * 30 / 1e6  # 30 fps real-time at this resolution

    print(
        json.dumps(
            {
                "metric": f"encode+decode {W}x{H} hybrid video throughput (1 chip, q={q})",
                "value": round(mpix_per_s, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_per_s / baseline_mpix, 3),
                "detail": {
                    "fps": round(fps, 2),
                    "frames": T,
                    "iters": iters,
                    "mean_bpp": round(float(np.mean(np.asarray(bits))) / (H * W), 4),
                    "backend": jax.default_backend(),
                    # per-stage wall times from the instrumented blocking
                    # pass; the timed loop itself runs sync-free
                    "stages_ms_per_gop": {
                        name: round(1000 * timer.totals[name], 1)
                        for name in sorted(timer.totals)
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
