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

Measurement design (VERDICT r3 'make the bench honest'):
- the headline is the median of IVC_BENCH_REPEATS sync-free timed loops
  (each dispatches IVC_BENCH_ITERS GOP round trips back-to-back and blocks
  once), with every repeat's throughput reported so run-to-run variance is
  visible;
- per-stage attribution comes from amortized per-phase loops (N dispatches
  of one phase, one sync, time/N) — not from single blocking calls, which
  bundle the ~26 ms TPU-tunnel round trip into every stage and made the
  r3 stage sum contradict the headline 6x;
- PSNR-Y and mean bpp quantify the quality half of the "30 fps at
  reference PSNR/bpp" claim.

Env knobs: IVC_BENCH_H/W/FRAMES/ITERS/REPEATS/Q (1088/1920/8/3/3/1.0).
"""

from __future__ import annotations

import json
import os
import signal
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
    repeats = int(os.environ.get("IVC_BENCH_REPEATS", 3))
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

    codec = FusedVideoCodec(quantization_scale=q)
    codec.train(y[:2])

    dev_y = jax.device_put(y)

    def roundtrip():
        """One GOP encode->pack->decode, every phase dispatched
        back-to-back with ZERO host syncs — the tunnel round trip (~26 ms
        here) otherwise serializes ahead of device compute three times per
        GOP; bucket adequacy rides along as the device bool ``p.ok``
        checked at the caller's sync point.
        """
        qsyms, mvs, mv_bits, enc_recons = codec.encode_gop(dev_y)
        p = codec.pack_gop(qsyms, check=False)
        recons, ok = codec.decode_gop(
            p.words, p.offsets, p.counts, mvs, H, W, p.block_words, p.cap
        )
        return recons, p.totals + mv_bits, ok, enc_recons, p, qsyms, mvs

    # warmup / compile + correctness + quality (PSNR-Y of the decoded
    # frames against the source — the quality half of the headline claim)
    codec.pack_gop(codec.encode_gop(dev_y)[0])  # establish sticky buckets
    recons, bits, ok, enc_recons, p, qsyms_w, mvs_w = roundtrip()
    recons.block_until_ready()
    assert bool(ok) and bool(p.ok), "entropy decode / pack buckets failed"
    err = float(abs(np.asarray(recons) - np.asarray(enc_recons)).max())
    assert err < 1e-2, f"decoder mismatch: {err}"
    rec_np = np.asarray(recons)
    mse = np.mean((rec_np - y) ** 2, axis=(1, 2))
    psnr_y = float(np.mean(20 * np.log10(255.0 / np.sqrt(np.maximum(mse, 1e-12)))))
    # fail loudly if throughput ever comes at the cost of quality: ~31 dB
    # is this content's q=1.0 operating point (reference-parity transform)
    assert psnr_y > 28.0, f"PSNR-Y collapsed: {psnr_y:.2f} dB"

    # one untimed loop to warm allocator/tunnel state; the first timed
    # repeat still reads ~2x slow (tunnel-side effect — persists through
    # buffer-drain experiments), which is why every repeat is reported
    # and the median is the headline
    for _ in range(iters):
        recons, *_ = roundtrip()
    recons.block_until_ready()

    # timed loops: `repeats` independent sync-free loops of `iters` GOPs;
    # median is the headline, every repeat is reported (variance is real:
    # r2->r3 recorded-vs-rerun spread was ~12%)
    repeat_dts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        all_ok = None
        for _ in range(iters):
            recons, bits, ok, _, p, _, _ = roundtrip()
            # accumulate device-side so no iteration's flags are discarded
            it_ok = ok if p.ok is None else ok & p.ok
            all_ok = it_ok if all_ok is None else all_ok & it_ok
        recons.block_until_ready()
        repeat_dts.append(time.perf_counter() - t0)
        assert bool(all_ok), "entropy decode / pack buckets failed in timed loop"

    gop_pixels = H * W * T
    reps_mpix = sorted(gop_pixels * iters / dt / 1e6 for dt in repeat_dts)
    mpix_per_s = float(np.median(reps_mpix))
    fps = mpix_per_s * 1e6 / (H * W)
    baseline_mpix = H * W * 30 / 1e6  # 30 fps real-time at this resolution

    # per-stage attribution: amortized per-phase loops (N dispatches, ONE
    # sync, time/N) so no stage carries the blocking tunnel round trip
    def timed_phase(fn, n=iters):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        return 1000 * (time.perf_counter() - t0) / n

    stages = {
        "encode": timed_phase(lambda: codec.encode_gop(dev_y)[0]),
        "pack": timed_phase(lambda: codec.pack_gop(qsyms_w, check=False).words),
        "decode": timed_phase(
            lambda: codec.decode_gop(
                p.words, p.offsets, p.counts, mvs_w, H, W, p.block_words, p.cap
            )[0]
        ),
    }
    gop_ms = float(np.median(repeat_dts)) * 1000 / iters

    # optional xprof capture of one sync-free loop (view with tensorboard)
    trace_dir = os.environ.get("IVC_BENCH_TRACE")
    if trace_dir:
        from ivclab_tpu.runtime.trace import device_trace

        with device_trace(trace_dir):
            for _ in range(iters):
                recons, *_ = roundtrip()
            recons.block_until_ready()

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
                    "repeats": repeats,
                    "repeats_mpix_per_s": [round(v, 2) for v in reps_mpix],
                    "psnr_y_db": round(psnr_y, 2),
                    "mean_bpp": round(float(np.mean(np.asarray(bits))) / (H * W), 4),
                    "backend": jax.default_backend(),
                    "gop_ms": round(gop_ms, 1),
                    # amortized per-phase device-loop times; their sum
                    # should track gop_ms (no tunnel latency per stage)
                    "stages_ms_per_gop_amortized": {
                        k: round(v, 1) for k, v in stages.items()
                    },
                    "stage_sum_ms": round(sum(stages.values()), 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
