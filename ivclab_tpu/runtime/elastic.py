"""Failure detection + elastic recovery for distributed encoding.

The reference has no failure handling (SURVEY.md §5): a crash loses the
run. Here the GOP independence property — every GOP opens with an I-frame,
so no coding state crosses GOP boundaries (``parallel/mesh.py``) — makes
recovery exact and local: a lost host invalidates only its own GOPs, which
any surviving host re-encodes bit-identically.

Two pieces:

- :class:`HeartbeatMonitor` — host liveness bookkeeping for a driver loop.
  On a real pod the heartbeats ride ``jax.distributed`` (each process
  reports after its GOP step); the monitor itself is transport-agnostic so
  tests can drive it directly.
- :func:`reencode_missing_gops` — fill holes in a per-GOP payload list by
  re-encoding just the missing GOPs through the single-device fused codec.
  Because the distributed pack is bit-identical to the fused pack
  (``tests/test_parallel.py``), recovered payloads equal what the lost
  host would have produced.
"""

from __future__ import annotations

import time


class HeartbeatMonitor:
    """Tracks per-host liveness from periodic heartbeat reports."""

    def __init__(self, hosts, timeout_s: float = 30.0, clock=time.monotonic):
        self.timeout_s = float(timeout_s)
        self._clock = clock
        now = clock()
        self._last_seen = {h: now for h in hosts}

    def report(self, host) -> None:
        """Record a heartbeat from ``host`` (unknown hosts auto-register)."""
        self._last_seen[host] = self._clock()

    def dead_hosts(self) -> list:
        """Hosts whose last heartbeat is older than the timeout."""
        now = self._clock()
        return [h for h, t in self._last_seen.items() if now - t > self.timeout_s]

    def alive_hosts(self) -> list:
        now = self._clock()
        return [h for h, t in self._last_seen.items() if now - t <= self.timeout_s]


def reencode_missing_gops(codec, frames_y, payloads, gop_len: int) -> list:
    """Replace ``None`` holes in a per-GOP payload list by re-encoding.

    ``frames_y``: the full ``[T, H, W]`` luma stack (T = len(payloads) *
    gop_len); ``payloads``: per-GOP container bytes with ``None`` where a
    host was lost. Returns the completed list. Only the missing GOPs are
    re-encoded — the recovery cost is proportional to the failure, not the
    job (SURVEY.md §5 'Failure detection').
    """
    import numpy as np

    frames_y = np.asarray(frames_y)
    out = list(payloads)
    for g, blob in enumerate(out):
        if blob is not None:
            continue
        chunk = frames_y[g * gop_len : (g + 1) * gop_len]
        out[g] = codec.encode_to_container(chunk)
    return out
