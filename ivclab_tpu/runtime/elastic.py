"""Failure detection + elastic recovery for distributed encoding.

The reference has no failure handling (SURVEY.md §5): a crash loses the
run. Here the GOP independence property — every GOP opens with an I-frame,
so no coding state crosses GOP boundaries (``parallel/mesh.py``) — makes
recovery exact and local: a lost host invalidates only its own GOPs, which
any surviving host re-encodes bit-identically.

Two pieces:

- :class:`HeartbeatMonitor` — host liveness bookkeeping for a driver loop
  (transport-agnostic, directly drivable in tests), and
  :class:`DistributedHeartbeat` — the real transport riding the
  ``jax.distributed`` coordination-service key-value store (each process
  reports after its GOP step; polling never blocks on a dead peer).
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


class DistributedHeartbeat:
    """Heartbeats over the ``jax.distributed`` coordination service.

    The transport that wires :class:`HeartbeatMonitor` to a real runtime:
    after every GOP step each process overwrites a monotonically
    increasing sequence number under its key in the coordinator's
    key-value store (``DistributedRuntimeClient.key_value_set``), and any
    process can :meth:`poll` every peer's key without blocking — the KV
    store lives on the coordinator, so reads never hang on a dead peer
    the way collectives do. A peer whose sequence number stops advancing
    ages out of the monitor and lands in :meth:`dead_hosts`, at which
    point the driver re-encodes its GOPs via
    :func:`reencode_missing_gops`.

    Executed for real across two OS processes in
    ``tests/test_distributed.py`` (the same ``jax.distributed.initialize``
    bring-up a pod uses).
    """

    def __init__(self, monitor: HeartbeatMonitor | None = None,
                 prefix: str = "ivclab/heartbeat", client=None,
                 timeout_s: float = 30.0):
        import jax
        from jax._src import distributed

        if client is None:
            client = distributed.global_state.client
        if client is None:
            raise RuntimeError(
                "jax.distributed is not initialized (call "
                "ivclab_tpu.parallel.mesh.init_distributed first)"
            )
        self.client = client
        self.prefix = prefix
        self.process_id = jax.process_index()
        self.num_processes = jax.process_count()
        self.monitor = monitor or HeartbeatMonitor(
            range(self.num_processes), timeout_s=timeout_s
        )
        self._seq = 0
        self._seen: dict[int, int] = {}

    def report(self) -> int:
        """Publish this process's next heartbeat sequence number."""
        self._seq += 1
        self.client.key_value_set(
            f"{self.prefix}/{self.process_id}", str(self._seq), allow_overwrite=True
        )
        self.monitor.report(self.process_id)
        return self._seq

    def poll(self) -> dict:
        """Read every peer's stamp; advancing stamps refresh the monitor.

        Returns ``{process_id: last_seen_sequence}`` for the peers that
        have ever reported."""
        for p in range(self.num_processes):
            try:
                v = self.client.key_value_try_get(f"{self.prefix}/{p}")
            except Exception:
                continue  # peer has not reported yet
            seq = int(v)
            if self._seen.get(p) != seq:
                self._seen[p] = seq
                self.monitor.report(p)
        return dict(self._seen)

    def dead_hosts(self) -> list:
        return self.monitor.dead_hosts()

    def alive_hosts(self) -> list:
        return self.monitor.alive_hosts()


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
