"""Host-contention measurement protocol, shared by bench.py and
tools/bench_scaling.py.

The sandbox VM's CPU is oversubscribed in bursts by hypervisor
co-tenants (`steal%` reads 0 so vmstat cannot see it, yet identical
Spark jobs swing 12s→50s). Credible timings therefore need:

1. a **launch gate** — block until /proc/stat shows the host quiet
   BEFORE starting a timed attempt (pre-declared criterion, never a
   post-hoc exclusion of slow results);
2. a **heartbeat taint** — a fixed pure-Python arithmetic chunk sampled
   throughout the attempt; when co-tenant load pushes total demand past
   the physical cores, the scheduler stretches it. An attempt whose
   median chunk exceeds ``HB_TAINT_RATIO`` × the quiet-host baseline is
   flagged, so a slow number is distinguishable from a slow engine. The
   probe needs ≥1 spare physical core: callers must size Spark's task
   slots below the core count or the engine's own load stretches it;
3. **best-of-N clean attempts** — the reported figure is the minimum
   over attempts not flagged by (2), which is the engine's cost on
   quiet hardware.
"""

from __future__ import annotations

import statistics
import threading
import time


def host_busy_frac(sample_s: float = 1.5) -> float:
    """Whole-host busy fraction over a short /proc/stat sample."""
    def snap():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        idle = vals[3] + vals[4]  # idle + iowait
        return idle, sum(vals)
    i0, t0 = snap()
    time.sleep(sample_s)
    i1, t1 = snap()
    total = max(1, t1 - t0)
    return 1.0 - (i1 - i0) / total


def wait_quiet(busy_thresh: float = 0.12, max_wait_s: float = 900.0,
               sample_s: float = 1.5, poll_s: float = 15.0) -> float:
    """Block (untimed) until the host looks quiet, then return the
    observed pre-attempt busy fraction. Gating on a PRE-declared load
    criterion before STARTING an attempt — never on the attempt's
    result — keeps the protocol honest on an oversubscribed shared
    host."""
    deadline = time.time() + max_wait_s
    while True:
        busy = host_busy_frac(sample_s)
        if busy <= busy_thresh or time.time() > deadline:
            return busy
        time.sleep(poll_s)


#: attempt is clean iff median heartbeat chunk time <= this x quiet baseline
#: (baseline = MIN over a calibration run — the uncontended chunk time;
#: ambient scheduler jitter keeps a quiet-host median ~1.1x the min, so
#: 1.35 flags only real multi-second contention)
HB_TAINT_RATIO = 1.35


def hb_chunk(n: int = 250_000) -> float:
    """One fixed pure-Python integer-arithmetic chunk (~20-40ms). Its
    wall time is the probe: on an idle core it is constant; when
    co-tenant load pushes total demand past the physical cores, the
    scheduler stretches it."""
    t0 = time.perf_counter()
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return time.perf_counter() - t0


def hb_calibrate(chunks: int = 60) -> float:
    """Quiet-host baseline chunk time: the MIN of ``chunks`` samples —
    the uncontended hardware speed, stable across calibration windows
    where the median is not (ambient jitter)."""
    return min(hb_chunk() for _ in range(chunks))


class Heartbeat(threading.Thread):
    """Samples heartbeat chunks for the duration of one timed attempt."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.samples: list[float] = []
        self._halt = threading.Event()

    def run(self) -> None:
        while not self._halt.is_set():
            self.samples.append(hb_chunk())
            self._halt.wait(0.2)

    def finish(self) -> float | None:
        self._halt.set()
        self.join(timeout=2.0)
        return statistics.median(self.samples) if self.samples else None
