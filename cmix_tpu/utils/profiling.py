"""Profiling / tracing / metrics: greenfield aux subsystem (SURVEY.md §5).

The reference's only observability is a stderr progress ticker and a
final wall-clock printf (src/runner.cpp:111-115,318-327).  Here:

* ``trace(dir)``: context manager around jax.profiler for device traces
  viewable in xprof/tensorboard (`--profile DIR` on the CLI).
* ``Meter``: per-segment throughput/latency accounting with device-time
  split (compile vs execute), cross-entropy accumulation, and a one-line
  JSON report -- the shape bench.py emits.
* ``progress``: the reference-style percentage ticker, rate-limited.
"""

import contextlib
import json
import sys
import time


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace (no-op when log_dir is falsy)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Meter:
    """Accumulates per-phase wall time + processed bytes.

    phases: 'compile' (first segment call), 'device' (later segment
    calls), 'host' (container/IO).  Report: MB/s overall and device-only.
    """

    def __init__(self):
        self.t = {}
        self.bytes = 0
        self.out_bytes = 0
        self._open = None
        self._t0 = None
        self.segments = 0

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.t[name] = self.t.get(name, 0.0) + time.perf_counter() - t0

    def add_segment(self, n_bytes):
        self.segments += 1
        self.bytes += n_bytes

    def report(self, extra=None):
        total = sum(self.t.values())
        dev = self.t.get("device", 0.0)
        r = {
            "bytes": self.bytes,
            "out_bytes": self.out_bytes,
            "segments": self.segments,
            "wall_s": round(total, 3),
            "phases_s": {k: round(v, 3) for k, v in self.t.items()},
            "mb_s": round(self.bytes / max(total, 1e-9) / 2**20, 5),
            "device_mb_s": round(self.bytes / max(dev, 1e-9) / 2**20, 5),
        }
        if self.bytes and self.out_bytes:
            r["bpb"] = round(8.0 * self.out_bytes / self.bytes, 4)
        if extra:
            r.update(extra)
        return r

    def print_report(self, **extra):
        print(json.dumps(self.report(extra or None)), file=sys.stderr,
              flush=True)


class Progress:
    """Rate-limited progress ticker (cf. runner.cpp:111-115)."""

    def __init__(self, total, label="progress", interval=0.5):
        self.total = max(total, 1)
        self.label = label
        self.interval = interval
        self._last = 0.0

    def update(self, done):
        now = time.time()
        if now - self._last >= self.interval or done >= self.total:
            self._last = now
            pct = 100.0 * done / self.total
            print(f"\r{self.label}: {pct:.2f}%", end="",
                  file=sys.stderr, flush=True)
            if done >= self.total:
                print(file=sys.stderr)
