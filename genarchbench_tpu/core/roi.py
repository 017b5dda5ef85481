"""Region-of-interest (ROI) instrumentation.

TPU-native equivalent of the reference's 6-backend compile-time ROI idiom
(reference: chain/src/main.cpp:19-38,112-190 — VTune/perf/FAPP/DynamoRIO/
PWR/RAPL).  Here a single context manager provides:

  * wall-clock timing of the jitted region only (device work synchronized
    via `jax.block_until_ready` at exit),
  * optional `jax.profiler` trace capture (XPlane, viewable in XProf) —
    standing in for VTune/FAPP,
  * `jax.named_scope` annotation so kernels are findable in traces,
  * the per-kernel greppable stderr timing line the reference's harness
    `after_run` extracts (see BASELINE.md timing-line table).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Any, Optional

import jax


class ROITimer:
    """Times a region of device work; prints a reference-compatible line.

    Usage:
        roi = ROITimer("chain", timing_line="Time in kernel: {t:.2f} sec")
        with roi:
            out = jitted(x)
            roi.sync(out)          # block on device results inside the ROI
        roi.report()               # prints the timing line to stderr
    """

    def __init__(self, name: str, timing_line: str = "Kernel time: {t} sec",
                 trace_dir: Optional[str] = None):
        self.name = name
        self.timing_line = timing_line
        self.trace_dir = trace_dir or os.environ.get("GENARCH_TRACE_DIR")
        self.elapsed = 0.0
        self._t0 = None
        self._scope = None

    def __enter__(self):
        if self.trace_dir:
            jax.profiler.start_trace(self.trace_dir)
        self._scope = jax.named_scope(f"roi_{self.name}")
        self._scope.__enter__()
        self._t0 = time.perf_counter()
        return self

    def sync(self, *values: Any) -> None:
        """Block until device values are ready (call before leaving the ROI)."""
        for v in values:
            jax.block_until_ready(v)

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self._t0
        self._scope.__exit__(*exc)
        if self.trace_dir:
            jax.profiler.stop_trace()
        return False

    def report(self, file=None, **extra) -> None:
        line = self.timing_line.format(t=self.elapsed, **extra)
        print(line, file=file if file is not None else sys.stderr, flush=True)


@contextlib.contextmanager
def roi(name: str, timing_line: str = "Kernel time: {t} sec"):
    r = ROITimer(name, timing_line)
    with r:
        yield r
    r.report()
