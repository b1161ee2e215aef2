"""Tracing / profiling utilities (SURVEY.md §5: the reference has no
first-party telemetry beyond W&B; here profiling is built in).

- `trace(logdir)`: context manager around `jax.profiler` producing a
  TensorBoard-loadable trace of device execution;
- `StageTimer`: lightweight named-stage wall/device timing with
  block_until_ready fencing, for pipeline stage attribution;
- `annotate`: TraceAnnotation wrapper so pipeline stages show up named in
  profiler timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler timelines (no-op cost when not tracing)."""
    return jax.profiler.TraceAnnotation(name)


class _StageHandle:
    """Collects the arrays a timed block produces, to fence at block exit."""

    def __init__(self):
        self._fences = []

    def fence(self, x):
        """Registers `x` (array or pytree) for block_until_ready at stage
        exit and returns it unchanged — wrap the block's jit outputs."""
        self._fences.append(x)
        return x


class StageTimer:
    """Accumulates wall time per named stage, fencing device async dispatch.

    jit calls return before the device finishes, so a stage must register
    its OUTPUTS for fencing — timing the dispatch alone reports ~nothing
    (CLAUDE.md rule 3). Usage:

        timer = StageTimer()
        with timer.stage('warp') as s:
            crops = s.fence(warp(...))   # fenced at block exit
        ...
        print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        handle = _StageHandle()
        start = time.perf_counter()
        try:
            yield handle
        finally:
            for x in handle._fences:
                jax.block_until_ready(x)
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f'{name}: {total * 1000:.2f} ms total, '
                         f'{total / n * 1000:.3f} ms/call ({n} calls)')
        return '\n'.join(lines)
