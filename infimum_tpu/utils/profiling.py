"""Timing / profiling harness for the proving pipeline.

The reference has no tracing (SURVEY.md §5: console.log progress only,
reference cli/__tests__/e2e.test.ts:111-127); production proving needs
stage-level latency attribution. This gives:

  - Stopwatch: nestable named stages with wall time + optional device sync,
    rendered as an ordered report or a JSON dict (bench.py consumes this).
  - trace(): context manager wrapping jax.profiler.trace when
    INFIMUM_PROFILE_DIR is set, so any run can emit a TensorBoard/Perfetto
    trace without code changes.

Device timing convention: TPU dispatch is async; a stage that launches
device work only measures enqueue time unless it ends with a sync. Pass
`sync=` a pytree (block_until_ready) or rely on host readbacks.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field


@dataclass
class Stage:
    name: str
    seconds: float
    depth: int


@dataclass
class Stopwatch:
    stages: list[Stage] = field(default_factory=list)
    _depth: int = 0

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Time a named stage; `sync` is an optional pytree to block on
        before stopping the clock (forces queued device work to finish)."""
        t0 = time.perf_counter()
        self._depth += 1
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self._depth -= 1
            self.stages.append(
                Stage(name, time.perf_counter() - t0, self._depth))

    def report(self) -> str:
        lines = []
        for s in reversed(self.stages):
            lines.append(f"{'  ' * s.depth}{s.name}: {s.seconds:.2f}s")
        return "\n".join(lines)

    def as_dict(self, prefix: str = "") -> dict:
        return {f"{prefix}{s.name}": round(s.seconds, 3)
                for s in self.stages if s.depth == 0}

    def json(self) -> str:
        return json.dumps(self.as_dict())


@contextlib.contextmanager
def trace(label: str = "infimum"):
    """jax.profiler trace gated on INFIMUM_PROFILE_DIR (no-op otherwise)."""
    out = os.environ.get("INFIMUM_PROFILE_DIR")
    if not out:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(out, label)):
        yield
