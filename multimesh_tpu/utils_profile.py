"""Stage tracing: wall-clock stage timers + optional jax.profiler traces.

The reference's only observability is wall-clock prints around each API
call (reference multi_mesh/api.py:50-57) and tqdm bars in the hot loops.
Here every engine stage can be timed with device-complete semantics, and
a full XLA trace can be captured for TensorBoard / Perfetto (the
SURVEY.md section 5 TPU plan: jax.profiler traces + per-stage timing).

Usage::

    from multimesh_tpu.utils_profile import stage_timer, trace

    with trace("/tmp/mmt_trace"):          # optional: XLA profiler trace
        with stage_timer("locate") as t:   # per-stage wall clock
            res = locate(...)
            t.sync(res.elements)           # force device completion

Enable automatic stage prints with MMT_PROFILE=1 in the environment.
"""
from __future__ import annotations

import contextlib
import os
import time

import numpy as np

_STAGES: dict[str, float] = {}


def profiling_enabled() -> bool:
    return bool(os.environ.get("MMT_PROFILE"))


class _StageTimer:
    def __init__(self, name: str):
        self.name = name
        self.t0 = time.perf_counter()
        self.elapsed = None

    def sync(self, device_value):
        """Force completion of a device value before the timer stops.

        On the axon platform ``block_until_ready`` does not actually
        block, so completion is forced with a SCALAR host transfer --
        the first element is sliced on device first; pulling the whole
        array would time the (MB/s-slow) host link instead of the chip.
        """
        if device_value is not None:
            try:
                first = device_value.ravel()[0]  # device-side slice
                float(np.asarray(first))
            except Exception:
                pass
        return device_value

    def stop(self):
        self.elapsed = time.perf_counter() - self.t0
        _STAGES[self.name] = _STAGES.get(self.name, 0.0) + self.elapsed
        if profiling_enabled():
            print(f"[mmt stage] {self.name:30s} {self.elapsed*1e3:9.2f} ms")


class _NullTimer:
    def sync(self, device_value):
        return device_value


_NULL = _NullTimer()


@contextlib.contextmanager
def stage_timer(name: str):
    """Accumulating per-stage wall-clock timer with device-complete
    semantics (printed when MMT_PROFILE=1; totals via stage_totals()).
    A no-op -- no timing, no forced device sync -- when profiling is
    off, so call sites can stay in the hot path permanently."""
    if not profiling_enabled():
        yield _NULL
        return
    t = _StageTimer(name)
    try:
        yield t
    finally:
        t.stop()


def stage_totals() -> dict[str, float]:
    """Accumulated seconds per stage name since reset_stages()."""
    return dict(_STAGES)


def reset_stages() -> None:
    _STAGES.clear()


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Capture a jax.profiler trace (TensorBoard/Perfetto format) for the
    enclosed block.  No-op when log_dir is None and MMT_TRACE_DIR is
    unset, so call sites can leave the context in place permanently."""
    log_dir = log_dir or os.environ.get("MMT_TRACE_DIR")
    if not log_dir:
        # genuinely free when disabled: even importing jax costs seconds
        # on a throttled host
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
