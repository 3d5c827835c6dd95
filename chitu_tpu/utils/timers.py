"""Named cumulative timers with device fencing.

Capability parity with the reference's Timers
(reference: chitu/global_vars.py:118-203), with
``torch.cuda.synchronize()`` fencing replaced by
``jax.block_until_ready`` / ``jax.effects_barrier`` on TPU.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax


class _Timer:
    def __init__(self, name: str, sync: bool = True):
        self.name = name
        self.sync = sync
        self.elapsed_ = 0.0
        self.count = 0
        self.started = False
        self._start_time = 0.0

    def _fence(self):
        if self.sync:
            # NOTE: effects_barrier only awaits side-effecting programs,
            # not in-flight pure jit work. The engine's timer boundaries
            # are honest because every phase ENDS with a host fetch of
            # its outputs (sampled tokens), which drains the in-order
            # device queue; this barrier only covers stray effects. A
            # full flush (dispatch + block_until_ready) would add ~1ms
            # per fence through a dispatch relay — unacceptable in the
            # serving hot loop.
            jax.effects_barrier()

    def start(self):
        # re-entrant-safe: a prior step that raised mid-timing must not
        # poison subsequent steps
        if self.started:
            self.started = False
        self._fence()
        self._start_time = time.perf_counter()
        self.started = True

    def stop(self):
        assert self.started, f"timer {self.name} not started"
        self._fence()
        self.elapsed_ += time.perf_counter() - self._start_time
        self.count += 1
        self.started = False

    def reset(self):
        self.elapsed_ = 0.0
        self.count = 0
        self.started = False

    def elapsed(self, reset: bool = False) -> float:
        was_started = self.started
        if was_started:
            self.stop()
        value = self.elapsed_
        if reset:
            self.reset()
        if was_started:
            self.start()
        return value


class Timers:
    """Group of named timers (reference: global_vars.py:162-203)."""

    def __init__(self, sync: bool = True):
        self.timers: Dict[str, _Timer] = {}
        self.sync = sync

    def __call__(self, name: str) -> _Timer:
        if name not in self.timers:
            self.timers[name] = _Timer(name, sync=self.sync)
        return self.timers[name]

    def log(self, names=None, normalizer: float = 1.0, logger=None) -> str:
        names = names if names is not None else list(self.timers)
        parts = []
        for name in names:
            t = self.timers.get(name)
            if t is None or t.count == 0:
                continue
            avg_ms = t.elapsed_ * 1000.0 / max(t.count, 1) / normalizer
            parts.append(f"{name}: n={t.count} total={t.elapsed_*1000.0:.1f}ms avg={avg_ms:.3f}ms")
        msg = "timers | " + " | ".join(parts) if parts else "timers | (empty)"
        if logger is not None:
            logger.info(msg)
        return msg

    def reset(self):
        for t in self.timers.values():
            t.reset()


class ProfilerSession:
    """jax.profiler trace capture around engine sections
    (the TPU replacement for the reference's torch-level tracing,
    SURVEY.md §5: Timers + tensorboard scaffold)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self.active = False

    def start(self):
        if not self.active:
            jax.profiler.start_trace(self.log_dir)
            self.active = True

    def stop(self):
        if self.active:
            jax.profiler.stop_trace()
            self.active = False

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()


_GLOBAL_TIMERS: Optional[Timers] = None


def get_timers() -> Timers:
    global _GLOBAL_TIMERS
    if _GLOBAL_TIMERS is None:
        _GLOBAL_TIMERS = Timers()
    return _GLOBAL_TIMERS
