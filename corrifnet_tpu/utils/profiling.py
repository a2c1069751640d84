"""Tracing / profiling utilities (SURVEY §5.1).

TPU-native equivalents of the reference's telemetry:
  * FLOPs: XLA ``cost_analysis()`` on the compiled computation (thop
    equivalent, calculate.py:152-156) — see run.profile;
  * params: pytree size (calculate3.py:168-172) — see run.profile;
  * wall-clock FPS: the test loop (F7_TEST2.py:135) — see train.loop;
  * device memory: ``device_memory_stats`` replaces
    ``torch.cuda.memory_allocated()`` (F2_MAIN.py:306-309);
  * step tracing: ``trace`` wraps ``jax.profiler`` for perfetto/tensorboard
    traces of the jitted steps.
"""

from __future__ import annotations

import contextlib
from typing import Dict

import jax

__all__ = ["device_memory_stats", "live_array_bytes", "trace"]


def device_memory_stats(device=None) -> Dict[str, int]:
    """Allocator stats for a device (bytes). Empty dict if the backend
    doesn't expose them (some tunneled/experimental platforms)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}


def live_array_bytes() -> int:
    """Total bytes of live jax arrays on all devices (host view)."""
    total = 0
    for arr in jax.live_arrays():
        try:
            total += arr.nbytes
        except Exception:
            pass
    return total


@contextlib.contextmanager
def trace(log_dir: str, with_memory: bool = True):
    """Profile a region into ``log_dir`` (tensorboard/perfetto format).

    Usage:
        with trace("/tmp/jax-trace"):
            state, m = train_step(...)
            jax.block_until_ready(m["loss"])
    """
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
