"""Profiling / throughput instrumentation (SURVEY.md §5.1).

The reference has no tracing at all; this provides the two tools a
production deployment needs:

* ``trace(dir)`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device activity.
* ``Throughput`` — wall-clock samples/s meter with a correct device
  barrier (a scalar host readback: on remote-tunnel TPU platforms
  ``block_until_ready`` can return before execution completes).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(out) -> None:
    leaves = [x for x in jax.tree.leaves(out)
              if hasattr(x, "dtype")]
    if leaves:
        a = leaves[0]
        # complex device->host is unimplemented on some backends
        float(jnp.sum(jnp.abs(a) if jnp.iscomplexobj(a) else a))


class Throughput:
    """Measure samples/s of a jitted callable.

    Examples
    --------
    >>> import jax
    >>> import diffsptk_tpu
    >>> from diffsptk_tpu.utils.profiling import Throughput
    >>> x = diffsptk_tpu.nrand(1599)
    >>> meter = Throughput(jax.jit(diffsptk_tpu.STFT(100, 50, 128)),
    ...                    warmup=1, iters=2)
    >>> sps = meter.measure(x, n_samples=x.size)
    >>> sps > 0
    True
    """

    def __init__(self, fn, *, warmup: int = 3, iters: int = 10):
        self.fn = fn
        self.warmup = warmup
        self.iters = iters
        self.last_seconds_per_call: float | None = None

    def measure(self, *args, n_samples: int) -> float:
        for _ in range(self.warmup):
            _sync(self.fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(self.iters):
            out = self.fn(*args)
        _sync(out)
        dt = (time.perf_counter() - t0) / self.iters
        self.last_seconds_per_call = dt
        return n_samples / dt
