"""Profiling and benchmarking helpers.

The reference's only instrumentation is wall-clock timers around test
rollouts (``test_quadrotor3d.py:9,15,23-24``) and a per-step print in
``reinmav_env.py:125``.  Here: ``jax.profiler`` trace capture for TPU
timelines plus a steady-state throughput timer that handles compilation
warm-up and async dispatch correctly.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, warmup: int = 2, iters: int = 10):
    """Median wall time of ``fn(*args)`` with host-transfer fencing.

    Returns (seconds_per_call, result).  ``fn`` should be jitted; warmup
    calls absorb compilation.  Synchronisation forces a device->host
    transfer of the result — on tunnelled/remote TPU runtimes
    ``block_until_ready`` can return before execution completes, which
    silently inflates throughput numbers.
    """

    def sync(r):
        jax.tree.map(lambda leaf: jax.device_get(leaf), r)

    result = None
    for _ in range(warmup):
        result = fn(*args)
    sync(result)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        result = fn(*args)
        sync(result)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], result


class NanGuard:
    """Detect non-finite values in a pytree (the batched-kernel equivalent
    of the reference's NaN-done checks, ``mujoco_quad.py:52-53``)."""

    @staticmethod
    def check(tree, name: str = "tree") -> None:
        leaves = jax.tree.leaves(tree)
        for i, leaf in enumerate(leaves):
            if not bool(jax.numpy.all(jax.numpy.isfinite(leaf))):
                raise FloatingPointError(f"non-finite values in {name} leaf {i}")
