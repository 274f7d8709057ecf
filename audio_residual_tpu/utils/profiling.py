"""Profiling / tracing utilities.

The reference's observability is wall-clock AverageMeters and an optional
``torch.jit.trace`` (`SURVEY.md §5 tracing`). TPU-native additions: XLA
profiler traces viewable in TensorBoard/Perfetto, named trace annotations,
and a scan-amortized throughput timer that survives async device relays
(per-dispatch latency through a remote tunnel otherwise dominates and
``block_until_ready`` does not await queued work).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["trace", "annotate", "measure_throughput"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def measure_throughput(forward, example, *, iters: int = 10, batch_axis: int = 0) -> dict:
    """Reliable steady-state timing: ``iters`` executions of ``forward`` are
    chained through a data dependency inside ONE jitted program, so queue
    tricks and dispatch latency cannot skew the number.

    ``forward(example) -> array``. Returns {seconds_per_iter, items_per_sec}.
    """

    @jax.jit
    def multi(x):
        def body(carry, _):
            out = forward(x + carry * 1e-12)
            return jnp.mean(out).astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return s

    float(np.asarray(multi(example)))  # compile + sync
    t0 = time.perf_counter()
    float(np.asarray(multi(example)))
    dt = (time.perf_counter() - t0) / iters
    return {
        "seconds_per_iter": dt,
        "items_per_sec": example.shape[batch_axis] / dt,
    }
