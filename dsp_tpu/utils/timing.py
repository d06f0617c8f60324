"""Device timing utilities that survive an unreliable completion barrier.

On the tunneled TPU backend, ``jax.block_until_ready`` can return before
execution finishes and a host fetch carries tens of ms of relay latency.
``chained_timeit`` therefore forces *sequential* device execution by
threading a scalar data dependency from each iteration's output into the
next iteration's input, and pays the fetch latency exactly once:

    rate = n_iters / (fetch(last) - start)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def chained_timeit(step_fn, example_args, n_iters: int = 8,
                   warmup: int = 1) -> float:
    """Median-free simple throughput timing of ``step_fn(*args) -> pytree``.

    ``step_fn`` must accept a keyword ``token`` (scalar f32) and fold it
    into its computation; it must return a pytree whose first leaf is
    numeric.  Returns seconds per iteration.
    """

    def chained(n):
        token = jnp.asarray(0.0, jnp.float32)
        out = None
        for _ in range(n):
            out = step_fn(*example_args, token=token)
            first = jax.tree.leaves(out)[0]
            token = (first.ravel()[0] * 0).astype(jnp.float32)
        return out

    def force(out):
        # fetch ONE element — forces device completion without shipping
        # a potentially huge array through the relay
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    # compile + warm the whole chain once
    force(chained(warmup))
    t0 = time.perf_counter()
    force(chained(n_iters))
    dt = time.perf_counter() - t0
    return dt / n_iters


def chained_timeit_spread(step_fn, example_args, n_iters: int = 8,
                          warmup: int = 1, passes: int = 3):
    """:func:`chained_timeit` repeated ``passes`` times after ONE warm.

    Returns ``(median, lo, hi)`` seconds/iteration.  The relay's timing
    noise is ±30% pass-to-pass (docs/PERF.md round-2 postmortem) — a
    single pass over-reads; the median with the spread alongside is the
    honest report (VERDICT r2 #7 for bench.py, r3 #6 for bench_all)."""

    def chained(n):
        token = jnp.asarray(0.0, jnp.float32)
        out = None
        for _ in range(n):
            out = step_fn(*example_args, token=token)
            first = jax.tree.leaves(out)[0]
            token = (first.ravel()[0] * 0).astype(jnp.float32)
        return out

    def force(out):
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    force(chained(warmup))
    dts = []
    for _ in range(max(1, passes)):
        t0 = time.perf_counter()
        force(chained(n_iters))
        dts.append((time.perf_counter() - t0) / n_iters)
    dts.sort()
    n = len(dts)
    median = dts[n // 2] if n % 2 else 0.5 * (dts[n // 2 - 1] + dts[n // 2])
    return median, dts[0], dts[-1]


def token_mix(x: jax.Array, token: jax.Array) -> jax.Array:
    """Fold a scalar token into x without changing its value (token == 0)."""
    return x + token.astype(x.dtype)
