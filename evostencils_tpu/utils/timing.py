"""Device timing helpers shared by the measurement scripts.

The development tunnel's `block_until_ready` can return before remote
execution completes — only a SCALAR VALUE FETCH is a reliable barrier.
Both the 1024² headline and the roofline calibration depend on the same
fori-loop-differencing routine; it lives here so a fix to the barrier
semantics reaches every consumer.
"""

from __future__ import annotations


def per_cycle_time(step, u0, f, iters: int = 100, repeats: int = 5) -> float:
    """Per-cycle device seconds via fori-loop differencing
    ((t(3K) − t(K)) / 2K): the tunnel dispatch constant cancels, and each
    timed region ends in a scalar value fetch."""
    import time

    import jax
    import jax.numpy as jnp

    def k_loop(n):
        @jax.jit
        def run(u, f):
            out = jax.lax.fori_loop(0, n, lambda i, uu: step(uu, f), u)
            return sum(jnp.sum(x * x) for x in out)

        float(run(u0, f))
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(u0, f))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = k_loop(iters)
    t3 = k_loop(3 * iters)
    return max((t3 - t1) / (2 * iters), 1e-9)
