"""Reliable TPU timing under the axon relay.

``jax.block_until_ready`` does not reliably block through the tunnel (a
385 MB 50-pass fori_loop "completed" in 0.08 ms until a host fetch forced
real synchronization). Timing recipe: queue N dependent-or-independent calls,
force completion with ONE host scalar fetch, amortize the fetch latency over
N and subtract the measured fetch baseline.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def fetch_baseline():
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    out = f(x)
    _fetch(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(x)
        _fetch(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit(name, fn, *args, iters=20, baseline=None, verbose=True):
    """Median-free min-of-3 batched timing: N queued executions + one fetch."""
    out = fn(*args)
    _fetch(out)                      # compile + settle
    if baseline is None:
        baseline = fetch_baseline()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fetch(out)
        dt = (time.perf_counter() - t0 - baseline) / iters
        best = min(best, dt)
    if verbose:
        print(f"{name:>44}: {best*1e3:9.3f} ms")
    return best
