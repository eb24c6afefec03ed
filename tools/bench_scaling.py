"""Scaling-efficiency harness: batched iLQG fleets over a device mesh.

Measures solves/s at B = B_PER_DEV × n_dev for n_dev = 1, 2, 4, ... up to
every visible device, via the lane-layout sharded driver
(``parallel.mesh.ilqg_batch_sharded``). The solve is embarrassingly parallel
across scenarios (SURVEY.md §2): no collective crosses ICI during the solve;
only the final psum of fleet stats does. Expected efficiency on a real pod
slice is therefore ≈100% − (one psum per solve batch).

On this repo's 1-chip driver hardware this prints the single-device
throughput; run on a pod slice (or CPU with
XLA_FLAGS=--xla_force_host_platform_device_count=N, interpret=True, tiny
shapes) for the multi-device curve.

Timing: chained executions + one host fetch (see tools/timing.py — the axon
relay does not honor block_until_ready).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.parallel.mesh import (
    make_mesh, ilqg_batch_sharded)
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ILQGConfig, default_alphas)
from timing import timeit, fetch_baseline

B_PER_DEV = 4096
T = 500
MAX_ITER = 20


def main():
    devs = jax.devices()
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15, max_iter=MAX_ITER, iter_cap=MAX_ITER + 4)
    base = fetch_baseline()
    results = {}
    n = 1
    while n <= len(devs):
        B = B_PER_DEV * n
        x0 = default_x0(jnp.float32)
        x0s = x0[None, :] + (0.2 * jax.random.normal(
            jax.random.PRNGKey(0), (B, 4), jnp.float32)
            * jnp.array([1, 0, 0, 0], jnp.float32))
        u0s = jnp.zeros((B, T, 1), jnp.float32)
        mesh = make_mesh(n)

        def solve(x0s=x0s, u0s=u0s, mesh=mesh):
            return ilqg_batch_sharded(
                model, None, x0s, u0s, lims=((-5.0, 5.0),), cfg=cfg,
                mesh=mesh, reduce_stats=True, derivs_tiles=tiles)

        dt = timeit(f"{n} device(s), B={B} full solve", solve, iters=3,
                    baseline=base)
        results[n] = B / dt
        n *= 2

    s1 = results[1]
    for n, sps in results.items():
        eff = sps / (s1 * n)
        print(json.dumps({"devices": n, "solves_per_s": round(sps, 1),
                          "efficiency_vs_1dev": round(eff, 4)}))


if __name__ == "__main__":
    main()
