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


def _fleet(B):
    x0 = default_x0(jnp.float32)
    x0s = x0[None, :] + (0.2 * jax.random.normal(
        jax.random.PRNGKey(0), (B, 4), jnp.float32)
        * jnp.array([1, 0, 0, 0], jnp.float32))
    u0s = jnp.zeros((B, T, 1), jnp.float32)
    return x0s, u0s


def main_multihost(argv):
    """Multi-host scaling run: `bench_scaling.py --multihost [coord nproc pid]`.

    Call on every process of the slice (env-driven discovery on TPU pods —
    no extra args needed). Measures solves/s on ONE local device, then on
    the full global mesh, and emits the 1→N efficiency number
    (BASELINE.json north star: ≥80%). Only process 0 prints.
    """
    from differentialdynamicprogramming_jl_tpu.parallel import distributed as D
    if len(argv) >= 3:
        D.init_distributed(argv[0], int(argv[1]), int(argv[2]))
    else:
        D.init_distributed()
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    # off-TPU (CPU pod simulation) the kernels run in interpret mode on tiny
    # shapes — functional harness check, not a perf number
    on_tpu = jax.default_backend() == "tpu"
    b_dev, T_, kt, interp = ((B_PER_DEV, T, {}, False) if on_tpu
                             else (8, 8, dict(kt_backward=2, kt_forward=2),
                                   True))
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15, max_iter=MAX_ITER, iter_cap=MAX_ITER + 4)
    base = fetch_baseline()

    def fleet_T(B):
        x0 = default_x0(jnp.float32)
        x0s = x0[None, :] + (0.2 * jax.random.normal(
            jax.random.PRNGKey(0), (B, 4), jnp.float32)
            * jnp.array([1, 0, 0, 0], jnp.float32))
        return x0s, jnp.zeros((B, T_, 1), jnp.float32)

    # 1 local device
    mesh1 = jax.sharding.Mesh(np.array(jax.local_devices()[:1]), ("b",))
    x0s, u0s = fleet_T(b_dev)
    dt1 = timeit("1 device", lambda: ilqg_batch_sharded(
        model, None, x0s, u0s, lims=((-5.0, 5.0),), cfg=cfg, mesh=mesh1,
        reduce_stats=True, derivs_tiles=tiles, interpret=interp, **kt),
        iters=3, baseline=base)
    s1 = b_dev / dt1

    # full global mesh (all chips, all hosts)
    gmesh = D.global_mesh()
    n_glob = gmesh.devices.size
    n_local = len(jax.local_devices())
    xl, ul = fleet_T(b_dev * n_local)  # this process's shard
    xg = D.distribute_batch(np.asarray(xl), gmesh)
    ug = D.distribute_batch(np.asarray(ul), gmesh)
    dtn = timeit(f"{n_glob} devices / {jax.process_count()} hosts",
                 lambda: ilqg_batch_sharded(
                     model, None, xg, ug, lims=((-5.0, 5.0),), cfg=cfg,
                     mesh=gmesh, reduce_stats=True, derivs_tiles=tiles,
                     interpret=interp, **kt),
                 iters=3, baseline=base)
    sn = b_dev * n_glob / dtn
    if jax.process_index() == 0:
        print(json.dumps({
            "hosts": jax.process_count(), "devices": n_glob,
            "solves_per_s_1dev": round(s1, 1),
            "solves_per_s_global": round(sn, 1),
            "efficiency_1_to_N": round(sn / (s1 * n_glob), 4)}))


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
        x0s, u0s = _fleet(B)
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
    if len(sys.argv) > 1 and sys.argv[1] == "--multihost":
        main_multihost(sys.argv[2:])
    else:
        main()
