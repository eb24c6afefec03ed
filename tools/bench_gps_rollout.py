"""On-device GPS outer loop (`gps_rollout_lanes`) vs the host-dispatched
outer loop, at the KL bench scale (B=4096, T=500 pendcart, 5 policy-
improvement iterations of 10-iteration trust-region solves).

The per-outer-iteration work is identical; the A/B isolates the host
dispatch + re-centering glue the scan absorbs (each host dispatch is ~4 ms
through the axon relay — BASELINE.md round 5 "relay dispatch")."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

B, T, OUTER, MAX_ITER = 4096, 500, 5, 10


def main():
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        PendCartSpec, default_x0, make_pendcart_problem, pendcart_lanes,
        pendcart_derivs_tiles)
    from differentialdynamicprogramming_jl_tpu.ops.forward import forward_pass
    from differentialdynamicprogramming_jl_tpu.policy import GaussianPolicy
    from differentialdynamicprogramming_jl_tpu.solvers.batch_kl import (
        ilqgkl_batch_lanes, gps_rollout_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqgkl import (
        ILQGKLConfig)
    from timing import fetch_baseline

    dtype = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    problem = make_pendcart_problem(spec, derivs="euler", dtype=dtype)
    derivs = jax.vmap(problem.make_derivs())

    def fx_fn(x, u):
        return derivs(x, u).fx

    key = jax.random.PRNGKey(0)
    x0s = (default_x0(dtype)[None, :]
           + 0.2 * jax.random.normal(key, (B, 4), dtype)
           * jnp.array([1, 1, 0, 0], dtype))
    u0s = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1), dtype)
    ro = jax.vmap(lambda a, b: forward_pass(problem, a, b))(x0s, u0s)
    prev = GaussianPolicy.zeros(T, 4, 1, dtype)
    prev = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), prev)
    prev = prev._replace(k=ro.u)
    cost0 = jnp.sum(ro.cost, -1)
    cfg = ILQGKLConfig(kl_step=2.0, max_iter=MAX_ITER)
    base = fetch_baseline()

    def fetch(a):
        return np.asarray(jax.device_get(jnp.ravel(a)[0]))

    # ---- host-dispatched outer loop ----
    # the per-outer body is jitted as ONE program (a careful user's host
    # loop: one dispatch per outer iteration); the NAIVE expression —
    # un-jitted fx_fn glue between solver calls, as a straightforward
    # port of the reference's loop would write it — is measured too.
    @jax.jit
    def host_step(x_, traj_, c_):
        res = ilqgkl_batch_lanes(model, tiles, x_, traj_,
                                 fx_fn(x_, traj_.k), c_, cfg=cfg)
        return res.x, res.policy, res.cost_total

    def host_loop(x_, traj_, c_, naive=False):
        for _ in range(OUTER):
            if naive:
                res = ilqgkl_batch_lanes(model, tiles, x_, traj_,
                                         fx_fn(x_, traj_.k), c_, cfg=cfg)
                x_, traj_, c_ = res.x, res.policy, res.cost_total
            else:
                x_, traj_, c_ = host_step(x_, traj_, c_)
        return x_, traj_, c_

    xh, th, ch = host_loop(ro.x, prev, cost0)     # compile + warm
    fetch(ch)
    host_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        xh, th, ch = host_loop(ro.x, prev, cost0 + 0.0 * ch)
        fetch(ch)
        host_best = min(host_best, time.perf_counter() - t0 - base)
    host_cost = np.asarray(ch, np.float64)

    xh, th, ch = host_loop(ro.x, prev, cost0, naive=True)   # warm
    fetch(ch)
    naive_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        xh, th, ch = host_loop(ro.x, prev, cost0 + 0.0 * ch, naive=True)
        fetch(ch)
        naive_best = min(naive_best, time.perf_counter() - t0 - base)

    # ---- on-device scan ----
    xf, tf, per = gps_rollout_lanes(model, tiles, ro.x, prev, cost0,
                                    fx_fn, OUTER, cfg=cfg)   # compile
    fetch(per[0])
    dev_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        xf, tf, per = gps_rollout_lanes(model, tiles, ro.x, prev,
                                        cost0 + 0.0 * per[0][-1], fx_fn,
                                        OUTER, cfg=cfg)
        fetch(per[0])
        dev_best = min(dev_best, time.perf_counter() - t0 - base)
    dc = np.max(np.abs(np.asarray(per[0][-1], np.float64) - host_cost)
                / np.maximum(np.abs(host_cost), 1.0))

    # ---- on-device, fully unrolled (no scan carry pinning) ----
    xf, tf, per = gps_rollout_lanes(model, tiles, ro.x, prev, cost0,
                                    fx_fn, OUTER, cfg=cfg, unroll=OUTER)
    fetch(per[0])
    unroll_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        xf, tf, per = gps_rollout_lanes(model, tiles, ro.x, prev,
                                        cost0 + 0.0 * per[0][-1], fx_fn,
                                        OUTER, cfg=cfg, unroll=OUTER)
        fetch(per[0])
        unroll_best = min(unroll_best, time.perf_counter() - t0 - base)

    print(json.dumps({
        "workload": f"pendcart GPS B={B} T={T} {OUTER}x{MAX_ITER}-iter",
        "host_loop_jitted_step_ms": round(host_best * 1e3, 2),
        "host_loop_naive_ms": round(naive_best * 1e3, 2),
        "on_device_scan_ms": round(dev_best * 1e3, 2),
        "on_device_unrolled_ms": round(unroll_best * 1e3, 2),
        "speedup_vs_jitted_host": round(host_best / dev_best, 3),
        "speedup_vs_naive_host": round(naive_best / dev_best, 3),
        "max_rel_cost_delta": float(f"{dc:.2e}"),
    }))


if __name__ == "__main__":
    main()
