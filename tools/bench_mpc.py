"""MPC-grade latency at production scale — the BASELINE.json north star
("MPC-grade per-solve latency") measured on the real workload shape.

Times the `demo_mpc(tier="lanes")` receding-horizon step at B=4096:
a warm-started 5-iteration `ilqg_batch_lanes` solve (no α-sweep), one
true-dynamics step, and the plan shift — plus the cold-start full-budget
solve that seeds the loop. Fetch-synchronized per tools/timing.py (under
the axon relay `block_until_ready` does not reliably block): the MPC chain
is naturally serialized through x, so N steps are queued host-fetch-free
and completion is forced with ONE scalar fetch.

Prints a small JSON dict for BASELINE.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (keyed by HLO hash): repeat runs and A/B legs
# skip the multi-minute cold driver compiles (CLAUDE.md TPU gotchas)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

B, T, INNER = 4096, 300, 5
N_STEADY = 20


def _fetch(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[0]))


def main():
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        PendCartSpec, default_x0, make_pendcart_problem, pendcart_lanes,
        pendcart_derivs_tiles)
    from differentialdynamicprogramming_jl_tpu.solvers.batch import (
        ilqg_batch_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
        ILQGConfig, default_alphas)
    from timing import fetch_baseline

    dtype = jnp.float32
    spec = PendCartSpec()
    prob = make_pendcart_problem(spec, derivs="euler", dtype=dtype)
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    lims_t = ((-10.0, 10.0),)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 4), reg_type=2,
                     lam_max=1e15, max_iter=INNER, iter_cap=INNER + 4)
    cfg0 = ILQGConfig(alphas=cfg.alphas, reg_type=2, lam_max=1e15,
                      max_iter=200)

    key = jax.random.PRNGKey(0)
    x = (default_x0(dtype)[None, :]
         + 0.2 * jax.random.normal(key, (B, 4), dtype)
         * jnp.array([1, 1, 0, 0], dtype))

    def solve(x_, u_, cfg_, warm):
        return ilqg_batch_lanes(model, None, x_, u_, lims=lims_t, cfg=cfg_,
                                derivs_tiles=tiles, warm_start=warm)

    dyn0 = jax.jit(jax.vmap(lambda a, b: prob.dynamics(a, b, 0)))

    def mpc_step(x_, u_):
        res = solve(x_, u_, cfg, True)
        x_next = dyn0(x_, res.u[:, 0])
        u_shift = jnp.concatenate(
            [res.u[:, 1:], jnp.zeros((B, 1, 1), dtype)], axis=1)
        return x_next, u_shift

    base = fetch_baseline()

    # ---- cold start: full-budget solve from zeros (compile excluded) ----
    u0 = jnp.zeros((B, T, 1), dtype)
    t0 = time.perf_counter()
    res0 = solve(x, u0, cfg0, False)
    _fetch(res0.cost_total)
    compile_plus_first = time.perf_counter() - t0
    cold_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        # serialize re-runs with a zero-valued dependency
        r = solve(x, u0 + 0.0 * res0.cost_total[:, None, None], cfg0, False)
        _fetch(r.cost_total)
        cold_best = min(cold_best, time.perf_counter() - t0 - base)
    u_warm = res0.u

    # ---- steady state: chain N_STEADY warm MPC steps, one fetch ----
    xs, us = mpc_step(x, u_warm)          # compile warm path
    _fetch(xs)
    steady_best = float("inf")
    for _ in range(3):
        xs, us = x, u_warm
        t0 = time.perf_counter()
        for _ in range(N_STEADY):
            xs, us = mpc_step(xs, us)
        _fetch(xs)
        steady_best = min(steady_best,
                          (time.perf_counter() - t0 - base) / N_STEADY)

    err = float(jnp.mean(jnp.abs(xs[:, 0] - np.pi)))

    # ---- QUALITY GATES (VERDICT r4 weak 6): the bench FAILS, not just
    # drifts, when MPC tracking regresses. Round-4 measured 0.565 rad mean
    # error after N_STEADY warm steps; gate at 1.5×. The steady-state plan
    # cost must also beat the cold-start plan cost (the fleet has moved
    # toward the target; a broken warm start / plan shift breaks this).
    warm_res = solve(xs, us, cfg, True)
    warm_cost = float(jnp.mean(warm_res.cost_total))
    err_gate = err < 0.85
    cost_gate = warm_cost < float(jnp.mean(res0.cost_total))
    quality_ok = bool(err_gate and cost_gate)

    print(json.dumps({
        "workload": f"pendcart MPC B={B} T={T} inner={INNER} f32 lanes",
        "cold_solve_ms": round(cold_best * 1e3, 2),
        "compile_plus_first_s": round(compile_plus_first, 1),
        "steady_ms_per_mpc_step": round(steady_best * 1e3, 2),
        "steady_ms_per_ilqg_iter": round(steady_best * 1e3 / INNER, 3),
        "mean_angle_err_rad": round(err, 4),
        "steady_mean_plan_cost": round(warm_cost, 2),
        "cold_mean_plan_cost": round(float(jnp.mean(res0.cost_total)), 2),
        "quality_ok": quality_ok,
    }))
    if not quality_ok:
        print(f"bench_mpc: QUALITY GATE FAILED (err {err:.3f} rad, gate "
              f"0.85; steady cost {warm_cost:.1f} vs cold "
              f"{float(jnp.mean(res0.cost_total)):.1f})", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
