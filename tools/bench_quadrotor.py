"""Autodiff-tiles runtime cost + quadrotor fleet throughput (TPU).

Two questions, one harness:

  1. Do the autodiff-derived derivative tiles
     (``ops/pallas/autodiff_tiles.py``) cost anything at runtime vs the
     hand-written analytic pendcart tiles? Both inline into the identical
     kernel structure — jaxpr differences (jvp-based product forms vs
     hand-factored expressions) are the only possible delta. Measured by
     interleaved best-of-3 full-convergence solves of the SAME pendcart
     fleet (north-star workload, B=4096, T=500).

  2. What does the quadrotor family (n=6, m=2 — the fully-autodiff
     model, ``models/quadrotor.py``) sustain at fleet scale? First
     recorded number for an m=2 in-kernel box-QP enumeration workload on
     a nonlinear model.

Timing discipline per CLAUDE.md: persistent compile cache, fetch-baseline
subtraction, one host fetch per measured solve.
"""
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


def _fetch(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[0]))


def _bench(fn, base, reps=3, n_chain=3):
    """Chain ``n_chain`` data-dependent solves per measured window so the
    window is ≥5× the ~31 ms fetch baseline (CLAUDE.md timing protocol);
    ``fn(dep)`` must thread ``dep`` (a scalar-per-lane array or None) into
    its inputs as a zero-valued data dependency."""
    r = fn(None)
    _fetch(r.cost_total)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r2 = r
        for _ in range(n_chain):
            r2 = fn(r2.cost_total)
        _fetch(r2.cost_total)
        best = min(best, (time.perf_counter() - t0 - base) / n_chain)
    return best, r2


def main():
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles)
    from differentialdynamicprogramming_jl_tpu.models.quadrotor import (
        QuadrotorSpec, quadrotor_lanes, default_x0 as quad_x0)
    from differentialdynamicprogramming_jl_tpu.ops.pallas.autodiff_tiles import (
        autodiff_derivs_tiles)
    from differentialdynamicprogramming_jl_tpu.solvers.batch import (
        ilqg_batch_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
        ILQGConfig, default_alphas)
    from timing import fetch_baseline

    dtype = jnp.float32
    base = fetch_baseline()
    out = {}

    # ---- [1] pendcart: analytic vs autodiff tiles, interleaved ----
    B, T = 4096, 500
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    legs = {"analytic": pendcart_derivs_tiles(spec),
            "autodiff": autodiff_derivs_tiles(model)}
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15, max_iter=300)
    key = jax.random.PRNGKey(0)
    x0s = (default_x0(dtype)[None, :]
           + 0.4 * jax.random.normal(key, (B, 4), dtype)
           * jnp.array([1, 1, 0, 0], dtype))
    u0s = jnp.zeros((B, T, 1), dtype)

    solvers, results = {}, {}
    for tag, tiles in legs.items():
        def run(dep, tiles=tiles):
            u = u0s if dep is None else u0s + 0.0 * dep[:, None, None]
            return ilqg_batch_lanes(model, None, x0s, u,
                                    lims=((-5.0, 5.0),), cfg=cfg,
                                    derivs_tiles=tiles)
        results[tag] = run(None)          # compile + warm
        _fetch(results[tag].cost_total)   # completed before any timing
        solvers[tag] = run

    n_chain = 3
    times = {}
    for rep in range(3):                  # interleave legs across reps
        for tag, run in solvers.items():
            r = results[tag]
            t0 = time.perf_counter()
            for _ in range(n_chain):      # ≥5× fetch-baseline window
                r = run(r.cost_total)
            _fetch(r.cost_total)
            dt = (time.perf_counter() - t0 - base) / n_chain
            times[tag] = min(times.get(tag, float("inf")), dt)
            results[tag] = r
    dc = np.max(np.abs(
        np.asarray(results["autodiff"].cost_total, np.float64)
        - np.asarray(results["analytic"].cost_total, np.float64))
        / np.maximum(np.abs(np.asarray(results["analytic"].cost_total,
                                       np.float64)), 1.0))
    out["pendcart_tiles_ab"] = {
        "analytic_ms": round(times["analytic"] * 1e3, 1),
        "autodiff_ms": round(times["autodiff"] * 1e3, 1),
        "autodiff_over_analytic": round(times["autodiff"]
                                        / times["analytic"], 3),
        "max_rel_cost_delta": float(f"{dc:.2e}"),
        "reasons_agree": int(np.sum(
            np.asarray(results["autodiff"].reason)
            == np.asarray(results["analytic"].reason))),
        "workload": f"pendcart B={B} T={T} ±5 f32 to convergence",
    }
    print(json.dumps({"pendcart_tiles_ab": out["pendcart_tiles_ab"]}),
          flush=True)

    # ---- [2] quadrotor fleet throughput ----
    Bq, Tq = 4096, 400
    qspec = QuadrotorSpec()
    qmodel = quadrotor_lanes(qspec)
    qtiles = autodiff_derivs_tiles(qmodel)
    qcfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                      lam_max=1e15, max_iter=100)
    qx0s = (quad_x0(dtype)[None, :]
            + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (Bq, 6), dtype)
            * jnp.array([1, 0, 1, 0, 0.5, 0], dtype))
    qu0s = jnp.full((Bq, Tq, 2), qspec.u_hover, dtype)

    def qrun(dep):
        u = qu0s if dep is None else qu0s + 0.0 * dep[:, None, None]
        return ilqg_batch_lanes(qmodel, None, qx0s, u, lims=qspec.lims,
                                cfg=qcfg, derivs_tiles=qtiles)
    qbest, rq = _bench(qrun, base)        # warms/compiles internally
    iters = np.asarray(rq.n_iters)
    out["quadrotor_fleet"] = {
        "ms": round(qbest * 1e3, 1),
        "solves_per_s": round(Bq / qbest),
        "iters_median": float(np.median(iters)),
        "mean_cost": round(float(jnp.mean(rq.cost_total)), 3),
        "mean_final_height": round(float(jnp.mean(rq.x[:, -1, 2])), 3),
        "workload": f"quadrotor hover B={Bq} T={Tq} thrust box (0,"
                    f"{qspec.u_max:g}) f32, autodiff tiles, max_iter=100",
    }
    print(json.dumps({"quadrotor_fleet": out["quadrotor_fleet"]}),
          flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
