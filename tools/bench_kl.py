"""GPS/KL lane-tier fleet bench (TPU): pendcart trust-region solves.

Round 2 recorded "41.7 ms per 10-iteration KL-constrained 4096-fleet
solve" from an ad-hoc script; this is the repeatable harness. It
pre-rolls B pendcart trajectories (the GPS outer-loop pattern:
trust-region center + previous policy + dynamics linearizations), then
times `ilqgkl_batch_lanes` to a fixed iteration budget in BOTH η modes
(scalar bisection / per-step ADAM, reference `src/iLQGkl.jl:97-124` and
`:185-236`).

A/B the policy-emission + carry changes by running this same script in a
worktree at an older commit (CLAUDE.md bench-variance protocol).

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

B, T = 4096, 500
MAX_ITER = 10


def _fetch(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[0]))


def main():
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles,
        make_pendcart_problem)
    from differentialdynamicprogramming_jl_tpu.ops.forward import (
        forward_pass)
    from differentialdynamicprogramming_jl_tpu.policy import GaussianPolicy
    from differentialdynamicprogramming_jl_tpu.solvers.batch_kl import (
        ilqgkl_batch_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqgkl import (
        ILQGKLConfig)
    from timing import fetch_baseline

    dtype = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    problem = make_pendcart_problem(spec, derivs="euler", dtype=dtype)

    # GPS outer-loop inputs: trust-region centers from noisy swing-up
    # controls, previous policy = the rollout's controls with unit Σ,
    # per-scenario dynamics linearizations along the center
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
    d = jax.vmap(problem.make_derivs())(ro.x, ro.u)
    cost0 = jnp.sum(ro.cost, -1)
    jax.block_until_ready(cost0)

    base = fetch_baseline()
    out = {}
    for tag, cfg in (
        ("scalar_eta", ILQGKLConfig(kl_step=2.0, max_iter=MAX_ITER)),
        ("per_step_eta", ILQGKLConfig(kl_step=2.0, max_iter=MAX_ITER,
                                      constrain_per_step=True,
                                      gd_alpha=0.01)),
    ):
        def run(cost0_=cost0, cfg=cfg):
            return ilqgkl_batch_lanes(model, tiles, ro.x, prev, d.fx,
                                      cost0_, cfg=cfg)
        r = run()
        _fetch(r.cost_total)              # compile + warm
        # chain N data-dependent solves per measured window: a single ~40 ms
        # solve is barely over the ~31 ms fetch baseline, which drifts ±40%
        # between sessions (CLAUDE.md: size the window to ≥5× the baseline)
        n_chain = 4
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r2 = r
            for _ in range(n_chain):
                r2 = run(cost0 + 0.0 * r2.cost_total)
            _fetch(r2.cost_total)
            best = min(best,
                       (time.perf_counter() - t0 - base) / n_chain)
        r = r2
        out[tag] = {
            "ms": round(best * 1e3, 1),
            "solves_per_s": round(B / best),
            "satisfied": int(np.sum(np.asarray(r.satisfied))),
            "pd_failed": int(np.sum(np.asarray(r.pd_failed))),
            "mean_cost": round(float(jnp.mean(r.cost_total)), 2),
        }
        print(json.dumps({tag: out[tag]}), flush=True)

    out["workload"] = (f"pendcart GPS fleet B={B} T={T} f32, "
                       f"{MAX_ITER}-iteration trust-region solves")
    print(json.dumps(out))

    if "--fleet" in sys.argv:
        fleet_bench(model, tiles, problem, ro, prev, d, cost0, base)


def fleet_bench(model, tiles, problem, ro, prev, d, cost0, base):
    """Straggler-compaction A/B on the KL tier: lock-step
    `ilqgkl_batch_lanes` to convergence vs `ilqgkl_fleet` (VERDICT r3
    item 4 — does per-lane η-bracketing iteration spread pay for chunked
    compaction like the 2.0× LTI result on the iLQG tier?)."""
    from differentialdynamicprogramming_jl_tpu.solvers.batch_kl import (
        ilqgkl_batch_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.fleet import (
        ilqgkl_fleet)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqgkl import (
        ILQGKLConfig)
    # a tight trust region makes the η bisection iterate; per-scenario
    # spread in the measured KL makes the counts heterogeneous
    cfg = ILQGKLConfig(kl_step=0.5, max_iter=40)
    args = (model, tiles, ro.x, prev, d.fx, cost0)

    res = ilqgkl_batch_lanes(*args, cfg=cfg)          # compile + warm
    iters = np.asarray(res.n_iters)
    _fetch(res.cost_total)
    lock = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = ilqgkl_batch_lanes(model, tiles, ro.x, prev, d.fx,
                               cost0 + 0.0 * res.cost_total, cfg=cfg)
        _fetch(r.cost_total)
        lock = min(lock, time.perf_counter() - t0 - base)
    print(json.dumps({
        "kl_iters_median": float(np.median(iters)),
        "kl_iters_p90": float(np.percentile(iters, 90)),
        "kl_iters_max": int(iters.max()),
        "kl_lockstep_ms": round(lock * 1e3, 1),
        "kl_lockstep_solves_per_s": round(B / lock)}), flush=True)

    for ci, gr in ((int(np.median(iters)), 8.0),
                   (max(2, int(np.median(iters)) - 2), 4.0)):
        fr = ilqgkl_fleet(*args, cfg=cfg, chunk_iters=ci,
                          chunk_growth=gr)            # compile chunk sizes
        _fetch(fr.cost_total)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fr = ilqgkl_fleet(*args, cfg=cfg, chunk_iters=ci,
                              chunk_growth=gr)
            _fetch(fr.cost_total)
            best = min(best, time.perf_counter() - t0 - base)
        agree = int(np.sum(np.isclose(np.asarray(fr.cost_total),
                                      np.asarray(res.cost_total),
                                      rtol=1e-6)))
        print(json.dumps({f"kl_fleet_ci{ci}_g{gr:g}": {
            "ms": round(best * 1e3, 1),
            "solves_per_s": round(B / best),
            "speedup_vs_lockstep": round(lock / best, 2),
            "cost_agree": agree,
            "eta_agree": int(np.sum(np.asarray(fr.eta)
                                    == np.asarray(res.eta)))}}),
            flush=True)


if __name__ == "__main__":
    main()
