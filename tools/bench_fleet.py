"""Fleet-to-convergence on the NORTH-STAR problem: pendcart, B=4096, T=500.

Round 2 recorded the straggler-compacting fleet scheduler's 2.0× win on
the constrained LTI fleet only (BASELINE.md "Fleet scheduler"); VERDICT r2
(weak #8 / next #3) asks for the same measurement on the pendcart north
star. This harness solves the SAME B heterogeneous swing-up scenarios to
full convergence two ways:

  * lock-step  — one `ilqg_batch_lanes` call (the while_loop runs until
    the slowest lane terminates),
  * fleet      — `ilqg_fleet(chunk_iters, chunk_growth)`: after each chunk
    the finished scenarios are compacted away (solvers/fleet.py).

and prints wall ms, solves/s/chip, the per-scenario iteration spread that
the scheduler exploits, and the fleet-vs-lock-step result agreement.

Timing: whole-solve wall time (the fleet's per-chunk host round trips are
part of the algorithm, so plain wall time minus the measured single-fetch
baseline is the honest number), best of 3 after a warm-up solve compiles
every chunk batch size.
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

B, T = 4096, 500
LIMS = 5.0


def _fetch(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[0]))


def main():
    from differentialdynamicprogramming_jl_tpu.solvers.batch import (
        ilqg_batch_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.fleet import ilqg_fleet
    from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
        ILQGConfig, default_alphas)
    from timing import fetch_baseline

    global T
    dtype = jnp.float32
    if "--lti" in sys.argv:
        # the ROUND-2 fleet-scheduler workload (BASELINE.md "Fleet
        # scheduler"): constrained LTI n=10 m=2 T=1000 — the 5% λ-ladder
        # certification tail (9-vs-49 iteration spread) the compaction
        # was built for. --lti refreshes that 2.0× recommendation on the
        # current (fused/emission/kt25) tree.
        from differentialdynamicprogramming_jl_tpu.models.linear import (
            random_lti, lti_lanes, lti_derivs_tiles)
        T = 1000
        spec = random_lti(jax.random.PRNGKey(0), n=10, m=2, T=T,
                          dtype=dtype)
        model = lti_lanes(spec)
        tiles = lti_derivs_tiles(spec)
        lims_t = ((-0.6, 0.6), (-0.6, 0.6))
        x0s = (jnp.ones((B, 10), dtype)
               * jnp.linspace(0.5, 2.0, B, dtype=dtype)[:, None])
        u0s = jnp.tile(spec.u0, (B, 1, 1))
        workload = f"LTI n=10 m=2 B={B} T={T} lims=±0.6 f32"
    else:
        from differentialdynamicprogramming_jl_tpu.models.pendcart import (
            PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles)
        spec = PendCartSpec()
        model = pendcart_lanes(spec)
        tiles = pendcart_derivs_tiles(spec)
        lims_t = ((-LIMS, LIMS),)
        # Heterogeneous fleet: spread over angle AND cart position so
        # iterations-to-converge vary (that spread is what the scheduler
        # buys).
        key = jax.random.PRNGKey(0)
        x0s = (default_x0(dtype)[None, :]
               + 0.4 * jax.random.normal(key, (B, 4), dtype)
               * jnp.array([1, 1, 0, 0], dtype))
        u0s = jnp.zeros((B, T, 1), dtype)
        workload = f"pendcart swing-up B={B} T={T} lims=±{LIMS:g} f32"
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15, max_iter=300)

    common = dict(lims=lims_t, cfg=cfg, derivs_tiles=tiles)
    base = fetch_baseline()

    # ---- lock-step ----
    res = ilqg_batch_lanes(model, None, x0s, u0s, **common)   # compile+warm
    iters = np.asarray(res.n_iters)
    _fetch(res.cost_total)
    lock_cost = np.asarray(res.cost_total, np.float64)
    lock_reason = np.asarray(res.reason)
    dep0 = res.cost_total              # (B,) — the only live device remnant
    del res    # free the (B,T,...) result streams: at LTI scale (n=10,
    r = None   # T=1000) three live results + fleet chunk buffers OOM HBM
    lock_best = float("inf")
    for _ in range(3):
        del r       # free BEFORE the timed window (the fleet loop does
        #             the same — keep the A/B's dealloc overhead symmetric)
        t0 = time.perf_counter()
        r = ilqg_batch_lanes(model, None, x0s,
                             u0s + 0.0 * dep0[:, None, None],
                             **common)
        _fetch(r.cost_total)
        lock_best = min(lock_best, time.perf_counter() - t0 - base)
    del r

    print(json.dumps({
        "iters_median": float(np.median(iters)),
        "iters_p90": float(np.percentile(iters, 90)),
        "iters_max": int(iters.max()),
        "lockstep_ms": round(lock_best * 1e3, 1),
        "lockstep_solves_per_s": round(B / lock_best),
    }), flush=True)

    # ---- fleet: chunk_iters ≈ median, geometric growth ----
    results = {}
    for ci, gr in ((int(np.median(iters)), 8.0),
                   (max(4, int(np.median(iters)) - 2), 4.0),
                   (10, 10.0)):  # round-2's winning LTI schedule
        tag = f"fleet_ci{ci}_g{gr:g}"
        fr = ilqg_fleet(model, None, x0s, u0s, chunk_iters=ci,
                        chunk_growth=gr, **common)   # compiles chunk sizes
        _fetch(fr.u)
        best = float("inf")
        for _ in range(3):
            del fr    # free before re-solving (HBM hygiene, see lock-step)
            t0 = time.perf_counter()
            fr = ilqg_fleet(model, None, x0s, u0s, chunk_iters=ci,
                            chunk_growth=gr, **common)
            # the big trajectory scatters are the last enqueued device work;
            # force them (the per-chunk small fetches sync the rest)
            _fetch(fr.u)
            best = min(best, time.perf_counter() - t0 - base)
        dc = np.max(np.abs(np.asarray(fr.cost_total, np.float64) - lock_cost)
                    / np.maximum(np.abs(lock_cost), 1.0))
        results[tag] = {
            "ms": round(best * 1e3, 1),
            "solves_per_s": round(B / best),
            "speedup_vs_lockstep": round(lock_best / best, 2),
            "max_rel_cost_delta_vs_lockstep": float(f"{dc:.2e}"),
            "reasons_agree": int(np.sum(np.asarray(fr.reason)
                                        == lock_reason)),
        }
        del fr
        print(json.dumps({tag: results[tag]}), flush=True)

    print(json.dumps({
        "workload": workload + ", to convergence (max_iter=300)",
        "lockstep_ms": round(lock_best * 1e3, 1), **results}))


if __name__ == "__main__":
    main()
