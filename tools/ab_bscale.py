"""Lane-driver iteration latency vs batch size: the fleet-compaction price curve.

The straggler-compacting fleet scheduler (solvers/fleet.py) wins exactly when
solving the surviving lanes at a smaller batch size is proportionally cheaper.
Round 2's LTI fleet (5% tail, 9-vs-49 spread) got 2.0×; the round-5 pendcart
re-measure (median 21, p90 75, max 182) got 0.71-0.97× DESPITE the fat tail.
This instrument measures the structural reason: per-iteration latency of the
lane driver at B = 1024 / 2048 / 4096 / 8192 (fixed 20-iteration budget,
chained data-dependent solves, one fetch — tools/timing.py protocol).

If latency(B) is strongly sub-linear below 4096 (the T-sequential pipeline
and per-iteration fixed costs dominate at small lane-block counts), then
compaction saves little until the surviving batch collapses to the 1024-lane
minimum tile — which is why only extreme spreads (tiny certification tails)
pay, not broad ones.
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

T = 500
ITER_BUDGET = 20


def _fetch(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[0]))


def main():
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles)
    from differentialdynamicprogramming_jl_tpu.solvers.batch import (
        ilqg_batch_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
        ILQGConfig, default_alphas)
    from timing import fetch_baseline

    dtype = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15)
    base = fetch_baseline()
    out = {}
    for B in (1024, 2048, 4096, 8192):
        x0s = (default_x0(dtype)[None, :]
               + 0.2 * jax.random.normal(jax.random.PRNGKey(0), (B, 4), dtype)
               * jnp.array([1, 0, 0, 0], dtype))
        u0s = jnp.zeros((B, T, 1), dtype)

        def run(dep):
            u = u0s if dep is None else u0s + 0.0 * dep[:, None, None]
            return ilqg_batch_lanes(model, None, x0s, u, lims=((-5.0, 5.0),),
                                    cfg=cfg, derivs_tiles=tiles,
                                    max_steps=ITER_BUDGET)

        r = run(None)
        _fetch(r.cost_total)
        iters = int(np.max(np.asarray(r.n_iters)))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            r2 = r
            for _ in range(3):
                r2 = run(r2.cost_total)
            _fetch(r2.cost_total)
            best = min(best, (time.perf_counter() - t0 - base) / 3)
        ms_iter = best * 1e3 / iters
        out[B] = {"ms_per_iter": round(ms_iter, 3),
                  "rel_vs_b4096": None, "iters": iters}
        print(json.dumps({f"B{B}": out[B]}), flush=True)
    if 4096 in out:
        ref = out[4096]["ms_per_iter"]
        for B, rec in out.items():
            rec["rel_vs_b4096"] = round(rec["ms_per_iter"] / ref, 3)
    print(json.dumps({f"B{k}": v for k, v in out.items()}))


if __name__ == "__main__":
    main()
