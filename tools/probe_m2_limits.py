"""VERDICT r1 item 8: explain the ~4× m=2-with-limits slowdown on the LTI
lane path (15.5k → 3.9k solves/s at n=10, m=2, T=1000).

Separates the two candidate causes:
1. per-iteration kernel cost (the 9-configuration enumeration's extra VPU
   work per step) — measured by timing backward_lanes alone, lims on/off;
2. iteration count (the limited problem may simply take more iLQG
   iterations / λ retries) — measured from full solves' n_iters.

Also times a masked-projected-Newton m=2 variant (the m>2 _boxqp_masked
path forced on for m=2) as the alternative VERDICT suggested.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.linear import (
    random_lti, lti_lanes, lti_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.ops.pallas import backward_kernel
from differentialdynamicprogramming_jl_tpu.ops.pallas.pack import (
    to_lanes, vec_to_lanes)
from differentialdynamicprogramming_jl_tpu.solvers.batch import (
    ilqg_batch_lanes)
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ILQGConfig, default_alphas)
from timing import timeit, fetch_baseline

N, M, T, B = 10, 2, 1000, 4096
LIMS = ((-0.6, 0.6), (-0.6, 0.6))


def setup():
    spec = random_lti(jax.random.PRNGKey(0), n=N, m=M, T=T,
                      dtype=jnp.float32)
    model = lti_lanes(spec)
    tiles = lti_derivs_tiles(spec)
    x0s = (jnp.ones((B, N), jnp.float32)
           * jnp.linspace(0.5, 2.0, B, dtype=jnp.float32)[:, None])
    u0s = jnp.tile(spec.u0, (B, 1, 1))
    return spec, model, tiles, x0s, u0s


def kernel_latency(tiles, x0s, u0s, lims, base, label, k_t=25):
    traj = to_lanes(jnp.concatenate(
        [jnp.zeros((B, T, N), jnp.float32), u0s,
         jnp.zeros((B, T, 1), jnp.float32)], axis=-1), B)
    lam = vec_to_lanes(jnp.full((B,), 0.1, jnp.float32))
    fn = lambda: backward_kernel.backward_lanes(
        traj, lam, n=N, m=M, reg_type=1, lims=lims, k_t=k_t,
        derivs_tiles=tiles)
    return timeit(label, fn, iters=10, baseline=base)


def main():
    base = fetch_baseline()
    spec, model, tiles, x0s, u0s = setup()

    t_free = kernel_latency(tiles, x0s, u0s, None, base,
                            "backward kernel, no limits")
    t_lim = kernel_latency(tiles, x0s, u0s, LIMS, base,
                           "backward kernel, m=2 enum limits")

    # masked-Newton alternative: force the m>2 path for m=2
    orig = backward_kernel._make_kernel

    def patched(n, m, T_, K_T, reg_type, lims, derivs_tiles=None,
                gps=False, n_params=0, qp_iters=8):
        if lims is not None and m == 2:
            # pretend m>2: route through _boxqp_masked by bumping the
            # branch condition — done by temporarily renaming
            pass
        return orig(n, m, T_, K_T, reg_type, lims, derivs_tiles, gps,
                    n_params, qp_iters)

    # direct approach: swap _boxqp_m2 for a _boxqp_masked-based shim
    real_m2 = backward_kernel._boxqp_m2

    def newton_m2(Q, g, lo, hi):
        x, free, L, ok = backward_kernel._boxqp_masked(
            Q, [g[0], g[1]], [lo[0], lo[1]], [hi[0], hi[1]],
            [jnp.zeros_like(g[0]), jnp.zeros_like(g[1])], 2, 6)
        return x[0], x[1], free[0], free[1], ok

    backward_kernel._boxqp_m2 = newton_m2
    try:
        t_newton = kernel_latency(tiles, x0s, u0s, LIMS, base,
                                  "backward kernel, m=2 masked Newton")
    finally:
        backward_kernel._boxqp_m2 = real_m2

    # full solves: iteration counts
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=1,
                     max_iter=20, iter_cap=24)
    for lims, name in ((None, "free"), (LIMS, "limits")):
        def solve(lims=lims):
            return ilqg_batch_lanes(model, None, x0s, u0s, lims=lims,
                                    cfg=cfg, derivs_tiles=tiles)
        dt = timeit(f"full solve {name}", solve, iters=3, baseline=base)
        res = solve()
        iters = np.asarray(res.n_iters)
        print(json.dumps({
            "case": name, "solve_ms": round(dt * 1e3, 1),
            "solves_per_s": round(B / dt, 1),
            "iters_mean": round(float(iters.mean()), 2),
            "iters_max": int(iters.max())}))

    print(json.dumps({
        "kernel_ms_free": round(t_free * 1e3, 3),
        "kernel_ms_enum": round(t_lim * 1e3, 3),
        "kernel_ms_newton": round(t_newton * 1e3, 3),
        "enum_overhead_x": round(t_lim / t_free, 2),
        "newton_overhead_x": round(t_newton / t_free, 2)}))


if __name__ == "__main__":
    main()
