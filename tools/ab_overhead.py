"""Split the headline driver metric into per-iteration slope + per-solve
intercept (round 5).

The glue isolation (tools/ab_glue.py) measured the full in-loop body at
~0.98 ms vs the kernels-only chain's ~0.98 ms — the accept/λ/g_norm/retry
glue is ~free. The headline metric (bench.py: full 20-iteration-budget
solve / 20) still reads ~1.13-1.22 ms because it amortizes PER-SOLVE
fixed work into every iteration: initial-rollout α-sweep (2 forward
launches), the post-loop full-emission backward replay, the reason-5
sanitize selects on the full output stream, the batch-major unpack
transposes, and dispatch.

``max_steps`` is a TRACED bound, so one compiled program runs any
iteration budget: timing the SAME program at two budgets and fitting
  t(I) = slope·I + intercept
separates the two. Protocol: interleaved best-of-5 windows of 3 chained
data-dependent solves, one fetch each (tools/timing.py discipline).

Usage: python tools/ab_overhead.py [I_low I_high]
"""
import os
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_ab")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.solvers.batch import (
    ilqg_batch_lanes)
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ILQGConfig, default_alphas)

B, T, N_CHAIN = 4096, 500, 3


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def main():
    i_low = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    i_high = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    f32 = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    # deep swing-up budget: keep every lane active through i_high
    # iterations so slope = one full iteration (max_iter well above the
    # budget, wider x0 noise than bench.py)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15, max_iter=300)
    x0 = default_x0(f32)
    x0s = x0[None, :] + (0.4 * jax.random.normal(
        jax.random.PRNGKey(0), (B, 4), f32)
        * jnp.array([1, 1, 0, 0], f32))
    u0s = jnp.zeros((B, T, 1), f32)

    def solve(u, steps):
        return ilqg_batch_lanes(model, None, x0s, u, lims=((-5.0, 5.0),),
                                cfg=cfg, derivs_tiles=tiles,
                                max_steps=steps)

    g = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), f32)
    fetch(g(z))
    base = min((lambda t0: (fetch(g(z)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(5))

    # compile once (shared program — max_steps is traced) + verify budgets
    # actually bind (all lanes still active at i_high)
    r = solve(u0s, i_high)
    it_hi = int(np.max(np.asarray(r.n_iters)))
    it_med = float(np.median(np.asarray(r.n_iters)))
    print(f"budget check: max n_iters at I={i_high}: {it_hi} "
          f"(median {it_med}) — want == {i_high}")
    fetch(r.cost_total)

    results = {}
    legs = [i_low, i_high] * 3
    for I in legs:
        best = results.get(I, float("inf"))
        t0 = time.perf_counter()
        rr = r
        for _ in range(N_CHAIN):
            u_dep = u0s + 0.0 * rr.cost_total[:, None, None]
            rr = solve(u_dep, I)
        fetch(rr.cost_total)
        dt = (time.perf_counter() - t0 - base) / N_CHAIN
        results[I] = min(best, dt)
        print(f"  I={I}: {dt*1e3/I:.4f} ms/iter ({dt*1e3:.2f} ms/solve)")

    slope = (results[i_high] - results[i_low]) / (i_high - i_low)
    intercept = results[i_low] - slope * i_low
    print(f"\nslope (true per-iteration) = {slope*1e3:.4f} ms")
    print(f"intercept (per-solve fixed: init sweep + replay + sanitize + "
          f"unpack + dispatch) = {intercept*1e3:.3f} ms")
    print(f"headline equivalent at I=20: "
          f"{(slope + intercept/20)*1e3:.4f} ms/iter")


if __name__ == "__main__":
    main()
