"""Split the driver's per-solve fixed cost (~3.3 ms, tools/ab_overhead.py)
into IN-PROGRAM work vs PER-DISPATCH relay overhead (round 5).

``max_steps=0`` runs the full solve program with ZERO loop iterations —
what remains is exactly the fixed work: initial-rollout α-sweep, the
post-loop full-emission backward replay, the reason-5 sanitize selects,
the batch-major unpack, plus one dispatch.

  host   N solve(max_steps=0) calls dispatched from the host, one fetch
         → fixed_in_program + per_dispatch
  device the same N solves chained inside ONE jitted fori_loop (body
         traced once) → fixed_in_program only (single dispatch)

Usage: python tools/ab_fixedwork.py host|device [n]
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

B, T = 4096, 500


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "host"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else (40 if mode == "host"
                                                    else 40)
    f32 = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
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

    if mode == "host":
        r = solve(u0s, 0)
        fetch(r.cost_total)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            rr = r
            for _ in range(n):
                u_dep = u0s + 0.0 * rr.cost_total[:, None, None]
                rr = solve(u_dep, 0)
            fetch(rr.cost_total)
            best = min(best, (time.perf_counter() - t0 - base) / n)
        print(f"AB fixedwork [host]: {best*1e3:.4f} ms/solve "
              f"(in-program fixed + per-dispatch; n={n})")
    else:
        @jax.jit
        def chain(u0):
            def body(i, u):
                rr = solve(u, 0)
                return u + 0.0 * rr.cost_total[:, None, None]
            return jax.lax.fori_loop(0, n, body, u0)

        fetch(chain(u0s))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            fetch(chain(u0s))
            best = min(best, (time.perf_counter() - t0 - base) / n)
        print(f"AB fixedwork [device]: {best*1e3:.4f} ms/solve "
              f"(in-program fixed only; n={n})")


if __name__ == "__main__":
    main()
