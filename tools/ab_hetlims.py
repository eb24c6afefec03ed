"""Price the heterogeneous-lims / custom-diff fast path at production
scale (VERDICT r4 item 3): B=4096, T=500 pendcart driver, fixed
20-iteration budget, three interleaved legs in one session:

  static   lims=((-5,5),) folded into the kernels as constants
  het      lims as a per-scenario (B, m, 2) array — the traced
           ``lims_lanes`` stream adds 2m input slots to BOTH kernels
  diff     static lims + an explicit ``LanesModel.diff`` (elementwise
           subtraction, same semantics as the default) — prices the
           custom-diff hook's indirection

Same VALUES in all legs, so the solves are semantically identical
(`tests/test_heterogeneous_lims.py` asserts bit-exactness at toy scale);
only the data path differs. Reference: lims are runtime data
(``src/iLQG.jl:124``), diff_fun ``src/iLQG.jl:131``.
"""
import dataclasses
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

B, T, ITERS, N_CHAIN = 4096, 500, 20, 3


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def main():
    f32 = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    model_diff = dataclasses.replace(
        model, diff=lambda x, x_old: [x[i] - x_old[i]
                                      for i in range(len(x))])
    tiles = pendcart_derivs_tiles(spec)
    tiles_diff = pendcart_derivs_tiles(spec)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15)
    x0 = default_x0(f32)
    x0s = x0[None, :] + (0.2 * jax.random.normal(
        jax.random.PRNGKey(0), (B, 4), f32)
        * jnp.array([1, 0, 0, 0], f32))
    u0s = jnp.zeros((B, T, 1), f32)
    lims_static = ((-5.0, 5.0),)
    lims_het = np.tile(np.array([[-5.0, 5.0]], np.float32), (B, 1, 1))

    legs = {
        "static": lambda u: ilqg_batch_lanes(
            model, None, x0s, u, lims=lims_static, cfg=cfg,
            derivs_tiles=tiles, max_steps=ITERS),
        "het": lambda u: ilqg_batch_lanes(
            model, None, x0s, u, lims=lims_het, cfg=cfg,
            derivs_tiles=tiles, max_steps=ITERS),
        "diff": lambda u: ilqg_batch_lanes(
            model_diff, None, x0s, u, lims=lims_static, cfg=cfg,
            derivs_tiles=tiles_diff, max_steps=ITERS),
    }

    g = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), f32)
    fetch(g(z))
    base = min((lambda t0: (fetch(g(z)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(5))

    warm, times = {}, {}
    for tag, run in legs.items():
        warm[tag] = run(u0s)
        fetch(warm[tag].cost_total)
        print(f"compiled {tag}", flush=True)

    # semantic check: identical costs across legs (same values)
    c0 = np.asarray(warm["static"].cost_total)
    for tag in ("het", "diff"):
        agree = int(np.sum(np.asarray(warm[tag].cost_total) == c0))
        print(f"  {tag}: bit-equal cost lanes vs static: {agree}/{B}")

    for rep in range(4):
        for tag, run in legs.items():
            r = warm[tag]
            t0 = time.perf_counter()
            for _ in range(N_CHAIN):
                r = run(u0s + 0.0 * r.cost_total[:, None, None])
            fetch(r.cost_total)
            dt = (time.perf_counter() - t0 - base) / (N_CHAIN * ITERS)
            times.setdefault(tag, []).append(dt)
            warm[tag] = r
        print(f"rep {rep}: " + "  ".join(
            f"{t}={times[t][-1]*1e3:.4f}" for t in legs), flush=True)

    for tag in legs:
        ms = sorted(times[tag])
        med = ms[len(ms) // 2]
        print(f"AB hetlims [{tag}]: best {min(ms)*1e3:.4f} ms/iter, "
              f"median {med*1e3:.4f} (B={B}, T={T}, I={ITERS})")


if __name__ == "__main__":
    main()
