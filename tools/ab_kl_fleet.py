"""KL-tier fleet scheduler on a HETEROGENEOUS workload (VERDICT r4 item 5).

Round 4 measured `ilqgkl_fleet` at 0.32× on a uniform pendcart GPS fleet
(η-bisection spread median 7 / max 9 — nothing to compact). This
constructs the workload the scheduler exists for: mixed scenario
difficulty — per-lane trust-region-center quality drawn from a 4-way mix
of control-noise scales (0.05×/0.2×/1×/3×) — so easy lanes satisfy the
KL constraint in a few bisection steps while hard lanes iterate deep.

Protocol: report the lock-step per-lane iteration spread first (the
precondition), then interleaved lock-step vs fleet legs, best-of-3,
fetch-synchronized. Records a win or the scoped negative.

Usage: python tools/ab_kl_fleet.py [B] [chunk_iters] [growth]
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
    PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles,
    make_pendcart_problem)
from differentialdynamicprogramming_jl_tpu.ops.forward import forward_pass
from differentialdynamicprogramming_jl_tpu.policy import GaussianPolicy
from differentialdynamicprogramming_jl_tpu.solvers.batch_kl import (
    ilqgkl_batch_lanes)
from differentialdynamicprogramming_jl_tpu.solvers.fleet import ilqgkl_fleet
from differentialdynamicprogramming_jl_tpu.solvers.ilqgkl import ILQGKLConfig

T = 500


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def build(B):
    dtype = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    problem = make_pendcart_problem(spec, derivs="euler", dtype=dtype)

    key = jax.random.PRNGKey(0)
    x0s = (default_x0(dtype)[None, :]
           + 0.2 * jax.random.normal(key, (B, 4), dtype)
           * jnp.array([1, 1, 0, 0], dtype))
    # 4-way difficulty mix: the control-noise scale of the trust-region
    # center varies 60× across lanes → the measured KL (and thus the η
    # bisection depth) is genuinely heterogeneous
    scales = jnp.array([0.05, 0.2, 1.0, 3.0], dtype)[
        jnp.arange(B) % 4]
    u0s = (scales[:, None, None]
           * 0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1),
                                     dtype))
    ro = jax.vmap(lambda a, b: forward_pass(problem, a, b))(x0s, u0s)
    prev = GaussianPolicy.zeros(T, 4, 1, dtype)
    prev = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), prev)
    prev = prev._replace(k=ro.u)
    d = jax.vmap(problem.make_derivs())(ro.x, ro.u)
    cost0 = jnp.sum(ro.cost, -1)
    return model, tiles, ro, prev, d, cost0


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    ci = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    gr = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    per_step = "perstep" in sys.argv
    model, tiles, ro, prev, d, cost0 = build(B)
    cfg = ILQGKLConfig(kl_step=0.5, max_iter=40,
                       constrain_per_step=per_step, gd_alpha=0.01)
    args = (model, tiles, ro.x, prev, d.fx)

    g = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    fetch(g(z))
    base = min((lambda t0: (fetch(g(z)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(5))

    res = ilqgkl_batch_lanes(*args, cost0, cfg=cfg)
    iters = np.asarray(res.n_iters)
    fetch(res.cost_total)
    print(f"lock-step per-lane iteration spread: median "
          f"{float(np.median(iters)):.0f}, p90 "
          f"{float(np.percentile(iters, 90)):.0f}, max {int(iters.max())}",
          flush=True)

    fr = ilqgkl_fleet(*args, cost0, cfg=cfg, chunk_iters=ci,
                      chunk_growth=gr)
    fetch(fr.cost_total)
    agree = int(np.sum(np.isclose(np.asarray(fr.cost_total),
                                  np.asarray(res.cost_total), rtol=1e-6)))
    print(f"fleet result parity: {agree}/{B} costs agree", flush=True)

    lock = fleet = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        r = ilqgkl_batch_lanes(model, tiles, ro.x, prev, d.fx,
                               cost0 + 0.0 * res.cost_total, cfg=cfg)
        fetch(r.cost_total)
        lock = min(lock, time.perf_counter() - t0 - base)
        t0 = time.perf_counter()
        f = ilqgkl_fleet(*args, cost0 + 0.0 * fr.cost_total, cfg=cfg,
                         chunk_iters=ci, chunk_growth=gr)
        fetch(f.cost_total)
        fleet = min(fleet, time.perf_counter() - t0 - base)
        print(f"rep {rep}: lock {lock*1e3:.1f} ms  fleet {fleet*1e3:.1f} ms",
              flush=True)

    print(f"AB kl_fleet: lock-step {lock*1e3:.1f} ms "
          f"({B/lock:.0f} solves/s) vs fleet[ci={ci},g={gr:g}] "
          f"{fleet*1e3:.1f} ms ({B/fleet:.0f} solves/s) — "
          f"{lock/fleet:.2f}x")


if __name__ == "__main__":
    main()
