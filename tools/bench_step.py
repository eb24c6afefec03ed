"""Microbenchmark: ONE stripped iLQG iteration step on lane state (TPU).

This is the kernel-level step latency (ilqg_iteration_lanes: no lambda-retry
loop, no accept/done bookkeeping, no trace) — the hot path of an MPC loop.
The HEADLINE bench (bench.py at the repo root) times the full product
driver ilqg_batch_lanes instead; keep this one for kernel A/B work.

Workload = BASELINE.json north star: B=4096 independent pendcart scenarios
(varied x0), T=500, control-limited (boxQP active), f32. Measures the
steady-state latency of one full iLQG outer-loop iteration for the whole
fleet — packed analytic derivatives + Pallas backward kernel (Riccati
recursion + boxQP, batch-on-lanes) + Pallas 6-α line-searched forward pass —
against the <10 ms/iteration target.

Timing note: under the axon TPU relay, ``jax.block_until_ready`` does not
reliably block, so the harness queues N dependent iterations and forces
completion with one host scalar fetch, subtracting the measured fetch
baseline (see tools/timing.py).

Prints ONE JSON line:
  {"metric": ..., "value": ms_per_iter, "unit": "ms", "vs_baseline": 10/value}
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import fetch_baseline  # noqa: E402  (single timing protocol)

B = 4096
T = 500
N_CHAIN = 20
TARGET_MS = 10.0


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def build():
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles)
    from differentialdynamicprogramming_jl_tpu.ops.pallas.pack import (
        to_lanes, vec_to_lanes)
    from differentialdynamicprogramming_jl_tpu.ops.pallas.forward_kernel import (
        forward_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.batch import (
        ilqg_iteration_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
        ILQGConfig, default_alphas)

    dtype = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    lims = ((-5.0, 5.0),)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15)

    x0 = default_x0(dtype)
    key = jax.random.PRNGKey(0)
    x0s = x0[None, :] + (0.2 * jax.random.normal(key, (B, 4), dtype)
                         * jnp.array([1, 0, 0, 0], dtype))
    u0s = jnp.zeros((B, T, 1), dtype)

    # initial rollout in lane layout (u = 1·u0 via the k:=u0 trick)
    x0_l = to_lanes(x0s[:, None, :], B)[0]
    u_l = to_lanes(u0s, B)
    L = x0_l.shape[1:]
    traj0 = jnp.zeros((T, 5) + L, dtype)
    gains0 = jnp.concatenate([u_l, jnp.zeros((T, 4) + L, dtype)], axis=1)
    fb = forward_lanes(traj0, gains0, x0_l, jnp.ones((1,) + L, dtype),
                       model=model, lims=lims, gk=0, gK=1, emit_traj=True,
                       k_t=16)
    tot = fb.totals[0]
    lam = jnp.ones(L, dtype)

    step = jax.jit(ilqg_iteration_lanes(model, None, lims, cfg,
                                        derivs_tiles=tiles))
    return step, (fb.traj, tot, lam)


def main():
    step, state = build()
    base = fetch_baseline()

    # warmup: compile + a couple of real iterations
    for _ in range(2):
        state = step(*state)
    _fetch(state)

    # best-of-5: latency through the shared axon relay drifts with tenancy
    # (±40% observed between sessions — BASELINE.md round 2), so take the
    # quietest window
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        s = state
        for _ in range(N_CHAIN):
            s = step(*s)
        _fetch(s)
        dt = (time.perf_counter() - t0 - base) / N_CHAIN
        best = min(best, dt)

    ms = best * 1e3
    print(json.dumps({
        "metric": f"ilqg_iter_latency_b{B}_T{T}_pendcart_boxqp_f32",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
