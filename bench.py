"""Headline benchmark: the PRODUCT driver — a full fixed-budget
``ilqg_batch_lanes`` solve on TPU, reported per iteration.

Workload = BASELINE.json north star: B=4096 independent control-limited
pendulum-cart scenarios (varied x0), T=500, f32, boxQP active. Times a
complete 20-iteration-budget solve through the public batch driver —
initial rollout α-sweep, in-kernel analytic derivatives, Pallas backward
kernel (Riccati + boxQP), per-scenario λ-retry, 6-α line search, accept/
reject + termination bookkeeping — and divides by the iteration budget.
(The stripped single-step microbench lives in tools/bench_step.py.)

Timing note: under the axon TPU relay, ``jax.block_until_ready`` does not
reliably block, so the harness queues N data-dependent solves and forces
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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))
from timing import fetch_baseline  # noqa: E402  (single timing protocol)

B = 4096
T = 500
ITER_BUDGET = 20
N_CHAIN = 3
TARGET_MS = 10.0
METRIC = f"ilqg_full_driver_iter_latency_b{B}_T{T}_pendcart_boxqp_f32"


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def build():
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles)
    from differentialdynamicprogramming_jl_tpu.solvers.batch import (
        ilqg_batch_lanes)
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

    def solve(x0s_, u0s_):
        return ilqg_batch_lanes(model, None, x0s_, u0s_, lims=lims, cfg=cfg,
                                derivs_tiles=tiles,
                                max_steps=ITER_BUDGET)

    return solve, x0s, u0s


def _probe_devices(timeout_s: float = 240.0) -> bool:
    """The axon relay can be down for hours (jax.devices() then hangs
    forever, CLAUDE.md). Probe it in a killable subprocess so the bench
    fails FAST and loud instead of hanging the caller."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _probe_devices():
        # still ONE JSON line, machine-readable, with an honest null value
        # (no stale/fabricated number) — plus a loud stderr note
        print(json.dumps({
            "metric": METRIC,
            "value": None,
            "unit": "ms",
            "vs_baseline": None,
            "error": "accelerator unreachable (axon relay down); "
                     "no measurement taken",
        }))
        print("bench.py: accelerator unreachable (device probe timed out "
              "— axon relay down?); no measurement taken", file=sys.stderr)
        sys.exit(1)
    solve, x0s, u0s = build()
    base = fetch_baseline()

    # warmup: compile + one real solve
    res = solve(x0s, u0s)
    _fetch(res.cost_total)
    # actual while_loop trips — equals ITER_BUDGET on this workload (no
    # swing-up lane converges in 20 iterations), but guard the division so
    # the metric cannot silently overclaim if the fleet ever exits early
    iters_run = int(np.max(np.asarray(res.n_iters)))
    assert 1 <= iters_run <= ITER_BUDGET, iters_run

    # best-of-5: latency through the shared axon relay drifts with tenancy
    # (±40% observed between sessions — BASELINE.md round 2)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        r = res
        for _ in range(N_CHAIN):
            # serialize the chained solves with a zero-valued data
            # dependency on the previous result
            u_dep = u0s + 0.0 * r.cost_total[:, None, None]
            r = solve(x0s, u_dep)
        _fetch(r.cost_total)
        dt = (time.perf_counter() - t0 - base) / (N_CHAIN * iters_run)
        best = min(best, dt)

    ms = best * 1e3
    print(json.dumps({
        "metric": METRIC,
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
