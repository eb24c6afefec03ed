"""Benchmark: batched control-limited pendulum-cart iLQG on the current
backend (TPU under the driver; CPU with JAX_PLATFORMS-equivalent config).

Workload = BASELINE.json north star: B=4096 independent pendcart scenarios
(varied x0), T=500, control-limited (boxQP active), f32. Measures the
steady-state per-iLQG-iteration latency of the batched solver (derivatives +
backward pass + 6-α line-searched forward pass for every scenario, i.e. one
full outer-loop step) and reports it against the <10 ms/iteration target.

Prints ONE JSON line:
  {"metric": ..., "value": ms_per_iter, "unit": "ms", "vs_baseline": 10/value}
"""
import json
import time

import jax
import jax.numpy as jnp


B = 4096
T = 500
N_WARMUP = 2
N_MEASURE = 5
TARGET_MS = 10.0


def build():
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        PendCartSpec, make_pendcart_problem, default_x0)
    from differentialdynamicprogramming_jl_tpu.ops.backward import backward_pass
    from differentialdynamicprogramming_jl_tpu.ops.forward import (
        forward_pass, line_search)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqg import default_alphas

    dtype = jnp.float32
    spec = PendCartSpec()
    problem = make_pendcart_problem(spec, derivs="autodiff", dtype=dtype)
    lims = jnp.array([[-5.0, 5.0]], dtype)
    alphas = jnp.asarray(default_alphas(0.2, -3.0, 6), dtype)
    derivs_fn = problem.make_derivs()

    x0 = default_x0(dtype)
    key = jax.random.PRNGKey(0)
    x0s = x0[None, :] + (0.2 * jax.random.normal(key, (B, 4), dtype)
                         * jnp.array([1, 0, 0, 0], dtype))
    u0s = jnp.zeros((B, T, 1), dtype)

    @jax.jit
    def rollout(x0s, u0s):
        return jax.vmap(lambda a, b: forward_pass(problem, a, b, lims=lims)
                        )(x0s, u0s)

    @jax.jit
    def iteration(x, u, cost_total, lam):
        """One full iLQG outer-loop iteration for every scenario."""
        def per_scenario(x_i, u_i, c_i, lam_i):
            derivs = derivs_fn(x_i, u_i)
            bp = backward_pass(derivs, u_i, lam=lam_i, reg_type=2,
                               lims=lims, use_limits=True)
            ls = line_search(problem, x_i[0], u_i, x_i, c_i, bp.policy,
                             bp.dV, alphas, lims)
            accept = ls.done & (~bp.diverged)
            lam_new = jnp.where(accept,
                                jnp.maximum(lam_i / 1.6, 1e-6),
                                jnp.minimum(lam_i * 1.6, 1e15))
            return (jnp.where(accept, ls.x, x_i),
                    jnp.where(accept, ls.u, u_i),
                    jnp.where(accept, jnp.sum(ls.cost), c_i),
                    lam_new)
        return jax.vmap(per_scenario)(x, u, cost_total, lam)

    return rollout, iteration, x0s, u0s


def main():
    rollout, iteration, x0s, u0s = build()
    ro = rollout(x0s, u0s)
    state = (ro.x, ro.u, jnp.sum(ro.cost, axis=-1),
             jnp.ones((B,), jnp.float32))
    for _ in range(N_WARMUP):
        state = iteration(*state)
    jax.block_until_ready(state[0])

    times = []
    for _ in range(N_MEASURE):
        t0 = time.perf_counter()
        state = iteration(*state)
        jax.block_until_ready(state[0])
        times.append(time.perf_counter() - t0)

    ms = min(times) * 1e3
    print(json.dumps({
        "metric": f"ilqg_iter_latency_b{B}_T{T}_pendcart_boxqp_f32",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
