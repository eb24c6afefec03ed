"""Phase-level profiling of the batched iLQG iteration on the current backend.

Times derivatives / backward pass / line-searched forward pass separately at
the BASELINE.json workload (B=4096, T=500 pendcart, control-limited, f32).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, make_pendcart_problem, default_x0)
from differentialdynamicprogramming_jl_tpu.ops.backward import backward_pass
from differentialdynamicprogramming_jl_tpu.ops.forward import (
    forward_pass, line_search)
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import default_alphas

B = 4096
T = 500


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:>24}: {min(ts)*1e3:8.3f} ms")
    return out


def main():
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

    rollout = jax.jit(jax.vmap(
        lambda a, b: forward_pass(problem, a, b, lims=lims)))
    ro = rollout(x0s, u0s)
    x, u = ro.x, ro.u
    c = jnp.sum(ro.cost, axis=-1)

    derivs_b = jax.jit(jax.vmap(derivs_fn))
    d = timeit("derivatives", derivs_b, x, u)

    bp_b = jax.jit(jax.vmap(lambda dd, uu: backward_pass(
        dd, uu, lam=1.0, reg_type=2, lims=lims, use_limits=True)))
    bp = timeit("backward_pass", bp_b, d, u)

    ls_b = jax.jit(jax.vmap(lambda x_i, u_i, c_i, pol, dV: line_search(
        problem, x_i[0], u_i, x_i, c_i, pol, dV, alphas, lims)))
    timeit("line_search(6 alpha)", ls_b, x, u, c, bp.policy, bp.dV)

    fp1 = jax.jit(jax.vmap(lambda x_i, u_i, pol: forward_pass(
        problem, x_i[0], u_i, x_i, 1.0, pol, lims)))
    timeit("single forward_pass", fp1, x, u, bp.policy)


if __name__ == "__main__":
    main()
