"""Layout experiment: vmap over leading axis (batch-major) vs trailing axis
(batch-minor → scenario batch on VPU lanes) for the backward/forward hot
paths at B=4096, T=500 pendcart."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, make_pendcart_problem, default_x0)
from differentialdynamicprogramming_jl_tpu.ops.backward import backward_pass
from differentialdynamicprogramming_jl_tpu.ops.forward import forward_pass

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
    print(f"{name:>32}: {min(ts)*1e3:8.3f} ms")
    return out


def main():
    dtype = jnp.float32
    spec = PendCartSpec()
    problem = make_pendcart_problem(spec, derivs="autodiff", dtype=dtype)
    lims = jnp.array([[-5.0, 5.0]], dtype)
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

    d = jax.jit(jax.vmap(derivs_fn))(x, u)

    # batch-major (current)
    bp_maj = jax.jit(jax.vmap(lambda dd, uu: backward_pass(
        dd, uu, lam=1.0, reg_type=2, lims=lims, use_limits=True)))
    timeit("backward vmap(axis 0)", bp_maj, d, u)

    # batch-minor: move batch axis to the end of every array
    d_min = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1), d)
    u_min = jnp.moveaxis(u, 0, -1)
    bp_min = jax.jit(jax.vmap(
        lambda dd, uu: backward_pass(dd, uu, lam=1.0, reg_type=2, lims=lims,
                                     use_limits=True),
        in_axes=-1, out_axes=-1))
    timeit("backward vmap(axis -1)", bp_min, d_min, u_min)

    # forward comparisons
    fp_maj = jax.jit(jax.vmap(lambda a, b: forward_pass(problem, a, b,
                                                        lims=lims)))
    timeit("forward vmap(axis 0)", fp_maj, x0s, u0s)

    x0s_min = jnp.moveaxis(x0s, 0, -1)
    u0s_min = jnp.moveaxis(u0s, 0, -1)
    fp_min = jax.jit(jax.vmap(lambda a, b: forward_pass(problem, a, b,
                                                        lims=lims),
                              in_axes=-1, out_axes=-1))
    timeit("forward vmap(axis -1)", fp_min, x0s_min, u0s_min)

    # derivatives comparison
    timeit("derivs vmap(axis 0)", jax.jit(jax.vmap(derivs_fn)), x, u)
    x_min = jnp.moveaxis(x, 0, -1)
    u_min2 = jnp.moveaxis(u, 0, -1)
    timeit("derivs vmap(axis -1)",
           jax.jit(jax.vmap(derivs_fn, in_axes=-1, out_axes=-1)),
           x_min, u_min2)


if __name__ == "__main__":
    main()
