"""Record golden regression fixtures for the benchmark problems.

Runs the f64 XLA reference path on CPU (deterministic) and stores final
costs, controls checksums and convergence metadata in tests/golden.npz.
tests/test_golden.py asserts future rounds reproduce them — a behavioral
regression guard on top of the oracle/cost-bound parity tests.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.linear import (
    random_lti, make_lti_problem)
from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, make_pendcart_problem, default_x0)
from differentialdynamicprogramming_jl_tpu.ops.boxqp import boxqp
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ilqg, ILQGConfig, default_alphas)


def main():
    out = {}

    # linear T=400 (shorter than the demo for runtime, same construction)
    T = 400
    spec = random_lti(jax.random.PRNGKey(0), n=10, m=2, T=T,
                      dtype=jnp.float64)
    prob = make_lti_problem(spec, T)
    res = ilqg(prob, spec.x0, spec.u0, cfg=ILQGConfig(max_iter=100))
    out["linear_cost"] = float(jnp.sum(res.cost))
    out["linear_u_sum"] = float(jnp.sum(res.u))
    out["linear_u_abs"] = float(jnp.sum(jnp.abs(res.u)))
    out["linear_iters"] = int(res.n_iters)
    out["linear_reason"] = int(res.reason)

    # pendcart T=300 at ±10 (the feasible swing-up configuration)
    pspec = PendCartSpec()
    pprob = make_pendcart_problem(pspec, derivs="zoh", dtype=jnp.float64)
    pcfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                      lam_max=1e15, tol_fun=1e-8, tol_grad=1e-8,
                      max_iter=300)
    pres = ilqg(pprob, default_x0(jnp.float64), jnp.zeros((300, 1)),
                lims=jnp.array([[-10.0, 10.0]]), cfg=pcfg)
    out["pendcart_cost"] = float(jnp.sum(pres.cost))
    out["pendcart_angle"] = float(pres.x[-1, 0])
    out["pendcart_u_abs"] = float(jnp.sum(jnp.abs(pres.u)))

    # boxQP n=50
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (50, 50), jnp.float64)
    H = A @ A.T + 0.1 * jnp.eye(50)
    g = jax.random.normal(jax.random.PRNGKey(1), (50,), jnp.float64)
    qr = boxqp(H, g, -jnp.ones(50), jnp.ones(50), jnp.zeros(50))
    out["boxqp_value"] = float(qr.value)
    out["boxqp_result"] = int(qr.result)
    out["boxqp_x_sum"] = float(jnp.sum(qr.x))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden.npz")
    np.savez(path, **out)
    for k, v in out.items():
        print(f"{k}: {v}")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
