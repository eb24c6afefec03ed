"""End-to-end full DDP (second-order dynamics terms) vs iLQG.

The reference switches to full DDP when ``df`` supplies non-empty
``fxx/fxu/fuu`` (``src/iLQG.jl:231``); here ``Problem(second_order=True)``
builds them by autodiff. Both must reach the same optimum; DDP's quadratic
model should need substantially fewer iterations on the nonlinear problem.
"""
import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, make_pendcart_problem, default_x0)
from differentialdynamicprogramming_jl_tpu.problem import Problem
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ilqg, ILQGConfig, default_alphas)


def test_full_ddp_matches_and_converges_faster():
    spec = PendCartSpec()
    base = make_pendcart_problem(spec, derivs="autodiff", dtype=jnp.float64)
    ddp = Problem(dynamics=base.dynamics, cost=base.cost,
                  traj_cost=base.traj_cost, second_order=True)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15, tol_fun=1e-8, tol_grad=1e-8, max_iter=200)
    lims = jnp.array([[-10.0, 10.0]])
    x0 = default_x0(jnp.float64)
    u0 = jnp.zeros((300, 1))

    res_i = ilqg(base, x0, u0, lims=lims, cfg=cfg)
    res_d = ilqg(ddp, x0, u0, lims=lims, cfg=cfg)

    ci, cd = float(jnp.sum(res_i.cost)), float(jnp.sum(res_d.cost))
    np.testing.assert_allclose(cd, ci, rtol=1e-6)
    assert abs(float(res_d.x[-1, 0]) - np.pi) < 0.01      # swing-up reached
    # second-order model: materially fewer iterations (observed 53 vs 148)
    assert int(res_d.n_iters) < int(res_i.n_iters) * 0.7
