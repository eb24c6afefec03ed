"""Planar quadrotor (models/quadrotor.py) — third benchmark family and the
showcase for the fully-autodiff lane path: the model defines ONLY tile
dynamics/cost; ``autodiff_derivs_tiles`` supplies the backward kernel's
derivative expansion (no hand-written Jacobians anywhere).

No reference counterpart (the reference ships pendcart + LTI only); parity
here is cross-tier: lane/Pallas vs the XLA autodiff driver.
"""
import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.quadrotor import (
    QuadrotorSpec, quadrotor_lanes, make_quadrotor_problem, default_x0)
from differentialdynamicprogramming_jl_tpu.ops.pallas.autodiff_tiles import (
    autodiff_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.solvers.batch import (
    ilqg_batch_lanes)
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ilqg, ILQGConfig, default_alphas)


def test_quadrotor_xla_converges_to_hover():
    """f64 XLA tier, full horizon: from a displaced/tilted start the solver
    must fly to the hover goal (height 1 m) while honoring the per-rotor
    thrust box (0, u_max); at the hover fixed point both rotors sit at
    u_hover, strictly inside the box."""
    dtype = jnp.float64
    spec = QuadrotorSpec()
    problem = make_quadrotor_problem(spec, dtype=dtype)
    T = 150
    x0 = default_x0(dtype)
    u0 = jnp.full((T, 2), spec.u_hover, dtype)
    lims = jnp.asarray(spec.lims, dtype)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 8), reg_type=2,
                     lam_max=1e15, max_iter=40, iter_cap=60)
    res = ilqg(problem, x0, u0, lims=lims, cfg=cfg)

    cost0 = float(jnp.sum(problem.trajectory_cost(
        *_rollout(problem, x0, u0))))
    assert float(jnp.sum(res.cost)) < 0.5 * cost0  # real descent
    u = np.asarray(res.u)
    assert u.min() >= -1e-9 and u.max() <= spec.u_max + 1e-9
    x = np.asarray(res.x)
    # hover reached and held: last quarter of the horizon near the goal
    tail = x[3 * T // 4:]
    assert abs(tail[:, 2].mean() - 1.0) < 0.08       # height
    assert abs(tail[:, 0].mean()) < 0.08             # lateral position
    assert np.abs(tail[:, 4]).max() < 0.1            # tilt
    # steady-state thrust ≈ hover thrust on both rotors
    u_tail = u[3 * T // 4:]
    np.testing.assert_allclose(u_tail.mean(axis=0),
                               [spec.u_hover, spec.u_hover], atol=0.15)


def _rollout(problem, x0, u0):
    from differentialdynamicprogramming_jl_tpu.ops.forward import (
        forward_pass)
    ro = forward_pass(problem, x0, u0, policy=None, lims=None)
    return ro.x, ro.u


def test_quadrotor_lanes_matches_vmap_driver():
    """Lane driver with FULLY autodiff-derived tiles (m=2 in-kernel box-QP
    enumeration path) vs the vmap'd XLA driver — tiny shapes, interpret
    mode; solver-level outcomes must agree (CLAUDE.md numerics note)."""
    dtype = jnp.float32
    spec = QuadrotorSpec()
    problem = make_quadrotor_problem(spec, dtype=dtype)
    model = quadrotor_lanes(spec)
    B, T = 8, 6
    x0s = (default_x0(dtype)[None, :]
           + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, 6), dtype)
           * jnp.asarray([1, 0, 1, 0, 0.5, 0], dtype))
    u0s = jnp.full((B, T, 2), spec.u_hover, dtype)
    u0s = u0s + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 2),
                                        dtype)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 3), reg_type=2,
                     lam_max=1e15, max_iter=2, iter_cap=3)
    lims = jnp.asarray(spec.lims, dtype)

    ref = jax.vmap(lambda a, b: ilqg(problem, a, b, lims=lims, cfg=cfg)
                   )(x0s, u0s)
    out = ilqg_batch_lanes(model, None, x0s, u0s, lims=spec.lims, cfg=cfg,
                           derivs_tiles=autodiff_derivs_tiles(model),
                           kt_backward=2, kt_forward=2, interpret=True)

    np.testing.assert_allclose(np.asarray(out.cost_total),
                               np.asarray(jnp.sum(ref.cost, -1)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.reason),
                                  np.asarray(ref.reason))
    u = np.asarray(out.u)
    assert u.min() >= -1e-6 and u.max() <= spec.u_max + 1e-6
