"""Golden-file regression vs the INDEPENDENT NumPy oracle.

tests/golden.npz is recorded by tools/record_golden.py from tests/oracle.py
(eager NumPy, reference control flow, zero shared code with the JAX path) —
so these tests catch a shared bug in the JAX implementation, not just drift
against itself. Covers iLQG (linear + control-limited pendcart), boxQP
across its result codes, and scalar-η iLQGkl."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden.npz not recorded")
    d = dict(np.load(GOLDEN).items())
    assert int(d.get("provenance_oracle", 0)) == 1, \
        "golden.npz must be recorded from tests/oracle.py"
    return d


def test_linear_golden(golden):
    from differentialdynamicprogramming_jl_tpu.models.linear import (
        random_lti, make_lti_problem)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
        ilqg, ILQGConfig)
    T = 400
    spec = random_lti(jax.random.PRNGKey(0), n=10, m=2, T=T,
                      dtype=jnp.float64)
    prob = make_lti_problem(spec, T)
    res = ilqg(prob, spec.x0, spec.u0, cfg=ILQGConfig(max_iter=100))
    np.testing.assert_allclose(float(jnp.sum(res.cost)),
                               golden["linear_cost"], rtol=1e-8)
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(res.u))),
                               golden["linear_u_abs"], rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(res.u)),
                               golden["linear_u_sum"], atol=1e-6)


@pytest.mark.smoke
def test_pendcart_golden(golden):
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        PendCartSpec, make_pendcart_problem, default_x0)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
        ilqg, ILQGConfig, default_alphas)
    prob = make_pendcart_problem(PendCartSpec(), derivs="zoh",
                                 dtype=jnp.float64)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15, tol_fun=1e-8, tol_grad=1e-8,
                     max_iter=300)
    res = ilqg(prob, default_x0(jnp.float64), jnp.zeros((300, 1)),
               lims=jnp.array([[-10.0, 10.0]]), cfg=cfg)
    np.testing.assert_allclose(float(jnp.sum(res.cost)),
                               golden["pendcart_cost"], rtol=1e-6)
    np.testing.assert_allclose(float(res.x[-1, 0]),
                               golden["pendcart_angle"], rtol=1e-4)
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(res.u))),
                               golden["pendcart_u_abs"], rtol=1e-4)


# the recorder's case constructions, duplicated locally so the test has no
# import dependency on tools/ (kept in sync by the value assertions)
def _boxqp_cases():
    key = jax.random.PRNGKey(0)
    A = np.asarray(jax.random.normal(key, (50, 50), jnp.float64))
    H50 = A @ A.T + 0.1 * np.eye(50)
    g50 = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (50,),
                                       jnp.float64))
    eye3 = np.eye(3)
    return {
        "n50": (H50, g50, -np.ones(50), np.ones(50), np.zeros(50)),
        "all_clamped": (eye3, np.array([10., -10., 10.]), -np.ones(3),
                        np.ones(3), np.zeros(3)),
        "interior": (2.0 * eye3, np.array([0.5, -0.25, 0.1]), -np.ones(3),
                     np.ones(3), np.zeros(3)),
        "non_pd": (np.diag([1.0, -1.0, 1.0]), np.array([1.0, 1.0, 1.0]),
                   -np.ones(3), np.ones(3), np.zeros(3)),
    }


@pytest.mark.parametrize("case", ["n50", "all_clamped", "interior",
                                  "non_pd"])
def test_boxqp_golden(golden, case):
    from differentialdynamicprogramming_jl_tpu.ops.boxqp import boxqp
    H, g, lo, hi, x0 = [jnp.asarray(a) for a in _boxqp_cases()[case]]
    qr = boxqp(H, g, lo, hi, x0)
    np.testing.assert_allclose(float(qr.value),
                               golden[f"boxqp_{case}_value"], atol=1e-10)
    assert int(qr.result) == int(golden[f"boxqp_{case}_result"])
    np.testing.assert_allclose(float(jnp.sum(qr.x)),
                               golden[f"boxqp_{case}_x_sum"], atol=1e-8)


def test_ilqgkl_golden(golden):
    """Scalar-η iLQGkl reproduces the oracle's η, divergence, cost and
    iteration count on the LTI T=60 case."""
    from differentialdynamicprogramming_jl_tpu import (
        ilqg_kl, ILQGKLConfig, GaussianPolicy, forward_pass)
    from differentialdynamicprogramming_jl_tpu.models.linear import (
        random_lti, make_lti_problem, SimpleLTVModel)
    T, n, m = 60, 4, 2
    spec = random_lti(jax.random.PRNGKey(0), n=n, m=m, T=T,
                      dtype=jnp.float64)
    prob = make_lti_problem(spec, T)
    model = SimpleLTVModel.from_lti(spec.A, spec.B, T)
    ro = forward_pass(prob, spec.x0, spec.u0)
    traj = GaussianPolicy.zeros(T, n, m, jnp.float64)._replace(k=ro.u)
    res = ilqg_kl(prob, ro.x, traj, model, ro.cost,
                  cfg=ILQGKLConfig(kl_step=2.0, max_iter=30))
    np.testing.assert_allclose(float(jnp.sum(res.cost)),
                               golden["ilqgkl_cost"], rtol=1e-9)
    np.testing.assert_allclose(float(res.eta), golden["ilqgkl_eta"],
                               rtol=1e-9)
    np.testing.assert_allclose(float(res.divergence),
                               golden["ilqgkl_divergence"], rtol=1e-8)
    assert int(res.n_iters) == int(golden["ilqgkl_iters"])
    assert bool(res.satisfied) == bool(golden["ilqgkl_satisfied"])


def test_ilqgkl_perstep_golden(golden):
    """Per-timestep-η ADAM branch (reference ``constrain_per_step``,
    ``src/iLQGkl.jl:185-236``) reproduces the oracle's cost, mean η/KL and
    iteration count on the LTI T=60 case — regression anchor for the
    round-3 dual-update surface."""
    from differentialdynamicprogramming_jl_tpu import (
        ilqg_kl, ILQGKLConfig, GaussianPolicy, forward_pass)
    from differentialdynamicprogramming_jl_tpu.models.linear import (
        random_lti, make_lti_problem, SimpleLTVModel)
    T, n, m = 60, 4, 2
    spec = random_lti(jax.random.PRNGKey(0), n=n, m=m, T=T,
                      dtype=jnp.float64)
    prob = make_lti_problem(spec, T)
    model = SimpleLTVModel.from_lti(spec.A, spec.B, T)
    ro = forward_pass(prob, spec.x0, spec.u0)
    traj = GaussianPolicy.zeros(T, n, m, jnp.float64)._replace(k=ro.u)
    res = ilqg_kl(prob, ro.x, traj, model, ro.cost,
                  cfg=ILQGKLConfig(kl_step=1e-5, max_iter=15,
                                   constrain_per_step=True, gd_alpha=0.3))
    np.testing.assert_allclose(float(jnp.sum(res.cost)),
                               golden["ilqgkl_ps_cost"], rtol=1e-9)
    np.testing.assert_allclose(float(jnp.mean(res.eta)),
                               golden["ilqgkl_ps_eta_mean"], rtol=1e-8)
    np.testing.assert_allclose(float(jnp.mean(res.divergence)),
                               golden["ilqgkl_ps_div_mean"], rtol=1e-7)
    assert int(res.n_iters) == int(golden["ilqgkl_ps_iters"])
    assert bool(res.satisfied) == bool(golden["ilqgkl_ps_satisfied"])


def test_quadrotor_golden(golden):
    """Planar-quadrotor hover (the autodiff-tiles benchmark family,
    models/quadrotor.py) vs the oracle with hand-derived Jacobians —
    regression anchor for the round-3 model addition."""
    from differentialdynamicprogramming_jl_tpu.models.quadrotor import (
        QuadrotorSpec, make_quadrotor_problem, default_x0)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
        ilqg, ILQGConfig, default_alphas)
    spec = QuadrotorSpec()
    prob = make_quadrotor_problem(spec, dtype=jnp.float64)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15, max_iter=200)
    res = ilqg(prob, default_x0(jnp.float64),
               jnp.full((150, 2), spec.u_hover, jnp.float64),
               lims=jnp.asarray(spec.lims, jnp.float64), cfg=cfg)
    np.testing.assert_allclose(float(jnp.sum(res.cost)),
                               golden["quadrotor_cost"], rtol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(res.u))),
                               golden["quadrotor_u_abs"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.x[-1]),
                               golden["quadrotor_xT"], atol=1e-5)
