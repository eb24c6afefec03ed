"""Forward-pass / line-search / covariance unit tests."""
import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu import (
    forward_pass, line_search, forward_covariance, GaussianPolicy, Problem)
from differentialdynamicprogramming_jl_tpu.models.linear import (
    random_lti, make_lti_problem, SimpleLTVModel)
import pytest


def setup(key, T=30, n=4, m=2, dtype=jnp.float64):
    spec = random_lti(key, n=n, m=m, T=T, dtype=dtype)
    prob = make_lti_problem(spec, T)
    return spec, prob


@pytest.mark.smoke
def test_rollout_matches_manual_loop(key):
    T = 30
    spec, prob = setup(key, T)
    ro = forward_pass(prob, spec.x0, spec.u0)
    x = np.array(spec.x0)
    A, B = np.array(spec.A), np.array(spec.B)
    for t in range(T):
        np.testing.assert_allclose(np.array(ro.x[t]), x, atol=1e-12)
        x = A @ x + B @ np.array(spec.u0[t])
    # per-step costs
    Q, R = np.array(spec.Q), np.array(spec.R)
    xs, us = np.array(ro.x), np.array(spec.u0)
    c = 0.5 * (np.einsum('ti,ij,tj->t', xs, Q, xs)
               + np.einsum('ti,ij,tj->t', us, R, us))
    np.testing.assert_allclose(np.array(ro.cost), c, atol=1e-12)


def test_policy_feedback_and_clamp(key):
    """u_new = u + αk + K(x_new - x_old), clamped (src/forward_pass.jl:17-24)."""
    T, n, m = 10, 4, 2
    spec, prob = setup(key, T)
    pol = GaussianPolicy.zeros(T, n, m, jnp.float64)
    pol = pol._replace(k=jnp.ones((T, m)) * 3.0)
    lims = jnp.array([[-0.5, 0.5], [-0.5, 0.5]])
    ro = forward_pass(prob, spec.x0, jnp.zeros((T, m)),
                      x_old=jnp.zeros((T, n)), alpha=0.5, policy=pol,
                      lims=lims)
    # α·k = 1.5 clamps to 0.5 at t=0 where x_new - x_old = x0 ≠ 0 adds K·dx=0
    assert bool(jnp.all(ro.u <= 0.5 + 1e-12))
    assert bool(jnp.all(ro.u >= -0.5 - 1e-12))


def test_line_search_picks_first_acceptable(key):
    """Identical accept decision to the reference's serial backtracking:
    the largest α with reduce_ratio > min (src/iLQG.jl:267-281)."""
    T = 50
    spec, prob = setup(key, T)
    ro0 = forward_pass(prob, spec.x0, spec.u0)
    from differentialdynamicprogramming_jl_tpu import backward_pass
    derivs = prob.make_derivs()(ro0.x, ro0.u)
    bp = backward_pass(derivs, ro0.u, lam=1.0)
    alphas = jnp.power(10.0, jnp.linspace(0, -3, 11))
    ls = line_search(prob, spec.x0, ro0.u, ro0.x, jnp.sum(ro0.cost),
                     bp.policy, bp.dV, alphas)
    assert bool(ls.done)
    # verify the chosen α is the first acceptable one by direct enumeration
    for a in np.power(10.0, np.linspace(0, -3, 11)):
        ro = forward_pass(prob, spec.x0, ro0.u, ro0.x, a, bp.policy)
        dc = float(jnp.sum(ro0.cost) - jnp.sum(ro.cost))
        exp_red = float(-a * (bp.dV[0] + a * bp.dV[1]))
        ratio = dc / exp_red if exp_red > 0 else np.sign(dc)
        if ratio > 0:
            np.testing.assert_allclose(float(ls.alpha), a)
            np.testing.assert_allclose(float(ls.dcost), dc, rtol=1e-10)
            break


def test_forward_covariance_lyapunov(key):
    """Σxx satisfies the discrete Lyapunov iteration (src/forward_pass.jl:50)."""
    T, n, m = 8, 3, 2
    spec, prob = setup(key, T, n=n, m=m)
    model = SimpleLTVModel.from_lti(spec.A, spec.B, T)
    pol = GaussianPolicy.zeros(T, n, m, jnp.float64)
    K = 0.1 * jax.random.normal(key, (T, m, n), jnp.float64)
    pol = pol._replace(K=K)
    R1 = model.covariance()
    sig = forward_covariance(model.fx_at(), R1, pol)
    assert sig.shape == (T, n + m, n + m)
    # manual iteration
    A = np.array(spec.A)
    S = np.array(R1)
    for t in range(T):
        np.testing.assert_allclose(np.array(sig[t, :n, :n]), S, atol=1e-12)
        Kt = np.array(K[t])
        np.testing.assert_allclose(np.array(sig[t, n:, :n]), Kt @ S,
                                   atol=1e-12)
        np.testing.assert_allclose(
            np.array(sig[t, n:, n:]), Kt @ S @ Kt.T + np.eye(m), atol=1e-12)
        S = A @ S @ A.T + np.array(R1)
