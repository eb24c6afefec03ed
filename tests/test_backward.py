"""Backward-pass unit tests: closed-form LQR parity and variant equivalences
(SURVEY.md §4 — tests the reference lacks)."""
import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu import backward_pass, KLTerms, GaussianPolicy
from differentialdynamicprogramming_jl_tpu.problem import broadcast_derivs
import pytest


def lti_derivs(key, n=4, m=2, T=20, dtype=jnp.float64):
    ka, kb = jax.random.split(key)
    A = jnp.eye(n, dtype=dtype) + 0.01 * jax.random.normal(ka, (n, n), dtype)
    B = 0.1 * jax.random.normal(kb, (n, m), dtype)
    Q = jnp.eye(n, dtype=dtype)
    R = 0.1 * jnp.eye(m, dtype=dtype)
    dv = broadcast_derivs(T, fx=A, fu=B, cx=jnp.zeros(n, dtype),
                          cu=jnp.zeros(m, dtype), cxx=Q,
                          cxu=jnp.zeros((n, m), dtype), cuu=R)
    return dv, (A, B, Q, R)


def riccati(A, B, Q, R, T):
    """Direct finite-horizon Riccati with the reference's boundary convention
    (P[T-1] = cxx, last control unoptimized — src/backward_pass.jl:97-99)."""
    n, m = B.shape
    P = Q.copy()
    Ks = np.zeros((T, m, n))
    ks = np.zeros((T, m))
    for t in range(T - 2, -1, -1):
        Quu = R + B.T @ P @ B
        Qux = B.T @ P @ A
        K = -np.linalg.solve(Quu, Qux)
        Ks[t] = K
        P = Q + A.T @ P @ A + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        P = 0.5 * (P + P.T)
    return Ks, ks, P


@pytest.mark.smoke
def test_lqr_parity(key):
    T = 20
    dv, (A, B, Q, R) = lti_derivs(key, T=T)
    out = backward_pass(dv, jnp.zeros((T, 2)), lam=0.0)
    assert not bool(out.diverged)
    Ks, ks, P = riccati(A, B, Q, R, T)
    np.testing.assert_allclose(np.array(out.policy.K), Ks, atol=1e-12)
    np.testing.assert_allclose(np.array(out.policy.k), ks, atol=1e-12)
    np.testing.assert_allclose(np.array(out.Vxx[0]), P, atol=1e-12)
    # Σ = Quu⁻¹ (src/iLQGkl.jl:23)
    Quu0 = R + B.T @ np.array(out.Vxx[1]) @ B
    np.testing.assert_allclose(np.array(out.policy.sigma_inv[0]), Quu0,
                               atol=1e-12)
    np.testing.assert_allclose(
        np.array(out.policy.sigma[0]) @ Quu0, np.eye(2), atol=1e-10)


def test_regularization_types(key):
    """regType 1 adds λI to Quu, regType 2 to Vxx, used for the *gain solve
    only* (src/backward_pass.jl:119-123); the value update uses the raw Q
    terms. Verified in closed form at the first backward step (t = T-2),
    where Vxx = cxx exactly."""
    T = 10
    lam = 7.5
    dv, (A, B, Q, R) = lti_derivs(key, T=T)
    u = jnp.zeros((T, 2))
    o0 = backward_pass(dv, u, lam=0.0, reg_type=1)
    o0b = backward_pass(dv, u, lam=0.0, reg_type=2)
    o1 = backward_pass(dv, u, lam=lam, reg_type=1)
    o2 = backward_pass(dv, u, lam=lam, reg_type=2)
    # λ=0: both types identical
    np.testing.assert_allclose(np.array(o0.policy.K), np.array(o0b.policy.K),
                               atol=1e-12)
    t = T - 2
    n, m = B.shape[0], B.shape[1]
    # type 1: K = -(R + B'QB + λI)⁻¹ B'QA
    K1 = -np.linalg.solve(R + B.T @ Q @ B + lam * np.eye(m), B.T @ Q @ A)
    np.testing.assert_allclose(np.array(o1.policy.K[t]), K1, atol=1e-12)
    # type 2: K = -(R + B'(Q+λI)B)⁻¹ B'(Q+λI)A
    Qr = Q + lam * np.eye(n)
    K2 = -np.linalg.solve(R + B.T @ Qr @ B, B.T @ Qr @ A)
    np.testing.assert_allclose(np.array(o2.policy.K[t]), K2, atol=1e-12)


def test_divergence_flag(key):
    """Non-PD Quu (negative control cost) → diverged flag, like the reference's
    Cholesky failure signal (src/backward_pass.jl:36-38)."""
    T = 10
    dv, _ = lti_derivs(key, T=T)
    dv = dv._replace(cuu=-dv.cuu)
    out = backward_pass(dv, jnp.zeros((T, 2)), lam=0.0)
    assert bool(out.diverged)
    assert int(out.diverge_idx) == T - 1  # first failure at the top timestep


def test_lambda_rescues_divergence(key):
    T = 10
    dv, _ = lti_derivs(key, T=T)
    dv = dv._replace(cuu=jnp.broadcast_to(-jnp.eye(2), dv.cuu.shape))
    assert bool(backward_pass(dv, jnp.zeros((T, 2)), lam=0.0).diverged)
    out = backward_pass(dv, jnp.zeros((T, 2)), lam=10.0, reg_type=1)
    assert not bool(out.diverged)


def test_gps_mode_zero_kl_equals_standard(key):
    """GPS mode with η=1 and zero KL terms must equal the λ=0 standard pass
    (src/backward_pass.jl:293-299 reduces to the plain recursion)."""
    T, n, m = 15, 4, 2
    dv, _ = lti_derivs(key, n=n, m=m, T=T)
    u = jnp.zeros((T, m))
    z = KLTerms(cx=jnp.zeros((T, n)), cu=jnp.zeros((T, m)),
                cxx=jnp.zeros((T, n, n)), cxu=jnp.zeros((T, m, n)),
                cuu=jnp.zeros((T, m, m)))
    a = backward_pass(dv, u, lam=0.0)
    b = backward_pass(dv, u, eta=jnp.array(1.0), kl_terms=z, gps_mode=True)
    np.testing.assert_allclose(np.array(a.policy.K), np.array(b.policy.K),
                               atol=1e-12)
    np.testing.assert_allclose(np.array(a.policy.k), np.array(b.policy.k),
                               atol=1e-12)
    np.testing.assert_allclose(np.array(a.Vxx), np.array(b.Vxx), atol=1e-12)


def test_gps_eta_scaling(key):
    """Large η downweights the task cost: gains shrink toward the KL-only
    solution (src/iLQGkl.jl:104-106 comment)."""
    T, n, m = 15, 4, 2
    dv, _ = lti_derivs(key, n=n, m=m, T=T)
    u = jnp.zeros((T, m))
    prev = GaussianPolicy.zeros(T, n, m, jnp.float64)
    from differentialdynamicprogramming_jl_tpu import grad_kl
    kl = grad_kl(prev)
    lo = backward_pass(dv, u, eta=jnp.array(1.0), kl_terms=kl, gps_mode=True)
    hi = backward_pass(dv, u, eta=jnp.array(1e8), kl_terms=kl, gps_mode=True)
    assert float(jnp.abs(hi.policy.K).max()) < 1e-4
    assert float(jnp.abs(lo.policy.K).max()) > 1e-2
    # per-timestep η vector accepted too
    vec = backward_pass(dv, u, eta=jnp.full((T,), 1.0), kl_terms=kl,
                        gps_mode=True)
    np.testing.assert_allclose(np.array(vec.policy.K), np.array(lo.policy.K),
                               atol=1e-12)


def test_control_limits_inactive_equals_unconstrained(key):
    """Wide limits → boxQP returns the Newton point; gains equal the
    unconstrained solve (src/backward_pass.jl:43-61)."""
    T = 15
    dv, _ = lti_derivs(key, T=T)
    u = jnp.zeros((T, 2))
    a = backward_pass(dv, u, lam=0.0)
    lims = jnp.array([[-1e6, 1e6], [-1e6, 1e6]])
    b = backward_pass(dv, u, lam=0.0, lims=lims, use_limits=True)
    assert not bool(b.diverged)
    np.testing.assert_allclose(np.array(a.policy.k), np.array(b.policy.k),
                               atol=1e-8)
    np.testing.assert_allclose(np.array(a.policy.K), np.array(b.policy.K),
                               atol=1e-8)


def test_control_limits_clamp_feedforward(key):
    """Tight limits clamp k to the box lims - u (src/backward_pass.jl:45-47)."""
    T = 15
    dv, _ = lti_derivs(key, T=T)
    dv = dv._replace(cu=jnp.ones((T, 2)) * 5.0)  # strong control gradient
    u = jnp.zeros((T, 2))
    lims = jnp.array([[-0.1, 0.1], [-0.1, 0.1]])
    out = backward_pass(dv, u, lam=0.0, lims=lims, use_limits=True)
    assert not bool(out.diverged)
    assert bool(jnp.all(out.policy.k[:T - 1] >= -0.1 - 1e-12))
    assert bool(jnp.all(out.policy.k[:T - 1] <= 0.1 + 1e-12))
    # clamped rows of K are zero (src/backward_pass.jl:57-61)
    clamped_rows = (jnp.abs(out.policy.k[:T - 1]) >= 0.1 - 1e-9)
    K_rows = jnp.abs(out.policy.K[:T - 1]).max(axis=-1)
    assert float(K_rows[clamped_rows].max()) == 0.0


def test_second_order_terms(key):
    """Full-DDP second-order contractions: zero tensors change nothing;
    nonzero tensors perturb Quu/Qxx as expected."""
    T, n, m = 10, 3, 2
    dv, _ = lti_derivs(key, n=n, m=m, T=T)
    u = jnp.zeros((T, m))
    zero2 = dv._replace(fxx=jnp.zeros((T, n, n, n)),
                        fxu=jnp.zeros((T, n, n, m)),
                        fuu=jnp.zeros((T, n, m, m)))
    a = backward_pass(dv, u, lam=0.0)
    b = backward_pass(zero2, u, lam=0.0)
    np.testing.assert_allclose(np.array(a.policy.K), np.array(b.policy.K),
                               atol=1e-12)
    np.testing.assert_allclose(np.array(a.Vxx), np.array(b.Vxx), atol=1e-12)

    # nonzero fuu with nonzero Vx must alter the result
    dv3 = dv._replace(cx=jnp.ones((T, n)),
                      fxx=jnp.zeros((T, n, n, n)),
                      fxu=jnp.zeros((T, n, n, m)),
                      fuu=0.05 * jnp.ones((T, n, m, m)))
    dv1 = dv._replace(cx=jnp.ones((T, n)))
    c = backward_pass(dv3, u, lam=0.0)
    d = backward_pass(dv1, u, lam=0.0)
    assert float(jnp.abs(c.policy.K - d.policy.K).max()) > 1e-6


def test_vmap_over_batch(key):
    """The whole backward pass vmaps over a scenario batch."""
    T, B = 12, 8
    keys = jax.random.split(key, B)
    dvs = jax.vmap(lambda k: lti_derivs(k, T=T)[0])(keys)
    us = jnp.zeros((B, T, 2))
    out = jax.vmap(lambda d, u: backward_pass(d, u, lam=0.0))(dvs, us)
    assert out.policy.K.shape == (B, T, 2, 4)
    assert not bool(jnp.any(out.diverged))
