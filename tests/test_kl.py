"""KL machinery unit tests (reference ``src/klutils.jl``) — including a
Monte-Carlo oracle for the closed-form policy KL, which the reference never
tests."""
import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu import (
    GaussianPolicy, grad_kl, kl_div_wiki, entropy, calc_eta,
    adam_init, adam_update)


def rand_policy(key, T=6, n=3, m=2, dtype=jnp.float64):
    k1, k2, k3 = jax.random.split(key, 3)
    K = 0.3 * jax.random.normal(k1, (T, m, n), dtype)
    k = 0.3 * jax.random.normal(k2, (T, m), dtype)
    A = 0.3 * jax.random.normal(k3, (T, m, m), dtype)
    sigma = jnp.einsum('tij,tkj->tik', A, A) + 0.5 * jnp.eye(m, dtype=dtype)
    return GaussianPolicy(K=K, k=k, sigma=sigma,
                          sigma_inv=jnp.linalg.inv(sigma))


def test_grad_kl_formulas(key):
    """cx=K'Σ⁻¹k, cu=-Σ⁻¹k, cxx=K'Σ⁻¹K, cuu=Σ⁻¹, cxu=-Σ⁻¹K
    (src/klutils.jl:14-20)."""
    pol = rand_policy(key)
    g = grad_kl(pol)
    t = 2
    K, k, Si = np.array(pol.K[t]), np.array(pol.k[t]), np.array(pol.sigma_inv[t])
    np.testing.assert_allclose(np.array(g.cx[t]), K.T @ Si @ k, atol=1e-12)
    np.testing.assert_allclose(np.array(g.cu[t]), -Si @ k, atol=1e-12)
    np.testing.assert_allclose(np.array(g.cxx[t]), K.T @ Si @ K, atol=1e-12)
    np.testing.assert_allclose(np.array(g.cuu[t]), Si, atol=1e-12)
    np.testing.assert_allclose(np.array(g.cxu[t]), -Si @ K, atol=1e-12)


def test_kl_identical_policies_zero(key):
    pol = rand_policy(key)
    T, n = pol.T, pol.n
    x = jax.random.normal(key, (T, n), jnp.float64)
    sig = jnp.broadcast_to(jnp.eye(n + pol.m, dtype=jnp.float64),
                           (T, n + pol.m, n + pol.m))
    kl = kl_div_wiki(x, x, sig, pol, pol)
    np.testing.assert_allclose(np.array(kl), 0.0, atol=1e-10)


def test_kl_monte_carlo_oracle(key):
    """Closed-form KL (src/klutils.jl:70-100) vs direct Gaussian-KL math:
    KL(p_new || p_prev) at each t for u|x ~ N(k + K(x-x_nom), Σ) with
    x ~ N(x_new_t, Σxx): verified against the exact conditional-Gaussian KL
    expectation formula evaluated by quadrature over samples."""
    T, n, m = 4, 2, 2
    kp, kn, kx = jax.random.split(key, 3)
    prev = rand_policy(kp, T=T, n=n, m=m)
    new = rand_policy(kn, T=T, n=n, m=m)
    x_new = jax.random.normal(kx, (T, n), jnp.float64)
    x_old = jnp.zeros((T, n), jnp.float64)
    Sxx = 0.3 * jnp.broadcast_to(jnp.eye(n, dtype=jnp.float64), (T, n, n))
    sig = jnp.zeros((T, n + m, n + m), jnp.float64
                    ).at[:, :n, :n].set(Sxx)
    kl = kl_div_wiki(x_new, x_old, sig, new, prev)

    # Monte-Carlo: sample x ~ N(x_new_t, Sxx); policies' means differ by
    # (kp + Kp μ) - (kn + Kn μ) with μ = x - x_old = x - 0 evaluated at
    # deviation μt = x_new - x_old plus sampled state noise
    rng = np.random.default_rng(0)
    for t in range(T):
        Kp, Kn = np.array(prev.K[t]), np.array(new.K[t])
        kpv, knv = np.array(prev.k[t]), np.array(new.k[t])
        Sp, Sn = np.array(prev.sigma[t]), np.array(new.sigma[t])
        Sip = np.array(prev.sigma_inv[t])
        mu_t = np.array(x_new[t] - x_old[t])
        S = np.array(Sxx[t])
        # E_x[KL(N(kn+Kn(x̃), Σn) || N(kp+Kp(x̃), Σp))] with x̃ ~ N(μt, S)
        samples = rng.multivariate_normal(mu_t, S, size=200000)
        d = (knv + samples @ Kn.T) - (kpv + samples @ Kp.T)
        quad = np.einsum('si,ij,sj->s', d, Sip, d).mean()
        kl_mc = 0.5 * (np.trace(Sip @ Sn) + quad - m
                       + np.linalg.slogdet(Sp)[1] - np.linalg.slogdet(Sn)[1])
        np.testing.assert_allclose(float(kl[t]), kl_mc, rtol=2e-2, atol=2e-2)


def test_entropy(key):
    pol = rand_policy(key)
    expected = np.mean([np.linalg.slogdet(np.array(pol.sigma[t]))[1] / 2
                        for t in range(pol.T)]) + pol.m * np.log(2 * np.pi) / 2
    np.testing.assert_allclose(float(entropy(pol)), expected, atol=1e-12)


def test_calc_eta_bracketing():
    """Bracket updates (src/klutils.jl:119-127): η too big shrinks from
    above; too small grows from below; satisfied freezes."""
    eb = jnp.array([1e-8, 1.0, 1e16])
    # divergence below bound → η too big
    nb, sat = calc_eta(jnp.asarray(0.1), eb, 2.0)
    assert not bool(sat)
    assert float(nb[2]) == 1.0                       # hi ← mid
    assert float(nb[1]) == max(np.sqrt(1e-8 * 1.0), 0.1 * 1.0)
    # divergence above bound → η too small
    nb2, sat2 = calc_eta(jnp.asarray(10.0), eb, 2.0)
    assert not bool(sat2)
    assert float(nb2[0]) == 1.0                      # lo ← mid
    assert float(nb2[1]) == min(np.sqrt(1.0 * 1e16), 10.0)
    # satisfied: |violation| < 0.1 kl_step
    nb3, sat3 = calc_eta(jnp.asarray(2.05), eb, 2.0)
    assert bool(sat3)
    np.testing.assert_allclose(np.array(nb3), np.array(eb))
    # kl_step <= 0 → always satisfied (src/klutils.jl:111)
    _, sat4 = calc_eta(jnp.asarray(5.0), eb, 0.0)
    assert bool(sat4)


def test_calc_eta_per_timestep():
    T = 4
    eb = jnp.broadcast_to(jnp.array([1e-8, 1.0, 1e16])[:, None], (3, T))
    div = jnp.array([0.1, 10.0, 2.0, 2.05])
    nb, sat = calc_eta(div, eb, 2.0)
    assert not bool(sat)
    assert float(nb[2, 0]) == 1.0      # too big at t=0
    assert float(nb[0, 1]) == 1.0      # too small at t=1
    np.testing.assert_allclose(np.array(nb[:, 3]), [1e-8, 1.0, 1e16])  # frozen


def test_adam_matches_reference_formula():
    """Exact replication of src/klutils.jl:203-210."""
    theta = jnp.array([1.0, -2.0])
    g = jnp.array([0.5, 0.25])
    st = adam_init((2,), jnp.float64)
    al, b1, b2, eps = 0.005, 0.9, 0.999, 1e-8
    th, st = adam_update(st, theta, g, 1, alpha=al, beta1=b1, beta2=b2, eps=eps)
    m = (1 - b1) * np.array(g)
    v = (1 - b2) * np.array(g) ** 2
    mh = m / (1 - b1)
    vh = v / (1 - b2)
    expected = np.array(theta) - al * mh / (np.sqrt(vh) + eps)
    np.testing.assert_allclose(np.array(th), expected, atol=1e-14)
    # second step
    th2, _ = adam_update(st, th, g * 2, 2, alpha=al)
    m2 = b1 * m + (1 - b1) * 2 * np.array(g)
    v2 = b2 * v + (1 - b2) * 4 * np.array(g) ** 2
    expected2 = (np.array(th) - al * (m2 / (1 - b1 ** 2))
                 / (np.sqrt(v2 / (1 - b2 ** 2)) + eps))
    np.testing.assert_allclose(np.array(th2), expected2, atol=1e-14)
