"""Parallel (associative-scan) Riccati backward vs the sequential recursion
(exact for λ=0, unconstrained)."""
import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.linear import (
    random_lti, make_lti_problem)
from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, make_pendcart_problem, default_x0)
from differentialdynamicprogramming_jl_tpu.ops.backward import backward_pass
from differentialdynamicprogramming_jl_tpu.ops.forward import forward_pass
from differentialdynamicprogramming_jl_tpu.ops.riccati_scan import (
    parallel_riccati)


def _cmp(ref, par, tol=1e-10):
    for name, a, b in (("k", ref.policy.k, par.policy.k),
                       ("K", ref.policy.K, par.policy.K),
                       ("Vx", ref.Vx, par.Vx),
                       ("Vxx", ref.Vxx, par.Vxx),
                       ("dV", ref.dV, par.dV)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-12)
        assert rel < tol, (name, rel)


def test_matches_sequential_lti():
    T = 120
    spec = random_lti(jax.random.PRNGKey(0), n=10, m=2, T=T,
                      dtype=jnp.float64)
    prob = make_lti_problem(spec, T)
    ro = forward_pass(prob, spec.x0, spec.u0[:T])
    d = prob.make_derivs()(ro.x, ro.u)
    _cmp(backward_pass(d, ro.u, lam=0.0, reg_type=1),
         parallel_riccati(d, ro.u))


def test_matches_sequential_nonlinear_linearization():
    prob = make_pendcart_problem(PendCartSpec(), derivs="euler",
                                 dtype=jnp.float64)
    u0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (90, 1),
                                 jnp.float64)
    ro = forward_pass(prob, default_x0(jnp.float64), u0)
    d = prob.make_derivs()(ro.x, ro.u)
    _cmp(backward_pass(d, ro.u, lam=0.0, reg_type=1),
         parallel_riccati(d, ro.u))


def test_cross_terms_reduction():
    """Nonzero cxu exercises the completion-of-squares path."""
    T = 60
    key = jax.random.PRNGKey(3)
    spec = random_lti(key, n=6, m=2, T=T, dtype=jnp.float64)
    prob = make_lti_problem(spec, T)
    ro = forward_pass(prob, spec.x0, spec.u0[:T])
    d = prob.make_derivs()(ro.x, ro.u)
    cxu = 1e-3 * jax.random.normal(key, (T, 6, 2), jnp.float64)
    d = d._replace(cxu=cxu)
    _cmp(backward_pass(d, ro.u, lam=0.0, reg_type=1),
         parallel_riccati(d, ro.u))


def test_ilqg_with_parallel_backward():
    """ILQGConfig(backward='parallel'): the driver runs the associative-scan
    Riccati whenever λ is at the floor (automatic sequential fallback above
    it) and converges to the same solution as the sequential engine."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from differentialdynamicprogramming_jl_tpu import ilqg, ILQGConfig
    from differentialdynamicprogramming_jl_tpu.models.linear import (
        random_lti, make_lti_problem)
    T = 80
    spec = random_lti(jax.random.PRNGKey(0), n=6, m=2, T=T,
                      dtype=jnp.float64)
    prob = make_lti_problem(spec, T)
    ref = ilqg(prob, spec.x0, spec.u0,
               cfg=ILQGConfig(max_iter=30, lam=1e-6))
    par = ilqg(prob, spec.x0, spec.u0,
               cfg=ILQGConfig(max_iter=30, lam=1e-6, backward="parallel"))
    np.testing.assert_allclose(float(jnp.sum(par.cost)),
                               float(jnp.sum(ref.cost)), rtol=1e-8)
    # the parallel engine treats λ ≤ 10·lam_min as exactly 0, so controls
    # agree at solution level, not bitwise (documented approximation)
    np.testing.assert_allclose(np.asarray(par.u), np.asarray(ref.u),
                               atol=1e-3)
