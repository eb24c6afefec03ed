"""Golden-file regression: the f64 CPU reference path must reproduce the
recorded outcomes (tools/record_golden.py) on the benchmark problems.
Catches silent behavioral drift that the statistical cost-bound oracle
would miss."""
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
    return dict(np.load(GOLDEN).items())


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
    assert int(res.reason) == int(golden["linear_reason"])
    assert int(res.n_iters) == int(golden["linear_iters"])


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


def test_boxqp_golden(golden):
    from differentialdynamicprogramming_jl_tpu.ops.boxqp import boxqp
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (50, 50), jnp.float64)
    H = A @ A.T + 0.1 * jnp.eye(50)
    g = jax.random.normal(jax.random.PRNGKey(1), (50,), jnp.float64)
    qr = boxqp(H, g, -jnp.ones(50), jnp.ones(50), jnp.zeros(50))
    np.testing.assert_allclose(float(qr.value), golden["boxqp_value"],
                               rtol=1e-10)
    assert int(qr.result) == int(golden["boxqp_result"])
