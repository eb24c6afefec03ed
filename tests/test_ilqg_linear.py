"""End-to-end iLQG on the linear benchmark: the reference's Monte-Carlo cost
oracle (``test/test_readme.jl:3-70``) plus convergence-quality checks the
reference lacks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differentialdynamicprogramming_jl_tpu import ilqg, ILQGConfig
from differentialdynamicprogramming_jl_tpu.models.linear import (
    random_lti, make_lti_problem)


def run_one(key, T=1000, dtype=jnp.float64, lims=None, use_autodiff=False,
            cfg=None):
    spec = random_lti(key, n=10, m=2, T=T, dtype=dtype)
    prob = make_lti_problem(spec, T, use_autodiff=use_autodiff)
    cfg = cfg or ILQGConfig()
    res = ilqg(prob, spec.x0, spec.u0, lims=lims, cfg=cfg)
    return spec, res


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
def test_monte_carlo_cost_bounds(key, dtype):
    """Reference oracle (test/test_readme.jl:68-70): over 10 random LTI
    problems (n=10, m=2, T=1000), max total cost < 25, mean < 10, min < 5."""
    costs = []
    for i in range(10):
        _, res = run_one(jax.random.fold_in(key, i), dtype=dtype)
        costs.append(float(jnp.sum(res.cost)))
    costs = np.array(costs)
    assert costs.max() < 25, costs
    assert costs.mean() < 10, costs
    assert costs.min() < 5, costs


def test_converges_to_lqr_cost(key):
    """The iLQG solution of the LQR problem must match the closed-form
    optimal cost (a sharper oracle than the reference's bounds)."""
    T = 200
    spec, res = run_one(key, T=T)
    A, B = np.array(spec.A), np.array(spec.B)
    Q, R = np.array(spec.Q), np.array(spec.R)
    # optimal cost with the same boundary convention: P[T-1] = Q and last
    # control free at u=α·u0... the reference freezes the last control, whose
    # cost contribution is negligible; compute the exact Riccati cost for the
    # truncated problem and compare loosely.
    P = Q.copy()
    for t in range(T - 2, -1, -1):
        Quu = R + B.T @ P @ B
        Qux = B.T @ P @ A
        K = np.linalg.solve(Quu, Qux)
        P = Q + A.T @ P @ A - Qux.T @ K
        P = 0.5 * (P + P.T)
    x0 = np.array(spec.x0)
    opt = 0.5 * x0 @ P @ x0
    achieved = float(jnp.sum(res.cost))
    assert achieved < opt * 1.02 + 1e-6, (achieved, opt)


def test_pre_rolled_trajectory(key):
    """Pre-rolled (T,n) x0 path (src/iLQG.jl:193-197)."""
    from differentialdynamicprogramming_jl_tpu import forward_pass
    T = 100
    spec = random_lti(key, T=T)
    prob = make_lti_problem(spec, T)
    ro = forward_pass(prob, spec.x0, spec.u0)
    res = ilqg(prob, ro.x, spec.u0, cfg=ILQGConfig(max_iter=100))
    assert float(jnp.sum(res.cost)) < float(jnp.sum(ro.cost))
    # supplying cost0 gives the same result
    res2 = ilqg(prob, ro.x, spec.u0, cfg=ILQGConfig(max_iter=100),
                cost0=ro.cost)
    np.testing.assert_allclose(float(jnp.sum(res2.cost)),
                               float(jnp.sum(res.cost)), rtol=1e-9)


def test_control_limited(key):
    """Control-limited LTI (the commented-out reference configuration,
    src/demo_linear.jl:22: lims = ±0.6): solver must respect limits and
    still reduce cost."""
    T = 300
    lims = jnp.array([[-0.6, 0.6], [-0.6, 0.6]])
    spec, res = run_one(key, T=T, lims=lims,
                        cfg=ILQGConfig(max_iter=100))
    assert bool(jnp.all(res.u >= -0.6 - 1e-9))
    assert bool(jnp.all(res.u <= 0.6 + 1e-9))
    assert float(jnp.sum(res.cost)) < float(res.trace.cost[0])
    # oracle: the box-constrained solution beats naively clamping the
    # unconstrained optimum into the box
    from differentialdynamicprogramming_jl_tpu import forward_pass
    spec2, res_unc = run_one(key, T=T, cfg=ILQGConfig(max_iter=100))
    prob = make_lti_problem(spec2, T)
    u_clamped = jnp.clip(res_unc.u, -0.6, 0.6)
    ro = forward_pass(prob, spec2.x0, u_clamped)
    assert float(jnp.sum(res.cost)) <= float(jnp.sum(ro.cost)) + 1e-9


def test_autodiff_matches_analytic(key):
    """Autodiff derivative stack gives the same solve as analytic derivatives."""
    T = 100
    _, res_a = run_one(key, T=T, use_autodiff=False,
                       cfg=ILQGConfig(max_iter=50))
    _, res_b = run_one(key, T=T, use_autodiff=True,
                       cfg=ILQGConfig(max_iter=50))
    np.testing.assert_allclose(float(jnp.sum(res_a.cost)),
                               float(jnp.sum(res_b.cost)), rtol=1e-6)
    np.testing.assert_allclose(np.array(res_a.u), np.array(res_b.u),
                               atol=1e-6)


def test_trace_and_policy_contract(key):
    """When the solver exits on an accepted step (reason 2), the returned
    policy has k == u (src/iLQG.jl:303 — only the accept branch copies u into
    traj_new.k; rejected iterations overwrite traj_new with the latest
    backward pass, src/iLQG.jl:236). Trace cost decreases on accepts."""
    T = 100
    # large tol_fun forces a cost-convergence (accepting) exit
    spec, res = run_one(key, T=T, cfg=ILQGConfig(max_iter=50, tol_fun=1e-3))
    assert int(res.reason) == 2
    np.testing.assert_allclose(np.array(res.policy.k), np.array(res.u))
    tr = res.trace
    n_it = int(res.n_iters)
    costs = np.array(tr.cost[:n_it + 1])
    accepted = np.array(tr.accepted[:n_it + 1])
    # accepted-iteration costs are monotonically non-increasing
    acc_costs = costs[accepted.astype(bool)]
    assert np.all(np.diff(acc_costs) <= 1e-9)
    assert int(res.reason) in (1, 2, 3, 4)


def test_vmap_batched_solver(key):
    """The full solver vmaps over a scenario batch of initial states."""
    T, B = 100, 8
    spec = random_lti(key, T=T, dtype=jnp.float64)
    prob = make_lti_problem(spec, T)
    x0s = jnp.tile(spec.x0, (B, 1)) * jnp.linspace(0.5, 2.0, B)[:, None]
    res = jax.vmap(lambda x0: ilqg(prob, x0, spec.u0,
                                   cfg=ILQGConfig(max_iter=30)))(x0s)
    assert res.u.shape == (B, T, 2)
    totals = jnp.sum(res.cost, axis=-1)
    initials = res.trace.cost[:, 0]
    assert bool(jnp.all(totals <= initials))
