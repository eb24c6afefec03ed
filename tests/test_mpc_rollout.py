"""On-device receding-horizon rollout (`mpc_rollout_lanes`): the lax.scan
chain must reproduce the host-side step loop it replaces — same warm-start
re-solves, same plant steps, same plan shifts (warm-start semantics:
``src/iLQG.jl:85-87,193-197``) — and stream back the closed-loop trace."""
import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, default_x0, make_pendcart_problem, pendcart_lanes,
    pendcart_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.solvers.batch import (
    ilqg_batch_lanes, mpc_rollout_lanes)
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ILQGConfig, default_alphas)

B, T, N_STEPS = 2, 6, 3
DTYPE = jnp.float32
_SPEC = PendCartSpec()
_PROB = make_pendcart_problem(_SPEC, derivs="euler", dtype=DTYPE)


def _plant(x, u):
    return jax.vmap(lambda a, b: _PROB.dynamics(a, b, 0))(x, u)


def _setup():
    model = pendcart_lanes(_SPEC)
    tiles = pendcart_derivs_tiles(_SPEC)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 3), reg_type=2,
                     lam_max=1e15, max_iter=1, iter_cap=3)
    key = jax.random.PRNGKey(0)
    x = (default_x0(DTYPE)[None, :]
         + 0.2 * jax.random.normal(key, (B, 4), DTYPE)
         * jnp.array([1, 1, 0, 0], DTYPE))
    u = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1), DTYPE)
    return model, tiles, cfg, x, u


def test_mpc_rollout_matches_host_loop():
    model, tiles, cfg, x, u = _setup()
    common = dict(lims=((-10.0, 10.0),), cfg=cfg, derivs_tiles=tiles,
                  kt_backward=2, kt_forward=2, interpret=True)

    x_f, u_f, xs, us, costs = mpc_rollout_lanes(
        model, None, x, u, _plant, N_STEPS, **common)
    assert xs.shape == (N_STEPS, B, 4)
    assert us.shape == (N_STEPS, B, 1)
    assert costs.shape == (N_STEPS, B)

    # host-side reference loop: identical per-step computation, dispatched
    # step by step
    xh, uh = x, u
    for i in range(N_STEPS):
        res = ilqg_batch_lanes(model, None, xh, uh, warm_start=True,
                               **common)
        u0 = res.u[:, 0]
        xh = _plant(xh, u0)
        uh = jnp.concatenate([res.u[:, 1:], jnp.zeros((B, 1, 1), DTYPE)], 1)
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(xh),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(us[i]), np.asarray(u0),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(costs[i]),
                                   np.asarray(res.cost_total), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(xh),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(uh),
                               rtol=2e-5, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(x_f)))
