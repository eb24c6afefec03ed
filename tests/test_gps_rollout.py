"""On-device GPS policy-improvement loop (`gps_rollout_lanes`): the lax.scan
chain of re-centered iLQGkl solves must reproduce the host-side outer loop
it replaces (the reference's canonical 5× pattern,
``src/demo_linear.jl:124-130``)."""
import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, make_pendcart_problem, default_x0, pendcart_lanes,
    pendcart_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.ops.forward import forward_pass
from differentialdynamicprogramming_jl_tpu.policy import GaussianPolicy
from differentialdynamicprogramming_jl_tpu.solvers.batch_kl import (
    ilqgkl_batch_lanes, gps_rollout_lanes)
from differentialdynamicprogramming_jl_tpu.solvers.ilqgkl import ILQGKLConfig

B, T, OUTER = 4, 8, 3
DTYPE = jnp.float32
_SPEC = PendCartSpec()
_PROB = make_pendcart_problem(_SPEC, derivs="euler", dtype=DTYPE)
_DERIVS = jax.vmap(_PROB.make_derivs())


def _fx_fn(x, u):
    return _DERIVS(x, u).fx


def test_gps_rollout_matches_host_outer_loop():
    model = pendcart_lanes(_SPEC)
    tiles = pendcart_derivs_tiles(_SPEC)
    x0s = (default_x0(DTYPE)[None, :]
           + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, 4), DTYPE))
    u0s = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1), DTYPE)
    ro = jax.vmap(lambda a, b: forward_pass(_PROB, a, b))(x0s, u0s)
    prev = GaussianPolicy.zeros(T, 4, 1, DTYPE)
    prev = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), prev)
    prev = prev._replace(k=ro.u)
    cost0 = jnp.sum(ro.cost, -1)
    cfg = ILQGKLConfig(kl_step=2.0, max_iter=3)

    x_f, traj_f, per_outer = gps_rollout_lanes(
        model, tiles, ro.x, prev, cost0, _fx_fn, OUTER, cfg=cfg, kt=4,
        interpret=True)          # default: fully unrolled at OUTER=3
    costs, etas, divs, sat, viol = per_outer
    assert costs.shape == (OUTER, B)

    # the rolled lax.scan path must agree with the unrolled default
    x_s, _, per_s = gps_rollout_lanes(
        model, tiles, ro.x, prev, cost0, _fx_fn, OUTER, cfg=cfg, kt=4,
        unroll=1, interpret=True)
    np.testing.assert_allclose(np.asarray(per_s[0]), np.asarray(costs),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_f),
                               rtol=2e-5, atol=1e-6)

    # host-side reference: the same outer loop dispatched per iteration
    xh, trajh, ch = ro.x, prev, cost0
    for i in range(OUTER):
        res = ilqgkl_batch_lanes(model, tiles, xh, trajh,
                                 _fx_fn(xh, trajh.k), ch, cfg=cfg, kt=4,
                                 interpret=True)
        xh, trajh, ch = res.x, res.policy, res.cost_total
        np.testing.assert_allclose(np.asarray(costs[i]), np.asarray(ch),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(etas[i]),
                                   np.asarray(res.eta), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(divs[i]),
                                   np.asarray(res.divergence), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(xh),
                               rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(traj_f),
                    jax.tree_util.tree_leaves(trajh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(x_f)))
