"""Lane-layout batch driver (solvers/batch.py) vs the generic vmap driver —
tiny shapes, interpret mode (compile time dominates; one thorough test).

Full-scale equivalence (B=4096, T=500) is exercised on TPU hardware by
bench.py / tools/bench_scaling.py; exact per-scenario cost/reason/iteration
parity at larger sizes was additionally validated ad hoc (see commit logs).
"""
import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, make_pendcart_problem, default_x0, pendcart_lanes,
    pendcart_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ilqg, ILQGConfig, default_alphas)
from differentialdynamicprogramming_jl_tpu.solvers.batch import (
    ilqg_batch_lanes)

B, T = 8, 6


def test_batch_lanes_matches_vmap_driver():
    dtype = jnp.float32
    spec = PendCartSpec()
    problem = make_pendcart_problem(spec, derivs="euler", dtype=dtype)
    lims = jnp.array([[-5.0, 5.0]], dtype)
    x0s = (default_x0(dtype)[None, :]
           + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, 4), dtype))
    u0s = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1), dtype)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 3), reg_type=2,
                     max_iter=2, iter_cap=3)

    ref = jax.vmap(lambda a, b: ilqg(problem, a, b, lims=lims, cfg=cfg)
                   )(x0s, u0s)
    out = ilqg_batch_lanes(
        pendcart_lanes(spec), None, x0s, u0s, lims=((-5.0, 5.0),), cfg=cfg,
        derivs_tiles=pendcart_derivs_tiles(spec),
        kt_backward=2, kt_forward=2, record_trace=True, interpret=True)

    rc = np.asarray(jnp.sum(ref.cost, -1))
    oc = np.asarray(out.cost_total)
    np.testing.assert_allclose(oc, rc, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.reason),
                                  np.asarray(out.reason))
    np.testing.assert_array_equal(np.asarray(ref.n_accepted),
                                  np.asarray(out.n_accepted))
    assert out.x.shape == (B, T, 4) and out.u.shape == (B, T, 1)
    assert np.all(np.isfinite(np.asarray(out.x)))
    # trace: iteration-0 cost equals the initial rollout; costs non-increasing
    tr = out.trace
    assert tr is not None and tr.cost.shape[0] == B
    c = np.asarray(tr.cost)
    it = np.asarray(out.n_iters)
    for b in range(B):
        vals = c[b, :it[b] + 1]
        assert np.all(np.diff(vals) <= 1e-5), vals
