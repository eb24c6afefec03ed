"""KL-tier fleet scheduler (solvers/fleet.py ilqgkl_fleet): chunked +
straggler-compacted GPS solves must reproduce the single lock-step
ilqgkl_batch_lanes solve exactly — the resume entry restores the η-dual
optimizer's state (bracket / delta / ADAM moments / global iteration
count), so the composition is semantically one uninterrupted solve
(reference iLQGkl, ``src/iLQGkl.jl:25-252``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, make_pendcart_problem, default_x0, pendcart_lanes,
    pendcart_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.ops.forward import forward_pass
from differentialdynamicprogramming_jl_tpu.solvers.ilqgkl import ILQGKLConfig
from differentialdynamicprogramming_jl_tpu.solvers.batch_kl import (
    ilqgkl_batch_lanes)
from differentialdynamicprogramming_jl_tpu.solvers.fleet import ilqgkl_fleet
from differentialdynamicprogramming_jl_tpu.policy import GaussianPolicy

B, T = 8, 10


def _setup():
    dtype = jnp.float32
    spec = PendCartSpec()
    problem = make_pendcart_problem(spec, derivs="euler", dtype=dtype)
    x0s = (default_x0(dtype)[None, :]
           + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, 4), dtype))
    u0s = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1), dtype)
    ro = jax.vmap(lambda a, b: forward_pass(problem, a, b))(x0s, u0s)
    prev = GaussianPolicy.zeros(T, 4, 1, dtype)
    prev = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), prev)
    prev = prev._replace(k=ro.u)
    d = jax.vmap(problem.make_derivs())(ro.x, ro.u)
    return spec, ro, prev, d


@pytest.mark.parametrize("per_step", [False, True])
def test_kl_fleet_matches_lockstep(per_step):
    spec, ro, prev, d = _setup()
    # heterogeneous kl pressure: scenarios converge at different iterations
    # (per-step mode needs a tight kl_step — a loose one is satisfied at
    # iteration 1 and the fleet would never open a resumed chunk)
    cfg = ILQGKLConfig(kl_step=1.0 if not per_step else 0.02, max_iter=6,
                       constrain_per_step=per_step,
                       gd_alpha=0.05 if not per_step else 0.3)
    args = (pendcart_lanes(spec), pendcart_derivs_tiles(spec),
            ro.x, prev, d.fx, jnp.sum(ro.cost, -1))
    kw = dict(cfg=cfg, kt=4, interpret=True)
    ref = ilqgkl_batch_lanes(*args, **kw)
    fl = ilqgkl_fleet(*args, chunk_iters=2, chunk_growth=2.0, **kw)

    np.testing.assert_array_equal(np.asarray(fl.cost_total),
                                  np.asarray(ref.cost_total))
    np.testing.assert_array_equal(np.asarray(fl.eta), np.asarray(ref.eta))
    np.testing.assert_array_equal(np.asarray(fl.satisfied),
                                  np.asarray(ref.satisfied))
    np.testing.assert_array_equal(np.asarray(fl.n_iters),
                                  np.asarray(ref.n_iters))
    np.testing.assert_array_equal(np.asarray(fl.divergence),
                                  np.asarray(ref.divergence))
    np.testing.assert_array_equal(np.asarray(fl.u), np.asarray(ref.u))
    np.testing.assert_array_equal(np.asarray(fl.policy.K),
                                  np.asarray(ref.policy.K))
    # the chunk split must actually have exercised a resumed chunk
    assert int(np.max(np.asarray(ref.n_iters))) > 2

def test_kl_fleet_sharded_matches_lockstep():
    """ilqgkl_fleet_sharded over an 8-device mesh: per-shard straggler
    compaction must reproduce the lock-step KL solve exactly."""
    from differentialdynamicprogramming_jl_tpu.solvers.fleet import (
        ilqgkl_fleet_sharded)
    from differentialdynamicprogramming_jl_tpu.parallel.mesh import make_mesh
    spec, ro, prev, d = _setup()
    cfg = ILQGKLConfig(kl_step=1.0, max_iter=6)
    args = (pendcart_lanes(spec), pendcart_derivs_tiles(spec),
            ro.x, prev, d.fx, jnp.sum(ro.cost, -1))
    kw = dict(cfg=cfg, kt=4, interpret=True)
    ref = ilqgkl_batch_lanes(*args, **kw)
    mesh = make_mesh()
    fl = ilqgkl_fleet_sharded(*args, chunk_iters=2, chunk_growth=2.0,
                              mesh=mesh, **kw)
    np.testing.assert_array_equal(np.asarray(fl.cost_total),
                                  np.asarray(ref.cost_total))
    np.testing.assert_array_equal(np.asarray(fl.eta), np.asarray(ref.eta))
    np.testing.assert_array_equal(np.asarray(fl.satisfied),
                                  np.asarray(ref.satisfied))
    np.testing.assert_array_equal(np.asarray(fl.n_iters),
                                  np.asarray(ref.n_iters))
    np.testing.assert_array_equal(np.asarray(fl.u), np.asarray(ref.u))
    assert len({s.device for s in fl.u.addressable_shards}) == 8
    assert int(np.max(np.asarray(ref.n_iters))) > 2
