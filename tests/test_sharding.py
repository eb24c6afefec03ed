"""Multi-device tests on a virtual 8-device CPU mesh (SURVEY.md §4: the
fake-multi-device trick; conftest sets
``--xla_force_host_platform_device_count=8``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differentialdynamicprogramming_jl_tpu import ILQGConfig
from differentialdynamicprogramming_jl_tpu.models.linear import (
    random_lti, make_lti_problem)
from differentialdynamicprogramming_jl_tpu.parallel.mesh import (
    make_mesh, ilqg_batched, ilqg_sharded)


@pytest.fixture(scope="module")
def problem_batch():
    key = jax.random.PRNGKey(0)
    T, B = 60, 16
    spec = random_lti(key, n=6, m=2, T=T, dtype=jnp.float64)
    prob = make_lti_problem(spec, T)
    x0s = jnp.tile(spec.x0, (B, 1)) * jnp.linspace(0.5, 2.0, B)[:, None]
    u0s = jnp.tile(spec.u0, (B, 1, 1))
    return prob, x0s, u0s


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_matches_vmap(problem_batch):
    """shard_map over 8 devices gives the same solves as single-device vmap."""
    prob, x0s, u0s = problem_batch
    cfg = ILQGConfig(max_iter=20)
    ref = ilqg_batched(prob, x0s, u0s, cfg=cfg)
    mesh = make_mesh()
    shd = ilqg_sharded(prob, x0s, u0s, cfg=cfg, mesh=mesh)
    np.testing.assert_allclose(np.array(shd.u), np.array(ref.u), atol=1e-9)
    np.testing.assert_allclose(np.array(jnp.sum(shd.cost, -1)),
                               np.array(jnp.sum(ref.cost, -1)), rtol=1e-12)
    np.testing.assert_array_equal(np.array(shd.reason), np.array(ref.reason))


def test_sharded_with_psum_stats(problem_batch):
    """reduce_stats=True psums fleet-wide convergence stats over the mesh."""
    prob, x0s, u0s = problem_batch
    cfg = ILQGConfig(max_iter=20)
    mesh = make_mesh()
    res, stats = ilqg_sharded(prob, x0s, u0s, cfg=cfg, mesh=mesh,
                              reduce_stats=True)
    total_cost = float(jnp.sum(res.cost))
    np.testing.assert_allclose(float(stats[0]), total_cost, rtol=1e-12)
    assert float(stats[1]) == float(jnp.sum(res.n_iters))


def test_output_is_sharded(problem_batch):
    """Outputs stay device-sharded (no gather to host layout)."""
    prob, x0s, u0s = problem_batch
    mesh = make_mesh()
    res = ilqg_sharded(prob, x0s, u0s, cfg=ILQGConfig(max_iter=5), mesh=mesh)
    shard_devs = {s.device for s in res.u.addressable_shards}
    assert len(shard_devs) == 8
