"""Smoke tests for the demo entry points not covered elsewhere (the
reference's own test suite is demo smoke runs, SURVEY.md §4; demo_linear /
demo_linear_kl / demo_pendcart / demoQP parity runs live in their dedicated
test files)."""
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu import demos


def test_demo_mpc_vmap_tier():
    x, errs = demos.demo_mpc(B=2, T=12, mpc_steps=2, inner_iters=1,
                             tier="vmap", verbose=False)
    assert x.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(x)))
    assert len(errs) == 2


def test_demo_mpc_lanes_tier():
    """The receding-horizon loop on the Pallas fast path (warm_start entry),
    interpret mode."""
    x, errs = demos.demo_mpc(B=2, T=6, mpc_steps=2, inner_iters=1,
                             tier="lanes", interpret=True, verbose=False)
    assert x.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(x)))


def test_demo_fleet_small():
    res = demos.demo_fleet(B=2, T=30, max_iter=3, dtype=jnp.float32)
    assert np.all(np.isfinite(np.asarray(res.cost)))
