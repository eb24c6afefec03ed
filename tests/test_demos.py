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


def test_mpc_warm_start_tracking_quality():
    """Receding-horizon MPC QUALITY gate (not just shapes): the
    warm-started loop must actually drive the fleet toward the upright
    target. Calibrated on CPU (vmap tier, B=3, T=120, 30 steps, 2 inner
    iterations): mean |angle err| 0.436 → 0.191 rad; gates at 1.5× the
    measured outcome so only a real regression (e.g. a broken warm-start
    or plan-shift path) fails. Warm-start semantics:
    ``src/iLQG.jl:85-87,193-197``."""
    from differentialdynamicprogramming_jl_tpu import demos
    x, errs = demos.demo_mpc(B=3, T=120, mpc_steps=30, inner_iters=2,
                             tier="vmap", verbose=False)
    assert np.all(np.isfinite(np.asarray(x)))
    assert errs[-1] < 0.30, f"MPC tracking regressed: {errs[0]:.3f} -> " \
                            f"{errs[-1]:.3f} rad (gate 0.30)"
    assert errs[-1] < 0.65 * errs[0], (
        f"MPC made no progress toward upright: {errs[0]:.3f} -> "
        f"{errs[-1]:.3f} rad")


def test_demo_fleet_small():
    res = demos.demo_fleet(B=2, T=30, max_iter=3, dtype=jnp.float32)
    assert np.all(np.isfinite(np.asarray(res.cost)))
