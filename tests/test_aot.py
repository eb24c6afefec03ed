"""AOT export / serve round-trips (utils/aot.py).

The artifact must reproduce the live-jit path EXACTLY — same program, same
bits — and return the package's native result types on the serving side.
No reference analogue (JIT-on-first-call Julia library); this is the
framework's compile-once/serve-many production entry.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, default_x0, make_pendcart_problem, pendcart_derivs_tiles,
    pendcart_lanes)
from differentialdynamicprogramming_jl_tpu.parallel.mesh import ilqg_batched
from differentialdynamicprogramming_jl_tpu.solvers.batch import (
    BatchILQGResult, ilqg_batch_lanes)
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ILQGConfig, ILQGResult, default_alphas)
from differentialdynamicprogramming_jl_tpu.utils.aot import (
    deserialize_solver, load_solver, save_solver, serialize_solver)


def _xla_solver(dtype):
    spec = PendCartSpec()
    problem = make_pendcart_problem(spec, derivs="autodiff", dtype=dtype)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15, max_iter=5)
    lims = jnp.array([[-5.0, 5.0]], dtype)

    def solve(x0s, u0s):
        return ilqg_batched(problem, x0s, u0s, lims=lims, cfg=cfg)

    B, T = 3, 11
    x0 = default_x0(dtype)
    x0s = x0[None, :] + 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (B, 4), dtype)
    u0s = jnp.zeros((B, T, 1), dtype)
    return solve, x0s, u0s


def test_xla_tier_roundtrip_bit_exact():
    solve, x0s, u0s = _xla_solver(jnp.float64)
    direct = jax.jit(solve)(x0s, u0s)

    blob = serialize_solver(solve, x0s, u0s)
    assert isinstance(blob, bytes) and len(blob) > 0
    served = deserialize_solver(blob)(x0s, u0s)

    # native result type on the serving side, not a flat tuple
    assert isinstance(served, ILQGResult)
    for a, b in zip(jax.tree_util.tree_leaves(direct),
                    jax.tree_util.tree_leaves(served)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_load_file_roundtrip(tmp_path):
    solve, x0s, u0s = _xla_solver(jnp.float64)
    path = tmp_path / "solver.bin"
    save_solver(path, solve, x0s, u0s)
    assert path.stat().st_size > 0
    served = load_solver(path)(x0s, u0s)
    direct = jax.jit(solve)(x0s, u0s)
    np.testing.assert_array_equal(np.asarray(direct.cost),
                                  np.asarray(served.cost))


def test_artifact_pins_shapes():
    solve, x0s, u0s = _xla_solver(jnp.float64)
    serve = deserialize_solver(serialize_solver(solve, x0s, u0s))
    # shape guard: wrong B must be rejected by the artifact's own shape
    # check (jax.export raises ValueError naming the dimension mismatch),
    # not by some unrelated failure
    with pytest.raises(ValueError, match="(?i)shape|dimension|mismatch"):
        serve(jnp.concatenate([x0s, x0s]), jnp.concatenate([u0s, u0s]))


def test_lane_tier_roundtrip_bit_exact():
    """The Pallas lane driver (interpret mode on CPU) exports and serves
    bit-exactly, returning a native BatchILQGResult."""
    dtype = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15)

    def solve(x0s, u0s):
        return ilqg_batch_lanes(model, None, x0s, u0s,
                                lims=((-5.0, 5.0),), cfg=cfg,
                                derivs_tiles=tiles, max_steps=3,
                                kt_backward=2, kt_forward=2,
                                interpret=True)

    B, T = 8, 9
    x0 = default_x0(dtype)
    x0s = x0[None, :] + 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (B, 4), dtype)
    u0s = jnp.zeros((B, T, 1), dtype)

    direct = jax.jit(solve)(x0s, u0s)
    served = deserialize_solver(serialize_solver(solve, x0s, u0s))(x0s, u0s)

    assert isinstance(served, BatchILQGResult)
    np.testing.assert_array_equal(np.asarray(direct.cost_total),
                                  np.asarray(served.cost_total))
    np.testing.assert_array_equal(np.asarray(direct.u),
                                  np.asarray(served.u))
    np.testing.assert_array_equal(np.asarray(direct.reason),
                                  np.asarray(served.reason))
