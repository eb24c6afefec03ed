"""Per-scenario control limits + custom state-difference on the lane tier.

The reference takes ``lims`` as runtime data (``src/iLQG.jl:124``, used at
``src/forward_pass.jl:22-24`` and ``src/backward_pass.jl:45-49``) and lets
the feedback term use a user ``diff_fun`` (``src/iLQG.jl:131``,
``src/forward_pass.jl:19``). The XLA tier always covered both (traced lims
array, ``Problem.diff``); these tests pin the lane tier's counterparts:
``lims`` as per-scenario (B, m, 2) lane tiles and ``LanesModel.diff``.

Tiny shapes, interpret mode (CPU compile time dominates)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, make_pendcart_problem, default_x0, pendcart_lanes,
    pendcart_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.models.linear import (
    LTISpec, make_lti_problem, lti_lanes, lti_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ilqg, ILQGConfig, default_alphas)
from differentialdynamicprogramming_jl_tpu.solvers.batch import (
    ilqg_batch_lanes)

B, T = 8, 6


def _pend_setup():
    dtype = jnp.float32
    spec = PendCartSpec()
    problem = make_pendcart_problem(spec, derivs="euler", dtype=dtype)
    x0s = (default_x0(dtype)[None, :]
           + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, 4), dtype))
    u0s = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1), dtype)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 3), reg_type=2,
                     max_iter=2, iter_cap=3)
    return spec, problem, x0s, u0s, cfg


def test_dynamic_lims_bitexact_vs_static():
    """Homogeneous per-scenario lims rows must reproduce the static-lims
    fast path bit-exactly (same arithmetic, tile-broadcast instead of
    scalar-broadcast)."""
    spec, problem, x0s, u0s, cfg = _pend_setup()
    kw = dict(cfg=cfg, derivs_tiles=pendcart_derivs_tiles(spec),
              kt_backward=2, kt_forward=2, interpret=True)
    ref = ilqg_batch_lanes(pendcart_lanes(spec), None, x0s, u0s,
                           lims=((-5.0, 5.0),), **kw)
    lims_b = jnp.broadcast_to(jnp.array([[-5.0, 5.0]], jnp.float32),
                              (B, 1, 2))
    out = ilqg_batch_lanes(pendcart_lanes(spec), None, x0s, u0s,
                           lims=lims_b, **kw)
    np.testing.assert_array_equal(np.asarray(out.cost_total),
                                  np.asarray(ref.cost_total))
    np.testing.assert_array_equal(np.asarray(out.reason),
                                  np.asarray(ref.reason))
    np.testing.assert_array_equal(np.asarray(out.u), np.asarray(ref.u))


def test_heterogeneous_lims_match_xla_vmap():
    """A fleet with differing actuator bounds on the lane fast path vs the
    XLA tier vmapped over per-scenario lims arrays."""
    spec, problem, x0s, u0s, cfg = _pend_setup()
    hi = jnp.linspace(0.8, 6.0, B, dtype=jnp.float32)
    lims_b = jnp.stack([-hi, hi], axis=-1)[:, None, :]      # (B, 1, 2)

    ref = jax.vmap(lambda a, b, l: ilqg(problem, a, b, lims=l, cfg=cfg)
                   )(x0s, u0s, lims_b)
    out = ilqg_batch_lanes(
        pendcart_lanes(spec), None, x0s, u0s, lims=lims_b, cfg=cfg,
        derivs_tiles=pendcart_derivs_tiles(spec),
        kt_backward=2, kt_forward=2, interpret=True)

    np.testing.assert_allclose(np.asarray(out.cost_total),
                               np.asarray(jnp.sum(ref.cost, -1)), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.reason),
                                  np.asarray(out.reason))
    np.testing.assert_array_equal(np.asarray(ref.n_iters),
                                  np.asarray(out.n_iters))
    # the tighter-bounded scenarios must actually clamp differently
    u = np.asarray(out.u)
    assert np.max(np.abs(u[0])) <= 0.8 + 1e-6
    assert np.max(np.abs(u)) > 0.8 + 1e-6


def _tiny_lti_spec(n=3, m=2, dtype=jnp.float32):
    rng = np.random.default_rng(3)
    M = rng.standard_normal((n, n))
    import scipy.linalg
    A = scipy.linalg.expm(0.05 * (M - M.T))
    Bm = 0.05 * rng.standard_normal((n, m))
    return LTISpec(A=jnp.asarray(A, dtype), B=jnp.asarray(Bm, dtype),
                   Q=jnp.asarray(0.05 * np.eye(n), dtype),
                   R=jnp.asarray(0.005 * np.eye(m), dtype),
                   x0=jnp.ones((n,), dtype),
                   u0=jnp.zeros((T, m), dtype))


def test_heterogeneous_lims_m2():
    """m=2 exercises the 9-configuration boxQP enumeration with per-lane
    bounds."""
    dtype = jnp.float32
    spec = _tiny_lti_spec()
    problem = make_lti_problem(spec, T)
    x0s = jnp.ones((B, 3), dtype) * jnp.linspace(
        0.5, 2.0, B, dtype=dtype)[:, None]
    u0s = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (B, T, 2), dtype)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 3), max_iter=2,
                     iter_cap=3)
    hi0 = jnp.linspace(0.1, 1.0, B, dtype=dtype)
    hi1 = jnp.linspace(1.0, 0.2, B, dtype=dtype)
    lims_b = jnp.stack(
        [jnp.stack([-hi0, hi0], -1), jnp.stack([-hi1, hi1], -1)], axis=1)

    ref = jax.vmap(lambda a, b, l: ilqg(problem, a, b, lims=l, cfg=cfg)
                   )(x0s, u0s, lims_b)
    out = ilqg_batch_lanes(
        lti_lanes(spec), None, x0s, u0s, lims=lims_b, cfg=cfg,
        derivs_tiles=lti_derivs_tiles(spec),
        kt_backward=2, kt_forward=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out.cost_total),
                               np.asarray(jnp.sum(ref.cost, -1)), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.reason),
                                  np.asarray(out.reason))


def test_fleet_heterogeneous_lims():
    """The straggler-compacting fleet gathers per-scenario lims rows through
    compaction — results must equal the lock-step solve exactly."""
    from differentialdynamicprogramming_jl_tpu.solvers.fleet import ilqg_fleet
    spec, problem, x0s, u0s, cfg = _pend_setup()
    hi = jnp.linspace(0.8, 6.0, B, dtype=jnp.float32)
    lims_b = jnp.stack([-hi, hi], axis=-1)[:, None, :]
    kw = dict(cfg=cfg, derivs_tiles=pendcart_derivs_tiles(spec),
              kt_backward=2, kt_forward=2, interpret=True)
    lock = ilqg_batch_lanes(pendcart_lanes(spec), None, x0s, u0s,
                            lims=lims_b, **kw)
    fl = ilqg_fleet(pendcart_lanes(spec), None, x0s, u0s, lims=lims_b,
                    chunk_iters=1, chunk_growth=2.0, **kw)
    np.testing.assert_array_equal(np.asarray(fl.cost_total),
                                  np.asarray(lock.cost_total))
    np.testing.assert_array_equal(np.asarray(fl.reason),
                                  np.asarray(lock.reason))


def test_kl_tier_dynamic_lims_bitexact_vs_static():
    """GPS/KL lane driver with homogeneous per-scenario lims rows ==
    static-lims path bit-exactly."""
    from differentialdynamicprogramming_jl_tpu.ops.forward import forward_pass
    from differentialdynamicprogramming_jl_tpu.solvers.ilqgkl import (
        ILQGKLConfig)
    from differentialdynamicprogramming_jl_tpu.solvers.batch_kl import (
        ilqgkl_batch_lanes)
    from differentialdynamicprogramming_jl_tpu.policy import GaussianPolicy
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
    cfg = ILQGKLConfig(kl_step=2.0, max_iter=2)
    kw = dict(cfg=cfg, kt=4, interpret=True)
    ref = ilqgkl_batch_lanes(
        pendcart_lanes(spec), pendcart_derivs_tiles(spec), ro.x, prev,
        d.fx, jnp.sum(ro.cost, -1), lims=((-5.0, 5.0),), **kw)
    lims_b = jnp.broadcast_to(jnp.array([[-5.0, 5.0]], dtype), (B, 1, 2))
    out = ilqgkl_batch_lanes(
        pendcart_lanes(spec), pendcart_derivs_tiles(spec), ro.x, prev,
        d.fx, jnp.sum(ro.cost, -1), lims=lims_b, **kw)
    np.testing.assert_array_equal(np.asarray(out.cost_total),
                                  np.asarray(ref.cost_total))
    np.testing.assert_array_equal(np.asarray(out.eta), np.asarray(ref.eta))


# production use is mod-2π angle wrapping; at these tiny test horizons the
# per-iteration θ difference never reaches π, so the test wraps at a small
# period to make the SAME mod-wrap code path actually fire
_PERIOD = 0.4


def _wrap(a):
    """Wrap to (-period/2, period/2]."""
    return jnp.mod(a + 0.5 * _PERIOD, _PERIOD) - 0.5 * _PERIOD


def test_lane_diff_matches_problem_diff():
    """``LanesModel.diff`` (mod-wrap on θ, the angle-wrapping pattern) vs
    the XLA tier's ``Problem.diff`` — driver-level parity (reference
    ``diff_fun``, ``src/iLQG.jl:131``, ``src/forward_pass.jl:19``)."""
    dtype = jnp.float32
    spec = PendCartSpec()
    problem = make_pendcart_problem(spec, derivs="euler", dtype=dtype)

    def prob_diff(x_new, x_old):
        d = x_new - x_old
        return d.at[0].set(_wrap(d[0]))

    problem = dataclasses.replace(problem, diff=prob_diff)

    def lane_diff(x, x_old):
        return [_wrap(x[0] - x_old[0])] + [x[i] - x_old[i]
                                           for i in range(1, 4)]

    model = dataclasses.replace(pendcart_lanes(spec), diff=lane_diff)

    # PRE-ROLLED entry with a trajectory that is dynamics-INCONSISTENT
    # (θ offset by 0.3 > period/2 from step 1 on): the kernels roll x from
    # x0 under the true dynamics while x_old keeps the user-supplied
    # offset, so the feedback difference genuinely exceeds the wrap period
    # (the reference keeps such trajectories verbatim, src/iLQG.jl:193-197)
    x0s = (jnp.array([jnp.pi - 0.05, 0.0, 0.0, 0.0], dtype)[None, :]
           + 0.2 * jax.random.normal(jax.random.PRNGKey(5), (B, 4), dtype)
           * jnp.array([1, 1, 0, 0], dtype))
    u0s = 0.5 * jax.random.normal(jax.random.PRNGKey(6), (B, T, 1), dtype)
    from differentialdynamicprogramming_jl_tpu.ops.forward import (
        forward_pass)
    ro = jax.vmap(lambda a, b: forward_pass(problem, a, b))(x0s, u0s)
    off = jnp.concatenate(
        [jnp.zeros((B, 1, 4), dtype),
         jnp.broadcast_to(jnp.array([0.3, 0, 0, 0], dtype),
                          (B, T - 1, 4))], axis=1)
    x_pre = ro.x + off
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 3), reg_type=2,
                     max_iter=2, iter_cap=3)
    lims = jnp.array([[-5.0, 5.0]], dtype)

    ref = jax.vmap(lambda a, b: ilqg(problem, a, b, lims=lims, cfg=cfg)
                   )(x_pre, u0s)
    out = ilqg_batch_lanes(
        model, None, x_pre, u0s, lims=((-5.0, 5.0),), cfg=cfg,
        derivs_tiles=pendcart_derivs_tiles(spec),
        kt_backward=2, kt_forward=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out.cost_total),
                               np.asarray(jnp.sum(ref.cost, -1)), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.reason),
                                  np.asarray(out.reason))

    # sanity: the wrapped diff must actually change the solve vs default
    out_nodiff = ilqg_batch_lanes(
        pendcart_lanes(spec), None, x_pre, u0s, lims=((-5.0, 5.0),),
        cfg=cfg,
        derivs_tiles=pendcart_derivs_tiles(spec),
        kt_backward=2, kt_forward=2, interpret=True)
    assert not np.allclose(np.asarray(out.cost_total),
                           np.asarray(out_nodiff.cost_total))
