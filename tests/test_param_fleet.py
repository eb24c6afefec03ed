"""Heterogeneous fleet: per-scenario dynamics parameters in the Pallas lane
path (params = [pole length, damping]) vs per-scenario reference solves."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, make_pendcart_problem, default_x0,
    pendcart_lanes_param, pendcart_derivs_tiles_param)
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ilqg, ILQGConfig, default_alphas)
from differentialdynamicprogramming_jl_tpu.solvers.batch import (
    ilqg_batch_lanes)

B, T = 4, 10


def test_param_fleet_matches_per_scenario_solves():
    dtype = jnp.float32
    spec = PendCartSpec()
    ls = np.array([0.25, 0.35, 0.45, 0.55], np.float32)
    ds = np.array([0.5, 0.99, 1.5, 0.8], np.float32)
    params = jnp.stack([jnp.asarray(ls), jnp.asarray(ds)], axis=-1)
    x0s = (default_x0(dtype)[None, :]
           + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, 4), dtype))
    u0s = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1), dtype)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 3), reg_type=2,
                     max_iter=3, iter_cap=5)

    out = ilqg_batch_lanes(
        pendcart_lanes_param(spec), None, x0s, u0s, lims=((-5.0, 5.0),),
        cfg=cfg, derivs_tiles=pendcart_derivs_tiles_param(spec),
        params=params, kt_backward=2, kt_forward=2, interpret=True)
    oc = np.asarray(out.cost_total)

    for i in range(B):
        sp = dataclasses.replace(spec, l=float(ls[i]), d=float(ds[i]))
        prob = make_pendcart_problem(sp, derivs="euler", dtype=dtype)
        r = ilqg(prob, x0s[i], u0s[i], lims=jnp.array([[-5.0, 5.0]], dtype),
                 cfg=cfg)
        np.testing.assert_allclose(oc[i], float(jnp.sum(r.cost)), rtol=1e-3)
