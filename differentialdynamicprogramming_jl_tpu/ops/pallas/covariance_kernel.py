"""Pallas kernel: forward state-covariance propagation (lane layout).

Reference ``forward_covariance`` (``src/forward_pass.jl:37-56``): the
discrete Lyapunov iteration

    Σxx[0] = R1;   Σxx[t+1] = fx[t] Σxx[t] fx[t]ᵀ + R1

whose xx block feeds the closed-form policy KL (``src/klutils.jl:77``).
Batch on lanes, Σxx carried in VMEM scratch, fx streamed (per-scenario
linearizations) — the uu/ux blocks (K Σxx Kᵀ + Σ etc.) are cheap elementwise
functions of the emitted Σxx stream and are formed by the caller only if
needed.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pack import LANES, SUBLANES, clamp_k_t


@functools.partial(jax.jit, static_argnames=("n", "r1", "k_t", "interpret"))
def covariance_lanes(fx: jax.Array, *, n: int,
                     r1: Tuple[Tuple[float, ...], ...],
                     k_t: int = 16,
                     interpret: bool = False) -> jax.Array:
    """Propagate Σxx along the horizon.

    ``fx``: per-scenario linearizations (T, n², nB, 8, 128) (row-major);
    ``r1``: static (n, n) prediction covariance (reference ``R1``,
    ``src/forward_pass.jl:40``). Returns the Σxx stream (T, n², nB, 8, 128)
    where entry t holds Σxx[t] (Σxx[0] = R1).
    """
    T, nn, nB = fx.shape[0], fx.shape[1], fx.shape[2]
    assert nn == n * n
    k_t = clamp_k_t(k_t, T, 2 * nn)
    Tb = -(-T // k_t)
    T_pad = Tb * k_t
    if T_pad != T:
        fx = jnp.concatenate(
            [fx, jnp.zeros((T_pad - T,) + fx.shape[1:], fx.dtype)], axis=0)
    tile = (SUBLANES, LANES)

    def kernel(fx_ref, out_ref, scr):
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            for i in range(n):
                for j in range(n):
                    scr[i * n + j] = jnp.full(tile, float(r1[i][j]),
                                              jnp.float32)

        for kk in range(k_t):
            S = [[scr[i * n + j] for j in range(n)] for i in range(n)]
            for i in range(n):
                for j in range(n):
                    out_ref[kk, i * n + j, 0] = S[i][j]
            F = [[fx_ref[kk, i * n + j, 0] for j in range(n)]
                 for i in range(n)]
            # Σ' = F Σ Fᵀ + R1
            FS = [[sum(F[i][a] * S[a][b] for a in range(n))
                   for b in range(n)] for i in range(n)]
            for i in range(n):
                for j in range(n):
                    scr[i * n + j] = (sum(FS[i][b] * F[j][b]
                                          for b in range(n))
                                      + float(r1[i][j]))

    fwd = lambda bt, g: (g, 0, bt, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(nB, Tb),
        in_specs=[pl.BlockSpec((k_t, nn, 1) + tile, fwd,
                               memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((T_pad, nn, nB) + tile, jnp.float32),
        out_specs=pl.BlockSpec((k_t, nn, 1) + tile, fwd,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nn,) + tile, jnp.float32)],
        interpret=interpret,
    )(fx)
    return out[:T]
