"""Fleet scheduler: straggler-compacting batched solves.

Motivation (BASELINE.md round-2 analysis): the lane driver's lock-step
while_loop runs every kernel over the FULL fleet until the slowest scenario
exits. On the constrained LTI benchmark a 5% tail of scenarios takes 49
iterations while the median takes 9 — the whole fleet pays 49. This module
is the runtime layer on top: solve in bounded chunks, compact the
unfinished scenarios into a smaller (tile-aligned) batch, and continue ONLY
them, using the lane driver's resume entry (pre-rolled trajectory + carried
λ/dλ/accepted counters), so the composition is semantically one
uninterrupted solve per scenario.

The reference has no analogue (single-problem library); this is the
TPU-native fleet-throughput component the framework adds. Performance
rules it obeys (hard-won — see CLAUDE.md):

- the chunk length is a TRACED scalar (`max_steps`), so every chunk — and a
  user's plain lock-step solve with the same cfg — shares one compiled
  program per batch size (a static per-chunk iter_cap cold-compiles the
  whole driver for minutes per value);
- compacted batches are padded to the 1024-lane tile on the host, so all
  straggler chunks share one executable (at most two programs total:
  cold-entry at B, resume-entry at the padded straggler size);
- trajectory-sized state (x, u, Vxx, policy, …) never leaves the device
  between chunks — gather/scatter run as XLA ops with the padded index set
  (duplicate pad indices re-solve the same scenario, so duplicate scatter
  writes are identical); only (B,)-sized vectors cross to the host.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .batch import BatchILQGResult, ilqg_batch_lanes
from .ilqg import ILQGConfig
from ..ops.pallas.pack import B_TILE

_BIG = ("x", "u", "Vx", "Vxx", "cost")
_POL = ("K", "k", "sigma", "sigma_inv")
_SMALL = ("cost_total", "n_iters", "n_accepted", "reason", "lam", "dlam",
          "g_norm")


@jax.jit
def _scatter(dst, src, gidx):
    return dst.at[gidx].set(src)


def ilqg_fleet(model,
               packed_derivs: Optional[Callable],
               x0s, u0s,
               lims: Optional[Tuple[Tuple[float, float], ...]] = None,
               cfg: ILQGConfig = ILQGConfig(),
               derivs_tiles: Optional[Callable] = None,
               params=None,
               chunk_iters: int = 16,
               max_chunks: int = 32,
               kt_backward: int = 25,
               kt_forward: int = 10,
               interpret: bool = False,
               verbose: bool = False) -> BatchILQGResult:
    """Solve B scenarios to the SAME termination criteria as
    :func:`~.batch.ilqg_batch_lanes`, but without paying straggler
    lock-step: after every ``chunk_iters`` loop iterations the still-running
    scenarios are compacted into the smallest tile-aligned batch and
    continued alone.

    Returns a batch-major :class:`BatchILQGResult` (``trace`` unsupported —
    per-chunk traces are not stitched). ``n_iters`` is the per-scenario
    total across chunks.
    """
    B = u0s.shape[0]
    params_np = None if params is None else np.asarray(params)

    def run(x0s_, u0s_, cost0_, lam0_, dlam0_, acc0_, params_, steps):
        return ilqg_batch_lanes(
            model, packed_derivs, x0s_, u0s_, lims=lims, cfg=cfg,
            derivs_tiles=derivs_tiles, params=params_, cost0=cost0_,
            lam0=lam0_, dlam0=dlam0_, accepted0=acc0_,
            max_steps=jnp.int32(steps),
            kt_backward=kt_backward, kt_forward=kt_forward,
            interpret=interpret)

    # ---- chunk 1: full fleet, cold start
    res = run(x0s, u0s, None, None, None, None, params, chunk_iters)

    big = {f: getattr(res, f) for f in _BIG}          # stays on device
    pol = {f: getattr(res.policy, f) for f in _POL}   # stays on device
    small = {f: np.array(getattr(res, f)) for f in _SMALL}

    for chunk in range(1, max_chunks):
        unfinished = small["reason"] == 0
        n_left = int(unfinished.sum())
        if verbose:
            print(f"  fleet chunk {chunk}: {n_left}/{B} scenarios "
                  f"still running")
        if n_left == 0:
            break
        idx = np.flatnonzero(unfinished)
        k = len(idx)
        kp = max(B_TILE, -(-k // B_TILE) * B_TILE)
        gidx_np = np.concatenate([idx, np.repeat(idx[:1], kp - k)])
        gidx = jnp.asarray(gidx_np)
        sub = run(big["x"][gidx], big["u"][gidx], big["cost"][gidx],
                  jnp.asarray(small["lam"][gidx_np]),
                  jnp.asarray(small["dlam"][gidx_np]),
                  jnp.asarray(small["n_accepted"][gidx_np]),
                  None if params_np is None
                  else jnp.asarray(params_np[gidx_np]),
                  chunk_iters)
        for f in _BIG:
            big[f] = _scatter(big[f], getattr(sub, f), gidx)
        for f in _POL:
            pol[f] = _scatter(pol[f], getattr(sub.policy, f), gidx)
        for f in _SMALL:
            v = np.asarray(getattr(sub, f))[:k]
            if f == "n_iters":
                small[f][idx] += v
            else:
                small[f][idx] = v

    from ..policy import GaussianPolicy
    return BatchILQGResult(
        policy=GaussianPolicy(**pol),
        **big,
        **{f: jnp.asarray(v) for f, v in small.items()},
        trace=None)
