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
TPU-native fleet-throughput component the framework adds. Host-side control
(index gathering) runs between chunks; each distinct compacted batch size
compiles once (sizes are padded to the 1024-lane tile, so there are at most
log₂(B/1024)+1 distinct executables).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import dataclasses
import numpy as np

import jax.numpy as jnp

from .batch import BatchILQGResult, ilqg_batch_lanes
from .ilqg import ILQGConfig

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

    def run(x0s_, u0s_, cost0_, lam0_, dlam0_, acc0_, params_, cap):
        c = dataclasses.replace(cfg, iter_cap=cap)
        return ilqg_batch_lanes(
            model, packed_derivs, x0s_, u0s_, lims=lims, cfg=c,
            derivs_tiles=derivs_tiles, params=params_, cost0=cost0_,
            lam0=lam0_, dlam0=dlam0_, accepted0=acc0_,
            kt_backward=kt_backward, kt_forward=kt_forward,
            interpret=interpret)

    # ---- chunk 1: full fleet, cold start
    res = run(x0s, u0s, None, None, None, None, params, chunk_iters + 1)

    # numpy accumulators for the merged result
    acc = {f: np.array(getattr(res, f)) for f in
           ("x", "u", "Vx", "Vxx", "cost", "cost_total", "n_iters",
            "n_accepted", "reason", "lam", "dlam", "g_norm")}
    pol = {f: np.array(getattr(res.policy, f))
           for f in ("K", "k", "sigma", "sigma_inv")}

    for chunk in range(1, max_chunks):
        unfinished = acc["reason"] == 0
        n_left = int(unfinished.sum())
        if verbose:
            print(f"  fleet chunk {chunk}: {n_left}/{B} scenarios "
                  f"still running")
        if n_left == 0:
            break
        idx = np.flatnonzero(unfinished)
        # compact (the driver pads to the 1024-lane tile internally)
        sub = run(jnp.asarray(acc["x"][idx]), jnp.asarray(acc["u"][idx]),
                  jnp.asarray(acc["cost"][idx]),
                  jnp.asarray(acc["lam"][idx]),
                  jnp.asarray(acc["dlam"][idx]),
                  jnp.asarray(acc["n_accepted"][idx]),
                  None if params is None else jnp.asarray(
                      np.asarray(params)[idx]),
                  chunk_iters + 1)
        for f in acc:
            v = np.asarray(getattr(sub, f))
            if f == "n_iters":
                acc[f][idx] += v
            else:
                acc[f][idx] = v
        for f in pol:
            pol[f][idx] = np.asarray(getattr(sub.policy, f))

    from ..policy import GaussianPolicy
    return BatchILQGResult(
        x=jnp.asarray(acc["x"]), u=jnp.asarray(acc["u"]),
        policy=GaussianPolicy(**{f: jnp.asarray(v)
                                 for f, v in pol.items()}),
        Vx=jnp.asarray(acc["Vx"]), Vxx=jnp.asarray(acc["Vxx"]),
        cost=jnp.asarray(acc["cost"]),
        cost_total=jnp.asarray(acc["cost_total"]),
        n_iters=jnp.asarray(acc["n_iters"]),
        n_accepted=jnp.asarray(acc["n_accepted"]),
        reason=jnp.asarray(acc["reason"]),
        lam=jnp.asarray(acc["lam"]), dlam=jnp.asarray(acc["dlam"]),
        g_norm=jnp.asarray(acc["g_norm"]), trace=None)
