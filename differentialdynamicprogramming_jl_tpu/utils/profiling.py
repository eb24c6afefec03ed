"""Per-phase timing instrumentation.

Equivalent of the reference's ``@elapsed`` phase timers and ``print_timing``
percentage report (``src/iLQG.jl:226,236,267`` and ``:343-366``). The jitted
solvers fuse all phases into one while_loop (nothing to time from the host),
so profiling runs the outer loop in Python with each phase jitted separately
— same math, host-visible phase boundaries.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from ..problem import Problem
from ..ops.backward import backward_pass
from ..ops.forward import forward_pass, line_search
from ..solvers.ilqg import ILQGConfig, _escalate


def print_timing(t_derivs: float, t_backward: float, t_forward: float,
                 t_total: float, n_iters: int) -> None:
    """Reference-format phase breakdown (``print_timing``,
    ``src/iLQG.jl:343-366``)."""
    t_other = t_total - t_derivs - t_backward - t_forward
    tt = max(t_total, 1e-12)
    print(f"{'':12}{'derivs':>12}{'back pass':>12}{'fwd pass':>12}"
          f"{'other':>12}  (% of total)")
    print(f"{'time [%]':12}{100*t_derivs/tt:12.1f}{100*t_backward/tt:12.1f}"
          f"{100*t_forward/tt:12.1f}{100*t_other/tt:12.1f}")
    if n_iters:
        print(f"total time {t_total*1e3:.1f} ms, "
              f"{t_total*1e3/n_iters:.2f} ms per iteration")


def ilqg_profiled(problem: Problem, x0: jax.Array, u0: jax.Array,
                  lims: Optional[jax.Array] = None,
                  cfg: ILQGConfig = ILQGConfig(),
                  verbose: bool = True):
    """Run iLQG with a host-level outer loop and per-phase wall timers.

    Same algorithm as :func:`~..solvers.ilqg.ilqg` (single scenario), ~the
    reference's driver with its ``trace(:time_derivs/:time_backward/
    :time_forward)`` instrumentation. Returns ``(x, u, timings dict)``.
    """
    T, _m = u0.shape
    dtype = u0.dtype
    derivs_fn = jax.jit(problem.make_derivs())
    alphas = jnp.asarray(cfg.alphas, dtype)
    use_limits = lims is not None

    bp_fn = jax.jit(lambda d, u, lam: backward_pass(
        d, u, lam, reg_type=cfg.reg_type, lims=lims, use_limits=use_limits,
        qp_max_iter=cfg.qp_max_iter))
    fwd_fn = jax.jit(lambda x0_, u_: forward_pass(problem, x0_, u_,
                                                  lims=lims))
    ls_fn = jax.jit(lambda x0_, u_, x_, c_, pol, dV: line_search(
        problem, x0_, u_, x_, c_, pol, dV, alphas, lims,
        cfg.reduce_ratio_min))

    def sync(v):
        jax.block_until_ready(v)
        return v

    t_total0 = time.perf_counter()
    ro = sync(fwd_fn(x0, u0))
    x, u, cost = ro.x, ro.u, ro.cost
    lam, dlam = cfg.lam, cfg.dlam
    td = tb = tf = 0.0
    it = 0
    for it in range(1, cfg.max_iter + 1):
        t0 = time.perf_counter()
        d = sync(derivs_fn(x, u))
        td += time.perf_counter() - t0

        t0 = time.perf_counter()
        bp = sync(bp_fn(d, u, lam))
        while bool(bp.diverged) and lam <= cfg.lam_max:
            lam, dlam = _escalate(lam, dlam, cfg.lam_factor, cfg.lam_min)
            bp = sync(bp_fn(d, u, lam))
        tb += time.perf_counter() - t0

        g_norm = float(jnp.mean(jnp.max(
            jnp.abs(bp.policy.k) / (jnp.abs(u) + 1.0), axis=-1)))
        if g_norm < cfg.tol_grad and lam < 1e-5:
            break

        t0 = time.perf_counter()
        ls = sync(ls_fn(x0, u, x, jnp.sum(cost), bp.policy, bp.dV))
        tf += time.perf_counter() - t0

        if bool(ls.done):
            x, u, cost = ls.x, ls.u, ls.cost
            dlam = min(dlam / cfg.lam_factor, 1.0 / cfg.lam_factor)
            lam = max(lam * dlam, cfg.lam_min)
            if float(ls.dcost) < cfg.tol_fun:
                break
        else:
            lam, dlam = _escalate(lam, dlam, cfg.lam_factor, cfg.lam_min)
            if lam > cfg.lam_max:
                break

    t_total = time.perf_counter() - t_total0
    if verbose:
        print_timing(td, tb, tf, t_total, it)
    return x, u, {"derivs": td, "backward": tb, "forward": tf,
                  "total": t_total, "iters": it}
