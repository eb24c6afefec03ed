"""Pallas TPU kernel for the batched forward rollout + multi-α line search.

Reference: ``forward_pass`` (``src/forward_pass.jl:9-33``) and the serial
backtracking line search (``src/iLQG.jl:266-281``). TPU-native re-design:

- scenario batch on the lanes (see ``pack.py``), time sequential in the grid;
- ALL line-search α candidates are evaluated inside the kernel against the
  same DMA'd per-step data — the per-candidate state lives in VMEM scratch,
  so trying 6 α's costs 6× (tiny) compute but 1× HBM traffic;
- two-phase line search: phase A emits only per-α total costs (the accept
  decision), phase B re-rolls with the per-scenario accepted α and emits the
  trajectory. 2 streaming passes beat 1 pass that materializes every
  candidate trajectory 6× over.

The dynamics/cost are supplied as **lane functions** operating on lists of
(8, 128) tiles (one tile per state/control dimension) — see
:class:`LanesModel`; models provide hand-written instances
(``models/pendcart.py``, ``models/linear.py``).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pack import LANES, SUBLANES, clamp_k_t


@dataclasses.dataclass(frozen=True)
class LanesModel:
    """Batched-on-lanes problem functions for the Pallas forward kernel.

    - ``dynamics(x, u, t) -> x_next``: x list[n], u list[m] of (8, 128)
      tiles; ``t`` is a traced scalar timestep.
    - ``cost(x, u, t) -> tile``: running cost.
    - ``terminal(x) -> tile`` or None: extra terminal cost evaluated at the
      last state of the trajectory (the reference appends a zero-control
      evaluation, ``src/system_pendcart.jl:97-106``).
    - ``n``, ``m``: state/control dims.
    - ``n_params``: per-scenario dynamics/cost parameter count. When > 0,
      all three functions take a trailing ``params`` argument (list of
      ``n_params`` lane tiles, constant over the horizon) — heterogeneous
      fleets (varying masses, lengths, targets, ...) in one compile.
    - ``diff``: optional custom state difference ``diff(x, x_old) ->
      list[n]`` of tiles, used by the feedback term of the control law
      (reference ``diff_fun``, ``src/iLQG.jl:131``,
      ``src/forward_pass.jl:19`` — e.g. angle wrapping on attitude states).
      Default: elementwise subtraction. The lane-tier counterpart of
      ``Problem.diff`` on the XLA tier.
    """

    n: int
    m: int
    dynamics: Callable
    cost: Callable
    terminal: Optional[Callable] = None
    n_params: int = 0
    diff: Optional[Callable] = None


class ForwardLanesOut(NamedTuple):
    totals: jax.Array           # (A, nB, 8, 128) total cost per α candidate
    traj: Optional[jax.Array]   # (T, n+m+1, nB, 8, 128): x, u, c — or None
    terminal: jax.Array         # (A, nB, 8, 128) terminal-cost component
    echo: Optional[jax.Array] = None  # (T, n+m, ...) input x/u slots echoed
    #                                   (emit_echo — see forward_lanes)


def _make_kernel(model: LanesModel, T: int, K_T: int, A: int,
                 lims: Optional[Tuple[Tuple[float, float], ...]],
                 gk: int, gK: int, emit_traj: bool, dyn_lims: bool = False,
                 emit_echo: bool = False):
    n, m = model.n, model.m
    P = model.n_params
    Tb = -(-T // K_T)
    T_pad = Tb * K_T
    # scratch: per candidate α — x (n), run-cost (1), terminal (1)
    stride = n + 2

    def kernel(*refs):
        refs = list(refs)
        traj_ref, gains_ref, x0_ref, alpha_ref = refs[:4]
        rest = refs[4:]
        params_ref = rest.pop(0) if P else None
        lims_ref = rest.pop(0) if dyn_lims else None
        if emit_traj:
            if emit_echo:
                totals_ref, term_ref, out_ref, echo_ref, scr = rest
            else:
                totals_ref, term_ref, out_ref, scr = rest
                echo_ref = None
        else:
            totals_ref, term_ref, scr = rest
            echo_ref = None
        g = pl.program_id(1)
        if P:
            par = [params_ref[p, 0] for p in range(P)]
            dyn = lambda x, u, t: model.dynamics(x, u, t, par)
            cost_fn = lambda x, u, t: model.cost(x, u, t, par)
            term_fn = (None if model.terminal is None
                       else (lambda x: model.terminal(x, par)))
        else:
            dyn, cost_fn, term_fn = model.dynamics, model.cost, model.terminal
        # control limits: static floats, or per-scenario lane tiles read
        # from the lims input (slot order [lo_0, hi_0, lo_1, hi_1, ...]) —
        # heterogeneous actuator bounds stay on the fast path
        # (reference lims are runtime data, src/iLQG.jl:124,
        # src/forward_pass.jl:22-24)
        if dyn_lims:
            lim_lo = [lims_ref[2 * mi, 0] for mi in range(m)]
            lim_hi = [lims_ref[2 * mi + 1, 0] for mi in range(m)]
        elif lims is not None:
            lim_lo = [lims[mi][0] for mi in range(m)]
            lim_hi = [lims[mi][1] for mi in range(m)]
        else:
            lim_lo = lim_hi = None

        @pl.when(g == 0)
        def _():
            zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
            for a in range(A):
                for i in range(n):
                    scr[a * stride + i] = x0_ref[i, 0]
                scr[a * stride + n] = zero
                scr[a * stride + n + 1] = zero

        for kk in range(K_T):
            t_log = g * K_T + kk
            x_old = [traj_ref[kk, i, 0] for i in range(n)]
            u_nom = [traj_ref[kk, n + mi, 0] for mi in range(m)]
            if echo_ref is not None:
                # echo the INPUT x/u slots — the entry trajectory the
                # driver's post-loop backward replay linearizes around.
                # Landing it in a fresh kernel output (instead of rotating
                # c.traj between carry positions) removes the per-iteration
                # 2×41 MB carry copy (BASELINE.md while-loop copy audit);
                # the values ride reads this kernel already does.
                for i in range(n):
                    echo_ref[kk, i, 0] = x_old[i]
                for mi in range(m):
                    echo_ref[kk, n + mi, 0] = u_nom[mi]
            k_t = [gains_ref[kk, gk + mi, 0] for mi in range(m)]
            K_t = [[gains_ref[kk, gK + mi * n + j, 0] for j in range(n)]
                   for mi in range(m)]
            valid = t_log < T
            is_last = t_log == (T - 1)

            for a in range(A):
                x = [scr[a * stride + i] for i in range(n)]
                alpha = alpha_ref[a, 0]
                # u = u_nom + α k + K diff(x, x_old), clamped
                # (src/forward_pass.jl:17-24; diff_fun src/iLQG.jl:131)
                if model.diff is not None:
                    dx = model.diff(x, x_old)
                else:
                    dx = [x[j] - x_old[j] for j in range(n)]
                u = []
                for mi in range(m):
                    v = u_nom[mi] + alpha * k_t[mi]
                    for j in range(n):
                        v = v + K_t[mi][j] * dx[j]
                    if lim_lo is not None:
                        v = jnp.clip(v, lim_lo[mi], lim_hi[mi])
                    u.append(v)
                c = cost_fn(x, u, t_log)
                if emit_traj and a == 0:
                    for i in range(n):
                        out_ref[kk, i, 0] = x[i]
                    for mi in range(m):
                        out_ref[kk, n + mi, 0] = u[mi]
                    out_ref[kk, n + m, 0] = c
                x_next = dyn(x, u, t_log)
                if term_fn is not None:
                    term = term_fn(x)
                    scr[a * stride + n + 1] = jnp.where(
                        is_last, term, scr[a * stride + n + 1])
                for i in range(n):
                    scr[a * stride + i] = jnp.where(valid, x_next[i], x[i])
                scr[a * stride + n] = scr[a * stride + n] + jnp.where(
                    valid, c, 0.0)

        for a in range(A):
            totals_ref[a, 0] = scr[a * stride + n] + scr[a * stride + n + 1]
            term_ref[a, 0] = scr[a * stride + n + 1]

    return kernel, Tb, T_pad, A * stride


@functools.partial(
    jax.jit,
    static_argnames=("model", "lims", "gk", "gK", "g_slots", "emit_traj",
                     "emit_echo", "k_t", "interpret"))
def forward_lanes(traj: jax.Array, gains: jax.Array, x0: jax.Array,
                  alphas: jax.Array,
                  params: Optional[jax.Array] = None,
                  lims_lanes: Optional[jax.Array] = None,
                  *, model: LanesModel,
                  lims: Optional[Tuple[Tuple[float, float], ...]] = None,
                  gk: int = 0, gK: Optional[int] = None,
                  g_slots: Optional[int] = None,
                  emit_traj: bool = False,
                  emit_echo: bool = False,
                  k_t: int = 8,
                  interpret: bool = False) -> ForwardLanesOut:
    """Run the forward kernel on lane-layout inputs.

    - ``traj``: (T, n+m, nB, 8, 128) — slots [x_old(n), u_nom(m)].
    - ``gains``: (T, Sg, nB, 8, 128) — any packed stream holding k at slot
      ``gk`` and K (row-major (m, n)) at slot ``gK`` (defaults consume a
      compact [k, K] stream; pass the backward kernel's ``out`` directly with
      its :class:`~.backward_kernel.OutLayout` offsets).
    - ``x0``: (n, nB, 8, 128); ``alphas``: (A, nB, 8, 128).
    - ``g_slots``: stream only the first ``g_slots`` slots of ``gains``
      (DMA window; must cover gk/gK+m·n). Lets the backward kernel's full
      output stream feed this kernel while only its leading gain slots cross
      HBM. Default: all slots.
    - ``emit_traj``: write the candidate-0 trajectory stream
      (T, n+m+1, nB, 8, 128) — use with A==1 and per-scenario α for the
      accepted-step re-roll.
    - ``lims_lanes``: optional PER-SCENARIO control limits as lane tiles
      (2m, nB, 8, 128), slot order [lo_0, hi_0, ...] — overrides the static
      ``lims``; heterogeneous actuator bounds in one compile (the reference
      takes lims as runtime data, ``src/iLQG.jl:124``).
    - ``emit_echo`` (with ``emit_traj``): additionally write the INPUT
      trajectory's x/u slots to a second output — the entry-trajectory
      record the batch driver's backward replay needs, produced as a fresh
      kernel output instead of a carry-position rotation copy.
    """
    n, m = model.n, model.m
    T, nB = traj.shape[0], traj.shape[2]
    A = alphas.shape[0]
    dyn_lims = lims_lanes is not None
    emit_echo = emit_echo and emit_traj
    if gK is None:
        gK = m
    if g_slots is None:
        g_slots = gains.shape[1]
    assert g_slots >= gK + m * n and g_slots >= gk + m
    k_t = clamp_k_t(k_t, T, (n + m) + g_slots
                    + ((n + m + 1) if emit_traj else 0)
                    + ((n + m) if emit_echo else 0))
    k_t = min(k_t, T)
    kernel, Tb, T_pad, n_scratch = _make_kernel(
        model, T, k_t, A, lims, gk, gK, emit_traj, dyn_lims, emit_echo)
    if T_pad != T:
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((T_pad - T,) + a.shape[1:], a.dtype)], axis=0)
        traj, gains = zpad(traj), zpad(gains)

    tile = (SUBLANES, LANES)
    f32 = jnp.float32
    fwd = lambda bt, g: (g, 0, bt, 0, 0)
    fixedA = lambda bt, g: (0, bt, 0, 0)

    out_shape = [jax.ShapeDtypeStruct((A, nB) + tile, f32),
                 jax.ShapeDtypeStruct((A, nB) + tile, f32)]
    out_specs = [pl.BlockSpec((A, 1) + tile, fixedA, memory_space=pltpu.VMEM),
                 pl.BlockSpec((A, 1) + tile, fixedA, memory_space=pltpu.VMEM)]
    if emit_traj:
        out_shape.append(
            jax.ShapeDtypeStruct((T_pad, n + m + 1, nB) + tile, f32))
        out_specs.append(
            pl.BlockSpec((k_t, n + m + 1, 1) + tile, fwd,
                         memory_space=pltpu.VMEM))
    if emit_echo:
        out_shape.append(
            jax.ShapeDtypeStruct((T_pad, n + m, nB) + tile, f32))
        out_specs.append(
            pl.BlockSpec((k_t, n + m, 1) + tile, fwd,
                         memory_space=pltpu.VMEM))

    in_specs = [
        pl.BlockSpec((k_t, n + m, 1) + tile, fwd, memory_space=pltpu.VMEM),
        pl.BlockSpec((k_t, g_slots, 1) + tile, fwd,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 1) + tile, fixedA, memory_space=pltpu.VMEM),
        pl.BlockSpec((A, 1) + tile, fixedA, memory_space=pltpu.VMEM),
    ]
    inputs = [traj, gains, x0, alphas]
    if model.n_params:
        assert params is not None and params.shape[0] == model.n_params
        in_specs.append(pl.BlockSpec((model.n_params, 1) + tile, fixedA,
                                     memory_space=pltpu.VMEM))
        inputs.append(params)
    if dyn_lims:
        assert lims_lanes.shape[0] == 2 * m, lims_lanes.shape
        in_specs.append(pl.BlockSpec((2 * m, 1) + tile, fixedA,
                                     memory_space=pltpu.VMEM))
        inputs.append(lims_lanes)

    # NOTE: no input/output aliasing here even when shapes allow it — the
    # one emit_traj call site with a cost-slot input is the KL driver,
    # whose input is the trust-region CENTER, deliberately kept live
    # across iterations (src/iLQGkl.jl:137-140); donating it would force
    # XLA to insert a protective full-stream copy per iteration. The iLQG
    # drivers' in-place update lives in linesearch_lanes (opt-in).
    res = pl.pallas_call(
        kernel,
        grid=(nB, Tb),
        in_specs=in_specs,
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((n_scratch,) + tile, f32)],
        interpret=interpret,
    )(*inputs)

    if emit_echo:
        totals, term, out, echo = res
        return ForwardLanesOut(totals=totals, traj=out[:T], terminal=term,
                               echo=echo[:T])
    if emit_traj:
        totals, term, out = res
        return ForwardLanesOut(totals=totals, traj=out[:T], terminal=term)
    totals, term = res
    return ForwardLanesOut(totals=totals, traj=None, terminal=term)


# ---------------------------------------------------------------------------
# fused line search: phase A (per-α totals) + in-VMEM α selection + phase B
# (accepted-α re-roll, trajectory emission) in ONE kernel
# ---------------------------------------------------------------------------
#
# The two-phase design (module docstring) issued two kernel launches per
# iteration with XLA glue (dcost/ratio/first-accept selects on (A, lanes)
# arrays) between them. Fusing them removes the inter-phase glue and one
# launch: the grid runs 2×Tb steps — the first Tb stream the trajectory for
# the A-candidate totals, the per-lane accept decision happens entirely in
# VMEM at the pass boundary (reference accept rule, src/iLQG.jl:269-280),
# and the second Tb re-stream the SAME input blocks (index map ``g mod Tb``)
# rolling the accepted α and emitting the new trajectory (+ the entry-echo).
# The trajectory output block index is ``max(g - Tb, 0)``: during pass 1 it
# pins block 0 (never written, never flushed — consecutive identical
# indices), so fusion adds ZERO HBM traffic.


class LineSearchLanesOut(NamedTuple):
    traj: jax.Array             # (T, n+m+1, nB, 8, 128) accepted-α rollout
    echo: Optional[jax.Array]   # (T, n+m, ...) input x/u slots (entry traj)
    ls: jax.Array               # (5, nB, 8, 128): al_sel, any_ok,
    #                             dcost_sel, ratio_sel, total_new


def _make_fused_kernel(model: LanesModel, T: int, K_T: int,
                       alphas: Tuple[float, ...], rr_min: float,
                       lims, gk: int, gK: int, dyn_lims: bool,
                       emit_echo: bool):
    n, m = model.n, model.m
    P = model.n_params
    A = len(alphas)
    Tb = -(-T // K_T)
    T_pad = Tb * K_T
    stride = n + 2
    SLS = A * stride            # scratch slot holding α_eff for pass 2
    n_scratch = SLS + 1

    def kernel(*refs):
        refs = list(refs)
        traj_ref, gains_ref, x0_ref, sel_ref = refs[:4]
        rest = refs[4:]
        params_ref = rest.pop(0) if P else None
        lims_ref = rest.pop(0) if dyn_lims else None
        if emit_echo:
            out_ref, echo_ref, ls_ref, scr = rest
        else:
            out_ref, ls_ref, scr = rest
            echo_ref = None
        g = pl.program_id(1)
        gb = jax.lax.rem(g, jnp.int32(Tb))  # block index within the pass
        if P:
            par = [params_ref[p, 0] for p in range(P)]
            dyn = lambda x, u, t: model.dynamics(x, u, t, par)
            cost_fn = lambda x, u, t: model.cost(x, u, t, par)
            term_fn = (None if model.terminal is None
                       else (lambda x: model.terminal(x, par)))
        else:
            dyn, cost_fn, term_fn = (model.dynamics, model.cost,
                                     model.terminal)
        if dyn_lims:
            lim_lo = [lims_ref[2 * mi, 0] for mi in range(m)]
            lim_hi = [lims_ref[2 * mi + 1, 0] for mi in range(m)]
        elif lims is not None:
            lim_lo = [lims[mi][0] for mi in range(m)]
            lim_hi = [lims[mi][1] for mi in range(m)]
        else:
            lim_lo = lim_hi = None
        zero = jnp.zeros((SUBLANES, LANES), jnp.float32)

        @pl.when(g == 0)
        def _():
            for a in range(A):
                for i in range(n):
                    scr[a * stride + i] = x0_ref[i, 0]
                scr[a * stride + n] = zero
                scr[a * stride + n + 1] = zero

        @pl.when(g == Tb)
        def _():
            # pass boundary: the accept decision, entirely in VMEM
            # (src/iLQG.jl:269-280; bit-identical op order to the two-phase
            # driver's XLA expression)
            dv1, dv2 = sel_ref[0, 0], sel_ref[1, 0]
            ctot, allow = sel_ref[2, 0], sel_ref[3, 0]
            al_sel = zero
            dc_sel = rt_sel = found = None
            for a_i, a in enumerate(alphas):
                tot_a = scr[a_i * stride + n] + scr[a_i * stride + n + 1]
                dcost = ctot - tot_a
                expected = (-a) * (dv1 + a * dv2)
                ratio = jnp.where(expected > 0, dcost / expected,
                                  jnp.sign(dcost))
                ok = ratio > rr_min
                if a_i == 0:
                    dc_sel, rt_sel, found = dcost, ratio, ok
                    al_sel = jnp.where(ok, a, 0.0)
                else:
                    take = ok & (~found)
                    al_sel = jnp.where(take, a, al_sel)
                    dc_sel = jnp.where(take, dcost, dc_sel)
                    rt_sel = jnp.where(take, ratio, rt_sel)
                    found = found | ok
            al_eff = jnp.where(found & (allow > 0.5), al_sel, 0.0)
            scr[SLS] = al_eff
            ls_ref[0, 0] = al_sel
            ls_ref[1, 0] = jnp.where(found, 1.0, 0.0)
            ls_ref[2, 0] = dc_sel
            ls_ref[3, 0] = rt_sel
            # re-init candidate-0 state slots for the emission pass
            for i in range(n):
                scr[i] = x0_ref[i, 0]
            scr[n] = zero
            scr[n + 1] = zero

        for kk in range(K_T):
            t_log = gb * K_T + kk
            x_old = [traj_ref[kk, i, 0] for i in range(n)]
            u_nom = [traj_ref[kk, n + mi, 0] for mi in range(m)]
            k_t = [gains_ref[kk, gk + mi, 0] for mi in range(m)]
            K_t = [[gains_ref[kk, gK + mi * n + j, 0] for j in range(n)]
                   for mi in range(m)]
            valid = t_log < T
            is_last = t_log == (T - 1)

            def substep(a_i, alpha, emit):
                x = [scr[a_i * stride + i] for i in range(n)]
                if model.diff is not None:
                    dx = model.diff(x, x_old)
                else:
                    dx = [x[j] - x_old[j] for j in range(n)]
                u = []
                for mi in range(m):
                    v = u_nom[mi] + alpha * k_t[mi]
                    for j in range(n):
                        v = v + K_t[mi][j] * dx[j]
                    if lim_lo is not None:
                        v = jnp.clip(v, lim_lo[mi], lim_hi[mi])
                    u.append(v)
                c = cost_fn(x, u, t_log)
                if emit:
                    for i in range(n):
                        out_ref[kk, i, 0] = x[i]
                    for mi in range(m):
                        out_ref[kk, n + mi, 0] = u[mi]
                    out_ref[kk, n + m, 0] = c
                    if echo_ref is not None:
                        for i in range(n):
                            echo_ref[kk, i, 0] = x_old[i]
                        for mi in range(m):
                            echo_ref[kk, n + mi, 0] = u_nom[mi]
                x_next = dyn(x, u, t_log)
                if term_fn is not None:
                    term = term_fn(x)
                    scr[a_i * stride + n + 1] = jnp.where(
                        is_last, term, scr[a_i * stride + n + 1])
                for i in range(n):
                    scr[a_i * stride + i] = jnp.where(
                        valid, x_next[i], x[i])
                scr[a_i * stride + n] = scr[a_i * stride + n] + jnp.where(
                    valid, c, 0.0)

            @pl.when(g < Tb)
            def _():
                for a_i, a in enumerate(alphas):
                    substep(a_i, a, emit=False)

            @pl.when(g >= Tb)
            def _():
                substep(0, scr[SLS], emit=True)

        @pl.when(g == 2 * Tb - 1)
        def _():
            ls_ref[4, 0] = scr[n] + scr[n + 1]

    return kernel, Tb, T_pad, n_scratch


@functools.partial(
    jax.jit,
    static_argnames=("model", "alphas", "reduce_ratio_min", "lims", "gk",
                     "gK", "g_slots", "emit_echo", "in_place", "k_t",
                     "interpret"))
def linesearch_lanes(traj: jax.Array, gains: jax.Array, x0: jax.Array,
                     sel: jax.Array,
                     params: Optional[jax.Array] = None,
                     lims_lanes: Optional[jax.Array] = None,
                     *, model: LanesModel,
                     alphas: Tuple[float, ...],
                     reduce_ratio_min: float = 0.0,
                     lims: Optional[Tuple[Tuple[float, float], ...]] = None,
                     gk: int = 0, gK: Optional[int] = None,
                     g_slots: Optional[int] = None,
                     emit_echo: bool = True,
                     in_place: bool = False,
                     k_t: int = 8,
                     interpret: bool = False) -> LineSearchLanesOut:
    """Fused line search: per-α totals + accept decision + accepted-α
    trajectory emission in one kernel launch (see the module-level fused
    design note). Arguments as :func:`forward_lanes`, except:

    - ``alphas``: STATIC descending α ladder (folded into the kernel);
    - ``sel``: (4, nB, 8, 128) lane tiles [dV1, dV2, cost_old_total,
      allow] — ``allow`` (1.0/0.0) masks lanes permitted to accept
      (active ∧ backward OK ∧ not gradient-converged);
    - ``reduce_ratio_min``: STATIC accept threshold
      (``src/iLQG.jl:269-280``);
    - ``in_place``: alias the trajectory input with the trajectory output
      (zero-copy carry update). Requires a cost-slot input
      ((T, n+m+1, ...)) and that the CALLER never reads the input
      trajectory after this call — XLA inserts a protective full-stream
      copy otherwise.

    Returns the accepted-α rollout (α=0 retrace on non-accepted lanes),
    the input-echo stream, and the (5,)-slot per-lane line-search record
    [al_sel, any_ok, dcost_sel, ratio_sel, total_new].
    """
    n, m = model.n, model.m
    T, nB = traj.shape[0], traj.shape[2]
    dyn_lims = lims_lanes is not None
    if gK is None:
        gK = m
    if g_slots is None:
        g_slots = gains.shape[1]
    assert g_slots >= gK + m * n and g_slots >= gk + m
    k_t = clamp_k_t(k_t, T, (n + m) + g_slots + (n + m + 1)
                    + ((n + m) if emit_echo else 0))
    k_t = min(k_t, T)
    kernel, Tb, T_pad, n_scratch = _make_fused_kernel(
        model, T, k_t, tuple(float(a) for a in alphas),
        float(reduce_ratio_min), lims, gk, gK, dyn_lims, emit_echo)
    if T_pad != T:
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((T_pad - T,) + a.shape[1:], a.dtype)], axis=0)
        traj, gains = zpad(traj), zpad(gains)

    tile = (SUBLANES, LANES)
    f32 = jnp.float32
    # pass 1 and pass 2 stream the same input blocks: index = g mod Tb;
    # the trajectory outputs pin block 0 during pass 1 (never written) and
    # advance with pass 2
    two = lambda bt, g: (jax.lax.rem(g, jnp.int32(Tb)), 0, bt, 0, 0)
    out2 = lambda bt, g: (jnp.maximum(g - Tb, 0), 0, bt, 0, 0)
    fixed = lambda bt, g: (0, bt, 0, 0)

    in_specs = [
        pl.BlockSpec((k_t, n + m, 1) + tile, two, memory_space=pltpu.VMEM),
        pl.BlockSpec((k_t, g_slots, 1) + tile, two,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 1) + tile, fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((4, 1) + tile, fixed, memory_space=pltpu.VMEM),
    ]
    inputs = [traj, gains, x0, sel]
    if model.n_params:
        assert params is not None and params.shape[0] == model.n_params
        in_specs.append(pl.BlockSpec((model.n_params, 1) + tile, fixed,
                                     memory_space=pltpu.VMEM))
        inputs.append(params)
    if dyn_lims:
        assert lims_lanes.shape[0] == 2 * m, lims_lanes.shape
        in_specs.append(pl.BlockSpec((2 * m, 1) + tile, fixed,
                                     memory_space=pltpu.VMEM))
        inputs.append(lims_lanes)

    out_shape = [jax.ShapeDtypeStruct((T_pad, n + m + 1, nB) + tile, f32)]
    out_specs = [pl.BlockSpec((k_t, n + m + 1, 1) + tile, out2,
                              memory_space=pltpu.VMEM)]
    if emit_echo:
        out_shape.append(
            jax.ShapeDtypeStruct((T_pad, n + m, nB) + tile, f32))
        out_specs.append(pl.BlockSpec((k_t, n + m, 1) + tile, out2,
                                      memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((5, nB) + tile, f32))
    out_specs.append(pl.BlockSpec((5, 1) + tile, fixed,
                                  memory_space=pltpu.VMEM))

    # In-place trajectory update (opt-in): when the input stream carries
    # the cost slot (the drivers' loop state, (T, n+m+1, ...)), alias it
    # with the trajectory output so the kernel REWRITES the carry buffer
    # instead of XLA copying a fresh output into the fixed carry position
    # (the one structural while-loop copy left after the echo redesign —
    # tools/hlo_copy_audit.py). Hazard-free by the grid schedule: input
    # block b's last fetch (pass-2 step Tb+b) strictly precedes output
    # block b's flush (step Tb+b+1), and distinct blocks never overlap.
    # Callers must NOT use the input trajectory after the call (XLA would
    # insert a protective copy) — the drivers' rollout-entry loop body
    # qualifies; the pre-rolled path (which keeps c.traj live for the
    # reject-select) does not.
    alias = {0: 0} if in_place and traj.shape[1] == n + m + 1 else {}
    res = pl.pallas_call(
        kernel,
        grid=(nB, 2 * Tb),
        in_specs=in_specs,
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((n_scratch,) + tile, f32)],
        input_output_aliases=alias,
        interpret=interpret,
    )(*inputs)

    if emit_echo:
        out, echo, ls = res
        return LineSearchLanesOut(traj=out[:T], echo=echo[:T], ls=ls)
    out, ls = res
    return LineSearchLanesOut(traj=out[:T], echo=None, ls=ls)
