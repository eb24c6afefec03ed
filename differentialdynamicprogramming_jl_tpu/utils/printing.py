"""Host-callback iteration printing — the reference's verbosity surface.

The reference prints iteration tables with periodic headers
(``src/iLQG.jl:288-297``), EXIT/SUCCESS messages (``src/iLQG.jl:259,306,319``),
an iLQGkl period table (``src/iLQGkl.jl:151-159``) and boxQP progress lines
(``src/boxQP.jl:65-66,153-156,181-184``). Under jit these become
``jax.debug.print`` host callbacks gated by ``lax.cond``/``lax.switch`` —
zero cost when verbosity excludes them (the prints are only staged into the
program when the *static* verbosity flag asks for them).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_ILQG_HEADER = ("iteration     cost        reduction   expected    "
                "gradient    log10(lam)")

_ILQGKL_HEADER = ("iteration     est. cost     reduction     expected    "
                  "gradient    log10(eta)  divergence    entropy")


def _noop():
    return None


def ilqg_begin():
    """``src/iLQG.jl:218``."""
    jax.debug.print("---------- begin iLQG ----------")


def ilqg_row(it, cost_old, dcost, expected, g_norm, lam, accept,
             print_head: int = 10):
    """One iteration row with a periodic header (``src/iLQG.jl:288-303``):
    accepted rows print the pre-update cost; rejected rows print NO STEP."""
    lam_l = jnp.log10(jnp.maximum(lam, 1e-300))

    def header():
        jax.debug.print(_ILQG_HEADER)

    lax.cond((it - 1) % print_head == 0, header, _noop)

    def row_acc():
        jax.debug.print(
            "{i:<12d}{c:<12.6g}{d:<12.3g}{e:<12.3g}{g:<12.3g}{l:<12.1f}",
            i=it, c=cost_old, d=dcost, e=expected, g=g_norm, l=lam_l)

    def row_rej():
        jax.debug.print(
            "{i:<12d}NO STEP     {d:<12.3g}{e:<12.3g}{g:<12.3g}{l:<12.1f}",
            i=it, d=dcost, e=expected, g=g_norm, l=lam_l)

    lax.cond(accept, row_acc, row_rej)


def ilqg_exit(reason, it, cost, g_norm, lam):
    """Exit messages (``src/iLQG.jl:259,306-309,319-322,334``) + the final
    one-line summary standing in for the reference's ``print_timing``
    (``src/iLQG.jl:343-366``; phase timings cannot be measured inside one
    jitted program — use ``utils.profiling.ilqg_profiled`` for the %
    breakdown)."""
    summary = (" iterations:   {i}\n final cost:   {c:<12.7g}\n"
               " final grad:   {g:<12.7g}\n final lambda: {l:<12.7e}\n"
               "=========== end iLQG ===========")
    msgs = [
        # reason 0 = the while_loop hit its iteration cap before any
        # termination criterion fired (e.g. a bounded fleet chunk); the
        # reference has no exact analogue, but every reference exit path
        # prints SOMETHING, so say so explicitly instead of a blank line
        "\nEXIT: iteration cap reached\n",
        "\nSUCCESS: gradient norm < tol_grad\n",
        "\nSUCCESS: cost change < tol_fun\n",
        "\nEXIT: lambda > lambda_max\n",
        "\nEXIT: Maximum iterations reached.\n",
        "\nEXIT: Initial control sequence caused divergence\n",
    ]
    # one print per branch keeps message + summary in reference order
    # (separate unordered debug.print callbacks may interleave)
    branches = [
        (lambda msg=msg: (lambda: jax.debug.print(
            msg + summary, i=it, c=cost, g=g_norm, l=lam)))()
        for msg in msgs
    ]
    lax.switch(jnp.clip(reason, 0, 5), branches)


def ilqg_cholesky_failed(diverge_idx):
    """``src/iLQG.jl:245`` (verbosity > 2)."""
    lax.cond(diverge_idx > 0,
             lambda: jax.debug.print("Cholesky failed at timestep {t}.",
                                     t=diverge_idx),
             _noop)


def ilqgkl_row(it, cost_new, dcost, expected, g_norm, eta_mean, div_mean,
               ent, print_head: int = 10, print_period: int = 1):
    """``src/iLQGkl.jl:151-159``."""

    def maybe():
        lax.cond((it - 1) % (print_head * print_period) == 0,
                 lambda: jax.debug.print(_ILQGKL_HEADER), _noop)
        jax.debug.print(
            "{i:<14d}{c:<14.6g}{d:<14.3g}{e:<14.3g}{g:<12.3g}{l:<12.2f}"
            "{v:<14.3g}{h:<12.3g}",
            i=it, c=cost_new, d=dcost, e=expected, g=g_norm,
            l=jnp.log10(jnp.maximum(eta_mean, 1e-300)), v=div_mean, h=ent)

    lax.cond(it % print_period == 0, maybe, _noop)


def ilqgkl_exit(satisfied, eta_maxed, kl_violated):
    """``src/iLQGkl.jl:173-181,248``."""
    lax.cond(satisfied,
             lambda: jax.debug.print(
                 "\nSUCCESS: abs(KL-divergence) < kl_step"), _noop)
    lax.cond((~satisfied) & eta_maxed,
             lambda: jax.debug.print("\nEXIT: eta > eta_max"), _noop)
    lax.cond(kl_violated,
             lambda: jax.debug.print(
                 "WARNING: KL divergence too high when done"), _noop)


def lanes_row(it, n_active, mean_cost, accept_frac, mean_lam, mean_g,
              print_head: int = 10):
    """Fleet-aggregate iteration row for the lane drivers (the per-scenario
    reference table does not scale to 4096 lanes; aggregates do)."""
    lax.cond((it - 1) % print_head == 0,
             lambda: jax.debug.print(
                 "iteration   active      mean cost   accept      "
                 "mean log10(lam)  mean grad"), _noop)
    jax.debug.print(
        "{i:<12d}{a:<12d}{c:<12.6g}{p:<12.3f}{l:<17.1f}{g:<12.3g}",
        i=it, a=n_active, c=mean_cost, p=accept_frac,
        l=jnp.log10(jnp.maximum(mean_lam, 1e-300)), g=mean_g)


def kl_lanes_row(it, n_active, mean_cost, mean_eta, mean_div, sat_frac,
                 print_head: int = 10):
    """Fleet-aggregate row for the lane iLQGkl driver (cf. the reference's
    period table, ``src/iLQGkl.jl:151-159``)."""
    lax.cond((it - 1) % print_head == 0,
             lambda: jax.debug.print(
                 "iteration   active      est. cost   log10(eta)  "
                 "divergence  satisfied"), _noop)
    jax.debug.print(
        "{i:<12d}{a:<12d}{c:<12.6g}{l:<12.2f}{v:<12.3g}{s:<12.3f}",
        i=it, a=n_active, c=mean_cost,
        l=jnp.log10(jnp.maximum(mean_eta, 1e-300)), v=mean_div, s=sat_frac)


_BOXQP_RESULTS = [
    "Hessian is not positive definite",          # result = -1
    "No descent direction found",                # result = 0
    "Maximum main iterations exceeded",          # result = 1
    "Maximum line-search iterations exceeded",   # result = 2
    "No bounds, returning Newton point",         # result = 3
    "Improvement smaller than tolerance",        # result = 4
    "Gradient norm smaller than tolerance",      # result = 5
    "All dimensions are clamped",                # result = 6
]


def boxqp_begin(n: int, value):
    """``src/boxQP.jl:65-66``."""
    jax.debug.print(
        "==========\nStarting box-QP, dimension {n}, initial value: {v:.3f}",
        n=n, v=value)


def boxqp_row(it, value, gnorm, reduction, step_dec, nstep, n_clamped):
    """``src/boxQP.jl:153-156``, incl. the backtracking exponent
    (``linesearch stepDec^nstep`` — the masked line-search while_loop
    carries its step count, so it IS host-visible)."""
    jax.debug.print(
        "iter {i:<4d} value {v:< 9.5g} |g| {g:<9.3g}  reduction {r:<9.3g}  "
        "linesearch {s:g}^{n:<2d}  n_clamped {c}",
        i=it, v=value, g=gnorm, r=reduction, s=step_dec, n=nstep,
        c=n_clamped)


def boxqp_result(result, iters, gnorm, value, nfactor):
    """``src/boxQP.jl:172-184`` result table."""
    branches = [
        (lambda msg=msg: (lambda: jax.debug.print(
            "RESULT: " + msg + ".\niterations {i}  gradient {g:<12.6g} "
            "final value {v:<12.6g}  factorizations {f}",
            i=iters, g=gnorm, v=value, f=nfactor)))()
        for msg in _BOXQP_RESULTS
    ]
    lax.switch(jnp.clip(result + 1, 0, 7), branches)
