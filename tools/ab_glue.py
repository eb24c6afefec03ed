"""Isolate the per-iteration XLA glue of the lane iLQG driver (round 5).

BASELINE.md round 4 floor analysis: backward(gains) 0.24 + fused line
search 0.72 ≈ 0.96 ms vs ~1.13-1.16 ms measured full-driver iteration —
leaving ~0.2 ms of "accept/λ/termination glue" that had never been
isolated. This instrument times a 400-launch on-device ``fori_loop``
chain (the protocol of tools/ab_backward.py: one dispatch, one fetch,
fetch baseline subtracted, best of 5 windows) of the EXACT driver loop
body (solvers/batch.py loop_body, rollout entry, no trace) with
components selectively removed:

  full      the complete body: λ-retry while_loop, g_norm stream
            reduction, accept/λ/dλ/reason/done lane glue
  noretry   single backward call — no λ-retry while_loop wrapper
  nognorm   g_norm forced 0 (removes the (T,m,L)+(T,m,L) ≈16 MB
            stream re-read + reduction); grad_conv still evaluated
  nolane    accept/λ/done elementwise lane glue replaced by
            passthroughs (accept consumed only via 0-dependency)
  kernels   backward + fused line search only, minimal sel

Usage: python tools/ab_glue.py <mode> [n_chain]
Run modes interleaved in one session; differences between adjacent
modes price each glue component.
"""
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_ab")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.ops.pallas.pack import to_lanes
from differentialdynamicprogramming_jl_tpu.ops.pallas.forward_kernel import (
    forward_lanes, linesearch_lanes)
from differentialdynamicprogramming_jl_tpu.ops.pallas.backward_kernel import (
    backward_lanes, OutLayout)
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
    ILQGConfig, default_alphas, tol_fun_effective)

B, T = 4096, 500
N, M = 4, 1


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    n_chain = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    assert mode in ("full", "noretry", "nognorm", "nolane", "kernels"), mode

    f32 = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    lims = ((-5.0, 5.0),)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15)
    n, m = N, M
    lay = OutLayout(n, m)
    g_sl = lay.K + m * n
    alphas = tuple(cfg.alphas)

    x0 = default_x0(f32)
    x0s = x0[None, :] + (0.2 * jax.random.normal(
        jax.random.PRNGKey(0), (B, n), f32) * jnp.array([1, 0, 0, 0], f32))
    x0_l = to_lanes(x0s[:, None, :], B)[0]
    u_l = to_lanes(jnp.zeros((B, T, m), f32), B)
    L = x0_l.shape[1:]
    traj0 = jnp.zeros((T, n + m) + L, f32)
    gains0 = jnp.concatenate([u_l, jnp.zeros((T, m * n) + L, f32)], axis=1)
    fb0 = forward_lanes(traj0, gains0, x0_l, jnp.ones((1,) + L, f32),
                        model=model, lims=lims, gk=0, gK=1, emit_traj=True,
                        k_t=16)
    traj_init, tot_init = fb0.traj, fb0.totals[0]

    def run_bwd(traj, lam):
        return backward_lanes(traj, lam, n=n, m=m, reg_type=cfg.reg_type,
                              lims=lims, k_t=25, derivs_tiles=tiles,
                              emit="gains")

    def run_ls(traj, bo, sel):
        return linesearch_lanes(traj, bo, x0_l, sel, model=model,
                                alphas=alphas,
                                reduce_ratio_min=cfg.reduce_ratio_min,
                                lims=lims, gk=lay.k, gK=lay.K,
                                g_slots=g_sl, emit_echo=True,
                                in_place=True, k_t=25)

    ones = jnp.ones(L, f32)

    def body_full(c):
        """Exact replica of solvers/batch.py loop_body (rollout entry,
        record_trace=False), mode-gated component removal."""
        (traj, cost_tot, lam, dlam, traj_bwd, lam_used,
         done, reason, accepted, it_lane, g_norm_c, it) = c
        active = ~done
        u_cur = traj[:, n:n + m]

        res0 = run_bwd(traj, lam)
        if mode == "noretry":
            res, lam_r, dlam_r = res0, lam, dlam
            bp_aborted = jnp.zeros(L, bool)
        else:
            def retry_cond(s):
                _res, lam_, _dlam, aborted = s
                div = _res.stats[2] > 0.5
                return jnp.any(active & div & (~aborted))

            def retry_body(s):
                res_, lam_, dlam_, aborted = s
                div = (res_.stats[2] > 0.5) & active & (~aborted)
                lam_n = jnp.where(
                    div, jnp.maximum(lam_ * dlam_, cfg.lam_min), lam_)
                dlam_n = jnp.where(
                    div, jnp.maximum(dlam_ * cfg.lam_factor,
                                     cfg.lam_factor), dlam_)
                aborted_n = aborted | (div & (lam_n > cfg.lam_max))
                return (run_bwd(traj, lam_n), lam_n, dlam_n, aborted_n)

            res, lam_r, dlam_r, bp_aborted = jax.lax.while_loop(
                retry_cond, retry_body,
                (res0, lam, dlam, jnp.zeros(L, bool)))
        bo = res.out
        dV1, dV2 = res.stats[0], res.stats[1]
        bp_bad = bp_aborted | (res.stats[2] > 0.5)

        if mode == "nognorm":
            g_norm = jnp.zeros(L, f32) + 0.0 * res.stats[0]
            grad_conv = jnp.zeros(L, bool)
        else:
            k_s = bo[:, lay.k:lay.k + m]
            g_norm = jnp.mean(jnp.max(
                jnp.abs(k_s) / (jnp.abs(u_cur) + 1.0), axis=1), axis=0)
            grad_conv = (g_norm < cfg.tol_grad) & (lam_r < 1e-5) & (~bp_bad)

        allow = (~bp_bad) & (~grad_conv) & active
        sel = jnp.stack([dV1, dV2, cost_tot, allow.astype(f32)])
        fb = run_ls(traj, bo, sel)
        al_sel = fb.ls[0]
        any_ok = fb.ls[1] > 0.5
        dcost_sel = fb.ls[2]
        accept = any_ok & allow

        if mode == "nolane":
            # consume the kernel outputs with zero-deps; skip the
            # elementwise accept/λ/done bookkeeping entirely
            z = 0.0 * (al_sel + dcost_sel + lam_r + dlam_r + g_norm)
            return (fb.traj, fb.ls[4] + z, lam + z, dlam,
                    fb.echo, lam_r, done, reason, accepted, it_lane,
                    g_norm, it + 1)

        dlam_acc = jnp.minimum(dlam_r / cfg.lam_factor, 1.0 / cfg.lam_factor)
        lam_acc = jnp.maximum(lam_r * dlam_acc, cfg.lam_min)
        lam_rej = jnp.maximum(lam_r * dlam_r, cfg.lam_min)
        dlam_rej = jnp.maximum(dlam_r * cfg.lam_factor, cfg.lam_factor)
        lam_n = jnp.where(accept, lam_acc, lam_rej)
        dlam_n = jnp.where(accept, dlam_acc, dlam_rej)
        cost_conv = accept & (dcost_sel < tol_fun_effective(
            cfg.tol_fun, cost_tot))
        lam_exceeded = (active & (~accept) & (~grad_conv)
                        & (lam_n > cfg.lam_max))
        lam_n = jnp.where(grad_conv, lam_r, lam_n)
        dlam_n = jnp.where(grad_conv, dlam_r, dlam_n)
        newly_done = active & (grad_conv | cost_conv | lam_exceeded)
        reason_new = jnp.where(
            grad_conv, 1, jnp.where(cost_conv, 2, 3)).astype(jnp.int32)
        reason_n = jnp.where(newly_done, reason_new, reason)
        accepted_n = accepted + accept.astype(jnp.int32)
        done_n = done | newly_done | (accepted_n > cfg.max_iter)
        return (fb.traj, fb.ls[4],
                jnp.where(active, lam_n, lam),
                jnp.where(active, dlam_n, dlam),
                fb.echo, lam_r, done_n, reason_n, accepted_n,
                jnp.where(active, it, it_lane),
                jnp.where(active, g_norm, g_norm_c), it + 1)

    def body_kernels(c):
        traj, cost_tot, lam = c
        res = run_bwd(traj, lam)
        sel = jnp.stack([res.stats[0], res.stats[1], cost_tot, ones])
        fb = run_ls(traj, res.out, sel)
        return (fb.traj, fb.ls[4], lam + 0.0 * fb.ls[0])

    if mode == "kernels":
        carry0 = (traj_init, tot_init, ones)
        body = body_kernels
    else:
        carry0 = (traj_init, tot_init, ones, cfg.dlam * ones,
                  traj_init[:, :n + m], ones,
                  jnp.zeros(L, bool), jnp.zeros(L, jnp.int32),
                  jnp.ones(L, jnp.int32), jnp.zeros(L, jnp.int32),
                  jnp.zeros(L, f32), jnp.ones((), jnp.int32))
        body = body_full

    @jax.jit
    def chain(c0):
        return jax.lax.fori_loop(0, n_chain, lambda i, c: body(c), c0)

    g = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), f32)
    fetch(g(z))
    base = min((lambda t0: (fetch(g(z)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(5))

    fetch(chain(carry0))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(chain(carry0))
        best = min(best, (time.perf_counter() - t0 - base) / n_chain)
    print(f"AB glue [{mode}]: {best*1e3:.4f} ms/iter "
          f"(B={B}, T={T}, chain={n_chain})")


if __name__ == "__main__":
    main()
