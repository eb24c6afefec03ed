"""Phase breakdown of one GPS/KL lane iteration at the north-star workload
(B=4096, T=500, pendcart, f32): GPS backward (policy emission), alpha=1
forward re-roll, and the XLA closed-form KL measurement — each timed as a
400-launch on-device chain with one fetch (tools/timing.py protocol).

Decides whether a fused covariance+KL Pallas kernel is worth building: if
the XLA KL measure (which re-reads sxx + both trajectories + both policy
streams each iteration) is a small slice of the 2.09 ms KL iteration
(BASELINE round 4), it is not.

Usage: python tools/ab_kl_phases.py <repo_root> [label]
"""
import sys
import time

root = sys.argv[1]
label = sys.argv[2] if len(sys.argv) > 2 else "kl-phases"
sys.path.insert(0, root)

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_ab")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles)
from differentialdynamicprogramming_jl_tpu.ops.pallas.pack import to_lanes
from differentialdynamicprogramming_jl_tpu.ops.pallas.forward_kernel import (
    forward_lanes)
from differentialdynamicprogramming_jl_tpu.ops.pallas.backward_kernel import (
    backward_lanes, OutLayout)
from differentialdynamicprogramming_jl_tpu.ops.pallas.covariance_kernel \
    import covariance_lanes
from differentialdynamicprogramming_jl_tpu.solvers.batch_kl import (
    kl_div_wiki_lanes)

B, T, N_CHAIN = 4096, 500, 400
n, m = 4, 1


def fetch(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[0]))


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def bench(name, chain, *args, base):
    fetch(chain(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(chain(*args))
        best = min(best, (time.perf_counter() - t0 - base) / N_CHAIN)
    print(f"AB {label}: {name} {best*1e3:.4f} ms")


def main():
    dtype = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    lims = ((-5.0, 5.0),)
    lay = OutLayout(n, m, "policy")
    x0 = default_x0(dtype)
    x0s = x0[None, :] + (0.2 * jax.random.normal(
        jax.random.PRNGKey(0), (B, 4), dtype)
        * jnp.array([1, 0, 0, 0], dtype))
    x0_l = to_lanes(x0s[:, None, :], B)[0]
    u_l = to_lanes(jnp.zeros((B, T, 1), dtype), B)
    L = x0_l.shape[1:]
    traj0 = jnp.zeros((T, n + m) + L, dtype)
    gains0 = jnp.concatenate([u_l, jnp.zeros((T, m * n) + L, dtype)],
                             axis=1)
    fb = forward_lanes(traj0, gains0, x0_l, jnp.ones((1,) + L, dtype),
                       model=model, lims=lims, gk=0, gK=1, emit_traj=True,
                       k_t=25)
    traj = fb.traj
    # previous-policy stream [k_p(0), K_p, Si_p=I]
    prev = jnp.concatenate([
        jnp.zeros((T, m) + L, dtype),
        0.1 * jnp.ones((T, m * n) + L, dtype),
        jnp.ones((T, m * m) + L, dtype)], axis=1)
    eta = jnp.ones((T, 1) + L, dtype)
    lam_l = jnp.ones(L, dtype)
    g = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    fetch(g(z))
    base = min(_t(lambda: fetch(g(z))) for _ in range(5))
    print(f"AB {label}: fetch baseline {base*1e3:.2f} ms")

    # -- phase 1: GPS backward, policy emission
    def bwd_one(tr, s):
        return backward_lanes(tr, 0.0 * lam_l * s, n=n, m=m, reg_type=1,
                              lims=lims, k_t=25, derivs_tiles=tiles,
                              emit="policy", prev=prev, eta=eta)

    @jax.jit
    def bwd_chain(tr, s0):
        def body(i, s):
            return s + 0.0 * bwd_one(tr, s).stats[0]
        return jax.lax.fori_loop(0, N_CHAIN, body, s0)

    bench("gps backward (policy emit)", bwd_chain, traj, jnp.zeros(L),
          base=base)

    bo = bwd_one(traj, jnp.zeros(L)).out
    g_sl = lay.quui + m * m

    # -- phase 2: alpha=1 forward re-roll
    one_l = jnp.ones((1,) + L, dtype)

    @jax.jit
    def fwd_chain(tr, s0):
        def body(i, s):
            f = forward_lanes(tr, bo, x0_l, one_l + 0.0 * s[None, :1, :1],
                              model=model, lims=lims, gk=lay.k, gK=lay.K,
                              g_slots=g_sl, emit_traj=True, k_t=25)
            return s + 0.0 * f.totals[0]
        return jax.lax.fori_loop(0, N_CHAIN, body, s0)

    bench("alpha=1 forward (emit)", fwd_chain, traj, jnp.zeros(L),
          base=base)

    # -- phase 3: XLA KL measurement (mu + closed-form KL + mean over T)
    fx_l = jnp.broadcast_to(
        jnp.eye(n, dtype=dtype).reshape(1, n * n, 1, 1, 1),
        (T, n * n) + L) * 0.99
    sxx = covariance_lanes(fx_l, n=n, r1=((1e-4,) * n,) * n, k_t=16)
    traj_new = forward_lanes(traj, bo, x0_l, one_l, model=model, lims=lims,
                             gk=lay.k, gK=lay.K, g_slots=g_sl,
                             emit_traj=True, k_t=25).traj
    k_p, K_p, Si_p = (prev[:, :m], prev[:, m:m + m * n],
                      prev[:, m + m * n:])

    @jax.jit
    def kl_chain(tn, s0):
        def body(i, s):
            mu = tn[:, :n] - traj[:, :n] + 0.0 * s
            div_t, pdok_t = kl_div_wiki_lanes(
                mu, sxx, bo[:, lay.k:lay.k + m],
                bo[:, lay.K:lay.K + m * n],
                bo[:, lay.quui:lay.quui + m * m], k_p, K_p, Si_p, n, m)
            return s + 0.0 * jnp.mean(div_t, axis=0)
        return jax.lax.fori_loop(0, N_CHAIN, body, s0)

    bench("XLA KL measure (mu+kl+mean)", kl_chain, traj_new,
          jnp.zeros(L), base=base)


if __name__ == "__main__":
    main()
