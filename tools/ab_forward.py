"""A/B instrument: fetch-synchronized forward-kernel latency at the
north-star workload (B=4096, T=500, pendcart ±5, f32) — phase A (multi-α
line-search totals) and phase B (accepted-α trajectory re-roll).

Usage: python tools/ab_forward.py <repo_root> [label] [A|B] [k_t]
Protocol identical to tools/ab_backward.py: N_CHAIN data-dependent kernel
launches inside ONE dispatch, one host fetch, fetch baseline subtracted.
"""
import sys
import time

root = sys.argv[1]
label = sys.argv[2] if len(sys.argv) > 2 else root
phase = sys.argv[3] if len(sys.argv) > 3 else "A"
KT = int(sys.argv[4]) if len(sys.argv) > 4 else 10
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
from differentialdynamicprogramming_jl_tpu.solvers.ilqg import default_alphas

B, T, N_CHAIN = 4096, 500, 400


def fetch(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[0]))


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    dtype = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    lims = ((-5.0, 5.0),)
    n, m = 4, 1
    lay = OutLayout(n, m, "gains")
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
                       k_t=16)
    traj = fb.traj
    bo = backward_lanes(traj, jnp.ones(L, dtype), n=n, m=m, reg_type=2,
                        lims=lims, k_t=25, derivs_tiles=tiles,
                        emit="gains").out
    alphas = jnp.asarray(default_alphas(0.2, -3.0, 6), dtype)
    A = alphas.shape[0]
    al_all = jnp.broadcast_to(alphas.reshape(A, 1, 1, 1), (A,) + L)
    one_l = jnp.ones((1,) + L, dtype)
    g_sl = lay.K + m * n

    if phase == "A":
        def one(tr, sh):
            return forward_lanes(tr, bo, x0_l, al_all + sh, model=model,
                                 lims=lims, gk=lay.k, gK=lay.K,
                                 g_slots=g_sl, k_t=KT)

        @jax.jit
        def chain(tr):
            def body(i, s):
                o = one(tr, s)
                return 0.0 * o.totals[0]     # serializing zero dependency
            return jax.lax.fori_loop(0, N_CHAIN, body,
                                     jnp.zeros(L, dtype))
    else:
        def one(tr, sh):
            return forward_lanes(tr, bo, x0_l, one_l + sh, model=model,
                                 lims=lims, gk=lay.k, gK=lay.K,
                                 g_slots=g_sl, emit_traj=True, k_t=KT)

        @jax.jit
        def chain(tr):
            def body(i, s):
                o = one(tr, s)
                return 0.0 * o.totals[0]
            return jax.lax.fori_loop(0, N_CHAIN, body,
                                     jnp.zeros(L, dtype))

    g = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    fetch(g(z))
    base = min(_t(lambda: fetch(g(z))) for _ in range(5))

    fetch(chain(traj))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(chain(traj))
        best = min(best, (time.perf_counter() - t0 - base) / N_CHAIN)
    print(f"AB {label}: forward phase {phase} {best*1e3:.4f} ms "
          f"(B={B}, T={T}, k_t={KT}, A={A if phase == 'A' else 1})")


if __name__ == "__main__":
    main()
