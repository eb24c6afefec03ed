"""A/B instrument: fetch-synchronized FUSED line-search kernel latency at
the north-star workload (B=4096, T=500, pendcart ±5, f32) — the one-launch
phase-A+accept+phase-B kernel (forward_kernel.linesearch_lanes).

Usage: python tools/ab_fused.py <repo_root> [label] [k_t] [inplace]
Protocol identical to tools/ab_backward.py (400-launch on-device chains).
With the ``inplace`` argument, the chain THREADS the trajectory through
the fori_loop carry and calls the kernel with ``in_place=True`` — the
donated-carry configuration the driver loop uses — so the alias cost or
win is measured at kernel level (the default fixed-input chain would
force a protective copy per launch and measure the wrong thing).
"""
import sys
import time

root = sys.argv[1]
label = sys.argv[2] if len(sys.argv) > 2 else root
KT = int(sys.argv[3]) if len(sys.argv) > 3 else 10
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
    forward_lanes, linesearch_lanes)
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
                        emit="gains")
    sel0 = jnp.stack([bo.stats[0], bo.stats[1], fb.totals[0],
                      jnp.ones(L, dtype)])
    alphas = tuple(default_alphas(0.2, -3.0, 6))
    g_sl = lay.K + m * n

    # mode: "fixed" (default) re-launches on the same input — pure kernel
    # latency; "threaded" carries the output trajectory into the next
    # launch (the driver-loop dataflow, output→carry copy included);
    # "inplace" = threaded + in_place=True (donated carry, zero-copy).
    mode = sys.argv[4] if len(sys.argv) > 4 else "fixed"
    assert mode in ("fixed", "threaded", "inplace"), mode

    def one(tr, s):
        return linesearch_lanes(tr, bo.out, x0_l, s, model=model,
                                alphas=alphas, reduce_ratio_min=0.0,
                                lims=lims, gk=lay.k, gK=lay.K,
                                g_slots=g_sl, in_place=(mode == "inplace"),
                                k_t=KT)

    if mode == "fixed":
        @jax.jit
        def chain(tr, s0):
            def body(i, s):
                o = one(tr, s)
                return s + 0.0 * o.ls[4]      # serializing zero dependency
            return jax.lax.fori_loop(0, N_CHAIN, body, s0)
    else:
        @jax.jit
        def chain(tr, s0):
            def body(i, c):
                tr_, s_ = c
                o = one(tr_, s_)
                return (o.traj, s_ + 0.0 * o.ls[4])
            return jax.lax.fori_loop(0, N_CHAIN, body, (tr, s0))[1]

    g = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    fetch(g(z))
    base = min(_t(lambda: fetch(g(z))) for _ in range(5))

    fetch(chain(traj, sel0))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(chain(traj, sel0))
        best = min(best, (time.perf_counter() - t0 - base) / N_CHAIN)
    print(f"AB {label}: fused line search {best*1e3:.4f} ms "
          f"(B={B}, T={T}, k_t={KT}, A={len(alphas)}, mode={mode})")


if __name__ == "__main__":
    main()
