"""A/B instrument: fetch-synchronized backward-kernel latency at the
north-star workload (B=4096, T=500, pendcart +-5, f32, in-kernel derivs).

Usage: python tools/ab_backward.py <repo_root> [label]
Times N_CHAIN data-dependent kernel launches, forces ONE host fetch,
subtracts the measured fetch baseline (tools/timing.py protocol -- under
the axon relay block_until_ready does not reliably block)."""
import sys
import time

root = sys.argv[1]
label = sys.argv[2] if len(sys.argv) > 2 else root
# optional 3rd arg: output emission mode ("full" | "gains" | "policy") —
# A/B of the bandwidth-bound output stream on one tree (OutLayout docs)
emit = sys.argv[3] if len(sys.argv) > 3 else "full"
# optional 4th arg: k_t (timesteps per grid step; gains emission shrinks
# the VMEM output block ~5×, so larger blocks fit)
KT = int(sys.argv[4]) if len(sys.argv) > 4 else 25
sys.path.insert(0, root)

import jax
# persistent compile cache (keyed by HLO hash — safe to share across
# trees): legs 2+ of an A/B skip the multi-minute cold Mosaic compile
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
    backward_lanes)

B, T, N_CHAIN = 4096, 500, 400


def fetch(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[0]))


def main():
    dtype = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    lims = ((-5.0, 5.0),)
    x0 = default_x0(dtype)
    x0s = x0[None, :] + (0.2 * jax.random.normal(
        jax.random.PRNGKey(0), (B, 4), dtype)
        * jnp.array([1, 0, 0, 0], dtype))
    x0_l = to_lanes(x0s[:, None, :], B)[0]
    u_l = to_lanes(jnp.zeros((B, T, 1), dtype), B)
    L = x0_l.shape[1:]
    traj0 = jnp.zeros((T, 5) + L, dtype)
    gains0 = jnp.concatenate([u_l, jnp.zeros((T, 4) + L, dtype)], axis=1)
    fb = forward_lanes(traj0, gains0, x0_l, jnp.ones((1,) + L, dtype),
                       model=model, lims=lims, gk=0, gK=1, emit_traj=True,
                       k_t=16)
    traj = fb.traj
    lam = jnp.ones(L, dtype)

    kw = {}
    if emit != "full":          # keep the call compatible with old trees
        kw["emit"] = emit

    def one(tr, lm):
        return backward_lanes(tr, lm, n=4, m=1, reg_type=2, lims=lims,
                              k_t=KT, derivs_tiles=tiles, **kw)

    @jax.jit
    def chain(tr, lm):
        # N_CHAIN kernel launches inside ONE dispatch (on-device fori_loop;
        # per-dispatch relay round trips otherwise swamp the measurement)
        def body(i, l):
            o = one(tr, l)
            return l + 0.0 * o.stats[0]   # serializing zero dependency
        return jax.lax.fori_loop(0, N_CHAIN, body, lm)

    # fetch baseline
    g = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    fetch(g(z))
    base = min(_t(lambda: fetch(g(z))) for _ in range(5))

    fetch(chain(traj, lam))   # compile + warm

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(chain(traj, lam))
        best = min(best, (time.perf_counter() - t0 - base) / N_CHAIN)
    print(f"AB {label}: backward kernel {best*1e3:.4f} ms "
          f"(B={B}, T={T}, k_t={KT}, emit={emit})")


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
