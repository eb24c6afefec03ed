"""Long-horizon backward-pass bench: sequential scan vs associative-scan
Riccati (VERDICT r1 item 7 — does the O(log T) pass ever win on TPU?).

Regime it targets: SMALL batch, LONG horizon (the lane kernels already
saturate the chip for big fleets). Run on TPU; prints one JSON line per
(T, B, n) configuration with both latencies.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from differentialdynamicprogramming_jl_tpu.models.linear import (
    random_lti, make_lti_problem)
from differentialdynamicprogramming_jl_tpu.ops.backward import backward_pass
from differentialdynamicprogramming_jl_tpu.ops.forward import forward_pass
from differentialdynamicprogramming_jl_tpu.ops.riccati_scan import (
    parallel_riccati)
from timing import timeit, fetch_baseline


def bench(T, B, n, m=2, base=None):
    spec = random_lti(jax.random.PRNGKey(0), n=n, m=m, T=T,
                      dtype=jnp.float32)
    prob = make_lti_problem(spec, T)
    x0s = jnp.tile(spec.x0, (B, 1))
    u0s = jnp.tile(spec.u0, (B, 1, 1))
    ro = jax.vmap(lambda a, b: forward_pass(prob, a, b))(x0s, u0s)
    d = jax.vmap(prob.make_derivs())(ro.x, ro.u)
    lam = jnp.zeros((B,), jnp.float32)

    seq = jax.jit(jax.vmap(lambda dd, uu, ll: backward_pass(
        dd, uu, lam=ll, reg_type=1)))
    par = jax.jit(jax.vmap(lambda dd, uu: parallel_riccati(dd, uu)))

    t_seq = timeit(f"seq  T={T} B={B} n={n}", lambda: seq(d, ro.u, lam),
                   iters=5, baseline=base)
    t_par = timeit(f"par  T={T} B={B} n={n}", lambda: par(d, ro.u),
                   iters=5, baseline=base)
    print(json.dumps({"T": T, "B": B, "n": n,
                      "seq_ms": round(t_seq * 1e3, 2),
                      "par_ms": round(t_par * 1e3, 2),
                      "speedup": round(t_seq / t_par, 2)}))


def main():
    base = fetch_baseline()
    for (T, B, n) in [(1000, 8, 4), (10000, 8, 4), (10000, 8, 10),
                      (50000, 8, 4), (10000, 1, 10)]:
        bench(T, B, n, base=base)


if __name__ == "__main__":
    main()
