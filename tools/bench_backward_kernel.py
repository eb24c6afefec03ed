"""Benchmark: Pallas backward kernel vs XLA vmap(scan) backward at the
BASELINE.json workload (B=4096, T=500 pendcart, control-limited, f32)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from differentialdynamicprogramming_jl_tpu.models.pendcart import (
    PendCartSpec, make_pendcart_problem, default_x0)
from differentialdynamicprogramming_jl_tpu.ops.backward import backward_pass
from differentialdynamicprogramming_jl_tpu.ops.forward import forward_pass
from differentialdynamicprogramming_jl_tpu.ops.pallas.backward_kernel import (
    backward_lanes, backward_pass_pallas, pack_backward_inputs)
from differentialdynamicprogramming_jl_tpu.ops.pallas.pack import (
    to_lanes, vec_to_lanes)

B = 4096
T = 500


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:>40}: {min(ts)*1e3:9.3f} ms")
    return out


def main():
    dtype = jnp.float32
    problem = make_pendcart_problem(PendCartSpec(), derivs="euler",
                                    dtype=dtype)
    lims = jnp.array([[-5.0, 5.0]], dtype)
    lims_t = ((-5.0, 5.0),)
    x0 = default_x0(dtype)
    key = jax.random.PRNGKey(0)
    x0s = x0[None, :] + (0.2 * jax.random.normal(key, (B, 4), dtype)
                         * jnp.array([1, 0, 0, 0], dtype))
    u0s = jnp.zeros((B, T, 1), dtype)

    ro = jax.jit(jax.vmap(lambda a, b: forward_pass(problem, a, b,
                                                    lims=lims)))(x0s, u0s)
    derivs_fn = problem.make_derivs()
    d = jax.jit(jax.vmap(derivs_fn))(ro.x, ro.u)
    lam = jnp.ones((B,), dtype)

    # XLA reference
    bp_xla = jax.jit(jax.vmap(lambda dd, uu, ll: backward_pass(
        dd, uu, lam=ll, reg_type=2, lims=lims, use_limits=True)))
    ref = timeit("XLA vmap(scan) backward", bp_xla, d, ro.u, lam)

    # Pallas, end-to-end including pack/unpack transposes
    bpp = jax.jit(lambda dd, uu, ll: backward_pass_pallas(
        dd, uu, ll, reg_type=2,
        lims=np.array([[-5.0, 5.0]], np.float32), use_limits=True))
    out = timeit("Pallas backward (incl. pack/unpack)", bpp, d, ro.u, lam)

    # Pallas, kernel only on pre-packed lane inputs
    dp = jax.jit(lambda dd, uu: pack_backward_inputs(dd, uu, B))(d, ro.u)
    lam_l = vec_to_lanes(lam)
    for kt in (1, 4, 8, 16):
        k_only = jax.jit(lambda a, c: backward_lanes(
            a, c, n=4, m=1, reg_type=2, lims=lims_t, k_t=kt))
        timeit(f"Pallas backward (kernel only, k_t={kt})", k_only, dp, lam_l)
    timeit("pack transpose",
           jax.jit(lambda dd, uu: pack_backward_inputs(dd, uu, B)), d, ro.u)

    # parity on TPU
    for name, a, b, tol in (("k", ref.policy.k, out.policy.k, 2e-3),
                            ("K", ref.policy.K, out.policy.K, 2e-3),
                            ("Vx", ref.Vx, out.Vx, 2e-2),
                            ("dV", ref.dV, out.dV, 2e-2)):
        err = float(jnp.max(jnp.abs(a - b)) /
                    (1e-6 + float(jnp.max(jnp.abs(a)))))
        print(f"   parity {name}: rel err {err:.2e}")


if __name__ == "__main__":
    main()
