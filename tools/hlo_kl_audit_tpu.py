"""TPU-compiled HLO inventory for the GPS/KL lane driver's while body.

The KL iteration measures 1.61 ms on TPU while its three kernels sum to
~0.56 ms (tools/ab_kl_phases.py + max_iter slope fit) — this harness
compiles the real driver jit (B=4096, T=500) against the axon backend and
prints every op in the HLO whose result is at trajectory-stream scale,
grouped by computation, so the missing ~1 ms can be attributed to real
ops (copies, materialized broadcasts, un-fused elementwise passes)
instead of guesses. Compilation-only: no timing, immune to relay drift.

Usage: timeout 1800 python tools/hlo_kl_audit_tpu.py [B] [T]
"""
import math
import re
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_ab")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
T = int(sys.argv[2]) if len(sys.argv) > 2 else 500


def main():
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles,
        make_pendcart_problem)
    from differentialdynamicprogramming_jl_tpu.ops.forward import (
        forward_pass)
    from differentialdynamicprogramming_jl_tpu.policy import GaussianPolicy
    from differentialdynamicprogramming_jl_tpu.solvers.batch_kl import (
        _ilqgkl_batch_lanes_jit)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqgkl import (
        ILQGKLConfig)

    dtype = jnp.float32
    spec = PendCartSpec()
    problem = make_pendcart_problem(spec, derivs="euler", dtype=dtype)
    x0s = (default_x0(dtype)[None, :]
           + 0.2 * jax.random.normal(jax.random.PRNGKey(0), (B, 4), dtype)
           * jnp.array([1, 1, 0, 0], dtype))
    u0s = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1), dtype)
    ro = jax.vmap(lambda a, b: forward_pass(problem, a, b))(x0s, u0s)
    prev = GaussianPolicy.zeros(T, 4, 1, dtype)
    prev = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), prev)
    prev = prev._replace(k=ro.u)
    d = jax.vmap(problem.make_derivs())(ro.x, ro.u)
    cfg = ILQGKLConfig(kl_step=2.0, max_iter=10)

    lo = _ilqgkl_batch_lanes_jit.lower(
        pendcart_lanes(spec), pendcart_derivs_tiles(spec), ro.x, prev,
        d.fx, jnp.sum(ro.cost, -1), lims=None, lims_batch=None, cfg=cfg,
        r1=None, kt=16, max_steps=jnp.int32(cfg.max_iter),
        it0=jnp.zeros((), jnp.int32), record_trace=False, interpret=False)
    txt = lo.compile().as_text()

    # Inventory: per computation, every op whose RESULT is >= `big` bytes.
    big = 16 * 1024 * 1024      # >= 2 full trajectory slots at B=4096
    shape_re = re.compile(r"f32\[([\d,]+)\]")
    cur = None
    per = {}
    for line in txt.splitlines():
        s = line.strip()
        if s.startswith("%") and s.endswith("{") and " = " not in s:
            cur = s.split(" ")[0]
        if s.startswith("ENTRY"):
            cur = "ENTRY"
        mm = shape_re.search(s.split(" = ")[1].split("(")[0]) \
            if " = " in s else None
        if not mm:
            continue
        dims = [int(x) for x in mm.group(1).split(",") if x]
        nbytes = math.prod(dims) * 4
        if nbytes < big:
            continue
        op = s.split(" = ")[1].split("(")[0].split()[-1].rstrip(".0123456789")
        key = (cur, op)
        cnt, tot = per.get(key, (0, 0))
        per[key] = (cnt + 1, tot + nbytes)
    print(f"ops with f32 results >= {big/1e6:.0f} MB, by computation:")
    for (c, op), (cnt, tot) in sorted(per.items(),
                                      key=lambda kv: -kv[1][1]):
        print(f"  {tot/1e6:9.1f} MB  x{cnt:<3d} {op:<28s} {c}")


if __name__ == "__main__":
    main()
