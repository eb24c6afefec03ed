"""TPU-backend while-loop copy audit for the lane driver.

The CPU audit (tools/hlo_copy_audit.py) runs the driver at toy shapes with
interpret-mode Pallas — good for structural evidence, but the TPU backend
makes its own copy-insertion and buffer-assignment decisions (in
particular whether a pallas input/output alias SURVIVES: XLA inserts a
protective copy when it cannot prove the donated operand is dead). This
harness compiles the REAL driver jit (production shapes, real Mosaic
kernels) against the axon TPU backend, then reports every f32 copy op at
trajectory-stream scale inside the while-loop body computations. No
timing — compilation only, so relay tenancy noise is irrelevant.

Usage: timeout 1200 python tools/hlo_copy_audit_tpu.py [B] [T]
"""
import math
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
        PendCartSpec, default_x0, pendcart_lanes, pendcart_derivs_tiles)
    from differentialdynamicprogramming_jl_tpu.solvers.batch import (
        ilqg_batch_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
        ILQGConfig, default_alphas)

    dtype = jnp.float32
    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15)
    x0 = default_x0(dtype)
    x0s = x0[None, :] + (0.2 * jax.random.normal(
        jax.random.PRNGKey(0), (B, 4), dtype)
        * jnp.array([1, 0, 0, 0], dtype))
    u0s = jnp.zeros((B, T, 1), dtype)

    def solve(x0s_, u0s_):
        return ilqg_batch_lanes(model, None, x0s_, u0s_,
                                lims=((-5.0, 5.0),), cfg=cfg,
                                derivs_tiles=tiles, max_steps=20)

    lowered = jax.jit(solve).lower(x0s, u0s)
    txt = lowered.compile().as_text()

    # big-copy report, attributed to the HLO computation
    big = 2 * (T * 8 * 128 * 4)      # >= 2 trajectory slots at full B
    cur = None
    rows = []
    in_body = set()
    for line in txt.splitlines():
        s = line.strip()
        if s.startswith("%") and s.endswith("{") and " = " not in s:
            cur = s.split(" ")[0]
        if s.startswith("ENTRY"):
            cur = "ENTRY"
        if " copy(" in s and "f32[" in s:
            shape = s.split("f32[")[1].split("]")[0]
            dims = [int(d) for d in shape.split(",") if d]
            nbytes = math.prod(dims) * 4
            if nbytes >= big:
                rows.append((cur, shape, nbytes, s[:120]))
                if cur and "body" in (cur or "").lower():
                    in_body.add(len(rows) - 1)
    tot = sum(r[2] for r in rows)
    print(f"TPU HLO audit (B={B}, T={T}): {len(rows)} copies "
          f">= {big} B, total {tot/1e6:.1f} MB")
    for i, (c, shape, nb, s) in enumerate(rows):
        mark = " <== loop body" if i in in_body else ""
        print(f"  {c} :: f32[{shape}] ({nb/1e6:.1f} MB){mark}")
        print(f"    {s}")


if __name__ == "__main__":
    main()
