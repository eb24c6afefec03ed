"""Probe: separate DMA cost from compute cost in the backward kernel shapes.

Runs three kernels over the same (T=500, DU=47, nB=4) packed stream:
  1. copy-only:   out slots = first S_out input slots (pure DMA)
  2. light math:  ~60 FMA tile-ops per step (Qx/Qu-level work)
  3. full math:   the real backward kernel
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from differentialdynamicprogramming_jl_tpu.ops.pallas.pack import (
    SUBLANES, LANES)

T, DU, S, nB = 500, 47, 27, 4
tile = (SUBLANES, LANES)


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:>28}: {min(ts)*1e3:9.3f} ms")


def make(kind, k_t=8, n_math=60):
    Tb = T // k_t

    def kernel(dp_ref, o_ref, scr):
        for kk in range(k_t):
            if kind == "copy":
                for s in range(S):
                    o_ref[kk, s, 0] = dp_ref[kk, s, 0]
            else:
                acc = scr[0]
                nm = n_math if kind == "light" else 600
                for i in range(nm):
                    acc = acc + dp_ref[kk, i % DU, 0] * scr[1]
                scr[0] = acc
                for s in range(S):
                    o_ref[kk, s, 0] = acc

    rev = lambda bt, g: (Tb - 1 - g, 0, bt, 0, 0)
    f = pl.pallas_call(
        kernel,
        grid=(nB, Tb),
        in_specs=[pl.BlockSpec((k_t, DU, 1) + tile, rev,
                               memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((T, S, nB) + tile, jnp.float32),
        out_specs=pl.BlockSpec((k_t, S, 1) + tile, rev,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2,) + tile, jnp.float32)],
    )
    return jax.jit(f)


def main():
    dp = jax.random.normal(jax.random.PRNGKey(0), (T, DU, nB) + tile,
                           jnp.float32)
    timeit("copy-only (DMA floor)", make("copy"), dp)
    timeit("light math (60 fma/step)", make("light"), dp)
    timeit("full math (600 fma/step)", make("full"), dp)


if __name__ == "__main__":
    main()
