"""AOT build/serve of the flagship lane solver on real TPU hardware.

Validates the production-serving path end to end (utils/aot.py): the
B=4096, T=500 control-limited pendcart fleet solver — Pallas kernels,
Mosaic custom calls and all — is traced + lowered + serialized by one
process (``build``), then deserialized and executed by a DIFFERENT process
(``serve``) with no access to the model-construction code path, timed with
the fetch-synchronized protocol (tools/timing.py), and checksummed against
the build process's live-jit run.

Usage:
  python tools/aot_flagship.py build [artifact.bin]   # lower + serialize + reference checksum
  python tools/aot_flagship.py serve [artifact.bin]   # load + run + time + verify checksum

Prints one JSON line per invocation.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))

from timing import fetch_baseline  # noqa: E402

B = 4096
T = 500
ITER_BUDGET = 20
N_CHAIN = 3
DEFAULT_PATH = "/tmp/ddp_flagship_aot.bin"


def _inputs(dtype=jnp.float32):
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        default_x0)
    x0 = default_x0(dtype)
    key = jax.random.PRNGKey(0)
    x0s = x0[None, :] + (0.2 * jax.random.normal(key, (B, 4), dtype)
                         * jnp.array([1, 0, 0, 0], dtype))
    u0s = jnp.zeros((B, T, 1), dtype)
    return x0s, u0s


def _checksum(res):
    return float(jnp.sum(res.cost_total))


def build(path):
    from differentialdynamicprogramming_jl_tpu.models.pendcart import (
        PendCartSpec, pendcart_derivs_tiles, pendcart_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.batch import (
        ilqg_batch_lanes)
    from differentialdynamicprogramming_jl_tpu.solvers.ilqg import (
        ILQGConfig, default_alphas)
    from differentialdynamicprogramming_jl_tpu.utils.aot import (
        save_solver)

    spec = PendCartSpec()
    model = pendcart_lanes(spec)
    tiles = pendcart_derivs_tiles(spec)
    cfg = ILQGConfig(alphas=default_alphas(0.2, -3.0, 6), reg_type=2,
                     lam_max=1e15)

    def solve(x0s, u0s):
        return ilqg_batch_lanes(model, None, x0s, u0s,
                                lims=((-5.0, 5.0),), cfg=cfg,
                                derivs_tiles=tiles, max_steps=ITER_BUDGET)

    x0s, u0s = _inputs()
    t0 = time.perf_counter()
    save_solver(path, solve, x0s, u0s)
    lower_s = time.perf_counter() - t0

    # live-jit reference checksum for the serving process to verify against
    res = jax.jit(solve)(x0s, u0s)
    ck = _checksum(res)
    with open(path + ".json", "w") as f:
        json.dump({"checksum": ck, "iters": int(np.max(np.asarray(
            res.n_iters)))}, f)
    print(json.dumps({
        "mode": "build", "path": path,
        "artifact_bytes": os.path.getsize(path),
        "lower_serialize_s": round(lower_s, 2),
        "checksum": ck,
    }))


def serve(path):
    from differentialdynamicprogramming_jl_tpu.utils.aot import load_solver

    serve_fn = load_solver(path)
    with open(path + ".json") as f:
        ref = json.load(f)

    x0s, u0s = _inputs()
    base = fetch_baseline()

    t0 = time.perf_counter()
    res = serve_fn(x0s, u0s)
    ck = _checksum(res)  # forces completion too
    first_call_s = time.perf_counter() - t0

    iters = int(np.max(np.asarray(res.n_iters)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        r = res
        for _ in range(N_CHAIN):
            u_dep = u0s + 0.0 * r.cost_total[:, None, None]
            r = serve_fn(x0s, u_dep)
        float(jnp.ravel(r.cost_total)[0])
        dt = (time.perf_counter() - t0 - base) / (N_CHAIN * iters)
        best = min(best, dt)

    print(json.dumps({
        "mode": "serve", "path": path,
        "ms_per_iter": round(best * 1e3, 3),
        "first_call_s": round(first_call_s, 2),
        "checksum": ck,
        # bit-exactness is the expectation (same artifact, same input),
        # but an XLA/libtpu version or flag change between build and
        # serve sessions can legitimately move f32 summation bits —
        # report the magnitude so a near-miss is distinguishable from a
        # real divergence
        "checksum_matches_build": bool(np.isclose(ck, ref["checksum"],
                                                  rtol=0, atol=0)),
        "checksum_abs_diff": abs(ck - ref["checksum"]),
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "build"
    path = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_PATH
    {"build": build, "serve": serve}[mode](path)
