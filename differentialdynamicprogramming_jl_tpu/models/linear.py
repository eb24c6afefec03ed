"""Linear (LTI) benchmark problem family.

Reference: ``demo_linear`` / ``demo_linear_kl`` problem construction
(``src/demo_linear.jl:8-50, 66-118``) and the Monte-Carlo test oracle
(``test/test_readme.jl:5-66``): stable random LTI dynamics built from a
skew-symmetric matrix exponential, quadratic costs, T=1000, n=10, m=2.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import expm

from ..problem import Problem, broadcast_derivs


class LTISpec(NamedTuple):
    A: jax.Array   # (n, n) discrete dynamics
    B: jax.Array   # (n, m)
    Q: jax.Array   # (n, n) state cost
    R: jax.Array   # (m, m) control cost
    x0: jax.Array  # (n,)
    u0: jax.Array  # (T, m)


def random_lti(key, n: int = 10, m: int = 2, T: int = 1000, h: float = 0.01,
               dtype=jnp.float32) -> LTISpec:
    """Random stable LTI problem with the reference's exact construction
    (``src/demo_linear.jl:9-26``): ``A = expm(h(M - Mᵀ))`` (skew-symmetric →
    orthogonal A, marginally stable), ``B = h·randn``, ``Q = h·I``,
    ``R = 0.1h·I``, ``x0 = 1``, ``u0 = 0.1·randn``."""
    ka, kb, ku = jax.random.split(key, 3)
    M = jax.random.normal(ka, (n, n), dtype)
    A = expm(h * (M - M.T))
    B = h * jax.random.normal(kb, (n, m), dtype)
    Q = h * jnp.eye(n, dtype=dtype)
    R = 0.1 * h * jnp.eye(m, dtype=dtype)
    x0 = jnp.ones((n,), dtype)
    u0 = 0.1 * jax.random.normal(ku, (T, m), dtype)
    return LTISpec(A=A, B=B, Q=Q, R=R, x0=x0, u0=u0)


def make_lti_problem(spec: LTISpec, T: int,
                     use_autodiff: bool = False) -> Problem:
    """Build the :class:`Problem` for an LTI spec.

    Dynamics ``x' = Ax + Bu`` (``src/demo_linear.jl:42-45``); cost
    ``0.5 x'Qx + 0.5 u'Ru`` (``src/demo_linear.jl:49``). Analytic derivatives
    broadcast the time-invariant ``(A, B, Q, R)`` to ``(T, ...)``
    (``src/demo_linear.jl:35-41``); ``use_autodiff=True`` exercises the
    autodiff path instead.
    """
    A, B, Q, R = spec.A, spec.B, spec.Q, spec.R

    def dynamics(x, u, t):
        return A @ x + B @ u

    def cost(x, u, t):
        return 0.5 * (x @ (Q @ x) + u @ (R @ u))

    if use_autodiff:
        derivs = None
    else:
        n, m = B.shape
        base = broadcast_derivs(
            T, fx=A, fu=B,
            cx=jnp.zeros((n,), A.dtype), cu=jnp.zeros((m,), A.dtype),
            cxx=Q, cxu=jnp.zeros((n, m), A.dtype), cuu=R)

        def derivs(x_traj, u_traj):
            return base._replace(cx=x_traj @ Q.T, cu=u_traj @ R.T)

    return Problem(dynamics=dynamics, cost=cost, derivs=derivs)


def lti_lanes(spec: LTISpec):
    """Lane-tile model for the Pallas forward kernel (see
    :func:`make_lti_problem` for the math). Dynamics/cost constants are
    baked in as Python floats — the kernel unrolls ``x' = Ax + Bu`` over the
    tiny dims as full-tile FMAs."""
    import numpy as np
    from ..ops.pallas.forward_kernel import LanesModel
    A = np.asarray(spec.A, np.float32)
    Bm = np.asarray(spec.B, np.float32)
    Q = np.asarray(spec.Q, np.float32)
    R = np.asarray(spec.R, np.float32)
    n, m = Bm.shape

    def dynamics(x, u, t):
        out = []
        for i in range(n):
            v = None
            for j in range(n):
                if A[i, j] != 0.0:
                    term = float(A[i, j]) * x[j]
                    v = term if v is None else v + term
            for mj in range(m):
                if Bm[i, mj] != 0.0:
                    term = float(Bm[i, mj]) * u[mj]
                    v = term if v is None else v + term
            out.append(v if v is not None else jnp.zeros_like(x[0]))
        return out

    def cost(x, u, t):
        c = None
        for i in range(n):
            for j in range(n):
                if Q[i, j] != 0.0:
                    term = 0.5 * float(Q[i, j]) * x[i] * x[j]
                    c = term if c is None else c + term
        for i in range(m):
            for j in range(m):
                if R[i, j] != 0.0:
                    term = 0.5 * float(R[i, j]) * u[i] * u[j]
                    c = term if c is None else c + term
        return c

    return LanesModel(n=n, m=m, dynamics=dynamics, cost=cost, terminal=None)


def lti_packed_derivs(spec: LTISpec):
    """Lane-layout derivative generator for the Pallas backward kernel
    (slot order per ``ops.pallas.pack.DerivLayout`` + controls). Constant
    ``A, B, Q, R`` broadcast; only ``cx``/``cu`` depend on the trajectory."""
    import numpy as np
    A = np.asarray(spec.A, np.float32)
    Bm = np.asarray(spec.B, np.float32)
    Q = np.asarray(spec.Q, np.float32)
    R = np.asarray(spec.R, np.float32)
    n, m = Bm.shape

    def packed(x_lanes, u_lanes):
        o = jnp.ones_like(x_lanes[:, 0])
        z = jnp.zeros_like(o)

        def const(v):
            return v * o if v != 0.0 else z

        fx = [const(float(A[i, j])) for i in range(n) for j in range(n)]
        fu = [const(float(Bm[i, j])) for i in range(n) for j in range(m)]
        cx = [sum(float(Q[i, j]) * x_lanes[:, j] for j in range(n)
                  if Q[i, j] != 0.0) if np.any(Q[i] != 0) else z
              for i in range(n)]
        cu = [sum(float(R[i, j]) * u_lanes[:, j] for j in range(m)
                  if R[i, j] != 0.0) if np.any(R[i] != 0) else z
              for i in range(m)]
        cxx = [const(float(Q[i, j])) for i in range(n) for j in range(n)]
        cxu = [z] * (n * m)
        cuu = [const(float(R[i, j])) for i in range(m) for j in range(m)]
        u_slots = [u_lanes[:, j] for j in range(m)]
        return jnp.stack(fx + fu + cx + cu + cxx + cxu + cuu + u_slots,
                         axis=1)

    return packed


def lti_derivs_tiles(spec: LTISpec):
    """In-kernel derivative tiles for the Pallas backward kernel (constant
    ``A, B, Q, R`` baked as Python floats; only cx/cu vary)."""
    import numpy as np
    A = np.asarray(spec.A, np.float32)
    Bm = np.asarray(spec.B, np.float32)
    Q = np.asarray(spec.Q, np.float32)
    R = np.asarray(spec.R, np.float32)
    n, m = Bm.shape

    def tiles(x, u, t):
        o = jnp.ones_like(x[0])
        z = jnp.zeros_like(o)

        def const(v):
            return float(v) * o if v != 0.0 else z

        def lincomb(M, vec, size):
            out = []
            for i in range(M.shape[0]):
                s = None
                for j in range(size):
                    if M[i, j] != 0.0:
                        term = float(M[i, j]) * vec[j]
                        s = term if s is None else s + term
                out.append(s if s is not None else z)
            return out

        return dict(
            fx=[[const(A[i, j]) for j in range(n)] for i in range(n)],
            fu=[[const(Bm[i, j]) for j in range(m)] for i in range(n)],
            cx=lincomb(Q, x, n),
            cu=lincomb(R, u, m),
            cxx=[[const(Q[i, j]) for j in range(n)] for i in range(n)],
            cxu=[[z for _ in range(m)] for _ in range(n)],
            cuu=[[const(R[i, j]) for j in range(m)] for i in range(m)])

    return tiles


@dataclasses.dataclass(frozen=True)
class SimpleLTVModel:
    """Linear time-varying model for covariance propagation — equivalent of
    ``LinearTimeVaryingModelsBase.SimpleLTVModel`` as used by
    ``forward_covariance`` (``src/forward_pass.jl:38-42``;
    ``src/demo_linear.jl:118``): supplies ``fx`` and the empirical prediction
    covariance ``R1`` (identity by default). Registered as a pytree so it can
    be passed through jit/vmap."""

    fx: jax.Array                      # (T, n, n)
    fu: jax.Array                      # (T, n, m)
    R1: Optional[jax.Array] = None     # (n, n)

    def fx_at(self, x_traj=None, u_traj=None) -> jax.Array:
        """Linearization along the trajectory (reference ``df(model, x, u)``,
        ``src/forward_pass.jl:38``). Sliced to the control horizon."""
        T = self.fx.shape[0] if u_traj is None else u_traj.shape[0]
        return self.fx[:T]

    def covariance(self, x_traj=None, u_traj=None) -> jax.Array:
        if self.R1 is not None:
            return self.R1
        n = self.fx.shape[-1]
        return jnp.eye(n, dtype=self.fx.dtype)

    @staticmethod
    def from_lti(A, B, T: int) -> "SimpleLTVModel":
        return SimpleLTVModel(
            fx=jnp.broadcast_to(A, (T,) + A.shape),
            fu=jnp.broadcast_to(B, (T,) + B.shape))


jax.tree_util.register_dataclass(
    SimpleLTVModel, data_fields=("fx", "fu", "R1"), meta_fields=())
