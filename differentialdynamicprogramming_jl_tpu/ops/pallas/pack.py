"""Lane-layout packing for the Pallas hot-path kernels.

TPU VPU registers are (8 sublanes, 128 lanes). The scenario-batch axis is the
parallel axis of this framework (SURVEY.md §2: the reference is strictly
sequential; we scale the batch), so the kernels put **batch on the lanes**:
every per-timestep scalar slot (one entry of ``fx``, ``Vxx``, …) occupies one
full (8, 128) tile over a 1024-scenario block. All small-matrix algebra then
unrolls over the tiny state/control dims as full-tile VPU ops — zero padding
waste, zero relayouts inside the kernel.

Canonical lane layout of an array with per-scenario shape ``(T, s)``:

    (T, s, nB, 8, 128)   with B = nB * 1024  (padded up)

Small matrices are flattened row-major into the slot axis ``s``. The packed
derivative stack concatenates all slots (layout computed by
:class:`DerivLayout`) so the backward kernel streams ONE contiguous block per
(batch-tile, timestep) grid step.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ...policy import Derivs

LANES = 128
SUBLANES = 8
B_TILE = LANES * SUBLANES  # 1024 scenarios per batch tile


def padded_batch(B: int) -> int:
    return -(-B // B_TILE) * B_TILE


# VMEM budget for pipelined kernel blocks (per-core VMEM is ~16 MB; leave
# headroom for scratch and compiler temporaries)
VMEM_BLOCK_BUDGET = 11 * 1024 * 1024
_TILE_BYTES = SUBLANES * LANES * 4


def clamp_k_t(k_t: int, T: int, slots_per_step: int) -> int:
    """Clamp timesteps-per-grid-step so double-buffered in+out blocks fit
    the VMEM budget (each slot is one (8, 128) f32 tile per step)."""
    per_step = 2 * slots_per_step * _TILE_BYTES
    return max(1, min(k_t, T, VMEM_BLOCK_BUDGET // per_step))


@dataclasses.dataclass(frozen=True)
class DerivLayout:
    """Slot offsets of the packed derivative stack (row-major flattening).

    Mirrors the fields of :class:`Derivs` (first-order only — the Pallas
    path covers iLQG; full-DDP second-order terms use the XLA path).
    """

    n: int
    m: int

    @property
    def fx(self) -> int: return 0

    @property
    def fu(self) -> int: return self.n * self.n

    @property
    def cx(self) -> int: return self.fu + self.n * self.m

    @property
    def cu(self) -> int: return self.cx + self.n

    @property
    def cxx(self) -> int: return self.cu + self.m

    @property
    def cxu(self) -> int: return self.cxx + self.n * self.n

    @property
    def cuu(self) -> int: return self.cxu + self.n * self.m

    @property
    def D(self) -> int: return self.cuu + self.m * self.m


def to_lanes(a: jax.Array, B: int) -> jax.Array:
    """(B, T, ...) batch-major → (T, s, nB, 8, 128) lane layout (s = prod of
    the per-scenario trailing dims, row-major)."""
    T = a.shape[1]
    s = 1
    for d in a.shape[2:]:
        s *= d
    a = a.reshape(B, T, s)
    Bp = padded_batch(B)
    if Bp != B:
        a = jnp.concatenate(
            [a, jnp.zeros((Bp - B, T, s), a.dtype)], axis=0)
    a = jnp.transpose(a, (1, 2, 0))                       # (T, s, Bp)
    return a.reshape(T, s, Bp // B_TILE, SUBLANES, LANES)


def from_lanes(a: jax.Array, B: int, shape=()) -> jax.Array:
    """(T, s, nB, 8, 128) → (B, T, *shape)."""
    T, s = a.shape[0], a.shape[1]
    a = a.reshape(T, s, -1)[:, :, :B]                     # (T, s, B)
    a = jnp.transpose(a, (2, 0, 1))                       # (B, T, s)
    return a.reshape((B, T) + tuple(shape))


def vec_to_lanes(v: jax.Array) -> jax.Array:
    """(B,) → (nB, 8, 128)."""
    B = v.shape[0]
    Bp = padded_batch(B)
    if Bp != B:
        v = jnp.concatenate([v, jnp.zeros((Bp - B,), v.dtype)])
    return v.reshape(Bp // B_TILE, SUBLANES, LANES)


def vec_from_lanes(a: jax.Array, B: int) -> jax.Array:
    """(nB, 8, 128) → (B,)."""
    return a.reshape(-1)[:B]


def pack_derivs(d: Derivs, B: int) -> jax.Array:
    """Batch-major :class:`Derivs` ((B, T, ...) leaves) → packed lane stack
    ``(T, D, nB, 8, 128)``."""
    parts = [d.fx, d.fu, d.cx, d.cu, d.cxx, d.cxu, d.cuu]
    T = d.fx.shape[1]
    flat = [p.reshape(B, T, -1) for p in parts]
    return to_lanes(jnp.concatenate(flat, axis=-1), B)
