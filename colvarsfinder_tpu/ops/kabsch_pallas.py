r"""Pallas TPU kernel for batched 3x3 Kabsch rotations.

The designated custom kernel of this framework (SURVEY.md §2.8 /
BASELINE.json north star): given per-frame cross-covariance matrices
C [B, 3, 3], produce the optimal rigid rotations R [B, 3, 3].

Kernel design (TPU-first):

* **Structure-of-arrays**: the batch is laid out along the 128-wide lane
  dimension — a block holds the 9 entries of C as sublane rows of a
  [16, TILE_B] VMEM tile, so every step of the algorithm is an elementwise
  VPU op across TILE_B frames at once. No per-frame 3x3 LAPACK calls, no
  data-dependent control flow, one HBM read + one write per frame.
* **QCP quaternion math**: the shared elementwise formula
  :func:`colvarsfinder_tpu.ops.alignment.quaternion_from_covariance`
  (Newton on the quartic characteristic polynomial of Horn's traceless 4x4
  key matrix + adjugate-row eigenvector) runs verbatim inside the kernel —
  single source of truth with the jnp oracle it is tested against.
* **Gradients** via ``jax.custom_vjp``: the forward runs the kernel; the
  backward differentiates the mathematically identical jnp SVD formulation
  — alignment rotations must stay differentiable because generator-loss
  input gradients flow through the preprocessing layer
  (reference: colvarsfinder/core.py:403,424).
* On non-TPU backends the kernel runs in interpreter mode, so the exact
  same code path is exercised by the CPU test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .alignment import (
    quaternion_from_covariance,
    quaternion_to_rotation_entries,
)

__all__ = ["kabsch_rotations_pallas"]

TILE_B = 1024
NEWTON_ITERS = 16


def _kabsch_kernel(c_ref, out_ref):
    """c_ref: [16, TILE_B] rows 0..8 = C entries (row-major, pre-normalized
    by ||C||_F); out_ref: [16, TILE_B] rows 0..8 = R entries."""
    c9 = tuple(c_ref[i, :] for i in range(9))
    q = quaternion_from_covariance(c9, newton_iters=NEWTON_ITERS)
    entries = quaternion_to_rotation_entries(*q)
    for i, e in enumerate(entries):
        out_ref[i, :] = e
    zero = jnp.zeros_like(entries[0])
    for i in range(9, 16):
        out_ref[i, :] = zero


@functools.partial(jax.jit, static_argnames=("interpret",))
def _kabsch_pallas_impl(C: jnp.ndarray, interpret: bool = False):
    B = C.shape[0]
    nb = max(1, -(-B // TILE_B))
    Bp = nb * TILE_B

    # scale invariance: R(sC) = R(C); keeps the quartic coefficients O(1).
    # Degenerate frames (||C|| ~ 0, all-coincident atoms) are mapped to the
    # identity covariance -> identity rotation.
    norm = jnp.sqrt((C * C).sum(axis=(-2, -1), keepdims=True))
    ok = norm > 1e-12
    Cn = jnp.where(
        ok, C / jnp.where(ok, norm, 1.0), jnp.eye(3, dtype=C.dtype)
    ).astype(jnp.float32)

    # SoA layout [16, Bp]; padded frames get C = I -> R = I
    flat = Cn.reshape(B, 9).T  # [9, B]
    eye = jnp.eye(3, dtype=jnp.float32).reshape(9, 1)
    pad = jnp.broadcast_to(eye, (9, Bp - B))
    soa = jnp.concatenate(
        [jnp.concatenate([flat, pad], axis=1),
         jnp.zeros((7, Bp), jnp.float32)],
        axis=0,
    )

    out = pl.pallas_call(
        _kabsch_kernel,
        out_shape=jax.ShapeDtypeStruct((16, Bp), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((16, TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, TILE_B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=Bp * (NEWTON_ITERS * 12 + 450),
            bytes_accessed=Bp * 16 * 4 * 2,
            transcendentals=Bp * 6,
        ),
        interpret=interpret,
    )(soa)
    return out[:9, :B].T.reshape(B, 3, 3)


@jax.custom_vjp
def kabsch_rotations_pallas(C: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotations from cross-covariances C [B, 3, 3] via the Pallas
    TPU kernel (see module docstring). Interchangeable with
    :func:`colvarsfinder_tpu.ops.alignment.kabsch_rotations_svd`."""
    return _kabsch_pallas_impl(C, interpret=_should_interpret())


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd(C):
    return kabsch_rotations_pallas(C), C


def _bwd(C, g):
    from .alignment import kabsch_rotations_svd

    _, vjp = jax.vjp(kabsch_rotations_svd, C)
    return vjp(g)


kabsch_rotations_pallas.defvjp(_fwd, _bwd)
