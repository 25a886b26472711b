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


# ---------------------------------------------------------------------------
# Fused whole-alignment kernel: center -> covariance -> QCP -> rotate,
# one HBM read and one write per frame
# ---------------------------------------------------------------------------

ALIGN_TILE_B = 1024


def _make_fused_align_kernel(ref_centered: "np.ndarray", align_rows, n_atoms):
    """Build the fused alignment kernel with the (static, per-layer)
    reference coordinates baked in as compile-time scalars.

    Layout: structure-of-arrays — the input block is [rows_pad, TILE_B]
    with row 3*n+i holding coordinate i of atom n across TILE_B frames
    (lanes). Every step is an elementwise VPU op over the lane axis:
    centroid = scalar-weighted row sums, the 3x3 covariance = 9 * m
    multiply-adds with baked reference scalars, the rotation solve is the
    shared QCP formula, and applying R is 9 multiply-adds per atom.
    """
    import numpy as _np

    ref = _np.asarray(ref_centered, dtype=_np.float64)
    m = len(align_rows)
    inv_m = 1.0 / m

    def kernel(x_ref, out_ref):
        # centroid of align atoms
        cx = x_ref[3 * align_rows[0] + 0, :] * inv_m
        cy = x_ref[3 * align_rows[0] + 1, :] * inv_m
        cz = x_ref[3 * align_rows[0] + 2, :] * inv_m
        for n in align_rows[1:]:
            cx = cx + x_ref[3 * n + 0, :] * inv_m
            cy = cy + x_ref[3 * n + 1, :] * inv_m
            cz = cz + x_ref[3 * n + 2, :] * inv_m

        # covariance C_ij = sum_n xc[n, i] * ref[n, j] over align atoms,
        # with the reference entries baked in as constants
        c9 = [None] * 9
        for a, n in enumerate(align_rows):
            xc = (x_ref[3 * n + 0, :] - cx,
                  x_ref[3 * n + 1, :] - cy,
                  x_ref[3 * n + 2, :] - cz)
            for i in range(3):
                for j in range(3):
                    term = xc[i] * float(ref[a, j])
                    idx = 3 * i + j
                    c9[idx] = term if a == 0 else c9[idx] + term

        # normalize scale (R(sC) = R(C)); guard degenerate frames
        fro2 = sum(e * e for e in c9)
        inv_norm = jax.lax.rsqrt(fro2 + 1e-30)
        ok = fro2 > 1e-24
        cn = [jnp.where(ok, e * inv_norm, 0.0) for e in c9]
        # degenerate -> identity covariance
        cn[0] = jnp.where(ok, cn[0], 1.0)
        cn[4] = jnp.where(ok, cn[4], 1.0)
        cn[8] = jnp.where(ok, cn[8], 1.0)

        q = quaternion_from_covariance(tuple(cn), newton_iters=NEWTON_ITERS)
        R = quaternion_to_rotation_entries(*q)  # row-major, y = x @ R

        # rotate all atoms: out[n, j] = sum_i xc[n, i] * R[i, j]
        for n in range(n_atoms):
            xcn = (x_ref[3 * n + 0, :] - cx,
                   x_ref[3 * n + 1, :] - cy,
                   x_ref[3 * n + 2, :] - cz)
            for j in range(3):
                out_ref[3 * n + j, :] = (
                    xcn[0] * R[0 + j] + xcn[1] * R[3 + j] + xcn[2] * R[6 + j]
                )
        zero = jnp.zeros_like(cx)
        for r in range(3 * n_atoms, out_ref.shape[0]):
            out_ref[r, :] = zero

    return kernel


def _fused_align_impl(x, ref_centered, align_idx, interpret):
    """x [B, N, 3] -> aligned [B, N, 3] via one fused Pallas kernel."""
    B, N, _ = x.shape
    rows_pad = -(-3 * N // 8) * 8
    nb = max(1, -(-B // ALIGN_TILE_B))
    Bp = nb * ALIGN_TILE_B

    # SoA: [3N, B] -> padded [rows_pad, Bp]
    soa = x.reshape(B, 3 * N).T.astype(jnp.float32)
    soa = jnp.pad(soa, ((0, rows_pad - 3 * N), (0, Bp - B)))

    kernel = _make_fused_align_kernel(
        ref_centered, tuple(int(i) for i in align_idx), N
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows_pad, Bp), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rows_pad, ALIGN_TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_pad, ALIGN_TILE_B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=Bp * (21 * N + NEWTON_ITERS * 12 + 450),
            bytes_accessed=Bp * rows_pad * 4 * 2,
            transcendentals=Bp * 6,
        ),
        interpret=interpret,
    )(soa)
    return out[: 3 * N, :B].T.reshape(B, N, 3)


def align_frames_fused_pallas(
    x: jnp.ndarray, ref_centered, align_idx
) -> jnp.ndarray:
    """Fused rigid alignment (see :func:`_make_fused_align_kernel`):
    equivalent to :func:`colvarsfinder_tpu.ops.alignment.align_frames` but
    executed as a single Pallas kernel. The reference coordinates and align
    indices must be concrete (they are baked into the compiled kernel);
    differentiable w.r.t. ``x`` via custom_vjp against the jnp formulation.
    """
    import numpy as _np

    ref = _np.asarray(ref_centered, dtype=_np.float64)
    ref_tuple = tuple(tuple(float(v) for v in row) for row in ref)
    idx_tuple = tuple(int(i) for i in _np.asarray(align_idx).reshape(-1))
    return _fused_align(x, ref_tuple, idx_tuple)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fused_align(x, ref_tuple, idx_tuple):
    import numpy as _np

    return _fused_align_impl(
        x,
        _np.asarray(ref_tuple, dtype=_np.float32),
        idx_tuple,
        interpret=_should_interpret(),
    )


def _fused_fwd(x, ref_tuple, idx_tuple):
    return _fused_align(x, ref_tuple, idx_tuple), x


def _fused_bwd(ref_tuple, idx_tuple, x, g):
    import numpy as _np

    from .alignment import align_frames

    ref = jnp.asarray(_np.asarray(ref_tuple, dtype=_np.float32))
    idx = jnp.asarray(idx_tuple, dtype=jnp.int32)
    _, vjp = jax.vjp(
        lambda xx: align_frames(xx, ref, idx, method="quaternion"), x
    )
    return vjp(g)


_fused_align.defvjp(_fused_fwd, _fused_bwd)


@jax.tree_util.register_pytree_node_class
class FusedAlignmentLayer:
    """Drop-in alternative to
    :class:`colvarsfinder_tpu.ops.alignment.AlignmentLayer` that runs the
    entire alignment as one fused Pallas kernel. The reference structure is
    static (baked into the kernel), so this layer has no array leaves and
    stays concrete under jit.
    """

    def __init__(self, align_positions, align_indices=None, *, _ref=None,
                 _idx=None):
        import numpy as _np

        if _ref is not None:
            self._ref = _ref
            self._idx = _idx
            return
        ag = align_positions
        pos = _np.asarray(
            getattr(ag, "positions", align_positions), dtype=_np.float64
        )
        pos = pos - pos.mean(axis=0, keepdims=True)
        if align_indices is None:
            raise ValueError("align_indices is required")
        self._ref = tuple(tuple(float(v) for v in row) for row in pos)
        self._idx = tuple(int(i) for i in _np.asarray(align_indices).reshape(-1))

    @property
    def ref_centered(self):
        import numpy as _np

        return jnp.asarray(_np.asarray(self._ref, dtype=_np.float32))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(x)
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        out = _fused_align(x, self._ref, self._idx)
        return out[0] if squeeze else out

    def tree_flatten(self):
        return (), (self._ref, self._idx)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(None, _ref=aux[0], _idx=aux[1])
