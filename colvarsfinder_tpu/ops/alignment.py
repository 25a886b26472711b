r"""Batched rigid-body alignment (Kabsch).

Native TPU equivalent of molann's ``AlignmentLayer`` as used by the
reference's dipeptide workflow (reference: examples/dipeptide/main.ipynb
cell 12; SURVEY.md §2.8): every frame is optimally rotated onto a reference
structure using a subset of "align" atoms, making raw positions
rotation/translation-invariant before the feature map.

Two interchangeable implementations behind one API:

* ``method='svd'`` (default): batched 3x3 SVD Kabsch in pure jnp —
  differentiable end-to-end (generator-loss input gradients flow through
  the rotation, reference core.py:424 via :403), batched over frames.
* ``method='quaternion'``: Horn's closed-form quaternion solution — builds
  the symmetric 4x4 key matrix per frame and extracts the dominant
  eigenvector. This formulation is the basis of the Pallas kernel in
  :mod:`colvarsfinder_tpu.ops.kabsch_pallas` (pure VPU elementwise math,
  no per-frame LAPACK calls).

Both use the standard det-sign correction so reflections are excluded.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import matmul_precision

__all__ = [
    "AlignmentLayer",
    "kabsch_rotations_svd",
    "kabsch_rotations_quat",
    "align_frames",
]


def _cross_covariances(frames_c, ref_c):
    """C_b = A_b^T B for centered align-atoms A_b [B, m, 3] and centered
    reference B [m, 3]; one batched MXU contraction -> [B, 3, 3]."""
    return jnp.einsum("bmi,mj->bij", frames_c, ref_c, precision=matmul_precision())


def kabsch_rotations_svd(C: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotations from cross-covariances C [B, 3, 3].

    R_b = U_b D_b V_b^T with D = diag(1, 1, sign(det(U V^T))), the rotation
    maximizing trace(R^T C), i.e. minimizing ||A R - B||^2 in the
    row-vector convention used throughout this module.
    """
    U, S, Vt = jnp.linalg.svd(C)
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", U, Vt, precision=matmul_precision()))
    D = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )  # [B, 3]
    return jnp.einsum("bij,bj,bjk->bik", U, D, Vt, precision=matmul_precision())


def _horn_key_matrix(C: jnp.ndarray) -> jnp.ndarray:
    """Symmetric 4x4 key matrix K(C) of Horn's quaternion method, [B,4,4]."""
    Sxx, Sxy, Sxz = C[:, 0, 0], C[:, 0, 1], C[:, 0, 2]
    Syx, Syy, Syz = C[:, 1, 0], C[:, 1, 1], C[:, 1, 2]
    Szx, Szy, Szz = C[:, 2, 0], C[:, 2, 1], C[:, 2, 2]
    row0 = jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1)
    row1 = jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1)
    row2 = jnp.stack([Szx - Sxz, Sxy + Syx, Syy - Sxx - Szz, Syz + Szy], -1)
    row3 = jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, Szz - Sxx - Syy], -1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def _quat_to_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [B, 4] (w, x, y, z) -> rotation matrices [B, 3, 3].

    Convention: the returned R satisfies (row-vector) y = x @ R, matching
    :func:`kabsch_rotations_svd`.
    """
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y),
            2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x),
            2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    return R


def kabsch_rotations_quat(C: jnp.ndarray, iters: int = 30) -> jnp.ndarray:
    """Optimal rotations via Horn's quaternion method with shifted power
    iteration for the dominant eigenvector of the 4x4 key matrix.

    All operations are batched elementwise/small-matmul math (no LAPACK),
    making this formulation Pallas-friendly; the jnp version here is the
    oracle for the kernel.
    """
    K = _horn_key_matrix(C)
    B = K.shape[0]
    # Shift so the target (largest) eigenvalue is also largest in magnitude:
    # lambda_max <= 2 * max_row_sum bound via Gershgorin.
    shift = jnp.abs(K).sum(axis=-1).max(axis=-1)  # [B]
    Ks = K + shift[:, None, None] * jnp.eye(4, dtype=K.dtype)
    v = jnp.broadcast_to(
        jnp.asarray([0.5, 0.5, 0.5, 0.5], dtype=K.dtype), (B, 4)
    )

    def body(_, v):
        v = jnp.einsum("bij,bj->bi", Ks, v, precision=matmul_precision())
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    v = jax.lax.fori_loop(0, iters, body, v)
    # fix sign for determinism (w >= 0)
    sign = jnp.where(v[:, :1] < 0, -1.0, 1.0)
    q = v * sign
    return _quat_to_rotation(q)


def align_frames(
    x: jnp.ndarray,
    ref_centered: jnp.ndarray,
    align_idx: jnp.ndarray,
    align_weights: Optional[jnp.ndarray] = None,
    method: str = "svd",
) -> jnp.ndarray:
    """Rigidly align each frame onto the reference.

    Args:
        x: frames [B, N, 3]
        ref_centered: reference align-atom coordinates [m, 3], centered
        align_idx: indices of the m align atoms within the N input atoms
        align_weights: optional per-align-atom weights (e.g. masses)
        method: 'svd' or 'quaternion'

    Returns:
        aligned frames [B, N, 3]: x centered on its align-atom centroid and
        rotated by the optimal Kabsch rotation.
    """
    sel = x[:, align_idx, :]  # [B, m, 3]
    if align_weights is not None:
        w = align_weights / align_weights.sum()
        com = jnp.einsum("m,bmi->bi", w, sel, precision=matmul_precision())
    else:
        com = sel.mean(axis=1)
    x_c = x - com[:, None, :]
    sel_c = sel - com[:, None, :]
    if align_weights is not None:
        sel_c = sel_c * align_weights[None, :, None]
    C = _cross_covariances(sel_c, ref_centered)
    if method == "svd":
        R = kabsch_rotations_svd(C)
    elif method == "quaternion":
        R = kabsch_rotations_quat(C)
    elif method == "pallas":
        from .kabsch_pallas import kabsch_rotations_pallas

        R = kabsch_rotations_pallas(C)
    else:
        raise ValueError(f"unknown alignment method '{method}'")
    return jnp.einsum("bni,bij->bnj", x_c, R, precision=matmul_precision())


@jax.tree_util.register_pytree_node_class
class AlignmentLayer:
    """Rigid alignment preprocessing layer (molann ``AlignmentLayer``
    equivalent).

    Args:
        align_positions: reference coordinates of the align atoms [m, 3]
            (e.g. from the topology frame); will be centered internally.
            An MDAnalysis AtomGroup is also accepted.
        align_indices: indices of the align atoms within the *input* atom
            list (columns of the [batch, N, 3] trajectory array). If an
            AtomGroup was passed together with an ``input_ag``, indices are
            derived automatically.
        input_ag: optional MDAnalysis AtomGroup of the input atoms.
        method: 'svd' (default), 'quaternion', or 'pallas'.
    """

    def __init__(
        self,
        align_positions=None,
        align_indices: Optional[Sequence[int]] = None,
        input_ag=None,
        method: str = "svd",
        *,
        _ref_centered=None,
        _align_idx=None,
    ):
        if _ref_centered is not None:
            self.ref_centered = _ref_centered
            self.align_idx = _align_idx
            self.method = method
            return
        ag = align_positions
        if hasattr(ag, "positions"):  # MDAnalysis AtomGroup
            pos = np.asarray(ag.positions, dtype=np.float32)
            if align_indices is None:
                if input_ag is None:
                    raise ValueError(
                        "pass align_indices or input_ag to locate align "
                        "atoms within the input atom list"
                    )
                input_ix = list(np.asarray(input_ag.ix))
                align_indices = [input_ix.index(i) for i in np.asarray(ag.ix)]
        else:
            pos = np.asarray(align_positions, dtype=np.float32)
            if align_indices is None:
                raise ValueError("align_indices is required")
        pos = pos - pos.mean(axis=0, keepdims=True)
        self.ref_centered = jnp.asarray(pos)
        self.align_idx = jnp.asarray(np.asarray(align_indices, dtype=np.int32))
        self.method = method

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(x)
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        out = align_frames(
            x, self.ref_centered, self.align_idx, method=self.method
        )
        return out[0] if squeeze else out

    def show_info(self):
        print(
            f"AlignmentLayer: {self.ref_centered.shape[0]} align atoms, "
            f"method={self.method}\nreference (centered):\n"
            f"{np.asarray(self.ref_centered)}"
        )

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.ref_centered, self.align_idx), (self.method,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            method=aux[0], _ref_centered=children[0], _align_idx=children[1]
        )
