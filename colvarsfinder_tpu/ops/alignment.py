r"""Batched rigid-body alignment (Kabsch).

Native TPU equivalent of molann's ``AlignmentLayer`` as used by the
reference's dipeptide workflow (reference: examples/dipeptide/main.ipynb
cell 12; SURVEY.md §2.8): every frame is optimally rotated onto a reference
structure using a subset of "align" atoms, making raw positions
rotation/translation-invariant before the feature map.

Three interchangeable implementations behind one API (all differentiable —
generator-loss input gradients flow through the rotation, reference
core.py:424 via :403):

* ``method='quaternion'`` (default): the QCP scheme — Newton iteration on
  the quartic characteristic polynomial of Horn's 4x4 key matrix + an
  adjugate-row eigenvector. Pure elementwise math, no per-frame LAPACK:
  ~50x faster than the SVD path on TPU at identical accuracy (2e-6), and
  doubly differentiable (the Newton loop is unrolled).
* ``method='svd'``: batched 3x3 SVD Kabsch via ``jnp.linalg.svd`` — the
  numerical oracle the other paths are tested against.
* ``method='pallas'``: the same QCP math as a hand-written Pallas TPU
  kernel (:mod:`colvarsfinder_tpu.ops.kabsch_pallas`) with a
  structure-of-arrays lane layout.

All use the standard det-sign correction so reflections are excluded.
"""

from __future__ import annotations

from contextlib import contextmanager as _contextmanager
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_dtype, matmul_precision

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


def _det3(a, b, c, d, e, f, g, h, i):
    """Determinant of [[a,b,c],[d,e,f],[g,h,i]] — elementwise over lanes."""
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


#: default differentiation mode of the QCP Newton solve: 0 = fully
#: differentiable unroll (backward through all ``newton_iters`` steps),
#: >0 = implicit differentiation (convergence under stop_gradient + this
#: many differentiable tail steps; exact first/second derivatives at the
#: root, machine-eps parity vs the SVD oracle). A same-process A/B on TPU
#: v5e (benchmarks/qcp_ab.py) measured the two modes within 2-4% on both
#: the transfer-op backward and the generator double backprop — XLA fuses
#: the elementwise Newton chain either way — so the default stays at the
#: round-2 numerics (full unroll); the implicit mode is kept for
#: memory-bound contexts (it shrinks the saved-residual footprint 8x).
DEFAULT_NEWTON_DIFF_STEPS: int = 0


@_contextmanager
def newton_diff_mode(diff_steps: int):
    """Trace-time override of :data:`DEFAULT_NEWTON_DIFF_STEPS`.

    Used by the generator loss to trace its per-sample input-jacobian
    region with implicit Newton differentiation (``diff_steps=2``) while
    the rest of the program keeps the full unroll.
    """
    global DEFAULT_NEWTON_DIFF_STEPS
    prev = DEFAULT_NEWTON_DIFF_STEPS
    DEFAULT_NEWTON_DIFF_STEPS = diff_steps
    try:
        yield
    finally:
        DEFAULT_NEWTON_DIFF_STEPS = prev


def quaternion_from_covariance(
    c9, newton_iters: int = 16, diff_steps: int | None = None
):
    """Optimal-rotation quaternion from 3x3 cross-covariance entries.

    The QCP scheme (Theobald-style): the optimal quaternion is the dominant
    eigenvector of Horn's symmetric 4x4 key matrix K(C). Its largest
    eigenvalue is found by Newton iteration on the quartic characteristic
    polynomial (K is traceless: P(x) = x^4 + c2 x^2 + c1 x + c0), started
    from the upper bound 2||C||_F >= lambda_max, which converges
    monotonically and quadratically; the eigenvector is read off the
    adjugate of K - lambda I (its columns are all proportional to the
    eigenvector; the largest-norm cofactor row is selected per lane).

    Everything is elementwise math over the batch — no LAPACK, no
    data-dependent control flow — so this single implementation serves both
    the jnp path (arrays [B]) and the Pallas TPU kernel (lane vectors).

    Args:
        c9: nine arrays (sxx, sxy, sxz, syx, syy, syz, szx, szy, szz) of a
            *pre-normalized* covariance (divide by ||C||_F for scale
            invariance before calling).
        newton_iters: Newton steps (quadratic convergence; generous default
            covers near-degenerate double roots).
        diff_steps: differentiation mode. ``None`` (default) resolves to
            :data:`DEFAULT_NEWTON_DIFF_STEPS`. ``0``: fully differentiable
            unroll (backward through every Newton step). ``>0``: implicit
            differentiation — convergence runs under ``stop_gradient`` and
            this many differentiable Newton steps are appended. At a
            converged root one differentiable step yields the exact
            implicit-function-theorem first derivative (dλ/dc = -P_c/P');
            two steps make the second derivative exact too (needed by the
            generator loss's double backprop). The forward value is
            unchanged either way (Newton is idempotent at the root);
            derivative agreement vs the SVD oracle is machine-eps at f64
            (tests/test_features.py).

    Returns:
        (w, x, y, z): unit quaternion components (sign unnormalized — q and
        -q encode the same rotation).
    """
    sxx, sxy, sxz, syx, syy, syz, szx, szy, szz = c9

    k00 = sxx + syy + szz
    k01 = syz - szy
    k02 = szx - sxz
    k03 = sxy - syx
    k11 = sxx - syy - szz
    k12 = sxy + syx
    k13 = szx + sxz
    k22 = syy - sxx - szz
    k23 = syz + szy
    k33 = szz - sxx - syy

    fro2 = (
        sxx * sxx + sxy * sxy + sxz * sxz
        + syx * syx + syy * syy + syz * syz
        + szx * szx + szy * szy + szz * szz
    )
    c2 = -2.0 * fro2
    c1 = -8.0 * _det3(sxx, sxy, sxz, syx, syy, syz, szx, szy, szz)
    c0 = (
        k00 * _det3(k11, k12, k13, k12, k22, k23, k13, k23, k33)
        - k01 * _det3(k01, k12, k13, k02, k22, k23, k03, k23, k33)
        + k02 * _det3(k01, k11, k13, k02, k12, k23, k03, k13, k33)
        - k03 * _det3(k01, k11, k12, k02, k12, k22, k03, k13, k23)
    )

    def newton_step(lam, c2, c1, c0):
        p = ((lam * lam + c2) * lam + c1) * lam + c0
        dp = (4.0 * lam * lam + 2.0 * c2) * lam + c1
        return lam - p / jnp.where(jnp.abs(dp) > 1e-12, dp, 1e-12)

    if diff_steps is None:
        diff_steps = DEFAULT_NEWTON_DIFF_STEPS
    if diff_steps <= 0:
        # fully differentiable unroll (backward through every step)
        lam = 2.0 * jnp.sqrt(fro2)
        for _ in range(newton_iters):
            lam = newton_step(lam, c2, c1, c0)
    else:
        # Newton from above: lambda_max <= sqrt(tr K^2) = 2 ||C||_F.
        # Convergence runs on stop-gradient'ed coefficients (forward-
        # only); the short differentiable tail supplies the implicit
        # derivatives.
        sg = jax.lax.stop_gradient
        c2s, c1s, c0s = sg(c2), sg(c1), sg(c0)
        lam = 2.0 * jnp.sqrt(sg(fro2))
        for _ in range(newton_iters):
            lam = newton_step(lam, c2s, c1s, c0s)
        for _ in range(diff_steps):
            lam = newton_step(lam, c2, c1, c0)

    # adjugate rows of M = K - lam I; each nonzero row ~ the eigenvector
    m00 = k00 - lam
    m11 = k11 - lam
    m22 = k22 - lam
    m33 = k33 - lam

    rows = []
    # cofactor row i: entries (-1)^{i+j} * minor(i, j); global sign
    # irrelevant (q ~ -q)
    rows.append((
        _det3(m11, k12, k13, k12, m22, k23, k13, k23, m33),
        -_det3(k01, k12, k13, k02, m22, k23, k03, k23, m33),
        _det3(k01, m11, k13, k02, k12, k23, k03, k13, m33),
        -_det3(k01, m11, k12, k02, k12, m22, k03, k13, k23),
    ))
    rows.append((
        -_det3(k01, k02, k03, k12, m22, k23, k13, k23, m33),
        _det3(m00, k02, k03, k02, m22, k23, k03, k23, m33),
        -_det3(m00, k01, k03, k02, k12, k23, k03, k13, m33),
        _det3(m00, k01, k02, k02, k12, m22, k03, k13, k23),
    ))
    rows.append((
        _det3(k01, k02, k03, m11, k12, k13, k13, k23, m33),
        -_det3(m00, k02, k03, k01, k12, k13, k03, k23, m33),
        _det3(m00, k01, k03, k01, m11, k13, k03, k13, m33),
        -_det3(m00, k01, k02, k01, m11, k12, k03, k13, k23),
    ))
    rows.append((
        -_det3(k01, k02, k03, m11, k12, k13, k12, m22, k23),
        _det3(m00, k02, k03, k01, k12, k13, k02, m22, k23),
        -_det3(m00, k01, k03, k01, m11, k13, k02, k12, k23),
        _det3(m00, k01, k02, k01, m11, k12, k02, k12, m22),
    ))

    norms = [sum(e * e for e in r) for r in rows]
    best = rows[0]
    best_n = norms[0]
    for r, n in zip(rows[1:], norms[1:]):
        take = n > best_n
        best = tuple(jnp.where(take, ri, bi) for ri, bi in zip(r, best))
        best_n = jnp.maximum(n, best_n)

    inv = jax.lax.rsqrt(best_n + 1e-30)
    return tuple(e * inv for e in best)


def quaternion_to_rotation_entries(w, x, y, z):
    """Unit quaternion -> the 9 rotation-matrix entries (row-major), in the
    row-vector convention y = x @ R matching :func:`kabsch_rotations_svd`."""
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y),
        2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x),
        2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y),
    )


def kabsch_rotations_quat(C: jnp.ndarray, iters: int = 16) -> jnp.ndarray:
    """Optimal rotations via the QCP quaternion scheme (see
    :func:`quaternion_from_covariance`) — the jnp oracle for the Pallas
    kernel in :mod:`colvarsfinder_tpu.ops.kabsch_pallas`."""
    # scale invariance: R(sC) = R(C); normalizing keeps the quartic
    # coefficients O(1) in f32
    norm = jnp.sqrt((C * C).sum(axis=(-2, -1), keepdims=True))
    ok = norm > 1e-12  # degenerate (all-coincident atoms): fall back to I
    Cn = C / jnp.where(ok, norm, 1.0)
    c9 = tuple(Cn[:, i, j] for i in range(3) for j in range(3))
    q = quaternion_from_covariance(c9, newton_iters=iters)
    entries = quaternion_to_rotation_entries(*q)
    R = jnp.stack(entries, axis=-1).reshape(-1, 3, 3)
    return jnp.where(ok, R, jnp.eye(3, dtype=R.dtype))


def align_frames(
    x: jnp.ndarray,
    ref_centered: jnp.ndarray,
    align_idx: jnp.ndarray,
    align_weights: Optional[jnp.ndarray] = None,
    method: str = "quaternion",
) -> jnp.ndarray:
    """Rigidly align each frame onto the reference.

    Args:
        x: frames [B, N, 3]
        ref_centered: reference align-atom coordinates [m, 3], centered
        align_idx: indices of the m align atoms within the N input atoms
        align_weights: optional per-align-atom weights (e.g. masses)
        method: 'quaternion' (default), 'svd', or 'pallas'

    Returns:
        aligned frames [B, N, 3]: x centered on its align-atom centroid and
        rotated by the optimal Kabsch rotation.
    """
    sel = x[:, align_idx, :]  # [B, m, 3]
    if align_weights is not None:
        # weighted Kabsch: BOTH structures must be centered on the
        # weighted centroid, so re-center the (unweighted-mean-centered)
        # reference with the same weights
        w = align_weights / align_weights.sum()
        com = jnp.einsum("m,bmi->bi", w, sel, precision=matmul_precision())
        ref_centered = ref_centered - jnp.einsum(
            "m,mi->i", w, ref_centered, precision=matmul_precision()
        )
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
        method: 'quaternion' (default; QCP — ~50x faster than
            the SVD path on TPU at identical accuracy), 'svd', or 'pallas'.
        align_weights: optional per-align-atom weights (e.g. atomic
            masses) for weighted Kabsch alignment; pass the string
            ``'masses'`` with an AtomGroup to use its masses.
    """

    def __init__(
        self,
        align_positions=None,
        align_indices: Optional[Sequence[int]] = None,
        input_ag=None,
        method: str = "quaternion",
        align_weights=None,
        *,
        _ref_centered=None,
        _align_idx=None,
        _align_weights=None,
    ):
        if _ref_centered is not None:
            self.ref_centered = _ref_centered
            self.align_idx = _align_idx
            self.align_weights = _align_weights
            self.method = method
            return
        ag = align_positions
        if hasattr(ag, "positions"):  # MDAnalysis AtomGroup
            pos = np.asarray(ag.positions, dtype=default_dtype())
            if align_indices is None:
                if input_ag is None:
                    raise ValueError(
                        "pass align_indices or input_ag to locate align "
                        "atoms within the input atom list"
                    )
                input_ix = list(np.asarray(input_ag.ix))
                align_indices = [input_ix.index(i) for i in np.asarray(ag.ix)]
        else:
            pos = np.asarray(align_positions, dtype=default_dtype())
            if align_indices is None:
                raise ValueError("align_indices is required")
        pos = pos - pos.mean(axis=0, keepdims=True)
        self.ref_centered = jnp.asarray(pos)
        self.align_idx = jnp.asarray(np.asarray(align_indices, dtype=np.int32))
        if isinstance(align_weights, str):
            if align_weights != "masses":
                raise ValueError(
                    f"unknown align_weights spec '{align_weights}' "
                    "(supported: 'masses' with an AtomGroup)"
                )
            if not hasattr(ag, "masses"):
                raise ValueError(
                    "align_weights='masses' requires align_positions to be "
                    "an AtomGroup with masses"
                )
            align_weights = np.asarray(ag.masses, dtype=default_dtype())
        self.align_weights = (
            None if align_weights is None
            else jnp.asarray(np.asarray(align_weights, dtype=default_dtype()))
        )
        if self.align_weights is not None:
            assert self.align_weights.shape == (self.ref_centered.shape[0],), (
                f"align_weights must have one entry per align atom "
                f"({self.ref_centered.shape[0]}), got "
                f"{self.align_weights.shape}"
            )
        self.method = method

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(x)
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        out = align_frames(
            x, self.ref_centered, self.align_idx,
            align_weights=self.align_weights, method=self.method,
        )
        return out[0] if squeeze else out

    def show_info(self):
        weighted = "" if self.align_weights is None else ", weighted"
        print(
            f"AlignmentLayer: {self.ref_centered.shape[0]} align atoms, "
            f"method={self.method}{weighted}\nreference (centered):\n"
            f"{np.asarray(self.ref_centered)}"
        )

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (
            (self.ref_centered, self.align_idx, self.align_weights),
            (self.method,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            method=aux[0], _ref_centered=children[0],
            _align_idx=children[1], _align_weights=children[2],
        )
