"""Pallas Kabsch kernel tests (interpreter mode on CPU; the same code
compiles to a Mosaic kernel on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colvarsfinder_tpu.ops.alignment import (
    AlignmentLayer,
    kabsch_rotations_svd,
)
from colvarsfinder_tpu.ops.kabsch_pallas import kabsch_rotations_pallas


def _covariances(B, rng, m=6, noise=0.3):
    ref = rng.standard_normal((m, 3)).astype(np.float32)
    ref -= ref.mean(0)
    fr = (ref[None] + noise * rng.standard_normal((B, m, 3))).astype(
        np.float32
    )
    frc = fr - fr.mean(1, keepdims=True)
    return jnp.einsum("bmi,mj->bij", jnp.asarray(frc), jnp.asarray(ref))


def test_pallas_kabsch_matches_svd(rng):
    C = _covariances(37, rng)  # non-multiple of tile: padding path
    R_pal = np.asarray(kabsch_rotations_pallas(C))
    R_svd = np.asarray(kabsch_rotations_svd(C))
    np.testing.assert_allclose(R_pal, R_svd, atol=2e-5)


def test_pallas_kabsch_large_batch(rng):
    C = _covariances(2048 + 100, rng)
    R_pal = np.asarray(kabsch_rotations_pallas(C))
    R_svd = np.asarray(kabsch_rotations_svd(C))
    np.testing.assert_allclose(R_pal, R_svd, atol=2e-5)
    # valid rotations
    eye = np.einsum("bij,bkj->bik", R_pal, R_pal)
    np.testing.assert_allclose(
        eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5
    )


def test_pallas_kabsch_gradients(rng):
    """custom_vjp: gradients flow and match the SVD implementation's."""
    C = _covariances(8, rng)

    def f_pal(c):
        return (kabsch_rotations_pallas(c) ** 2).sum()

    def f_svd(c):
        return (kabsch_rotations_svd(c) ** 2).sum()

    g_pal = np.asarray(jax.grad(f_pal)(C))
    g_svd = np.asarray(jax.grad(f_svd)(C))
    np.testing.assert_allclose(g_pal, g_svd, rtol=1e-3, atol=1e-4)


def test_alignment_layer_pallas_method(rng):
    m = 5
    ref = rng.standard_normal((m, 3)).astype(np.float32)
    layer_svd = AlignmentLayer(ref, align_indices=list(range(m)),
                               method="svd")
    layer_pal = AlignmentLayer(ref, align_indices=list(range(m)),
                               method="pallas")
    x = (ref[None] + 0.2 * rng.standard_normal((10, m, 3))).astype(
        np.float32
    )
    out_svd = np.asarray(layer_svd(jnp.asarray(x)))
    out_pal = np.asarray(layer_pal(jnp.asarray(x)))
    np.testing.assert_allclose(out_pal, out_svd, atol=5e-5)


def test_degenerate_covariance_gives_identity():
    """All-coincident align atoms (zero covariance) must yield the identity
    rotation, not NaNs, on both quaternion paths."""
    from colvarsfinder_tpu.ops.alignment import kabsch_rotations_quat

    C = jnp.zeros((4, 3, 3), dtype=jnp.float32)
    for fn in (kabsch_rotations_quat, kabsch_rotations_pallas):
        R = np.asarray(fn(C))
        np.testing.assert_allclose(
            R, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6
        )


@pytest.mark.slow
def test_fused_alignment_kernel_matches_reference_path(rng):
    """The fused whole-alignment Pallas kernel must match align_frames and
    stay differentiable."""
    from colvarsfinder_tpu.ops.alignment import align_frames
    from colvarsfinder_tpu.ops.kabsch_pallas import (
        FusedAlignmentLayer,
        align_frames_fused_pallas,
    )

    m, N, B = 6, 10, 300  # align atoms are a subset of all atoms
    ref = rng.standard_normal((m, 3)).astype(np.float32)
    ref -= ref.mean(0)
    x = rng.standard_normal((B, N, 3)).astype(np.float32)
    align_idx = np.asarray([0, 2, 3, 5, 7, 9])

    out_ref = np.asarray(
        align_frames(jnp.asarray(x), jnp.asarray(ref),
                     jnp.asarray(align_idx), method="quaternion")
    )
    out_fused = np.asarray(align_frames_fused_pallas(
        jnp.asarray(x), ref, align_idx
    ))
    # 2e-4: the kernel's f32 quaternion iteration occasionally lands ~1e-4
    # off the XLA path's rotation on near-degenerate frames
    np.testing.assert_allclose(out_fused, out_ref, atol=2e-4)

    # layer API + jit-through-pytree
    layer = FusedAlignmentLayer(ref, align_idx)
    out_layer = np.asarray(jax.jit(lambda l, xx: l(xx))(layer,
                                                        jnp.asarray(x)))
    np.testing.assert_allclose(out_layer, out_ref, atol=2e-4)

    # gradients flow (generator-loss requirement)
    def scalar(xx):
        return (layer(xx) ** 2).sum()

    g = np.asarray(jax.grad(scalar)(jnp.asarray(x[:4])))
    def scalar_ref(xx):
        return (align_frames(xx, jnp.asarray(ref), jnp.asarray(align_idx),
                             method="quaternion") ** 2).sum()
    g_ref = np.asarray(jax.grad(scalar_ref)(jnp.asarray(x[:4])))
    np.testing.assert_allclose(g, g_ref, rtol=1e-3, atol=1e-4)
