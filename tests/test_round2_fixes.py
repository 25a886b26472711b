"""Round-2 hardening tests: DCD dt/NSAVC semantics, weighted alignment
centering, numpy-fallback gradients, device remap warning, and precision
cache keying."""

import types

import numpy as np
import pytest

import jax.numpy as jnp

from colvarsfinder_tpu.utils.io import read_dcd, write_dcd


# ---------------------------------------------------------------------------
# DCD frame-spacing semantics (ADVICE r1, medium)
# ---------------------------------------------------------------------------

def test_dcd_dt_roundtrip_with_step_interval(tmp_path):
    """Frame spacing must survive a write/read roundtrip when NSAVC > 1
    (OpenMM's DCDReporter writes DELTA = integrator step, NSAVC =
    report_interval; frame spacing = DELTA * NSAVC)."""
    coords = np.random.default_rng(0).standard_normal((3, 5, 3)).astype("f4")
    path = str(tmp_path / "t.dcd")
    write_dcd(path, coords, dt_ps=2.0, step_interval=100)
    back, dt = read_dcd(path)
    np.testing.assert_allclose(back, coords, rtol=1e-6)
    assert abs(dt - 2.0) < 1e-4


def test_dcd_dt_openmm_style_header(tmp_path):
    """A DCD whose header stores per-step DELTA and NSAVC=50 (the OpenMM
    layout) must report dt = DELTA * NSAVC, not DELTA."""
    import struct

    coords = np.zeros((2, 4, 3), dtype="f4")
    path = str(tmp_path / "omm.dcd")
    write_dcd(path, coords, dt_ps=0.002 * 50, step_interval=50)
    with open(path, "rb") as f:
        data = f.read()
    # DELTA is at byte 4 (record length) + 4 (magic) + 36 (9 ints) = 44
    (delta,) = struct.unpack_from("<f", data, 44)
    assert abs(delta * 0.04888821 - 0.002) < 1e-6  # per-step DELTA stored
    _, dt = read_dcd(path)
    assert abs(dt - 0.1) < 1e-5  # frame spacing recovered


# ---------------------------------------------------------------------------
# Weighted Kabsch centering (ADVICE r1, low)
# ---------------------------------------------------------------------------

def test_weighted_alignment_recovers_exact_rigid_transform():
    from colvarsfinder_tpu.ops.alignment import align_frames

    rng = np.random.default_rng(3)
    m = 7
    ref = rng.standard_normal((m, 3)).astype(np.float32)
    ref_centered = ref - ref.mean(axis=0)  # AlignmentLayer's convention
    w = rng.uniform(0.5, 3.0, m).astype(np.float32)

    # a frame that is an exact rotation + translation of the reference
    theta = 0.7
    R = np.array(
        [[np.cos(theta), -np.sin(theta), 0],
         [np.sin(theta), np.cos(theta), 0],
         [0, 0, 1]], dtype=np.float32,
    )
    frame = ref_centered @ R.T + np.array([1.0, -2.0, 0.5], dtype=np.float32)

    aligned = np.asarray(
        align_frames(
            jnp.asarray(frame[None]),
            jnp.asarray(ref_centered),
            jnp.arange(m),
            align_weights=jnp.asarray(w),
        )
    )[0]
    # exact rigid transform => weighted alignment must recover the
    # reference up to the weighted-centroid shift
    wn = w / w.sum()
    expected = ref_centered - (wn[:, None] * ref_centered).sum(axis=0)
    np.testing.assert_allclose(aligned, expected, atol=5e-5)


# ---------------------------------------------------------------------------
# numpy-fallback gradients (ADVICE r1, low)
# ---------------------------------------------------------------------------

class _VOnlyNonTraceable:
    """Potential with only V, written so jax tracing fails (forces the
    numpy fallback, which must then derive the gradient numerically)."""

    dim = 2
    beta = 2.0

    def V(self, x):
        x = np.asarray(x, dtype=np.float64)  # breaks tracing
        return float(0.5 * (x * x).sum())


def test_sde_numpy_fallback_without_gradv(tmp_path):
    from colvarsfinder_tpu.utils.sampling import integrate_sde_overdamped

    with pytest.warns(UserWarning, match="not jax-traceable"):
        frames, energies = integrate_sde_overdamped(
            _VOnlyNonTraceable(), 50, str(tmp_path),
            X0=np.array([1.0, 1.0]), step_size=0.01,
            report_interval=10, seed=5, verbose=False,
        )
    assert frames.shape == (5, 2)
    assert np.isfinite(frames).all() and np.isfinite(energies).all()


def test_numpy_grad_finite_difference_accuracy():
    from colvarsfinder_tpu.utils.sampling import _numpy_grad

    g = _numpy_grad(_VOnlyNonTraceable())
    x = np.array([0.3, -1.2])
    np.testing.assert_allclose(g(x), x, atol=1e-5)


# ---------------------------------------------------------------------------
# device remap warning (ADVICE r1, low)
# ---------------------------------------------------------------------------

def test_cuda_device_remap_warns():
    from colvarsfinder_tpu.core.task import TrainingTask

    fake = types.SimpleNamespace(type="cuda")
    with pytest.warns(UserWarning, match="remapping"):
        TrainingTask._resolve_device(fake)


# ---------------------------------------------------------------------------
# precision-keyed compiled-program caches (ADVICE r1, low)
# ---------------------------------------------------------------------------

def test_precision_change_recompiles_epoch_fns(tmp_path):
    import jax

    from colvarsfinder_tpu import config
    from colvarsfinder_tpu.core import AutoEncoderTask
    from colvarsfinder_tpu.models import AutoEncoder
    from colvarsfinder_tpu.utils import WeightedTrajectory

    rng = np.random.default_rng(0)
    traj = WeightedTrajectory(
        trajectory=rng.standard_normal((64, 2)).astype(np.float32), dt=0.1
    )
    model = AutoEncoder([2, 6, 1], [1, 6, 2], seed=0)
    task = AutoEncoderTask(
        traj, None, model, str(tmp_path / "prec"),
        learning_rate=0.01, save_model_every_step=0, batch_size=32,
        num_epochs=1, test_ratio=0.25, verbose=False,
        debug_mode=False, export_cv=False, tensorboard=False,
    )
    from colvarsfinder_tpu.core import autoencoder as ae_mod

    old = config.matmul_precision()
    try:
        # pin both precisions explicitly — the framework default may change
        config.set_matmul_precision("highest")
        fn_highest = task._get_multi_epoch_fn(1, True)
        config.set_matmul_precision("default")
        fn_default = task._get_multi_epoch_fn(1, True)
        # different precision -> different compiled program
        assert fn_highest is not fn_default
        # cache keys carry the full numerics fingerprint
        # (precision, compute_dtype) — see config.numerics_key()
        precisions = {k[1][0] for k in ae_mod._EPOCH_FN_CACHE if k[0] == 1}
        assert {jax.lax.Precision.HIGHEST,
                jax.lax.Precision.DEFAULT} <= precisions
    finally:
        config.set_matmul_precision(old)


# ---------------------------------------------------------------------------
# The mocked-OpenMM MD-wrapper tests moved to tests/test_md_sampler.py
# (expanded there with an end-to-end behavioral fake engine).
# ---------------------------------------------------------------------------
