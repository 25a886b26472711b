"""Scientific validation of the dipeptide workflow (reference
main.ipynb cells 6 and 21): the learned leading CV must track the planted
torsional (ψ) mode, and the native dihedral features must agree with an
independent numpy implementation."""

import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp


def _load_example():
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "dipeptide.py"
    )
    spec = importlib.util.spec_from_file_location("dipeptide_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dihedral_feature_matches_numpy():
    """ops dihedral_angle vs the example's independent numpy dihedral."""
    from colvarsfinder_tpu.ops.features import dihedral_angle

    ex = _load_example()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 6, 3)).astype(np.float32)
    ref = ex.dihedral_np(x, 0, 2, 3, 5)
    got = np.asarray(
        dihedral_angle(
            jnp.asarray(x[:, 0]), jnp.asarray(x[:, 2]),
            jnp.asarray(x[:, 3]), jnp.asarray(x[:, 5]),
        )
    )
    # same angle up to sign convention; check both raw and cos/sin match
    np.testing.assert_allclose(np.cos(got), np.cos(ref), atol=1e-5)
    np.testing.assert_allclose(np.sin(got), np.sin(ref), atol=1e-5)


def test_planted_psi_mode_is_recovered_by_synthesis(tmp_path):
    """The synthetic trajectory must realize the planted ψ series exactly
    (up to thermal noise) — the precondition for the CV validation."""
    ex = _load_example()
    top = ex.build_topology()
    xtc_path, psi_planted = ex.synthesize_trajectory(
        top, 200, dt_ps=10.0, outdir=str(tmp_path)
    )
    from colvarsfinder_tpu.utils import read_xtc

    coords, dt_ps, _ = read_xtc(xtc_path)
    assert coords.shape == (200, 22, 3)
    psi_measured = ex.dihedral_np(
        coords.astype(np.float64), *ex.PSI_ATOMS
    )
    # circular residual: rigid motions leave the torsion intact; the bound
    # is set by the thermal position noise (0.004 nm on ~0.14 nm bonds)
    resid = np.angle(np.exp(1j * (psi_measured - psi_planted)))
    assert np.abs(resid).max() < 0.25
    assert np.percentile(np.abs(resid), 90) < 0.12


@pytest.mark.slow
@pytest.mark.slow
def test_learned_cv_tracks_psi(tmp_path):
    """End-to-end: train the dipeptide eigenfunction task on the planted
    two-state ψ mode and assert the leading CV correlates with it
    (reference main.ipynb cell 21's visual check, made quantitative)."""
    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer,
        Feature,
        FeatureLayer,
        PreprocessingANN,
    )
    from colvarsfinder_tpu.utils import WeightedTrajectory, read_xtc

    ex = _load_example()
    top = ex.build_topology()
    xtc_path, _ = ex.synthesize_trajectory(
        top, 4000, dt_ps=10.0, outdir=str(tmp_path)
    )
    coords, dt_ps, _ = read_xtc(xtc_path)

    input_ag = top.select_atoms("type C or type O or type N")
    traj_obj = WeightedTrajectory(
        trajectory=coords[:, input_ag.ix, :], dt=dt_ps * 1e-3, verbose=False
    )
    align = AlignmentLayer(
        input_ag.positions, align_indices=list(range(len(input_ag)))
    )
    feat = FeatureLayer([Feature("p", "position", list(range(10)))])
    pp = PreprocessingANN(align, feat)
    model = EigenFunctions([30, 20, 20, 20, 1], 2, seed=0)
    task = EigenFunctionTask(
        traj_obj, pp, model, str(tmp_path / "out"),
        alpha=20.0, eig_weights=[1.0, 0.2], lag_tau=0.01, k=2,
        learning_rate=0.002, batch_size=1000, num_epochs=60,
        test_ratio=0.2, save_model_every_step=0, verbose=False,
        tensorboard=False, debug_mode=False, seed=0,
    )
    task.train()

    full2rel = {int(g): j for j, g in enumerate(input_ag.ix)}
    raw = traj_obj.trajectory.astype(np.float32)
    phi = ex.dihedral_np(raw, *[full2rel[i] for i in ex.PHI_ATOMS])
    psi = ex.dihedral_np(raw, *[full2rel[i] for i in ex.PSI_ATOMS])
    cv_vals = np.asarray(task.colvar_model()(raw))
    corr = ex.validate_cv_vs_dihedrals(
        cv_vals, phi, psi, outdir=None, verbose=False
    )
    assert corr > 0.6, f"leading CV does not track psi: |corr|={corr:.3f}"
