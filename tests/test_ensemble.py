"""Replica-ensemble training: one vmapped program must produce the same
per-replica results as training each task individually."""

import numpy as np
import pytest

from colvarsfinder_tpu.core import EigenFunctionTask
from colvarsfinder_tpu.models import EigenFunctions
from colvarsfinder_tpu.parallel import train_replica_ensemble
from colvarsfinder_tpu.utils import WeightedTrajectory


def _make_tasks(tmp_path, tag, n_replicas=3):
    rng = np.random.default_rng(7)
    tasks = []
    for r in range(n_replicas):
        x = rng.standard_normal((256, 2)).astype(np.float32)
        w = rng.uniform(0.5, 1.5, 256)
        traj = WeightedTrajectory(trajectory=x, weights=w, dt=0.1,
                                  verbose=False)
        model = EigenFunctions([2, 10, 1], k=2, seed=r)
        tasks.append(EigenFunctionTask(
            traj, None, model, str(tmp_path / f"{tag}{r}"),
            alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
            learning_rate=0.01, batch_size=64, num_epochs=3,
            test_ratio=0.25, save_model_every_step=0, verbose=False,
            tensorboard=False, debug_mode=False, seed=r,
        ))
    return tasks


def test_ensemble_matches_individual_training(tmp_path):
    individual = _make_tasks(tmp_path, "ind")
    for t in individual:
        t.train()

    ensemble = _make_tasks(tmp_path, "ens")
    train_replica_ensemble(ensemble)

    for t_ind, t_ens in zip(individual, ensemble):
        np.testing.assert_allclose(
            t_ens.train_loss_df.to_numpy(),
            t_ind.train_loss_df.to_numpy(),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            t_ens.test_loss_df.to_numpy(),
            t_ind.test_loss_df.to_numpy(),
            rtol=1e-4, atol=1e-6,
        )
        # trained parameters match too
        a = np.asarray(t_ind.model.params[0]["weight"])
        b = np.asarray(t_ens.model.params[0]["weight"])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
        # CV model usable after ensemble training
        out = np.asarray(t_ens.colvar_model()(
            t_ens._traj_np[:4].astype(np.float32)
        ))
        assert out.shape == (4, 2)


def test_ensemble_rejects_mismatched_configs(tmp_path):
    tasks = _make_tasks(tmp_path, "mm", n_replicas=2)
    rng = np.random.default_rng(0)
    traj = WeightedTrajectory(
        trajectory=rng.standard_normal((256, 2)).astype(np.float32),
        dt=0.1, verbose=False,
    )
    odd = EigenFunctionTask(
        traj, None, EigenFunctions([2, 10, 1], k=2, seed=9),
        str(tmp_path / "odd"),
        alpha=99.0,  # different loss constant
        eig_weights=[1.0, 0.5], lag_tau=0.2, k=2, learning_rate=0.01,
        batch_size=64, num_epochs=3, test_ratio=0.25,
        save_model_every_step=0, verbose=False, tensorboard=False,
        debug_mode=False,
    )
    with pytest.raises(AssertionError, match="static configuration"):
        train_replica_ensemble(tasks + [odd])


def test_ensemble_sets_loss_list_like_train(tmp_path):
    tasks = _make_tasks(tmp_path, "ll", n_replicas=2)
    train_replica_ensemble(tasks)
    for t in tasks:
        assert len(t.loss_list) == t.num_epochs
        tr, te = t.loss_list[0]
        assert tr.shape[1] == 5 and te.shape[1] == 5  # metrics columns
