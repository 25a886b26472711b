"""Golden end-to-end parity against the ACTUAL reference package.

The reference (mounted read-only at /root/reference) is imported with a
minimal OpenMM import stub (its SDE-only workflows never call OpenMM,
reference utils.py:57-58) and trained on identical data with identical
initial parameters and identical train/test splits; loss trajectories must
match to f32 tolerances. This is the BASELINE.md parity oracle executed
against the real reference implementation rather than a reconstruction.
"""

import os
import sys

import numpy as np
import pytest
import torch

from colvarsfinder_tpu.core import AutoEncoderTask, EigenFunctionTask
from colvarsfinder_tpu.models import AutoEncoder, EigenFunctions
from colvarsfinder_tpu.utils import WeightedTrajectory

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="module")
def reference(tmp_path_factory):
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference package not mounted")
    stub = tmp_path_factory.mktemp("openmm_stub")
    pkg = stub / "openmm"
    pkg.mkdir()
    (pkg / "__init__.py").write_text(
        "class unit:\n    pass\n"
    )
    (pkg / "app.py").write_text("")
    sys.path.insert(0, str(stub))
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import colvarsfinder.core as ref_core
        import colvarsfinder.nn as ref_nn
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    yield ref_core, ref_nn
    sys.path.remove(str(stub))
    sys.path.remove(REFERENCE_PATH)


def _data(n=400, d=2, seed=5):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, n).astype(np.float32)
    w /= w.mean()
    return x, w


class _RefTraj:
    """Duck-typed WeightedTrajectory for the reference tasks
    (contract: .trajectory/.weights/.dt/.n_frames, SURVEY.md §1)."""

    def __init__(self, x, w, dt):
        self.trajectory = x
        self.weights = w
        self.dt = dt
        self.n_frames = x.shape[0]


def _transplant_sequential(jax_seq, torch_seq):
    sd = {}
    for name, arr in jax_seq.named_parameters():
        sd[name] = torch.from_numpy(np.asarray(arr).copy())
    torch_seq.load_state_dict(sd)


def _replay_split(n, seed, times):
    """Replay the reference's global-RNG sklearn splits; returns the
    (train, test) original-index arrays of the LAST call."""
    from sklearn.model_selection import train_test_split

    np.random.seed(seed)
    for _ in range(times):
        tr, te = train_test_split(np.arange(n), test_size=0.2)
    return tr, te


def test_autoencoder_golden_parity(reference, tmp_path):
    ref_core, ref_nn = reference
    x, w = _data()
    dims_e, dims_d = [2, 10, 1], [1, 10, 2]

    # jax side, with the split the reference will draw injected
    train_idx, test_idx = _replay_split(len(x), seed=77, times=1)
    model_j = AutoEncoder(dims_e, dims_d, seed=3)
    traj_j = WeightedTrajectory(trajectory=x, weights=w, dt=0.1,
                                verbose=False)
    task_j = AutoEncoderTask(
        traj_j, None, model_j, str(tmp_path / "jax"), learning_rate=0.01,
        batch_size=100, num_epochs=3, test_ratio=0.2,
        save_model_every_step=0, verbose=False, tensorboard=False,
        split_indices=(train_idx, test_idx),
    )
    task_j.train()

    # reference side: transplant identical initial params, same split seed
    model_t = ref_nn.AutoEncoder(dims_e, dims_d)
    _transplant_sequential(model_j.encoder, model_t.encoder)
    _transplant_sequential(model_j.decoder, model_t.decoder)
    traj_t = _RefTraj(x.astype(np.float64), w.astype(np.float64), 0.1)
    task_t = ref_core.AutoEncoderTask(
        traj_t, torch.nn.Identity(), model_t, str(tmp_path / "ref"),
        learning_rate=0.01, batch_size=100, num_epochs=3, test_ratio=0.2,
        save_model_every_step=0, verbose=False,
    )
    np.random.seed(77)
    task_t.train()

    np.testing.assert_allclose(
        task_j.train_loss_df["loss"].to_numpy(),
        task_t.train_loss_df["loss"].to_numpy(),
        rtol=5e-4,
    )
    np.testing.assert_allclose(
        task_j.test_loss_df["loss"].to_numpy(),
        task_t.test_loss_df["loss"].to_numpy(),
        rtol=5e-4,
    )


def _transplant_eigenfunctions(jax_model, torch_model):
    for i in range(jax_model.k):
        sd = {}
        for li, layer in enumerate(jax_model.params):
            sd[f"{li + 1}.weight"] = torch.from_numpy(
                np.asarray(layer["weight"][i]).copy()
            )
            sd[f"{li + 1}.bias"] = torch.from_numpy(
                np.asarray(layer["bias"][i]).copy()
            )
        torch_model.eigen_funcs[i].load_state_dict(sd)


@pytest.mark.parametrize("lag_tau", [0.0, 0.2])
def test_eigenfunction_golden_parity(reference, tmp_path, lag_tau):
    ref_core, ref_nn = reference
    x, w = _data(seed=11)
    k = 2
    dims = [2, 10, 1]
    dt = 0.1
    lag_idx = int(round(lag_tau / dt))
    ll = len(x) - lag_idx

    # the reference's eigen task calls train_test_split twice
    # (core.py:465-468); the second call's indices win
    train_idx, test_idx = _replay_split(ll, seed=88, times=2)

    model_j = EigenFunctions(dims, k, seed=6)
    traj_j = WeightedTrajectory(trajectory=x, weights=w, dt=dt,
                                verbose=False)
    task_j = EigenFunctionTask(
        traj_j, None, model_j, str(tmp_path / f"jax{lag_idx}"),
        alpha=4.0, eig_weights=[1.0, 0.5], diag_coeff=np.ones(2),
        beta=1.5, lag_tau=lag_tau, k=k, learning_rate=0.01,
        batch_size=100, num_epochs=3, test_ratio=0.2,
        save_model_every_step=0, verbose=False, tensorboard=False,
        split_indices=(train_idx, test_idx),
    )
    task_j.train()

    model_t = ref_nn.EigenFunctions(dims, k)
    _transplant_eigenfunctions(model_j, model_t)
    traj_t = _RefTraj(x.astype(np.float64), w.astype(np.float64), dt)
    task_t = ref_core.EigenFunctionTask(
        traj_t, torch.nn.Identity(), model_t,
        str(tmp_path / f"ref{lag_idx}"),
        alpha=4.0, eig_weights=[1.0, 0.5], diag_coeff=torch.ones(2),
        beta=1.5, lag_tau=lag_tau, k=k, learning_rate=0.01,
        batch_size=100, num_epochs=3, test_ratio=0.2,
        save_model_every_step=0, verbose=False, debug_mode=False,
    )
    np.random.seed(88)
    task_t.train()

    cols = ["loss", "eigen_non_penalty", "eigen_penalty", "eig_1", "eig_2"]
    np.testing.assert_allclose(
        task_j.train_loss_df[cols].to_numpy(),
        task_t.train_loss_df[cols].to_numpy(),
        rtol=2e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        task_j.test_loss_df[cols].to_numpy(),
        task_t.test_loss_df[cols].to_numpy(),
        rtol=2e-3, atol=1e-4,
    )
