"""Full-training parity of the eigenfunction task against a torch loop
(the BASELINE parity oracle for the flagship path): same split, same
initial parameters, same Adam — metric trajectories must agree to
f32-level tolerances, for both generator and transfer-operator losses."""

import numpy as np
import pytest
import torch

from colvarsfinder_tpu.core import EigenFunctionTask
from colvarsfinder_tpu.models import EigenFunctions
from colvarsfinder_tpu.utils import WeightedTrajectory
from helpers import TorchEigenFunctions, torch_eigen_loss


def _make_data(n=300, d=3, seed=2):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, n).astype(np.float32)
    w /= w.mean()
    return x, w


def _run_pair(tmp_path, lag_tau, name, k=2, epochs=3, bs=64):
    x, w = _make_data()
    traj = WeightedTrajectory(trajectory=x, weights=w, dt=0.1, verbose=False)
    dt = 0.1
    lag_idx = int(round(lag_tau / dt))

    n = traj.n_frames
    ll = n - lag_idx
    rng = np.random.default_rng(9)
    perm = rng.permutation(ll)
    n_test = int(ll * 0.25)
    test_idx, train_idx = perm[:n_test], perm[n_test:]

    model = EigenFunctions([3, 10, 1], k=k, seed=4)
    model_t = TorchEigenFunctions(model.params)  # twin BEFORE training

    task = EigenFunctionTask(
        traj, None, model, str(tmp_path / name),
        alpha=5.0, eig_weights=[1.0, 0.4][:k], beta=1.3, lag_tau=lag_tau,
        k=k, learning_rate=0.01, batch_size=bs, num_epochs=epochs,
        test_ratio=0.25, save_model_every_step=0, verbose=False,
        tensorboard=False, split_indices=(train_idx, test_idx),
    )
    task.train()

    # --- torch reference loop (contiguous batches, drop_last,
    # shuffle=False; test loop with grads enabled) ---
    X = torch.from_numpy(x)
    W = torch.from_numpy(w)
    diag = np.ones(3, dtype=np.float32)
    opt = torch.optim.Adam(model_t.parameters(), lr=0.01)
    nb = len(train_idx) // bs
    nb_te = max(1, len(test_idx) // min(bs, len(test_idx)))
    bs_te = min(bs, len(test_idx))

    def batch_metrics(idx, train):
        Xb = X[idx]
        Wb = W[idx]
        if lag_idx > 0:
            Xl, Wl = X[idx + lag_idx], W[idx + lag_idx]
        else:
            Xl = Wl = None
        loss, eig, np_l, pen, cvec = torch_eigen_loss(
            model_t, lambda z: z, Xb, Wb, Xl, Wl,
            k=k, alpha=5.0, eig_w=[1.0, 0.4][:k], beta=1.3,
            diag_coeff=diag, lag_idx=lag_idx, traj_dt=dt, sort=True,
        )
        if train:
            opt.zero_grad()
            loss.backward()
            opt.step()
        return [loss.item(), np_l.item(), pen.item()] + list(eig.numpy())

    torch_train, torch_test = [], []
    for _ in range(epochs):
        tr = [
            batch_metrics(train_idx[b * bs:(b + 1) * bs], True)
            for b in range(nb)
        ]
        te = [
            batch_metrics(test_idx[b * bs_te:(b + 1) * bs_te], False)
            for b in range(nb_te)
        ]
        torch_train.append(np.mean(tr, axis=0))
        torch_test.append(np.mean(te, axis=0))

    return task, np.asarray(torch_train), np.asarray(torch_test)


def test_generator_training_parity(tmp_path):
    task, t_train, t_test = _run_pair(tmp_path, lag_tau=0.0, name="gen")
    np.testing.assert_allclose(
        task.train_loss_df.to_numpy(), t_train, rtol=5e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        task.test_loss_df.to_numpy(), t_test, rtol=5e-4, atol=1e-4
    )


def test_transfer_training_parity(tmp_path):
    task, t_train, t_test = _run_pair(tmp_path, lag_tau=0.2, name="top")
    np.testing.assert_allclose(
        task.train_loss_df.to_numpy(), t_train, rtol=5e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        task.test_loss_df.to_numpy(), t_test, rtol=5e-4, atol=1e-4
    )
