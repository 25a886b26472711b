"""Golden end-to-end parity of RegAutoEncoderTask against the ACTUAL
reference package (all six loss terms active), completing the parity matrix
of tests/test_reference_golden.py."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

from colvarsfinder_tpu.core import RegAutoEncoderTask
from colvarsfinder_tpu.models import RegAutoEncoder
from colvarsfinder_tpu.utils import WeightedTrajectory

from test_reference_golden import (  # noqa: F401  (fixture reuse)
    _RefTraj,
    _data,
    _replay_split,
    _transplant_sequential,
    reference,
)


def _transplant_regae(jax_model, torch_model):
    _transplant_sequential(jax_model.encoder, torch_model.encoder)
    _transplant_sequential(jax_model.decoder, torch_model.decoder)
    for i in range(jax_model.num_reg):
        sd = {}
        for li, layer in enumerate(jax_model.reg):
            sd[f"{li + 1}.weight"] = torch.from_numpy(
                np.asarray(layer["weight"][i]).copy()
            )
            sd[f"{li + 1}.bias"] = torch.from_numpy(
                np.asarray(layer["bias"][i]).copy()
            )
        torch_model.reg[i].load_state_dict(sd)


def test_regautoencoder_golden_parity(reference, tmp_path):
    ref_core, ref_nn = reference
    x, w = _data(seed=21)
    dims_e, dims_d, dims_r = [2, 10, 1], [1, 10, 2], [1, 8, 1]
    K = 2
    dt = 0.1
    lag_ae, lag_reg = 0.1, 0.2  # indices 1 and 2
    ll = len(x) - 2

    # RegAE's train calls train_test_split once (reference core.py:1042)
    train_idx, test_idx = _replay_split(ll, seed=99, times=1)

    kwargs = dict(
        eig_weights=[1.0, 0.5], learning_rate=0.01, batch_size=100,
        num_epochs=3, test_ratio=0.2, alpha=1.0, gamma=[0.7, 3.0],
        eta=[0.05, 0.1, 0.2], lag_tau_ae=lag_ae, lag_tau_reg=lag_reg,
        beta=1.0, save_model_every_step=0, verbose=False,
    )

    model_j = RegAutoEncoder(dims_e, dims_d, dims_r, K, seed=8)
    traj_j = WeightedTrajectory(trajectory=x, weights=w, dt=dt,
                                verbose=False)
    task_j = RegAutoEncoderTask(
        traj_j, None, model_j, str(tmp_path / "jax"),
        tensorboard=False, split_indices=(train_idx, test_idx), **kwargs,
    )
    task_j.train()

    model_t = ref_nn.RegAutoEncoder(dims_e, dims_d, dims_r, K)
    _transplant_regae(model_j, model_t)
    traj_t = _RefTraj(x.astype(np.float64), w.astype(np.float64), dt)
    task_t = ref_core.RegAutoEncoderTask(
        traj_t, torch.nn.Identity(), model_t, str(tmp_path / "ref"),
        debug_mode=False, **kwargs,
    )
    np.random.seed(99)
    task_t.train()

    cols = [
        "loss", "ae_loss", "eigen_non_penalty", "eigen_penalty",
        "eig_0", "eig_1",
        "encoder_gradient", "encoder_norm", "encoder_orthogonality",
    ]
    np.testing.assert_allclose(
        task_j.train_loss_df[cols].to_numpy(),
        task_t.train_loss_df[cols].to_numpy(),
        rtol=3e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        task_j.test_loss_df[cols].to_numpy(),
        task_t.test_loss_df[cols].to_numpy(),
        rtol=3e-3, atol=1e-4,
    )
