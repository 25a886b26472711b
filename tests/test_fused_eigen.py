"""Pallas fused transfer-operator step (ops/fused_eigen.py).

The kernels run in interpreter mode on CPU, so these tests exercise the
exact code path the TPU runs. The jnp oracle (transfer_stats_reference)
is the single source of truth for the stats math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colvarsfinder_tpu.core.losses import eigen_loss
from colvarsfinder_tpu.models import EigenFunctions
from colvarsfinder_tpu.ops.fused_eigen import (
    eigen_loss_from_stats,
    params_t_of,
    transfer_stats,
    transfer_stats_reference,
)


def _setup(k, B=3000, d=12, seed=0):
    rng = np.random.default_rng(seed)
    model = EigenFunctions([d, 10, 10, 1], k, seed=seed)
    pt = params_t_of(model)
    F = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    Fl = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 1.5, B), jnp.float32)
    wl = jnp.asarray(rng.uniform(0.5, 1.5, B), jnp.float32)
    return model, pt, F, Fl, w, wl


@pytest.mark.parametrize("k", [1, 2, 3])
def test_stats_kernel_matches_oracle(k):
    _, pt, F, Fl, w, wl = _setup(k)
    S_ker = transfer_stats(pt, F, Fl, w, wl)
    S_ref = transfer_stats_reference(pt, F, Fl, w, wl)
    np.testing.assert_allclose(S_ker, S_ref, rtol=5e-6, atol=1e-4)


@pytest.mark.parametrize("k", [1, 2])
def test_grad_kernel_matches_oracle(k):
    _, pt, F, Fl, w, wl = _setup(k)
    rng = np.random.default_rng(1)
    coef = jnp.asarray(
        rng.standard_normal(transfer_stats_reference(pt, F, Fl, w, wl).shape),
        jnp.float32,
    )
    g_ker = jax.grad(lambda p: (coef * transfer_stats(p, F, Fl, w, wl)).sum())(pt)
    g_ref = jax.grad(
        lambda p: (coef * transfer_stats_reference(p, F, Fl, w, wl)).sum()
    )(pt)
    for (a_w, a_b), (b_w, b_b) in zip(g_ker, g_ref):
        # f32 reduction-order noise bound (both paths sit ~1e-4 from f64)
        np.testing.assert_allclose(a_w, b_w, rtol=2e-3, atol=1e-3)
        np.testing.assert_allclose(a_b, b_b, rtol=2e-3, atol=1e-3)


def test_loss_from_stats_matches_eigen_loss():
    """stats -> loss must reproduce core.losses.eigen_loss (transfer-op),
    including the preserved numerator/denominator quirk and aux values."""
    k = 2
    model, pt, F, Fl, w, wl = _setup(k)
    S = transfer_stats_reference(pt, F, Fl, w, wl)
    loss_s, (eig_s, np_s, pen_s, cvec_s) = eigen_loss_from_stats(
        S, k=k, alpha=7.0, eig_w=[1.0, 0.4], lag_idx=5, traj_dt=0.002,
        sort_eigvals=True,
    )
    loss_r, aux = eigen_loss(
        model, lambda z: z, F, w, Fl, wl, k=k, alpha=7.0,
        eig_w=[1.0, 0.4], beta=1.0, diag_coeff=None, lag_idx=5,
        traj_dt=0.002, sort_eigvals=True,
    )
    np.testing.assert_allclose(loss_s, loss_r, rtol=1e-5)
    np.testing.assert_allclose(eig_s, aux.eig_vals, rtol=1e-5)
    np.testing.assert_allclose(np_s, aux.non_penalty_loss, rtol=1e-5)
    np.testing.assert_allclose(pen_s, aux.penalty, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(cvec_s, aux.cvec)


@pytest.mark.slow
def test_task_fused_step_matches_unfused(tmp_path):
    """EigenFunctionTask(fused_step=True) must train like the XLA path."""
    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.utils import WeightedTrajectory

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1200, 6)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.01, verbose=False)

    def make(fused):
        return EigenFunctionTask(
            traj, None, EigenFunctions([6, 10, 1], 2, seed=0),
            str(tmp_path / f"f{fused}"), alpha=8.0, eig_weights=[1.0, 0.5],
            lag_tau=0.02, k=2, learning_rate=0.005, batch_size=400,
            num_epochs=4, test_ratio=0.2, save_model_every_step=0,
            verbose=False, tensorboard=False, seed=0, debug_mode=False,
            fused_step=fused,
        )

    t0 = make(False)
    t0.train()
    t1 = make(True)
    t1.train()
    np.testing.assert_allclose(
        t0.train_loss_df["loss"].to_numpy(),
        t1.train_loss_df["loss"].to_numpy(),
        rtol=2e-3,
    )
    np.testing.assert_allclose(
        t0.train_loss_df["eig_1"].to_numpy(),
        t1.train_loss_df["eig_1"].to_numpy(),
        rtol=5e-3,
    )


def test_fused_step_rejects_generator(tmp_path):
    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.utils import WeightedTrajectory

    x = np.random.default_rng(0).standard_normal((200, 4)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.01, verbose=False)
    with pytest.raises(AssertionError, match="transfer-operator"):
        EigenFunctionTask(
            traj, None, EigenFunctions([4, 8, 1], 1, seed=0),
            str(tmp_path), alpha=5.0, eig_weights=[1.0], lag_tau=0.0,
            k=1, learning_rate=0.01, batch_size=100, num_epochs=1,
            test_ratio=0.2, save_model_every_step=0, verbose=False,
            tensorboard=False, seed=0, debug_mode=False, fused_step=True,
        )


def test_fused_step_rejects_wide_models(tmp_path):
    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.utils import WeightedTrajectory

    x = np.random.default_rng(0).standard_normal((300, 4)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.01, verbose=False)
    with pytest.raises(AssertionError, match="hidden_width"):
        EigenFunctionTask(
            traj, None, EigenFunctions([4, 512, 1], 2, seed=0),
            str(tmp_path), alpha=5.0, eig_weights=[1.0, 0.5], lag_tau=0.01,
            k=2, learning_rate=0.01, batch_size=100, num_epochs=1,
            test_ratio=0.2, save_model_every_step=0, verbose=False,
            tensorboard=False, seed=0, debug_mode=False, fused_step=True,
        )


def test_fused_step_rejects_mesh(tmp_path):
    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.parallel import make_data_mesh
    from colvarsfinder_tpu.utils import WeightedTrajectory

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    x = np.random.default_rng(0).standard_normal((300, 4)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.01, verbose=False)
    with pytest.raises(AssertionError, match="single-device"):
        EigenFunctionTask(
            traj, None, EigenFunctions([4, 8, 1], 1, seed=0),
            str(tmp_path), alpha=5.0, eig_weights=[1.0], lag_tau=0.01,
            k=1, learning_rate=0.01, batch_size=100, num_epochs=1,
            test_ratio=0.2, save_model_every_step=0, verbose=False,
            tensorboard=False, seed=0, debug_mode=False, fused_step=True,
            mesh=make_data_mesh(jax.devices()[:2]),
        )


def test_ensemble_rejects_fused_tasks(tmp_path):
    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.parallel import train_replica_ensemble
    from colvarsfinder_tpu.utils import WeightedTrajectory

    x = np.random.default_rng(0).standard_normal((300, 4)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.01, verbose=False)
    task = EigenFunctionTask(
        traj, None, EigenFunctions([4, 8, 1], 1, seed=0),
        str(tmp_path), alpha=5.0, eig_weights=[1.0], lag_tau=0.01,
        k=1, learning_rate=0.01, batch_size=100, num_epochs=1,
        test_ratio=0.2, save_model_every_step=0, verbose=False,
        tensorboard=False, seed=0, debug_mode=False, fused_step=True,
    )
    with pytest.raises(AssertionError, match="fused_step"):
        train_replica_ensemble([task])
