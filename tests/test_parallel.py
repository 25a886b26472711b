"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

SURVEY.md §4 strategy: sharded-batch training must be numerically
equivalent to single-device training (global weighted reductions become
psums — same math), and the driver's dryrun path must execute.
"""

import jax
import numpy as np
import pytest

from colvarsfinder_tpu.core import AutoEncoderTask, EigenFunctionTask
from colvarsfinder_tpu.models import AutoEncoder, EigenFunctions
from colvarsfinder_tpu.parallel import make_data_mesh
from colvarsfinder_tpu.utils import WeightedTrajectory

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def traj():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((512, 2)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, 512)
    w /= w.mean()
    return WeightedTrajectory(trajectory=x, weights=w, dt=0.1, verbose=False)


def _kw(tmp_path, name, **over):
    kw = dict(
        model_path=str(tmp_path / name),
        learning_rate=0.01,
        batch_size=64,
        num_epochs=3,
        test_ratio=0.25,
        save_model_every_step=0,
        verbose=False,
        seed=0,
        tensorboard=False,
    )
    kw.update(over)
    return kw


@pytest.mark.slow
def test_ae_task_sharded_equals_single_device(traj, tmp_path):
    mesh = make_data_mesh(jax.devices()[:8])

    model1 = AutoEncoder([2, 12, 1], [1, 12, 2], seed=0)
    t1 = AutoEncoderTask(traj, None, model1, **_kw(tmp_path, "single"))
    t1.train()

    model2 = AutoEncoder([2, 12, 1], [1, 12, 2], seed=0)
    t2 = AutoEncoderTask(traj, None, model2, mesh=mesh,
                         **_kw(tmp_path, "sharded"))
    t2.train()

    np.testing.assert_allclose(
        t1.train_loss_df["loss"].to_numpy(),
        t2.train_loss_df["loss"].to_numpy(),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(t1.model.encoder.params[0]["weight"]),
        np.asarray(t2.model.encoder.params[0]["weight"]),
        rtol=1e-4, atol=1e-6,
    )


def test_eigen_task_sharded_transfer_op(traj, tmp_path):
    mesh = make_data_mesh(jax.devices()[:8])
    model1 = EigenFunctions([2, 10, 1], k=2, seed=0)
    t1 = EigenFunctionTask(
        traj, None, model1, alpha=10.0, eig_weights=[1.0, 0.5],
        lag_tau=0.2, k=2, **_kw(tmp_path, "eig1"),
    )
    t1.train()

    model2 = EigenFunctions([2, 10, 1], k=2, seed=0)
    t2 = EigenFunctionTask(
        traj, None, model2, alpha=10.0, eig_weights=[1.0, 0.5],
        lag_tau=0.2, k=2, mesh=mesh, **_kw(tmp_path, "eig2"),
    )
    t2.train()

    np.testing.assert_allclose(
        t1.train_loss_df.to_numpy(), t2.train_loss_df.to_numpy(),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_eigen_task_sharded_trajectory(traj, tmp_path):
    """Frame-axis-sharded trajectory (long-trajectory scaling, SURVEY §5)
    must be numerically identical to the replicated layout."""
    mesh = make_data_mesh(jax.devices()[:8])
    common = dict(alpha=10.0, eig_weights=[1.0], lag_tau=0.2, k=1)

    m1 = EigenFunctions([2, 10, 1], k=1, seed=3)
    t1 = EigenFunctionTask(traj, None, m1, mesh=mesh, **common,
                           **_kw(tmp_path, "repl"))
    t1.train()

    m2 = EigenFunctions([2, 10, 1], k=1, seed=3)
    t2 = EigenFunctionTask(traj, None, m2, mesh=mesh, shard_trajectory=True,
                           **common, **_kw(tmp_path, "shardtraj"))
    t2.train()

    np.testing.assert_allclose(
        t1.train_loss_df.to_numpy(), t2.train_loss_df.to_numpy(),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.slow
def test_regae_task_sharded_equals_single_device(traj, tmp_path):
    """RegAE's prebatched per-batch tuples have the batch dim LEADING, so
    mesh placement must shard axis 0 (a shard_batches placement would try
    to shard the feature axis and crash or mis-shard)."""
    from colvarsfinder_tpu.core import RegAutoEncoderTask
    from colvarsfinder_tpu.models import RegAutoEncoder

    mesh = make_data_mesh(jax.devices()[:8])
    kw = dict(
        eig_weights=[1.0, 0.5], alpha=1.0, gamma=(0.3, 0.3),
        eta=(0.1, 0.1, 0.1), lag_tau_ae=0.1, lag_tau_reg=0.1,
    )

    m1 = RegAutoEncoder([2, 10, 2], [2, 10, 2], [2, 8, 1], K=2, seed=0)
    t1 = RegAutoEncoderTask(traj, None, m1, **kw, **_kw(tmp_path, "rg1"))
    t1.train()
    assert t1._prebatch  # the layout under test

    m2 = RegAutoEncoder([2, 10, 2], [2, 10, 2], [2, 8, 1], K=2, seed=0)
    t2 = RegAutoEncoderTask(
        traj, None, m2, mesh=mesh, **kw, **_kw(tmp_path, "rg2")
    )
    t2.train()
    assert t2._prebatch

    np.testing.assert_allclose(
        t1.train_loss_df["loss"].to_numpy(),
        t2.train_loss_df["loss"].to_numpy(),
        rtol=1e-4, atol=1e-6,
    )
