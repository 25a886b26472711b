"""Pipeline/numerics option tests: precompute_features, bf16 fast mode,
TensorBoard writer."""

import os

import numpy as np
import pytest

from colvarsfinder_tpu import config
from colvarsfinder_tpu.core import AutoEncoderTask, EigenFunctionTask
from colvarsfinder_tpu.models import AutoEncoder, EigenFunctions
from colvarsfinder_tpu.ops import Feature, FeatureLayer, PreprocessingANN
from colvarsfinder_tpu.utils import WeightedTrajectory


def _traj(n=200, atoms=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, atoms, 3)).astype(np.float32)
    return WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)


def _kw(tmp_path, name, **over):
    kw = dict(
        model_path=str(tmp_path / name), learning_rate=0.01, batch_size=40,
        num_epochs=2, test_ratio=0.25, save_model_every_step=0,
        verbose=False, tensorboard=False, seed=0,
    )
    kw.update(over)
    return kw


def test_precompute_features_matches_per_batch(tmp_path):
    traj = _traj()
    pp = PreprocessingANN(
        None, FeatureLayer([Feature("p", "position", [0, 1, 2, 3])])
    )
    common = dict(alpha=5.0, eig_weights=[1.0], lag_tau=0.2, k=1)

    m1 = EigenFunctions([12, 8, 1], k=1, seed=0)
    t1 = EigenFunctionTask(traj, pp, m1, **common, **_kw(tmp_path, "a"))
    t1.train()

    m2 = EigenFunctions([12, 8, 1], k=1, seed=0)
    t2 = EigenFunctionTask(
        traj, pp, m2, precompute_features=True, **common,
        **_kw(tmp_path, "b"),
    )
    t2.train()

    np.testing.assert_allclose(
        t1.train_loss_df.to_numpy(), t2.train_loss_df.to_numpy(),
        rtol=1e-4, atol=1e-6,
    )
    # the exported CV model still composes the original pp layer
    cv = t2.colvar_model()
    out = np.asarray(cv(traj.trajectory[:3].astype(np.float32)))
    assert out.shape == (3, 1)


def test_precompute_features_rejected_for_generator(tmp_path):
    traj = _traj()
    m = EigenFunctions([12, 8, 1], k=1, seed=0)
    with pytest.raises(AssertionError, match="transfer-operator"):
        EigenFunctionTask(
            traj, None, m, alpha=1.0, eig_weights=[1.0], lag_tau=0.0, k=1,
            precompute_features=True, **_kw(tmp_path, "c"),
        )


def test_bfloat16_fast_mode_trains(tmp_path):
    """set_matmul_precision('bfloat16') keeps training finite (the fast MXU
    path users opt into when bit parity doesn't matter)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((120, 2)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)
    old = config.matmul_precision()
    config.set_matmul_precision("bfloat16")
    try:
        model = AutoEncoder([2, 8, 1], [1, 8, 2], seed=0)
        task = AutoEncoderTask(traj, None, model, **_kw(tmp_path, "bf16"))
        task.train()
        assert np.isfinite(task.train_loss_df.to_numpy()).all()
    finally:
        config.set_matmul_precision(old)  # restore the real default


def test_tensorboard_writer_creates_events(tmp_path):
    pytest.importorskip("tensorboardX")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((80, 2)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)
    model = AutoEncoder([2, 6, 1], [1, 6, 2], seed=0)
    task = AutoEncoderTask(
        traj, None, model, **_kw(tmp_path, "tb", tensorboard=True),
    )
    task.train()
    task.writer.close()
    files = os.listdir(tmp_path / "tb")
    assert any("tfevents" in f for f in files)


@pytest.mark.slow
def test_regae_precompute_features_matches_per_batch(tmp_path):
    """RegAE with precompute_features must train identically to per-batch
    preprocessing (transfer-op regularizer + all feature-space terms)."""
    import numpy as np

    from colvarsfinder_tpu.core import RegAutoEncoderTask
    from colvarsfinder_tpu.models import RegAutoEncoder
    from colvarsfinder_tpu.ops import Feature, FeatureLayer
    from colvarsfinder_tpu.utils import WeightedTrajectory

    rng = np.random.default_rng(4)
    x = rng.standard_normal((300, 4, 3)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)
    feat = FeatureLayer([Feature("b", "bond", [0, 2]),
                         Feature("p", "position", [1, 3])])
    kw = dict(
        eig_weights=[1.0], alpha=1.0, gamma=[0.5, 2.0],
        eta=[0.05, 0.1, 0.0], lag_tau_ae=0.1, lag_tau_reg=0.2,
        learning_rate=0.01, batch_size=64, num_epochs=3, test_ratio=0.25,
        save_model_every_step=0, verbose=False, tensorboard=False,
        debug_mode=False, seed=0,
    )

    def run(precompute):
        model = RegAutoEncoder([7, 10, 1], [1, 10, 7], [1, 8, 1], 1, seed=2)
        t = RegAutoEncoderTask(
            traj, feat, model, str(tmp_path / f"pc{precompute}"),
            precompute_features=precompute, **kw,
        )
        t.train()
        return t

    t1, t2 = run(False), run(True)
    np.testing.assert_allclose(
        t1.train_loss_df.to_numpy(), t2.train_loss_df.to_numpy(),
        rtol=2e-4, atol=1e-6,
    )
    # colvar_model must keep the real preprocessing layer in both modes
    out1 = np.asarray(t1.colvar_model()(x[:4]))
    out2 = np.asarray(t2.colvar_model()(x[:4]))
    np.testing.assert_allclose(out1, out2, rtol=2e-3, atol=1e-5)


def test_regae_precompute_rejected_for_generator_regularizer(tmp_path):
    import numpy as np
    import pytest

    from colvarsfinder_tpu.core import RegAutoEncoderTask
    from colvarsfinder_tpu.models import RegAutoEncoder
    from colvarsfinder_tpu.utils import WeightedTrajectory

    traj = WeightedTrajectory(
        trajectory=np.zeros((50, 2), np.float32), dt=0.1, verbose=False
    )
    model = RegAutoEncoder([2, 8, 1], [1, 8, 2], [1, 6, 1], 1, seed=0)
    with pytest.raises(AssertionError, match="precompute_features"):
        RegAutoEncoderTask(
            traj, None, model, str(tmp_path / "bad"),
            eig_weights=[1.0], gamma=[1.0, 1.0], lag_tau_reg=0.0,
            precompute_features=True, batch_size=16, num_epochs=1,
            save_model_every_step=0, verbose=False, tensorboard=False,
        )


def test_ae_shard_trajectory_warns(tmp_path):
    import numpy as np
    import pytest

    from colvarsfinder_tpu.core import AutoEncoderTask
    from colvarsfinder_tpu.models import AutoEncoder
    from colvarsfinder_tpu.utils import WeightedTrajectory

    traj = WeightedTrajectory(
        trajectory=np.zeros((50, 2), np.float32), dt=0.1, verbose=False
    )
    model = AutoEncoder([2, 6, 1], [1, 6, 2], seed=0)
    with pytest.warns(UserWarning, match="shard_trajectory"):
        AutoEncoderTask(
            traj, None, model, str(tmp_path / "warn"),
            shard_trajectory=True, batch_size=16, num_epochs=1,
            save_model_every_step=0, verbose=False, tensorboard=False,
        )


def test_release_device_data_retrains_identically(tmp_path):
    """Cached device batch data can be dropped (HBM release for sweeps);
    the next train() re-prepares it and produces identical results."""
    import numpy as np

    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.utils import WeightedTrajectory

    rng = np.random.default_rng(0)
    x = rng.standard_normal((600, 4)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.01, verbose=False)

    def make():
        return EigenFunctionTask(
            traj, None, EigenFunctions([4, 8, 1], 1, seed=0),
            str(tmp_path), alpha=5.0, eig_weights=[1.0], lag_tau=0.01,
            k=1, learning_rate=0.01, batch_size=100, num_epochs=3,
            test_ratio=0.2, save_model_every_step=0, verbose=False,
            tensorboard=False, seed=0, debug_mode=False,
        )

    # reference: two consecutive train() calls with the cache kept
    t1 = make()
    t1.train()
    assert t1._prepared_data_cache is not None
    t1.train()
    ref_losses = t1.train_loss_df["loss"].to_numpy()
    # released instance: same two calls, cache dropped in between — the
    # SAME instance must re-prepare its data and continue identically
    t2 = make()
    t2.train()
    t2.release_device_data()
    assert t2._prepared_data_cache is None
    t2.train()
    assert t2._prepared_data_cache is not None
    np.testing.assert_array_equal(
        ref_losses, t2.train_loss_df["loss"].to_numpy()
    )
