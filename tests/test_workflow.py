"""Adaptive CV discovery loop (workflow.adaptive_cv_discovery): the
biased rounds actually explore states the unbiased bootstrap never
reaches, segments pool with boundaries, and the per-round artifacts are
complete."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


from colvarsfinder_tpu.core import EigenFunctionTask
from colvarsfinder_tpu.models import EigenFunctions
from colvarsfinder_tpu.workflow import adaptive_cv_discovery


class DoubleWell2D:
    """V = (x1^2 - 1)^2 + 8 x2^2 — two wells at x1 = ±1, barrier ~1 at
    x1 = 0; at beta=6 an unbiased short run stays in its starting well.
    The x2 curvature (16) is stiffer than the within-well x1 curvature
    (8), so the slowest within-well mode — what the round-0 CV can
    learn from trapped data — already points along x1."""

    dim = 2
    beta = 6.0

    def V(self, x):
        return (x[0] ** 2 - 1.0) ** 2 + 8.0 * x[1] ** 2

    def gradV(self, x):
        return jnp.asarray(
            [4.0 * x[0] * (x[0] ** 2 - 1.0), 16.0 * x[1]]
        )


def _make_task(outdir):
    def make_task(traj, round_idx):
        return EigenFunctionTask(
            traj,
            None,
            EigenFunctions([2, 16, 1], 1, seed=round_idx),
            str(outdir / f"cv{round_idx}"),
            alpha=10.0,
            eig_weights=[1.0],
            lag_tau=traj.dt,
            k=1,
            learning_rate=0.01,
            batch_size=200,
            num_epochs=15,
            save_model_every_step=0,
            verbose=False,
            tensorboard=False,
            seed=round_idx,
        )

    return make_task


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    out = tmp_path_factory.mktemp("adaptive")
    return adaptive_cv_discovery(
        DoubleWell2D(),
        _make_task(out),
        n_rounds=2,
        X0=np.array([1.0, 0.0]),
        unbiased_steps=20_000,
        metad_steps=40_000,
        step_size=0.005,
        frame_interval=50,
        hill_height=0.6,
        bias_factor=8.0,
        output_path=str(out / "sampling"),
        seed=3,
        verbose=False,
    )


def test_round_artifacts(result):
    assert len(result.rounds) == 2
    r0, r1 = result.rounds
    assert r0.metad is None and r1.metad is not None
    assert r0.index == 0 and r1.index == 1
    for r in result.rounds:
        assert np.isfinite(r.task.train_loss_df["loss"]).all()
        assert callable(r.cv_model)


def test_biased_round_explores(result):
    """The unbiased bootstrap stays in the x1 > 0 well; the CV-biased
    round must cross the barrier."""
    x0_unbiased = result.rounds[0].segment.trajectory[:, 0]
    x0_biased = result.rounds[1].segment.trajectory[:, 0]
    assert x0_unbiased.min() > -0.5  # trapped
    assert x0_biased.min() < -0.5  # crossed


def test_pooled_dataset(result):
    n0 = result.rounds[0].segment.n_frames
    n1 = result.rounds[1].segment.n_frames
    assert result.pooled.n_frames == n0 + n1
    np.testing.assert_array_equal(result.pooled.segment_starts, [0, n0])
    # weights mean-one (package contract), non-uniform on the biased part
    assert abs(result.pooled.weights.mean() - 1.0) < 1e-5
    assert result.rounds[1].segment.weights.std() > 1e-3


def test_final_cv_separates_wells(result):
    """The final CV (trained on pooled barrier-crossing data) must
    resolve the slow coordinate x1."""
    pooled = result.pooled
    cv = np.asarray(result.cv_model(pooled.trajectory)).reshape(-1)
    r = np.corrcoef(cv, pooled.trajectory[:, 0])[0, 1]
    assert abs(r) > 0.7


def test_exploration_signal(result):
    spans = result.cv_range_per_round()
    assert spans.shape == (2, 1)
    assert np.isfinite(spans).all()
    # the biased segment covers at least as much CV range as the
    # trapped bootstrap
    assert spans[1, 0] > 0.8 * spans[0, 0]


def test_single_round_is_plain_training(tmp_path):
    res = adaptive_cv_discovery(
        DoubleWell2D(),
        _make_task(tmp_path),
        n_rounds=1,
        X0=np.array([1.0, 0.0]),
        unbiased_steps=5_000,
        step_size=0.005,
        frame_interval=50,
        output_path=str(tmp_path / "s"),
        seed=0,
        verbose=False,
    )
    assert len(res.rounds) == 1
    assert res.rounds[0].metad is None
    assert res.pooled.segment_starts is None or len(res.pooled.segment_starts) <= 1


def test_warm_start_carries_weights(tmp_path):
    """With warm_start, round 1 enters train() holding round 0's TRAINED
    weights (not make_task's fresh seed)."""
    import jax

    pre_train_models = {}

    def make_task(traj, r):
        t = _make_task(tmp_path)(traj, r)
        real_train = t.train

        def spy_train():
            pre_train_models[r] = jax.tree.map(np.array, t.model)
            return real_train()

        t.train = spy_train
        return t

    res = adaptive_cv_discovery(
        DoubleWell2D(), make_task, n_rounds=2, X0=np.array([1.0, 0.0]),
        unbiased_steps=6_000, metad_steps=6_000, step_size=0.005,
        frame_interval=50, hill_height=0.6, bias_factor=8.0,
        warm_start=True, output_path=str(tmp_path / "ws"), seed=1,
        verbose=False,
    )
    assert len(res.rounds) == 2
    r0_trained = jax.tree.leaves(
        jax.tree.map(np.array, res.rounds[0].task.model)
    )
    r1_initial = jax.tree.leaves(pre_train_models[1])
    for a, b in zip(r0_trained, r1_initial):
        np.testing.assert_array_equal(a, b)
    # and training actually moved on from there
    r1_final = jax.tree.leaves(jax.tree.map(np.array, res.rounds[1].task.model))
    assert any(not np.array_equal(a, b) for a, b in zip(r1_initial, r1_final))
    for r in res.rounds:
        assert np.isfinite(r.task.train_loss_df["loss"]).all()


def test_remd_bootstrap_sees_both_wells(tmp_path):
    """bootstrap='remd': the round-0 dataset already covers both wells
    (the unbiased bootstrap stays trapped at beta=6), carries
    temperature-MBAR weights, and pools with slot/swap boundaries."""
    res = adaptive_cv_discovery(
        DoubleWell2D(),
        _make_task(tmp_path),
        n_rounds=1,
        X0=np.array([-1.0, 0.0]),
        unbiased_steps=30_000,
        step_size=0.005,
        frame_interval=50,
        bootstrap="remd",
        remd_betas=[6.0, 2.0, 0.8],
        output_path=str(tmp_path / "sampling"),
        seed=3,
        verbose=False,
    )
    seg = res.rounds[0].segment
    x1, w = seg.trajectory[:, 0], seg.weights
    frac_right = float(np.average(x1 > 0, weights=w))
    assert 0.1 < frac_right < 0.9  # both wells in the weighted ensemble
    np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-6)
    assert seg.segment_starts is not None and len(seg.segment_starts) >= 3
    assert np.isfinite(res.task.train_loss_df["loss"]).all()

    with pytest.raises(ValueError, match="bootstrap"):
        adaptive_cv_discovery(
            DoubleWell2D(), _make_task(tmp_path), n_rounds=1,
            unbiased_steps=100, bootstrap="nope", verbose=False,
            output_path=str(tmp_path / "s2"),
        )
