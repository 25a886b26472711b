"""End-to-end task tests: training runs, loss parity with a torch training
loop, checkpointing, CV export."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import torch

from colvarsfinder_tpu.core import (
    AutoEncoderTask,
    EigenFunctionTask,
    RegAutoEncoderTask,
)
from colvarsfinder_tpu.models import AutoEncoder, EigenFunctions, RegAutoEncoder
from colvarsfinder_tpu.utils import WeightedTrajectory
from helpers import torch_mlp_from_params

N_FRAMES = 240
DIM = 2


@pytest.fixture(scope="module")
def traj():
    rng = np.random.default_rng(7)
    # circle-ish data so the AE has structure to learn
    theta = rng.uniform(-np.pi, np.pi, N_FRAMES)
    r = 1.0 + 0.1 * rng.standard_normal(N_FRAMES)
    x = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)
    w = rng.uniform(0.5, 1.5, N_FRAMES)
    w /= w.mean()
    return WeightedTrajectory(trajectory=x, weights=w, dt=0.1, verbose=False)


def _mk_task_kwargs(tmp_path, name):
    return dict(
        model_path=str(tmp_path / name),
        learning_rate=0.01,
        batch_size=32,
        num_epochs=3,
        test_ratio=0.25,
        save_model_every_step=0,
        verbose=False,
        seed=0,
        tensorboard=False,
    )


def test_autoencoder_task_runs_and_learns(traj, tmp_path):
    model = AutoEncoder([2, 16, 1], [1, 16, 2], seed=0)
    task = AutoEncoderTask(
        traj, None, model, num_epochs=40,
        **{k: v for k, v in _mk_task_kwargs(tmp_path, "ae").items()
           if k != "num_epochs"},
    )
    task.train()
    df = task.train_loss_df
    assert list(df.columns) == ["loss"]
    assert len(df) == 40
    # training reduces loss substantially on this structured data
    assert df["loss"].iloc[-1] < 0.75 * df["loss"].iloc[0]
    assert len(task.test_loss_df) == 40
    cv = task.colvar_model()
    out = np.asarray(cv(traj.trajectory[:5].astype(np.float32)))
    assert out.shape == (5, 1)
    assert task.reg_model() is None


def test_autoencoder_parity_with_torch_training(traj, tmp_path):
    """Same split, same initial params, same Adam hyperparameters: the loss
    trajectories of the jax task and a reference-semantics torch loop must
    agree to f32 tolerance (BASELINE.md parity oracle)."""
    n = traj.n_frames
    rng = np.random.default_rng(3)
    perm = rng.permutation(n)
    n_test = int(n * 0.25)
    test_idx, train_idx = perm[:n_test], perm[n_test:]

    model = AutoEncoder([2, 10, 1], [1, 10, 2], seed=1)
    task = AutoEncoderTask(
        traj, None, model,
        split_indices=(train_idx, test_idx),
        **_mk_task_kwargs(tmp_path, "ae_parity"),
    )
    # build torch twin BEFORE training (same initial params)
    enc_t = torch_mlp_from_params(model.encoder.params)
    dec_t = torch_mlp_from_params(model.decoder.params)
    task.train()

    # --- torch reference loop (reference-semantics: contiguous batches,
    # drop_last, shuffle=False, Adam defaults) ---
    X = torch.from_numpy(traj.trajectory.astype(np.float32))
    w = torch.from_numpy(traj.weights.astype(np.float32))
    Xtr, wtr = X[train_idx], w[train_idx]
    Xte, wte = X[test_idx], w[test_idx]
    bs = 32
    nb = len(Xtr) // bs
    nb_te = len(Xte) // bs
    params = list(enc_t.parameters()) + list(dec_t.parameters())
    opt = torch.optim.Adam(params, lr=0.01)
    torch_train, torch_test = [], []
    for _ in range(3):
        ep = []
        for b in range(nb):
            xb = Xtr[b * bs:(b + 1) * bs]
            wb = wtr[b * bs:(b + 1) * bs]
            opt.zero_grad()
            out = dec_t(enc_t(xb))
            loss = (wb * ((out - xb) ** 2).sum(1)).sum() / wb.sum()
            loss.backward()
            opt.step()
            ep.append(loss.item())
        te = []
        with torch.no_grad():
            for b in range(nb_te):
                xb = Xte[b * bs:(b + 1) * bs]
                wb = wte[b * bs:(b + 1) * bs]
                out = dec_t(enc_t(xb))
                te.append(
                    ((wb * ((out - xb) ** 2).sum(1)).sum() / wb.sum()).item()
                )
        torch_train.append(np.mean(ep))
        torch_test.append(np.mean(te))

    np.testing.assert_allclose(
        task.train_loss_df["loss"].to_numpy(), torch_train, rtol=2e-4
    )
    np.testing.assert_allclose(
        task.test_loss_df["loss"].to_numpy(), torch_test, rtol=2e-4
    )


def test_eigenfunction_task_generator(traj, tmp_path):
    model = EigenFunctions([2, 12, 1], k=2, seed=0)
    task = EigenFunctionTask(
        traj, None, model,
        alpha=10.0, eig_weights=[1.0, 0.6], beta=1.0, lag_tau=0.0, k=2,
        **_mk_task_kwargs(tmp_path, "eig_gen"),
    )
    task.train()
    df = task.train_loss_df
    assert list(df.columns) == [
        "loss", "eigen_non_penalty", "eigen_penalty", "eig_1", "eig_2",
    ]
    assert len(df) == 3
    assert np.isfinite(df.to_numpy()).all()
    # sorted eigenvalues
    assert (df["eig_1"] <= df["eig_2"] + 1e-6).all()
    cv = task.colvar_model()
    out = np.asarray(cv(traj.trajectory[:4].astype(np.float32)))
    assert out.shape == (4, 2)


def test_eigenfunction_task_transfer(traj, tmp_path):
    model = EigenFunctions([2, 12, 1], k=1, seed=2)
    task = EigenFunctionTask(
        traj, None, model,
        alpha=5.0, eig_weights=[1.0], lag_tau=0.2, k=1,  # lag_idx = 2
        **_mk_task_kwargs(tmp_path, "eig_top"),
    )
    assert task.lag_idx == 2
    task.train()
    assert np.isfinite(task.train_loss_df.to_numpy()).all()
    assert np.isfinite(task.test_loss_df.to_numpy()).all()


@pytest.mark.slow
def test_generator_gram_path_matches_vjp(tmp_path):
    """The gram generator path (precomputed pp-jacobian Gram, losses
    pp_gram) must reproduce the vjp path's training trajectory — same
    math, preprocessing backward hoisted to data prep."""
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    rng = np.random.default_rng(0)
    ref = rng.standard_normal((4, 3)).astype(np.float32)
    traj_arr = (
        ref[None] + 0.2 * rng.standard_normal((600, 4, 3))
    ).astype(np.float32)

    class T:
        trajectory = traj_arr
        weights = np.ones(600, dtype=np.float32)
        dt = 0.1
        n_frames = 600

    pp = PreprocessingANN(
        AlignmentLayer(ref, align_indices=[0, 1, 2, 3]),
        FeatureLayer([Feature("p", "position", [0, 1, 2, 3])]),
    )
    results = {}
    for gram in (True, False):
        model = EigenFunctions([12, 10, 1], k=2, seed=0)
        kw = _mk_task_kwargs(tmp_path, f"gram{gram}")
        kw.update(batch_size=200, num_epochs=3)
        task = EigenFunctionTask(
            T(), pp, model, alpha=2.0, eig_weights=[1.0, 0.6],
            lag_tau=0.0, k=2, gram_pp=gram, **kw,
        )
        task.train()
        assert task._gram == gram
        results[gram] = task.train_loss_df.to_numpy()
    np.testing.assert_allclose(
        results[True], results[False], rtol=5e-4, atol=1e-4
    )


def test_gram_explicit_override_warns(tmp_path):
    """An explicit gram_pp=True that the data layout cannot honor
    (gather layout, prebatch=False) must warn and fall back to the vjp
    path instead of silently dropping the request."""
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    rng = np.random.default_rng(2)
    ref = rng.standard_normal((4, 3)).astype(np.float32)

    class T:
        trajectory = (
            ref[None] + 0.2 * rng.standard_normal((300, 4, 3))
        ).astype(np.float32)
        weights = np.ones(300, dtype=np.float32)
        dt = 0.1
        n_frames = 300

    pp = PreprocessingANN(
        AlignmentLayer(ref, align_indices=[0, 1, 2, 3]),
        FeatureLayer([Feature("p", "position", [0, 1, 2, 3])]),
    )
    task = EigenFunctionTask(
        T(), pp, EigenFunctions([12, 8, 1], k=1, seed=0),
        alpha=2.0, eig_weights=[1.0], lag_tau=0.0, k=1,
        gram_pp=True, prebatch=False,
        **{**_mk_task_kwargs(tmp_path, "gram_warn"),
           "batch_size": 100, "num_epochs": 1},
    )
    with pytest.warns(UserWarning, match="gram_pp=True could not"):
        task._prepare_data()
    assert not task._gram


@pytest.mark.slow
def test_regae_gram_path_matches_vjp(tmp_path):
    """The RegAE gram regularizer path (losses.reg_eigen_loss pp_gram)
    must reproduce the vjp path's training trajectory — same math with
    the preprocessing backward hoisted to data prep. Exercises the
    generator-type eigen regularizer together with the (lagged) AE and
    encoder-constraint terms, all running on precomputed features."""
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    rng = np.random.default_rng(1)
    ref = rng.standard_normal((4, 3)).astype(np.float32)
    traj_arr = (
        ref[None] + 0.2 * rng.standard_normal((600, 4, 3))
    ).astype(np.float32)

    class T:
        trajectory = traj_arr
        weights = np.ones(600, dtype=np.float32)
        dt = 0.1
        n_frames = 600

    pp = PreprocessingANN(
        AlignmentLayer(ref, align_indices=[0, 1, 2, 3]),
        FeatureLayer([Feature("p", "position", [0, 1, 2, 3])]),
    )
    results = {}
    for gram in (True, False):
        model = RegAutoEncoder([12, 10, 2], [2, 10, 12], [2, 8, 1], K=2,
                               seed=0)
        kw = _mk_task_kwargs(tmp_path, f"regae_gram{gram}")
        kw.update(batch_size=200, num_epochs=3)
        task = RegAutoEncoderTask(
            T(), pp, model,
            eig_weights=[1.0, 0.5],
            alpha=1.0, gamma=[0.5, 2.0], eta=[0.1, 0.1, 0.2],
            lag_tau_ae=0.2, lag_tau_reg=0.0,
            gram_pp=gram, **kw,
        )
        task.train()
        assert task._gram == gram
        results[gram] = task.train_loss_df.to_numpy()
    np.testing.assert_allclose(
        results[True], results[False], rtol=5e-4, atol=1e-4
    )


def test_eigenfunction_lag_divisibility(traj, tmp_path):
    model = EigenFunctions([2, 8, 1], k=1, seed=0)
    with pytest.raises(AssertionError, match="not divisable"):
        EigenFunctionTask(
            traj, None, model, alpha=1.0, eig_weights=[1.0],
            lag_tau=0.15, k=1, **_mk_task_kwargs(tmp_path, "eig_bad"),
        )


def test_regautoencoder_task_all_terms(traj, tmp_path):
    model = RegAutoEncoder([2, 12, 1], [1, 12, 2], [1, 8, 1], K=2, seed=0)
    task = RegAutoEncoderTask(
        traj, None, model,
        eig_weights=[1.0, 0.5],
        alpha=1.0, gamma=[0.5, 2.0], eta=[0.1, 0.1, 0.0],
        lag_tau_ae=0.1, lag_tau_reg=0.2,
        **_mk_task_kwargs(tmp_path, "regae"),
    )
    task.train()
    df = task.train_loss_df
    assert list(df.columns) == [
        "loss", "ae_loss", "eigen_non_penalty", "eigen_penalty",
        "eig_0", "eig_1",
        "encoder_gradient", "encoder_norm", "encoder_orthogonality",
    ]
    assert np.isfinite(df.to_numpy()).all()
    # disabled eta[2] term must be exactly zero
    assert (df["encoder_orthogonality"] == 0).all()
    cv = task.colvar_model()
    out = np.asarray(cv(traj.trajectory[:4].astype(np.float32)))
    assert out.shape == (4, 1)
    rm = task.reg_model()
    out_r = np.asarray(rm(traj.trajectory[:4].astype(np.float32)))
    assert out_r.shape == (4, 2)


def test_regautoencoder_per_term_loss_methods(traj, tmp_path):
    """The reference exposes each RegAE loss term as a task method
    (core.py:884-1034); the wrappers must agree with what training logs."""
    model = RegAutoEncoder([2, 12, 1], [1, 12, 2], [1, 8, 1], K=2, seed=0)
    task = RegAutoEncoderTask(
        traj, None, model,
        eig_weights=[1.0, 0.5],
        alpha=1.0, gamma=[0.5, 2.0], eta=[0.1, 0.1, 0.2],
        lag_tau_ae=0.1, lag_tau_reg=0.2,
        **_mk_task_kwargs(tmp_path, "regae_terms"),
    )
    X = traj.trajectory[:16].astype(np.float32)
    X_l = traj.trajectory[2:18].astype(np.float32)
    w = np.ones(16, dtype=np.float32)
    mse = float(task.weighted_MSE_loss(X, X_l, w))
    g = float(task.reg_enc_grad_loss(X, w))
    n = float(task.reg_enc_norm_loss(X, w))
    o = float(task.reg_enc_orthognal_loss(X, w))
    eig_vals, non_pen, pen, cvec = task.reg_eigen_loss(X, w, X_l, w)
    for v in (mse, g, n, o, float(non_pen), float(pen)):
        assert np.isfinite(v)
    assert eig_vals.shape == (2,)
    assert sorted(np.asarray(cvec).tolist()) == [0, 1]
    # cross-check two terms against the pure loss functions on identity pp
    import jax.numpy as jnp

    from colvarsfinder_tpu.core.losses import enc_norm_loss

    ref_n = float(enc_norm_loss(
        task.model.encoder, lambda x: x, jnp.asarray(X), jnp.asarray(w), 1
    ))
    np.testing.assert_allclose(n, ref_n, rtol=1e-6)


@pytest.mark.slow
def test_regautoencoder_generator_reg(traj, tmp_path):
    model = RegAutoEncoder([2, 10, 1], [1, 10, 2], [1, 6, 1], K=1, seed=1)
    task = RegAutoEncoderTask(
        traj, None, model,
        eig_weights=[1.0], alpha=1.0, gamma=[1.0, 5.0],
        lag_tau_ae=0.0, lag_tau_reg=0.0, beta=1.0,
        **_mk_task_kwargs(tmp_path, "regae_gen"),
    )
    task.train()
    assert np.isfinite(task.train_loss_df.to_numpy()).all()


def test_regautoencoder_freeze_encoder(traj, tmp_path):
    model = RegAutoEncoder([2, 10, 1], [1, 10, 2], [1, 6, 1], K=1, seed=2)
    enc_before = [np.asarray(l["weight"]).copy()
                  for l in model.encoder.params]
    dec_before = [np.asarray(l["weight"]).copy()
                  for l in model.decoder.params]
    task = RegAutoEncoderTask(
        traj, None, model,
        eig_weights=[1.0], alpha=1.0, gamma=[0.0, 0.0],
        freeze_encoder=True,
        **_mk_task_kwargs(tmp_path, "regae_frozen"),
    )
    task.train()
    for before, after in zip(enc_before, task.model.encoder.params):
        np.testing.assert_array_equal(before, np.asarray(after["weight"]))
    # decoder must have moved
    assert any(
        not np.allclose(b, np.asarray(a["weight"]))
        for b, a in zip(dec_before, task.model.decoder.params)
    )


def test_checkpoint_save_and_restart(traj, tmp_path):
    model = AutoEncoder([2, 8, 1], [1, 8, 2], seed=4)
    kw = _mk_task_kwargs(tmp_path, "ckpt")
    kw["save_model_every_step"] = 2
    kw["num_epochs"] = 2
    task = AutoEncoderTask(traj, None, model, export_cv=True, **kw)
    task.train()
    latest = tmp_path / "ckpt" / "latest"
    assert (latest / "model.npz").exists()
    assert (latest / "cv_params.npz").exists()
    assert (latest / "cv_exported.bin").exists()
    assert (latest / "cv_spec.json").exists()
    spec = json.loads((latest / "cv_spec.json").read_text())
    assert spec["input_state_shape"] == [2]
    # per-CV text dumps exist (reference core.py:203-208 format)
    assert (latest / "0_1_weight.txt").exists()
    # debug_mode snapshot
    assert (tmp_path / "ckpt" / "models" / "model_1.npz").exists()

    # restart from checkpoint: params must match trained model
    model2 = AutoEncoder([2, 8, 1], [1, 8, 2], seed=99)
    kw2 = _mk_task_kwargs(tmp_path, "ckpt2")
    task2 = AutoEncoderTask(
        traj, None, model2,
        load_model_filename=str(latest / "model.npz"), **kw2,
    )
    np.testing.assert_allclose(
        np.asarray(task2.model.encoder.params[0]["weight"]),
        np.asarray(task.model.encoder.params[0]["weight"]),
        rtol=1e-6,
    )


def test_exported_cv_roundtrip(traj, tmp_path):
    from colvarsfinder_tpu.export import export_colvar, load_colvar

    model = AutoEncoder([2, 8, 1], [1, 8, 2], seed=5)
    kw = _mk_task_kwargs(tmp_path, "exp")
    task = AutoEncoderTask(traj, None, model, **kw)
    cv = task.colvar_model()
    out_dir = str(tmp_path / "exp" / "artifact")
    export_colvar(cv, traj.trajectory[:1].astype(np.float32), out_dir)
    loaded = load_colvar(out_dir)
    x = traj.trajectory[:7].astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(loaded(x)), np.asarray(cv(x)), rtol=1e-5, atol=1e-6
    )
    # symbolic batch dimension: different batch size works too
    x2 = traj.trajectory[:3].astype(np.float32)
    assert np.asarray(loaded(x2)).shape == (3, 1)

    # gradient program: (values, jacobian) matches jacrev of the live model
    import jax

    loaded_g = load_colvar(out_dir, with_grad=True)
    val, jac = loaded_g(x)
    np.testing.assert_allclose(np.asarray(val), np.asarray(cv(x)), atol=1e-6)
    oracle = jax.vmap(jax.jacrev(lambda s: cv(s[None])[0]))(x)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(oracle), atol=1e-5)
    # single-state squeeze returns (k,), (k, *state)
    v1, j1 = loaded_g(x[0])
    assert np.asarray(v1).shape == (1,)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(oracle)[0], atol=1e-5)


@pytest.mark.slow
def test_tasks_on_concatenated_trajectories(tmp_path):
    """Lagged pairs never straddle source-trajectory boundaries: on a
    concatenated dataset the split is drawn from valid_lagged_starts,
    and training runs to completion."""
    from colvarsfinder_tpu.utils import concatenate_trajectories

    rng = np.random.default_rng(11)
    parts = []
    for m in (60, 25, 40):
        theta = rng.uniform(-np.pi, np.pi, m)
        x = np.stack([np.cos(theta), np.sin(theta)], 1)
        parts.append(WeightedTrajectory(trajectory=x, dt=0.1, verbose=False))
    cat = concatenate_trajectories(parts)

    model = EigenFunctions([2, 8, 1], k=1, seed=3)
    task = EigenFunctionTask(
        cat, None, model,
        alpha=5.0, eig_weights=[1.0], lag_tau=0.3, k=1,  # lag_idx = 3
        **{**_mk_task_kwargs(tmp_path, "eig_cat"), "batch_size": 16},
    )
    assert task.lag_idx == 3
    train_idx, test_idx = task._lagged_split(task.lag_idx)
    valid = set(cat.valid_lagged_starts(3).tolist())
    used = set(train_idx.tolist()) | set(test_idx.tolist())
    assert used <= valid
    # boundary-crossing starts (57..59, 82..84) are never sampled
    assert not used & {57, 58, 59, 82, 83, 84}
    task.train()
    assert np.isfinite(task.train_loss_df.to_numpy()).all()

    # RegAE restricts by the larger of its two lags
    from colvarsfinder_tpu.core import RegAutoEncoderTask
    from colvarsfinder_tpu.models import RegAutoEncoder

    rmodel = RegAutoEncoder([2, 8, 1], [1, 8, 2], [1, 8, 1], K=1, seed=4)
    rtask = RegAutoEncoderTask(
        cat, None, rmodel,
        eig_weights=[1.0], gamma=[1.0, 5.0], eta=[0.0, 0.0, 0.0],
        lag_tau_ae=0.2, lag_tau_reg=0.4,
        **{**_mk_task_kwargs(tmp_path, "regae_cat"), "batch_size": 16},
    )
    tr, te = rtask._lagged_split(max(rtask.lag_idx, rtask.lag_ae_idx))
    valid4 = set(cat.valid_lagged_starts(4).tolist())
    assert (set(tr.tolist()) | set(te.tolist())) <= valid4
    rtask.train()
    assert np.isfinite(rtask.train_loss_df.to_numpy()).all()

    # a contiguous trajectory is unchanged: candidates == arange(n - lag)
    single = parts[0]
    task1 = EigenFunctionTask(
        single, None, EigenFunctions([2, 8, 1], k=1, seed=3),
        alpha=5.0, eig_weights=[1.0], lag_tau=0.3, k=1,
        **{**_mk_task_kwargs(tmp_path, "eig_single"), "batch_size": 16},
    )
    tr1, te1 = task1._lagged_split(3)
    assert sorted(tr1.tolist() + te1.tolist()) == list(range(57))


@pytest.mark.slow
def test_generator_gram_scan_layout_matches_unrolled(tmp_path):
    """The stacked+scanned epoch body (unroll_batches=False) must keep
    the gram generator path active and reproduce the unrolled layout's
    training trajectory exactly — the layout that lets R=64 generator
    sweeps fit in HBM (round-3 verdict item 5)."""
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    rng = np.random.default_rng(4)
    ref = rng.standard_normal((4, 3)).astype(np.float32)
    traj_arr = (
        ref[None] + 0.2 * rng.standard_normal((600, 4, 3))
    ).astype(np.float32)

    class T:
        trajectory = traj_arr
        weights = np.ones(600, dtype=np.float32)
        dt = 0.1
        n_frames = 600

    pp = PreprocessingANN(
        AlignmentLayer(ref, align_indices=[0, 1, 2, 3]),
        FeatureLayer([Feature("p", "position", [0, 1, 2, 3])]),
    )
    results = {}
    for unroll in (True, False):
        model = EigenFunctions([12, 10, 1], k=2, seed=0)
        kw = _mk_task_kwargs(tmp_path, f"scan{unroll}")
        kw.update(batch_size=200, num_epochs=3)
        task = EigenFunctionTask(
            T(), pp, model, alpha=2.0, eig_weights=[1.0, 0.6],
            lag_tau=0.0, k=2, gram_pp=True, unroll_batches=unroll, **kw,
        )
        task.train()
        assert task._unroll == unroll
        assert task._gram  # gram survives the scanned layout
        results[unroll] = task.train_loss_df.to_numpy()
    # same math, different XLA scheduling (stacked slice vs unrolled):
    # f32 reduction-order noise only — same bar as gram-vs-vjp parity
    np.testing.assert_allclose(
        results[True], results[False], rtol=5e-4, atol=1e-5
    )


def test_make_optimizer_modes_update_identically():
    """The SOLO (static-lr) and ENSEMBLE (injected traced-lr) optimizer
    modes must produce identical parameter updates, and the injected
    state's inner_state must be exchangeable with the static state —
    the bridge train_replica_ensemble/adopt_sweep_result rely on
    (round-4 static-lr fix)."""
    import jax
    import jax.numpy as jnp
    import optax

    from colvarsfinder_tpu.core.task import TrainingTask

    lr = 0.0173
    params = {"w": jnp.arange(6.0).reshape(2, 3) / 7.0, "b": jnp.ones(3)}
    grads = {"w": jnp.full((2, 3), 0.25), "b": jnp.linspace(-1, 1, 3)}

    static = TrainingTask.make_optimizer("adam", lr)
    injected = TrainingTask.make_optimizer("adam")
    s_static = static.init(params)
    s_inj = TrainingTask.set_learning_rate(injected.init(params), lr)

    p_s, p_i = params, params
    for _ in range(3):
        u_s, s_static = static.update(grads, s_static, p_s)
        p_s = optax.apply_updates(p_s, u_s)
        u_i, s_inj = injected.update(grads, s_inj, p_i)
        p_i = optax.apply_updates(p_i, u_i)
    # the two modes round the lr differently (python float folded into
    # the program vs an f32 state array): equivalence is at f32 lr
    # resolution (~1e-7 absolute per step), not bitwise
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_i)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # state-format bridge: inner structures are interchangeable
    assert (
        jax.tree_util.tree_structure(
            TrainingTask.unwrap_opt_state(s_inj)
        )
        == jax.tree_util.tree_structure(s_static)
    )
    # unwrap is the identity on already-static states
    assert TrainingTask.unwrap_opt_state(s_static) is s_static
