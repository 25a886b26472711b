"""Replica-ensemble + hyperparameter-sweep training: one vmapped program
must produce the same per-replica results as training each configuration
individually — including MIXED hyperparameters (lr / loss constants),
which are traced arguments since round 3."""

import numpy as np
import pytest

from colvarsfinder_tpu.core import (
    AutoEncoderTask,
    EigenFunctionTask,
    RegAutoEncoderTask,
)
from colvarsfinder_tpu.models import (
    AutoEncoder,
    EigenFunctions,
    RegAutoEncoder,
)
from colvarsfinder_tpu.parallel import (
    train_hyperparameter_sweep,
    train_replica_ensemble,
)
from colvarsfinder_tpu.utils import WeightedTrajectory

COMMON = dict(
    batch_size=64, num_epochs=3, test_ratio=0.25,
    save_model_every_step=0, verbose=False, tensorboard=False,
    debug_mode=False,
)


def _traj(seed, n=256, d=2):
    rng = np.random.default_rng(seed)
    return WeightedTrajectory(
        trajectory=rng.standard_normal((n, d)).astype(np.float32),
        weights=rng.uniform(0.5, 1.5, n), dt=0.1, verbose=False,
    )


def _make_tasks(tmp_path, tag, n_replicas=3, lrs=None, alphas=None):
    tasks = []
    for r in range(n_replicas):
        model = EigenFunctions([2, 10, 1], k=2, seed=r)
        tasks.append(EigenFunctionTask(
            _traj(r), None, model, str(tmp_path / f"{tag}{r}"),
            alpha=(alphas[r] if alphas else 10.0),
            eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
            learning_rate=(lrs[r] if lrs else 0.01),
            seed=r, **COMMON,
        ))
    return tasks


def _assert_match(t_ind, t_ens, rtol=1e-4):
    np.testing.assert_allclose(
        t_ens.train_loss_df.to_numpy(), t_ind.train_loss_df.to_numpy(),
        rtol=rtol, atol=1e-6,
    )
    np.testing.assert_allclose(
        t_ens.test_loss_df.to_numpy(), t_ind.test_loss_df.to_numpy(),
        rtol=rtol, atol=1e-6,
    )


def test_ensemble_matches_individual_training(tmp_path):
    individual = _make_tasks(tmp_path, "ind")
    for t in individual:
        t.train()

    ensemble = _make_tasks(tmp_path, "ens")
    train_replica_ensemble(ensemble)

    for t_ind, t_ens in zip(individual, ensemble):
        _assert_match(t_ind, t_ens)
        # trained parameters match too
        a = np.asarray(t_ind.model.params[0]["weight"])
        b = np.asarray(t_ens.model.params[0]["weight"])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
        # CV model usable after ensemble training
        out = np.asarray(t_ens.colvar_model()(
            t_ens._traj_np[:4].astype(np.float32)
        ))
        assert out.shape == (4, 2)


def test_ensemble_mixed_hyperparameters(tmp_path):
    """lr and alpha differ per replica — ONE compiled program serves the
    mixed sweep (the round-2 design baked them into the cache key)."""
    from colvarsfinder_tpu.core import eigenfunction as eg

    lrs, alphas = [0.005, 0.02, 0.05], [5.0, 20.0, 80.0]
    individual = _make_tasks(tmp_path, "mhi", lrs=lrs, alphas=alphas)
    for t in individual:
        t.train()
    n_cache = len(eg._EPOCH_FN_CACHE)

    ensemble = _make_tasks(tmp_path, "mhe", lrs=lrs, alphas=alphas)
    train_replica_ensemble(ensemble)
    for t_ind, t_ens in zip(individual, ensemble):
        _assert_match(t_ind, t_ens)
    # the three individual configs shared one epoch program (hyperparams
    # are traced, not cache keys)
    assert len(eg._EPOCH_FN_CACHE) == n_cache


@pytest.mark.slow
def test_ensemble_autoencoder(tmp_path):
    def build(tag):
        return [
            AutoEncoderTask(
                _traj(s), None, AutoEncoder([2, 12, 1], [1, 12, 2], seed=s),
                str(tmp_path / f"{tag}{s}"),
                learning_rate=0.01 * (s + 1), seed=s, **COMMON,
            )
            for s in range(2)
        ]

    individual = build("aei")
    for t in individual:
        t.train()
    ensemble = build("aee")
    train_replica_ensemble(ensemble)
    for t_ind, t_ens in zip(individual, ensemble):
        _assert_match(t_ind, t_ens)


@pytest.mark.slow
def test_ensemble_regautoencoder(tmp_path):
    def build(tag):
        return [
            RegAutoEncoderTask(
                _traj(s), None,
                RegAutoEncoder([2, 12, 1], [1, 12, 2], [1, 8, 1], K=2,
                               seed=s),
                str(tmp_path / f"{tag}{s}"),
                eig_weights=[1.0, 0.5], alpha=1.0 + s, gamma=(0.5, 0.25),
                eta=(0.1, 0.1, 0.1), lag_tau_reg=0.2,
                learning_rate=0.01, seed=s, **COMMON,
            )
            for s in range(2)
        ]

    individual = build("rgi")
    for t in individual:
        t.train()
    ensemble = build("rge")
    train_replica_ensemble(ensemble)
    for t_ind, t_ens in zip(individual, ensemble):
        # 5e-4: the six-term loss (jacrev encoder constraints) accumulates
        # slightly different f32 reduction orders under the ensemble vmap
        _assert_match(t_ind, t_ens, rtol=5e-4)


def test_ensemble_rejects_mismatched_configs(tmp_path):
    tasks = _make_tasks(tmp_path, "mm", n_replicas=2)
    odd = EigenFunctionTask(
        _traj(9), None, EigenFunctions([2, 10, 1], k=2, seed=9),
        str(tmp_path / "odd"),
        alpha=10.0, eig_weights=[1.0, 0.5],
        lag_tau=0.4,  # different lag — genuinely static
        k=2, learning_rate=0.01, **COMMON,
    )
    with pytest.raises(AssertionError, match="static configuration"):
        train_replica_ensemble(tasks + [odd])


def test_ensemble_rejects_mixed_task_types(tmp_path):
    eig = _make_tasks(tmp_path, "mt", n_replicas=1)
    ae = AutoEncoderTask(
        _traj(0), None, AutoEncoder([2, 12, 1], [1, 12, 2], seed=0),
        str(tmp_path / "mt_ae"), learning_rate=0.01, **COMMON,
    )
    with pytest.raises(AssertionError, match="same task type"):
        train_replica_ensemble(eig + [ae])


def test_ensemble_sets_loss_list_like_train(tmp_path):
    tasks = _make_tasks(tmp_path, "ll", n_replicas=2)
    train_replica_ensemble(tasks)
    for t in tasks:
        assert len(t.loss_list) == t.num_epochs
        tr, te = t.loss_list[0]
        assert tr.shape[1] == 5 and te.shape[1] == 5  # metrics columns


# ---------------------------------------------------------------------------
# hyperparameter sweep (shared data)
# ---------------------------------------------------------------------------


def test_sweep_matches_individual_training(tmp_path):
    traj = _traj(3)
    model = EigenFunctions([2, 10, 1], k=2, seed=0)
    task = EigenFunctionTask(
        traj, None, model, str(tmp_path / "sw"),
        alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
        learning_rate=0.01, seed=0, **COMMON,
    )
    lrs, alphas = [0.005, 0.02, 0.05], [5.0, 20.0, 80.0]
    results = train_hyperparameter_sweep(
        task, {"learning_rate": lrs, "alpha": alphas}
    )
    assert len(results) == 3
    # the task itself is untouched (its optimizer state never stepped)
    import jax

    assert all(
        np.abs(np.asarray(leaf)).max() == 0
        for leaf in jax.tree_util.tree_leaves(task.opt_state)
    )

    for r, (lr, alpha) in enumerate(zip(lrs, alphas)):
        solo = EigenFunctionTask(
            traj, None, model, str(tmp_path / f"sw_solo{r}"),
            alpha=alpha, eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
            learning_rate=lr, seed=0, **COMMON,
        )
        solo.train()
        np.testing.assert_allclose(
            results[r].train_loss_df.to_numpy(),
            solo.train_loss_df.to_numpy(),
            rtol=1e-4, atol=1e-6,
        )
        assert results[r].hyperparams == {
            "learning_rate": lr, "alpha": alpha
        }
        assert results[r].cvec is not None


@pytest.mark.slow
def test_sweep_chunked_matches_unchunked(tmp_path):
    """chunk_size splits a wide grid into sequential vmapped programs
    (incl. a padded last chunk); results must equal the one-shot sweep."""
    traj = _traj(5)
    model = EigenFunctions([2, 10, 1], k=2, seed=0)
    task = EigenFunctionTask(
        traj, None, model, str(tmp_path / "chunk"),
        alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
        learning_rate=0.01, seed=0, **COMMON,
    )
    grid = {
        "learning_rate": [0.005, 0.01, 0.02, 0.04, 0.08],
        "alpha": [5.0, 10.0, 20.0, 40.0, 80.0],
    }
    full = train_hyperparameter_sweep(task, grid)
    chunked = train_hyperparameter_sweep(task, grid, chunk_size=2)
    assert len(chunked) == len(full) == 5
    for a, b in zip(full, chunked):
        assert a.hyperparams == b.hyperparams
        np.testing.assert_allclose(
            b.train_loss_df.to_numpy(), a.train_loss_df.to_numpy(),
            rtol=1e-5, atol=1e-7,
        )


@pytest.mark.slow
def test_sweep_generator_gram_path(tmp_path):
    """A sweep over a generator task with an alignment preprocessing
    layer runs the gram data layout (features + Gram tensors shared
    across replicas); per-replica results must match solo training."""
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    rng = np.random.default_rng(3)
    ref = rng.standard_normal((4, 3)).astype(np.float32)
    traj = WeightedTrajectory(
        trajectory=(
            ref[None] + 0.2 * rng.standard_normal((400, 4, 3))
        ).astype(np.float32),
        weights=np.ones(400), dt=0.1, verbose=False,
    )
    pp = PreprocessingANN(
        AlignmentLayer(ref, align_indices=[0, 1, 2, 3]),
        FeatureLayer([Feature("p", "position", [0, 1, 2, 3])]),
    )

    def mk(name, lr, alpha):
        return EigenFunctionTask(
            traj, pp, EigenFunctions([12, 10, 1], k=2, seed=0),
            str(tmp_path / name),
            alpha=alpha, eig_weights=[1.0, 0.5], lag_tau=0.0, k=2,
            learning_rate=lr, seed=0,
            **{**COMMON, "batch_size": 100, "num_epochs": 2},
        )

    task = mk("swgram", 0.01, 10.0)
    lrs, alphas = [0.005, 0.02], [5.0, 40.0]
    results = train_hyperparameter_sweep(
        task, {"learning_rate": lrs, "alpha": alphas}
    )
    assert task._gram  # the shared data layout is the gram layout
    for r, (lr, alpha) in enumerate(zip(lrs, alphas)):
        solo = mk(f"swgram_solo{r}", lr, alpha)
        solo.train()
        np.testing.assert_allclose(
            results[r].train_loss_df.to_numpy(),
            solo.train_loss_df.to_numpy(),
            rtol=1e-4, atol=1e-6,
        )


def test_sweep_autoencoder_lr(tmp_path):
    traj = _traj(4)
    model = AutoEncoder([2, 12, 1], [1, 12, 2], seed=0)
    task = AutoEncoderTask(
        traj, None, model, str(tmp_path / "swae"),
        learning_rate=0.01, seed=0, **COMMON,
    )
    results = train_hyperparameter_sweep(
        task, {"learning_rate": [0.001, 0.03]}
    )
    solo = AutoEncoderTask(
        traj, None, model, str(tmp_path / "swae_solo"),
        learning_rate=0.03, seed=0, **COMMON,
    )
    solo.train()
    np.testing.assert_allclose(
        results[1].train_loss_df.to_numpy(),
        solo.train_loss_df.to_numpy(),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.slow
def test_sweep_regae_vector_hyperparams(tmp_path):
    traj = _traj(5)
    model = RegAutoEncoder([2, 12, 1], [1, 12, 2], [1, 8, 1], K=2, seed=0)
    task = RegAutoEncoderTask(
        traj, None, model, str(tmp_path / "swrg"),
        eig_weights=[1.0, 0.5], alpha=1.0, gamma=(0.5, 0.25),
        eta=(0.1, 0.1, 0.1), lag_tau_reg=0.2, learning_rate=0.01,
        seed=0, **COMMON,
    )
    results = train_hyperparameter_sweep(
        task, {"gamma": [(0.5, 0.25), (1.0, 0.1)]}
    )
    solo = RegAutoEncoderTask(
        traj, None, model, str(tmp_path / "swrg_solo"),
        eig_weights=[1.0, 0.5], alpha=1.0, gamma=(1.0, 0.1),
        eta=(0.1, 0.1, 0.1), lag_tau_reg=0.2, learning_rate=0.01,
        seed=0, **COMMON,
    )
    solo.train()
    np.testing.assert_allclose(
        results[1].train_loss_df.to_numpy(),
        solo.train_loss_df.to_numpy(),
        rtol=1e-4, atol=1e-6,
    )
    # adopting a winner maps the vector hyperparameter onto the RegAE
    # task's list-typed attribute (gamma) without disturbing the others
    from colvarsfinder_tpu.parallel import adopt_sweep_result

    adopt_sweep_result(task, results[1])
    assert task.gamma == [1.0, 0.1]
    assert task.eta == [0.1, 0.1, 0.1] and task.alpha == 1.0


def test_sweep_rejects_gate_toggle(tmp_path):
    task = RegAutoEncoderTask(
        _traj(6), None,
        RegAutoEncoder([2, 12, 1], [1, 12, 2], [1, 8, 1], K=2, seed=0),
        str(tmp_path / "swgate"),
        eig_weights=[1.0, 0.5], alpha=1.0, gamma=(0.5, 0.25),
        eta=(0.1, 0.1, 0.1), lag_tau_reg=0.2, learning_rate=0.01,
        seed=0, **COMMON,
    )
    with pytest.raises(AssertionError, match="gate"):
        train_hyperparameter_sweep(task, {"alpha": [0.0, 1.0]})


def test_sweep_rejects_unknown_name(tmp_path):
    task = _make_tasks(tmp_path, "unk", n_replicas=1)[0]
    with pytest.raises(AssertionError, match="not sweepable"):
        train_hyperparameter_sweep(task, {"gamma": [(1, 1), (2, 2)]})


def test_adopt_sweep_result(tmp_path):
    """adopt_sweep_result loads a sweep winner back into the task: the
    task's hyperparameter attributes, model, optimizer state, and head
    ordering become the replica's, and the normal task surface
    (colvar_model / continued train) operates on the winner."""
    from colvarsfinder_tpu.parallel import adopt_sweep_result

    traj = _traj(7)
    model = EigenFunctions([2, 10, 1], k=2, seed=0)
    task = EigenFunctionTask(
        traj, None, model, str(tmp_path / "adopt"),
        alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
        learning_rate=0.01, seed=0, **COMMON,
    )
    lrs, alphas = [0.005, 0.02], [5.0, 40.0]
    results = train_hyperparameter_sweep(
        task, {"learning_rate": lrs, "alpha": alphas}
    )
    winner = results[1]
    out = adopt_sweep_result(task, winner)
    assert out is task
    assert task.learning_rate == lrs[1]
    assert task._alpha == alphas[1]
    np.testing.assert_array_equal(task._cvec, winner.cvec)
    # the adopted model parameters are the winner's
    np.testing.assert_allclose(
        np.asarray(task.model.params[0]["weight"]),
        np.asarray(winner.model.params[0]["weight"]),
    )
    # colvar_model uses the adopted weights + cvec
    cv = task.colvar_model()
    x = np.asarray(traj.trajectory[:8], dtype=np.float32)
    assert np.asarray(cv(x)).shape == (8, 2)
    # continued training resumes from the adopted state without error,
    # and matches a solo task trained with the winner's hyperparameters
    task.train()
    solo = EigenFunctionTask(
        traj, None, model, str(tmp_path / "adopt_solo"),
        alpha=alphas[1], eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
        learning_rate=lrs[1], seed=0, **COMMON,
    )
    solo.train()
    solo.train()
    np.testing.assert_allclose(
        task.train_loss_df.to_numpy(), solo.train_loss_df.to_numpy(),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.slow
def test_sweep_mesh_sharded_matches_unsharded(tmp_path):
    """Ensemble parallelism: sharding the replica axis over an 8-device
    mesh must reproduce the single-device sweep exactly (replicas are
    independent; the partitioning introduces no collectives)."""
    from colvarsfinder_tpu.parallel import make_data_mesh

    traj = _traj(9)
    model = EigenFunctions([2, 10, 1], k=2, seed=0)

    def mk(tag):
        return EigenFunctionTask(
            traj, None, model, str(tmp_path / tag),
            alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
            learning_rate=0.01, seed=0, **COMMON,
        )

    grid = {
        "learning_rate": [0.004 * (i + 1) for i in range(8)],
        "alpha": [5.0 * (i + 1) for i in range(8)],
    }
    plain = train_hyperparameter_sweep(mk("plain"), grid)
    mesh = make_data_mesh()
    assert mesh.devices.size == 8
    sharded = train_hyperparameter_sweep(mk("mesh"), grid, mesh=mesh)
    for a, b in zip(plain, sharded):
        assert a.hyperparams == b.hyperparams
        np.testing.assert_allclose(
            b.train_loss_df.to_numpy(), a.train_loss_df.to_numpy(),
            rtol=1e-5, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(b.model.params[0]["weight"]),
            np.asarray(a.model.params[0]["weight"]),
            rtol=1e-5, atol=1e-7,
        )

    # indivisible replica count is rejected
    bad = {k: v[:6] for k, v in grid.items()}
    with pytest.raises(AssertionError, match="divisible"):
        train_hyperparameter_sweep(mk("bad"), bad, mesh=mesh)

    # chunked + mesh: chunks of 4 would not divide 8 devices -> use 8
    chunked = train_hyperparameter_sweep(
        mk("chunk"), grid, chunk_size=8, mesh=mesh
    )
    for a, b in zip(plain, chunked):
        np.testing.assert_allclose(
            b.train_loss_df.to_numpy(), a.train_loss_df.to_numpy(),
            rtol=1e-5, atol=1e-7,
        )


@pytest.mark.slow
def test_replica_ensemble_mesh_sharded(tmp_path):
    """train_replica_ensemble(mesh=...) shards replicas (and their data)
    across devices and matches the unsharded ensemble."""
    from colvarsfinder_tpu.parallel import make_data_mesh

    plain = _make_tasks(tmp_path, "ep", n_replicas=8,
                        lrs=[0.004 * (i + 1) for i in range(8)])
    train_replica_ensemble(plain)
    sharded = _make_tasks(tmp_path, "eps", n_replicas=8,
                          lrs=[0.004 * (i + 1) for i in range(8)])
    train_replica_ensemble(sharded, mesh=make_data_mesh())
    for a, b in zip(plain, sharded):
        _assert_match(a, b)


def test_stack_trees_host_and_device_paths():
    """_stack_trees must produce identical results for small leaves
    (host-stacked: one bulk fetch + numpy stack) and large leaves
    (device jnp.stack), including mixed trees."""
    import jax.numpy as jnp

    from colvarsfinder_tpu.parallel import ensemble as ens

    rng = np.random.default_rng(0)
    big_n = ens._HOST_STACK_LIMIT_BYTES // 4 + 16  # f32 count above limit
    trees = [
        {
            "small": jnp.asarray(rng.standard_normal(7).astype(np.float32)),
            "scalar": float(r),
            "int": jnp.arange(3) + r,
            "big": jnp.full((big_n,), float(r), jnp.float32),
        }
        for r in range(3)
    ]
    stacked = ens._stack_trees(trees)
    assert stacked["small"].shape == (3, 7)
    assert stacked["big"].shape == (3, big_n)
    for r in range(3):
        np.testing.assert_array_equal(
            np.asarray(stacked["small"][r]), np.asarray(trees[r]["small"])
        )
        np.testing.assert_array_equal(
            np.asarray(stacked["int"][r]), np.asarray(trees[r]["int"])
        )
        assert float(stacked["scalar"][r]) == float(r)
        assert float(stacked["big"][r, 0]) == float(r)


def test_bulk_get_matches_device_get():
    """_bulk_get (one packed transfer per dtype) must equal per-leaf
    jax.device_get for mixed-dtype, mixed-shape pytrees."""
    import jax
    import jax.numpy as jnp

    from colvarsfinder_tpu.parallel.ensemble import _bulk_get

    rng = np.random.default_rng(1)
    tree = {
        "a": jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32)),
        "b": (jnp.arange(6, dtype=jnp.int32).reshape(2, 3),
              jnp.asarray(rng.standard_normal(3).astype(np.float32))),
        "c": jnp.asarray(2.5, jnp.float32),
    }
    got = _bulk_get(tree)
    want = jax.device_get(tree)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        assert isinstance(g, np.ndarray)
        assert g.dtype == w.dtype
        np.testing.assert_array_equal(g, w)


@pytest.mark.slow
def test_explore_then_finetune(tmp_path):
    """explore_then_finetune sweeps the grid (bfloat16 by default), adopts
    the replica with the lowest final loss, and fine-tunes it at float32:
    the task ends holding the winner's hyperparameters and a fresh
    float32 training dataframe, with the global config restored."""
    from colvarsfinder_tpu import config
    from colvarsfinder_tpu.parallel import explore_then_finetune

    traj = _traj(11)
    model = EigenFunctions([2, 10, 1], k=2, seed=0)
    task = EigenFunctionTask(
        traj, None, model, str(tmp_path / "etf"),
        alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
        learning_rate=0.01, seed=0, **COMMON,
    )
    lrs = [0.005, 0.02]
    res = explore_then_finetune(
        task, {"learning_rate": lrs, "alpha": [5.0, 40.0]},
        finetune_epochs=2,
    )
    assert len(res.results) == 2
    finals = [
        float(r.train_loss_df["loss"].iloc[-1]) for r in res.results
    ]
    assert res.best_index == int(np.argmin(finals))
    assert res.best_hyperparams["learning_rate"] == lrs[res.best_index]
    # the winner's hyperparameters were adopted into the task
    assert task.learning_rate == lrs[res.best_index]
    # the fine-tune ran for the requested epochs and restored num_epochs
    assert len(task.train_loss_df) == 2
    assert task.num_epochs == COMMON["num_epochs"]
    # fine-tune numerics were float32 and the ambient config is restored
    assert config.compute_dtype_name() == "float32"
    losses = task.train_loss_df["loss"].to_numpy()
    assert np.all(np.isfinite(losses))
    # the fine-tuned model differs from the raw sweep winner (training
    # continued) but its CV surface still works
    cv = task.colvar_model()
    x = np.asarray(traj.trajectory[:4], dtype=np.float32)
    assert np.asarray(cv(x)).shape == (4, 2)


@pytest.mark.slow
def test_architecture_ensemble(tmp_path):
    """train_architecture_ensemble groups vmap-compatible tasks and
    trains each group as one ensemble (singletons solo); every task must
    come out exactly as if it had been trained individually."""
    from colvarsfinder_tpu.parallel import train_architecture_ensemble

    def make(tag, sizes, seed, lag=0.2):
        model = EigenFunctions(sizes, k=2, seed=seed)
        return EigenFunctionTask(
            _traj(seed), None, model, str(tmp_path / tag),
            alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=lag, k=2,
            learning_rate=0.01, seed=seed, **COMMON,
        )

    # two [2,10,1] seeds (one group), one [2,16,1] (singleton), and one
    # [2,10,1] with a different lag (static config differs -> own group)
    specs = [
        ("a0", [2, 10, 1], 0, 0.2),
        ("a1", [2, 10, 1], 1, 0.2),
        ("b0", [2, 16, 1], 2, 0.2),
        ("c0", [2, 10, 1], 3, 0.4),
    ]
    tasks = [make(*s) for s in specs]
    solo = [make(*s) for s in specs]

    out = train_architecture_ensemble(tasks, verbose=True)
    assert out == list(tasks)
    for t, s in zip(tasks, solo):
        s.train()
        _assert_match(s, t)


def test_sweep_vamp_scores(tmp_path):
    """sweep_vamp_scores ranks replicas without mutating the task and
    matches the manual adopt-then-score computation."""
    import copy

    from colvarsfinder_tpu.analysis import vamp_score
    from colvarsfinder_tpu.parallel import adopt_sweep_result, sweep_vamp_scores

    traj = _traj(11)
    model = EigenFunctions([2, 10, 1], k=2, seed=0)
    task = EigenFunctionTask(
        traj, None, model, str(tmp_path / "vsw"),
        alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
        learning_rate=0.01, seed=0, **COMMON,
    )
    results = train_hyperparameter_sweep(
        task, {"learning_rate": [0.005, 0.02], "alpha": [5.0, 40.0]}
    )
    before = np.asarray(task.model.params[0]["weight"]).copy()
    scores = sweep_vamp_scores(task, results)  # lag defaults to lag_idx
    assert scores.shape == (2,)
    assert np.all((scores >= 0.0) & (scores <= 2.0))
    # task untouched
    np.testing.assert_array_equal(
        before, np.asarray(task.model.params[0]["weight"])
    )
    assert task.learning_rate == 0.01 and task._alpha == 10.0
    # manual parity for one replica (small batch_size exercises chunking)
    proxy = adopt_sweep_result(copy.copy(task), results[1])
    y = np.asarray(proxy.colvar_model()(
        np.asarray(traj.trajectory, dtype=np.float32)))
    manual = vamp_score(y, task.lag_idx, weights=traj.weights)
    np.testing.assert_allclose(
        sweep_vamp_scores(task, results[1], batch_size=50)[0], manual,
        rtol=1e-6,
    )
    # VAMP-1 differs from VAMP-2 (sanity that method= is plumbed)
    s1 = sweep_vamp_scores(task, results, method="VAMP-1")
    assert np.all(s1 >= scores - 1e-12)


def test_sweep_vamp_scores_requires_lag_without_one(tmp_path):
    from colvarsfinder_tpu.parallel import sweep_vamp_scores

    traj = _traj(12)
    model = AutoEncoder([2, 8, 1], [1, 8, 2], seed=0)
    task = AutoEncoderTask(
        traj, None, model, str(tmp_path / "vsw_ae"),
        learning_rate=0.01, seed=0, **COMMON,
    )
    results = train_hyperparameter_sweep(
        task, {"learning_rate": [0.005, 0.02]}
    )
    with pytest.raises(ValueError):
        sweep_vamp_scores(task, results)
    scores = sweep_vamp_scores(task, results, lag=2)
    assert scores.shape == (2,) and np.all(np.isfinite(scores))


def test_explore_then_finetune_vamp_metric(tmp_path):
    """metric='vamp' adopts the sweep_vamp_scores argmax — the right
    selector when the grid varies loss constants (alpha values make the
    final losses mutually incomparable)."""
    from colvarsfinder_tpu.parallel import (
        explore_then_finetune,
        sweep_vamp_scores,
    )

    traj = _traj(13)
    model = EigenFunctions([2, 10, 1], k=2, seed=0)
    task = EigenFunctionTask(
        traj, None, model, str(tmp_path / "etfv"),
        alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
        learning_rate=0.01, seed=0, **COMMON,
    )
    res = explore_then_finetune(
        task, {"alpha": [2.0, 50.0], "learning_rate": [0.01, 0.01]},
        metric="vamp", finetune_epochs=2, compute_dtype="float32",
    )
    scores = sweep_vamp_scores(task, res.results)
    assert res.best_index == int(np.argmax(scores))
    assert task._alpha == [2.0, 50.0][res.best_index]
    assert np.all(np.isfinite(task.train_loss_df["loss"].to_numpy()))


def test_sweep_vamp_scores_heldout_frames_and_regae(tmp_path):
    """Explicit held-out frames/weights are honored, and the RegAE
    family's adopt+colvar path scores with its default training lag."""
    from colvarsfinder_tpu.parallel import sweep_vamp_scores

    traj = _traj(14)
    model = RegAutoEncoder([2, 12, 1], [1, 12, 2], [1, 8, 1], K=2, seed=0)
    task = RegAutoEncoderTask(
        traj, None, model, str(tmp_path / "vswrg"),
        eig_weights=[1.0, 0.5], alpha=1.0, gamma=(0.5, 0.25),
        eta=(0.1, 0.1, 0.1), lag_tau_reg=0.2, learning_rate=0.01,
        seed=0, **COMMON,
    )
    assert task.lag_idx > 0
    results = train_hyperparameter_sweep(
        task, {"learning_rate": [0.005, 0.02]}
    )
    default_scores = sweep_vamp_scores(task, results)
    assert default_scores.shape == (2,) and np.all(np.isfinite(default_scores))
    # a different held-out series gives a different (but finite) score
    rng = np.random.default_rng(15)
    held = rng.standard_normal((300, 2)).astype(np.float32)
    held_w = rng.uniform(0.5, 1.5, 300)
    held_scores = sweep_vamp_scores(
        task, results, frames=held, weights=held_w, lag=2
    )
    assert held_scores.shape == (2,) and np.all(np.isfinite(held_scores))
    assert not np.allclose(held_scores, default_scores)


def _committor_task(tmp_path, traj, tag, alpha=50.0, lr=0.01, seed=0):
    from colvarsfinder_tpu import CommittorTask, create_sequential_nn

    return CommittorTask(
        traj, None, create_sequential_nn([2, 10, 1], seed=7),
        str(tmp_path / tag),
        region_a=traj.trajectory[:, 0] < -0.5,
        region_b=traj.trajectory[:, 0] > 0.5,
        alpha=alpha, beta=1.0, learning_rate=lr, seed=seed, **COMMON,
    )


@pytest.mark.slow
def test_sweep_committor_matches_individual(tmp_path):
    """CommittorTask sweeps alpha/learning_rate through the same vmapped
    machinery as the other families."""
    traj = _traj(9)
    task = _committor_task(tmp_path, traj, "com")
    lrs, alphas = [0.005, 0.02, 0.05], [20.0, 50.0, 200.0]
    results = train_hyperparameter_sweep(
        task, {"learning_rate": lrs, "alpha": alphas}
    )
    assert len(results) == 3
    for r, (lr, alpha) in enumerate(zip(lrs, alphas)):
        solo = _committor_task(tmp_path, traj, f"com_solo{r}",
                               alpha=alpha, lr=lr)
        solo.train()
        np.testing.assert_allclose(
            results[r].train_loss_df.to_numpy(),
            solo.train_loss_df.to_numpy(),
            rtol=1e-4, atol=1e-6,
        )
        assert list(results[r].train_loss_df.columns) == [
            "loss", "dirichlet", "boundary_a", "boundary_b"
        ]

    # adopt a winner: the committor task's plain-float attrs are set
    from colvarsfinder_tpu.parallel import adopt_sweep_result

    adopt_sweep_result(task, results[2])
    assert task.alpha == alphas[2]
    assert task.learning_rate == lrs[2]


def test_ensemble_committor(tmp_path):
    """Replica-ensemble training of CommittorTask matches task.train()."""
    traj = _traj(11)
    tasks = [
        _committor_task(tmp_path, traj, f"ce{r}", alpha=a, seed=0)
        for r, a in enumerate([20.0, 80.0])
    ]
    solo = [
        _committor_task(tmp_path, traj, f"ce_solo{r}", alpha=a, seed=0)
        for r, a in enumerate([20.0, 80.0])
    ]
    train_replica_ensemble(tasks)
    for t, s in zip(tasks, solo):
        s.train()
        np.testing.assert_allclose(
            t.train_loss_df.to_numpy(), s.train_loss_df.to_numpy(),
            rtol=1e-4, atol=1e-6,
        )


@pytest.mark.slow
def test_sweep_committor_checks(tmp_path):
    """Alpha grids are not loss-comparable; sweep_committor_checks ranks
    replicas by MSM self-consistency of their predicted committor."""
    from colvarsfinder_tpu.parallel import sweep_committor_checks

    # a two-well series so the committor is learnable at all
    rng = np.random.default_rng(2)
    n = 1200
    x = np.empty((n, 2), np.float32)
    state = -1.0
    for t in range(n):
        state = np.clip(
            state + 0.25 * (-4 * state * (state**2 - 1)) * 0.05
            + 0.45 * rng.standard_normal(), -1.8, 1.8,
        )
        x[t] = (state, 0.1 * rng.standard_normal())
    traj = WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)
    task = _committor_task(tmp_path, traj, "csc", alpha=50.0)
    # reuse helper but with the two-well regions
    from colvarsfinder_tpu import CommittorTask, create_sequential_nn

    task = CommittorTask(
        traj, None, create_sequential_nn([2, 10, 1], seed=7),
        str(tmp_path / "csc2"),
        region_a=x[:, 0] < -0.9, region_b=x[:, 0] > 0.9,
        alpha=50.0, beta=1.0, learning_rate=0.02, seed=0,
        **{**COMMON, "num_epochs": 30},
    )
    results = train_hyperparameter_sweep(
        task, {"alpha": [0.01, 50.0, 200.0]}
    )
    devs = sweep_committor_checks(task, results, lag=3, n_bins=8)
    assert devs.shape == (3,)
    assert np.isfinite(devs).all()
    # a near-zero alpha cannot pin the boundaries -> visibly worse
    # self-consistency than the properly-penalized replicas
    assert devs[0] > min(devs[1], devs[2])

    with pytest.raises(TypeError, match="CommittorTask"):
        eig = _make_tasks(tmp_path, "nope", n_replicas=1)[0]
        sweep_committor_checks(eig, results, lag=3)
    with pytest.raises(ValueError, match="in_a and in_b"):
        sweep_committor_checks(task, results, lag=3, frames=x[:100])


@pytest.mark.slow
def test_explore_then_finetune_committor_metric(tmp_path):
    """metric='committor' adopts the sweep_committor_checks argmin and
    fine-tunes it at float32."""
    from colvarsfinder_tpu import CommittorTask, create_sequential_nn
    from colvarsfinder_tpu.parallel import (
        explore_then_finetune,
        sweep_committor_checks,
    )

    rng = np.random.default_rng(4)
    n = 1000
    x = np.empty((n, 2), np.float32)
    state = -1.0
    for t in range(n):
        state = np.clip(
            state + 0.25 * (-4 * state * (state**2 - 1)) * 0.05
            + 0.45 * rng.standard_normal(), -1.8, 1.8,
        )
        x[t] = (state, 0.1 * rng.standard_normal())
    traj = WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)
    task = CommittorTask(
        traj, None, create_sequential_nn([2, 10, 1], seed=7),
        str(tmp_path / "etf"),
        region_a=x[:, 0] < -0.9, region_b=x[:, 0] > 0.9,
        alpha=50.0, beta=1.0, learning_rate=0.02, seed=0,
        **{**COMMON, "num_epochs": 20},
    )
    grid = {"alpha": [0.01, 50.0, 200.0]}
    res = explore_then_finetune(
        task, grid, metric="committor", metric_lag=3,
        compute_dtype="float32", finetune_epochs=5,
    )
    # the collapsed alpha~0 replica must not win
    assert res.best_index != 0
    assert task.alpha == grid["alpha"][res.best_index]
    assert np.isfinite(task.train_loss_df["loss"]).all()

    with pytest.raises(ValueError, match="metric_lag"):
        explore_then_finetune(
            task, grid, metric="committor", compute_dtype="float32",
            finetune_epochs=1,
        )


@pytest.mark.slow
def test_sweep_auto_relayout_wide_generator(tmp_path, monkeypatch):
    """A generator-loss sweep whose unrolled-body liveness estimate
    exceeds the HBM budget must auto-relayout the task to the
    stacked+scanned epoch body — with identical per-replica results
    (round-3 verdict item 5; calibration: benchmarks/RESULTS.md
    generator sweeps, R=32 fits / R=64 OOM on 16 GB)."""
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )
    from colvarsfinder_tpu.parallel import ensemble as ens

    rng = np.random.default_rng(9)
    ref = rng.standard_normal((4, 3)).astype(np.float32)
    traj = WeightedTrajectory(
        trajectory=(
            ref[None] + 0.2 * rng.standard_normal((400, 4, 3))
        ).astype(np.float32),
        weights=np.ones(400), dt=0.1, verbose=False,
    )
    pp = PreprocessingANN(
        AlignmentLayer(ref, align_indices=[0, 1, 2, 3]),
        FeatureLayer([Feature("p", "position", [0, 1, 2, 3])]),
    )

    def mk(name, **over):
        return EigenFunctionTask(
            traj, pp, EigenFunctions([12, 10, 1], k=2, seed=0),
            str(tmp_path / name),
            alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.0, k=2,
            learning_rate=0.01, seed=0,
            **{**COMMON, "batch_size": 100, "num_epochs": 2}, **over,
        )

    grid = {"learning_rate": [0.005, 0.02], "alpha": [5.0, 40.0]}

    # wide-budget control: stays unrolled
    task_a = mk("relay_a")
    ref_results = train_hyperparameter_sweep(task_a, grid)
    assert task_a._unroll and task_a._gram

    # tiny budget: relayouts to the scanned body, same results
    monkeypatch.setattr(ens, "SWEEP_UNROLL_BUDGET_BYTES", 1)
    task_b = mk("relay_b")
    scan_results = train_hyperparameter_sweep(task_b, grid)
    assert not task_b._unroll
    assert task_b._gram  # gram survives the scanned layout
    for a, b in zip(ref_results, scan_results):
        np.testing.assert_allclose(
            b.train_loss_df.to_numpy(), a.train_loss_df.to_numpy(),
            rtol=1e-4, atol=1e-6,
        )

    # an explicit unroll_batches=True wins over the auto heuristic
    task_c = mk("relay_c", unroll_batches=True)
    train_hyperparameter_sweep(task_c, grid)
    assert task_c._unroll

    # the auto-relayout is sweep-scoped: after the sweep returns, the
    # override is cleared and a subsequent solo prep goes back to the
    # unrolled body (round-4 advisor finding: a persistent scanned body
    # silently costs ~0.8 ms/step of stacked-slice overhead solo)
    assert task_b._unroll_override is None
    assert not hasattr(task_b, "_prepared_data_cache")
    task_b._prepare_data()
    assert task_b._unroll


def test_ensemble_rejects_already_injected_state(tmp_path):
    """A task whose opt_state is already in injected-hyperparams format
    (e.g. adopted from a sweep result without unwrap_opt_state) must be
    rejected with an actionable message, not a pytree-structure error
    deep inside the vmapped program (round-4 advisor finding)."""
    import optax

    from colvarsfinder_tpu.core.task import TrainingTask

    tasks = _make_tasks(tmp_path, "inj", n_replicas=2)
    inj_opt = TrainingTask.make_optimizer(tasks[1].optimizer_name)
    tasks[1].opt_state = TrainingTask.set_learning_rate(
        inj_opt.init(tasks[1].model), tasks[1].learning_rate
    )
    with pytest.raises(AssertionError, match="unwrap_opt_state"):
        train_replica_ensemble(tasks)
    # and unwrap_opt_state recovers the static-format state
    tasks[1].opt_state = TrainingTask.unwrap_opt_state(tasks[1].opt_state)
    train_replica_ensemble(tasks)
