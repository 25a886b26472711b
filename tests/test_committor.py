"""Committor task (core/committor.py): the learned q matches the analytic
1-D committor, respects the boundary conditions, and the task surface
(dataframes, checkpoints, CV export) behaves like the other tasks.

Oracle: for overdamped Langevin in 1-D, the committor between
A = (-inf, -a] and B = [b, inf) is

    q(x) = int_{-a}^{x} exp(beta V(s)) ds / int_{-a}^{b} exp(beta V(s)) ds

(the unique harmonic function of the generator with q(-a)=0, q(b)=1).
"""

import numpy as np
import pytest

from colvarsfinder_tpu import CommittorTask, create_sequential_nn
from colvarsfinder_tpu.utils import WeightedTrajectory, integrate_sde_overdamped

BETA = 2.0
A_EDGE, B_EDGE = -0.8, 0.8


def _V(x):
    return (x**2 - 1.0) ** 2


class DoubleWell1D:
    dim = 1
    beta = BETA

    def V(self, x):
        return (x[0] ** 2 - 1.0) ** 2


def _analytic_q(xs):
    grid = np.linspace(A_EDGE, B_EDGE, 4001)
    integrand = np.exp(BETA * _V(grid))
    cum = np.concatenate([[0.0], np.cumsum(
        0.5 * (integrand[1:] + integrand[:-1]) * np.diff(grid)
    )])
    q = np.interp(np.clip(xs, A_EDGE, B_EDGE), grid, cum / cum[-1])
    return q


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("committor"))
    frames, _ = integrate_sde_overdamped(
        DoubleWell1D(), n_steps=400_000, sampling_output_path=out,
        X0=np.array([1.0]), step_size=0.005, report_interval=10,
        pre_steps=2_000, seed=4, verbose=False,
    )
    traj = WeightedTrajectory(
        trajectory=frames.astype(np.float32), dt=0.05, verbose=False
    )
    model = create_sequential_nn([1, 20, 20, 1], seed=0)
    task = CommittorTask(
        traj, None, model, out,
        region_a=lambda X: X[:, 0] < A_EDGE,
        region_b=lambda X: X[:, 0] > B_EDGE,
        alpha=300.0, beta=BETA,
        learning_rate=0.005, batch_size=8_000, num_epochs=600,
        save_model_every_step=300, verbose=False, seed=0,
    )
    task.train()
    return task


def test_matches_analytic_committor(trained):
    xs = np.linspace(-0.75, 0.75, 41)
    q = trained.committor_values(xs[:, None].astype(np.float32))
    q_true = _analytic_q(xs)
    rmse = np.sqrt(np.mean((q - q_true) ** 2))
    assert rmse < 0.06, f"committor RMSE {rmse:.3f} vs analytic"
    # monotone increasing along the reaction coordinate
    assert (np.diff(q) > -0.01).all()


def test_boundary_conditions(trained):
    xa = np.linspace(-1.3, -0.85, 10)[:, None].astype(np.float32)
    xb = np.linspace(0.85, 1.3, 10)[:, None].astype(np.float32)
    assert trained.committor_values(xa).mean() < 0.08
    assert trained.committor_values(xb).mean() > 0.92


def test_task_surface(trained):
    df = trained.train_loss_df
    assert list(df.columns) == [
        "loss", "dirichlet", "boundary_a", "boundary_b"
    ]
    assert len(df) == 600
    # loss decreases substantially
    assert df["loss"].iloc[-1] < 0.3 * df["loss"].iloc[0]
    # logit CV and committor probabilities are consistent
    xs = np.array([[-0.5], [0.0], [0.5]], dtype=np.float32)
    cv = np.asarray(trained.colvar_model()(xs))[:, 0]
    q = trained.committor_values(xs)
    np.testing.assert_allclose(1.0 / (1.0 + np.exp(-cv)), q, atol=1e-6)


def test_region_validation(tmp_path):
    rng = np.random.default_rng(0)
    traj = WeightedTrajectory(
        trajectory=rng.standard_normal((100, 1)).astype(np.float32),
        dt=0.1, verbose=False,
    )
    model = create_sequential_nn([1, 8, 1], seed=1)
    mk = lambda **kw: CommittorTask(  # noqa: E731
        traj, None, model, str(tmp_path), verbose=False, **kw
    )
    with pytest.raises(ValueError, match="no trajectory frame"):
        mk(region_a=lambda X: X[:, 0] > 99.0, region_b=lambda X: X[:, 0] > 0)
    with pytest.raises(ValueError, match="overlap"):
        mk(region_a=lambda X: X[:, 0] > 0, region_b=lambda X: X[:, 0] > -1)
    with pytest.raises(ValueError, match="values for"):
        mk(region_a=np.zeros(5, bool), region_b=lambda X: X[:, 0] > 0)
    model2 = create_sequential_nn([1, 8, 2], seed=1)
    with pytest.raises(ValueError, match=r"\[B, 1\]"):
        CommittorTask(
            traj, None, model2, str(tmp_path),
            region_a=lambda X: X[:, 0] < -1, region_b=lambda X: X[:, 0] > 1,
            verbose=False,
        )

    import jax

    @jax.tree_util.register_pytree_node_class
    class SqueezedNet:
        """A [B]-output model (review fix: rank-1 outputs must be
        rejected at construction, not crash inside the jitted trace)."""

        def __call__(self, x):
            import jax.numpy as jnp

            return jnp.sum(x, axis=-1)  # [B]

        def tree_flatten(self):
            return (), None

        @classmethod
        def tree_unflatten(cls, aux, children):
            return cls()

    with pytest.raises(ValueError, match=r"\[B, 1\]"):
        CommittorTask(
            traj, None, SqueezedNet(), str(tmp_path),
            region_a=lambda X: X[:, 0] < -1, region_b=lambda X: X[:, 0] > 1,
            verbose=False,
        )


def test_precomputed_boolean_regions(tmp_path):
    """Regions as boolean arrays (e.g. from an MSM PCCA+ assignment)."""
    rng = np.random.default_rng(1)
    x = np.concatenate([
        rng.normal(-1, 0.1, 200), rng.normal(1, 0.1, 200),
        rng.normal(0, 0.3, 100),
    ])[:, None].astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)
    model = create_sequential_nn([1, 8, 1], seed=2)
    task = CommittorTask(
        traj, None, model, str(tmp_path),
        region_a=x[:, 0] < -0.5, region_b=x[:, 0] > 0.5,
        num_epochs=3, batch_size=100, save_model_every_step=0,
        verbose=False, seed=1,
    )
    task.train()
    assert np.isfinite(task.train_loss_df["loss"]).all()


def test_boundary_frames_must_reach_training(tmp_path):
    """Review fix: a region that survives globally but lands entirely in
    the test split (or the drop_last remainder) is rejected — otherwise
    its penalty is silently zero and q collapses."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((40, 1)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)
    model = create_sequential_nn([1, 8, 1], seed=0)
    task = CommittorTask(
        traj, None, model, str(tmp_path),
        region_a=np.arange(40) < 5, region_b=np.arange(40) >= 35,
        num_epochs=1, batch_size=8, verbose=False, seed=0,
    )
    # force a split whose training half contains no A frame
    task._make_split = lambda n: (np.arange(8, 40), np.arange(8))
    with pytest.raises(ValueError, match="training batches"):
        task._prepare_data()


def test_self_consistency_check(trained, tmp_path):
    """The trained committor passes analysis.committor_self_consistency
    (MSM committor of the q-bins reproduces the predicted labels), and a
    deliberately distorted coordinate fails it."""
    from colvarsfinder_tpu.analysis import committor_self_consistency

    frames, _ = integrate_sde_overdamped(
        DoubleWell1D(), n_steps=400_000, sampling_output_path=str(tmp_path),
        X0=np.array([1.0]), step_size=0.005, report_interval=10,
        pre_steps=2_000, seed=17, verbose=False,
    )
    x = frames.astype(np.float32)
    in_a = x[:, 0] < A_EDGE
    in_b = x[:, 0] > B_EDGE

    q_good = trained.committor_values(x)
    good = committor_self_consistency(q_good, in_a, in_b, lag=5, n_bins=10)
    assert good.max_deviation < 0.12, repr(good)

    # distorted coordinate: monotone in x (so naive ordering looks fine)
    # but with the transition shifted off the barrier — self-consistency
    # must flag it
    q_bad = 1.0 / (1.0 + np.exp(-8.0 * (x[:, 0] - 0.5)))
    bad = committor_self_consistency(q_bad, in_a, in_b, lag=5, n_bins=10)
    assert bad.max_deviation > 2 * good.max_deviation, (good, bad)

    with pytest.raises(ValueError, match="overlap"):
        committor_self_consistency(q_good, in_a, in_a, lag=5)
    with pytest.raises(ValueError, match="non-empty"):
        committor_self_consistency(
            q_good, np.zeros(len(x), bool), in_b, lag=5
        )


@pytest.mark.slow
def test_gram_path_matches_vjp_path(tmp_path):
    """The Gram Dirichlet path (pp input-jacobian precomputed per batch)
    trains identically to backpropagating through the preprocessing
    layer — on a molecular pp (Kabsch alignment + features), where the
    path actually pays off."""
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    rng = np.random.default_rng(0)
    base = rng.standard_normal((6, 3)).astype(np.float32)
    frames = base[None] + 0.15 * rng.standard_normal(
        (600, 6, 3)
    ).astype(np.float32)
    traj = WeightedTrajectory(
        trajectory=frames, weights=rng.uniform(0.5, 1.5, 600),
        dt=0.1, verbose=False,
    )
    align = AlignmentLayer(base[:4], align_indices=[0, 1, 2, 3])
    feat = FeatureLayer([
        Feature("p", "position", [0, 2]),
        Feature("d", "dihedral", [0, 1, 2, 3]),
    ])
    pp = PreprocessingANN(align, feat)

    x_proxy = frames[:, 0, 0]  # region definition on a raw coordinate
    kw = dict(
        region_a=x_proxy < np.quantile(x_proxy, 0.15),
        region_b=x_proxy > np.quantile(x_proxy, 0.85),
        alpha=50.0, beta=1.0, batch_size=200, num_epochs=4,
        save_model_every_step=0, verbose=False, seed=0,
    )

    def run(gram):
        model = create_sequential_nn([pp.output_dimension, 10, 1], seed=3)
        t = CommittorTask(
            traj, pp, model, str(tmp_path / f"g{gram}"),
            gram_pp=gram, **kw,
        )
        t.train()
        return t

    t_gram, t_vjp = run(True), run(False)
    assert t_gram._gram and not t_vjp._gram
    np.testing.assert_allclose(
        t_gram.train_loss_df.to_numpy(),
        t_vjp.train_loss_df.to_numpy(),
        rtol=2e-4, atol=1e-6,
    )
    # default: auto-on for a non-identity pp
    t_auto = CommittorTask(
        traj, pp, create_sequential_nn([pp.output_dimension, 10, 1], seed=3),
        str(tmp_path / "auto"), **kw,
    )
    t_auto._prepare_data()
    assert t_auto._gram


def test_streaming_matches_device_layout(tmp_path):
    """streaming=True (host/memmap-resident trajectory, just-in-time
    batch gathers) trains identically to the device-resident layout."""
    from numpy.lib.format import open_memmap

    rng = np.random.default_rng(5)
    x = rng.standard_normal((600, 2)).astype(np.float32)
    mm_path = str(tmp_path / "traj.npy")
    mm = open_memmap(mm_path, mode="w+", dtype=np.float32, shape=x.shape)
    mm[:] = x
    mm.flush()

    def run(traj_arr, streaming, tag):
        traj = WeightedTrajectory(trajectory=traj_arr, dt=0.1, verbose=False)
        t = CommittorTask(
            traj, None, create_sequential_nn([2, 8, 1], seed=0),
            str(tmp_path / tag),
            region_a=x[:, 0] < -0.8, region_b=x[:, 0] > 0.8,
            alpha=50.0, streaming=streaming, num_epochs=4, batch_size=100,
            save_model_every_step=0, verbose=False, seed=0,
        )
        t.train()
        return t

    t_dev = run(x, False, "dev")
    t_str = run(np.load(mm_path, mmap_mode="r"), True, "str")
    assert t_str._streaming and not t_dev._streaming
    # the streaming trajectory stays a memmap on the host
    assert isinstance(t_str._traj, np.memmap)
    np.testing.assert_allclose(
        t_str.train_loss_df.to_numpy(),
        t_dev.train_loss_df.to_numpy(),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        t_str.test_loss_df.to_numpy(),
        t_dev.test_loss_df.to_numpy(),
        rtol=1e-4, atol=1e-6,
    )


def test_committor_scan_layout_keeps_gram(tmp_path):
    """unroll_batches=False (stacked+scanned epoch body) keeps the Gram
    Dirichlet path active and matches the unrolled layout's training
    trajectory — layout uniformity with the eigen task (round-4)."""
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    rng = np.random.default_rng(2)
    base = rng.standard_normal((4, 3)).astype(np.float32)
    frames = base[None] + 0.15 * rng.standard_normal(
        (400, 4, 3)
    ).astype(np.float32)
    traj = WeightedTrajectory(
        trajectory=frames, weights=np.ones(400), dt=0.1, verbose=False,
    )
    pp = PreprocessingANN(
        AlignmentLayer(base, align_indices=[0, 1, 2, 3]),
        FeatureLayer([Feature("p", "position", [0, 1, 2, 3])]),
    )
    x_proxy = frames[:, 0, 0]
    kw = dict(
        region_a=x_proxy < np.quantile(x_proxy, 0.2),
        region_b=x_proxy > np.quantile(x_proxy, 0.8),
        alpha=50.0, beta=1.0, batch_size=100, num_epochs=3,
        save_model_every_step=0, verbose=False, seed=0,
    )
    results = {}
    for unroll in (True, False):
        t = CommittorTask(
            traj, pp,
            create_sequential_nn([pp.output_dimension, 8, 1], seed=3),
            str(tmp_path / f"scan{unroll}"), gram_pp=True,
            unroll_batches=unroll, **kw,
        )
        t.train()
        assert t._unroll == unroll
        assert t._gram
        results[unroll] = t.train_loss_df.to_numpy()
    np.testing.assert_allclose(
        results[True], results[False], rtol=5e-4, atol=1e-5
    )
