"""STREAMING data layout: host/memmap-resident trajectories larger than
HBM, trained via per-batch host gathers + just-in-time device_put
(TrainingTask._stream_epochs). The layout must be arithmetically
equivalent to the in-memory layouts — same split, same batch schedule,
same loss/optimizer math — so every test here is an equivalence test
against the default path on small data.
"""

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
from colvarsfinder_tpu.ops.features import Identity
from colvarsfinder_tpu.utils import WeightedTrajectory

N, D = 600, 4


@pytest.fixture(scope="module")
def traj():
    rng = np.random.default_rng(11)
    x = rng.normal(size=(N, D)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, N)
    w /= w.mean()
    return WeightedTrajectory(trajectory=x, weights=w, dt=0.1, verbose=False)


def _common(tmp_path, name, **over):
    kw = dict(
        model_path=str(tmp_path / name),
        learning_rate=0.01,
        batch_size=64,
        num_epochs=4,
        save_model_every_step=0,
        verbose=False,
        seed=3,
        tensorboard=False,
        export_cv=False,
    )
    kw.update(over)
    return kw


def _losses(task):
    task.train()
    return np.asarray(task.train_loss_df["loss"]), np.asarray(
        task.test_loss_df["loss"]
    )


# ---------------------------------------------------------------- eigen
def _eigen_task(traj, tmp_path, name, **over):
    model = EigenFunctions([D, 12, 1], k=2, seed=5)
    kw = _common(tmp_path, name, **over)
    return EigenFunctionTask(
        traj, Identity(), model, alpha=1.0, eig_weights=[1.0, 0.7],
        k=2, **kw,
    )


def test_eigen_transfer_streaming_matches_inmemory(traj, tmp_path):
    tr0, te0 = _losses(_eigen_task(traj, tmp_path, "e0", lag_tau=0.3))
    t1 = _eigen_task(traj, tmp_path, "e1", lag_tau=0.3, streaming=True)
    assert t1._streaming and t1._prebatch
    tr1, te1 = _losses(t1)
    np.testing.assert_allclose(tr0, tr1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(te0, te1, rtol=1e-5, atol=1e-6)


def test_eigen_generator_streaming_matches_inmemory(traj, tmp_path):
    # the in-memory generator defaults to the Gram path; streaming uses
    # the vjp path — mathematically identical, so losses must agree
    tr0, _ = _losses(_eigen_task(traj, tmp_path, "g0", lag_tau=0.0))
    t1 = _eigen_task(traj, tmp_path, "g1", lag_tau=0.0, streaming=True)
    tr1, _ = _losses(t1)
    assert not t1._gram
    np.testing.assert_allclose(tr0, tr1, rtol=1e-4, atol=1e-5)


def test_eigen_streaming_precompute_features(traj, tmp_path):
    class Double:
        def __call__(self, x):
            return x * 2.0

    def mk(stream):
        model = EigenFunctions([D, 12, 1], k=1, seed=5)
        return EigenFunctionTask(
            traj, Double(), model, alpha=1.0, eig_weights=[1.0],
            k=1, lag_tau=0.3, precompute_features=True, streaming=stream,
            **_common(tmp_path, f"pc{stream}"),
        )

    tr0, _ = _losses(mk(False))
    task = mk(True)
    # the chunked feature pass replaced the whole-array device call
    assert task._traj_np.shape == (N, D)
    tr1, _ = _losses(task)
    np.testing.assert_allclose(tr0, tr1, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------------- ae
def test_ae_streaming_matches_inmemory(traj, tmp_path):
    def mk(stream):
        return AutoEncoderTask(
            traj, None, AutoEncoder([D, 12, 1], [1, 12, D], seed=5),
            streaming=stream, **_common(tmp_path, f"ae{stream}"),
        )

    tr0, te0 = _losses(mk(False))
    t1 = mk(True)
    assert t1._streaming
    tr1, te1 = _losses(t1)
    np.testing.assert_allclose(tr0, tr1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(te0, te1, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- regae
@pytest.mark.slow
def test_regae_streaming_matches_inmemory(traj, tmp_path):
    def mk(stream):
        model = RegAutoEncoder([D, 10, 2], [2, 10, D], [2, 8, 1], K=1,
                               seed=5)
        return RegAutoEncoderTask(
            traj, Identity(), model, eig_weights=[1.0], alpha=1.0,
            gamma=(0.4, 0.1), eta=(0.1, 0.1, 0.1), lag_tau_ae=0.3,
            lag_tau_reg=0.3, streaming=stream,
            **_common(tmp_path, f"rae{stream}"),
        )

    tr0, te0 = _losses(mk(False))
    t1 = mk(True)
    assert t1._streaming
    tr1, te1 = _losses(t1)
    np.testing.assert_allclose(tr0, tr1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(te0, te1, rtol=1e-5, atol=1e-6)


# ------------------------------------------------- auto-trigger / guards
def test_streaming_auto_triggers_above_limit(traj, tmp_path, monkeypatch):
    monkeypatch.setattr(EigenFunctionTask, "STREAMING_AUTO_LIMIT_BYTES", 1)
    task = _eigen_task(traj, tmp_path, "auto", lag_tau=0.3)
    assert task._streaming
    tr, _ = _losses(task)
    assert np.all(np.isfinite(tr))


def test_streaming_rejects_prebatch_false(traj, tmp_path):
    with pytest.raises(AssertionError, match="prebatch"):
        _eigen_task(
            traj, tmp_path, "bad", lag_tau=0.3, streaming=True,
            prebatch=False,
        )


def test_streaming_with_mesh_matches_single_device(traj, tmp_path):
    """Round 5: explicit streaming=True composes with a mesh — each
    host-streamed batch is sharded along its batch axis and the step
    runs SPMD. Losses must equal the single-device streaming run."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    tr0, te0 = _losses(
        _eigen_task(traj, tmp_path, "smm0", lag_tau=0.3, streaming=True)
    )
    t1 = _eigen_task(
        traj, tmp_path, "smm1", lag_tau=0.3, streaming=True, mesh=mesh,
    )
    tr1, te1 = _losses(t1)
    np.testing.assert_allclose(tr0, tr1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(te0, te1, rtol=1e-5, atol=1e-6)

    # shard_trajectory (device-resident frame sharding) still excludes
    # streaming — they are alternative >HBM strategies
    with pytest.raises(AssertionError, match="shard_trajectory"):
        _eigen_task(
            traj, tmp_path, "smm2", lag_tau=0.3, streaming=True,
            mesh=mesh, shard_trajectory=True,
        )

    # batch size must divide the mesh for the sharded batch axis
    with pytest.raises(AssertionError, match="divisible"):
        _eigen_task(
            traj, tmp_path, "smm3", lag_tau=0.3, streaming=True,
            mesh=mesh, batch_size=63,
        )


# ------------------------------------------------------------- memmap
def test_streaming_on_memmap_trajectory(traj, tmp_path):
    """End-to-end disk-resident path: the trajectory lives in an .npy
    memmap, WeightedTrajectory + the task never copy it, and streaming
    training matches the in-memory run."""
    from numpy.lib.format import open_memmap

    path = str(tmp_path / "traj.npy")
    mm = open_memmap(path, mode="w+", dtype=np.float32, shape=(N, D))
    mm[:] = np.asarray(traj.trajectory, dtype=np.float32)
    mm.flush()
    del mm

    mm = np.load(path, mmap_mode="r")
    tobj = WeightedTrajectory(
        trajectory=mm, weights=np.asarray(traj.weights), dt=0.1,
        verbose=False,
    )
    # the all-kept weight filter must not materialize the memmap
    assert isinstance(tobj.trajectory, np.memmap)

    t1 = _eigen_task(tobj, tmp_path, "mm1", lag_tau=0.3, streaming=True)
    # the task must hold a view of the mapped file, not a RAM copy
    assert np.shares_memory(t1._traj_np, tobj.trajectory)
    tr1, _ = _losses(t1)

    tr0, _ = _losses(_eigen_task(traj, tmp_path, "mm0", lag_tau=0.3))
    np.testing.assert_allclose(tr0, tr1, rtol=1e-5, atol=1e-6)


def test_chunked_apply_matches_direct():
    from colvarsfinder_tpu.core.task import TrainingTask

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1000, 3)).astype(np.float32)
    fn = lambda a: a * 2.0 + 1.0  # noqa: E731
    out = TrainingTask._chunked_apply(fn, x, chunk=256)
    np.testing.assert_allclose(out, x * 2.0 + 1.0, rtol=1e-6)


# ----------------------------------------------------- prefetch pipeline
def test_stream_prefetch_depths_identical(traj, tmp_path):
    """The three-stage prefetch pipeline (round-5: gather thread ->
    transfer thread -> dispatch) must be a pure latency optimization:
    depth 0 (fully synchronous), 1, and the default 2 produce identical
    loss trajectories."""
    runs = {}
    for depth in (0, 1, 2):
        t = _eigen_task(
            traj, tmp_path, f"pf{depth}", lag_tau=0.3, streaming=True
        )
        t.stream_prefetch = depth
        runs[depth] = _losses(t)
    for depth in (1, 2):
        np.testing.assert_array_equal(runs[0][0], runs[depth][0])
        np.testing.assert_array_equal(runs[0][1], runs[depth][1])


def test_stream_prefetch_propagates_pack_errors(traj, tmp_path):
    """An exception in the background gather thread must surface in the
    caller, not hang the queue pipeline."""
    t = _eigen_task(traj, tmp_path, "pferr", lag_tau=0.3, streaming=True)

    def boom(rows):
        raise RuntimeError("pack exploded")

    t._stream_pack = boom
    with pytest.raises(RuntimeError, match="pack exploded"):
        t.train()


def test_stream_wire_dtype_f16(traj, tmp_path):
    """Opt-in float16 H2D wire format: halves bandwidth on a wire-bound
    link; inputs round to ~1e-3 relative, so losses track the f32 run
    closely but not bitwise."""
    tr0, _ = _losses(
        _eigen_task(traj, tmp_path, "wire0", lag_tau=0.3, streaming=True)
    )
    t1 = _eigen_task(traj, tmp_path, "wire1", lag_tau=0.3, streaming=True)
    t1.stream_wire_dtype = "float16"
    tr1, _ = _losses(t1)
    assert np.isfinite(tr1).all()
    np.testing.assert_allclose(tr1, tr0, rtol=0.05, atol=1e-3)
    assert not np.array_equal(tr1, tr0)  # it really went through f16
