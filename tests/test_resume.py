"""Full training-state checkpoint/resume (extension beyond the reference,
whose restart loses optimizer state; reference core.py:156-161)."""

import numpy as np

from colvarsfinder_tpu.core import AutoEncoderTask
from colvarsfinder_tpu.models import AutoEncoder
from colvarsfinder_tpu.utils import WeightedTrajectory


def _traj():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((128, 2)).astype(np.float32)
    return WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)


def _kw(tmp_path, name, epochs):
    return dict(
        model_path=str(tmp_path / name), learning_rate=0.01, batch_size=32,
        num_epochs=epochs, test_ratio=0.25, save_model_every_step=0,
        verbose=False, tensorboard=False, seed=0,
    )


def test_resume_continues_exactly(tmp_path):
    traj = _traj()

    # run 4 epochs straight through
    m_full = AutoEncoder([2, 8, 1], [1, 8, 2], seed=1)
    t_full = AutoEncoderTask(traj, None, m_full, **_kw(tmp_path, "full", 4))
    t_full.train()

    # run 2 epochs, checkpoint full state, resume into a fresh task for 2
    m_a = AutoEncoder([2, 8, 1], [1, 8, 2], seed=1)
    t_a = AutoEncoderTask(traj, None, m_a, **_kw(tmp_path, "a", 2))
    t_a.train()
    ckpt = str(tmp_path / "state.npz")
    t_a.save_training_state(2, ckpt)

    m_b = AutoEncoder([2, 8, 1], [1, 8, 2], seed=99)  # different init
    t_b = AutoEncoderTask(traj, None, m_b, **_kw(tmp_path, "b", 2))
    epoch = t_b.load_training_state(ckpt)
    assert epoch == 2
    t_b.train()

    # identical final parameters: optimizer moments were restored too
    np.testing.assert_allclose(
        np.asarray(t_b.model.encoder.params[0]["weight"]),
        np.asarray(t_full.model.encoder.params[0]["weight"]),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        t_b.train_loss_df["loss"].to_numpy(),
        t_full.train_loss_df["loss"].to_numpy()[2:],
        rtol=1e-5,
    )


def test_resume_committor_task(tmp_path):
    """Full-state resume covers the committor family too (same optimizer
    moments => identical continuation)."""
    from colvarsfinder_tpu import CommittorTask, create_sequential_nn

    traj = _traj()
    x0 = traj.trajectory[:, 0]
    regions = dict(region_a=x0 < -0.8, region_b=x0 > 0.8)

    t_full = CommittorTask(
        traj, None, create_sequential_nn([2, 8, 1], seed=1),
        **regions, alpha=50.0, **_kw(tmp_path, "cfull", 4),
    )
    t_full.train()

    t_a = CommittorTask(
        traj, None, create_sequential_nn([2, 8, 1], seed=1),
        **regions, alpha=50.0, **_kw(tmp_path, "ca", 2),
    )
    t_a.train()
    ckpt = str(tmp_path / "cstate.npz")
    t_a.save_training_state(2, ckpt)

    t_b = CommittorTask(
        traj, None, create_sequential_nn([2, 8, 1], seed=99),
        **regions, alpha=50.0, **_kw(tmp_path, "cb", 2),
    )
    assert t_b.load_training_state(ckpt) == 2
    t_b.train()
    np.testing.assert_allclose(
        t_b.train_loss_df["loss"].to_numpy(),
        t_full.train_loss_df["loss"].to_numpy()[2:],
        rtol=1e-5,
    )


def test_orbax_backend_sharded_round_trip(tmp_path):
    """Orbax checkpoint backend: sharded leaves restore WITH their
    sharding (no host gather), replicated and scalar leaves round-trip.
    TPU-ecosystem interop alternative to the npz path."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from colvarsfinder_tpu.checkpoint import load_orbax, save_orbax

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("r",))
    sh = NamedSharding(mesh, P("r"))
    rep = NamedSharding(mesh, P())
    n = len(devs)
    state = {
        "w": jax.device_put(
            jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4), sh
        ),
        "b": jax.device_put(jnp.ones(3), rep),
        "epoch": np.int64(17),
    }
    ck = str(tmp_path / "ck")
    save_orbax(state, ck)

    tmpl = {
        "w": jax.device_put(jnp.zeros((n, 4), jnp.float32), sh),
        "b": jax.device_put(jnp.zeros(3), rep),
        "epoch": np.int64(0),
    }
    back = load_orbax(tmpl, ck)
    np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(state["w"]))
    np.testing.assert_array_equal(np.asarray(back["b"]), np.ones(3))
    assert int(back["epoch"]) == 17
    assert back["w"].sharding.is_equivalent_to(sh, 2)


def test_orbax_backend_task_state(tmp_path):
    """A task's full training state (params + optimizer pytree) survives
    an orbax round trip into a differently-initialized template."""
    import jax

    from colvarsfinder_tpu.checkpoint import load_orbax, save_orbax

    traj = _traj()
    m_a = AutoEncoder([2, 8, 1], [1, 8, 2], seed=1)
    t_a = AutoEncoderTask(traj, None, m_a, **_kw(tmp_path, "oa", 2))
    t_a.train()
    state = {"model": t_a.model, "opt": t_a.opt_state}
    ck = str(tmp_path / "ock")
    save_orbax(state, ck)

    m_b = AutoEncoder([2, 8, 1], [1, 8, 2], seed=99)
    t_b = AutoEncoderTask(traj, None, m_b, **_kw(tmp_path, "ob", 2))
    back = load_orbax({"model": t_b.model, "opt": t_b.opt_state}, ck)
    got = jax.tree_util.tree_leaves(back["model"])
    want = jax.tree_util.tree_leaves(t_a.model)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
