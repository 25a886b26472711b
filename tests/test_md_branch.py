"""MD-branch tests with duck-typed MDAnalysis-like objects (MDAnalysis is
not installed in this environment; the contract is what matters:
reference utils.py:96-130)."""

import numpy as np
import pytest

from colvarsfinder_tpu.core import AutoEncoderTask
from colvarsfinder_tpu.models import AutoEncoder
from colvarsfinder_tpu.utils import WeightedTrajectory


class FakeTrajectory:
    def __init__(self, coords, dt_ps):
        self._coords = coords
        self.n_frames = coords.shape[0]
        self.dt = dt_ps
        self.time = 0.0
        self.totaltime = dt_ps * (coords.shape[0] - 1)

    def timeseries(self, order="fac"):
        assert order == "fac"
        return self._coords

    def __getitem__(self, i):
        class F:
            time = self.dt * i

        return F()


class FakeAtoms:
    def __init__(self, n):
        self.ix = np.arange(n)


class FakeUniverse:
    def __init__(self, coords, dt_ps):
        self.trajectory = FakeTrajectory(coords, dt_ps)
        self.atoms = FakeAtoms(coords.shape[1])


class FakeAtomGroup:
    def __init__(self, ix):
        self.ix = np.asarray(ix)


@pytest.fixture
def universe():
    rng = np.random.default_rng(0)
    coords = rng.standard_normal((50, 8, 3)).astype(np.float32)
    return FakeUniverse(coords, dt_ps=2.0)


def test_universe_branch_all_atoms(universe):
    traj = WeightedTrajectory(universe=universe, verbose=False)
    assert traj.trajectory.shape == (50, 8, 3)
    assert traj.n_frames == 50
    # ps -> ns conversion (reference utils.py:113)
    np.testing.assert_allclose(traj.dt, 2.0e-3)


def test_universe_branch_atom_subset(universe):
    ag = FakeAtomGroup([0, 2, 5])
    traj = WeightedTrajectory(universe=universe, input_ag=ag, verbose=False)
    assert traj.trajectory.shape == (50, 3, 3)
    np.testing.assert_allclose(
        traj.trajectory,
        universe.trajectory.timeseries("fac")[:, [0, 2, 5], :],
    )


def test_plot_class_hook(tmp_path):
    """The plot callback fires every plot_frequency epochs with the CV
    model (reference core.py:720-722)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 2)).astype(np.float32)
    traj = WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)

    calls = []

    class Plotter:
        def plot(self, cv_model, epoch):
            out = np.asarray(cv_model(x[:3]))
            calls.append((epoch, out.shape))

    model = AutoEncoder([2, 6, 1], [1, 6, 2], seed=0)
    task = AutoEncoderTask(
        traj, None, model, str(tmp_path / "m"), learning_rate=0.01,
        batch_size=16, num_epochs=4, test_ratio=0.25,
        save_model_every_step=0, plot_class=Plotter(), plot_frequency=2,
        verbose=False, tensorboard=False, seed=0,
    )
    task.train()
    assert [c[0] for c in calls] == [1, 3]
    assert all(c[1] == (3, 1) for c in calls)
