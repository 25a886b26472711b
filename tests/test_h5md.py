"""H5MD codec (utils/h5md.py): round-trips, timing conventions, group
selection, malformed inputs, Universe entry."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from colvarsfinder_tpu.utils import read_h5md, write_h5md


def _coords(n_frames=5, n_atoms=4, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_frames, n_atoms, 3)).astype(np.float32)


def test_round_trip(tmp_path):
    path = str(tmp_path / "t.h5")
    x = _coords()
    write_h5md(path, x, dt_ps=0.5)
    coords, dt, times = read_h5md(path)
    np.testing.assert_allclose(coords, x, atol=1e-6)
    assert dt == pytest.approx(0.5)
    np.testing.assert_allclose(times, np.arange(5) * 0.5)


def test_unit_scaling(tmp_path):
    path = str(tmp_path / "ang.h5")
    x = _coords(3, 2, seed=1)
    write_h5md(path, x, dt_ps=1.0, length_scale=10.0)  # Angstrom file
    back, _, _ = read_h5md(path, length_scale=0.1)
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_step_only_reports_no_timing(tmp_path):
    """A file with step counters but no time dataset reports dt=-1 (no
    timing info — the LAMMPS-dump convention)."""
    path = str(tmp_path / "steps.h5")
    x = _coords(4, 2)
    with h5py.File(path, "w") as f:
        pos = f.create_group("particles/all/position")
        pos.create_dataset("value", data=x)
        pos.create_dataset("step", data=np.arange(4) * 100)
    coords, dt, times = read_h5md(path)
    assert dt == -1.0
    np.testing.assert_allclose(times, np.arange(4) * 100)


def test_group_selection_and_errors(tmp_path):
    path = str(tmp_path / "multi.h5")
    xa, xb = _coords(2, 3, 2), _coords(2, 5, 3)
    with h5py.File(path, "w") as f:
        f.create_group("particles/a/position").create_dataset("value", data=xa)
        f.create_group("particles/b/position").create_dataset("value", data=xb)
    with pytest.raises(ValueError, match="pass group="):
        read_h5md(path)
    coords, _, _ = read_h5md(path, group="b")
    assert coords.shape == (2, 5, 3)
    with pytest.raises(ValueError, match="no particles group"):
        read_h5md(path, group="c")

    bad = str(tmp_path / "bad.h5")
    with h5py.File(bad, "w") as f:
        f.create_group("something_else")
    with pytest.raises(ValueError, match="not H5MD"):
        read_h5md(bad)

    uneven = str(tmp_path / "uneven.h5")
    with h5py.File(uneven, "w") as f:
        pos = f.create_group("particles/all/position")
        pos.create_dataset("value", data=_coords(3, 2))
        pos.create_dataset("time", data=np.array([0.0, 1.0, 3.0]))
    with pytest.raises(ValueError, match="uneven"):
        read_h5md(uneven)


def test_universe_entry(tmp_path):
    from colvarsfinder_tpu.utils import Topology, Universe, WeightedTrajectory
    from colvarsfinder_tpu.utils.io import write_gro

    x = _coords(6, 3, seed=4)
    top = Topology(names=["C1", "C2", "C3"], resids=[1] * 3,
                   resnames=["MOL"] * 3, positions=x[0])
    gro = str(tmp_path / "top.gro")
    write_gro(gro, top)
    trj = str(tmp_path / "run.h5")
    write_h5md(trj, x, dt_ps=2.0)
    u = Universe(gro, trj)
    assert u.trajectory.n_frames == 6
    assert u.trajectory.dt == pytest.approx(2.0)
    np.testing.assert_allclose(
        u.trajectory.timeseries(order="fac"), x, atol=1e-6
    )
    wt = WeightedTrajectory(universe=u, verbose=False)
    assert wt.n_frames == 6
