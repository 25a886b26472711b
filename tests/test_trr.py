"""TRR codec: round-trips, byte-level header golden (the trnio layout of
libxdrfile — magic 1993, '13/12/GMX_trn_file' version string, 13-int size
block, t/lambda, box/x/v/f arrays), precision handling, and the
Universe/WeightedTrajectory integration."""

import struct

import numpy as np
import pytest

from colvarsfinder_tpu.utils import (
    TRRFrames,
    Universe,
    WeightedTrajectory,
    read_trr,
    scan_trr,
    write_trr,
)
from colvarsfinder_tpu.utils.trr import TRR_MAGIC


def _coords(n=6, atoms=5, seed=0):
    rng = np.random.default_rng(seed)
    return np.cumsum(
        rng.normal(0, 0.1, (n, atoms, 3)), axis=0
    ).astype(np.float32) + 1.5


def test_roundtrip_f32(tmp_path):
    x = _coords()
    path = str(tmp_path / "t.trr")
    write_trr(path, x, dt_ps=2.0)
    coords, dt, times = read_trr(path)
    # float32 reals: lossless round-trip
    np.testing.assert_array_equal(coords, x)
    assert dt == 2.0
    np.testing.assert_allclose(times, 2.0 * np.arange(6), atol=1e-5)
    assert scan_trr(path) == (6, 5)


def test_roundtrip_double(tmp_path):
    x = _coords().astype(np.float64)
    path = str(tmp_path / "d.trr")
    write_trr(path, x, dt_ps=0.5, double=True)
    full = read_trr(path, full=True)
    assert full.coords.dtype == np.float64
    np.testing.assert_array_equal(full.coords, x)
    np.testing.assert_allclose(full.times, 0.5 * np.arange(6), atol=1e-12)


def test_velocities_forces_box_roundtrip(tmp_path):
    x = _coords(seed=1)
    v = _coords(seed=2) * 0.1
    frc = _coords(seed=3) * 10.0
    box = np.asarray([4.0, 5.0, 6.0])
    path = str(tmp_path / "vf.trr")
    write_trr(path, x, dt_ps=1.0, velocities=v, forces=frc, box=box,
              step_interval=100)
    full = read_trr(path, full=True)
    assert isinstance(full, TRRFrames)
    np.testing.assert_array_equal(full.coords, x)
    np.testing.assert_array_equal(full.velocities, v)
    np.testing.assert_array_equal(full.forces, frc)
    np.testing.assert_allclose(full.boxes[0], np.diag(box), atol=0)
    np.testing.assert_array_equal(
        full.steps, 100 * np.arange(6)
    )
    assert np.all(full.lambdas == 0.0)


def test_header_golden_bytes(tmp_path):
    """Pin the on-disk layout against the published trnio format so a
    codec regression cannot silently re-define the format: magic 1993,
    version-string lengths 13/12, 'GMX_trn_file', the seven aux sizes,
    x/v/f sizes, natoms, step, nre, then float32 t."""
    x = np.zeros((1, 2, 3), np.float32)
    path = str(tmp_path / "g.trr")
    write_trr(path, x, dt_ps=4.0, t0_ps=8.0, box=np.ones(3))
    with open(path, "rb") as f:
        data = f.read()

    magic, slen, vlen = struct.unpack_from(">iii", data, 0)
    assert (magic, slen, vlen) == (TRR_MAGIC, 13, 12)
    assert data[12:24] == b"GMX_trn_file"
    ints = struct.unpack_from(">13i", data, 24)
    # ir, e, box, vir, pres, top, sym, x, v, f, natoms, step, nre
    assert ints == (0, 0, 36, 0, 0, 0, 0, 24, 0, 0, 2, 0, 0)
    (t,) = struct.unpack_from(">f", data, 24 + 52)
    assert t == 8.0
    # total frame size: header 84 + box 36 + coords 24
    assert len(data) == 84 + 36 + 24


def test_bad_magic_raises(tmp_path):
    path = str(tmp_path / "bad.trr")
    with open(path, "wb") as f:
        f.write(struct.pack(">iii", 1234, 13, 12) + b"GMX_trn_file")
    with pytest.raises(ValueError, match="magic"):
        read_trr(path)


def test_truncated_raises(tmp_path):
    x = _coords()
    path = str(tmp_path / "t.trr")
    write_trr(path, x, dt_ps=1.0)
    with open(path, "rb") as f:
        data = f.read()
    with open(path, "wb") as f:
        f.write(data[:-10])
    with pytest.raises(ValueError, match="truncated|array size"):
        read_trr(path)


def test_universe_reads_trr(tmp_path):
    from colvarsfinder_tpu.utils.io import Topology, write_gro

    x = _coords(n=4, atoms=3)
    top = Topology(
        names=["CA", "CB", "O"], resids=[1, 1, 1],
        resnames=["ALA"] * 3, positions=x[0],
    )
    gro = str(tmp_path / "top.gro")
    write_gro(gro, top)
    trr = str(tmp_path / "traj.trr")
    write_trr(trr, x, dt_ps=2.0)

    u = Universe(gro, trr)
    assert u.trajectory.n_frames == 4
    assert u.trajectory.dt == 2.0
    wt = WeightedTrajectory(universe=u, verbose=False)
    assert wt.trajectory.shape == (4, 3, 3)
    assert np.isclose(wt.dt, 2.0e-3)  # ps -> ns


def test_universe_reads_pdb_topology(tmp_path):
    from colvarsfinder_tpu.utils import parse_pdb

    pdb = str(tmp_path / "top.pdb")
    with open(pdb, "w") as f:
        f.write("TITLE     test peptide\n")
        f.write("CRYST1   40.000   50.000   60.000  90.00  90.00  90.00 "
                "P 1           1\n")
        f.write("ATOM      1  N   ALA A   1      11.104   6.134  -6.504"
                "  1.00  0.00           N\n")
        f.write("ATOM      2  CA  ALA A   1      11.639   6.071  -5.147"
                "  1.00  0.00           C\n")
        f.write("HETATM    3  O   HOH A   2       2.000   3.000   4.000"
                "  1.00  0.00           O\n")
        f.write("END\n")
    top = parse_pdb(pdb)
    assert top.names == ["N", "CA", "O"]
    assert top.resnames == ["ALA", "ALA", "HOH"]
    assert top.resids == [1, 1, 2]
    # Å -> nm
    np.testing.assert_allclose(top.positions[0], [1.1104, 0.6134, -0.6504],
                               atol=1e-6)
    np.testing.assert_allclose(top.box, [4.0, 5.0, 6.0], atol=1e-6)
    assert top.title == "test peptide"
    assert top.select_atoms("type C").names == ["CA"]

    x = np.repeat(top.positions[None], 3, axis=0)
    trr = str(tmp_path / "traj.trr")
    write_trr(trr, x, dt_ps=1.0)
    u = Universe(pdb, trr)
    assert u.trajectory.n_frames == 3
    assert u.select_atoms("resname ALA").names == ["N", "CA"]
