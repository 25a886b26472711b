"""LAMMPS dump codec (utils/lammps.py): round-trips, spatial-bin dump
order, scaled/unwrapped coordinate variants, unit scaling, and the
Universe entry point."""

import numpy as np
import pytest

from colvarsfinder_tpu.utils import (
    LAMMPSFrames,
    read_lammpstrj,
    write_lammpstrj,
)


def _coords(n_frames=5, n_atoms=7, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n_frames, n_atoms, 3)) * 0.4 + 1.0).astype(
        np.float64
    )


def test_round_trip(tmp_path):
    path = str(tmp_path / "t.lammpstrj")
    x = _coords()
    write_lammpstrj(path, x, steps=np.arange(5) * 100,
                    types=[1, 1, 2, 2, 3, 3, 3])
    coords, dt, times = read_lammpstrj(path, dt_ps=0.002)
    np.testing.assert_allclose(coords, x, rtol=0, atol=1e-6)
    assert dt == pytest.approx(100 * 0.002)
    np.testing.assert_allclose(times, np.arange(5) * 100 * 0.002)
    rec = read_lammpstrj(path, full=True)
    assert isinstance(rec, LAMMPSFrames)
    np.testing.assert_array_equal(rec.types, [1, 1, 2, 2, 3, 3, 3])
    np.testing.assert_array_equal(rec.ids, np.arange(1, 8))
    assert rec.box.shape == (5, 3, 2)


def test_unit_scaling_round_trip(tmp_path):
    """nm coords written as an Angstrom dump (units real) read back in
    nm with length_scale=0.1."""
    path = str(tmp_path / "real.lammpstrj")
    x = _coords(3, 4, seed=1)
    write_lammpstrj(path, x, length_scale=10.0)  # nm -> Angstrom
    # raw read is in Angstrom
    raw, _, _ = read_lammpstrj(path)
    np.testing.assert_allclose(raw, x * 10.0, atol=1e-5)
    back, _, _ = read_lammpstrj(path, length_scale=0.1)
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_spatial_bin_order_and_scaled_coords(tmp_path):
    """Hand-written dump: atoms out of id order (LAMMPS' default spatial
    binning) and scaled xs/ys/zs coordinates unscale through the box."""
    path = str(tmp_path / "hand.lammpstrj")
    with open(path, "w") as f:
        f.write(
            "ITEM: TIMESTEP\n0\n"
            "ITEM: NUMBER OF ATOMS\n3\n"
            "ITEM: BOX BOUNDS pp pp pp\n"
            "0.0 10.0\n0.0 20.0\n-5.0 5.0\n"
            "ITEM: ATOMS id type xs ys zs\n"
            "3 1 0.5 0.5 0.5\n"
            "1 2 0.0 0.25 1.0\n"
            "2 1 0.1 0.0 0.0\n"
        )
    coords, _, _ = read_lammpstrj(path)
    # sorted by id: atom 1, 2, 3; unscaled via lo + s * (hi - lo)
    np.testing.assert_allclose(
        coords[0],
        [[0.0, 5.0, 5.0], [1.0, 0.0, -5.0], [5.0, 10.0, 0.0]],
        atol=1e-6,
    )


def test_unwrapped_preferred_over_wrapped(tmp_path):
    path = str(tmp_path / "u.lammpstrj")
    with open(path, "w") as f:
        f.write(
            "ITEM: TIMESTEP\n0\n"
            "ITEM: NUMBER OF ATOMS\n1\n"
            "ITEM: BOX BOUNDS pp pp pp\n"
            "0 1\n0 1\n0 1\n"
            "ITEM: ATOMS id type x y z xu yu zu\n"
            "1 1 0.1 0.1 0.1 1.1 1.1 1.1\n"
        )
    coords, _, _ = read_lammpstrj(path)
    np.testing.assert_allclose(coords[0, 0], [1.1, 1.1, 1.1], atol=1e-6)


def test_malformed_inputs(tmp_path):
    x = _coords(3, 4)
    good = str(tmp_path / "g.lammpstrj")
    write_lammpstrj(good, x, steps=[0, 10, 25])
    with pytest.raises(ValueError, match="uneven"):
        read_lammpstrj(good)

    trunc = str(tmp_path / "t.lammpstrj")
    text = open(good).read().splitlines()
    with open(trunc, "w") as f:
        f.write("\n".join(text[:-2]) + "\n")
    with pytest.raises(ValueError, match="truncated"):
        read_lammpstrj(trunc)

    noid = str(tmp_path / "n.lammpstrj")
    with open(noid, "w") as f:
        f.write(
            "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n1\n"
            "ITEM: BOX BOUNDS pp pp pp\n0 1\n0 1\n0 1\n"
            "ITEM: ATOMS type x y z\n1 0 0 0\n"
        )
    with pytest.raises(ValueError, match="id column"):
        read_lammpstrj(noid)


def test_universe_entry(tmp_path):
    """Universe('top.gro', 'run.lammpstrj'): Angstrom dump -> nm coords,
    dt from dt_ps, WeightedTrajectory-ready."""
    from colvarsfinder_tpu.utils import Topology, Universe, WeightedTrajectory
    from colvarsfinder_tpu.utils.io import write_gro

    n_atoms = 4
    x_nm = _coords(6, n_atoms, seed=3)
    top = Topology(
        names=["C1", "O1", "N1", "C2"],
        resids=[1] * n_atoms,
        resnames=["MOL"] * n_atoms,
        positions=x_nm[0],
    )
    gro = str(tmp_path / "top.gro")
    write_gro(gro, top)
    trj = str(tmp_path / "run.lammpstrj")
    write_lammpstrj(trj, x_nm, length_scale=10.0)  # Angstrom dump

    u = Universe(gro, trj, dt_ps=2.0)
    assert u.trajectory.n_frames == 6
    assert u.trajectory.dt == pytest.approx(2.0)
    got = u.trajectory.timeseries(order="fac")
    np.testing.assert_allclose(got, x_nm, atol=1e-5)
    wt = WeightedTrajectory(universe=u, verbose=False)
    assert wt.n_frames == 6


def test_triclinic_guards(tmp_path):
    """Review fix: triclinic cells with scaled or wrapped+image-flag
    coordinates are refused (the orthogonal unscale/unwrap math would
    silently corrupt them); cartesian unwrapped columns still read."""
    hdr = (
        "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n1\n"
        "ITEM: BOX BOUNDS xy xz yz pp pp pp\n"
        "0 10 0.5\n0 10 0.2\n0 10 0.1\n"
    )
    bad = str(tmp_path / "tri_scaled.lammpstrj")
    with open(bad, "w") as f:
        f.write(hdr + "ITEM: ATOMS id type xs ys zs\n1 1 0.5 0.5 0.5\n")
    with pytest.raises(ValueError, match="triclinic"):
        read_lammpstrj(bad)

    bad2 = str(tmp_path / "tri_img.lammpstrj")
    with open(bad2, "w") as f:
        f.write(
            hdr + "ITEM: ATOMS id type x y z ix iy iz\n"
            "1 1 1.0 1.0 1.0 1 0 0\n"
        )
    with pytest.raises(ValueError, match="triclinic"):
        read_lammpstrj(bad2)

    ok = str(tmp_path / "tri_xu.lammpstrj")
    with open(ok, "w") as f:
        f.write(hdr + "ITEM: ATOMS id type xu yu zu\n1 1 11.0 2.0 3.0\n")
    coords, _, _ = read_lammpstrj(ok)
    np.testing.assert_allclose(coords[0, 0], [11.0, 2.0, 3.0], atol=1e-6)


def test_image_flags_unwrap(tmp_path):
    """Review fix: wrapped x y z + ix iy iz image flags unwrap through
    the (orthogonal) box so molecules stay whole."""
    path = str(tmp_path / "img.lammpstrj")
    with open(path, "w") as f:
        f.write(
            "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n2\n"
            "ITEM: BOX BOUNDS pp pp pp\n0 10\n0 20\n-5 5\n"
            "ITEM: ATOMS id type x y z ix iy iz\n"
            "1 1 9.5 1.0 4.0 0 0 0\n"
            "2 1 0.5 1.0 -4.0 1 0 1\n"
        )
    coords, _, _ = read_lammpstrj(path)
    np.testing.assert_allclose(coords[0, 0], [9.5, 1.0, 4.0], atol=1e-6)
    # atom 2 crossed +x and +z: 0.5 + 10, -4 + 10
    np.testing.assert_allclose(coords[0, 1], [10.5, 1.0, 6.0], atol=1e-6)


def test_midrow_truncation_detected(tmp_path):
    """Review fix: a frame cut mid-row raises the truncation error, not
    a ragged-array IndexError."""
    path = str(tmp_path / "rag.lammpstrj")
    with open(path, "w") as f:
        f.write(
            "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n2\n"
            "ITEM: BOX BOUNDS pp pp pp\n0 1\n0 1\n0 1\n"
            "ITEM: ATOMS id type x y z\n"
            "1 1 0.1 0.2 0.3\n"
            "2 1 0.4 0.5\n"  # cut mid-row
        )
    with pytest.raises(ValueError, match="truncated"):
        read_lammpstrj(path)


def test_universe_lammps_dt_semantics(tmp_path):
    """Review fix: LAMMPS TIMESTEP counters never masquerade as ps —
    without dt_ps the Universe falls back to the documented 1 ps default
    (dt <= 0 'no timing info' convention), and lammps files do not vote
    in the multi-file spacing check."""
    from colvarsfinder_tpu.utils import Topology, Universe
    from colvarsfinder_tpu.utils.io import write_gro

    x = _coords(4, 3, seed=5)
    top = Topology(names=["C1", "C2", "C3"], resids=[1] * 3,
                   resnames=["MOL"] * 3, positions=x[0])
    gro = str(tmp_path / "top.gro")
    write_gro(gro, top)
    trj = str(tmp_path / "run.lammpstrj")
    write_lammpstrj(trj, x, steps=np.arange(4) * 500, length_scale=10.0)
    u = Universe(gro, trj)  # no dt_ps
    assert u.trajectory.dt == pytest.approx(1.0)  # NOT 500
    u2 = Universe(gro, trj, dt_ps=2.5)
    assert u2.trajectory.dt == pytest.approx(2.5)
