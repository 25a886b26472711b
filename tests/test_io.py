"""Topology/trajectory IO tests: gro parsing, selections, DCD round-trip."""

import numpy as np
import pytest

from colvarsfinder_tpu.utils.io import (
    Topology,
    parse_gro,
    read_dcd,
    write_dcd,
)

GRO_TEXT = """Alanine dipeptide
   22
    1ACE   HH31    1   0.661   0.158   0.788
    1ACE    CH3    2   0.546  -0.359   0.963
    1ACE   HH32    3   0.642   0.679  -0.308
    1ACE   HH33    4   0.176   0.056   0.890
    1ACE      C    5   0.466   0.734   0.165
    1ACE      O    6  -0.159   0.332  -0.404
    2ALA      N    7   0.741   0.447   0.637
    2ALA      H    8   0.032   0.956   0.840
    2ALA     CA    9   0.668  -0.208   0.200
    2ALA     HA   10  -0.434  -0.269   0.525
    2ALA     CB   11   0.617   0.951  -0.011
    2ALA    HB1   12   0.056   0.204  -0.216
    2ALA    HB2   13  -0.305   0.214  -0.160
    2ALA    HB3   14   0.505   0.156   0.749
    2ALA      C   15   0.550  -0.031   0.748
    2ALA      O   16   0.707   0.081  -0.068
    3NME      N   17   0.524  -0.290  -0.200
    3NME      H   18  -0.489   0.680   0.497
    3NME    CH3   19   0.558   0.671   0.188
    3NME   HH31   20   0.353  -0.290  -0.328
    3NME   HH32   21   0.503   0.207   0.348
    3NME   HH33   22   0.647   0.452   0.330
   0.52510   0.76480   0.30210
"""


@pytest.fixture
def top(tmp_path):
    p = tmp_path / "top.gro"
    p.write_text(GRO_TEXT)
    return parse_gro(str(p))


def test_parse_gro_basic(top):
    assert top.n_atoms == 22
    assert top.names[0] == "HH31"
    assert top.names[8] == "CA"
    assert top.resnames[0] == "ACE"
    assert top.resids[-1] == 3
    np.testing.assert_allclose(top.positions[1], [0.546, -0.359, 0.963],
                               atol=1e-6)
    np.testing.assert_allclose(top.box, [0.5251, 0.7648, 0.3021], atol=1e-6)


def test_type_guessing(top):
    # HH31 -> H, CH3 -> C, N -> N, O -> O, CA -> C
    assert top.types[0] == "H"
    assert top.types[1] == "C"
    assert top.types[6] == "N"
    assert top.types[5] == "O"
    assert top.types[8] == "C"


def test_heavy_atom_selection(top):
    """The dipeptide workflow's selector (reference main.ipynb cell 10)
    must pick the 10 heavy atoms."""
    ag = top.select_atoms("type C or type O or type N")
    assert len(ag) == 10
    assert all(t in ("C", "O", "N") for t in ag.types)
    # equivalent via negation
    ag2 = top.select_atoms("not type H")
    np.testing.assert_array_equal(ag.ix, ag2.ix)


def test_selection_combinators(top):
    assert len(top.select_atoms("all")) == 22
    assert len(top.select_atoms("resid 2")) == 10
    assert len(top.select_atoms("resid 1:2")) == 16
    assert len(top.select_atoms("name CA")) == 1
    assert len(top.select_atoms("resname ALA and type C")) == 3
    assert len(top.select_atoms("(type O) or (name CA)")) == 3
    assert len(top.select_atoms("index 0:4")) == 5
    with pytest.raises(ValueError):
        top.select_atoms("bogus XX")


def test_indices_within(top):
    heavy = top.select_atoms("type C or type O or type N")
    backbone_c = top.select_atoms("name C")
    rel = backbone_c.indices_within(heavy)
    # positions of the two 'C' atoms within the heavy-atom list
    assert [heavy.names[i] for i in rel] == ["C", "C"]


def test_dcd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    coords = rng.standard_normal((5, 22, 3)).astype(np.float32)
    path = str(tmp_path / "traj.dcd")
    write_dcd(path, coords, dt_ps=2.0)
    back, dt = read_dcd(path)
    np.testing.assert_allclose(back, coords, atol=1e-6)
    np.testing.assert_allclose(dt, 2.0, rtol=1e-5)


def test_example_notebooks_are_valid():
    """Notebook JSON loads and every code cell compiles."""
    import json
    import os

    nb_dir = os.path.join(os.path.dirname(__file__), "..", "examples")
    found = 0
    for name in os.listdir(nb_dir):
        if not name.endswith(".ipynb"):
            continue
        found += 1
        nb = json.load(open(os.path.join(nb_dir, name)))
        assert nb["nbformat"] == 4
        for cell in nb["cells"]:
            if cell["cell_type"] == "code":
                compile("".join(cell["source"]), name, "exec")
    assert found >= 2


def test_universe_xtc_end_to_end(tmp_path):
    """Native Universe (gro + xtc) must drive WeightedTrajectory's MD
    branch exactly like an MDAnalysis Universe (reference main.ipynb
    cell 2 -> utils.py:96-130)."""
    from colvarsfinder_tpu.utils import Universe, WeightedTrajectory
    from colvarsfinder_tpu.utils.xtc import write_xtc

    gro = tmp_path / "top.gro"
    gro.write_text(GRO_TEXT)
    rng = np.random.default_rng(0)
    coords = np.cumsum(
        rng.normal(0, 0.01, (15, 22, 3)), axis=0
    ).astype(np.float32) + 1.0
    xtc = str(tmp_path / "md_center.xtc")
    write_xtc(xtc, coords, dt_ps=10.0)

    u = Universe(str(gro), xtc)
    assert u.trajectory.n_frames == 15
    assert abs(u.trajectory.dt - 10.0) < 1e-4
    # topology box exposed for FeatureLayer(box=u.box)
    np.testing.assert_allclose(u.box, (0.5251, 0.7648, 0.3021), rtol=1e-5)

    heavy = u.select_atoms("type C or type O or type N")
    traj = WeightedTrajectory(universe=u, input_ag=heavy, verbose=False)
    assert traj.trajectory.shape == (15, 10, 3)
    assert abs(traj.dt - 0.01) < 1e-9  # ps -> ns conversion
    np.testing.assert_allclose(
        traj.trajectory, coords[:, heavy.ix, :], atol=6e-4
    )


def test_universe_dcd_and_errors(tmp_path):
    from colvarsfinder_tpu.utils import Universe

    gro = tmp_path / "top.gro"
    gro.write_text(GRO_TEXT)
    coords = np.zeros((3, 22, 3), dtype=np.float32)
    dcd = str(tmp_path / "t.dcd")
    write_dcd(dcd, coords, dt_ps=2.0)
    u = Universe(str(gro), dcd)
    assert u.trajectory.n_frames == 3 and abs(u.trajectory.dt - 2.0) < 1e-4

    # topology-only: single frame from the gro coordinates
    u1 = Universe(str(gro))
    assert u1.trajectory.n_frames == 1
    assert u1.trajectory.timeseries().shape == (1, 22, 3)

    with pytest.raises(ValueError, match="unsupported trajectory format"):
        Universe(str(gro), str(tmp_path / "t.pdb"))

    # atom-count mismatch
    bad = str(tmp_path / "bad.dcd")
    write_dcd(bad, np.zeros((2, 5, 3), np.float32))
    with pytest.raises(ValueError, match="atoms"):
        Universe(str(gro), bad)

    with pytest.raises(ValueError, match="order"):
        u.trajectory.timeseries(order="afc")


def test_gro_write_read_roundtrip(tmp_path, top):
    from colvarsfinder_tpu.utils.io import write_gro

    out = str(tmp_path / "rt.gro")
    write_gro(out, top)
    back = parse_gro(out)
    assert back.names == top.names
    assert back.resids == top.resids
    assert back.resnames == top.resnames
    np.testing.assert_allclose(back.positions, top.positions, atol=5e-4)
    np.testing.assert_allclose(back.box, top.box, atol=1e-5)


def test_write_gro_overflow_handling(tmp_path):
    """Serials/resids wrap mod 100000 (GROMACS convention); out-of-range
    coordinates raise instead of corrupting the fixed columns."""
    from colvarsfinder_tpu.utils.io import write_gro

    top = Topology(
        names=["C"] * 3, resids=[1, 99999, 100001], resnames=["X"] * 3,
        positions=np.array([[0.1, 0.2, 0.3]] * 3, np.float32),
    )
    out = str(tmp_path / "wrap.gro")
    write_gro(out, top)
    back = parse_gro(out)
    assert back.resids == [1, 99999, 1]  # 100001 wrapped

    top_bad = Topology(
        names=["C"], resids=[1], resnames=["X"],
        positions=np.array([[20000.0, 0, 0]], np.float32),
    )
    with pytest.raises(ValueError, match="fixed-width"):
        write_gro(str(tmp_path / "bad.gro"), top_bad)


def test_universe_multi_file_trajectories(tmp_path):
    """A list of trajectory files (mixed formats) concatenates with
    source boundaries that WeightedTrajectory propagates into its
    lagged-pair bookkeeping."""
    from colvarsfinder_tpu.utils import Universe, WeightedTrajectory
    from colvarsfinder_tpu.utils.io import write_dcd
    from colvarsfinder_tpu.utils.xtc import write_xtc

    gro = tmp_path / "top.gro"
    gro.write_text(GRO_TEXT)
    rng = np.random.default_rng(1)
    a = (np.cumsum(rng.normal(0, 0.01, (8, 22, 3)), axis=0) + 1.0).astype(
        np.float32
    )
    b = (np.cumsum(rng.normal(0, 0.01, (5, 22, 3)), axis=0) + 1.0).astype(
        np.float32
    )
    f1 = str(tmp_path / "run1.xtc")
    f2 = str(tmp_path / "run2.dcd")
    write_xtc(f1, a, dt_ps=10.0)
    write_dcd(f2, b, dt_ps=10.0)

    u = Universe(str(gro), [f1, f2])
    assert u.trajectory.n_frames == 13
    np.testing.assert_array_equal(u.trajectory.segment_starts, [0, 8])

    traj = WeightedTrajectory(universe=u, verbose=False)
    np.testing.assert_array_equal(traj.segment_starts, [0, 8])
    # lag-2 pairs: 6 in the first file + 3 in the second, none spanning
    starts = traj.valid_lagged_starts(2)
    assert len(starts) == 6 + 3
    assert 6 not in starts and 7 not in starts

    # weight filtering remaps the boundaries to surviving frames
    w = np.ones(13)
    w[:3] = 100.0  # ~4.2 after mean-1 normalization -> filtered by max_w
    t2 = WeightedTrajectory(universe=u, weights=w, max_w=2.0, verbose=False)
    assert t2.n_frames == 10
    np.testing.assert_array_equal(t2.segment_starts, [0, 5])


def test_universe_multi_file_dt_mismatch(tmp_path):
    from colvarsfinder_tpu.utils import Universe
    from colvarsfinder_tpu.utils.xtc import write_xtc

    gro = tmp_path / "top.gro"
    gro.write_text(GRO_TEXT)
    x = np.ones((4, 22, 3), np.float32)
    f1, f2 = str(tmp_path / "a.xtc"), str(tmp_path / "b.xtc")
    write_xtc(f1, x, dt_ps=10.0)
    write_xtc(f2, x, dt_ps=20.0)
    with pytest.raises(ValueError, match="frame spacing"):
        Universe(str(gro), [f1, f2])
    # explicit dt_ps overrides the disagreement
    u = Universe(str(gro), [f1, f2], dt_ps=10.0)
    assert u.trajectory.n_frames == 8
