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
    1ACE   HH31    1   0.200   0.100  -0.000
    1ACE    CH3    2   0.200   0.209   0.000
    1ACE   HH32    3   0.149   0.245   0.089
    1ACE   HH33    4   0.149   0.245  -0.089
    1ACE      C    5   0.343   0.264  -0.000
    1ACE      O    6   0.439   0.188  -0.000
    2ALA      N    7   0.356   0.397  -0.000
    2ALA      H    8   0.273   0.456  -0.000
    2ALA     CA    9   0.485   0.461  -0.000
    2ALA     HA   10   0.541   0.432   0.089
    2ALA     CB   11   0.566   0.422  -0.123
    2ALA    HB1   12   0.512   0.452  -0.213
    2ALA    HB2   13   0.663   0.472  -0.121
    2ALA    HB3   14   0.581   0.314  -0.124
    2ALA      C   15   0.471   0.613   0.000
    2ALA      O   16   0.360   0.665   0.000
    3NME      N   17   0.585   0.683   0.000
    3NME      H   18   0.674   0.636  -0.000
    3NME    CH3   19   0.585   0.828   0.000
    3NME   HH31   20   0.482   0.865   0.000
    3NME   HH32   21   0.636   0.865   0.089
    3NME   HH33   22   0.636   0.865  -0.089
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
    np.testing.assert_allclose(top.positions[1], [0.200, 0.209, 0.000],
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
