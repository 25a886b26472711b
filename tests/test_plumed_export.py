"""PLUMED deployment writers (colvarsfinder_tpu.deploy_plumed).

PLUMED itself is not installed here, so these tests *simulate* the PLUMED
side: a minimal interpreter evaluates the emitted DISTANCE / ANGLE /
TORSION / POSITION / CUSTOM action lines with independent numpy geometry
(standard IUPAC conventions, the ones PLUMED implements) and drives the
exported TorchScript model exactly like PLUMED's PYTORCH_MODEL action does
(a [1, n_args] float32 tensor with requires_grad). The chain must reproduce
the saved numpy-CV artifact's values — which pins the ARG ordering, the
atom-numbering convention, and the unit handling all at once.

Reference counterpart: the TorchScript deployment artifact + PlumedForce
wiring (reference colvarsfinder/core.py:212-227, utils.py:220-223).
"""

import os
import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from colvarsfinder_tpu import ColvarModel, save_numpy_cv
from colvarsfinder_tpu.deploy import load_numpy_cv
from colvarsfinder_tpu.deploy_plumed import (
    write_plumed_cv,
    write_plumed_metad,
)
from colvarsfinder_tpu.models import EigenFunctions, create_sequential_nn
from colvarsfinder_tpu.ops import (
    AlignmentLayer,
    Feature,
    FeatureLayer,
    PreprocessingANN,
    coordination_pairs,
)


# ---------------------------------------------------------------------------
# independent geometry (what PLUMED computes for each action)
# ---------------------------------------------------------------------------


def _mic(d, box):
    if box is None:
        return d
    box = np.asarray(box)
    return d - box * np.round(d / box)


def _distance(x, a, b, box=None):
    return float(np.linalg.norm(_mic(x[b] - x[a], box)))


def _angle(x, a, b, c):
    u, v = x[a] - x[b], x[c] - x[b]
    cosv = u @ v / (np.linalg.norm(u) * np.linalg.norm(v))
    return float(np.arccos(np.clip(cosv, -1.0, 1.0)))


def _torsion(x, a, b, c, d):
    b1, b2, b3 = x[b] - x[a], x[c] - x[b], x[d] - x[c]
    n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
    m1 = np.cross(n1, b2 / np.linalg.norm(b2))
    return float(np.arctan2(m1 @ n2, n1 @ n2))


def _rational(r, r0, d0, nn, mm):
    """PLUMED's RATIONAL switching function (manual, independent impl)."""
    xx = max(0.0, (r - d0) / r0)
    if abs(xx - 1.0) < 1e-12:
        return nn / mm
    return (1.0 - xx**nn) / (1.0 - xx**mm)


def _coordination(x, ga, gb, pair, r0, d0, nn, mm, box=None):
    """PLUMED COORDINATION: sum of switch values over GROUPA x GROUPB
    (zipped when PAIR, all cross pairs excluding self otherwise)."""
    if pair:
        pairs = list(zip(ga, gb))
    else:
        pairs = [(i, j) for i in ga for j in gb if i != j]
    return float(
        sum(
            _rational(
                np.linalg.norm(_mic(x[j] - x[i], box)), r0, d0, nn, mm
            )
            for i, j in pairs
        )
    )


def _run_plumed_lines(lines, coords_nm, model_dir, box=None):
    """Evaluate the emitted PLUMED actions on one frame [N, 3] (nm),
    returning the PYTORCH_MODEL output components as a 1-D array.
    ``box``: the engine's live box (nm) — applied by PLUMED (so here) to
    distance-type actions NOT marked NOPBC."""
    values = {}
    for ln in lines:
        if ln.startswith("#") or not ln.strip():
            continue
        label, rest = ln.split(":", 1)
        label, rest = label.strip(), rest.strip()
        action = rest.split()[0]
        act_box = None if " NOPBC" in f" {rest}" else box
        if action in ("DISTANCE", "ANGLE", "TORSION", "POSITION"):
            key = "ATOMS" if action != "POSITION" else "ATOM"
            serials = [
                int(s) - 1
                for s in re.search(rf"{key}=(\S+)", rest).group(1).split(",")
            ]
            if action == "DISTANCE":
                values[label] = _distance(coords_nm, *serials, box=act_box)
            elif action == "ANGLE":
                values[label] = _angle(coords_nm, *serials)
            elif action == "TORSION":
                values[label] = _torsion(coords_nm, *serials)
            else:
                for k, axis in zip(("x", "y", "z"), range(3)):
                    values[f"{label}.{k}"] = float(coords_nm[serials[0], axis])
        elif action == "COORDINATION":
            ga = [
                int(s) - 1
                for s in re.search(r"GROUPA=(\S+)", rest).group(1).split(",")
            ]
            gb = [
                int(s) - 1
                for s in re.search(r"GROUPB=(\S+)", rest).group(1).split(",")
            ]
            m = re.search(
                r"SWITCH=\{RATIONAL R_0=(\S+) D_0=(\S+) NN=(\d+) MM=(\d+)\}",
                rest,
            )
            assert m, f"malformed SWITCH in {rest!r}"
            r0, d0 = float(m.group(1)), float(m.group(2))
            nn, mm = int(m.group(3)), int(m.group(4))
            pair = re.search(r"\bPAIR\b", rest) is not None
            values[label] = _coordination(
                coords_nm, ga, gb, pair, r0, d0, nn, mm, box=act_box
            )
        elif action == "CUSTOM":
            arg = re.search(r"ARG=(\S+)", rest).group(1)
            func = re.search(r"FUNC=(\S+)", rest).group(1)
            v = values[arg]
            if func == "cos(x)":
                values[label] = np.cos(v)
            elif func == "sin(x)":
                values[label] = np.sin(v)
            elif re.fullmatch(r"x\*[-0-9.eE+]+", func):
                values[label] = v * float(func[2:])
            else:
                raise AssertionError(f"unexpected FUNC {func}")
        elif action == "PYTORCH_MODEL":
            fname = re.search(r"FILE=(\S+)", rest).group(1)
            args = re.search(r"ARG=(\S+)", rest).group(1).split(",")
            mod = torch.jit.load(os.path.join(model_dir, fname))
            # PLUMED's PytorchModel feeds [1, n_in] float32 w/ requires_grad
            t = torch.tensor(
                [[values[a] for a in args]],
                dtype=torch.float32,
                requires_grad=True,
            )
            out = mod(t)
            assert out.shape[0] == 1
            # the force path: every component must be differentiable
            g = torch.autograd.grad(out.sum(), t)[0]
            assert torch.isfinite(g).all()
            out_d = out.detach()
            for i in range(out.shape[1]):
                values[f"{label}.node-{i}"] = float(out_d[0, i])
        else:
            raise AssertionError(f"unexpected action {action}")
    return values


def _frame(n_atoms=8, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_atoms, 3)).astype(np.float32)


def _feature_cv(k_heads=None, seed=3):
    feat = FeatureLayer(
        [
            Feature("phi", "dihedral", [0, 1, 2, 3]),
            Feature("ang", "angle", [1, 2, 3]),
            Feature("b", "bond", [0, 4]),
            Feature("psi", "dihedral_rad", [1, 2, 3, 4]),
            Feature("angr", "angle_rad", [0, 2, 4]),
        ]
    )
    pp = PreprocessingANN(None, feat)
    d_r = pp.output_dimension
    if k_heads:
        head = EigenFunctions([d_r, 10, 1], k_heads, seed=seed)
    else:
        head = create_sequential_nn([d_r, 10, 2], seed=seed)
    return ColvarModel(pp, head)


# ---------------------------------------------------------------------------
# feature mode
# ---------------------------------------------------------------------------


def test_feature_mode_matches_numpy_cv(tmp_path):
    cv = _feature_cv()
    save_numpy_cv(cv, str(tmp_path))
    out = write_plumed_cv(str(tmp_path))
    assert out.mode == "features"
    assert out.components == ["cv.node-0", "cv.node-1"]
    # dihedral -> cos+sin args, angle -> cos wrapper, bond plain, rad plain
    assert out.arg_names == [
        "cvf0_cos", "cvf0_sin", "cvf1", "cvf2", "cvf3", "cvf4",
    ]
    text = open(out.dat_path).read()
    assert "cvf0_t: TORSION ATOMS=1,2,3,4 NOPBC" in text
    assert "cvf1_t: ANGLE ATOMS=2,3,4 NOPBC" in text
    assert "cvf2: DISTANCE ATOMS=1,5 NOPBC" in text
    assert "cvf3: TORSION ATOMS=2,3,4,5 NOPBC" in text
    assert "cvf4: ANGLE ATOMS=1,3,5 NOPBC" in text

    x = _frame()
    values = _run_plumed_lines(out.lines, x, str(tmp_path))
    got = np.array([values[c] for c in out.components])
    want = np.asarray(load_numpy_cv(str(tmp_path))(x))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_feature_mode_stacked_heads(tmp_path):
    cv = _feature_cv(k_heads=3)
    save_numpy_cv(cv, str(tmp_path))
    out = write_plumed_cv(str(tmp_path), label="dtica")
    assert out.components == [f"dtica.node-{i}" for i in range(3)]
    x = _frame(seed=5)
    values = _run_plumed_lines(out.lines, x, str(tmp_path))
    got = np.array([values[c] for c in out.components])
    want = np.asarray(load_numpy_cv(str(tmp_path))(x))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_atoms_selection_remap(tmp_path):
    """Relative feature indices map through the training atom selection to
    1-based global PLUMED serials."""
    cv = _feature_cv()
    save_numpy_cv(cv, str(tmp_path))
    sel = np.array([2, 5, 7, 9, 11])  # global 0-based, like AtomGroup.ix
    out = write_plumed_cv(str(tmp_path), atoms=sel)
    text = open(out.dat_path).read()
    assert "TORSION ATOMS=3,6,8,10 NOPBC" in text  # (0,1,2,3) -> sel+1
    assert "DISTANCE ATOMS=3,12 NOPBC" in text  # (0,4)


def test_atoms_selection_out_of_range(tmp_path):
    cv = _feature_cv()
    save_numpy_cv(cv, str(tmp_path))
    with pytest.raises(ValueError, match="out of range"):
        write_plumed_cv(str(tmp_path), atoms=[0, 1, 2])


def test_length_scale_rescales_distances(tmp_path):
    """An Angstrom-trained CV biased from nm-fed PLUMED: distances get a
    CUSTOM x*10 wrapper; angles/dihedrals are untouched; the chain matches
    the artifact evaluated on the Angstrom coordinates."""
    cv = _feature_cv(seed=11)
    save_numpy_cv(cv, str(tmp_path))
    out = write_plumed_cv(str(tmp_path), length_scale=10.0)
    text = open(out.dat_path).read()
    assert "cvf2_nm: DISTANCE ATOMS=1,5 NOPBC" in text
    assert "cvf2: CUSTOM ARG=cvf2_nm FUNC=x*10 PERIODIC=NO" in text

    x_ang = _frame(seed=7) * 3.0  # "training" coordinates in Angstrom
    values = _run_plumed_lines(out.lines, x_ang / 10.0, str(tmp_path))
    got = np.array([values[c] for c in out.components])
    want = np.asarray(load_numpy_cv(str(tmp_path))(x_ang))
    np.testing.assert_allclose(got, want, atol=5e-6)


def _switch_cv(seed=5):
    feat = FeatureLayer(
        [
            Feature("c", "contact", [0, 4], params={"r0": 1.5}),
            Feature(
                "cn",
                "coordination",
                coordination_pairs([0, 1], [5, 6, 7]),
                params={"r0": 1.2, "d0": 0.2, "nn": 4, "mm": 10},
            ),
            Feature("b", "bond", [0, 4]),
        ]
    )
    pp = PreprocessingANN(None, feat)
    head = create_sequential_nn([pp.output_dimension, 8, 2], seed=seed)
    return ColvarModel(pp, head)


def test_feature_mode_switch_features(tmp_path):
    """contact -> COORDINATION with single-atom groups, coordination ->
    COORDINATION ... PAIR over the zipped pair list; the simulated-PLUMED
    chain (independent RATIONAL implementation) reproduces the artifact."""
    cv = _switch_cv()
    save_numpy_cv(cv, str(tmp_path))
    out = write_plumed_cv(str(tmp_path))
    assert out.mode == "features"
    text = open(out.dat_path).read()
    assert (
        "cvf0: COORDINATION GROUPA=1 GROUPB=5 "
        "SWITCH={RATIONAL R_0=1.5 D_0=0 NN=6 MM=12} NOPBC"
    ) in text
    assert (
        "cvf1: COORDINATION GROUPA=1,1,1,2,2,2 GROUPB=6,7,8,6,7,8 PAIR "
        "SWITCH={RATIONAL R_0=1.2 D_0=0.2 NN=4 MM=10} NOPBC"
    ) in text

    x = _frame()
    values = _run_plumed_lines(out.lines, x, str(tmp_path))
    got = np.array([values[c] for c in out.components])
    want = np.asarray(load_numpy_cv(str(tmp_path))(x))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_switch_features_length_scale(tmp_path):
    """R_0/D_0 are re-expressed in nm under length_scale so the switching
    value is unit-invariant: Angstrom-trained switch params against nm
    coordinates still match the artifact on Angstrom coordinates."""
    cv = _switch_cv(seed=13)
    save_numpy_cv(cv, str(tmp_path))
    out = write_plumed_cv(str(tmp_path), length_scale=10.0)
    text = open(out.dat_path).read()
    assert "R_0=0.15 D_0=0" in text  # 1.5 Angstrom -> 0.15 nm
    assert "R_0=0.12 D_0=0.02" in text

    x_ang = _frame(seed=7) * 3.0
    values = _run_plumed_lines(out.lines, x_ang / 10.0, str(tmp_path))
    got = np.array([values[c] for c in out.components])
    want = np.asarray(load_numpy_cv(str(tmp_path))(x_ang))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_pbc_feature_mode(tmp_path):
    """A FeatureLayer with a minimum-image box emits DISTANCE/COORDINATION
    WITHOUT NOPBC (the engine's live box applies — simulated here with
    the training box), while angle/torsion actions stay NOPBC. The chain
    reproduces the artifact on WRAPPED coordinates."""
    box = (2.0, 2.5, 3.0)
    feat = FeatureLayer(
        [
            Feature("c", "contact", [0, 1], params={"r0": 0.3}),
            Feature("b", "bond", [0, 1]),
            Feature("ang", "angle", [0, 2, 3]),
        ],
        box=box,
    )
    pp = PreprocessingANN(None, feat)
    head = create_sequential_nn([pp.output_dimension, 8, 2], seed=5)
    cv = ColvarModel(pp, head)
    save_numpy_cv(cv, str(tmp_path))
    out = write_plumed_cv(str(tmp_path))
    text = open(out.dat_path).read()
    assert (
        "cvf0: COORDINATION GROUPA=1 GROUPB=2 "
        "SWITCH={RATIONAL R_0=0.3 D_0=0 NN=6 MM=12}\n"
    ) in text  # no NOPBC
    assert "cvf1: DISTANCE ATOMS=1,2\n" in text  # no NOPBC
    assert "ANGLE ATOMS=1,3,4 NOPBC" in text  # angles stay NOPBC

    # wrapped frame: pair (0, 1) crosses the x face
    x = np.abs(_frame(n_atoms=4, seed=3)) % 1.5
    x[1, 0] = 1.95
    x[0, 0] = 0.05
    values = _run_plumed_lines(out.lines, x, str(tmp_path), box=box)
    got = np.array([values[c] for c in out.components])
    want = np.asarray(load_numpy_cv(str(tmp_path))(x))
    np.testing.assert_allclose(got, want, atol=5e-6)


# ---------------------------------------------------------------------------
# positions mode
# ---------------------------------------------------------------------------


def _aligned_cv(seed=9):
    base = _frame(n_atoms=7, seed=100)
    align = AlignmentLayer(base[:5], align_indices=list(range(5)))
    feat = FeatureLayer(
        [
            Feature("pos", "position", [0, 2, 6]),
            Feature("b", "bond", [1, 3]),
        ]
    )
    pp = PreprocessingANN(align, feat)
    head = create_sequential_nn([pp.output_dimension, 8, 2], seed=seed)
    return ColvarModel(pp, head)


def test_positions_mode_matches_numpy_cv(tmp_path):
    cv = _aligned_cv()
    save_numpy_cv(cv, str(tmp_path))
    out = write_plumed_cv(str(tmp_path))
    assert out.mode == "positions"
    # max referenced atom index is 6 -> 7 atoms, 21 args
    assert len(out.arg_names) == 21
    assert out.arg_names[:4] == ["cvp0.x", "cvp0.y", "cvp0.z", "cvp1.x"]
    text = open(out.dat_path).read()
    assert "cvp6: POSITION ATOM=7 NOPBC" in text

    x = _frame(n_atoms=7, seed=13)
    values = _run_plumed_lines(out.lines, x, str(tmp_path))
    got = np.array([values[c] for c in out.components])
    want = np.asarray(load_numpy_cv(str(tmp_path))(x))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_positions_mode_explicit_n_atoms_and_scale(tmp_path):
    cv = _aligned_cv(seed=21)
    save_numpy_cv(cv, str(tmp_path))
    out = write_plumed_cv(str(tmp_path), n_atoms=9, length_scale=10.0)
    assert len(out.arg_names) == 27
    x_ang = _frame(n_atoms=9, seed=23) * 2.0
    values = _run_plumed_lines(out.lines, x_ang / 10.0, str(tmp_path))
    got = np.array([values[c] for c in out.components])
    want = np.asarray(load_numpy_cv(str(tmp_path))(x_ang))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_feature_mode_refused_for_aligned_cv(tmp_path):
    cv = _aligned_cv()
    save_numpy_cv(cv, str(tmp_path))
    with pytest.raises(ValueError, match="pure feature-map"):
        write_plumed_cv(str(tmp_path), mode="features")


# ---------------------------------------------------------------------------
# metadynamics input
# ---------------------------------------------------------------------------


def test_metad_input(tmp_path):
    cv = _feature_cv()
    save_numpy_cv(cv, str(tmp_path))
    out = write_plumed_metad(
        str(tmp_path),
        sigma=0.1,
        height=1.2,
        pace=250,
        biasfactor=8.0,
        temp=300.0,
        grid_min=[-1.5, -2.0],
        grid_max=2.0,
        grid_bin=200,
        extra_lines=["UPPER_WALLS ARG=cv.node-0 AT=3.0 KAPPA=100 LABEL=wall"],
    )
    assert os.path.basename(out.dat_path) == "plumed.dat"
    text = open(out.dat_path).read()
    assert "ARG=cv.node-0,cv.node-1" in text
    assert "SIGMA=0.1,0.1" in text
    assert "HEIGHT=1.2 PACE=250" in text
    assert "BIASFACTOR=8 TEMP=300" in text
    assert "GRID_MIN=-1.5,-2" in text and "GRID_MAX=2,2" in text
    assert "GRID_BIN=200,200" in text
    assert "UPPER_WALLS ARG=cv.node-0" in text
    assert (
        "PRINT ARG=cv.node-0,cv.node-1,metad.bias STRIDE=100 FILE=COLVAR"
        in text
    )
    # the CV fragment is embedded (the file is self-contained)
    assert "PYTORCH_MODEL FILE=plumed_cv_model.pt" in text
    # and the standalone fragment still exists for composition
    assert os.path.exists(os.path.join(str(tmp_path), "plumed_cv.dat"))


def test_metad_wt_requires_temp(tmp_path):
    cv = _feature_cv()
    save_numpy_cv(cv, str(tmp_path))
    with pytest.raises(ValueError, match="temp"):
        write_plumed_metad(str(tmp_path), sigma=0.1, height=1.0, biasfactor=5.0)


def test_metad_sigma_count_mismatch(tmp_path):
    cv = _feature_cv()
    save_numpy_cv(cv, str(tmp_path))
    with pytest.raises(ValueError, match="sigma"):
        write_plumed_metad(str(tmp_path), sigma=[0.1, 0.2, 0.3], height=1.0)


def test_unknown_mode_rejected(tmp_path):
    cv = _feature_cv()
    save_numpy_cv(cv, str(tmp_path))
    with pytest.raises(ValueError, match="'features' or 'positions'"):
        write_plumed_cv(str(tmp_path), mode="feature")
