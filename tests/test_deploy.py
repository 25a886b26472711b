"""Numpy-only CV deployment artifact (colvarsfinder_tpu.deploy).

The reference's deployment interface is a TorchScript CV module evaluable
without the model-building code (reference: colvarsfinder/core.py:212-227).
These tests check the numpy-spec equivalent: save -> load -> evaluate
matches the live JAX model, including from a process that never imports
JAX.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from colvarsfinder_tpu import (
    ColvarModel,
    export_colvar,
    load_numpy_cv,
    save_numpy_cv,
)
from colvarsfinder_tpu.deploy import eval_spec
from colvarsfinder_tpu.models import (
    AutoEncoder,
    EigenFunctions,
    RegAutoEncoder,
    RegModel,
    create_sequential_nn,
)
from colvarsfinder_tpu.ops import (
    AlignmentLayer,
    Feature,
    FeatureLayer,
    Identity,
    Lambda,
    PreprocessingANN,
)


def _coords(n_frames=7, n_atoms=10, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_atoms, 3)).astype(np.float32)
    wig = 0.1 * rng.standard_normal((n_frames, n_atoms, 3)).astype(np.float32)
    return base[None] + wig, base


def test_identity_mlp_roundtrip(tmp_path):
    head = create_sequential_nn([4, 16, 2], seed=3)
    cv = ColvarModel(Identity(), head)
    save_numpy_cv(cv, str(tmp_path))
    f = load_numpy_cv(str(tmp_path))
    x = np.random.default_rng(1).standard_normal((5, 4)).astype(np.float32)
    np.testing.assert_allclose(f(x), np.asarray(cv(x)), rtol=0, atol=2e-6)
    # single-state squeeze
    np.testing.assert_allclose(f(x[0]), np.asarray(cv(x[0])), atol=2e-6)


def test_full_molecular_pipeline_roundtrip(tmp_path):
    x, base = _coords()
    align = AlignmentLayer(base[:6], align_indices=list(range(6)))
    feat = FeatureLayer(
        [
            Feature("pos", "position", [0, 2, 4]),
            Feature("phi", "dihedral", [0, 1, 2, 3]),
            Feature("ang", "angle", [1, 2, 3]),
            Feature("angr", "angle_rad", [2, 3, 4]),
            Feature("b", "bond", [5, 6]),
            Feature("dr", "dihedral_rad", [3, 4, 5, 6]),
        ]
    )
    pp = PreprocessingANN(align, feat)
    d_r = pp.output_dimension
    head = EigenFunctions([d_r, 20, 20, 1], 2, seed=5)
    cv = ColvarModel(pp, head)
    save_numpy_cv(cv, str(tmp_path))
    f = load_numpy_cv(str(tmp_path))
    np.testing.assert_allclose(f(x), np.asarray(cv(x)), rtol=0, atol=1e-5)
    # single frame
    np.testing.assert_allclose(f(x[0]), np.asarray(cv(x[0])), atol=1e-5)


def test_mass_weighted_alignment_roundtrip(tmp_path):
    """The numpy deployment artifact must carry and apply align_weights."""
    x, base = _coords()
    masses = np.linspace(1.0, 16.0, 6).astype(np.float32)
    align = AlignmentLayer(
        base[:6], align_indices=list(range(6)), align_weights=masses
    )
    feat = FeatureLayer([Feature("p", "position", [0, 2, 4])])
    head = create_sequential_nn([9, 8, 2], seed=1)
    cv = ColvarModel(PreprocessingANN(align, feat), head)
    save_numpy_cv(cv, str(tmp_path))
    f = load_numpy_cv(str(tmp_path))
    np.testing.assert_allclose(f(x), np.asarray(cv(x)), atol=5e-5)
    # sanity: weighted differs from the unweighted pipeline
    cv_u = ColvarModel(
        PreprocessingANN(
            AlignmentLayer(base[:6], align_indices=list(range(6))), feat
        ),
        head,
    )
    assert np.abs(np.asarray(cv(x)) - np.asarray(cv_u(x))).max() > 1e-4


def test_autoencoder_and_regmodel_nodes(tmp_path):
    ae = AutoEncoder([6, 10, 2], [2, 10, 6], seed=0)
    x = np.random.default_rng(0).standard_normal((4, 6)).astype(np.float32)
    save_numpy_cv(ColvarModel(Identity(), ae), str(tmp_path / "ae"))
    f = load_numpy_cv(str(tmp_path / "ae"))
    np.testing.assert_allclose(f(x), np.asarray(ae(x)), atol=2e-6)

    rae = RegAutoEncoder([6, 10, 2], [2, 10, 6], [2, 8, 1], K=3, seed=1)
    rm = RegModel(rae, [2, 0, 1])
    save_numpy_cv(ColvarModel(Identity(), rm), str(tmp_path / "rm"))
    f = load_numpy_cv(str(tmp_path / "rm"))
    np.testing.assert_allclose(f(x), np.asarray(rm(x)), atol=2e-6)


def test_lambda_pp_layer_rejected(tmp_path):
    head = create_sequential_nn([2, 4, 1], seed=0)
    cv = ColvarModel(Lambda(lambda x: x * 2.0), head)
    with pytest.raises(TypeError, match="StableHLO"):
        save_numpy_cv(cv, str(tmp_path))


def test_export_colvar_writes_numpy_artifact(tmp_path):
    head = create_sequential_nn([3, 8, 1], seed=2)
    cv = ColvarModel(Identity(), head)
    x = np.zeros((2, 3), np.float32)
    export_colvar(cv, x, str(tmp_path), write_stablehlo=False)
    assert os.path.exists(tmp_path / "cv_numpy_spec.json")
    f = load_numpy_cv(str(tmp_path))
    np.testing.assert_allclose(f(x), np.asarray(cv(x)), atol=2e-6)


def test_evaluator_runs_without_jax(tmp_path):
    """The deployment half must work in a process that never imports JAX."""
    x, base = _coords(n_frames=3)
    align = AlignmentLayer(base[:5], align_indices=list(range(5)))
    feat = FeatureLayer([Feature("p", "position", [0, 1, 2])])
    head = create_sequential_nn([9, 8, 1], seed=7)
    cv = ColvarModel(PreprocessingANN(align, feat), head)
    save_numpy_cv(cv, str(tmp_path))
    expected = np.asarray(cv(x))
    np.save(tmp_path / "x.npy", x)
    np.save(tmp_path / "expected.npy", expected)

    script = f"""
import sys
sys.path.insert(0, {str(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))!r})
import numpy as np
# import ONLY the deploy module file, not the package (which pulls in jax)
import importlib.util
spec = importlib.util.spec_from_file_location(
    "deploy_standalone",
    {str(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "colvarsfinder_tpu", "deploy.py"))!r},
)
deploy = importlib.util.module_from_spec(spec)
spec.loader.exec_module(deploy)
f = deploy.load_numpy_cv({str(tmp_path)!r})
x = np.load({str(tmp_path / "x.npy")!r})
expected = np.load({str(tmp_path / "expected.npy")!r})
out = f(x)
assert np.allclose(out, expected, atol=1e-5), (out, expected)
assert "jax" not in sys.modules, "deploy evaluation must not import jax"
print("OK")
"""
    env = dict(os.environ)
    env.pop("PYTHONSTARTUP", None)
    # the session's sitecustomize hook imports jax into every interpreter;
    # strip it so the subprocess is a genuinely JAX-less consumer
    env["PYTHONPATH"] = ""
    res = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    assert res.returncode == 0, res.stderr
    assert "OK" in res.stdout


def test_spec_is_json_serializable_and_versioned(tmp_path):
    head = create_sequential_nn([2, 4, 1], seed=0)
    save_numpy_cv(ColvarModel(Identity(), head), str(tmp_path))
    with open(tmp_path / "cv_numpy_spec.json") as f:
        spec = json.load(f)
    assert spec["format"] == "colvarsfinder-tpu-cv-numpy/1"
    assert spec["state_ndim"] == 1
    assert spec["graph"]["kind"] == "compose"


# ---------------------------------------------------------------------------
# gradient (force) path: the numpy artifact must provide dCV/dx, the way the
# reference's TorchScript artifact provides autograd to MD-engine consumers
# (reference: colvarsfinder/core.py:212-227)
# ---------------------------------------------------------------------------


def _molecular_cv(base, seed=5, weighted=False):
    masses = np.linspace(1.0, 16.0, 6).astype(np.float32)
    align = AlignmentLayer(
        base[:6], align_indices=list(range(6)),
        align_weights=masses if weighted else None,
    )
    feat = FeatureLayer(
        [
            Feature("pos", "position", [0, 2, 4]),
            Feature("phi", "dihedral", [0, 1, 2, 3]),
            Feature("ang", "angle", [1, 2, 3]),
            Feature("angr", "angle_rad", [2, 3, 4]),
            Feature("b", "bond", [5, 6]),
            Feature("dr", "dihedral_rad", [3, 4, 5, 6]),
        ]
    )
    pp = PreprocessingANN(align, feat)
    head = EigenFunctions([pp.output_dimension, 16, 1], 2, seed=seed)
    return ColvarModel(pp, head)


@pytest.mark.parametrize("weighted", [False, True])
def test_grad_matches_jax_jacobian(tmp_path, weighted):
    import jax

    x, base = _coords(n_frames=4)
    cv = _molecular_cv(base, weighted=weighted)
    save_numpy_cv(cv, str(tmp_path))
    f = load_numpy_cv(str(tmp_path), with_grad=True)
    val, jac = f(x)
    np.testing.assert_allclose(val, np.asarray(cv(x)), atol=1e-5)
    oracle = jax.vmap(jax.jacrev(lambda s: cv(s[None])[0]))(x)
    np.testing.assert_allclose(jac, np.asarray(oracle), atol=2e-4)
    # single-state squeeze: (K,), (K, N, 3)
    v1, j1 = f(x[0])
    assert v1.shape == (2,) and j1.shape == (2,) + x.shape[1:]
    np.testing.assert_allclose(j1, jac[0], atol=1e-12)


def test_switch_features_value_and_grad(tmp_path):
    """contact/coordination features through the numpy artifact: values and
    Jacobian vs the live jax model."""
    import jax

    from colvarsfinder_tpu.ops import coordination_pairs

    x, base = _coords(n_frames=4)
    feat = FeatureLayer(
        [
            Feature("c", "contact", (0, 7), params={"r0": 1.0}),
            Feature(
                "cn", "coordination", coordination_pairs([0, 1], [6, 7, 8]),
                params={"r0": 0.8, "d0": 0.1, "nn": 4, "mm": 10},
            ),
        ]
    )
    pp = PreprocessingANN(None, feat)
    head = create_sequential_nn([pp.output_dimension, 10, 2], seed=5)
    cv = ColvarModel(pp, head)
    save_numpy_cv(cv, str(tmp_path))
    # the JSON spec carries the switching params verbatim
    with open(tmp_path / "cv_numpy_spec.json") as fh:
        spec = json.load(fh)
    def _find_features(node):
        if node["kind"] == "features":
            return node["features"]
        for s in node.get("stages", []):
            got = _find_features(s)
            if got is not None:
                return got
        return None

    feats = _find_features(spec["graph"])
    assert feats[0]["params"] == {"r0": 1.0, "d0": 0.0, "nn": 6, "mm": 12}
    assert feats[1]["params"] == {"r0": 0.8, "d0": 0.1, "nn": 4, "mm": 10}
    f = load_numpy_cv(str(tmp_path), with_grad=True)
    val, jac = f(x)
    np.testing.assert_allclose(val, np.asarray(cv(x)), atol=1e-5)
    oracle = jax.vmap(jax.jacrev(lambda s: cv(s[None])[0]))(x)
    np.testing.assert_allclose(jac, np.asarray(oracle), atol=2e-4)


def test_pbc_box_value_and_grad(tmp_path):
    """FeatureLayer(box=...) survives the artifact round trip: the spec
    carries the box, and numpy values/Jacobians match jax on WRAPPED
    coordinates."""
    import jax

    box = (2.0, 2.5, 3.0)
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1.8, size=(4, 4, 3)).astype(np.float32)
    x[:, 1, 0] = 1.95
    x[:, 0, 0] = 0.05
    feat = FeatureLayer(
        [
            Feature("c", "contact", (0, 1), params={"r0": 0.3}),
            Feature("b", "bond", (0, 1)),
        ],
        box=box,
    )
    pp = PreprocessingANN(None, feat)
    cv = ColvarModel(pp, create_sequential_nn([2, 8, 2], seed=5))
    save_numpy_cv(cv, str(tmp_path))
    with open(tmp_path / "cv_numpy_spec.json") as fh:
        spec = json.load(fh)
    assert "box" in json.dumps(spec)
    f = load_numpy_cv(str(tmp_path), with_grad=True)
    val, jac = f(x)
    np.testing.assert_allclose(val, np.asarray(cv(x)), atol=1e-5)
    oracle = jax.vmap(jax.jacrev(lambda s: cv(s[None])[0]))(x)
    np.testing.assert_allclose(jac, np.asarray(oracle), atol=2e-4)


def test_grad_finite_difference_consistency(tmp_path):
    """The hand-written backward must match central differences of the
    grad-path forward itself (both float64) to ~1e-7 — catches any drift
    between the analytic VJPs and the evaluated graph."""
    from colvarsfinder_tpu.deploy import eval_spec_grad

    x, base = _coords(n_frames=2)
    cv = _molecular_cv(base, weighted=True)
    save_numpy_cv(cv, str(tmp_path))
    with open(tmp_path / "cv_numpy_spec.json") as fh:
        spec = json.load(fh)
    with np.load(tmp_path / "cv_numpy.npz") as data:
        params = {k: data[k] for k in data.files}
    x64 = np.asarray(x, dtype=np.float64)
    _, jac = eval_spec_grad(spec, params, x64)
    h = 1e-6
    fd = np.zeros_like(jac)
    for ix in np.ndindex(*x64.shape[1:]):
        xp, xm = x64.copy(), x64.copy()
        sl = (slice(None),) + ix
        xp[sl] += h
        xm[sl] -= h
        vp, _ = eval_spec_grad(spec, params, xp)
        vm, _ = eval_spec_grad(spec, params, xm)
        fd[(slice(None), slice(None)) + ix] = (vp - vm) / (2 * h)
    scale = max(np.abs(fd).max(), 1.0)
    assert np.abs(jac - fd).max() / scale < 1e-7


def test_grad_identity_mlp_and_regmodel(tmp_path):
    import jax

    x = np.random.default_rng(2).standard_normal((5, 6)).astype(np.float32)
    rae = RegAutoEncoder([6, 10, 2], [2, 10, 6], [2, 8, 1], K=3, seed=1)
    rm = RegModel(rae, [2, 0, 1])
    cv = ColvarModel(Identity(), rm)
    save_numpy_cv(cv, str(tmp_path))
    f = load_numpy_cv(str(tmp_path), with_grad=True)
    val, jac = f(x)
    assert jac.shape == (5, 3, 6)
    oracle = jax.vmap(jax.jacrev(lambda s: cv(s[None])[0]))(x)
    np.testing.assert_allclose(jac, np.asarray(oracle), atol=1e-4)


def test_grad_runs_without_jax(tmp_path):
    """The gradient path is part of the deployment half: it must work in a
    process that never imports JAX."""
    x, base = _coords(n_frames=3)
    cv = _molecular_cv(base)
    save_numpy_cv(cv, str(tmp_path))
    np.save(tmp_path / "x.npy", x)

    script = f"""
import sys
import numpy as np
import importlib.util
spec = importlib.util.spec_from_file_location(
    "deploy_standalone",
    {str(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "colvarsfinder_tpu", "deploy.py"))!r},
)
deploy = importlib.util.module_from_spec(spec)
spec.loader.exec_module(deploy)
f = deploy.load_numpy_cv({str(tmp_path)!r}, with_grad=True)
x = np.load({str(tmp_path / "x.npy")!r})
val, jac = f(x)
assert val.shape == (3, 2) and jac.shape == (3, 2) + x.shape[1:]
assert np.isfinite(val).all() and np.isfinite(jac).all()
assert "jax" not in sys.modules, "deploy gradients must not import jax"
print("OK")
"""
    env = dict(os.environ)
    env.pop("PYTHONSTARTUP", None)
    env["PYTHONPATH"] = ""
    res = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    assert "OK" in res.stdout
