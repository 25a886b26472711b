"""TorchScript CV deployment (colvarsfinder_tpu.deploy_torch).

The reference's deployment artifact is a scripted torch module
``scripted_cv_cpu.pt`` consumed by libtorch-based MD tooling (reference:
colvarsfinder/core.py:212-227). These tests check that a CV trained in this
framework exports to that exact format: the scripted module matches the live
JAX model (values) and the numpy gradient evaluator (autograd forces), stays
batch-polymorphic after torch.jit.load, and can be produced from the numpy
artifact alone on a JAX-less deployment host.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from colvarsfinder_tpu import (
    ColvarModel,
    export_colvar,
    export_torchscript_cv,
    save_numpy_cv,
    torchscript_from_numpy_cv,
)
from colvarsfinder_tpu.deploy import UnsupportedLayerError
from colvarsfinder_tpu.models import (
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


def _molecular_cv(base, seed=5, weighted=False):
    masses = np.linspace(1.0, 16.0, 6).astype(np.float32)
    align = AlignmentLayer(
        base[:6],
        align_indices=list(range(6)),
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


def _scripted(cv, tmp_path):
    path = export_torchscript_cv(cv, str(tmp_path))
    assert os.path.basename(path) == "scripted_cv_cpu.pt"
    return torch.jit.load(path)


def test_identity_mlp_parity(tmp_path):
    head = create_sequential_nn([4, 16, 2], seed=3)
    cv = ColvarModel(Identity(), head)
    mod = _scripted(cv, tmp_path)
    x = np.random.default_rng(1).standard_normal((5, 4)).astype(np.float32)
    out = mod(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(out, np.asarray(cv(x)), rtol=0, atol=2e-6)
    # single-state squeeze, like the numpy evaluator
    out1 = mod(torch.from_numpy(x[0])).detach().numpy()
    np.testing.assert_allclose(out1, np.asarray(cv(x[0])), atol=2e-6)


@pytest.mark.parametrize("weighted", [False, True])
def test_full_molecular_pipeline_parity(tmp_path, weighted):
    x, base = _coords()
    cv = _molecular_cv(base, weighted=weighted)
    mod = _scripted(cv, tmp_path)
    out = mod(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(out, np.asarray(cv(x)), rtol=0, atol=1e-5)


@pytest.mark.parametrize(
    "activation", ["tanh", "relu", "elu", "gelu", "sigmoid", "celu", "softplus"]
)
def test_activation_table_parity(tmp_path, activation):
    head = create_sequential_nn([6, 12, 12, 2], activation=activation, seed=9)
    cv = ColvarModel(Identity(), head)
    mod = _scripted(cv, tmp_path / activation)
    x = np.random.default_rng(4).standard_normal((8, 6)).astype(np.float32)
    out = mod(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(out, np.asarray(cv(x)), rtol=0, atol=5e-6)


def test_regmodel_stacked_heads_parity(tmp_path):
    rae = RegAutoEncoder([6, 10, 2], [2, 10, 6], [2, 8, 1], K=3, seed=1)
    rm = RegModel(rae, [2, 0, 1])
    cv = ColvarModel(Identity(), rm)
    mod = _scripted(cv, tmp_path)
    x = np.random.default_rng(0).standard_normal((4, 6)).astype(np.float32)
    out = mod(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(out, np.asarray(cv(x)), atol=2e-6)


def test_batch_polymorphism_after_load(tmp_path):
    """torch.jit.script (not trace): the loaded artifact must accept any
    batch size, like the reference's scripted CV."""
    x, base = _coords(n_frames=9)
    cv = _molecular_cv(base)
    mod = _scripted(cv, tmp_path)
    for b in (1, 3, 9):
        out = mod(torch.from_numpy(x[:b])).detach().numpy()
        assert out.shape == (b, 2)
        np.testing.assert_allclose(out, np.asarray(cv(x[:b])), atol=1e-5)


def test_autograd_forces_match_numpy_grad(tmp_path):
    """The scripted artifact's autograd input Jacobian — what a biased-MD
    consumer differentiates for forces — must match the numpy deployment
    evaluator's hand-written reverse mode (float64, tight bar)."""
    from colvarsfinder_tpu.deploy import eval_spec_grad
    import json

    x, base = _coords(n_frames=3)
    cv = _molecular_cv(base, weighted=True)
    save_numpy_cv(cv, str(tmp_path))
    mod = _scripted(cv, tmp_path).double()

    xt = torch.from_numpy(np.asarray(x, dtype=np.float64))
    xt.requires_grad_(True)
    y = mod(xt)  # [B, 2]
    jac_rows = []
    for k in range(y.shape[1]):
        (g,) = torch.autograd.grad(y[:, k].sum(), xt, retain_graph=True)
        jac_rows.append(g.detach().numpy())
    jac_torch = np.stack(jac_rows, axis=1)  # [B, K, N, 3]

    with open(tmp_path / "cv_numpy_spec.json") as fh:
        spec = json.load(fh)
    with np.load(tmp_path / "cv_numpy.npz") as data:
        params = {k: data[k] for k in data.files}
    val, jac_np = eval_spec_grad(spec, params, np.asarray(x, np.float64))
    np.testing.assert_allclose(
        y.detach().numpy(), val, rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(jac_torch, jac_np, rtol=0, atol=1e-8)


def test_switch_features_scripted_parity(tmp_path):
    """contact/coordination features survive TorchScript scripting; values
    and autograd forces match the numpy evaluator at float64."""
    import json

    from colvarsfinder_tpu.deploy import eval_spec_grad
    from colvarsfinder_tpu.ops import coordination_pairs

    x, base = _coords(n_frames=3)
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
    head = create_sequential_nn([pp.output_dimension, 8, 2], seed=5)
    cv = ColvarModel(pp, head)
    save_numpy_cv(cv, str(tmp_path))
    mod = _scripted(cv, tmp_path).double()

    xt = torch.from_numpy(np.asarray(x, dtype=np.float64))
    xt.requires_grad_(True)
    y = mod(xt)
    jac_rows = []
    for k in range(y.shape[1]):
        (g,) = torch.autograd.grad(y[:, k].sum(), xt, retain_graph=True)
        jac_rows.append(g.detach().numpy())
    jac_torch = np.stack(jac_rows, axis=1)

    with open(tmp_path / "cv_numpy_spec.json") as fh:
        spec = json.load(fh)
    with np.load(tmp_path / "cv_numpy.npz") as data:
        params = {k: data[k] for k in data.files}
    val, jac_np = eval_spec_grad(spec, params, np.asarray(x, np.float64))
    np.testing.assert_allclose(y.detach().numpy(), val, rtol=0, atol=1e-9)
    np.testing.assert_allclose(jac_torch, jac_np, rtol=0, atol=1e-8)


def test_pbc_box_scripted_parity(tmp_path):
    """Minimum-image box in the scripted artifact: values and autograd
    forces match the numpy evaluator on wrapped coordinates (the image
    shift is locally constant, so forces are exact)."""
    import json

    from colvarsfinder_tpu.deploy import eval_spec_grad

    rng = np.random.default_rng(9)
    x = rng.uniform(0, 1.8, size=(3, 4, 3)).astype(np.float64)
    x[:, 1, 0] = 1.95
    x[:, 0, 0] = 0.05
    feat = FeatureLayer(
        [
            Feature("c", "contact", (0, 1), params={"r0": 0.3}),
            Feature("b", "bond", (0, 1)),
        ],
        box=(2.0, 2.5, 3.0),
    )
    pp = PreprocessingANN(None, feat)
    cv = ColvarModel(pp, create_sequential_nn([2, 8, 2], seed=5))
    save_numpy_cv(cv, str(tmp_path))
    mod = _scripted(cv, tmp_path).double()
    xt = torch.from_numpy(x)
    xt.requires_grad_(True)
    y = mod(xt)
    (g,) = torch.autograd.grad(y.sum(), xt)
    with open(tmp_path / "cv_numpy_spec.json") as fh:
        spec = json.load(fh)
    with np.load(tmp_path / "cv_numpy.npz") as data:
        params = {k: data[k] for k in data.files}
    val, jac = eval_spec_grad(spec, params, x)
    np.testing.assert_allclose(y.detach().numpy(), val, rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        g.numpy(), jac.sum(axis=1), rtol=0, atol=1e-8
    )


def test_export_colvar_auto_writes_when_torch_loaded(tmp_path):
    """export_colvar writes scripted_cv_cpu.pt automatically when torch is
    already imported in the process (it is, in this test module)."""
    head = create_sequential_nn([3, 8, 1], seed=2)
    cv = ColvarModel(Identity(), head)
    x = np.zeros((2, 3), np.float32)
    export_colvar(cv, x, str(tmp_path), write_stablehlo=False)
    assert os.path.exists(tmp_path / "scripted_cv_cpu.pt")
    mod = torch.jit.load(str(tmp_path / "scripted_cv_cpu.pt"))
    xr = np.random.default_rng(3).standard_normal((4, 3)).astype(np.float32)
    np.testing.assert_allclose(
        mod(torch.from_numpy(xr)).detach().numpy(),
        np.asarray(cv(xr)),
        atol=2e-6,
    )


def test_torchscript_from_numpy_artifact(tmp_path):
    """Conversion must work from the saved numpy artifact alone — the
    deployment-host path, no live JAX model needed."""
    x, base = _coords(n_frames=4)
    cv = _molecular_cv(base)
    save_numpy_cv(cv, str(tmp_path / "art"))
    out_path = torchscript_from_numpy_cv(
        str(tmp_path / "art"), str(tmp_path / "ts")
    )
    mod = torch.jit.load(out_path)
    np.testing.assert_allclose(
        mod(torch.from_numpy(x)).detach().numpy(),
        np.asarray(cv(x)),
        atol=1e-5,
    )


def test_lambda_pp_layer_rejected(tmp_path):
    head = create_sequential_nn([2, 4, 1], seed=0)
    cv = ColvarModel(Lambda(lambda x: x * 2.0), head)
    with pytest.raises(UnsupportedLayerError):
        export_torchscript_cv(cv, str(tmp_path))
