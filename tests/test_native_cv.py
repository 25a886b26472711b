"""Native (C++) CV evaluator: parity with the numpy reference evaluator.

The reference's artifact is consumed natively by MD engines through
libtorch (reference: colvarsfinder/core.py:212-227); this framework's
counterpart is native/cveval.cpp consuming cv_native.bin through a C API.
Values and Jacobians must match the numpy evaluator (itself validated
against jax.jacrev) at float64 precision.
"""

import json

import numpy as np
import pytest

from colvarsfinder_tpu import ColvarModel, save_numpy_cv
from colvarsfinder_tpu.deploy import eval_spec_grad
from colvarsfinder_tpu.deploy_native import (
    load_native_cv,
    native_available,
    write_native_cv,
)
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
    PreprocessingANN,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native evaluator library unavailable"
)


def _coords(n_frames=6, n_atoms=9, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_atoms, 3)).astype(np.float32)
    wig = 0.1 * rng.standard_normal((n_frames, n_atoms, 3)).astype(np.float32)
    return base[None] + wig, base


def _artifact(cv, tmp_path):
    save_numpy_cv(cv, str(tmp_path))
    with open(tmp_path / "cv_numpy_spec.json") as fh:
        spec = json.load(fh)
    with np.load(tmp_path / "cv_numpy.npz") as data:
        params = {k: data[k] for k in data.files}
    return spec, params


@pytest.mark.parametrize("weighted", [False, True])
def test_native_molecular_pipeline_parity(tmp_path, weighted):
    x, base = _coords()
    align = AlignmentLayer(
        base[:6], align_indices=list(range(6)),
        align_weights=np.linspace(1.0, 12.0, 6) if weighted else None,
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
    head = EigenFunctions([pp.output_dimension, 14, 1], 2, seed=3)
    spec, params = _artifact(ColvarModel(pp, head), tmp_path)
    assert (tmp_path / "cv_native.bin").exists()  # written at save time

    f = load_native_cv(str(tmp_path), with_grad=True)
    val_n, jac_n = f(np.asarray(x, dtype=np.float64))
    val_p, jac_p = eval_spec_grad(spec, params, np.asarray(x, np.float64))
    np.testing.assert_allclose(val_n, val_p, rtol=0, atol=1e-12)
    np.testing.assert_allclose(jac_n, jac_p, rtol=0, atol=1e-12)

    # forward-only callable
    f0 = load_native_cv(str(tmp_path))
    np.testing.assert_allclose(f0(x), val_p, atol=1e-12)

    # single-frame squeeze
    v1, j1 = f(x[0])
    assert v1.shape == (2,) and j1.shape == (2,) + x.shape[1:]
    np.testing.assert_allclose(v1, val_p[0], atol=1e-12)


def test_native_switch_features_parity(tmp_path):
    """contact/coordination features (format v2 payload: RATIONAL params)
    through alignment + head, vs the numpy evaluator at 1e-12."""
    from colvarsfinder_tpu.ops import coordination_pairs

    x, base = _coords()
    align = AlignmentLayer(base[:6], align_indices=list(range(6)))
    feat = FeatureLayer(
        [
            Feature("c", "contact", (0, 7), params={"r0": 1.0}),
            Feature(
                "cn", "coordination", coordination_pairs([0, 1], [6, 7, 8]),
                params={"r0": 0.8, "d0": 0.1, "nn": 4, "mm": 10},
            ),
            Feature("b", "bond", (5, 6)),
        ]
    )
    pp = PreprocessingANN(align, feat)
    head = EigenFunctions([pp.output_dimension, 14, 1], 2, seed=3)
    spec, params = _artifact(ColvarModel(pp, head), tmp_path)
    f = load_native_cv(str(tmp_path), with_grad=True)
    val_n, jac_n = f(np.asarray(x, dtype=np.float64))
    val_p, jac_p = eval_spec_grad(spec, params, np.asarray(x, np.float64))
    np.testing.assert_allclose(val_n, val_p, rtol=0, atol=1e-12)
    np.testing.assert_allclose(jac_n, jac_p, rtol=0, atol=1e-12)


def test_native_pbc_box_parity(tmp_path):
    """Minimum-image box (v2 FEATURES payload) in the C++ engine matches
    the numpy evaluator on wrapped coordinates at 1e-12."""
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1.8, size=(5, 4, 3)).astype(np.float64)
    x[:, 1, 0] = 1.95
    x[:, 0, 0] = 0.05
    feat = FeatureLayer(
        [
            Feature("c", "contact", (0, 1), params={"r0": 0.3}),
            Feature("b", "bond", (0, 1)),
            Feature("a", "angle", (0, 2, 3)),
        ],
        box=(2.0, 2.5, 3.0),
    )
    pp = PreprocessingANN(None, feat)
    head = create_sequential_nn([pp.output_dimension, 8, 2], seed=5)
    spec, params = _artifact(ColvarModel(pp, head), tmp_path)
    f = load_native_cv(str(tmp_path), with_grad=True)
    val_n, jac_n = f(x)
    val_p, jac_p = eval_spec_grad(spec, params, x)
    np.testing.assert_allclose(val_n, val_p, rtol=0, atol=1e-12)
    np.testing.assert_allclose(jac_n, jac_p, rtol=0, atol=1e-12)


def test_native_identity_mlp_and_regmodel(tmp_path):
    x = np.random.default_rng(1).standard_normal((5, 6))
    head = create_sequential_nn([6, 12, 2], seed=4)
    spec, params = _artifact(ColvarModel(Identity(), head), tmp_path / "mlp")
    f = load_native_cv(str(tmp_path / "mlp"), with_grad=True)
    val_n, jac_n = f(x)
    val_p, jac_p = eval_spec_grad(spec, params, x)
    np.testing.assert_allclose(val_n, val_p, atol=1e-12)
    np.testing.assert_allclose(jac_n, jac_p, atol=1e-12)

    rae = RegAutoEncoder([6, 10, 2], [2, 10, 6], [2, 8, 1], K=3, seed=1)
    rm = RegModel(rae, [2, 0, 1])
    spec, params = _artifact(ColvarModel(Identity(), rm), tmp_path / "rm")
    f = load_native_cv(str(tmp_path / "rm"), with_grad=True)
    val_n, jac_n = f(x)
    val_p, jac_p = eval_spec_grad(spec, params, x)
    np.testing.assert_allclose(val_n, val_p, atol=1e-12)
    np.testing.assert_allclose(jac_n, jac_p, atol=1e-12)


@pytest.mark.parametrize(
    "activation", ["tanh", "relu", "elu", "gelu", "sigmoid", "softplus"]
)
def test_native_activations(tmp_path, activation):
    x = np.random.default_rng(2).standard_normal((4, 5)) + 0.05
    head = create_sequential_nn([5, 8, 8, 1], activation=activation, seed=6)
    spec, params = _artifact(ColvarModel(Identity(), head), tmp_path)
    f = load_native_cv(str(tmp_path), with_grad=True)
    val_n, jac_n = f(x)
    val_p, jac_p = eval_spec_grad(spec, params, x)
    np.testing.assert_allclose(val_n, val_p, atol=1e-12)
    np.testing.assert_allclose(jac_n, jac_p, atol=1e-12)


def test_native_written_on_demand(tmp_path):
    """load_native_cv regenerates cv_native.bin from spec + npz if absent."""
    head = create_sequential_nn([3, 6, 1], seed=0)
    save_numpy_cv(ColvarModel(Identity(), head), str(tmp_path))
    (tmp_path / "cv_native.bin").unlink()
    f = load_native_cv(str(tmp_path))
    assert (tmp_path / "cv_native.bin").exists()
    x = np.zeros((2, 3))
    assert f(x).shape == (2, 1)


def test_write_native_cv_rejects_foreign_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        write_native_cv(str(tmp_path))


def test_pure_c_consumer(tmp_path):
    """End-to-end proof of the engine-plugin story: a ~40-line pure-C
    program linking libcveval.so loads the artifact and computes value +
    forces with no Python/numpy in the process."""
    import os
    import subprocess

    x, base = _coords(n_frames=1)
    cv = ColvarModel(
        PreprocessingANN(
            AlignmentLayer(base[:5], align_indices=list(range(5))),
            FeatureLayer([Feature("p", "position", [0, 2, 4])]),
        ),
        EigenFunctions([9, 12, 1], 2, seed=8),
    )
    save_numpy_cv(cv, str(tmp_path))
    spec, params = _artifact(cv, tmp_path)
    x64 = np.asarray(x[0], dtype=np.float64)
    val_ref, jac_ref = eval_spec_grad(spec, params, x64)

    c_src = tmp_path / "consumer.c"
    c_src.write_text(
        r"""
#include <stdio.h>
#include <stdlib.h>

void* cveval_load(const char* path);
void cveval_free(void* h);
int cveval_n_out(void* h);
int cveval_eval_grad(void* h, const double* x, long n, long state,
                     double* val, double* jac);

int main(int argc, char** argv) {
    void* h = cveval_load(argv[1]);
    if (!h) { fprintf(stderr, "load failed\n"); return 1; }
    int k = cveval_n_out(h);
    long state = atol(argv[3]);
    double* x = malloc(state * sizeof(double));
    FILE* f = fopen(argv[2], "rb");
    if (fread(x, sizeof(double), state, f) != (size_t)state) return 2;
    fclose(f);
    double* val = malloc(k * sizeof(double));
    double* jac = malloc(k * state * sizeof(double));
    if (cveval_eval_grad(h, x, 1, state, val, jac) != 0) return 3;
    for (int i = 0; i < k; i++) printf("%.17g\n", val[i]);
    for (long i = 0; i < k * state; i++) printf("%.17g\n", jac[i]);
    cveval_free(h);
    return 0;
}
"""
    )
    from colvarsfinder_tpu.deploy_native import _SO_PATH

    exe = tmp_path / "consumer"
    subprocess.run(
        ["gcc", "-O2", str(c_src), _SO_PATH, "-o", str(exe),
         f"-Wl,-rpath,{os.path.dirname(_SO_PATH)}"],
        check=True, capture_output=True,
    )
    xfile = tmp_path / "x.f64"
    np.ascontiguousarray(x64).tofile(xfile)
    res = subprocess.run(
        [str(exe), str(tmp_path / "cv_native.bin"), str(xfile),
         str(x64.size)],
        capture_output=True, text=True, timeout=60,
    )
    assert res.returncode == 0, res.stderr
    nums = np.array([float(v) for v in res.stdout.split()])
    np.testing.assert_allclose(nums[:2], val_ref, atol=1e-12)
    np.testing.assert_allclose(
        nums[2:].reshape(jac_ref.shape), jac_ref, atol=1e-12
    )
