"""The engine side of deployment: an external-engine-style numpy loop
steered by the saved artifact's analytic CV forces must pull the system
across a barrier (examples/deployed_biasing.py in quick mode).

This validates the whole export chain under use: train -> save_model ->
cv_native.bin / numpy artifact -> umbrella restraint forces.
"""

import importlib.util
import os


def _example():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "deployed_biasing.py",
    )
    spec = importlib.util.spec_from_file_location("deployed_biasing", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_deployed_biasing_quick(tmp_path):
    mod = _example()
    corr = mod.main(str(tmp_path), quick=True)
    assert corr > 0.9


def test_numpy_backend_fallback(tmp_path):
    """The pure-numpy evaluator drives the same engine loop when the
    native library is not preferred."""
    mod = _example()
    artifact = mod.train_cv(str(tmp_path), quick=True)
    backend, centers, means, corr, x0 = mod.run_engine(
        artifact, quick=True, prefer_native=False
    )
    assert backend == "numpy"
    assert corr > 0.9 and x0 > 0.3
