"""Packaging parity (round-4 verdict item 7): the project must be
pip-installable like the reference (reference setup.cfg:3, v0.1.14 on
PyPI) — build a wheel, install it into a FRESH venv with the repo
nowhere on sys.path, and run a tiny end-to-end train + CV deployment
through the installed package.

The native C++ sources (``native/``) are a repo-side acceleration; the
installed wheel transparently falls back to the pure-Python codecs
(utils/native_io.py guards on the Makefile's presence), which is part of
what this test proves.

Slow tier: builds a wheel + venv (~1 min on this host).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_E2E = r"""
import sys, os, json
# the repo must NOT be importable except through the installed wheel
assert not any(p.rstrip("/").endswith("repo") for p in sys.path), sys.path
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import colvarsfinder_tpu as cf

site = os.path.dirname(os.path.dirname(cf.__file__))
assert "site-packages" in cf.__file__, cf.__file__

rng = np.random.default_rng(0)
x = rng.standard_normal((400, 2)).astype(np.float32)
traj = cf.WeightedTrajectory(trajectory=x, weights=np.ones(400), dt=0.1,
                             verbose=False)
workdir = sys.argv[1]
task = cf.EigenFunctionTask(
    traj, None, cf.EigenFunctions([2, 12, 1], k=1, seed=0),
    workdir, alpha=5.0, eig_weights=[1.0], lag_tau=0.3, k=1,
    learning_rate=0.01, batch_size=100, num_epochs=3, test_ratio=0.25,
    save_model_every_step=0, verbose=False, tensorboard=False,
    debug_mode=False,
)
task.train()
losses = np.asarray(task.train_loss_df["loss"], dtype=float)
assert np.isfinite(losses).all()

# deployment round trip through the numpy runtime (no jax at eval time)
task.save_model(epoch=3, description="final")
d = os.path.join(workdir, "final")
cv = cf.load_numpy_cv(d)
out = cv(x[:8])
assert np.isfinite(np.asarray(out)).all()

# XTC codec (pure-Python fallback inside the wheel: native/ is not
# shipped) round-trips
from colvarsfinder_tpu.utils import read_xtc, write_xtc
p = os.path.join(workdir, "t.xtc")
coords = rng.standard_normal((5, 4, 3)).astype(np.float32)
write_xtc(p, coords, dt_ps=1.0)
back = read_xtc(p)[0]
assert np.allclose(back, coords, atol=2e-3)
print(json.dumps({"ok": True, "final_loss": float(losses[-1])}))
"""


def test_wheel_builds_and_installs_into_clean_venv(tmp_path):
    wheel_dir = tmp_path / "dist"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", REPO, "--no-deps",
         "--no-build-isolation", "--no-index", "-w", str(wheel_dir)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    wheels = list(wheel_dir.glob("colvarsfinder_tpu-*.whl"))
    assert len(wheels) == 1, list(wheel_dir.iterdir())

    venv = tmp_path / "venv"
    r = subprocess.run(
        [sys.executable, "-m", "venv", "--system-site-packages",
         str(venv)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    vpy = venv / "bin" / "python"
    r = subprocess.run(
        [str(vpy), "-m", "pip", "install", "--no-index", "--no-deps",
         str(wheels[0])],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    workdir = tmp_path / "e2e"
    workdir.mkdir()
    env = dict(os.environ)
    # keep the session's sitecustomize hook and the OUTER env's
    # site-packages (this interpreter is itself a venv, so
    # --system-site-packages does not expose jax/numpy to the child);
    # colvarsfinder_tpu itself exists ONLY in the fresh venv's
    # site-packages, so the wheel is what gets imported
    import numpy as _np

    outer_site = os.path.dirname(os.path.dirname(_np.__file__))
    env["PYTHONPATH"] = "/root/.axon_site" + os.pathsep + outer_site
    r = subprocess.run(
        [str(vpy), "-c", _E2E, str(workdir)],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])
    assert '"ok": true' in r.stdout
