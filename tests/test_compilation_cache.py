"""Persistent XLA compilation cache (round-4 verdict item 3).

The in-process compiled-program caches die with the process, so every
fresh python re-pays XLA compilation (30+ s for an R=64 sweep program
whose device run takes ~1 s). ``config.set_compilation_cache`` turns on
jax's persistent cache so a second process deserializes instead.

These tests drive REAL subprocesses (the only honest way to prove
cross-process reuse); slow tier.
"""

import os
import subprocess
import sys

import pytest

import colvarsfinder_tpu as cf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, os, time, json
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["XDG_CACHE_HOME"] = {cache!r}
import numpy as np
import colvarsfinder_tpu as cf

cache_dir = cf.config.set_compilation_cache()
assert cache_dir is not None and cache_dir.startswith({cache!r})

rng = np.random.default_rng(3)
traj = cf.WeightedTrajectory(
    trajectory=rng.standard_normal((256, 2)).astype(np.float32),
    weights=np.ones(256), dt=0.1, verbose=False,
)
task = cf.EigenFunctionTask(
    traj, None, cf.EigenFunctions([2, 12, 1], k=2, seed=0),
    {workdir!r}, alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.2, k=2,
    learning_rate=0.01, seed=0, batch_size=64, num_epochs=2,
    test_ratio=0.25, save_model_every_step=0, verbose=False,
    tensorboard=False, debug_mode=False,
)
t0 = time.time()
task.train()
elapsed = time.time() - t0
entries = sorted(os.listdir(cache_dir))
print(json.dumps({{"elapsed": elapsed, "entries": entries}}))
"""


def _run_child(cache_home, workdir):
    import json

    script = _CHILD.format(
        repo=REPO, cache=str(cache_home), workdir=str(workdir)
    )
    env = dict(os.environ)
    env.pop("XDG_CACHE_HOME", None)
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        env=env, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cache_populated_and_reused_across_subprocesses(tmp_path):
    cache_home = tmp_path / "cache"
    r1 = _run_child(cache_home, tmp_path / "w1")
    assert len(r1["entries"]) > 0, "first process must populate the cache"
    r2 = _run_child(cache_home, tmp_path / "w2")
    # identical program keys: the second process REUSED every entry the
    # first wrote (a miss would have added new files)
    assert r2["entries"] == r1["entries"]


def test_auto_enable_skips_cpu_and_env_opt_out(tmp_path, monkeypatch):
    # the test session runs on the CPU platform, so import-time auto
    # enable must have left the cache off ...
    import jax

    if (jax.config.jax_platforms or "").split(",")[0] == "cpu":
        assert cf.config.set_compilation_cache(auto=True) is None
    # ... while an explicit call enables it
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    prev = cf.config.compilation_cache_dir()
    try:
        d = cf.config.set_compilation_cache()
        assert d == str(tmp_path / "colvarsfinder_tpu" / "xla")
        assert os.path.isdir(d)
        assert cf.config.compilation_cache_dir() == d
        # env kill-switch wins over everything
        monkeypatch.setenv("COLVARSFINDER_NO_COMPILATION_CACHE", "1")
        assert cf.config.set_compilation_cache() is None
        assert cf.config.compilation_cache_dir() is None
    finally:
        monkeypatch.delenv("COLVARSFINDER_NO_COMPILATION_CACHE",
                           raising=False)
        if prev is not None:
            cf.config.set_compilation_cache(prev)
        else:
            import jax

            jax.config.update("jax_compilation_cache_dir", None)
            cf.config._COMPILATION_CACHE_DIR = None
