"""Persistent-compilation-cache cold/warm measurement (round-4 verdict
item: the R=64 sweep pays 30+ s of XLA compile for ~1 s of device work,
and the module-level program caches die with the process).

Runs the SAME workload in two consecutive subprocesses sharing one fresh
cache directory:

  cold: empty cache -- full XLA compiles
  warm: second process -- executables deserialize from disk

and reports the wall time of (a) the headline transfer-op task's first
``train()`` (data prep + compile + 12-epoch run) and (b) an R=64
lr x alpha sweep (compile + run), per process.

Usage:  python benchmarks/compile_cache_ab.py          (real TPU)
        python benchmarks/compile_cache_ab.py --cpu    (CPU smoke)

TPU jobs on this host must be strictly serialized (CLAUDE.md); the two
subprocesses run sequentially by construction.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, os, time, json
sys.path.insert(0, sys.argv[1])
if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import colvarsfinder_tpu as cf

cache_dir = cf.config.set_compilation_cache()  # honors XDG_CACHE_HOME
import bench

ref, traj, weights = bench.make_data()
from colvarsfinder_tpu.models import EigenFunctions
from colvarsfinder_tpu.parallel import train_hyperparameter_sweep

pp = bench._dipeptide_pp()
task = bench._task(
    bench._Traj(traj, weights), pp,
    EigenFunctions([bench.D_R, 20, 20, 20, 1], k=bench.K, seed=0),
    lag_tau=bench.LAG * bench.TRAJ_DT, num_epochs=12,
)
t0 = time.time()
task.train()
train_wall = time.time() - t0

R = int(os.environ.get("CCAB_R", "64"))
models = [
    EigenFunctions([bench.D_R, 20, 20, 20, 1], k=bench.K, seed=r)
    for r in range(R)
]
grid = {
    "learning_rate": list(np.geomspace(5e-4, 2e-2, R)),
}
t0 = time.time()
train_hyperparameter_sweep(task, grid, models=models)
sweep_wall = time.time() - t0

n_entries = len(os.listdir(cache_dir)) if cache_dir else -1
print(json.dumps({
    "train_wall": round(train_wall, 2),
    "sweep_wall": round(sweep_wall, 2),
    "cache_dir": cache_dir,
    "cache_entries": n_entries,
}))
"""


def run_child(cache_home, extra):
    env = dict(os.environ)
    env["XDG_CACHE_HOME"] = cache_home
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", CHILD, REPO] + extra,
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    wall = time.time() - t0
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"child failed rc={out.returncode}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["process_wall"] = round(wall, 2)
    return rec


def main():
    extra = [a for a in sys.argv[1:] if a == "--cpu"]
    cache_home = tempfile.mkdtemp(prefix="cvf_ccab_")
    cold = run_child(cache_home, extra)
    warm = run_child(cache_home, extra)
    print(json.dumps({"cold": cold, "warm": warm}, indent=2))
    print(
        f"first train(): {cold['train_wall']}s cold -> "
        f"{warm['train_wall']}s warm "
        f"({cold['train_wall'] / max(warm['train_wall'], 1e-9):.1f}x)\n"
        f"R=64 sweep:    {cold['sweep_wall']}s cold -> "
        f"{warm['sweep_wall']}s warm "
        f"({cold['sweep_wall'] / max(warm['sweep_wall'], 1e-9):.1f}x)\n"
        f"cache entries: {warm['cache_entries']} "
        f"(unchanged cold->warm = full reuse: "
        f"{cold['cache_entries'] == warm['cache_entries']})"
    )


if __name__ == "__main__":
    main()
