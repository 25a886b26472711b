"""Measure the ACTUAL reference package and this framework on the
BASELINE.json 2D configs (1: AE, 2: generator eigenfunctions).

The reference is imported from /root/reference with a minimal OpenMM import
stub (unused by SDE workflows). Both sides train on identical synthetic 2D
data at the reference notebook's scale: 5,000 frames, batch 1,000, k=1,
lr=0.005 (examples/2d/2d.ipynb cells 6, 16). Reported metric: training
samples/sec (steady state, excluding compile/warmup).

Run:  python benchmarks/run_baselines.py [--epochs 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_FRAMES = 5_000
BATCH = 1_000
LR = 0.005
K = 1
DIMS_E = [2, 20, 20, 20, K]
DIMS_D = [K, 20, 20, 2]
EIG_DIMS = [2, 20, 20, 20, 1]


def make_data(seed=30):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(-np.pi, np.pi, N_FRAMES)
    r = 1.0 + 0.15 * rng.standard_normal(N_FRAMES)
    x = np.stack([r * np.cos(theta), r * np.sin(theta)], 1).astype(np.float32)
    return x


def _import_reference():
    import tempfile

    stub = tempfile.mkdtemp()
    pkg = os.path.join(stub, "openmm")
    os.makedirs(pkg, exist_ok=True)
    with open(os.path.join(pkg, "__init__.py"), "w") as f:
        f.write("class unit:\n    pass\n")
    with open(os.path.join(pkg, "app.py"), "w") as f:
        f.write("")
    sys.path.insert(0, stub)
    sys.path.insert(0, "/root/reference")
    import colvarsfinder.core as ref_core
    import colvarsfinder.nn as ref_nn

    return ref_core, ref_nn


class _RefTraj:
    def __init__(self, x, dt=0.1):
        self.trajectory = x
        self.weights = np.ones(len(x))
        self.dt = dt
        self.n_frames = len(x)


def bench_reference(x, epochs, outdir):
    import torch

    ref_core, ref_nn = _import_reference()
    traj = _RefTraj(x.astype(np.float64))
    results = {}

    # config 1: autoencoder
    model = ref_nn.AutoEncoder(DIMS_E, DIMS_D)
    task = ref_core.AutoEncoderTask(
        traj, torch.nn.Identity(), model, os.path.join(outdir, "ref_ae"),
        learning_rate=LR, batch_size=BATCH, num_epochs=epochs,
        test_ratio=0.2, save_model_every_step=0, verbose=False,
    )
    t0 = time.perf_counter()
    task.train()
    dt = time.perf_counter() - t0
    n_train = int(N_FRAMES * 0.8) // BATCH * BATCH
    results["reference_ae_sps"] = epochs * n_train / dt
    results["reference_ae_epoch_s"] = dt / epochs

    # config 2: generator eigenfunctions
    model = ref_nn.EigenFunctions(EIG_DIMS, K)
    task = ref_core.EigenFunctionTask(
        traj, torch.nn.Identity(), model, os.path.join(outdir, "ref_eig"),
        alpha=20.0, eig_weights=[1.0], diag_coeff=torch.ones(2), beta=1.0,
        lag_tau=0.0, k=K, learning_rate=LR, batch_size=BATCH,
        num_epochs=epochs, test_ratio=0.2, save_model_every_step=0,
        verbose=False, debug_mode=False,
    )
    t0 = time.perf_counter()
    task.train()
    dt = time.perf_counter() - t0
    results["reference_eigen_sps"] = epochs * n_train / dt
    results["reference_eigen_epoch_s"] = dt / epochs
    return results


def bench_ours(x, epochs, outdir):
    from colvarsfinder_tpu.core import AutoEncoderTask, EigenFunctionTask
    from colvarsfinder_tpu.models import AutoEncoder, EigenFunctions
    from colvarsfinder_tpu.utils import WeightedTrajectory

    traj = WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)
    results = {}
    common = dict(
        learning_rate=LR, batch_size=BATCH, num_epochs=epochs,
        test_ratio=0.2, save_model_every_step=0, verbose=False,
        tensorboard=False, seed=0,
    )
    n_train = int(N_FRAMES * 0.8) // BATCH * BATCH

    def timed(task):
        task.train()  # includes compile
        t0 = time.perf_counter()
        task.train()  # steady state (jit cache warm)
        return time.perf_counter() - t0

    model = AutoEncoder(DIMS_E, DIMS_D, seed=0)
    task = AutoEncoderTask(traj, None, model,
                           os.path.join(outdir, "our_ae"), **common)
    dt = timed(task)
    results["ours_ae_sps"] = epochs * n_train / dt
    results["ours_ae_epoch_s"] = dt / epochs

    model = EigenFunctions(EIG_DIMS, K, seed=0)
    task = EigenFunctionTask(
        traj, None, model, os.path.join(outdir, "our_eig"),
        alpha=20.0, eig_weights=[1.0], diag_coeff=np.ones(2), beta=1.0,
        lag_tau=0.0, k=K, **common,
    )
    dt = timed(task)
    results["ours_eigen_sps"] = epochs * n_train / dt
    results["ours_eigen_epoch_s"] = dt / epochs
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--outdir", default="/tmp/cvf_baselines")
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    x = make_data()
    results = {}
    results.update(bench_ours(x, args.epochs, args.outdir))
    if not args.skip_reference:
        results.update(bench_reference(x, args.epochs, args.outdir))
        results["speedup_ae"] = (
            results["ours_ae_sps"] / results["reference_ae_sps"]
        )
        results["speedup_eigen"] = (
            results["ours_eigen_sps"] / results["reference_eigen_sps"]
        )
    print(json.dumps({k: round(v, 2) for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
