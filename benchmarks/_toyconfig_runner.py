"""Single-checkout runner for the toy-config regression adjudication
(driven by benchmarks/regression_ab.py — do not run standalone unless
you want one measurement of one checkout).

Usage: python _toyconfig_runner.py <pkg_root> <tag> [configs]

Imports ``colvarsfinder_tpu`` from ``pkg_root`` (a git worktree of a
pinned commit, or the live repo), measures the round-2-vs-round-3
disputed configs with the identical workload, and prints ONE JSON line:
``{"tag": ..., "c1_sps": ..., "c2_sps": ..., "c5seq_sps": ...}``.

Workloads (benchmarks/run_baselines.py shapes, notebook epoch counts):
* c1: 2D AutoEncoderTask, 200 epochs
* c2: 2D EigenFunctionTask generator, 200 epochs
* c5seq: 4-replica SEQUENTIAL dipeptide transfer-op sweep, 100 epochs
  each (the vmapped-ensemble variant is not disputed)

Timing protocol: best-of-2 steady-state ``train()`` after a compile
warm-up call (run_baselines.py `_steady_train_ours`).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

PKG_ROOT = os.path.abspath(sys.argv[1])
TAG = sys.argv[2]
CONFIGS = sys.argv[3].split(",") if len(sys.argv) > 3 else ["1", "2", "5"]
sys.path.insert(0, PKG_ROOT)

N_FRAMES_2D, BATCH_2D, EPOCHS_2D, LR_2D = 5_000, 1_000, 200, 0.005
DIMS_E_2D, DIMS_D_2D = [2, 20, 20, 20, 1], [1, 20, 20, 2]
EIG_DIMS_2D = [2, 20, 20, 20, 1]
N_FRAMES_MD, BATCH_MD, EPOCHS_MD, LR_MD = 20_000, 20_000, 100, 0.002
N_HEAVY = 10

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def make_data_2d(seed=30):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(-np.pi, np.pi, N_FRAMES_2D)
    r = 1.0 + 0.15 * rng.standard_normal(N_FRAMES_2D)
    return np.stack(
        [r * np.cos(theta), r * np.sin(theta)], axis=1
    ).astype(np.float32)


def steady(task):
    task.train()  # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        task.train()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import colvarsfinder_tpu  # noqa: F401  (resolves from PKG_ROOT)

    assert colvarsfinder_tpu.__file__.startswith(PKG_ROOT), (
        colvarsfinder_tpu.__file__
    )
    from colvarsfinder_tpu.core import AutoEncoderTask, EigenFunctionTask
    from colvarsfinder_tpu.models import AutoEncoder, EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )
    from colvarsfinder_tpu.utils import WeightedTrajectory

    out = {"tag": TAG, "pkg": PKG_ROOT}
    common = dict(
        learning_rate=LR_2D, batch_size=BATCH_2D, num_epochs=EPOCHS_2D,
        test_ratio=0.2, save_model_every_step=0, verbose=False,
        tensorboard=False, seed=0, debug_mode=False,
    )

    if "1" in CONFIGS or "2" in CONFIGS:
        x = make_data_2d()
        traj = WeightedTrajectory(trajectory=x, dt=0.1, verbose=False)
        n_train = int(N_FRAMES_2D * 0.8) // BATCH_2D * BATCH_2D
        samples = EPOCHS_2D * n_train

        if "1" in CONFIGS:
            task = AutoEncoderTask(
                traj, None, AutoEncoder(DIMS_E_2D, DIMS_D_2D, seed=0),
                tempfile.mkdtemp(prefix="ab_c1_"), **common,
            )
            out["c1_sps"] = samples / steady(task)
            log(f"[{TAG}] c1 {out['c1_sps']:,.0f} sps")

        if "2" in CONFIGS:
            task = EigenFunctionTask(
                traj, None, EigenFunctions(EIG_DIMS_2D, 1, seed=0),
                tempfile.mkdtemp(prefix="ab_c2_"),
                alpha=20.0, eig_weights=[1.0], diag_coeff=np.ones(2),
                beta=1.0, lag_tau=0.0, k=1, **common,
            )
            out["c2_sps"] = samples / steady(task)
            log(f"[{TAG}] c2 {out['c2_sps']:,.0f} sps")

    if "5" in CONFIGS:
        rng = np.random.default_rng(0)
        ref = rng.standard_normal((N_HEAVY, 3)).astype(np.float32)
        traj_md = WeightedTrajectory(
            trajectory=(
                ref[None]
                + 0.3 * rng.standard_normal((N_FRAMES_MD, N_HEAVY, 3))
            ).astype(np.float32),
            dt=0.002, verbose=False,
        )
        pp = PreprocessingANN(
            AlignmentLayer(ref, align_indices=list(range(N_HEAVY))),
            FeatureLayer([Feature("p", "position", list(range(N_HEAVY)))]),
        )
        lag = 5

        def mk(rep):
            return EigenFunctionTask(
                traj_md, pp,
                EigenFunctions([3 * N_HEAVY, 20, 20, 20, 1], 2, seed=rep),
                tempfile.mkdtemp(prefix=f"ab_c5_{rep}_"),
                alpha=20.0, eig_weights=[1.0, 0.2], beta=1.0,
                lag_tau=lag * 0.002, k=2,
                **{**common, "learning_rate": LR_MD,
                   "batch_size": BATCH_MD, "num_epochs": EPOCHS_MD,
                   "test_ratio": 0.001},
            )

        warm = mk(0)
        warm.train()  # compile shared program + data prep
        tasks = [mk(r) for r in range(4)]
        t0 = time.perf_counter()
        for t in tasks:
            t.train()
        dt = time.perf_counter() - t0
        nb = int((N_FRAMES_MD - lag) * 0.999) // BATCH_MD
        out["c5seq_sps"] = 4 * EPOCHS_MD * nb * BATCH_MD / dt
        log(f"[{TAG}] c5seq {out['c5seq_sps']:,.0f} sps")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
