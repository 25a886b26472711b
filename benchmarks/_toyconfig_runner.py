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


def swap_in_package(pkg_root):
    """Point ``colvarsfinder_tpu`` at ``pkg_root`` INSIDE this process:
    drop every loaded colvarsfinder_tpu* module and re-import from the
    requested root. Lets one process alternate between two checkouts —
    the only drift-proof A/B on this backend (the chip grant never
    changes hands, so there is no cross-process tunnel-state confound).
    Each checkout's jit caches key on its own function objects, so the
    compiled programs coexist."""
    pkg_root = os.path.abspath(pkg_root)
    for name in list(sys.modules):
        if name.startswith("colvarsfinder_tpu"):
            del sys.modules[name]
    keep = []
    for p in sys.path:
        full = os.path.abspath(p or os.getcwd())
        if (
            os.path.isdir(os.path.join(full, "colvarsfinder_tpu"))
            and full != pkg_root
        ):
            continue  # would shadow the requested checkout
        keep.append(p)
    sys.path[:] = keep
    if pkg_root not in sys.path:
        sys.path.insert(0, pkg_root)
    import colvarsfinder_tpu

    assert os.path.abspath(colvarsfinder_tpu.__file__).startswith(
        pkg_root
    ), colvarsfinder_tpu.__file__
    return colvarsfinder_tpu


def measure(pkg_root, tag, configs=("1", "2", "5")):
    """Measure the disputed configs with the package at ``pkg_root``
    (imported/swapped into this process); returns the rates dict."""
    swap_in_package(pkg_root)
    from colvarsfinder_tpu.core import AutoEncoderTask, EigenFunctionTask
    from colvarsfinder_tpu.models import AutoEncoder, EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )
    from colvarsfinder_tpu.utils import WeightedTrajectory

    CONFIGS = list(configs)
    TAG = tag
    out = {"tag": TAG, "pkg": pkg_root}
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
        # run_baselines config-5 batch sizing: the batch is capped by the
        # 80% train split so exactly one full batch per epoch survives
        # drop_last (bs = min(BATCH_MD, n_train_frames))
        n_train_frames = int((N_FRAMES_MD - lag) * 0.8)
        bs = min(BATCH_MD, n_train_frames)
        nb = n_train_frames // bs

        def mk(rep):
            return EigenFunctionTask(
                traj_md, pp,
                EigenFunctions([3 * N_HEAVY, 20, 20, 20, 1], 2, seed=rep),
                tempfile.mkdtemp(prefix=f"ab_c5_{rep}_"),
                alpha=20.0, eig_weights=[1.0, 0.2], beta=1.0,
                lag_tau=lag * 0.002, k=2,
                **{**common, "learning_rate": LR_MD,
                   "batch_size": bs, "num_epochs": EPOCHS_MD,
                   "test_ratio": 0.2},
            )

        warm = mk(0)
        warm.train()  # compile shared program + data prep
        tasks = [mk(r) for r in range(4)]
        t0 = time.perf_counter()
        for t in tasks:
            t.train()
        dt = time.perf_counter() - t0
        out["c5seq_sps"] = 4 * EPOCHS_MD * nb * bs / dt
        log(f"[{TAG}] c5seq {out['c5seq_sps']:,.0f} sps")

    return out


def main():
    pkg_root = os.path.abspath(sys.argv[1])
    tag = sys.argv[2]
    configs = sys.argv[3].split(",") if len(sys.argv) > 3 else ["1", "2", "5"]
    print(json.dumps(measure(pkg_root, tag, configs)))


if __name__ == "__main__":
    main()
