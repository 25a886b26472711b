"""IN-PROCESS ABBA re-adjudication of the config-4 r3->r4 drop
(round-4 verdict weak #4: config 4 read 21.6M sps in round 3 and 17.8M
in round 4, and round 4 wrote it off as tunnel variance WITHOUT the
module-swap protocol that round 4 itself established as the only
admissible cross-checkout comparison here).

Protocol identical to benchmarks/regression_ab_inproc.py: one python
process, one chip grant; ``_toyconfig_runner.swap_in_package`` re-points
``colvarsfinder_tpu`` at the round-3 worktree or the live repo between
measurement rounds, in A,B,B,A,... order. The workload is BASELINE
config 4 exactly (run_baselines.config_4): dipeptide transfer-op
eigenfunctions, d_r=4 dihedral features (phi/psi cos+sin), Boltzmann
weights, batch 16k (capped by the 80% split), 100 epochs, best-of-2
steady-state train() after a compile warm-up.

Usage: python benchmarks/regression_ab_c4.py [--rounds N]
Writes benchmarks/regression_ab_c4.json.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, HERE)

ROUND3_COMMIT = "0bd6495"  # "round 3: VERDICT + ADVICE + BENCH"
WORKTREE = os.path.join(ROOT, ".worktrees", "r3")

N_FRAMES_MD, BATCH_MD, EPOCHS_MD, LR_MD = 20_000, 20_000, 100, 0.002
LAG_TAU = 0.01
PHI_REL = (1, 3, 4, 6)
PSI_REL = (3, 4, 6, 8)

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def ensure_worktree():
    if os.path.isdir(os.path.join(WORKTREE, "colvarsfinder_tpu")):
        return
    os.makedirs(os.path.dirname(WORKTREE), exist_ok=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", WORKTREE, ROUND3_COMMIT],
        cwd=ROOT, check=True,
    )


def build_data():
    """Config-4 data built ONCE (plain numpy, checkout-independent)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "dipeptide_example", os.path.join(ROOT, "examples", "dipeptide.py")
    )
    ex = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex)
    top = ex.build_topology()
    outdir = tempfile.mkdtemp(prefix="ab_c4_")
    xtc_path, psi = ex.synthesize_trajectory(top, N_FRAMES_MD, 10.0, outdir)
    import _toyconfig_runner as runner

    runner.swap_in_package(ROOT)  # current package just for the codec
    from colvarsfinder_tpu.utils import read_xtc

    coords, dt_ps, _ = read_xtc(xtc_path)
    heavy = top.select_atoms("type C or type O or type N")
    x = coords[:, heavy.ix, :].astype(np.float32)
    energies = 6.0 * np.cos(psi - 0.4) + 1.5 * np.random.default_rng(
        1
    ).standard_normal(N_FRAMES_MD)
    # Boltzmann reweighting weights (mean-one); exact parity with the
    # reference's calc_weights is irrelevant for a perf A/B — both
    # checkouts get the identical array
    w = np.exp(-0.2 * (energies - energies.mean()))
    w /= w.mean()
    return x, w.astype(np.float64), dt_ps


def measure_c4(pkg_root, tag, data):
    import _toyconfig_runner as runner

    runner.swap_in_package(pkg_root)
    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import Feature, FeatureLayer
    from colvarsfinder_tpu.utils import WeightedTrajectory

    x, w, dt_ps = data
    dims = [4, 20, 20, 20, 1]
    k = 2
    bs = min(BATCH_MD, int((len(x) - 1) * 0.8))
    n_train = int((len(x) - 1) * 0.8) // bs * bs
    samples = EPOCHS_MD * n_train

    feat = FeatureLayer(
        [Feature("phi", "dihedral", list(PHI_REL)),
         Feature("psi", "dihedral", list(PSI_REL))]
    )
    traj = WeightedTrajectory(
        trajectory=x, weights=w, dt=dt_ps * 1e-3, verbose=False
    )
    task = EigenFunctionTask(
        traj, feat, EigenFunctions(dims, k, seed=0),
        tempfile.mkdtemp(prefix=f"ab_c4_{tag}_"),
        alpha=20.0, eig_weights=[1.0, 0.5], lag_tau=LAG_TAU, k=k,
        learning_rate=LR_MD, batch_size=BATCH_MD, num_epochs=EPOCHS_MD,
        test_ratio=0.2, save_model_every_step=0, verbose=False,
        tensorboard=False, seed=0, debug_mode=False,
    )
    task.train()  # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        task.train()
        best = min(best, time.perf_counter() - t0)
    sps = samples / best
    log(f"[{tag}] c4 {sps:,.0f} sps ({best:.3f}s)")
    return {"tag": tag, "pkg": pkg_root, "c4_sps": sps}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    ensure_worktree()
    data = build_data()

    seq = []
    for i in range(args.rounds):
        pair = [("r3", WORKTREE), ("cur", ROOT)]
        if i % 2:
            pair.reverse()
        seq.extend((f"{t}#{i}", root) for t, root in pair)

    rows = [measure_c4(root, tag, data) for tag, root in seq]

    by = {"r3": [], "cur": []}
    for r in rows:
        by[r["tag"].split("#")[0]].append(r["c4_sps"])
    med = lambda v: sorted(v)[len(v) // 2]  # noqa: E731
    summary = {
        "r3_sps": [round(v) for v in by["r3"]],
        "cur_sps": [round(v) for v in by["cur"]],
        "cur_over_r3_median": round(med(by["cur"]) / med(by["r3"]), 4),
    }
    out = {"round3_commit": ROUND3_COMMIT, "protocol": "in-process ABBA",
           "rows": rows, "summary": summary}
    path = os.path.join(HERE, "regression_ab_c4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
