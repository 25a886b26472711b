"""Profile the real R-replica sweep program on TPU and attribute step time.

Runs ONE warm sweep dispatch under jax.profiler (perfetto trace), then
parses the trace json and prints device-op time grouped by op name — the
definitive answer to "where do the 23.7 ms/step go" (microbench core math
accounts for only ~12.6 ms; benchmarks/ensemble_layout_ab.py).

Usage: python benchmarks/sweep_profile.py [R] [EPOCHS]
"""

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def build():
    import tempfile as tf

    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    ref, traj_np, weights_np = bench.make_data()

    class Traj:
        trajectory = traj_np
        weights = weights_np
        dt = bench.TRAJ_DT
        n_frames = bench.N_FRAMES

    align = AlignmentLayer(ref, align_indices=list(range(bench.N_ATOMS)))
    feat = FeatureLayer([Feature("p", "position", list(range(bench.N_ATOMS)))])
    pp = PreprocessingANN(align, feat)
    model = EigenFunctions([bench.D_R, 20, 20, 20, 1], k=bench.K, seed=0)
    task = EigenFunctionTask(
        Traj, pp, model, tf.mkdtemp(prefix="cvf_prof_"),
        alpha=bench.ALPHA, eig_weights=bench.EIG_W,
        lag_tau=bench.LAG * bench.TRAJ_DT, k=bench.K,
        learning_rate=bench.LR, batch_size=bench.BATCH,
        num_epochs=EPOCHS, test_ratio=0.001, save_model_every_step=0,
        verbose=False, tensorboard=False, debug_mode=False, seed=0,
    )
    return task


def main():
    import jax

    from colvarsfinder_tpu.parallel import train_hyperparameter_sweep

    task = build()
    grid = {
        "learning_rate": list(np.geomspace(3e-3, 3e-2, R)),
        "alpha": list(np.linspace(5.0, 40.0, R)),
    }
    log("warmup (compile) ...")
    train_hyperparameter_sweep(task, grid)

    tdir = tempfile.mkdtemp(prefix="cvf_trace_")
    log(f"tracing into {tdir} ...")
    with jax.profiler.trace(tdir, create_perfetto_trace=True):
        train_hyperparameter_sweep(task, grid)

    traces = glob.glob(
        os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True
    )
    assert traces, f"no perfetto trace written under {tdir}"
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)

    events = data["traceEvents"] if isinstance(data, dict) else data
    # device-op complete events carry dur (us); group by name
    by_name = defaultdict(float)
    total = 0.0
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    tpu_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()
    }
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if tpu_pids and e.get("pid") not in tpu_pids:
            continue
        by_name[e["name"]] += e["dur"]
        total += e["dur"]

    n_steps = EPOCHS * 5  # 5 train batches per epoch at bench scale
    print(f"\n== device op time (R={R}, {n_steps} steps; totals in ms) ==")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])
    for name, dur in rows[:40]:
        print(f"{dur/1e3:10.3f} ms  {dur/1e3/n_steps:8.4f} ms/step  {name[:110]}")
    print(f"{total/1e3:10.3f} ms TOTAL  {total/1e3/n_steps:8.4f} ms/step")


if __name__ == "__main__":
    main()
