"""Interleaved A/B of the bf16 Gram-storage mode at dipeptide scale
(f32 M vs bf16 M, same process — the only admissible protocol on this
backend). The genphase_scan floor argument projects ~1.5-2x on the
Gram-traffic-bound generator step.

Run: python benchmarks/gram_dtype_ab.py      (real TPU)
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.models import EigenFunctions

    ref, traj, weights = bench.make_data()
    pp = bench._dipeptide_pp()
    n_epochs = int(os.environ.get("GRAMAB_EPOCHS", "200"))

    def mk(gd):
        return EigenFunctionTask(
            bench._Traj(traj, weights), pp,
            EigenFunctions([bench.D_R, 20, 20, 20, 1], k=bench.K, seed=0),
            tempfile.mkdtemp(prefix=f"gramab_{gd}_"),
            alpha=bench.ALPHA, eig_weights=bench.EIG_W, lag_tau=0.0,
            k=bench.K, learning_rate=bench.LR, batch_size=bench.BATCH,
            num_epochs=n_epochs, test_ratio=0.001,
            save_model_every_step=0, verbose=False, tensorboard=False,
            debug_mode=False, seed=0, gram_dtype=gd,
        )

    tasks = {"f32": mk(None), "bf16": mk("bfloat16")}
    for t in tasks.values():
        t.train()  # compile + prep
        assert t._gram
    nb = int(bench.N_FRAMES * 0.999) // bench.BATCH
    spe = n_epochs * nb * bench.BATCH
    runs = {k: [] for k in tasks}
    for key in ("f32", "bf16", "bf16", "f32", "f32", "bf16"):
        t0 = time.perf_counter()
        tasks[key].train()
        runs[key].append(spe / (time.perf_counter() - t0))
        print(f"{key}: {runs[key][-1]:,.0f} sps", file=sys.stderr,
              flush=True)
    med = lambda v: sorted(v)[len(v) // 2]  # noqa: E731
    out = {
        "f32_sps": [round(v) for v in runs["f32"]],
        "bf16_sps": [round(v) for v in runs["bf16"]],
        "bf16_over_f32_median": round(med(runs["bf16"]) / med(runs["f32"]), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
