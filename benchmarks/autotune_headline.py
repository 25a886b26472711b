"""Run tune.autotune on the dipeptide-scale headline eigen task.

Exercises the production autotuning surface on the bench.py workload:
the default knob grid (matmul precision x compute dtype) plus the
fused-step and prebatch constructor knobs, ranked by interleaved
measurement. The output is the per-variant table the performance guide
tells users to expect.

Usage: python benchmarks/autotune_headline.py [--epochs N]
"""

import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

EPOCHS = 12
if "--epochs" in sys.argv:
    EPOCHS = int(sys.argv[sys.argv.index("--epochs") + 1])

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def main():
    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )
    from colvarsfinder_tpu.tune import DEFAULT_VARIANTS, autotune

    ref, traj_np, weights_np = bench.make_data()

    class Traj:
        trajectory = traj_np
        weights = weights_np
        dt = bench.TRAJ_DT
        n_frames = bench.N_FRAMES

    align = AlignmentLayer(ref, align_indices=list(range(bench.N_ATOMS)))
    feat = FeatureLayer(
        [Feature("p", "position", list(range(bench.N_ATOMS)))]
    )
    pp = PreprocessingANN(align, feat)

    def factory(**overrides):
        model = EigenFunctions(
            [bench.D_R, 20, 20, 20, 1], k=bench.K, seed=0
        )
        return EigenFunctionTask(
            Traj(), pp, model, tempfile.mkdtemp(prefix="cvf_tune_"),
            alpha=bench.ALPHA, eig_weights=bench.EIG_W,
            lag_tau=bench.LAG * bench.TRAJ_DT, k=bench.K,
            learning_rate=bench.LR, batch_size=bench.BATCH,
            num_epochs=EPOCHS, test_ratio=0.001,
            save_model_every_step=0, verbose=False, tensorboard=False,
            debug_mode=False, seed=0, **overrides,
        )

    variants = list(DEFAULT_VARIANTS) + [
        {"fused_step": True},
        {"prebatch": False},
    ]
    results = autotune(factory, variants, reps=3)

    nb = (int((bench.N_FRAMES - bench.LAG) * 0.999)) // bench.BATCH
    samples = EPOCHS * nb * bench.BATCH
    rows = [
        {
            "overrides": r.overrides,
            "seconds": round(r.best_seconds, 4),
            "samples_per_sec": round(samples / r.best_seconds, 1),
            "speedup": round(r.speedup, 3),
            "final_train_loss": round(r.final_train_loss, 6),
        }
        for r in results
    ]
    import json

    print(json.dumps({
        "metric": "autotune ranking, dipeptide headline task",
        "epochs_per_call": EPOCHS,
        "ranking": rows,
    }))


if __name__ == "__main__":
    main()
