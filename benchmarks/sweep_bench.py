"""Hyperparameter-sweep benchmark: 64-replica lr x alpha grid at dipeptide
scale, ONE vmapped program vs the sequential sweep loop.

The reference's sweep story is re-running ``train()`` per configuration
(reference core.py:459). This framework's ``train_hyperparameter_sweep``
stacks the replica axis into every matmul (vmap over the multi-epoch
program) and SHARES the device-placed batch data across replicas — the
chip-filling formulation for the tiny CV models this domain uses.

Workload: the headline dipeptide transfer-op config (bench.py) — 120k
frames, d_r=30 features after Kabsch+position preprocessing, k=2 heads
[30,20,20,20,1], batch 20k, 12 epochs (60 steps) per replica.

Usage: python benchmarks/sweep_bench.py [R] [--gen] [--bf16] [--style=S]

``--style=acc32|w32|pure`` selects the bf16 arithmetic style (with
--bf16; default pure). acc32 keeps bf16 activation traffic but
accumulates matmuls in f32 (config.set_bf16_style); this flag exists to
measure whether tighter per-pass arithmetic buys sweep-window parity
worth its throughput cost (single-task data: benchmarks/bf16_modes_ab.py
— pure 2.23x/acc32 1.17x per step).

``--gen`` sweeps the GENERATOR loss instead of the transfer-op loss —
the per-replica step then runs the Gram path (losses pp_gram; the
frozen-preprocessing backward hoisted to the shared data prep), which is
what makes generator-loss hyperparameter sweeps practical.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root (bench.py)

import bench  # noqa: E402  (dipeptide-scale data + constants)

argv = [a for a in sys.argv[1:]
        if a not in ("--gen", "--bf16") and not a.startswith("--style=")]
GEN = "--gen" in sys.argv[1:]
BF16 = "--bf16" in sys.argv[1:]  # bfloat16 mixed-precision sweep mode
STYLE = next((a.split("=", 1)[1] for a in sys.argv[1:]
              if a.startswith("--style=")), "pure")
R = int(argv[0]) if argv else 64
EPOCHS = 12  # 60 steps/replica, matching bench.py's measure window

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def build_task(traj_obj, pp, model, lr=bench.LR, alpha=bench.ALPHA,
               tag="sweep"):
    import tempfile

    from colvarsfinder_tpu.core import EigenFunctionTask

    return EigenFunctionTask(
        traj_obj, pp, model, tempfile.mkdtemp(prefix=f"cvf_{tag}_"),
        alpha=alpha, eig_weights=bench.EIG_W,
        lag_tau=0.0 if GEN else bench.LAG * bench.TRAJ_DT,
        k=bench.K, learning_rate=lr, batch_size=bench.BATCH,
        num_epochs=EPOCHS, test_ratio=0.001, save_model_every_step=0,
        verbose=False, tensorboard=False, debug_mode=False, seed=0,
    )


def main():
    import jax

    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )
    from colvarsfinder_tpu.parallel import train_hyperparameter_sweep

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

    dims = [bench.D_R, 20, 20, 20, 1]
    models = [EigenFunctions(dims, k=bench.K, seed=r) for r in range(R)]

    side = int(round(np.sqrt(R)))
    lrs = list(np.geomspace(5e-4, 2e-2, side))
    alphas = list(np.geomspace(5.0, 80.0, (R + side - 1) // side))
    grid = {
        "learning_rate": [lrs[r % side] for r in range(R)],
        "alpha": [float(alphas[r // side]) for r in range(R)],
    }

    task = build_task(Traj(), pp, models[0])
    ll = bench.N_FRAMES - (0 if GEN else bench.LAG)
    nb = (int(ll * 0.999)) // bench.BATCH
    if GEN:
        task._prepare_data()
        log(f"generator sweep: gram path active = {task._gram}")
    samples_per_replica = EPOCHS * nb * bench.BATCH
    log(f"grid: R={R} ({side} lrs x {len(alphas)} alphas), "
        f"{EPOCHS} epochs x {nb} batches of {bench.BATCH} per replica")

    # --- vmapped sweep: warmup (compile) + measured run ---
    t0 = time.perf_counter()
    results = train_hyperparameter_sweep(
        task, grid, models=models,
        compute_dtype="bfloat16" if BF16 else None,
        bf16_style=STYLE if BF16 else None)
    _ = np.asarray(results[-1].train_loss_df.to_numpy())
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    results = train_hyperparameter_sweep(
        task, grid, models=models,
        compute_dtype="bfloat16" if BF16 else None,
        bf16_style=STYLE if BF16 else None)
    finals = [float(r.train_loss_df["loss"].iloc[-1]) for r in results]
    sweep_s = time.perf_counter() - t0
    sweep_sps = R * samples_per_replica / sweep_s
    from colvarsfinder_tpu.parallel import ensemble as _ens
    device_s = _ens.last_run_seconds
    device_sps = R * samples_per_replica / device_s
    log(f"vmapped sweep: {R} replicas in {sweep_s:.3f}s "
        f"(+{compile_s:.1f}s first-call compile; device run "
        f"{device_s:.3f}s -> {device_sps:,.0f} sps) -> "
        f"{sweep_sps:,.0f} samples/s aggregate")
    log(f"  best replica: loss {min(finals):.4f} at "
        f"{results[int(np.argmin(finals))].hyperparams}")

    # --- sequential baseline: one task.train() per configuration ---
    # (the strongest fair sequential form: tasks share traj_obj, so the
    # compiled epoch program is shared; each still prepares its own device
    # batches, exactly what R constructed tasks would do)
    warm = build_task(Traj(), pp, models[0], tag="seqwarm")
    warm.train()  # compile + prep outside the measured window
    tasks = [
        build_task(Traj(), pp, models[r], lr=grid["learning_rate"][r],
                   alpha=grid["alpha"][r], tag=f"seq{r}")
        for r in range(R)
    ]
    t0 = time.perf_counter()
    for t in tasks:
        t.train()
    seq_s = time.perf_counter() - t0
    seq_sps = R * samples_per_replica / seq_s
    log(f"sequential sweep: {R} replicas in {seq_s:.3f}s -> "
        f"{seq_sps:,.0f} samples/s aggregate")

    # parity: sequential replica r must match vmapped replica r
    worst = 0.0
    for r in (0, R // 2, R - 1):
        a = results[r].train_loss_df.to_numpy()
        b = tasks[r].train_loss_df.to_numpy()
        worst = max(worst, float(np.abs(a - b).max() / np.abs(b).max()))
    log(f"parity vmapped-vs-sequential (3 spot replicas): "
        f"max rel diff {worst:.2e}")

    flops_per_sample = 34_760  # see bench.py
    tflops = sweep_sps * flops_per_sample / 1e12
    kind = "generator (gram path)" if GEN else "transfer-op"
    if BF16:
        kind += f" bf16/{STYLE}"  # parity vs the f32 sequential sweep is
        # then the mixed-precision trajectory drift, not a bug (measured
        # pure ~1e-0 over the 60-step window)

    print(
        f'{{"metric": "{R}-replica {kind} lr x alpha sweep aggregate '
        'throughput", '
        f'"value": {sweep_sps:.1f}, "unit": "samples/sec", '
        f'"speedup_vs_sequential": {sweep_sps / seq_sps:.2f}, '
        f'"sweep_s": {sweep_s:.3f}, "seq_s": {seq_s:.3f}, '
        f'"device_s": {device_s:.3f}, "device_sps": {device_sps:.1f}, '
        f'"tflops_effective": {tflops:.2f}, '
        f'"parity_rel": {worst:.2e}}}'
    )


if __name__ == "__main__":
    main()
