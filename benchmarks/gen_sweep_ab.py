"""Same-process A/B: R=64 generator-loss sweep as ONE scanned vmapped
program vs the round-3 remedy of chunked unrolled sweeps (16 x 4)
(round-3 verdict item 5's measurement).

Round 3 shipped `chunk_size=16` because the UNROLLED epoch body's
buffer liveness OOMed 16 GB at R=64; the scanned epoch body (now
auto-selected by `train_hyperparameter_sweep`'s liveness estimate)
keeps one step's buffers live and fits R=64 in one program. Both
variants measure ALTERNATELY in one process (A,B,A,B — tunnel drift
cancels within pairs; benchmarks/qcp_ab.py protocol).

Usage: python benchmarks/gen_sweep_ab.py [R] [reps]
Prints one JSON line with both rates and the paired ratio.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
EPOCHS = 12
CHUNK = 16

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def main():
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.parallel import train_hyperparameter_sweep

    ref, traj_np, weights_np = bench.make_data()
    pp = bench._dipeptide_pp()

    dims = [bench.D_R, 20, 20, 20, 1]
    models = [EigenFunctions(dims, k=bench.K, seed=r) for r in range(R)]
    side = int(round(np.sqrt(R)))
    lrs = list(np.geomspace(5e-4, 2e-2, side))
    alphas = list(np.geomspace(5.0, 80.0, (R + side - 1) // side))
    grid = {
        "learning_rate": [lrs[r % side] for r in range(R)],
        "alpha": [float(alphas[r // side]) for r in range(R)],
    }

    def build(tag, **over):
        t = bench._task(
            bench._Traj(traj_np, weights_np), pp,
            EigenFunctions(dims, k=bench.K, seed=0),
            lag_tau=0.0, num_epochs=EPOCHS,
        )
        return t

    nb = int(bench.N_FRAMES * 0.999) // bench.BATCH
    samples = R * EPOCHS * nb * bench.BATCH

    # scan variant: the auto-relayout fires at R=64 (liveness estimate);
    # assert it actually did, so the A/B is measuring what it claims
    task_scan = build("scan")
    # chunked variant: round 3's remedy — unrolled body, 16-wide chunks
    task_chunk = build("chunk")
    task_chunk.relayout(unroll=True)

    def run_scan():
        return train_hyperparameter_sweep(task_scan, grid, models=models)

    def run_chunk():
        return train_hyperparameter_sweep(
            task_chunk, grid, models=models, chunk_size=CHUNK
        )

    # compile warmups (both variants) outside the measured windows
    t0 = time.perf_counter()
    res_scan = run_scan()
    compile_scan = time.perf_counter() - t0
    assert not task_scan._unroll, "auto-relayout did not fire"
    assert task_scan._gram, "gram must survive the scanned layout"
    t0 = time.perf_counter()
    res_chunk = run_chunk()
    compile_chunk = time.perf_counter() - t0
    assert task_chunk._unroll, "chunked variant must stay unrolled"

    # paired parity: same replica, same hyperparams, layouts only differ
    worst = 0.0
    for r in (0, R // 2, R - 1):
        a = res_scan[r].train_loss_df.to_numpy()
        b = res_chunk[r].train_loss_df.to_numpy()
        worst = max(worst, float(np.abs(a - b).max() / np.abs(b).max()))
    log(f"scan-vs-chunked parity (3 spot replicas): {worst:.2e}")

    scan_s, chunk_s = [], []
    for rep in range(REPS):
        t0 = time.perf_counter()
        run_scan()
        scan_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_chunk()
        chunk_s.append(time.perf_counter() - t0)
        log(
            f"rep {rep}: scan-R{R} {scan_s[-1]:.3f}s "
            f"({samples / scan_s[-1]:,.0f} sps) vs chunked-{CHUNK} "
            f"{chunk_s[-1]:.3f}s ({samples / chunk_s[-1]:,.0f} sps) "
            f"-> scan/chunk speed ratio "
            f"{chunk_s[-1] / scan_s[-1]:.3f}"
        )

    best_scan, best_chunk = min(scan_s), min(chunk_s)
    print(json.dumps({
        "metric": f"generator sweep R={R}: scanned one-program vs "
                  f"chunked-{CHUNK} unrolled",
        "scan_sps": round(samples / best_scan, 1),
        "chunk_sps": round(samples / best_chunk, 1),
        "scan_over_chunk": round(best_chunk / best_scan, 3),
        "compile_scan_s": round(compile_scan, 1),
        "compile_chunk_s": round(compile_chunk, 1),
        "parity_rel": worst,
    }))


if __name__ == "__main__":
    main()
