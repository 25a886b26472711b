"""Streaming (larger-than-HBM) training at REAL scale (round-4 verdict
item 1: the >HBM story was equivalence-tested at toy scale only, never
measured).

Generates a dipeptide-shaped float32 memmap trajectory genuinely larger
than the chip's 16 GB HBM (default 20 GiB = ~179M frames of [10, 3]),
trains the headline transfer-op EigenFunctionTask with ``streaming=True``
(host-resident memmap, per-batch gather + H2D + per-step dispatch), and
measures steady-state samples/s with the prefetch pipeline ON vs OFF —
interleaved ABBA in ONE process (the only admissible comparison on this
tunnel backend; benchmarks/RESULTS.md "tunnel drift").

The reference design (torch tensors of the whole trajectory in RAM,
reference core.py:343-344, in f64 = 40+ GB for this dataset) cannot run
this workload at all on a 16 GB-HBM chip or a typical workstation;
streaming trades peak memory for H2D traffic and keeps the device busy
behind a three-stage gather -> transfer -> dispatch pipeline
(core/task.py _stream_epochs).

Usage:
  python benchmarks/streaming_bench.py                 # 20 GiB, real TPU
  python benchmarks/streaming_bench.py --gb 2          # smaller file
  python benchmarks/streaming_bench.py --gb 0.2 --cpu  # CPU smoke
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ATOMS = 10
BATCH = 20_000
LAG = 5
TRAJ_DT = 0.002

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def make_memmap_traj(path: str, gib: float, seed: int = 0) -> np.memmap:
    """Dipeptide-shaped [N, 10, 3] float32 memmap of ~``gib`` GiB: a 1M-
    frame random block (rigid-ish perturbations of a reference) tiled
    with per-chunk scale jitter — content-realistic enough for finite
    losses, generated at memcpy speed instead of RNG speed."""
    bytes_per_frame = N_ATOMS * 3 * 4
    n = int(gib * (1 << 30) / bytes_per_frame)
    mm = np.memmap(path, dtype=np.float32, mode="w+",
                   shape=(n, N_ATOMS, 3))
    rng = np.random.default_rng(seed)
    ref = rng.standard_normal((N_ATOMS, 3)).astype(np.float32)
    block = (
        ref[None] + 0.3 * rng.standard_normal((1_000_000, N_ATOMS, 3))
    ).astype(np.float32)
    t0 = time.time()
    for c, s in enumerate(range(0, n, len(block))):
        e = min(s + len(block), n)
        mm[s:e] = block[: e - s] * np.float32(1.0 + 0.02 * (c % 7))
    mm.flush()
    log(f"generated {n:,} frames ({n * bytes_per_frame / 2**30:.1f} GiB) "
        f"in {time.time() - t0:.1f}s at {path}")
    return np.memmap(path, dtype=np.float32, mode="r",
                     shape=(n, N_ATOMS, 3))


def build_task(mm: np.memmap, num_epochs: int):
    import bench
    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.utils import WeightedTrajectory

    traj = WeightedTrajectory(trajectory=mm, dt=TRAJ_DT, verbose=False)
    assert isinstance(traj.trajectory.base, np.memmap) or isinstance(
        traj.trajectory, np.memmap
    ), "trajectory must stay memmap-backed (no silent materialization)"
    pp = bench._dipeptide_pp()
    task = EigenFunctionTask(
        traj, pp, EigenFunctions([bench.D_R, 20, 20, 20, 1], k=2, seed=0),
        tempfile.mkdtemp(prefix="cvf_stream_"),
        alpha=bench.ALPHA, eig_weights=bench.EIG_W,
        lag_tau=LAG * TRAJ_DT, k=2, learning_rate=bench.LR,
        batch_size=BATCH, num_epochs=num_epochs, test_ratio=1e-4,
        save_model_every_step=0, verbose=False, tensorboard=False,
        debug_mode=False, seed=0, streaming=True,
    )
    assert task._streaming
    return task


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=20.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=1,
                    help="epochs per measured train() call")
    ap.add_argument("--keep", action="store_true",
                    help="keep the generated memmap file")
    ap.add_argument("--schedule", default="p2,p0,p0,p2,p2,p0",
                    help="comma list of runs: p<prefetch>[w<workers>]")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    path = os.path.join(
        tempfile.gettempdir(), f"cvf_stream_{args.gb:g}gib.f32"
    )
    if not (os.path.exists(path)
            and os.path.getsize(path) >= args.gb * (1 << 30) * 0.99):
        mm = make_memmap_traj(path, args.gb)
    else:
        bytes_per_frame = N_ATOMS * 3 * 4
        n = os.path.getsize(path) // bytes_per_frame
        mm = np.memmap(path, dtype=np.float32, mode="r",
                       shape=(n, N_ATOMS, 3))
        log(f"reusing {path} ({n:,} frames)")

    task = build_task(mm, args.epochs)
    t0 = time.time()
    task.train()  # compile + split/batch build + page-cache warm
    log(f"warmup train() ({args.epochs} epochs): {time.time() - t0:.1f}s")

    nb = len(task._prepare_data()[2])
    spe = nb * BATCH * args.epochs  # samples per measured call
    runs: dict = {}
    # each spec: p<prefetch-depth>[w<transfer-workers>][h]
    # (trailing 'h' = float16 wire dtype)
    for spec in args.schedule.split(","):
        spec = spec.strip()
        body = spec
        task.stream_wire_dtype = None
        if body.endswith("h"):
            task.stream_wire_dtype = "float16"
            body = body[:-1]
        depth = int(body.split("w")[0].lstrip("p"))
        workers = int(body.split("w")[1]) if "w" in body else None
        task.stream_prefetch = depth
        if workers is not None:
            task.stream_transfer_workers = workers
        t0 = time.time()
        task.train()
        dt = time.time() - t0
        runs.setdefault(spec, []).append(spe / dt)
        log(f"{spec}: {dt:.2f}s -> {spe / dt:,.0f} samples/s")

    on_key = max(
        (k for k in runs if not k.startswith("p0")),
        key=lambda k: max(runs[k]),
    )
    on = max(runs[on_key])
    off = max(
        (v for k, vs in runs.items() if k.startswith("p0") for v in vs),
        default=on,
    )
    n_frames = mm.shape[0]
    gib = n_frames * N_ATOMS * 3 * 4 / 2**30
    result = {
        "metric": "streaming (>HBM memmap) transfer-op training throughput",
        "value": round(on, 1),
        "unit": "samples/sec",
        "dataset_gib": round(gib, 2),
        "n_frames": int(n_frames),
        "prefetch_off_sps": round(off, 1),
        "prefetch_speedup": round(on / off, 3),
        "best_spec": on_key,
        "all_runs_sps": {k: [round(v, 1) for v in vs]
                         for k, vs in runs.items()},
    }
    print(json.dumps(result))
    if not args.keep and args.gb >= 8:
        os.unlink(path)


if __name__ == "__main__":
    main()
