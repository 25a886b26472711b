"""Round-3 feature benchmarks: committor task step rate, replica-exchange
and BAOAB sampler throughput.

Absolute device rates for the new surfaces (no reference counterpart
exists for any of them), measured the house way: long dispatch windows
(tunnel round-trip ~35 ms sits inside short windows — CLAUDE.md), each
figure from the best of 3 repeats within ONE process.

Run on the TPU host:  python benchmarks/newtask_bench.py
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _best_of(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_committor(n_frames=20_000, d=30, batch=20_000, epochs=300):
    """Committor epoch rate at dipeptide scale (one batch per epoch, the
    headline eigen configuration's shape)."""
    import jax

    from colvarsfinder_tpu import CommittorTask, create_sequential_nn
    from colvarsfinder_tpu.utils import WeightedTrajectory

    rng = np.random.default_rng(0)
    x = rng.standard_normal((n_frames, d)).astype(np.float32)
    traj = WeightedTrajectory(
        trajectory=x, weights=rng.uniform(0.5, 1.5, n_frames),
        dt=0.1, verbose=False,
    )
    task = CommittorTask(
        traj, None, create_sequential_nn([d, 20, 20, 20, 1], seed=0),
        tempfile.mkdtemp(prefix="cvf_combench_"),
        region_a=x[:, 0] < -1.0, region_b=x[:, 0] > 1.0,
        alpha=100.0, beta=1.0, batch_size=batch, num_epochs=epochs,
        save_model_every_step=0, test_ratio=0.2, verbose=False, seed=0,
    )
    task.train()  # compile + warm caches
    t = _best_of(task.train)
    steps = epochs * max(1, (int(n_frames * 0.8) // batch))
    sps = steps * min(batch, int(n_frames * 0.8)) / t
    print(
        f"committor  n={n_frames} d={d} batch={batch}: "
        f"{epochs / t:8.1f} epochs/s  {sps / 1e6:7.2f}M samples/s"
    )
    return sps


def bench_committor_gram_ab(n_frames=20_000, epochs=100):
    """Gram vs vjp Dirichlet path on a molecular preprocessing layer
    (Kabsch alignment + position features, d_r=30) — interleaved within
    one process (tunnel drift rule, CLAUDE.md)."""
    from colvarsfinder_tpu import CommittorTask, create_sequential_nn
    from colvarsfinder_tpu.ops import (
        AlignmentLayer,
        Feature,
        FeatureLayer,
        PreprocessingANN,
    )
    from colvarsfinder_tpu.utils import WeightedTrajectory

    rng = np.random.default_rng(0)
    base = rng.standard_normal((10, 3)).astype(np.float32)
    frames = base[None] + 0.1 * rng.standard_normal(
        (n_frames, 10, 3)
    ).astype(np.float32)
    traj = WeightedTrajectory(trajectory=frames, dt=0.1, verbose=False)
    align = AlignmentLayer(base, align_indices=list(range(10)))
    feat = FeatureLayer([Feature("p", "position", list(range(10)))])
    pp = PreprocessingANN(align, feat)
    x0 = frames[:, 0, 0]

    def build(gram):
        return CommittorTask(
            traj, pp,
            create_sequential_nn([pp.output_dimension, 20, 20, 20, 1],
                                 seed=0),
            tempfile.mkdtemp(prefix="cvf_comgram_"),
            region_a=x0 < np.quantile(x0, 0.2),
            region_b=x0 > np.quantile(x0, 0.8),
            alpha=100.0, beta=1.0, gram_pp=gram,
            batch_size=n_frames, num_epochs=epochs,
            save_model_every_step=0, test_ratio=0.2, verbose=False, seed=0,
        )

    tasks = {name: build(g) for name, g in (("vjp", False), ("gram", True))}
    for t in tasks.values():
        t.train()  # compile + warm
    best = {name: float("inf") for name in tasks}
    for _ in range(3):  # interleaved
        for name, t in tasks.items():
            t0 = time.perf_counter()
            t.train()
            best[name] = min(best[name], time.perf_counter() - t0)
    for name in ("vjp", "gram"):
        print(f"committor[{name:4s}] molecular pp d_r=30: "
              f"{epochs / best[name]:8.1f} epochs/s")
    print(f"gram speedup: {best['vjp'] / best['gram']:.2f}x")


def bench_samplers(n_steps=500_000, chains=32):
    """Overdamped vs BAOAB vs REMD(K=8) device step rates."""
    from colvarsfinder_tpu.utils import (
        integrate_sde_langevin,
        integrate_sde_overdamped,
        integrate_sde_remd,
    )

    class Quad:
        dim = 2
        beta = 1.0

        def V(self, x):
            import jax.numpy as jnp

            return 0.5 * (x[0] ** 2 + 2.0 * x[1] ** 2)

    out = tempfile.mkdtemp(prefix="cvf_sampbench_")
    # decimate hard: per-frame text writing is host-side cost, and the
    # point here is the DEVICE integration rate
    kw = dict(step_size=0.01, report_interval=1000, seed=0, verbose=False)

    def run_od():
        integrate_sde_overdamped(
            Quad(), n_steps, out, n_chains=chains, **kw
        )

    def run_baoab():
        integrate_sde_langevin(
            Quad(), n_steps, out, n_chains=chains, friction=2.0, **kw
        )

    def run_remd():
        integrate_sde_remd(
            Quad(), np.geomspace(1.0, 0.2, 8), n_steps, out,
            exchange_interval=1000, **kw
        )

    for name, fn, mult in (
        ("overdamped", run_od, chains),
        ("BAOAB", run_baoab, chains),
        ("REMD K=8", run_remd, 8),
    ):
        fn()  # compile
        t = _best_of(fn)
        rate = n_steps * mult / t
        print(f"{name:11s} {mult:3d} chains x {n_steps} steps: "
              f"{rate / 1e6:8.2f}M chain-steps/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        bench_committor(n_frames=2_000, d=10, batch=2_000, epochs=20)
        bench_committor_gram_ab(n_frames=2_000, epochs=10)
        bench_samplers(n_steps=20_000, chains=4)
    else:
        bench_committor()
        bench_committor_gram_ab()
        bench_samplers()
