r"""Multi-replica sweep with data-parallel training over a TPU mesh
(BASELINE config 5: sharded trajectories, DP training across the mesh).

Workflow:
  1. integrate ``n_chains`` independent SDE replicas in ONE vmapped
     lax.scan program;
  2. concatenate the replica trajectories into one weighted dataset;
  3. build a 1-axis ('data',) mesh over all available devices and train an
     eigenfunction task with the batch axis sharded across the mesh —
     parameters replicated, weighted-mean reductions become ICI psums.

Without multi-TPU hardware, run on a virtual 8-device CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multireplica.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from colvarsfinder_tpu.core import EigenFunctionTask
from colvarsfinder_tpu.models import EigenFunctions
from colvarsfinder_tpu.parallel import make_data_mesh
from colvarsfinder_tpu.utils import WeightedTrajectory, integrate_sde_overdamped


class DoubleWell:
    """Double-well in x, harmonic in y; jax-traceable."""

    dim = 2
    beta = 2.0

    def V(self, x):
        import jax.numpy as jnp

        return (x[0] ** 2 - 1.0) ** 2 + 2.0 * x[1] ** 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/cvf_multireplica")
    ap.add_argument("--n-chains", type=int, default=8)
    ap.add_argument("--n-steps", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=20)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    devices = jax.devices()
    print(f"{len(devices)} devices: {devices[0].platform}")
    mesh = make_data_mesh(devices)

    # 1. all replicas integrate in one vmapped scan
    frames, energies = integrate_sde_overdamped(
        DoubleWell(), n_steps=args.n_steps, sampling_output_path=args.outdir,
        step_size=0.005, report_interval=100, seed=7,
        n_chains=args.n_chains, verbose=False,
    )
    print(f"replica trajectories: {frames.shape}")

    # 2. concatenate replicas into one weighted dataset
    flat = frames.reshape(-1, frames.shape[-1])
    traj = WeightedTrajectory(
        trajectory=flat, dt=0.5, verbose=False
    )

    # 3. data-parallel eigenfunction training over the mesh
    k = 2
    model = EigenFunctions([2, 20, 20, 1], k, seed=0)
    batch = 128 * len(devices)
    task = EigenFunctionTask(
        traj, None, model, model_path=os.path.join(args.outdir, "train"),
        alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.5, k=k,
        learning_rate=0.005, batch_size=batch, num_epochs=args.epochs,
        test_ratio=0.2, save_model_every_step=0, verbose=False,
        tensorboard=False, seed=0, mesh=mesh,
    )
    task.train()
    print(task.train_loss_df.tail(3))

    # 4. alternative sweep formulation: train one task PER replica, all
    # advancing in lock-step inside ONE vmapped compiled program
    from colvarsfinder_tpu.parallel import train_replica_ensemble

    per_replica = [
        EigenFunctionTask(
            WeightedTrajectory(trajectory=frames[c], dt=0.5, verbose=False),
            None, EigenFunctions([2, 20, 20, 1], k, seed=c),
            os.path.join(args.outdir, f"replica{c}"),
            alpha=10.0, eig_weights=[1.0, 0.5], lag_tau=0.5, k=k,
            learning_rate=0.005, batch_size=128, num_epochs=args.epochs,
            test_ratio=0.2, save_model_every_step=0, verbose=False,
            tensorboard=False, seed=c,
        )
        for c in range(min(4, args.n_chains))
    ]
    train_replica_ensemble(per_replica)
    print(
        "per-replica final losses (one vmapped program):",
        [round(float(t.train_loss_df['loss'].iloc[-1]), 3)
         for t in per_replica],
    )
    print(
        "mean epoch time: %.1f ms"
        % (1000 * np.mean(task.epoch_times[1:]))
    )

    # 5. hyperparameter sweep: an lr x alpha grid trained as ONE vmapped
    # program, the batch data SHARED on device across all grid points
    # (in_axes=None). This is the chip-filling formulation — a 64-point
    # grid at full dipeptide scale costs ~2 s on one v5e chip
    # (benchmarks/sweep_bench.py)
    from colvarsfinder_tpu.parallel import (
        adopt_sweep_result,
        train_hyperparameter_sweep,
    )

    lrs = [1e-3, 3e-3, 1e-2]
    alphas = [5.0, 10.0, 20.0]
    grid = {
        "learning_rate": [lr for lr in lrs for _ in alphas],
        "alpha": [a for _ in lrs for a in alphas],
    }
    # sweep over the first replica's (single-device) task: the replica
    # axis and the mesh axis are separate levers — combine deliberately
    results = train_hyperparameter_sweep(per_replica[0], grid)
    best = min(
        results, key=lambda r: float(r.train_loss_df["loss"].iloc[-1])
    )
    print(
        f"sweep over {len(results)} (lr, alpha) points -> best "
        f"{best.hyperparams} with final loss "
        f"{float(best.train_loss_df['loss'].iloc[-1]):.4f}"
    )
    # load the winner back into the task; its normal surface (export,
    # checkpointing, continued training) now operates on that replica
    adopt_sweep_result(per_replica[0], best)
    # the slowest mode of the double well is the x-barrier crossing; the
    # leading eigenfunction should correlate with x
    cv = task.colvar_model()
    xs = np.linspace(-1.5, 1.5, 11, dtype=np.float32)
    grid = np.stack([xs, np.zeros_like(xs)], axis=1)
    vals = np.asarray(cv(grid))[:, 0]
    print("leading CV along x:", np.round(vals, 3))


if __name__ == "__main__":
    main()
