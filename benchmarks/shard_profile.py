"""Profile the frame-sharded trajectory layout (shard_trajectory=True) at a
size that exceeds one device's memory share.

Runs on the virtual 8-device CPU mesh (no multi-chip hardware here — ICI
costs cannot be measured, but the collective *structure* and the memory
claim can): a 1M-frame x 64-dim f32 trajectory (256 MB) is held replicated
vs sharded P('data') (32 MB/device), and one transfer-operator training
step is timed in each layout.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python benchmarks/shard_profile.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from colvarsfinder_tpu.core.losses import eigen_loss  # noqa: E402
from colvarsfinder_tpu.models import EigenFunctions  # noqa: E402
from colvarsfinder_tpu.parallel import make_data_mesh  # noqa: E402

N, D, K, LAG, BATCH = 1_000_000, 64, 2, 10, 16_384


def step_time(traj, weights, mesh, steps=20):
    model = EigenFunctions([D, 20, 20, 1], k=K, seed=0)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(model)
    repl = NamedSharding(mesh, P())
    model = jax.device_put(model, repl)
    opt_state = jax.device_put(opt_state, repl)
    idx = jax.device_put(
        jnp.arange(BATCH, dtype=jnp.int32), NamedSharding(mesh, P("data"))
    )

    def loss_fn(m, idx):
        X, w = traj[idx], weights[idx]
        X_l, w_l = traj[idx + LAG], weights[idx + LAG]
        loss, _ = eigen_loss(
            m, lambda z: z, X, w, X_l, w_l, k=K, alpha=10.0,
            eig_w=[1.0, 0.5], beta=1.0, diag_coeff=None, lag_idx=LAG,
            traj_dt=0.1, sort_eigvals=True,
        )
        return loss

    @jax.jit
    def train_step(m, os_, idx):
        loss, grads = jax.value_and_grad(loss_fn)(m, idx)
        updates, os_ = optimizer.update(grads, os_, m)
        return optax.apply_updates(m, updates), os_, loss

    model, opt_state, loss = train_step(model, opt_state, idx)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        model, opt_state, loss = train_step(model, opt_state, idx)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / steps, float(loss)


def main():
    mesh = make_data_mesh(jax.devices()[:8])
    rng = np.random.default_rng(0)
    traj_np = rng.standard_normal((N, D)).astype(np.float32)
    weights_np = np.ones(N, dtype=np.float32)
    bytes_total = traj_np.nbytes
    print(
        f"trajectory: {N:,} x {D} f32 = {bytes_total / 1e6:.0f} MB "
        f"({bytes_total / 8e6:.0f} MB/device sharded)", file=sys.stderr,
    )

    results = {}
    for name, spec in (("replicated", P()), ("frame_sharded", P("data"))):
        traj = jax.device_put(jnp.asarray(traj_np),
                              NamedSharding(mesh, spec))
        weights = jax.device_put(jnp.asarray(weights_np),
                                 NamedSharding(mesh, spec))
        dt, loss = step_time(traj, weights, mesh)
        per_dev = traj.addressable_shards[0].data.nbytes
        results[name] = {
            "step_ms": round(1000 * dt, 2),
            "traj_bytes_per_device": per_dev,
            "loss": round(loss, 6),
        }
        print(
            f"{name:14s} step {1000 * dt:7.2f} ms  "
            f"traj {per_dev / 1e6:6.1f} MB/device  loss {loss:.6f}",
            file=sys.stderr,
        )
    results["gather_overhead"] = round(
        results["frame_sharded"]["step_ms"] / results["replicated"]["step_ms"],
        2,
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
