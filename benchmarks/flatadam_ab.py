"""Same-process A/B: per-leaf optax.adam vs a flat-raveled adam on the
single-task headline step.

Hypothesis: the single-task transfer-op step (~0.30 ms at batch 20k) is
bounded by serial kernel latency, and the optimizer contributes a large
kernel count — adam over ~16 model leaves compiles to a fusion (or two)
per leaf, each a few microseconds of fixed dispatch on this backend.
Raveling the gradient pytree into ONE vector (jax.flatten_util.
ravel_pytree), updating a single flat (m, v, p) triple, and unraveling
for the matmuls collapses those into a handful of kernels.

Interleaved in one process per the tunnel-drift rule; long dispatch
windows (bench.py MEASURE_STEPS). Parity: both variants must match
per-step losses to f32 tolerance (the update math is identical — adam
is elementwise, so leaf order/packing cannot change results beyond
reassociation of nothing: there are no reductions across leaves).

Usage: python benchmarks/flatadam_ab.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def build(variant: str):
    """Return (train_run, init_state) for 'leaf' or 'flat' adam."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.flatten_util import ravel_pytree

    from colvarsfinder_tpu.core.losses import eigen_loss

    def batch_loss(m, pp, batch):
        X, X_l, w, w_l = batch
        loss, _ = eigen_loss(
            m, pp, X, w, X_l, w_l,
            k=bench.K, alpha=bench.ALPHA, eig_w=bench.EIG_W, beta=1.0,
            diag_coeff=None, lag_idx=bench.LAG, traj_dt=bench.TRAJ_DT,
            sort_eigvals=True,
        )
        return loss

    optimizer = optax.adam(bench.LR)

    if variant == "leaf":
        def init_state(model):
            return optimizer.init(model)

        @partial(jax.jit, static_argnames="n_epochs")
        def train_run(m, os_, pp, batches, n_epochs):
            def epoch(carry, _):
                m, os_ = carry
                for batch in batches:
                    loss, grads = jax.value_and_grad(batch_loss)(m, pp, batch)
                    updates, os_ = optimizer.update(grads, os_, m)
                    m = optax.apply_updates(m, updates)
                return (m, os_), loss

            (m, os_), losses = jax.lax.scan(
                epoch, (m, os_), None, length=n_epochs
            )
            return m, os_, losses

        return train_run, init_state

    # flat: parameters live as ONE raveled vector in the carry; the
    # model pytree is rebuilt (pure reshapes/slices, fused into the
    # matmuls by XLA) inside the loss.
    def init_state(model):
        flat, _ = ravel_pytree(model)
        return optimizer.init(flat)

    @partial(jax.jit, static_argnames="n_epochs")
    def train_run(m, os_, pp, batches, n_epochs):
        flat0, unravel = ravel_pytree(m)

        def epoch(carry, _):
            flat, os_ = carry
            for batch in batches:
                loss, gflat = jax.value_and_grad(
                    lambda f: batch_loss(unravel(f), pp, batch)
                )(flat)
                updates, os_ = optimizer.update(gflat, os_, flat)
                flat = optax.apply_updates(flat, updates)
            return (flat, os_), loss

        (flat, os_), losses = jax.lax.scan(
            epoch, (flat0, os_), None, length=n_epochs
        )
        return unravel(flat), os_, losses

    return train_run, init_state


def main():
    import jax.numpy as jnp

    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    ref, traj_np, weights_np = bench.make_data()
    align = AlignmentLayer(ref, align_indices=list(range(bench.N_ATOMS)))
    feat = FeatureLayer(
        [Feature("p", "position", list(range(bench.N_ATOMS)))]
    )
    pp = PreprocessingANN(align, feat)

    nb = (bench.N_FRAMES - bench.LAG) // bench.BATCH
    flat = traj_np.reshape(bench.N_FRAMES, -1)
    B, A = bench.BATCH, bench.N_ATOMS
    batches = tuple(
        (
            jnp.asarray(flat[i * B:(i + 1) * B].reshape(B, A, 3)),
            jnp.asarray(
                flat[i * B + bench.LAG:(i + 1) * B + bench.LAG].reshape(
                    B, A, 3)),
            jnp.asarray(weights_np[i * B:(i + 1) * B]),
            jnp.asarray(
                weights_np[i * B + bench.LAG:(i + 1) * B + bench.LAG]),
        )
        for i in range(nb)
    )
    n_epochs = max(1, bench.MEASURE_STEPS // nb)

    runs = {}
    for variant in ("leaf", "flat"):
        train_run, init_state = build(variant)
        model = EigenFunctions(
            [bench.D_R, 20, 20, 20, 1], k=bench.K, seed=0
        )
        opt_state = init_state(model)
        t0 = time.perf_counter()
        model, opt_state, losses = train_run(
            model, opt_state, pp, batches, n_epochs=n_epochs
        )
        _ = np.asarray(losses)
        log(f"{variant}: compiled + warm run in {time.perf_counter()-t0:.1f}s")
        runs[variant] = [train_run, model, opt_state, None, float("inf")]

    last_losses = {}
    for rep in range(bench.MEASURE_REPS):
        for variant, st in runs.items():
            train_run, model, opt_state, _, best = st
            t0 = time.perf_counter()
            model, opt_state, losses = train_run(
                model, opt_state, pp, batches, n_epochs=n_epochs
            )
            losses = np.asarray(losses)
            dt = time.perf_counter() - t0
            st[1], st[2] = model, opt_state
            st[4] = min(best, dt)
            last_losses[variant] = losses
            steps = n_epochs * nb
            log(f"rep{rep} {variant:5s} {dt/steps*1e3:7.4f} ms/step "
                f"({steps*bench.BATCH/dt/1e6:6.1f}M sps, "
                f"loss {losses[-1]:.6f})")

    steps = n_epochs * nb
    leaf = runs["leaf"][4] / steps
    flat_t = runs["flat"][4] / steps
    # identical elementwise math — require tight trajectory agreement
    rel = float(np.max(np.abs(last_losses["flat"] - last_losses["leaf"])
                       / np.maximum(np.abs(last_losses["leaf"]), 1e-12)))
    print(f'{{"metric": "single-task step, flat-raveled adam vs per-leaf", '
          f'"leaf_ms_per_step": {leaf*1e3:.4f}, '
          f'"flat_ms_per_step": {flat_t*1e3:.4f}, '
          f'"speedup": {leaf/flat_t:.3f}, '
          f'"loss_traj_max_rel_diff": {rel:.2e}}}')


if __name__ == "__main__":
    main()
