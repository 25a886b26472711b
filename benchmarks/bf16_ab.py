"""Same-process A/B: float32 vs bfloat16 compute mode on the single-task
headline workload (bench.py's dipeptide transfer-op config).

The ensemble microbench showed the training step is HBM-bandwidth-bound
on activation traffic (benchmarks/ensemble_layout_ab.py: bf16 2.0x on
the core math at both R=1 and R=64). This measures the REAL step — pp
layer (QCP alignment), adam, eigenvalue sorting, metrics — interleaved
in one process per the tunnel-drift rule, long dispatch windows
(bench.py MEASURE_STEPS).

Also reports the final-epoch loss difference between the two modes (the
numerics price of the fast mode on a real training run).

Usage: python benchmarks/bf16_ab.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def build_train_run(mode: str):
    """Build a freshly-jitted multi-epoch runner traced under ``mode``.

    compute_dtype is read at TRACE time, so each mode needs its own jit
    wrapper (toggling the config between calls of one cached jit would be
    silently ignored).
    """
    import jax
    import optax

    from colvarsfinder_tpu.config import set_compute_dtype
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

    @partial(jax.jit, static_argnames="n_epochs")
    def train_run(m, os_, pp, batches, n_epochs):
        set_compute_dtype(mode)  # trace-time switch
        try:
            def epoch(carry, _):
                m, os_ = carry
                for batch in batches:
                    loss, grads = jax.value_and_grad(batch_loss)(
                        m, pp, batch
                    )
                    updates, os_ = optimizer.update(grads, os_, m)
                    m = optax.apply_updates(m, updates)
                return (m, os_), loss

            (m, os_), losses = jax.lax.scan(
                epoch, (m, os_), None, length=n_epochs
            )
        finally:
            set_compute_dtype("float32")
        return m, os_, losses

    return train_run, optimizer


def main():
    import jax
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
    for mode in ("float32", "bfloat16"):
        train_run, optimizer = build_train_run(mode)
        model = EigenFunctions([bench.D_R, 20, 20, 20, 1], k=bench.K, seed=0)
        opt_state = optimizer.init(model)
        t0 = time.perf_counter()
        model, opt_state, losses = train_run(
            model, opt_state, pp, batches, n_epochs=n_epochs
        )
        _ = np.asarray(losses)
        log(f"{mode}: compiled + warm run in {time.perf_counter()-t0:.1f}s")
        runs[mode] = [train_run, model, opt_state, None, float("inf")]

    last_losses = {}
    for rep in range(bench.MEASURE_REPS):
        for mode, st in runs.items():
            train_run, model, opt_state, _, best = st
            t0 = time.perf_counter()
            model, opt_state, losses = train_run(
                model, opt_state, pp, batches, n_epochs=n_epochs
            )
            losses = np.asarray(losses)  # completion barrier
            dt = time.perf_counter() - t0
            st[1], st[2] = model, opt_state
            st[4] = min(best, dt)
            last_losses[mode] = losses
            steps = n_epochs * nb
            log(f"rep{rep} {mode:9s} {dt/steps*1e3:7.4f} ms/step "
                f"({steps*bench.BATCH/dt/1e6:6.1f}M sps, "
                f"loss {losses[-1]:.6f})")

    steps = n_epochs * nb
    f32 = runs["float32"][4] / steps
    b16 = runs["bfloat16"][4] / steps
    # the two modes train INDEPENDENT models, so compare the whole
    # per-epoch loss trajectory of the last rep, not one noisy endpoint
    traj = np.abs(last_losses["bfloat16"] - last_losses["float32"]) / (
        np.abs(last_losses["float32"]) + 1e-12
    )
    print(f'{{"metric": "single-task transfer-op step, bf16 vs f32", '
          f'"f32_ms_per_step": {f32*1e3:.4f}, '
          f'"bf16_ms_per_step": {b16*1e3:.4f}, '
          f'"speedup": {f32/b16:.3f}, '
          f'"f32_sps": {bench.BATCH/f32:.0f}, '
          f'"bf16_sps": {bench.BATCH/b16:.0f}, '
          f'"loss_traj_rel_diff_median": {float(np.median(traj)):.2e}, '
          f'"loss_traj_rel_diff_max": {float(np.max(traj)):.2e}}}')


if __name__ == "__main__":
    main()
