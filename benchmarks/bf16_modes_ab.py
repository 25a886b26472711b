"""Same-process A/B of the bfloat16 arithmetic styles on the headline
workload: float32 vs bf16/pure vs bf16/acc32 vs bf16/w32.

Motivation: the original bf16 mode ('pure' — bf16 weights, bf16
accumulation) measured 2.21x per step on TPU but its loss trajectory
diverged from f32 by median 33% on hardware (benchmarks/RESULTS.md,
pending-ledger table). The divergence has three candidate sources —
weight quantization, bf16 accumulation, activation storage — and only
the last one pays for the bandwidth win (weights are [30,20]-tiny;
accumulation is free in the MXU's native bf16xbf16->f32 path). The
'acc32' and 'w32' styles (config.set_bf16_style) remove the free noise
sources one at a time; this benchmark measures what each style costs in
throughput and buys in loss fidelity, interleaved in ONE process per
the tunnel-drift rule, long dispatch windows (bench.py MEASURE_STEPS).

Usage:
  python benchmarks/bf16_modes_ab.py            # real-chip perf + numerics
  python benchmarks/bf16_modes_ab.py --cpu      # CPU (bit-exact bf16), short
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

CPU = "--cpu" in sys.argv
if CPU:
    import jax

    jax.config.update("jax_platforms", "cpu")

import bench  # noqa: E402

log = lambda *a: print(*a, file=sys.stderr, flush=True)

MODES = (
    ("float32", "pure"),
    ("bfloat16", "pure"),
    ("bfloat16", "acc32"),
    ("bfloat16", "w32"),
)


def build_train_run(mode: str, style: str):
    """Freshly-jitted multi-epoch runner traced under (mode, style).

    compute_dtype/bf16_style are read at TRACE time, so each variant
    needs its own jit wrapper.
    """
    import jax
    import optax

    from colvarsfinder_tpu.config import set_bf16_style, set_compute_dtype
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
        set_bf16_style(style)
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
            set_bf16_style("pure")
        return m, os_, losses

    return train_run, optimizer


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
    measure_steps = 150 if CPU else bench.MEASURE_STEPS
    reps = 1 if CPU else bench.MEASURE_REPS
    n_epochs = max(1, measure_steps // nb)
    steps = n_epochs * nb

    runs = {}
    for mode, style in MODES:
        name = mode if mode == "float32" else f"bf16/{style}"
        train_run, optimizer = build_train_run(mode, style)
        model = EigenFunctions([bench.D_R, 20, 20, 20, 1], k=bench.K, seed=0)
        opt_state = optimizer.init(model)
        t0 = time.perf_counter()
        model, opt_state, losses = train_run(
            model, opt_state, pp, batches, n_epochs=n_epochs
        )
        _ = np.asarray(losses)
        log(f"{name}: compiled + warm run in {time.perf_counter()-t0:.1f}s")
        runs[name] = [train_run, model, opt_state, None, float("inf")]

    last_losses = {}
    for rep in range(reps):
        for name, st in runs.items():
            train_run, model, opt_state, _, best = st
            t0 = time.perf_counter()
            model, opt_state, losses = train_run(
                model, opt_state, pp, batches, n_epochs=n_epochs
            )
            losses = np.asarray(losses)  # completion barrier
            dt = time.perf_counter() - t0
            st[1], st[2] = model, opt_state
            st[4] = min(best, dt)
            last_losses[name] = losses
            log(f"rep{rep} {name:10s} {dt/steps*1e3:7.4f} ms/step "
                f"({steps*bench.BATCH/dt/1e6:6.1f}M sps, "
                f"loss {losses[-1]:.6f})")

    f32 = runs["float32"][4] / steps
    out = {
        "metric": "bf16 arithmetic styles on the transfer-op step"
                  + (" (CPU, bit-exact bf16)" if CPU else ""),
        "steps_per_dispatch": steps,
        "modes": {},
    }
    for name, st in runs.items():
        per = st[4] / steps
        # the modes train INDEPENDENT models: compare the whole per-epoch
        # loss trajectory of the last rep against f32's, not one endpoint
        traj = np.abs(last_losses[name] - last_losses["float32"]) / (
            np.abs(last_losses["float32"]) + 1e-12
        )
        out["modes"][name] = {
            "ms_per_step": round(per * 1e3, 4),
            "sps": round(bench.BATCH / per),
            "speedup_vs_f32": round(f32 / per, 3),
            "loss_traj_rel_diff_median": float(np.median(traj)),
            "loss_traj_rel_diff_max": float(np.max(traj)),
            "final_loss": float(last_losses[name][-1]),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
