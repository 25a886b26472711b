"""Same-process A/B of QCP Newton differentiation modes.

Cross-run comparisons through the TPU tunnel are unreliable (±30-50%
backend drift observed within one hour), so this measures BOTH Newton
differentiation modes for BOTH loss paths in ONE process, interleaved:

* transfer-op step (the bench.py headline): backward through alignment
  once per step.
* generator step (jacrev_batch formulation from losses.eigen_loss):
  double backprop through alignment.

Modes: diff_steps=0 (fully differentiable 16-step unroll) vs
diff_steps=2 (implicit: stop-gradient convergence + 2 differentiable
tail steps).

Usage: python benchmarks/qcp_ab.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

log = lambda *a: print(*a, file=sys.stderr, flush=True)

STEPS = 30


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from colvarsfinder_tpu.core.losses import eigen_loss
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )
    from colvarsfinder_tpu.ops import alignment as _align

    ref, traj_np, weights_np = bench.make_data()
    align = AlignmentLayer(ref, align_indices=list(range(bench.N_ATOMS)))
    feat = FeatureLayer([Feature("p", "position", list(range(bench.N_ATOMS)))])
    pp = PreprocessingANN(align, feat)
    model0 = EigenFunctions([bench.D_R, 20, 20, 20, 1], k=bench.K, seed=0)
    optimizer = optax.adam(bench.LR)

    B = bench.BATCH
    X = jnp.asarray(traj_np[:B])
    X_l = jnp.asarray(traj_np[bench.LAG:B + bench.LAG])
    w = jnp.asarray(weights_np[:B])
    w_l = jnp.asarray(weights_np[bench.LAG:B + bench.LAG])

    def loss_fn(m, lag_idx):
        loss, _ = eigen_loss(
            m, pp, X, w, X_l if lag_idx else None, w_l if lag_idx else None,
            k=bench.K, alpha=bench.ALPHA, eig_w=bench.EIG_W, beta=1.0,
            diag_coeff=None, lag_idx=lag_idx, traj_dt=bench.TRAJ_DT,
            sort_eigvals=True,
        )
        return loss

    def make_run(lag_idx):
        lf = partial(loss_fn, lag_idx=lag_idx)

        @partial(jax.jit, static_argnames="n")
        def run(m, os_, n):
            def step(carry, _):
                m, os_ = carry
                loss, grads = jax.value_and_grad(lf)(m)
                updates, os_ = optimizer.update(grads, os_, m)
                m = optax.apply_updates(m, updates)
                return (m, os_), loss

            (m, os_), losses = jax.lax.scan(step, (m, os_), None, length=n)
            return m, os_, losses

        return run

    def measure(run):
        m = jax.tree.map(lambda a: a, model0)
        os_ = optimizer.init(m)
        m, os_, losses = run(m, os_, STEPS)
        _ = np.asarray(losses)  # compile + warm
        t0 = time.perf_counter()
        m, os_, losses = run(m, os_, STEPS)
        l = np.asarray(losses)
        dt = time.perf_counter() - t0
        return dt / STEPS * 1e3, float(l[0])

    # interleave: mode0-transfer, mode2-transfer, mode0-gen, mode2-gen,
    # then a second timing round in reverse order to cancel drift
    runs = {}
    for mode in (0, 2):
        _align.DEFAULT_NEWTON_DIFF_STEPS = mode
        runs[("transfer", mode)] = make_run(bench.LAG)
        runs[("gen", mode)] = make_run(0)
    _align.DEFAULT_NEWTON_DIFF_STEPS = 0

    results = {k: [] for k in runs}
    losses0 = {}
    for order in (list(runs), list(runs)[::-1], list(runs)):
        for key in order:
            ms, l0 = measure(runs[key])
            results[key].append(ms)
            losses0[key] = l0

    out = {}
    for (path, mode), times in results.items():
        best = min(times)
        out[f"{path}_mode{mode}"] = best
        log(f"{path:8s} diff_steps={mode}: best {best:7.3f} ms/step "
            f"(runs: {', '.join(f'{t:.3f}' for t in times)}; "
            f"loss step0 {losses0[(path, mode)]:.6f})")
    for path in ("transfer", "gen"):
        log(f"  {path}: implicit/unroll = "
            f"{out[f'{path}_mode2'] / out[f'{path}_mode0']:.3f}x time")
    print(
        '{"metric": "qcp newton mode A/B (ms/step, best-of-3)", '
        + ", ".join(f'"{k}": {v:.3f}' for k, v in out.items())
        + "}"
    )


if __name__ == "__main__":
    main()
