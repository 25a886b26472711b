"""In-scan phase decomposition of the headline training step.

The earlier per-phase table (perf_sweep.phase_breakdown) timed each phase
as its own dispatched program; through the TPU tunnel every dispatch costs
~1 ms of host round-trip, which swamps sub-millisecond phases. Here each
phase runs as a scan of ITERS iterations inside ONE dispatch, so the
per-iteration cost is true device time.

Run: python benchmarks/phase_scan.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

N_ATOMS = 10
D_R = 30
K = 2
BATCH = 20_000
LAG = 5
ITERS = 60

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from colvarsfinder_tpu.core.losses import eigen_loss
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    rng = np.random.default_rng(0)
    ref = rng.standard_normal((N_ATOMS, 3)).astype(np.float32)
    X = jnp.asarray(
        (ref[None] + 0.3 * rng.standard_normal((BATCH, N_ATOMS, 3))).astype(
            np.float32
        )
    )
    Xl = jnp.asarray(
        (ref[None] + 0.3 * rng.standard_normal((BATCH, N_ATOMS, 3))).astype(
            np.float32
        )
    )
    w = jnp.ones((BATCH,), jnp.float32)

    align = AlignmentLayer(ref, align_indices=list(range(N_ATOMS)))
    feat = FeatureLayer([Feature("p", "position", list(range(N_ATOMS)))])
    pp = PreprocessingANN(align, feat)
    model = EigenFunctions([D_R, 20, 20, 20, 1], k=K, seed=0)
    optimizer = optax.adam(2e-3)
    opt_state = optimizer.init(model)

    def loss_fn(m):
        loss, _ = eigen_loss(
            m, pp, X, w, Xl, w, k=K, alpha=20.0, eig_w=[1.0, 0.2],
            beta=1.0, diag_coeff=None, lag_idx=LAG, traj_dt=0.002,
            sort_eigvals=True,
        )
        return loss

    def timed_scan(name, body, init):
        """Scan `body` ITERS times in one dispatch; return ms/iter."""

        @jax.jit
        def run(c):
            def step(c, i):
                # fold the iteration index in so XLA cannot hoist the body
                return body(c, i), 0.0

            c, _ = jax.lax.scan(step, c, jnp.arange(ITERS))
            return c

        c = run(init)
        np.asarray(jax.tree_util.tree_leaves(c)[0])  # host-fetch warmup barrier
        t0 = time.perf_counter()
        c = run(init)
        np.asarray(jax.tree_util.tree_leaves(c)[0])  # host-fetch barrier
        ms = 1000 * (time.perf_counter() - t0) / ITERS
        log(f"{name:32s} {ms:8.3f} ms/iter")
        return ms

    results = {}

    # phase: alignment + features, one pass
    results["align_features_1pass"] = timed_scan(
        "align+features (1 pass)",
        lambda c, i: c + pp(X + 0.0 * c[0, 0]).sum(0, keepdims=True)[:, :1],
        jnp.zeros((1, 1), jnp.float32),
    )

    # phase: MLP forward on precomputed features, one pass
    F = pp(X)
    results["mlp_1pass"] = timed_scan(
        "MLP fwd (1 pass, precomp feats)",
        lambda c, i: c + model(F + 0.0 * c[0, 0]).sum(0, keepdims=True)[:, :1],
        jnp.zeros((1, 1), jnp.float32),
    )

    # phase: full loss forward (2 passes + reductions)
    results["loss_forward"] = timed_scan(
        "full loss forward",
        lambda c, i: c + loss_fn(jax.tree_util.tree_map(
            lambda p: p + 0.0 * c[0, 0], model)),
        jnp.zeros((1, 1), jnp.float32),
    )

    # phase: full gradient step
    def grad_step(carry, i):
        m, os_ = carry
        loss, grads = jax.value_and_grad(
            lambda mm: loss_fn(mm)
        )(m)
        updates, os_ = optimizer.update(grads, os_, m)
        return (optax.apply_updates(m, updates), os_)

    results["grad_step"] = timed_scan(
        "full gradient step", grad_step, (model, opt_state)
    )

    # variant: alignment via one flattened covariance matmul is already the
    # default; compare svd vs quaternion alignment inside the full step
    align_svd = AlignmentLayer(ref, align_indices=list(range(N_ATOMS)),
                               method="svd")
    pp_svd = PreprocessingANN(align_svd, feat)

    def loss_svd(m):
        loss, _ = eigen_loss(
            m, pp_svd, X, w, Xl, w, k=K, alpha=20.0, eig_w=[1.0, 0.2],
            beta=1.0, diag_coeff=None, lag_idx=LAG, traj_dt=0.002,
            sort_eigvals=True,
        )
        return loss

    def grad_step_svd(carry, i):
        m, os_ = carry
        loss, grads = jax.value_and_grad(loss_svd)(m)
        updates, os_ = optimizer.update(grads, os_, m)
        return (optax.apply_updates(m, updates), os_)

    results["grad_step_svd_align"] = timed_scan(
        "full gradient step (svd align)", grad_step_svd, (model, opt_state)
    )

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__" and "--ablation" not in sys.argv:
    main()


def ablation():
    """Where does the 0.79 ms step go? Scale batch and strip components
    (fixed single batch, no slicing, in-scan timing). If time is flat in
    batch size, per-kernel overhead dominates; if linear, bandwidth/
    compute. Run: python -c "import sys; sys.path.insert(0,'benchmarks');
    import phase_scan; phase_scan.ablation()"
    """
    import jax
    import jax.numpy as jnp
    import optax

    from colvarsfinder_tpu.core.losses import eigen_loss
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    rng = np.random.default_rng(0)
    ref = rng.standard_normal((N_ATOMS, 3)).astype(np.float32)
    align = AlignmentLayer(ref, align_indices=list(range(N_ATOMS)))
    feat = FeatureLayer([Feature("p", "position", list(range(N_ATOMS)))])
    pp_full = PreprocessingANN(align, feat)
    optimizer = optax.adam(2e-3)

    def step_time(batch, pp, k, lagged, iters=60):
        model = EigenFunctions([D_R, 20, 20, 20, 1], k=k, seed=0)
        opt_state = optimizer.init(model)
        if pp is None:
            X = jnp.asarray(rng.standard_normal((batch, D_R)), jnp.float32)
            Xl = jnp.asarray(rng.standard_normal((batch, D_R)), jnp.float32)
            use_pp = lambda z: z
        else:
            X = jnp.asarray(
                (ref[None] + 0.3 * rng.standard_normal(
                    (batch, N_ATOMS, 3))).astype(np.float32))
            Xl = jnp.asarray(
                (ref[None] + 0.3 * rng.standard_normal(
                    (batch, N_ATOMS, 3))).astype(np.float32))
            use_pp = pp
        w = jnp.ones((batch,), jnp.float32)

        def loss_fn(m):
            loss, _ = eigen_loss(
                m, use_pp, X, w, Xl if lagged else None,
                w if lagged else None, k=k, alpha=20.0,
                eig_w=[1.0, 0.2][:k], beta=1.0,
                diag_coeff=jnp.ones(X.shape[-1] if pp is None else D_R)
                if not lagged else None,
                lag_idx=LAG if lagged else 0, traj_dt=0.002,
                sort_eigvals=True,
            )
            return loss

        @jax.jit
        def run(m, os_):
            def body(carry, i):
                m, os_ = carry
                loss, grads = jax.value_and_grad(
                    lambda mm: loss_fn(jax.tree_util.tree_map(
                        lambda p: p + 0.0 * jnp.float32(i), mm))
                )(m)
                updates, os_ = optimizer.update(grads, os_, m)
                return (optax.apply_updates(m, updates), os_), loss

            (m, os_), losses = jax.lax.scan(
                body, (m, os_), jnp.arange(iters)
            )
            return losses

        losses = run(model, opt_state)
        np.asarray(losses)
        t0 = time.perf_counter()
        losses = run(model, opt_state)
        np.asarray(losses)
        return 1000 * (time.perf_counter() - t0) / iters

    log("batch scaling (full step, transfer-op, k=2, align+features):")
    for b in (5_000, 10_000, 20_000, 40_000, 80_000):
        ms = step_time(b, pp_full, 2, True)
        log(f"  batch {b:6d}: {ms:6.3f} ms/step  "
            f"({b / ms * 1000 / 1e6:6.1f}M sps)")
    log("component ablation at batch 20k:")
    for name, pp, k, lagged in (
        ("full (align+feat, k=2, lagged)", pp_full, 2, True),
        ("identity pp (precomp feats)", None, 2, True),
        ("k=1 heads", pp_full, 1, True),
    ):
        ms = step_time(20_000, pp, k, lagged)
        log(f"  {name:34s} {ms:6.3f} ms/step")


if __name__ == "__main__" and "--ablation" in sys.argv:
    ablation()
