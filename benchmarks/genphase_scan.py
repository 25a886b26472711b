"""In-scan phase decomposition of the GENERATOR (gram-path) training
step at dipeptide scale (round-4 verdict weak #3: the 12.9M-sps
generator number had no per-phase breakdown to justify the 5.2x gap vs
the 67M-sps transfer-op step).

Same methodology as benchmarks/phase_scan.py: each phase runs as a scan
of ITERS iterations inside ONE dispatch (per-dispatch round-trips would
swamp sub-ms phases through the tunnel); the warmup + measurement
barriers are host fetches.

Phases (B=20k, d_r=30, k=2, dims [30,20,20,20,1]):
  * mlp_fwd            — model(H) on precomputed features
  * model_jacrev       — G = jacrev of the batched head sums [k, B, d_r]
                         (the k extra backward passes the generator pays)
  * quadform           — einsum('kbi,bij,kbj->bk', G, M, G): the
                         Dirichlet quadratic form against the [B, 30, 30]
                         precomputed pp Gram
  * gram_read          — M.sum((1,2)): pure HBM-traffic probe of the
                         72 MB/step Gram fetch (the bandwidth floor)
  * loss_forward_gram  — full generator loss forward (gram mode)
  * grad_step_gram     — full generator gradient step (gram mode) = the
                         production step the 12.9M sps number measures
  * grad_step_vjp      — full generator step via the vjp path through
                         the real alignment+features pp (the non-gram
                         alternative, for the 1.61x context)
  * grad_step_transfer — the transfer-op step on the same shapes (the
                         67M-sps headline's step), for the 5.2x ratio

Run: python benchmarks/genphase_scan.py            (real TPU)
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
ITERS = 60

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from colvarsfinder_tpu.core.eigenfunction import _gram_fn
    from colvarsfinder_tpu.core.losses import eigen_loss
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    rng = np.random.default_rng(0)
    ref = rng.standard_normal((N_ATOMS, 3)).astype(np.float32)
    X = jnp.asarray(
        (ref[None] + 0.3 * rng.standard_normal((BATCH, N_ATOMS, 3))
         ).astype(np.float32)
    )
    w = jnp.ones((BATCH,), jnp.float32)
    align = AlignmentLayer(ref, align_indices=list(range(N_ATOMS)))
    feat = FeatureLayer([Feature("p", "position", list(range(N_ATOMS)))])
    pp = PreprocessingANN(align, feat)
    model = EigenFunctions([D_R, 20, 20, 20, 1], k=K, seed=0)
    optimizer = optax.adam(2e-3)
    opt_state = optimizer.init(model)
    diag = jnp.ones((D_R,), jnp.float32)

    gf = _gram_fn((N_ATOMS, 3), D_R)
    H, M = gf(pp, diag, X.reshape(BATCH, -1))
    H = jax.device_put(H)
    M = jax.device_put(M)

    def timed_scan(name, body, init):
        @jax.jit
        def run(c):
            def step(c, i):
                return body(c, i), 0.0

            c, _ = jax.lax.scan(step, c, jnp.arange(ITERS))
            return c

        c = run(init)
        np.asarray(jax.tree_util.tree_leaves(c)[0])
        t0 = time.perf_counter()
        c = run(init)
        np.asarray(jax.tree_util.tree_leaves(c)[0])
        ms = 1000 * (time.perf_counter() - t0) / ITERS
        log(f"{name:34s} {ms:8.3f} ms/iter")
        return ms

    results = {}
    z = jnp.zeros((1, 1), jnp.float32)

    results["mlp_fwd"] = timed_scan(
        "MLP fwd (precomp feats)",
        lambda c, i: c + model(H + 0.0 * c[0, 0]).sum(0, keepdims=True)[:, :1],
        z,
    )

    def jac_body(c, i):
        G = jax.jacrev(lambda h: model(h).sum(axis=0))(H + 0.0 * c)
        return c + G.sum()

    results["model_jacrev"] = timed_scan(
        "model-only jacrev [k,B,d_r]", jac_body, jnp.zeros((), jnp.float32)
    )

    G0 = jax.jacrev(lambda h: model(h).sum(axis=0))(H)
    G0 = jax.device_put(G0)

    def quad_body(c, i):
        from colvarsfinder_tpu.config import matmul_precision

        q = jnp.einsum(
            "kbi,bij,kbj->bk", G0 + 0.0 * c, M, G0,
            precision=matmul_precision(),
        )
        return c + q.sum() * 0.0 + q.mean()

    results["quadform"] = timed_scan(
        "quadratic form G M G^T", quad_body, jnp.zeros((), jnp.float32)
    )

    results["gram_read"] = timed_scan(
        "Gram HBM read probe (M.sum)",
        lambda c, i: c + M.sum() * 0.0 + (M * (1.0 + 0.0 * c)).sum(),
        jnp.zeros((), jnp.float32),
    )

    def loss_gram(m):
        loss, _ = eigen_loss(
            m, None, H, w, None, None, k=K, alpha=20.0, eig_w=[1.0, 0.2],
            beta=1.0, diag_coeff=None, lag_idx=0, traj_dt=0.002,
            sort_eigvals=True, pp_gram=M,
        )
        return loss

    results["loss_forward_gram"] = timed_scan(
        "full gram loss forward",
        lambda c, i: c + loss_gram(jax.tree_util.tree_map(
            lambda p: p + 0.0 * c[0, 0], model)),
        z,
    )

    def step_of(loss_fn):
        def body(carry, i):
            m, os_ = carry
            _, grads = jax.value_and_grad(loss_fn)(m)
            updates, os_ = optimizer.update(grads, os_, m)
            return (optax.apply_updates(m, updates), os_)

        return body

    results["grad_step_gram"] = timed_scan(
        "FULL gram generator step", step_of(loss_gram),
        (model, opt_state),
    )

    def loss_vjp(m):
        loss, _ = eigen_loss(
            m, pp, X, w, None, None, k=K, alpha=20.0, eig_w=[1.0, 0.2],
            beta=1.0, diag_coeff=diag, lag_idx=0, traj_dt=0.002,
            sort_eigvals=True,
        )
        return loss

    results["grad_step_vjp"] = timed_scan(
        "FULL vjp generator step", step_of(loss_vjp), (model, opt_state)
    )

    Xl = jnp.asarray(
        (ref[None] + 0.3 * rng.standard_normal((BATCH, N_ATOMS, 3))
         ).astype(np.float32)
    )

    def loss_top(m):
        loss, _ = eigen_loss(
            m, pp, X, w, Xl, w, k=K, alpha=20.0, eig_w=[1.0, 0.2],
            beta=1.0, diag_coeff=None, lag_idx=5, traj_dt=0.002,
            sort_eigvals=True,
        )
        return loss

    results["grad_step_transfer"] = timed_scan(
        "FULL transfer-op step (headline)", step_of(loss_top),
        (model, opt_state),
    )

    # floor accounting
    m_bytes = BATCH * D_R * D_R * 4
    log(f"\nGram tensor M: {m_bytes / 2**20:.0f} MiB/step of HBM reads "
        f"(+ G materialization [k,B,d_r]); at ~800 GB/s that is "
        f"{1000 * m_bytes / 800e9:.3f} ms/step of pure bandwidth floor")
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
