"""Generator-loss jacobian ablation (round-3 VERDICT item #2).

The generator eigenfunction loss needs per-sample input jacobians of
f(x) = model(pp(x)) taken THROUGH the Kabsch alignment, with the outer
parameter gradient differentiating through them (double backprop;
reference core.py:424 + :517).  Round 2 shipped ``vmap(jacrev)`` at
3.47M samples/s vs 26.0M for the transfer-op path.  This script ablates
the candidate formulations at the headline scale (batch 20k, d_r = 30,
k = 2, [30,20,20,20,1] heads) and times the FULL training step
(value_and_grad + Adam) for each, plus loss-only diagnostics that
localize where the time goes.

Variants
--------
* jacrev_vmap    — round-2 baseline: ``vmap(jacrev(f_single))``.
* jacrev_batch   — k batched vjps via ``jacrev(lambda X: f(X).sum(0))``
                   (samples are independent, so the row sums ARE the
                   per-sample gradients; no vmap-of-jacrev machinery).
* jacfwd_vmap    — ``vmap(jacfwd(f_single))``: D=30 tangents.
* jacfwd_batch   — 30 basis JVPs of the batched function.
* split_fwd      — chain split: J_model analytic (backward-accumulated
                   batched matmuls over the stacked heads) x J_pp via 30
                   basis JVPs of the preprocessing alone, combined with
                   one [B,k,d_r] x [B,d_r,D] batched contraction.

Usage: python benchmarks/genpath_ablation.py [--quick]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

log = lambda *a: print(*a, file=sys.stderr, flush=True)

BATCH = bench.BATCH
STEPS = 30


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from colvarsfinder_tpu.config import matmul_precision
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.models.module import ACTIVATIONS
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    ref, traj_np, weights_np = bench.make_data()
    align = AlignmentLayer(ref, align_indices=list(range(bench.N_ATOMS)))
    feat = FeatureLayer([Feature("p", "position", list(range(bench.N_ATOMS)))])
    pp = PreprocessingANN(align, feat)
    model0 = EigenFunctions([bench.D_R, 20, 20, 20, 1], k=bench.K, seed=0)
    K = bench.K
    X_np = traj_np[:BATCH]
    w_np = weights_np[:BATCH]
    X = jnp.asarray(X_np)
    weight = jnp.asarray(w_np)
    D = bench.N_ATOMS * 3

    optimizer = optax.adam(bench.LR)

    # ----- jacobian formulations (each returns grad_sq [B, k]) -----

    def grad_sq_from_jac_bkD(jac):  # [B, k, D]
        return (jac ** 2).sum(axis=-1)

    def jacrev_vmap(m, X):
        def f_single(x):
            return m(pp(x[None]))[0]
        jac = jax.vmap(jax.jacrev(f_single))(X)  # [B, k, N, 3]
        return grad_sq_from_jac_bkD(jac.reshape(X.shape[0], K, -1))

    def jacrev_batch(m, X):
        def head_sums(Xb):
            return m(pp(Xb)).sum(axis=0)  # [k]
        jac = jax.jacrev(head_sums)(X)  # [k, B, N, 3]
        jac = jac.reshape(K, X.shape[0], -1)
        return (jac ** 2).sum(axis=-1).T  # [B, k]

    def jacfwd_vmap(m, X):
        def f_single(x):
            return m(pp(x[None]))[0]
        jac = jax.vmap(jax.jacfwd(f_single))(X)
        return grad_sq_from_jac_bkD(jac.reshape(X.shape[0], K, -1))

    def jacfwd_batch(m, X):
        flatf = lambda Xb: m(pp(Xb.reshape(-1, bench.N_ATOMS, 3)))
        Xf = X.reshape(X.shape[0], -1)
        basis = jnp.eye(D, dtype=X.dtype)

        def push(e):
            return jax.jvp(
                flatf, (Xf,), (jnp.broadcast_to(e, Xf.shape),)
            )[1]  # [B, k]

        cols = jax.vmap(push)(basis)  # [D, B, k]
        return (cols ** 2).sum(axis=0)  # [B, k]

    def split_fwd(m, X):
        # J_pp via D basis JVPs of pp alone (shared across the k heads)
        Xf = X.reshape(X.shape[0], -1)
        ppf = lambda Xb: pp(Xb.reshape(-1, bench.N_ATOMS, 3))
        basis = jnp.eye(D, dtype=X.dtype)
        jpp = jax.vmap(
            lambda e: jax.jvp(ppf, (Xf,), (jnp.broadcast_to(e, Xf.shape),))[1]
        )(basis)  # [D, B, d_r]

        # analytic input-jacobian of the stacked heads: forward with
        # preactivations, then backward-accumulate [k, B, d] rows
        act = ACTIVATIONS[m.activation]
        h = pp(X)  # [B, d_r]
        hk = jnp.broadcast_to(h[None], (K,) + h.shape)  # [k, B, d_r]
        prims = []
        n = len(m.params)
        for i, layer in enumerate(m.params):
            z = jax.lax.dot_general(
                hk, layer["weight"], (((2,), (2,)), ((0,), (0,))),
                precision=matmul_precision(),
            ) + layer["bias"][:, None, :]
            if i < n - 1:
                prims.append(z)
                hk = act(z)
        # d act / dz evaluated via vjp (generic in the activation)
        g = jnp.broadcast_to(
            m.params[-1]["weight"][:, 0, :][:, None, :],
            (K, h.shape[0], m.params[-1]["weight"].shape[2]),
        )  # [k, B, d_{L-1}]
        for i in range(n - 2, -1, -1):
            z = prims[i]
            dact = jax.vjp(act, z)[1](jnp.ones_like(z))[0]
            g = jax.lax.dot_general(
                g * dact, m.params[i]["weight"],
                (((2,), (1,)), ((0,), (0,))),
                precision=matmul_precision(),
            )  # [k, B, d_{i-1}]
        # combine: jac[k,B,D] = sum_d g[k,B,d] * jpp[D,B,d]
        jac = jnp.einsum(
            "kbd,Dbd->kbD", g, jpp, precision=matmul_precision()
        )
        return (jac ** 2).sum(axis=-1).T  # [B, k]

    VARIANTS = {
        "jacrev_vmap": jacrev_vmap,
        "jacrev_batch": jacrev_batch,
        "jacfwd_vmap": jacfwd_vmap,
        "jacfwd_batch": jacfwd_batch,
        "split_fwd": split_fwd,
    }

    def gen_loss(m, X, weight, grad_sq_fn):
        y = m(pp(X))
        tot = weight.sum()
        means = (y * weight[:, None]).sum(0) / tot
        variances = (y ** 2 * weight[:, None]).sum(0) / tot - means ** 2
        grad_sq = grad_sq_fn(m, X)
        dirichlet = (grad_sq * weight[:, None]).sum(0)
        quot = dirichlet / tot / variances
        cvec = jnp.argsort(jax.lax.stop_gradient(quot))
        eig_w = jnp.asarray(bench.EIG_W, dtype=y.dtype)
        non_pen = (eig_w * dirichlet[cvec] / tot / variances[cvec]).sum()
        pen = ((variances - 1.0) ** 2).sum()
        cov = (y[:, 0] * y[:, 1] * weight).sum() / tot - means[0] * means[1]
        pen = pen + cov ** 2
        return non_pen + bench.ALPHA * pen

    results = {}
    for name, fn in VARIANTS.items():
        loss_fn = partial(gen_loss, grad_sq_fn=fn)

        @partial(jax.jit, static_argnames="n")
        def run(m, os_, X, weight, n):
            def step(carry, _):
                m, os_ = carry
                loss, grads = jax.value_and_grad(loss_fn)(m, X, weight)
                updates, os_ = optimizer.update(grads, os_, m)
                m = optax.apply_updates(m, updates)
                return (m, os_), loss

            (m, os_), losses = jax.lax.scan(step, (m, os_), None, length=n)
            return m, os_, losses

        @jax.jit
        def loss_only(m, X, weight):
            return loss_fn(m, X, weight)

        m = jax.tree.map(lambda a: a, model0)
        os_ = optimizer.init(m)
        t0 = time.perf_counter()
        m, os_, losses = run(m, os_, X, weight, STEPS)
        l0 = np.asarray(losses)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        m2, os2, losses = run(m, os_, X, weight, STEPS)
        lo = np.asarray(losses)
        dt = time.perf_counter() - t0
        ms_step = dt / STEPS * 1e3
        sps = STEPS * BATCH / dt

        # loss-only diagnostic
        v = float(loss_only(model0, X, weight))
        t0 = time.perf_counter()
        for _ in range(10):
            v = float(loss_only(model0, X, weight))
        fwd_ms = (time.perf_counter() - t0) / 10 * 1e3
        results[name] = dict(
            ms_step=ms_step, sps=sps, fwd_ms=fwd_ms, loss0=float(l0[0]),
            lossN=float(lo[-1]), compile_s=compile_s, loss_only=v,
        )
        log(
            f"{name:13s}: {ms_step:7.2f} ms/step  {sps:12,.0f} sps  "
            f"(loss-only {fwd_ms:6.2f} ms; compile {compile_s:.1f}s; "
            f"loss step0 {results[name]['loss0']:.6f})"
        )

    # parity across variants (step-0 loss must agree)
    base = results["jacrev_vmap"]["loss0"]
    for name, r in results.items():
        rel = abs(r["loss0"] - base) / abs(base)
        log(f"  parity {name}: rel diff vs jacrev_vmap {rel:.2e}")

    best = max(results, key=lambda n: results[n]["sps"])
    print(
        f'{{"metric": "generator-step ablation winner", '
        f'"variant": "{best}", '
        f'"value": {results[best]["sps"]:.1f}, "unit": "samples/sec", '
        f'"baseline_jacrev_vmap": {results["jacrev_vmap"]["sps"]:.1f}, '
        f'"speedup": {results[best]["sps"] / results["jacrev_vmap"]["sps"]:.2f}}}'
    )


if __name__ == "__main__":
    main()
