"""Same-process A/B of the generator-loss Gram path (round 3).

The generator Dirichlet term needs per-sample input jacobians of
f(x) = model(pp(x)).  The preprocessing layer pp is frozen, so its
input jacobian is loop-invariant: the Gram path precomputes
M = J_pp diag(c) J_pp^T per sample ONCE at data prep and the per-step
term becomes the quadratic form G M G^T in the model-only jacobian
G = d model / d h (losses.eigen_loss ``pp_gram``).  This removes the
QCP-alignment backward (and its double backprop) from every training
step.

Cross-run comparisons through the TPU tunnel drift +-30-50%, so both
paths are measured interleaved in ONE process, best-of-3, with the
one-time Gram precompute timed separately.

Usage: python benchmarks/gram_ab.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402

log = lambda *a: print(*a, file=sys.stderr, flush=True)

# 100-step windows carry ~0.35 ms/step of tunnel round-trip; set
# GRAM_AB_STEPS=600 for figures of record (see RESULTS.md round-3
# measurement correction)
STEPS = int(os.environ.get("GRAM_AB_STEPS", "100"))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from colvarsfinder_tpu.core.losses import eigen_loss
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    ref, traj_np, weights_np = bench.make_data()
    align = AlignmentLayer(ref, align_indices=list(range(bench.N_ATOMS)))
    feat = FeatureLayer([Feature("p", "position", list(range(bench.N_ATOMS)))])
    pp = PreprocessingANN(align, feat)
    model0 = EigenFunctions([bench.D_R, 20, 20, 20, 1], k=bench.K, seed=0)
    optimizer = optax.adam(bench.LR)

    B = bench.BATCH
    X = jnp.asarray(traj_np[:B])
    w = jnp.asarray(weights_np[:B])
    D = bench.N_ATOMS * 3

    # ----- one-time Gram precompute (the data-prep cost of the path) -----
    from colvarsfinder_tpu.core.eigenfunction import _gram_fn

    gf = _gram_fn((bench.N_ATOMS, 3), D)
    diag = jnp.ones((D,), dtype=X.dtype)
    Xf = X.reshape(B, -1)
    H, M = gf(pp, diag, Xf)
    jax.block_until_ready((H, M))
    t0 = time.perf_counter()
    H, M = gf(pp, diag, Xf)
    jax.block_until_ready((H, M))
    prep_ms = (time.perf_counter() - t0) * 1e3
    log(f"one-time Gram precompute (batch {B}): {prep_ms:.1f} ms "
        f"(M is [{B}, {D}, {D}] = {M.nbytes / 2**20:.0f} MiB)")

    def loss_vjp(m):
        loss, _ = eigen_loss(
            m, pp, X, w, None, None,
            k=bench.K, alpha=bench.ALPHA, eig_w=bench.EIG_W, beta=1.0,
            diag_coeff=diag, lag_idx=0, traj_dt=bench.TRAJ_DT,
            sort_eigvals=True,
        )
        return loss

    def loss_gram(m):
        loss, _ = eigen_loss(
            m, None, H, w, None, None,
            k=bench.K, alpha=bench.ALPHA, eig_w=bench.EIG_W, beta=1.0,
            diag_coeff=None, lag_idx=0, traj_dt=bench.TRAJ_DT,
            sort_eigvals=True, pp_gram=M,
        )
        return loss

    def make_run(lf):
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
        return dt / STEPS * 1e3, float(l[0]), float(l[-1])

    runs = {"vjp": make_run(loss_vjp), "gram": make_run(loss_gram)}
    results = {k: [] for k in runs}
    losses = {}
    for order in (list(runs), list(runs)[::-1], list(runs)):
        for key in order:
            ms, l0, ln = measure(runs[key])
            results[key].append(ms)
            losses[key] = (l0, ln)

    out = {}
    for key, times in results.items():
        best = min(times)
        out[key] = best
        log(f"{key:5s}: best {best:7.3f} ms/step "
            f"(runs: {', '.join(f'{t:.3f}' for t in times)}; "
            f"loss step0 {losses[key][0]:.6f} stepN {losses[key][1]:.6f})")
    rel = abs(losses["gram"][0] - losses["vjp"][0]) / abs(losses["vjp"][0])
    log(f"step-0 loss parity gram vs vjp: rel diff {rel:.2e}")
    log(f"gram/vjp step time: {out['gram'] / out['vjp']:.3f}x "
        f"(speedup {out['vjp'] / out['gram']:.2f}x; "
        f"prep amortizes over {prep_ms / max(out['vjp'] - out['gram'], 1e-9):.0f} steps)")
    print(
        '{"metric": "generator gram-path A/B (ms/step, best-of-3)", '
        f'"vjp": {out["vjp"]:.3f}, "gram": {out["gram"]:.3f}, '
        f'"speedup": {out["vjp"] / out["gram"]:.3f}, '
        f'"prep_ms": {prep_ms:.1f}}}'
    )

    # ----- RegAE: all six terms, generator regularizer, gram vs vjp -----
    from colvarsfinder_tpu.core.regautoencoder import _regae_batch_loss
    from colvarsfinder_tpu.models import RegAutoEncoder
    from colvarsfinder_tpu.ops.features import Identity

    rmodel0 = RegAutoEncoder(
        [bench.D_R, 20, 2], [2, 20, bench.D_R], [2, 8, 1], K=2, seed=0,
    )
    num_reg = 2
    loss_static = (
        (bench.N_ATOMS, 3), 2, num_reg,
        True,                 # ae term on (unlagged)
        True,                 # eig regularizer on
        (True, True, True),   # all encoder-constraint terms on
        0, 0, bench.TRAJ_DT,
    )
    dt = X.dtype
    hyper = (
        jnp.asarray(1.0, dtype=dt),
        jnp.asarray([0.5, 2.0], dtype=dt),
        jnp.asarray([0.1, 0.1, 0.2], dtype=dt),
        jnp.asarray([1.0, 0.5], dtype=dt),
        jnp.asarray(1.0, dtype=dt),
    )
    ident = Identity()

    def rloss_vjp(m):
        return _regae_batch_loss(
            loss_static, m, pp, diag, hyper, (X, None, None, w, None),
        )[0]

    def rloss_gram(m):
        return _regae_batch_loss(
            loss_static, m, ident, None, hyper, (H, None, None, w, None),
            pp_gram=M,
        )[0]

    def make_rrun(lf):
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

    def rmeasure(run):
        m = jax.tree.map(lambda a: a, rmodel0)
        os_ = optimizer.init(m)
        m, os_, losses = run(m, os_, STEPS)
        _ = np.asarray(losses)
        t0 = time.perf_counter()
        m, os_, losses = run(m, os_, STEPS)
        l = np.asarray(losses)
        dt_ = time.perf_counter() - t0
        return dt_ / STEPS * 1e3, float(l[0]), float(l[-1])

    rruns = {"vjp": make_rrun(rloss_vjp), "gram": make_rrun(rloss_gram)}
    rresults = {k: [] for k in rruns}
    rlosses = {}
    for order in (list(rruns), list(rruns)[::-1], list(rruns)):
        for key in order:
            ms, l0, ln = rmeasure(rruns[key])
            rresults[key].append(ms)
            rlosses[key] = (l0, ln)

    rout = {}
    for key, times in rresults.items():
        best = min(times)
        rout[key] = best
        log(f"regae {key:5s}: best {best:7.3f} ms/step "
            f"(runs: {', '.join(f'{t:.3f}' for t in times)}; "
            f"loss step0 {rlosses[key][0]:.6f} stepN {rlosses[key][1]:.6f})")
    rrel = abs(rlosses["gram"][0] - rlosses["vjp"][0]) / abs(rlosses["vjp"][0])
    log(f"regae step-0 loss parity: rel diff {rrel:.2e}")
    print(
        '{"metric": "regae gram-path A/B (ms/step, best-of-3)", '
        f'"vjp": {rout["vjp"]:.3f}, "gram": {rout["gram"]:.3f}, '
        f'"speedup": {rout["vjp"] / rout["gram"]:.3f}}}'
    )

    # ----- transfer-op: precompute_features (pp hoisted, forward only) ---
    # same theme for the lagged loss: pp is frozen and carries no input-
    # gradient term here, so hoisting it is just feature precompute
    # (EigenFunctionTask precompute_features=True)
    X_l = jnp.asarray(traj_np[bench.LAG:B + bench.LAG])
    w_l = jnp.asarray(weights_np[bench.LAG:B + bench.LAG])
    H_l = ff2 = None
    from colvarsfinder_tpu.core.eigenfunction import _feat_fn

    ff2 = _feat_fn((bench.N_ATOMS, 3))
    H_l = ff2(pp, X_l.reshape(B, -1))
    jax.block_until_ready(H_l)

    def tloss_pp(m):
        loss, _ = eigen_loss(
            m, pp, X, w, X_l, w_l,
            k=bench.K, alpha=bench.ALPHA, eig_w=bench.EIG_W, beta=1.0,
            diag_coeff=None, lag_idx=bench.LAG, traj_dt=bench.TRAJ_DT,
            sort_eigvals=True,
        )
        return loss

    def tloss_feat(m):
        loss, _ = eigen_loss(
            m, ident, H, w, H_l, w_l,
            k=bench.K, alpha=bench.ALPHA, eig_w=bench.EIG_W, beta=1.0,
            diag_coeff=None, lag_idx=bench.LAG, traj_dt=bench.TRAJ_DT,
            sort_eigvals=True,
        )
        return loss

    truns = {"pp_in_step": make_run(tloss_pp),
             "precomputed": make_run(tloss_feat)}
    tresults = {k: [] for k in truns}
    tlosses = {}
    for order in (list(truns), list(truns)[::-1], list(truns)):
        for key in order:
            ms, l0, ln = measure(truns[key])
            tresults[key].append(ms)
            tlosses[key] = (l0, ln)

    tout = {}
    for key, times in tresults.items():
        best = min(times)
        tout[key] = best
        log(f"transfer {key:11s}: best {best:7.3f} ms/step "
            f"(runs: {', '.join(f'{t:.3f}' for t in times)}; "
            f"loss step0 {tlosses[key][0]:.6f} stepN {tlosses[key][1]:.6f})")
    trel = abs(tlosses["precomputed"][0] - tlosses["pp_in_step"][0]) / abs(
        tlosses["pp_in_step"][0]
    )
    log(f"transfer step-0 loss parity: rel diff {trel:.2e}")
    print(
        '{"metric": "transfer-op precompute_features A/B (ms/step, '
        'best-of-3)", '
        f'"pp_in_step": {tout["pp_in_step"]:.3f}, '
        f'"precomputed": {tout["precomputed"]:.3f}, '
        f'"speedup": {tout["pp_in_step"] / tout["precomputed"]:.3f}}}'
    )


if __name__ == "__main__":
    main()
