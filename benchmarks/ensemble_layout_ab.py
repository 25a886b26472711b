"""Ensemble-axis MLP layout A/B: where does the R=64 sweep step time go?

Hypothesis: under the replica vmap the activations are [R, k, B, w] with
minor dim w=20; TPU tiles f32 as (8, 128) so the minor dim pads 20 -> 128
(6.4x HBM waste), and at R=64 those tensors are GB-scale — the sweep's
~28 ms/step is HBM-bound on padding, not compute.

Variants (same math, interleaved in ONE process per the tunnel-drift
rule, CLAUDE.md round 3):

  batch-minor  y = einsum('bi,rij->rbj')   activations [R, B, w]  (current)
  feat-minor   yT = einsum('rij,jb->rib')  activations [R, w, B]
  bf16         batch-minor with bf16 activations

Each variant: a 4-layer stacked-head MLP fwd + the transfer-op-like
weighted stats + full parameter grad, run as a lax.scan of STEPS gradient
steps (one dispatch), best-of-REPS.

Usage: python benchmarks/ensemble_layout_ab.py [R] [STEPS]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
REPS = 3
B = 20_000
DIMS = [30, 20, 20, 20, 1]
K = 2
PREC = lax.Precision.HIGH

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def make_params(key, transposed):
    ps = []
    for i, (a, b) in enumerate(zip(DIMS[:-1], DIMS[1:])):
        key, k1 = jax.random.split(key)
        W = jax.random.normal(k1, (R, K, a, b), jnp.float32) / np.sqrt(a)
        if transposed:
            W = jnp.swapaxes(W, -1, -2)  # [R, K, b, a]
        ps.append(W)
    return ps


def fwd_batch_minor(params, X, dtype=jnp.float32):
    # X: [B, d0] shared; activations [R, K, B, w]
    h = X.astype(dtype)
    h = jnp.einsum("bi,rkij->rkbj", h, params[0].astype(dtype),
                   precision=PREC)
    h = jnp.tanh(h)
    for W in params[1:-1]:
        h = jnp.einsum("rkbi,rkij->rkbj", h, W.astype(dtype),
                       precision=PREC)
        h = jnp.tanh(h)
    y = jnp.einsum("rkbi,rkij->rkbj", h, params[-1].astype(dtype),
                   precision=PREC)
    return y[..., 0].astype(jnp.float32)  # [R, K, B]


def fwd_feat_minor(params, XT, dtype=jnp.float32):
    # XT: [d0, B] shared; params pre-transposed [R, K, w_out, w_in];
    # activations [R, K, w, B]
    h = jnp.einsum("rkji,ib->rkjb", params[0].astype(dtype),
                   XT.astype(dtype), precision=PREC)
    h = jnp.tanh(h)
    for W in params[1:-1]:
        h = jnp.einsum("rkji,rkib->rkjb", W.astype(dtype), h,
                       precision=PREC)
        h = jnp.tanh(h)
    y = jnp.einsum("rkji,rkib->rkjb", params[-1].astype(dtype), h,
                   precision=PREC)
    return y[:, :, 0, :].astype(jnp.float32)  # [R, K, B]


def loss_of(fwd):
    def loss(params, X, Xl, w):
        y = fwd(params, X)      # [R, K, B]
        yl = fwd(params, Xl)
        tw = w.sum()
        means = (y * w).sum(-1) / tw            # [R, K]
        var = (y**2 * w).sum(-1) / tw - means**2
        ml = (yl * w).sum(-1) / tw
        vl = (yl**2 * w).sum(-1) / tw - ml**2
        sq = (((yl - y) ** 2) * w).sum(-1) / tw
        quot = sq / (var + vl)
        pen = ((var - 1.0) ** 2).sum() + (
            ((y[:, 0] * y[:, 1] * w).sum(-1) / tw - means[:, 0] * means[:, 1])
            ** 2
        ).sum()
        return quot.sum() + 10.0 * pen
    return loss


def stepper(fwd):
    loss = loss_of(fwd)

    def run(params, X, Xl, w, n):
        g = jax.grad(loss)

        def body(ps, _):
            gs = g(ps, X, Xl, w)
            ps = jax.tree.map(lambda p, gg: p - 1e-3 * gg, ps, gs)
            return ps, ()

        out, _ = lax.scan(body, params, None, length=n)
        return out

    return jax.jit(run, static_argnums=(4,))


def main():
    log(f"platform={jax.devices()[0].platform} R={R} B={B} steps={STEPS}")
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (B, DIMS[0]), jnp.float32)
    Xl = X + 0.01 * jax.random.normal(jax.random.PRNGKey(1), X.shape)
    w = jnp.ones((B,), jnp.float32)

    variants = {
        "batch_minor_f32": (False, fwd_batch_minor, jnp.float32),
        "feat_minor_f32": (True, fwd_feat_minor, jnp.float32),
        "batch_minor_bf16": (False, fwd_batch_minor, jnp.bfloat16),
        "feat_minor_bf16": (True, fwd_feat_minor, jnp.bfloat16),
    }
    runs = {}
    for name, (tr, fwd, dt) in variants.items():
        params = make_params(jax.random.PRNGKey(42), tr)
        f = stepper(lambda p, xx, _fwd=fwd, _dt=dt: _fwd(p, xx, _dt))
        args = (X.T if tr else X, Xl.T if tr else Xl)
        # note feat-minor consumes transposed inputs
        jax.block_until_ready(f(params, args[0], args[1], w, 2))  # compile
        runs[name] = (f, params, args)

    # numerical cross-check (f32 pair)
    pa = make_params(jax.random.PRNGKey(42), False)
    pb = make_params(jax.random.PRNGKey(42), True)
    la = loss_of(fwd_batch_minor)(pa, X, Xl, w)
    lb = loss_of(fwd_feat_minor)(pb, X.T, Xl.T, w)
    log(f"loss parity batch vs feat minor: {abs(la - lb) / abs(la):.2e}")

    best = {n: float("inf") for n in runs}
    for rep in range(REPS):
        for name, (f, params, args) in runs.items():
            t0 = time.perf_counter()
            jax.block_until_ready(f(params, args[0], args[1], w, STEPS))
            dt_s = time.perf_counter() - t0
            best[name] = min(best[name], dt_s)
            log(f"rep{rep} {name:18s} {dt_s/STEPS*1e3:8.3f} ms/step")

    print("\n== best-of-%d (R=%d, B=%d) ==" % (REPS, R, B))
    base = best["batch_minor_f32"] / STEPS * 1e3
    for name, t in best.items():
        ms = t / STEPS * 1e3
        sps = R * B / (t / STEPS)
        print(f"{name:18s} {ms:8.3f} ms/step  {sps/1e6:8.1f}M samples/s "
              f"({base/ms:.2f}x)")


if __name__ == "__main__":
    main()
