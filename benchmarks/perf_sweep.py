"""Device-time / MFU analysis of the headline workload, plus measured
optimization experiments: fused x/x_lagged forward, matmul precision,
batch-size sweep.

Prints a table to stderr and a JSON summary to stdout.
Run on the TPU:  python benchmarks/perf_sweep.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_ATOMS = 10
D_R = 3 * N_ATOMS
K = 2
N_FRAMES = 120_000
LAG = 5
TRAJ_DT = 0.002
ALPHA = 20.0
EIG_W = [1.0, 0.2]
LR = 0.002

log = lambda *a: print(*a, file=sys.stderr, flush=True)


def flops_per_sample(widths=(30, 20, 20, 20, 1), k=K, lagged=True):
    """Analytic MAC count for the transfer-op step, per trajectory sample:
    forward both time points, backward ~2x forward (dgrad+wgrad)."""
    macs = sum(a * b for a, b in zip(widths[:-1], widths[1:]))
    passes = 2 if lagged else 1  # x and x_lagged
    fwd_bwd = 3.0  # fwd + ~2x fwd for backward
    kabsch = 9 * N_ATOMS + 250  # covariance + QCP per frame, approx
    return 2 * macs * k * passes * fwd_bwd + kabsch * passes


def build(batch, precision, fuse):
    import jax
    import jax.numpy as jnp
    import optax

    from colvarsfinder_tpu import config
    from colvarsfinder_tpu.core.losses import eigen_loss
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    config.set_matmul_precision(precision)

    rng = np.random.default_rng(0)
    ref = rng.standard_normal((N_ATOMS, 3)).astype(np.float32)
    traj_np = (
        ref[None] + 0.3 * rng.standard_normal((N_FRAMES, N_ATOMS, 3))
    ).astype(np.float32)
    weights_np = rng.uniform(0.5, 1.5, N_FRAMES).astype(np.float32)

    align = AlignmentLayer(ref, align_indices=list(range(N_ATOMS)))
    feat = FeatureLayer([Feature("p", "position", list(range(N_ATOMS)))])
    pp = PreprocessingANN(align, feat)
    model = EigenFunctions([D_R, 20, 20, 20, 1], k=K, seed=0)
    optimizer = optax.adam(LR)
    opt_state = optimizer.init(model)

    traj = jax.device_put(jnp.asarray(traj_np.reshape(N_FRAMES, -1)))
    weights = jax.device_put(jnp.asarray(weights_np))
    nb = (N_FRAMES - LAG) // batch
    idx_all = jax.device_put(jnp.asarray(
        np.arange(nb * batch, dtype=np.int32).reshape(nb, batch)
    ))

    def batch_loss(m, idx):
        X = traj[idx].reshape(-1, N_ATOMS, 3)
        w = weights[idx]
        X_l = traj[idx + LAG].reshape(-1, N_ATOMS, 3)
        w_l = weights[idx + LAG]
        loss, _ = eigen_loss(
            m, pp, X, w, X_l, w_l,
            k=K, alpha=ALPHA, eig_w=EIG_W, beta=1.0, diag_coeff=None,
            lag_idx=LAG, traj_dt=TRAJ_DT, sort_eigvals=True,
            fuse_lagged=fuse,
        )
        return loss

    @jax.jit
    def train_epoch(m, os_, idxs):
        def step(carry, idx):
            m, os_ = carry
            loss, grads = jax.value_and_grad(batch_loss)(m, idx)
            updates, os_ = optimizer.update(grads, os_, m)
            m = optax.apply_updates(m, updates)
            return (m, os_), loss

        (m, os_), losses = jax.lax.scan(step, (m, os_), idxs)
        return m, os_, losses

    return train_epoch, model, opt_state, idx_all, nb


def measure(batch=20_000, precision="highest", fuse=False, steps=30):
    """Steady-state samples/s, measured as ONE multi-epoch dispatch (the
    task execution model; per-epoch dispatching bills tunnel round-trips
    to the device — see bench.py)."""
    import jax

    train_epoch, model, opt_state, idx_all, nb = build(batch, precision, fuse)
    n_epochs = max(1, steps // nb)

    @jax.jit
    def run(m, os_):
        def ep(carry, _):
            m, os_, _ = train_epoch(carry[0], carry[1], idx_all)
            return (m, os_), 0.0
        # re-dispatching train_epoch inside jit inlines it: one program
        (m, os_), _ = jax.lax.scan(ep, (m, os_), None, length=n_epochs)
        _, _, losses = train_epoch(m, os_, idx_all)
        return m, os_, losses

    model, opt_state, losses = run(model, opt_state)
    _ = np.asarray(losses)  # host fetch: reliable warmup barrier
    t0 = time.perf_counter()
    model, opt_state, losses = run(model, opt_state)
    _ = np.asarray(losses)  # host fetch: robust completion barrier on the
    # tunnel backend (block_until_ready has been observed returning early
    # under sustained load)
    dt = time.perf_counter() - t0
    sps = (n_epochs + 1) * nb * batch / dt
    return sps, float(losses[-1])


def phase_breakdown(batch=20_000, steps=50):
    """Measured device-time breakdown of one training step: time each
    pipeline phase as its own jitted program (gathers, alignment+features,
    MLP forward, full loss forward, full grad step). Phases overlap under
    XLA fusion in the real step, so these are upper bounds that localize
    where the time goes."""
    import jax
    import jax.numpy as jnp

    from colvarsfinder_tpu.core.losses import eigen_loss
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    rng = np.random.default_rng(0)
    ref = rng.standard_normal((N_ATOMS, 3)).astype(np.float32)
    traj_np = (
        ref[None] + 0.3 * rng.standard_normal((N_FRAMES, N_ATOMS, 3))
    ).astype(np.float32)
    weights_np = rng.uniform(0.5, 1.5, N_FRAMES).astype(np.float32)
    align = AlignmentLayer(ref, align_indices=list(range(N_ATOMS)))
    feat = FeatureLayer([Feature("p", "position", list(range(N_ATOMS)))])
    pp = PreprocessingANN(align, feat)
    model = EigenFunctions([D_R, 20, 20, 20, 1], k=K, seed=0)
    traj = jax.device_put(jnp.asarray(traj_np.reshape(N_FRAMES, -1)))
    weights = jax.device_put(jnp.asarray(weights_np))
    idx = jax.device_put(jnp.arange(batch, dtype=jnp.int32))

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        return 1000 * (time.perf_counter() - t0) / steps

    gather = jax.jit(lambda i: (traj[i], traj[i + LAG], weights[i],
                                weights[i + LAG]))
    pp_fn = jax.jit(lambda i: pp(traj[i].reshape(-1, N_ATOMS, 3)))
    fwd_fn = jax.jit(lambda m, i: m(pp(traj[i].reshape(-1, N_ATOMS, 3))))

    def loss_fn(m, i):
        X = traj[i].reshape(-1, N_ATOMS, 3)
        X_l = traj[i + LAG].reshape(-1, N_ATOMS, 3)
        loss, _ = eigen_loss(
            m, pp, X, weights[i], X_l, weights[i + LAG],
            k=K, alpha=ALPHA, eig_w=EIG_W, beta=1.0, diag_coeff=None,
            lag_idx=LAG, traj_dt=TRAJ_DT, sort_eigvals=True,
        )
        return loss

    loss_jit = jax.jit(loss_fn)
    grad_jit = jax.jit(jax.grad(loss_fn))

    rows = [
        ("gathers (x, x_lagged, w)", timed(gather, idx)),
        ("align + features (1 pass)", timed(pp_fn, idx)),
        ("pp + MLP forward (1 pass)", timed(fwd_fn, model, idx)),
        ("full loss forward (2 passes)", timed(loss_jit, model, idx)),
        ("full grad step", timed(grad_jit, model, idx)),
    ]
    log("\nper-phase device time (batch 20k, isolated jitted programs):")
    for name, ms in rows:
        log(f"  {name:30s} {ms:7.3f} ms")
    return {name: round(ms, 3) for name, ms in rows}


def main():
    import jax

    results = {}
    fps = flops_per_sample()
    log(f"analytic flops/sample ~= {fps:,.0f}")
    results["phase_breakdown_ms"] = phase_breakdown()

    base_sps, base_loss = measure()
    results["baseline"] = base_sps
    log(f"baseline (batch 20k, f32, unfused):   {base_sps:,.0f} sps  "
        f"loss={base_loss:.4f}")

    for name, kw in [
        ("fused_xl", dict(fuse=True)),
        ("bf16", dict(precision="default")),
        ("bf16_fused", dict(precision="default", fuse=True)),
        ("batch_40k", dict(batch=40_000)),
        ("batch_80k", dict(batch=80_000)),
        ("batch_80k_fused", dict(batch=80_000, fuse=True)),
    ]:
        sps, loss = measure(**kw)
        results[name] = sps
        log(f"{name:22s} {sps:,.0f} sps ({sps / base_sps - 1:+.1%} vs "
            f"baseline)  loss={loss:.4f}")

    best = max(v for v in results.values() if isinstance(v, float))
    tflops = best * fps / 1e12
    log(f"\nbest effective compute: {tflops:.2f} TFLOP/s "
        f"(~{100 * tflops / 66:.2f}% of v5e f32-effective peak ~66 TF; "
        "the 30->20 contractions use ~4% of MXU lanes, which bounds MFU)")
    print(json.dumps({k: (v if isinstance(v, dict) else round(v, 0)) for k, v in results.items()}))


if __name__ == "__main__":
    main()


def width_sweep(batch=20_000, steps=18,
                widths=(20, 128, 512, 2048)):
    """MFU vs model width: the roofline section claims the small-MLP MFU
    bound is structural (30->20 contractions fill ~4% of MXU lanes); this
    sweep verifies compute efficiency rises with hidden width."""
    import jax
    import jax.numpy as jnp
    import optax

    from colvarsfinder_tpu.core.losses import eigen_loss
    from colvarsfinder_tpu.models import EigenFunctions

    rng = np.random.default_rng(0)
    rows = []
    for width in widths:
        dims = [D_R, width, width, width, 1]
        model = EigenFunctions(dims, k=K, seed=0)
        optimizer = optax.adam(LR)
        opt_state = optimizer.init(model)
        nb = 3
        Xb = jax.device_put(jnp.asarray(
            rng.standard_normal((nb, batch, D_R)).astype(np.float32)))
        Xlb = jax.device_put(jnp.asarray(
            rng.standard_normal((nb, batch, D_R)).astype(np.float32)))
        wb = jax.device_put(jnp.ones((nb, batch), jnp.float32))

        def batch_loss(m, b):
            X, Xl, w = b
            loss, _ = eigen_loss(
                m, lambda z: z, X, w, Xl, w, k=K, alpha=ALPHA,
                eig_w=EIG_W, beta=1.0, diag_coeff=None, lag_idx=LAG,
                traj_dt=TRAJ_DT, sort_eigvals=True,
            )
            return loss

        @jax.jit
        def epoch(m, os_, Xb, Xlb, wb):
            def step(carry, b):
                m, os_ = carry
                loss, grads = jax.value_and_grad(batch_loss)(m, b)
                updates, os_ = optimizer.update(grads, os_, m)
                return (optax.apply_updates(m, updates), os_), loss
            (m, os_), losses = jax.lax.scan(step, (m, os_), (Xb, Xlb, wb))
            return m, os_, losses

        n_ep = max(1, steps // nb)

        @jax.jit
        def run(m, os_):
            # all measured epochs in ONE dispatch (see measure())
            def ep(carry, _):
                m, os_, _ = epoch(carry[0], carry[1], Xb, Xlb, wb)
                return (m, os_), 0.0
            (m, os_), _ = jax.lax.scan(ep, (m, os_), None, length=n_ep - 1)
            return epoch(m, os_, Xb, Xlb, wb)

        model, opt_state, losses = run(model, opt_state)
        _ = np.asarray(losses)  # host fetch: robust warmup barrier
        t0 = time.perf_counter()
        model, opt_state, losses = run(model, opt_state)
        _ = np.asarray(losses)  # host fetch: robust barrier (see measure)
        dt = time.perf_counter() - t0
        sps = n_ep * nb * batch / dt
        fps = flops_per_sample(widths=tuple(dims))
        tflops = sps * fps / 1e12
        rows.append((width, sps, tflops, 100 * tflops / 66))
        log(f"width {width:5d}: {sps:>12,.0f} sps  {tflops:7.2f} TF  "
            f"{100 * tflops / 66:5.1f}% of f32-eff peak")
    return {str(w): {"sps": round(s, 0), "tflops": round(t, 2),
                     "mfu_pct": round(m, 2)} for w, s, t, m in rows}
