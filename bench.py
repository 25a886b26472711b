"""Headline benchmark: dipeptide-style eigenfunction training throughput.

Workload (BASELINE.json config 4 shape): transfer-operator eigenfunction
training on alanine-dipeptide-scale data — 10 heavy atoms, per-batch
preprocessing (batched Kabsch alignment + position features, d_r=30), k=2
eigenfunction heads [30,20,20,20,1], batch 20,000, Boltzmann-style
non-uniform weights, Adam.

Measures steady-state training samples/sec on the available accelerator and
compares against the PyTorch-CPU reference implementation of the identical
math (the reference package itself runs this workload on CPU via its Python
batch loop; see /root/reference/colvarsfinder/core.py:498-522).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

N_ATOMS = 10
D_R = 3 * N_ATOMS
K = 2
BATCH = 20_000
N_FRAMES = 120_000
LAG = 5
TRAJ_DT = 0.002
ALPHA = 20.0
EIG_W = [1.0, 0.2]
LR = 0.002
WARMUP_STEPS = 5
# 3000 steps (600 epochs over 5 batches) keeps the tunnel round-trip
# (~35 ms) under ~4% of the measured window. Round-3 found the old
# 60-step window was paying ~half its wall time in round-trip — the
# identical binary read 16.7-25.8M samples/s at 60 steps, 51.8M at 300,
# 65.3M at 1500 — so the measurement is best-of-3 LONG dispatches
# (steady-state device capability, not tunnel luck).
MEASURE_STEPS = 3000
MEASURE_REPS = 3


log = lambda *a: print(*a, file=sys.stderr, flush=True)


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    ref = rng.standard_normal((N_ATOMS, 3)).astype(np.float32)
    # frames: random rigid motions of a perturbed reference (so alignment
    # has real work to do) + thermal noise
    traj = (
        ref[None]
        + 0.3 * rng.standard_normal((N_FRAMES, N_ATOMS, 3))
    ).astype(np.float32)
    weights = rng.uniform(0.5, 1.5, N_FRAMES).astype(np.float32)
    weights /= weights.mean()
    return ref, traj, weights


def bench_jax(ref, traj_np, weights_np):
    import jax
    import jax.numpy as jnp
    import optax

    from colvarsfinder_tpu.core.losses import eigen_loss
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    align = AlignmentLayer(ref, align_indices=list(range(N_ATOMS)))
    feat = FeatureLayer([Feature("p", "position", list(range(N_ATOMS)))])
    pp = PreprocessingANN(align, feat)
    model = EigenFunctions([D_R, 20, 20, 20, 1], k=K, seed=0)
    optimizer = optax.adam(LR)
    opt_state = optimizer.init(model)

    # the framework's default data layout (EigenFunctionTask prebatch +
    # unroll): the static batch schedule is gathered ONCE into SEPARATE
    # per-batch device arrays — slicing a stacked [nb, B, ...] array costs
    # ~0.8 ms/step on this backend, 2x the gradient step itself
    # (benchmarks/RESULTS.md "unrolled batch layout")
    nb = (N_FRAMES - LAG) // BATCH
    flat = traj_np.reshape(N_FRAMES, -1)
    batches = tuple(
        (
            jnp.asarray(flat[i * BATCH:(i + 1) * BATCH].reshape(
                BATCH, N_ATOMS, 3)),
            jnp.asarray(flat[i * BATCH + LAG:(i + 1) * BATCH + LAG].reshape(
                BATCH, N_ATOMS, 3)),
            jnp.asarray(weights_np[i * BATCH:(i + 1) * BATCH]),
            jnp.asarray(weights_np[i * BATCH + LAG:(i + 1) * BATCH + LAG]),
        )
        for i in range(nb)
    )

    def batch_loss(m, batch):
        X, X_l, w, w_l = batch
        loss, _ = eigen_loss(
            m, pp, X, w, X_l, w_l,
            k=K, alpha=ALPHA, eig_w=EIG_W, beta=1.0, diag_coeff=None,
            lag_idx=LAG, traj_dt=TRAJ_DT, sort_eigvals=True,
        )
        return loss

    # the framework's execution model: ALL epochs between host-side hooks
    # run as ONE jitted nested-scan dispatch (epochs scanned, batches
    # unrolled over per-batch traced arguments — core/*.py multi-epoch
    # chunks), so steady-state throughput contains no per-epoch host
    # round-trips and no per-step batch slicing
    from functools import partial

    @partial(jax.jit, static_argnames="n_epochs")
    def train_run(m, os_, batches, n_epochs):
        def epoch(carry, _):
            m, os_ = carry
            for batch in batches:
                loss, grads = jax.value_and_grad(batch_loss)(m, batch)
                updates, os_ = optimizer.update(grads, os_, m)
                m = optax.apply_updates(m, updates)
            return (m, os_), loss

        (m, os_), last_losses = jax.lax.scan(
            epoch, (m, os_), None, length=n_epochs
        )
        return m, os_, last_losses

    n_epochs = max(1, MEASURE_STEPS // nb)
    # warmup (compile)
    model, opt_state, losses = train_run(
        model, opt_state, batches, n_epochs=n_epochs
    )
    _ = np.asarray(losses)  # host fetch: reliable warmup barrier

    dt = float("inf")
    for _rep in range(MEASURE_REPS):
        t0 = time.perf_counter()
        model, opt_state, losses = train_run(
            model, opt_state, batches, n_epochs=n_epochs
        )
        _ = np.asarray(losses)  # host fetch: robust completion barrier on
        # the tunnel backend (block_until_ready has been observed
        # returning early under sustained load)
        dt = min(dt, time.perf_counter() - t0)
    steps = n_epochs * nb
    sps = steps * BATCH / dt
    # effective compute: analytic ~35k flops/sample (two fwd+bwd MLP passes
    # through k=2 heads + batched Kabsch; benchmarks/perf_sweep.py) — MFU is
    # structurally bounded at this model scale because the 30->20
    # contractions fill ~4% of the 128x128 MXU's lanes
    flops_per_sample = 34_760
    tflops = sps * flops_per_sample / 1e12
    log(f"jax: {steps} steps in {dt:.3f}s -> {sps:,.0f} samples/s "
        f"(loss={float(losses[-1]):.4f}, backend={jax.default_backend()}, "
        f"~{tflops:.2f} TFLOP/s effective, "
        f"~{100 * tflops / 66:.2f}% of v5e f32-effective peak)")
    return sps


def _dipeptide_pp():
    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )

    ref, _, _ = make_data()
    align = AlignmentLayer(ref, align_indices=list(range(N_ATOMS)))
    feat = FeatureLayer([Feature("p", "position", list(range(N_ATOMS)))])
    return PreprocessingANN(align, feat)


def _task(traj_obj, pp, model, *, lag_tau, num_epochs, lr=LR, alpha=ALPHA):
    import tempfile

    from colvarsfinder_tpu.core import EigenFunctionTask

    return EigenFunctionTask(
        traj_obj, pp, model, tempfile.mkdtemp(prefix="cvf_bench_"),
        alpha=alpha, eig_weights=EIG_W, lag_tau=lag_tau, k=K,
        learning_rate=lr, batch_size=BATCH, num_epochs=num_epochs,
        test_ratio=0.001, save_model_every_step=0, verbose=False,
        tensorboard=False, debug_mode=False, seed=0,
    )


class _Traj:
    def __init__(self, traj_np, weights_np):
        self.trajectory = traj_np
        self.weights = weights_np
        self.dt = TRAJ_DT
        self.n_frames = traj_np.shape[0]


def bench_generator(traj_np, weights_np):
    """GENERATOR-loss headline at the same dipeptide scale: per-sample
    input jacobians through the frozen preprocessing via the Gram path
    (losses pp_gram; benchmarks/gram_ab.py measured 1.61x over the vjp
    formulation). Reported per the round-3 verdict so the sweep/ensemble
    perf story is driver-verifiable, not RESULTS.md prose."""
    from colvarsfinder_tpu.models import EigenFunctions

    pp = _dipeptide_pp()
    n_epochs = 200  # 1000 steps: ~2 s on the chip at ~10M samples/s
    n_epochs = int(os.environ.get("BENCH_GEN_EPOCHS", n_epochs))
    task = _task(
        _Traj(traj_np, weights_np), pp,
        EigenFunctions([D_R, 20, 20, 20, 1], k=K, seed=0),
        lag_tau=0.0, num_epochs=n_epochs,
    )
    task.train()  # compile + data prep (cached across train() calls)
    nb = int((N_FRAMES) * 0.999) // BATCH
    dt = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        task.train()
        dt = min(dt, time.perf_counter() - t0)
    sps = n_epochs * nb * BATCH / dt
    log(f"generator (gram path): {n_epochs * nb} steps in {dt:.3f}s -> "
        f"{sps:,.0f} samples/s (gram={task._gram})")
    print(json.dumps({
        "metric": "dipeptide eigenfunction (generator, gram path) "
                  "training throughput",
        "value": round(sps, 1),
        "unit": "samples/sec",
    }))
    # bf16 Gram-storage variant (opt-in gram_dtype='bfloat16'): halves
    # the Gram-traffic bound — measured 1.556x in the interleaved A/B
    # (benchmarks/gram_dtype_ab.py); surfaced as its own metric line
    task_b = _task(
        _Traj(traj_np, weights_np), pp,
        EigenFunctions([D_R, 20, 20, 20, 1], k=K, seed=0),
        lag_tau=0.0, num_epochs=n_epochs,
    )
    task_b._gram_dtype = "bfloat16"
    task_b.train()
    dt_b = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        task_b.train()
        dt_b = min(dt_b, time.perf_counter() - t0)
    sps_b = n_epochs * nb * BATCH / dt_b
    log(f"generator (bf16 gram): {sps_b:,.0f} samples/s "
        f"({sps_b / sps:.2f}x f32 gram)")
    print(json.dumps({
        "metric": "dipeptide eigenfunction (generator, bf16-gram "
                  "storage) training throughput",
        "value": round(sps_b, 1),
        "unit": "samples/sec",
    }))
    return sps


def bench_sweep(traj_np, weights_np, compute_dtype=None, R=64):
    """R-replica lr x alpha hyperparameter sweep as ONE vmapped program
    with shared device data (parallel.train_hyperparameter_sweep) — the
    aggregate-throughput numbers the round-3 verdict asked to surface in
    BENCH_r*.json (full protocol incl. sequential baseline + parity:
    benchmarks/sweep_bench.py; envelopes in benchmarks/RESULTS.md)."""
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.parallel import train_hyperparameter_sweep
    from colvarsfinder_tpu.parallel import ensemble as _ens

    pp = _dipeptide_pp()
    n_epochs = 12  # matches benchmarks/sweep_bench.py's window
    task = _task(
        _Traj(traj_np, weights_np), pp,
        EigenFunctions([D_R, 20, 20, 20, 1], k=K, seed=0),
        lag_tau=LAG * TRAJ_DT, num_epochs=n_epochs,
    )
    dims = [D_R, 20, 20, 20, 1]
    models = [EigenFunctions(dims, k=K, seed=r) for r in range(R)]
    side = int(round(np.sqrt(R)))
    lrs = list(np.geomspace(5e-4, 2e-2, side))
    alphas = list(np.geomspace(5.0, 80.0, (R + side - 1) // side))
    grid = {
        "learning_rate": [lrs[r % side] for r in range(R)],
        "alpha": [float(alphas[r // side]) for r in range(R)],
    }
    kw = dict(models=models, compute_dtype=compute_dtype)
    t0 = time.perf_counter()
    results = train_hyperparameter_sweep(task, grid, **kw)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    results = train_hyperparameter_sweep(task, grid, **kw)
    sweep_s = time.perf_counter() - t0
    nb = int((N_FRAMES - LAG) * 0.999) // BATCH
    agg = R * n_epochs * nb * BATCH / sweep_s
    device_s = _ens.last_run_seconds
    device_sps = R * n_epochs * nb * BATCH / device_s
    finals = [float(r.train_loss_df["loss"].iloc[-1]) for r in results]
    tag = "bf16" if compute_dtype == "bfloat16" else "f32"
    log(f"sweep R={R} {tag}: {sweep_s:.3f}s wall "
        f"(+{compile_s:.1f}s compile, device {device_s:.3f}s) -> "
        f"{agg:,.0f} samples/s aggregate "
        f"(device-window {device_sps:,.0f}); best loss {min(finals):.4f}")
    print(json.dumps({
        "metric": f"{R}-replica transfer-op lr x alpha sweep "
                  f"aggregate throughput ({tag})",
        "value": round(agg, 1),
        "unit": "samples/sec",
        "device_window_sps": round(device_sps, 1),
    }))
    return agg


def bench_streaming(gib=None):
    """Streaming (>HBM-layout) throughput on a memmap trajectory — the
    driver-visible leg of the round-4 verdict item 1 (the full 20 GiB
    >HBM run is recorded in benchmarks/RESULTS.md; this uses a smaller
    file so the bench stays bounded, same code path end-to-end:
    host-resident memmap, sorted gathers, 3-stage prefetch pipeline,
    bounded in-flight window)."""
    import tempfile

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    import streaming_bench as sb

    gib = float(os.environ.get("BENCH_STREAM_GIB", gib or 4.0))
    path = os.path.join(
        tempfile.gettempdir(), f"cvf_stream_{gib:g}gib.f32"
    )
    if (os.path.exists(path)
            and os.path.getsize(path) >= gib * (1 << 30) * 0.99):
        bpf = sb.N_ATOMS * 3 * 4
        n = os.path.getsize(path) // bpf
        mm = np.memmap(path, dtype=np.float32, mode="r",
                       shape=(n, sb.N_ATOMS, 3))
    else:
        mm = sb.make_memmap_traj(path, gib)
    task = sb.build_task(mm, num_epochs=1)
    task.train()  # compile + split + page-cache warm
    nb = len(task._prepare_data()[2])
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        task.train()
        best = max(best, nb * sb.BATCH / (time.perf_counter() - t0))
    log(f"streaming ({gib:g} GiB memmap): {best:,.0f} samples/s")
    print(json.dumps({
        "metric": f"streaming memmap ({gib:g} GiB) transfer-op "
                  "training throughput",
        "value": round(best, 1),
        "unit": "samples/sec",
    }))
    return best


def bench_wide_mfu():
    """Roofline witness (round-4 verdict item 8): the headline model's
    low MFU is structural (30->20 contractions fill ~4% of MXU lanes);
    at hidden width 2048 the SAME loss/optimizer program reaches tens of
    effective TFLOP/s. Surfaces the RESULTS.md width-sweep claim as a
    driver-parsed metric."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    from perf_sweep import width_sweep

    rows = width_sweep(widths=(2048,))
    r = rows["2048"]
    print(json.dumps({
        "metric": "wide-model (hidden 2048) effective compute",
        "value": r["tflops"],
        "unit": "TFLOP/s",
        "samples_per_sec": r["sps"],
        "pct_f32_eff_peak": r["mfu_pct"],
    }))
    return r


def bench_reference(ref, traj_np, weights_np):
    """The ACTUAL reference package (/root/reference) on the same workload:
    its EigenFunctionTask with a torch Kabsch-alignment + position pp layer
    standing in for molann (not installable here). Measures one training
    epoch wall-clock; the test split is made negligible so only the train
    loop is timed (matching what the jax side measures)."""
    import tempfile

    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks")
    )
    from run_baselines import _RefTraj, _import_reference, _torch_pp_layers

    ref_core, ref_nn = _import_reference()
    AlignPosition, _ = _torch_pp_layers()

    traj_obj = _RefTraj(
        traj_np.astype(np.float64), dt=TRAJ_DT,
        weights=weights_np.astype(np.float64),
    )
    model = ref_nn.EigenFunctions([D_R, 20, 20, 20, 1], K)
    task = ref_core.EigenFunctionTask(
        traj_obj, AlignPosition(ref), model, tempfile.mkdtemp("ref_bench"),
        alpha=ALPHA, eig_weights=EIG_W, lag_tau=LAG * TRAJ_DT, k=K,
        learning_rate=LR, batch_size=BATCH, num_epochs=1,
        test_ratio=0.001,  # train-loop timing only (test split ~120 frames)
        save_model_every_step=0, verbose=False, debug_mode=False,
    )
    nb = int((N_FRAMES - LAG) * 0.999) // BATCH
    t0 = time.perf_counter()
    task.train()
    dt = time.perf_counter() - t0
    sps = nb * BATCH / dt
    loss = float(task.train_loss_df["loss"].iloc[-1])
    log(f"reference (torch CPU): {nb} steps in {dt:.3f}s -> "
        f"{sps:,.0f} samples/s (loss={loss:.4f})")
    return sps


def _backend_watchdog(delay_s=300):
    """Print a diagnostic if backend init stalls (a killed TPU-tunnel
    client can wedge the chip grant; see CLAUDE.md 'ONE TPU process at
    a time'). Purely informational — cancelled once jax.devices()
    returns."""
    import threading

    cancel = threading.Event()

    def warn():
        if not cancel.wait(delay_s):
            log(
                f"bench: still waiting for the accelerator backend after "
                f"{delay_s}s — the TPU tunnel may be wedged or down "
                f"(stale chip grant / dead relay); this is an "
                f"environment condition, not a framework hang."
            )

    threading.Thread(target=warn, daemon=True).start()
    return cancel


def main():
    ref, traj, weights = make_data()
    watchdog = _backend_watchdog()
    import jax

    jax.devices()  # force backend init under the watchdog
    watchdog.set()
    jax_sps = bench_jax(ref, traj, weights)
    # auxiliary driver-verifiable metrics (round-3 verdict item 4): one
    # JSON line each, printed BEFORE the headline so the driver's parsed
    # record stays the headline. BENCH_HEADLINE_ONLY=1 skips them.
    if not os.environ.get("BENCH_HEADLINE_ONLY"):
        for name, fn in (
            ("generator", lambda: bench_generator(traj, weights)),
            ("sweep-f32", lambda: bench_sweep(traj, weights)),
            ("sweep-bf16",
             lambda: bench_sweep(traj, weights, "bfloat16")),
            ("streaming", bench_streaming),
            ("wide-mfu", bench_wide_mfu),
        ):
            try:
                fn()
            except Exception as e:  # aux metrics must not sink the headline
                log(f"bench: auxiliary metric {name} failed: {e!r}")
    baseline_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json"
    )
    if os.environ.get("BENCH_SKIP_BASELINE") and os.path.exists(baseline_file):
        base_sps = json.load(open(baseline_file))["samples_per_sec"]
    else:
        base_sps = bench_reference(ref, traj, weights)
        with open(baseline_file, "w") as f:
            json.dump({"samples_per_sec": base_sps}, f)

    print(json.dumps({
        "metric": "dipeptide eigenfunction (transfer-op) training throughput",
        "value": round(jax_sps, 1),
        "unit": "samples/sec",
        "vs_baseline": round(jax_sps / base_sps, 2),
    }))


if __name__ == "__main__":
    main()
