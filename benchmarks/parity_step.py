r"""Per-step parity harness against the ACTUAL reference package.

Measures, training step by training step, the relative difference between
this framework's losses and the PyTorch reference's (reference:
colvarsfinder/core.py train loops), with identical data, identical initial
parameters, and identical splits — in float32 or float64.

Method: both sides train with ``batch_size == len(train split)`` so each
epoch is exactly one optimizer step and the recorded per-epoch loss is the
per-step loss (computed on the pre-update parameters on both sides,
reference core.py:498-522). First-step parameter *gradients* are compared
directly (torch autograd vs jax.grad on the same transplanted parameters).

In float64 this isolates algorithmic equivalence from arithmetic noise:
agreement at ~1e-9 over tens of steps proves both frameworks compute the
same math; the float32 run then quantifies pure rounding divergence (the
error budget recorded in docs/math.md).

Usage:
    python benchmarks/parity_step.py [--dtype float32|float64]
        [--steps 20] [--json out.json]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE_PATH = "/root/reference"


def install_reference():
    stub = tempfile.mkdtemp(prefix="openmm_stub_")
    pkg = os.path.join(stub, "openmm")
    os.makedirs(pkg)
    with open(os.path.join(pkg, "__init__.py"), "w") as f:
        f.write("class unit:\n    pass\n")
    with open(os.path.join(pkg, "app.py"), "w") as f:
        f.write("")
    sys.path.insert(0, stub)
    sys.path.insert(0, REFERENCE_PATH)
    import colvarsfinder.core as ref_core
    import colvarsfinder.nn as ref_nn

    return ref_core, ref_nn


def rel_err(a, b):
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    denom = np.maximum(np.abs(b), 1e-12)
    return float(np.max(np.abs(a - b) / denom))


def grad_rel_err(jax_grads, torch_params):
    """Max relative error over all parameter gradients, normalized against
    the global gradient scale (a per-tensor norm would divide float noise
    by float noise on gradients that are mathematically zero, e.g. the
    last-layer bias of the eigenfunction loss, which is
    variance-invariant)."""
    import numpy as np

    torch_grads = [p.grad.detach().cpu().numpy() for p in torch_params]
    gmax = max(float(np.abs(g).max()) for g in torch_grads)
    return max(
        float(np.abs(np.asarray(g_j) - g_t).max()) / max(gmax, 1e-12)
        for g_j, g_t in zip(jax_grads, torch_grads)
    )


def run(dtype="float32", steps=20, json_path=None):
    import jax

    # CPU for determinism and f64 support (the TPU tunnel is f32-only)
    jax.config.update("jax_platforms", "cpu")

    from colvarsfinder_tpu import config

    # strict true-f32 contractions for the parity bar (immaterial on the
    # CPU backend, but pinned so the harness is self-documenting)
    config.set_matmul_precision("highest")
    if dtype == "float64":
        config.set_default_dtype("float64")

    import numpy as np
    import torch

    torch.set_default_dtype(
        torch.float64 if dtype == "float64" else torch.float32
    )

    ref_core, ref_nn = install_reference()

    from colvarsfinder_tpu.core import (
        AutoEncoderTask,
        EigenFunctionTask,
        RegAutoEncoderTask,
    )
    from colvarsfinder_tpu.models import (
        AutoEncoder,
        EigenFunctions,
        RegAutoEncoder,
    )
    from colvarsfinder_tpu.utils import WeightedTrajectory

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_reference_golden import (
        _RefTraj,
        _replay_split,
        _transplant_eigenfunctions,
        _transplant_sequential,
    )
    from test_regae_golden import _transplant_regae

    np_dtype = np.float64 if dtype == "float64" else np.float32
    outdir = tempfile.mkdtemp(prefix="parity_")

    rng = np.random.default_rng(5)
    n, d = 400, 2
    x = rng.standard_normal((n, d)).astype(np_dtype)
    w = rng.uniform(0.5, 1.5, n).astype(np_dtype)
    w /= w.mean()

    results = {"dtype": dtype, "steps": steps, "tasks": {}}

    def record(name, df_j, df_t, cols, grad_err=None):
        a = df_j[cols].to_numpy()
        b = df_t[cols].to_numpy()
        per_step = [rel_err(a[i], b[i]) for i in range(len(a))]
        results["tasks"][name] = {
            "per_step_rel_err": per_step,
            "first_step_rel_err": per_step[0],
            "first3_max_rel_err": max(per_step[:3]),
            "max_rel_err": max(per_step),
            "grad_rel_err_step0": grad_err,
        }
        print(
            f"{name:12s} step0 {per_step[0]:.3e}  "
            f"first3 {max(per_step[:3]):.3e}  "
            f"max@{steps} {max(per_step):.3e}  "
            f"grad0 {grad_err if grad_err is None else f'{grad_err:.3e}'}"
        )

    # ------------------------------------------------------------------
    # AutoEncoder
    # ------------------------------------------------------------------
    train_idx, test_idx = _replay_split(n, seed=77, times=1)
    bs = len(train_idx)
    model_j = AutoEncoder([2, 10, 1], [1, 10, 2], seed=3)
    traj_j = WeightedTrajectory(trajectory=x, weights=w, dt=0.1,
                                verbose=False)
    task_j = AutoEncoderTask(
        traj_j, None, model_j, os.path.join(outdir, "ae_j"),
        learning_rate=0.01, batch_size=bs, num_epochs=steps, test_ratio=0.2,
        save_model_every_step=0, verbose=False, tensorboard=False,
        debug_mode=False, split_indices=(train_idx, test_idx),
    )

    model_t = ref_nn.AutoEncoder([2, 10, 1], [1, 10, 2])
    _transplant_sequential(model_j.encoder, model_t.encoder)
    _transplant_sequential(model_j.decoder, model_t.decoder)

    # first-step gradient comparison on the transplanted parameters
    import jax.numpy as jnp

    Xb = x[train_idx[:bs]]
    wb = w[train_idx[:bs]]

    def ae_loss_j(m):
        out = m(jnp.asarray(Xb))
        return (jnp.asarray(wb) * ((out - jnp.asarray(Xb)) ** 2).sum(1)
                ).sum() / jnp.asarray(wb).sum()

    g_j = jax.grad(ae_loss_j)(model_j)
    g_j_flat = [np.asarray(l) for layer in
                (list(g_j.encoder.params) + list(g_j.decoder.params))
                for l in (layer["weight"], layer["bias"])]
    Xt = torch.tensor(Xb)
    wt = torch.tensor(wb)
    out = model_t(Xt)
    loss_t = (wt * ((out - Xt) ** 2).sum(1)).sum() / wt.sum()
    loss_t.backward()
    ae_grad_err = grad_rel_err(g_j_flat, list(model_t.parameters()))
    for p in model_t.parameters():
        p.grad = None

    task_j.train()
    traj_t = _RefTraj(x.astype(np.float64), w.astype(np.float64), 0.1)
    task_t = ref_core.AutoEncoderTask(
        traj_t, torch.nn.Identity(), model_t, os.path.join(outdir, "ae_t"),
        learning_rate=0.01, batch_size=bs, num_epochs=steps, test_ratio=0.2,
        save_model_every_step=0, verbose=False, debug_mode=False,
    )
    np.random.seed(77)
    task_t.train()
    record("autoencoder", task_j.train_loss_df, task_t.train_loss_df,
           ["loss"], ae_grad_err)

    # ------------------------------------------------------------------
    # EigenFunctions: generator (lag 0) and transfer operator (lag > 0)
    # ------------------------------------------------------------------
    for lag_tau, tag in ((0.0, "eigen_gen"), (0.2, "eigen_top")):
        dt = 0.1
        lag_idx = int(round(lag_tau / dt))
        ll = n - lag_idx
        train_idx, test_idx = _replay_split(ll, seed=88, times=2)
        bs = len(train_idx)
        k = 2

        model_j = EigenFunctions([2, 10, 1], k, seed=6)
        task_j = EigenFunctionTask(
            traj_j, None, model_j, os.path.join(outdir, f"{tag}_j"),
            alpha=4.0, eig_weights=[1.0, 0.5], diag_coeff=np.ones(2),
            beta=1.5, lag_tau=lag_tau, k=k, learning_rate=0.01,
            batch_size=bs, num_epochs=steps, test_ratio=0.2,
            save_model_every_step=0, verbose=False, tensorboard=False,
            debug_mode=False, split_indices=(train_idx, test_idx),
        )

        model_t = ref_nn.EigenFunctions([2, 10, 1], k)
        _transplant_eigenfunctions(model_j, model_t)

        # first-step gradients through the framework loss vs ref loss_func
        from colvarsfinder_tpu.core.losses import eigen_loss

        idxb = train_idx[:bs]
        Xb = x[idxb]
        wb = w[idxb]
        Xlb = x[idxb + lag_idx] if lag_idx else None
        wlb = w[idxb + lag_idx] if lag_idx else None

        def eig_loss_j(m):
            loss, _ = eigen_loss(
                m, lambda z: z, jnp.asarray(Xb), jnp.asarray(wb),
                None if Xlb is None else jnp.asarray(Xlb),
                None if wlb is None else jnp.asarray(wlb),
                k=k, alpha=4.0, eig_w=[1.0, 0.5], beta=1.5,
                diag_coeff=jnp.ones(2, dtype=jnp.asarray(Xb).dtype),
                lag_idx=lag_idx, traj_dt=dt, sort_eigvals=True,
            )
            return loss

        g_j = jax.grad(eig_loss_j)(model_j)
        g_j_flat = []
        for i in range(k):
            for layer in g_j.params:
                g_j_flat.append(np.asarray(layer["weight"][i]))
                g_j_flat.append(np.asarray(layer["bias"][i]))

        task_t = ref_core.EigenFunctionTask(
            traj_t, torch.nn.Identity(), model_t,
            os.path.join(outdir, f"{tag}_t"),
            alpha=4.0, eig_weights=[1.0, 0.5], diag_coeff=torch.ones(2),
            beta=1.5, lag_tau=lag_tau, k=k, learning_rate=0.01,
            batch_size=bs, num_epochs=steps, test_ratio=0.2,
            save_model_every_step=0, verbose=False, debug_mode=False,
        )
        Xt = torch.tensor(Xb)
        wt = torch.tensor(wb)
        if lag_idx:
            loss_t = task_t.loss_func(
                Xt, wt, torch.tensor(Xlb), torch.tensor(wlb)
            )[0]
        else:
            Xt.requires_grad_()
            loss_t = task_t.loss_func(Xt, wt, None, None)[0]
        loss_t.backward()
        t_params = []
        for i in range(k):
            t_params.extend(model_t.eigen_funcs[i].parameters())
        eig_grad_err = grad_rel_err(g_j_flat, t_params)
        for p in t_params:
            p.grad = None

        task_j.train()
        np.random.seed(88)
        task_t.train()
        cols = ["loss", "eigen_non_penalty", "eigen_penalty",
                "eig_1", "eig_2"]
        record(tag, task_j.train_loss_df, task_t.train_loss_df, cols,
               eig_grad_err)

    # ------------------------------------------------------------------
    # RegAutoEncoder (all six terms)
    # ------------------------------------------------------------------
    ll = n - 2
    train_idx, test_idx = _replay_split(ll, seed=99, times=1)
    bs = len(train_idx)
    kwargs = dict(
        eig_weights=[1.0, 0.5], learning_rate=0.01, batch_size=bs,
        num_epochs=steps, test_ratio=0.2, alpha=1.0, gamma=[0.7, 3.0],
        eta=[0.05, 0.1, 0.2], lag_tau_ae=0.1, lag_tau_reg=0.2, beta=1.0,
        save_model_every_step=0, verbose=False,
    )
    model_j = RegAutoEncoder([2, 10, 1], [1, 10, 2], [1, 8, 1], 2, seed=8)
    task_j = RegAutoEncoderTask(
        traj_j, None, model_j, os.path.join(outdir, "regae_j"),
        tensorboard=False, debug_mode=False,
        split_indices=(train_idx, test_idx), **kwargs,
    )
    model_t = ref_nn.RegAutoEncoder([2, 10, 1], [1, 10, 2], [1, 8, 1], 2)
    _transplant_regae(model_j, model_t)
    task_j.train()
    task_t = ref_core.RegAutoEncoderTask(
        traj_t, torch.nn.Identity(), model_t, os.path.join(outdir, "regae_t"),
        debug_mode=False, **kwargs,
    )
    np.random.seed(99)
    task_t.train()
    cols = ["loss", "ae_loss", "eigen_non_penalty", "eigen_penalty",
            "eig_0", "eig_1", "encoder_gradient", "encoder_norm",
            "encoder_orthogonality"]
    record("regae", task_j.train_loss_df, task_t.train_loss_df, cols)

    if json_path:
        with open(json_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"results written to {json_path}")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["float32", "float64"],
                    default="float32")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    run(args.dtype, args.steps, args.json)


if __name__ == "__main__":
    main()
