"""Shared test helpers: torch twins of jax models for parity oracles.

The torch oracles below implement the mathematical specification from the
reference's docs (docs/math_backgrounds.rst) with torch autograd; they are
used as independent ground truth for the jax losses and gradients.
"""

import numpy as np
import torch


def torch_mlp_from_params(params, activation="tanh"):
    """Build a torch Sequential matching a jax MLP params list
    (weight [d_out, d_in], bias [d_out])."""
    acts = {"tanh": torch.nn.Tanh, "relu": torch.nn.ReLU, "elu": torch.nn.ELU}
    layers = []
    n = len(params)
    for i, layer in enumerate(params):
        w = np.asarray(layer["weight"])
        b = np.asarray(layer["bias"])
        lin = torch.nn.Linear(w.shape[1], w.shape[0])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(w.copy()))
            lin.bias.copy_(torch.from_numpy(b.copy()))
        layers.append(lin)
        if i < n - 1:
            layers.append(acts[activation]())
    return torch.nn.Sequential(*layers)


class TorchEigenFunctions(torch.nn.Module):
    """k scalar networks evaluated and concatenated, built from stacked
    jax params."""

    def __init__(self, stacked_params, activation="tanh"):
        super().__init__()
        k = np.asarray(stacked_params[0]["weight"]).shape[0]
        nets = []
        for i in range(k):
            per = [
                {
                    "weight": np.asarray(l["weight"])[i],
                    "bias": np.asarray(l["bias"])[i],
                }
                for l in stacked_params
            ]
            nets.append(torch_mlp_from_params(per, activation))
        self.eigen_funcs = torch.nn.ModuleList(nets)

    def forward(self, x):
        return torch.cat([nn(x) for nn in self.eigen_funcs], dim=1)


def torch_eigen_loss(
    model_t,
    pp_t,
    X,
    w,
    X_lagged,
    w_lagged,
    *,
    k,
    alpha,
    eig_w,
    beta,
    diag_coeff,
    lag_idx,
    traj_dt,
    sort,
):
    """Oracle of the eigenfunction loss per docs/math_backgrounds.rst:54-105
    (including the preserved indexing quirk in the transfer-operator
    objective)."""
    X = X.clone()
    if lag_idx == 0:
        X.requires_grad_()
    y = model_t(pp_t(X))
    tot_w = w.sum()
    means = [(y[:, i] * w).sum() / tot_w for i in range(k)]
    variances = [
        (y[:, i] ** 2 * w).sum() / tot_w - means[i] ** 2 for i in range(k)
    ]
    B = X.shape[0]

    if lag_idx == 0:
        grads = [
            torch.autograd.grad(
                y[:, i].sum(), X, retain_graph=True, create_graph=True
            )[0].reshape(B, -1)
            for i in range(k)
        ]
        dc = torch.as_tensor(np.asarray(diag_coeff), dtype=X.dtype)
        dirichlet = [
            ((grads[i] ** 2 * dc).sum(dim=1) * w).sum() for i in range(k)
        ]
        quot = [
            dirichlet[i] / (tot_w * beta) / variances[i] for i in range(k)
        ]
        eig_vals = torch.tensor([q.item() for q in quot])
    else:
        y_l = model_t(pp_t(X_lagged))
        tot_wl = w_lagged.sum()
        means_l = [(y_l[:, i] * w_lagged).sum() / tot_wl for i in range(k)]
        vars_l = [
            (y_l[:, i] ** 2 * w_lagged).sum() / tot_wl - means_l[i] ** 2
            for i in range(k)
        ]
        sqd = [((y_l[:, i] - y[:, i]) ** 2 * w).sum() for i in range(k)]
        quot = [
            sqd[i] / tot_w / (variances[i] + vars_l[i]) / (traj_dt * lag_idx)
            for i in range(k)
        ]
        eig_vals = torch.tensor([q.item() for q in quot])

    if sort:
        cvec = np.argsort(eig_vals.numpy())
        eig_vals = eig_vals[cvec]
    else:
        cvec = np.arange(k)

    if lag_idx == 0:
        non_penalty = sum(
            eig_w[i]
            * dirichlet[cvec[i]]
            / (tot_w * beta)
            / variances[cvec[i]]
            for i in range(k)
        )
    else:
        # quirk: numerator unsorted index, denominator sorted index
        non_penalty = sum(
            eig_w[i]
            * sqd[i]
            / tot_w
            / (variances[cvec[i]] + vars_l[cvec[i]])
            for i in range(k)
        ) / (traj_dt * lag_idx)

    penalty = sum((variances[i] - 1.0) ** 2 for i in range(k))
    for i in range(k):
        for j in range(i + 1, k):
            cov = (y[:, i] * y[:, j] * w).sum() / tot_w - means[i] * means[j]
            penalty = penalty + cov**2

    loss = non_penalty + alpha * penalty
    return loss, eig_vals, non_penalty, penalty, cvec
