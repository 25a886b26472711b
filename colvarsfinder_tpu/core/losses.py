r"""Pure loss functions for all training tasks.

These are the TPU-native counterparts of the loss computations embedded in
the reference's task classes (reference: colvarsfinder/core.py:387-457,
:652-666, :884-1034). Each is a pure function
``(model, batch, ...) -> (scalar_loss, aux)`` designed to be used inside a
jitted, scanned train step and differentiated with ``jax.grad``.

Key translation notes:

* Per-sample input gradients (the generator loss) — the reference runs k
  separate ``torch.autograd.grad`` backward passes per batch
  (core.py:424). Here the same quantity is k batched vjps expressed as
  ``jacrev`` of the BATCHED function's head sums (samples are independent,
  so ``d/dX sum_b f_i(x_b)`` IS the per-sample gradient stack): one fused
  program XLA compiles alongside the rest of the step, with the outer
  parameter gradient differentiating straight through it (double
  backprop, matching core.py:517's ``retain_graph`` dance). Measured on
  TPU v5e this formulation runs ~5% faster and compiles ~23x faster than
  the equivalent ``vmap(jacrev(f_single))`` (benchmarks/
  genpath_ablation.py; jacfwd and analytic chain-split variants measured
  slower).
* Eigenvalue estimates are ``stop_gradient``-ed, mirroring the reference's
  detached ``torch.tensor([...])`` construction (core.py:426,428).
* Sorting eigenvalues inside the step is a traceable ``argsort`` + gather
  over the k (tiny) heads (reference: core.py:430-434).
* Two reference quirks are preserved deliberately for behavioral parity and
  documented here: (a) in the transfer-operator variational objective the
  numerator is indexed by the *unsorted* head index while the denominator
  variance uses the *sorted* index (core.py:440, :1023); (b) the penalty's
  variance term always runs over unsorted heads (core.py:446).
"""

from __future__ import annotations


from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import matmul_precision

__all__ = [
    "weighted_mse_loss",
    "weighted_mse_lagged_loss",
    "eigen_loss",
    "committor_loss",
    "EigenAux",
    "enc_grad_loss",
    "enc_norm_loss",
    "enc_orthogonality_loss",
    "reg_eigen_loss",
]


# ---------------------------------------------------------------------------
# Autoencoder reconstruction
# ---------------------------------------------------------------------------


def weighted_mse_loss(model, X: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    r"""Weighted reconstruction loss on preprocessed features
    (reference: colvarsfinder/core.py:652-666).

    ``X`` is already in feature space (the AE task preprocesses the whole
    trajectory once, core.py:635).
    """
    out = model(X)
    return (weight * jnp.sum((out - X) ** 2, axis=1)).sum() / weight.sum()


def weighted_mse_lagged_loss(
    forward_ae: Callable,
    pp_layer: Callable,
    X: jnp.ndarray,
    X_lagged: jnp.ndarray,
    weight: jnp.ndarray,
) -> jnp.ndarray:
    r"""Time-lagged reconstruction loss
    (reference: colvarsfinder/core.py:884-897):
    :math:`\sum_l w_l \|f_{dec}(f_{enc}(r(x_l))) - r(x_{l+j})\|^2 / \sum_l w_l`.
    """
    out = forward_ae(pp_layer(X))
    target = pp_layer(X_lagged)
    return (weight * jnp.sum((out - target) ** 2, axis=1)).sum() / weight.sum()


# ---------------------------------------------------------------------------
# Eigenfunction loss (generator and transfer operator)
# ---------------------------------------------------------------------------


class EigenAux(NamedTuple):
    """Aux outputs of the eigenfunction loss (reference core.py:457)."""

    eig_vals: jnp.ndarray  # [k] detached eigenvalue estimates, sorted if requested
    non_penalty_loss: jnp.ndarray  # scalar variational objective
    penalty: jnp.ndarray  # scalar orthonormality penalty
    cvec: jnp.ndarray  # [k] int ordering of heads by eigenvalue


def _per_sample_input_grad_sq(f_batched, X, k: int, diag_coeff):
    """Row-norms of per-sample input jacobians: [B, k] of
    :math:`\\sum_d c_d (\\partial f_i/\\partial x_d)^2`.

    Samples are independent, so ``jacrev`` of the batched function's head
    sums recovers exactly the per-sample gradients ([k, B, *state]); this
    single-jacrev-of-the-batch formulation measured ~5% faster and ~23x
    faster to compile than ``vmap(jacrev(single))`` on TPU v5e
    (benchmarks/genpath_ablation.py).
    """
    jac = jax.jacrev(lambda Xb: f_batched(Xb).sum(axis=0))(X)  # [k, B, ...]
    jac = jac.reshape(k, X.shape[0], -1)
    if diag_coeff is not None:
        return (jac**2 * diag_coeff).sum(axis=-1).T  # [B, k]
    return (jac**2).sum(axis=-1).T


def _weighted_moments(y: jnp.ndarray, weight: jnp.ndarray, tot_weight):
    """Weighted per-head means and (biased, uncentered-trick) variances.

    Matches the reference's formulas mean = Σ w y / Σ w and
    var = Σ w y² / Σ w − mean² (core.py:409-410).
    """
    means = (y * weight[:, None]).sum(axis=0) / tot_weight
    variances = (y**2 * weight[:, None]).sum(axis=0) / tot_weight - means**2
    return means, variances


def _pairwise_cov_penalty(y, weight, tot_weight, means, k: int):
    """Σ_{i<j} (weighted cov(y_i, y_j))² (reference core.py:449-452)."""
    penalty = jnp.zeros(())
    for i in range(k):
        for j in range(i + 1, k):
            cov = (y[:, i] * y[:, j] * weight).sum() / tot_weight - means[i] * means[j]
            penalty = penalty + cov**2
    return penalty


def eigen_loss(
    model,
    pp_layer: Callable,
    X: jnp.ndarray,
    weight: jnp.ndarray,
    X_lagged: jnp.ndarray | None,
    weight_lagged: jnp.ndarray | None,
    *,
    k: int,
    alpha: float,
    eig_w,
    beta: float,
    diag_coeff: jnp.ndarray | None,
    lag_idx: int,
    traj_dt: float,
    sort_eigvals: bool,
    fuse_lagged: bool = False,
    pp_gram: jnp.ndarray | None = None,
):
    r"""Eigenfunction loss (reference: colvarsfinder/core.py:387-457).

    Generator case (``lag_idx == 0``): Rayleigh quotients of the Dirichlet
    form :math:`\beta^{-1}\mathbf{E}_\mu[(a\nabla f_i)\cdot\nabla f_i] /
    \mathrm{var}_\mu f_i` with per-sample input gradients taken through the
    preprocessing layer. Transfer-operator case (``lag_idx > 0``): lagged
    square-difference quotients (docs/math_backgrounds.rst:54-105).

    ``fuse_lagged``: evaluate the x and x_lagged batches in ONE
    concatenated forward pass (2B-row matmuls) instead of two B-row
    passes — row-wise identical math. Measured on v5e at batch 20k this
    is 7% SLOWER (the concat materialization outweighs the kernel
    savings; benchmarks/perf_sweep.py), so it is off by default; it wins
    only in combination with bf16 fast mode.

    ``pp_gram`` (generator only): precomputed per-sample Gram matrix
    :math:`M_b = J_{pp}(x_b)\,\mathrm{diag}(c)\,J_{pp}(x_b)^T` of the
    preprocessing jacobian, shape [B, d_r, d_r]. When given, ``X`` must
    be the PRECOMPUTED feature batch :math:`H = r(x)` and
    ``pp_layer``/``diag_coeff`` are ignored: the Dirichlet integrand
    :math:`\sum_d c_d (\partial_d f_i)^2` becomes the quadratic form
    :math:`G_i M G_i^T` in the model-only input jacobian
    :math:`G = \partial f/\partial h` — exactly the same math with the
    heavy (loop-invariant) preprocessing backward hoisted out of the
    training step. Measured 1.61x faster per generator step on TPU v5e
    at dipeptide scale, loss parity ~5e-6 (benchmarks/gram_ab.py,
    same-process interleaved best-of-3; RESULTS.md round 3).

    Returns ``(loss, EigenAux)``.
    """
    if pp_gram is not None:
        assert lag_idx == 0, "pp_gram applies to the generator loss only"
        y = model(X)  # X is the precomputed feature batch H
        y_lagged_fused = None
    elif lag_idx > 0 and fuse_lagged and X_lagged is not None:
        both = model(pp_layer(jnp.concatenate([X, X_lagged], axis=0)))
        y, y_lagged_fused = both[: X.shape[0]], both[X.shape[0]:]
    else:
        y = model(pp_layer(X))  # [B, k]
        y_lagged_fused = None
    tot_weight = weight.sum()
    means, variances = _weighted_moments(y, weight, tot_weight)

    if lag_idx == 0:
        if pp_gram is not None:
            # Gram path: model-only input jacobian x precomputed pp Gram
            G = jax.jacrev(lambda h: model(h).sum(axis=0))(X)  # [k, B, d_r]
            if pp_gram.dtype == jnp.bfloat16:
                # bf16-Gram storage mode (EigenFunctionTask
                # gram_dtype='bfloat16'): the step is Gram-TRAFFIC-bound
                # (benchmarks/genphase_scan.py — ~3-4 traversals of the
                # [B, d_r, d_r] tensor dominate), so halving M's bytes
                # halves the bound; the contraction runs on the MXU's
                # native bf16 x bf16 -> f32 path (f32 accumulation)
                if jax.default_backend() == "cpu":
                    # XLA:CPU has no native bf16 x bf16 -> f32 dot;
                    # upcast (tests / CPU fallback — the storage
                    # saving is a device-HBM concern anyway)
                    grad_sq = jnp.einsum(
                        "kbi,bij,kbj->bk", G,
                        pp_gram.astype(G.dtype), G,
                        precision=matmul_precision(),
                    )
                else:
                    Gb = G.astype(jnp.bfloat16)
                    grad_sq = jnp.einsum(
                        "kbi,bij,kbj->bk", Gb, pp_gram, Gb,
                        preferred_element_type=jnp.float32,
                    )  # [B, k]
            else:
                grad_sq = jnp.einsum(
                    "kbi,bij,kbj->bk", G, pp_gram, G,
                    precision=matmul_precision(),
                )  # [B, k]
        else:
            # per-sample input gradients, k batched vjps through pp
            grad_sq = _per_sample_input_grad_sq(
                lambda Xb: model(pp_layer(Xb)), X, k, diag_coeff
            )  # [B, k]
        dirichlet = (grad_sq * weight[:, None]).sum(axis=0)  # [k]
        quotients = dirichlet / (tot_weight * beta) / variances  # [k], traced
        eig_vals = jax.lax.stop_gradient(quotients)
    else:
        y_lagged = (
            y_lagged_fused if y_lagged_fused is not None
            else model(pp_layer(X_lagged))
        )
        tot_weight_lagged = weight_lagged.sum()
        _, variances_lagged = _weighted_moments(
            y_lagged, weight_lagged, tot_weight_lagged
        )
        sq_diff = (((y_lagged - y) ** 2) * weight[:, None]).sum(axis=0)  # [k]
        quot_unsorted_num = sq_diff / tot_weight  # numerator part, [k]
        quotients = (
            quot_unsorted_num / (variances + variances_lagged)
        ) / (traj_dt * lag_idx)
        eig_vals = jax.lax.stop_gradient(quotients)

    if sort_eigvals:
        cvec = jnp.argsort(eig_vals)
        eig_vals = eig_vals[cvec]
    else:
        cvec = jnp.arange(k)

    eig_w_arr = jnp.asarray(eig_w, dtype=y.dtype)
    if lag_idx == 0:
        # generator objective: sorted heads in numerator and denominator
        # (reference core.py:438)
        non_penalty_loss = (
            eig_w_arr * dirichlet[cvec] / (tot_weight * beta) / variances[cvec]
        ).sum()
    else:
        # PRESERVED REFERENCE QUIRK (core.py:440): numerator indexed by the
        # unsorted head index, denominator variance by the sorted index.
        denom = variances[cvec] + variances_lagged[cvec]
        non_penalty_loss = (
            (eig_w_arr * quot_unsorted_num / denom).sum() / (traj_dt * lag_idx)
        )

    # penalty: unsorted variance normalization + pairwise covariances
    # (reference core.py:443-452)
    penalty = ((variances - 1.0) ** 2).sum()
    penalty = penalty + _pairwise_cov_penalty(y, weight, tot_weight, means, k)

    loss = non_penalty_loss + alpha * penalty
    return loss, EigenAux(eig_vals, non_penalty_loss, penalty, cvec)


# ---------------------------------------------------------------------------
# Regularized-autoencoder constraint terms
# ---------------------------------------------------------------------------


def enc_grad_loss(encoder, pp_layer, X, weight, k: int):
    r"""Squared L2 norm of encoder gradients w.r.t. *features*
    (reference: colvarsfinder/core.py:899-920).

    Gradients are taken w.r.t. Y = r(X) (the reference sets requires_grad on
    the preprocessing output, core.py:910-911).
    """
    Y = pp_layer(X)
    tot_weight = weight.sum()
    grad_sq = _per_sample_input_grad_sq(encoder, Y, k, None)  # [B, k]
    return ((grad_sq * weight[:, None]).sum(axis=0) / tot_weight).sum()


def enc_norm_loss(encoder, pp_layer, X, weight, k: int):
    r"""Penalty on variances of encoder components
    (reference: colvarsfinder/core.py:922-944)."""
    tot_weight = weight.sum()
    enc = encoder(pp_layer(X))
    _, variances = _weighted_moments(enc, weight, tot_weight)
    return ((variances - 1.0) ** 2).sum()


def enc_orthogonality_loss(encoder, pp_layer, X, weight, k: int):
    r"""Penalty on pairwise covariances among encoder components
    (reference: colvarsfinder/core.py:946-973)."""
    tot_weight = weight.sum()
    enc = encoder(pp_layer(X))
    means, _ = _weighted_moments(enc, weight, tot_weight)
    return _pairwise_cov_penalty(enc, weight, tot_weight, means, k)


def reg_eigen_loss(
    model,
    pp_layer: Callable,
    X,
    weight,
    X_lagged,
    weight_lagged,
    *,
    num_reg: int,
    eig_w,
    beta: float,
    diag_coeff: jnp.ndarray | None,
    lag_idx: int,
    traj_dt: float,
    pp_gram: jnp.ndarray | None = None,
):
    r"""Eigenfunction regularization acting on ``forward_reg`` (reg heads
    composed with the encoder) (reference: colvarsfinder/core.py:975-1034).

    Always sorts by eigenvalue (the reference has no flag here,
    core.py:1015). Returns ``(eig_vals, non_penalty, penalty, cvec)``.

    ``pp_gram`` (generator only): same contract as in :func:`eigen_loss`
    — ``X`` is the precomputed feature batch and the Dirichlet integrand
    is the quadratic form in the model-only jacobian against the
    precomputed preprocessing-jacobian Gram matrix [B, d_r, d_r]
    (``pp_layer``/``diag_coeff`` ignored).
    """

    if pp_gram is not None:
        assert lag_idx == 0, "pp_gram applies to the generator loss only"
        fwd = model.forward_reg  # X is the precomputed feature batch
    else:
        def fwd(x_raw):
            return model.forward_reg(pp_layer(x_raw))

    y = fwd(X)  # [B, K]
    tot_weight = weight.sum()
    means, variances = _weighted_moments(y, weight, tot_weight)

    if lag_idx == 0:
        if pp_gram is not None:
            G = jax.jacrev(lambda h: fwd(h).sum(axis=0))(X)  # [K, B, d_r]
            grad_sq = jnp.einsum(
                "kbi,bij,kbj->bk", G, pp_gram, G,
                precision=matmul_precision(),
            )  # [B, K]
        else:
            grad_sq = _per_sample_input_grad_sq(fwd, X, num_reg, diag_coeff)
        dirichlet = (grad_sq * weight[:, None]).sum(axis=0)
        quotients = dirichlet / (tot_weight * beta) / variances
        eig_vals = jax.lax.stop_gradient(quotients)
    else:
        y_lagged = fwd(X_lagged)
        tot_weight_lagged = weight_lagged.sum()
        _, variances_lagged = _weighted_moments(
            y_lagged, weight_lagged, tot_weight_lagged
        )
        sq_diff = (((y_lagged - y) ** 2) * weight[:, None]).sum(axis=0)
        quot_unsorted_num = sq_diff / tot_weight
        quotients = (
            quot_unsorted_num / (variances_lagged + variances)
        ) / (traj_dt * lag_idx)
        eig_vals = jax.lax.stop_gradient(quotients)

    cvec = jnp.argsort(eig_vals)
    eig_vals = eig_vals[cvec]

    eig_w_arr = jnp.asarray(eig_w, dtype=y.dtype)
    if lag_idx == 0:
        non_penalty = (
            eig_w_arr * dirichlet[cvec] / (tot_weight * beta) / variances[cvec]
        ).sum()
    else:
        # preserved reference quirk, see module docstring (core.py:1023)
        denom = variances_lagged[cvec] + variances[cvec]
        non_penalty = (
            (eig_w_arr * quot_unsorted_num / denom).sum() / (traj_dt * lag_idx)
        )

    penalty = ((variances - 1.0) ** 2).sum()
    penalty = penalty + _pairwise_cov_penalty(y, weight, tot_weight, means, num_reg)

    return eig_vals, non_penalty, penalty, cvec


def committor_loss(
    model, pp_layer, X, weight, mask_a, mask_b, hyper, diag_coeff=None,
    pp_gram=None,
):
    r"""Variational committor loss (transition path theory).

    The committor :math:`q(x) = P(\text{hit } B \text{ before } A \mid x)`
    of overdamped Langevin dynamics minimizes the Dirichlet form over
    functions pinned to 0 on A and 1 on B; with soft boundary penalties
    (Khoo, Lu & Ying 2019; Li, Lin & Ren 2019 formulation):

    .. math::
        \mathcal{L} = \frac{\mathbb{E}_w\!\left[\sum_d a_d
            (\partial_d q)^2\right]}{\beta}
        + \alpha\,\mathbb{E}_w\!\left[\mathbf{1}_A\, q^2\right]
        + \alpha\,\mathbb{E}_w\!\left[\mathbf{1}_B (1 - q)^2\right],
        \qquad q = \sigma(g(r(x)))

    with the trajectory's Boltzmann weights :math:`w` estimating the
    equilibrium expectations and the sigmoid enforcing :math:`q \in
    (0, 1)`. Reuses the generator objective's per-sample input-gradient
    formulation (one jacrev of the batched sum, through the
    preprocessing layer).

    Args:
        model: scalar-output network ``g`` ([B, d_r] -> [B, 1]).
        pp_layer: preprocessing ``r`` (gradients flow through it).
        X: raw states [B, *state].
        weight: [B] frame weights.
        mask_a / mask_b: [B] float indicators of the A / B sets.
        hyper: traced ``(alpha, beta)`` — boundary-penalty strength and
            inverse temperature (sweeps over alpha share the compiled
            program).
        diag_coeff: optional [d] diffusion diagonal ``a`` (flattened
            state dims), as in the generator eigenfunction objective.
        pp_gram: optional precomputed per-sample preprocessing Gram
            matrices [B, d_r, d_r] (same contract as :func:`eigen_loss`:
            ``X`` must then be the feature batch and ``diag_coeff`` is
            already folded into the Gram).

    Returns:
        ``(loss, (dirichlet, penalty_a, penalty_b))`` — all scalars.
    """
    alpha, beta = hyper
    tot_weight = weight.sum()

    if pp_gram is not None:
        # Gram path (same contract as eigen_loss's): X is the
        # PRECOMPUTED feature batch H and pp_gram the per-sample
        # M = J_pp diag(a) J_pp^T. With q = sigma(z), z = g(h):
        # sum_d a_d (dq/dx_d)^2 = sigma'(z)^2 * G M G^T, G = dz/dh.
        from ..config import matmul_precision

        z = model(X)[:, 0]
        G = jax.jacrev(lambda h: model(h).sum(axis=0))(X)[0]  # [B, d_r]
        q = jax.nn.sigmoid(z)
        sp = q * (1.0 - q)  # sigma'(z)
        grad_sq_vec = sp**2 * jnp.einsum(
            "bi,bij,bj->b", G, pp_gram, G, precision=matmul_precision()
        )
    else:
        def q_batched(Xb):
            return jax.nn.sigmoid(model(pp_layer(Xb)))  # [B, 1]

        grad_sq = _per_sample_input_grad_sq(
            q_batched, X, 1, diag_coeff
        )  # [B, 1]
        grad_sq_vec = grad_sq[:, 0]
        q = q_batched(X)[:, 0]
    dirichlet = (grad_sq_vec * weight).sum() / (beta * tot_weight)
    pen_a = (weight * mask_a * q**2).sum() / tot_weight
    pen_b = (weight * mask_b * (1.0 - q) ** 2).sum() / tot_weight
    loss = dirichlet + alpha * (pen_a + pen_b)
    return loss, (dirichlet, pen_a, pen_b)
