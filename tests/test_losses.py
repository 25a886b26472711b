"""Loss parity tests against torch-autograd oracles.

The oracles (tests/helpers.py) implement the math spec from the reference's
docs (docs/math_backgrounds.rst) with torch; jax losses and their parameter
gradients must agree to f32-level tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from colvarsfinder_tpu.core import losses
from colvarsfinder_tpu.models import AutoEncoder, EigenFunctions
from helpers import TorchEigenFunctions, torch_eigen_loss, torch_mlp_from_params

RTOL = 2e-4
ATOL = 1e-5


def _data(B=32, d=4, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((B, d)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, B).astype(np.float32)
    return X, w


def test_weighted_mse_matches_torch():
    model = AutoEncoder([4, 8, 2], [2, 8, 4], seed=0)
    X, w = _data()
    loss_j = losses.weighted_mse_loss(model, jnp.asarray(X), jnp.asarray(w))

    enc_t = torch_mlp_from_params(model.encoder.params)
    dec_t = torch_mlp_from_params(model.decoder.params)
    Xt, wt = torch.from_numpy(X), torch.from_numpy(w)
    out = dec_t(enc_t(Xt))
    loss_t = (wt * ((out - Xt) ** 2).sum(dim=1)).sum() / wt.sum()
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=RTOL)


def _eigen_setup(k=2, d=4, seed=0):
    model = EigenFunctions([d, 8, 8, 1], k=k, seed=seed)
    model_t = TorchEigenFunctions(model.params)
    return model, model_t


def _run_both(lag_idx, sort, k=2, alpha=3.0):
    d = 4
    model, model_t = _eigen_setup(k=k, d=d)
    X, w = _data(B=40, d=d, seed=1)
    X_l, w_l = _data(B=40, d=d, seed=2)
    diag = np.asarray([1.0, 2.0, 0.5, 1.5], dtype=np.float32)
    eig_w = [1.0, 0.4][:k]
    kwargs = dict(
        k=k, alpha=alpha, eig_w=eig_w, beta=2.0,
        diag_coeff=jnp.asarray(diag) if lag_idx == 0 else None,
        lag_idx=lag_idx, traj_dt=0.05, sort_eigvals=sort,
    )
    loss_j, aux = losses.eigen_loss(
        model, lambda x: x, jnp.asarray(X), jnp.asarray(w),
        jnp.asarray(X_l) if lag_idx else None,
        jnp.asarray(w_l) if lag_idx else None,
        **kwargs,
    )
    loss_t, eig_t, np_t, pen_t, cvec_t = torch_eigen_loss(
        model_t, lambda x: x,
        torch.from_numpy(X), torch.from_numpy(w),
        torch.from_numpy(X_l), torch.from_numpy(w_l),
        k=k, alpha=alpha, eig_w=eig_w, beta=2.0, diag_coeff=diag,
        lag_idx=lag_idx, traj_dt=0.05, sort=sort,
    )
    return (loss_j, aux), (loss_t, eig_t, np_t, pen_t, cvec_t), model, model_t, (X, w, X_l, w_l, kwargs)


def test_eigen_loss_generator_matches_torch():
    (loss_j, aux), (loss_t, eig_t, np_t, pen_t, cvec_t), *_ = _run_both(
        lag_idx=0, sort=True
    )
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=RTOL)
    np.testing.assert_allclose(
        np.asarray(aux.eig_vals), eig_t.numpy(), rtol=RTOL
    )
    np.testing.assert_allclose(
        float(aux.non_penalty_loss), np_t.item(), rtol=RTOL
    )
    np.testing.assert_allclose(float(aux.penalty), pen_t.item(), rtol=1e-3,
                               atol=ATOL)
    assert list(np.asarray(aux.cvec)) == list(cvec_t)


def test_eigen_loss_transfer_matches_torch():
    (loss_j, aux), (loss_t, eig_t, np_t, pen_t, cvec_t), *_ = _run_both(
        lag_idx=3, sort=True
    )
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=RTOL)
    np.testing.assert_allclose(
        np.asarray(aux.eig_vals), eig_t.numpy(), rtol=RTOL
    )
    np.testing.assert_allclose(
        float(aux.non_penalty_loss), np_t.item(), rtol=RTOL
    )


def test_eigen_loss_unsorted():
    (loss_j, aux), (loss_t, *_rest), *_ = _run_both(lag_idx=0, sort=False)
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=RTOL)
    assert list(np.asarray(aux.cvec)) == [0, 1]


def test_eigen_generator_param_gradients_match_torch():
    """Double backprop: d(loss)/d(params) through the input-gradient graph
    must match torch autograd (reference core.py:517 semantics)."""
    (loss_j, aux), (loss_t, *_), model, model_t, (X, w, X_l, w_l, kwargs) = (
        _run_both(lag_idx=0, sort=True)
    )

    def jax_loss(m):
        loss, _ = losses.eigen_loss(
            m, lambda x: x, jnp.asarray(X), jnp.asarray(w), None, None,
            **kwargs,
        )
        return loss

    g = jax.grad(jax_loss)(model)
    loss_t.backward()
    # compare gradient of first-layer weight of head 0
    gt = model_t.eigen_funcs[0][0].weight.grad.numpy()
    gj = np.asarray(g.params[0]["weight"][0])
    np.testing.assert_allclose(gj, gt, rtol=5e-3, atol=5e-5)
    # and the final layer of head 1
    gt2 = model_t.eigen_funcs[1][-1].weight.grad.numpy()
    gj2 = np.asarray(g.params[-1]["weight"][1])
    np.testing.assert_allclose(gj2, gt2, rtol=5e-3, atol=5e-5)


def test_enc_norm_and_orthogonality_losses():
    model = AutoEncoder([4, 8, 2], [2, 8, 4], seed=3)
    X, w = _data(B=25, d=4, seed=4)
    ln = losses.enc_norm_loss(model.encoder, lambda x: x, jnp.asarray(X),
                              jnp.asarray(w), 2)
    lo = losses.enc_orthogonality_loss(model.encoder, lambda x: x,
                                       jnp.asarray(X), jnp.asarray(w), 2)
    enc_t = torch_mlp_from_params(model.encoder.params)
    Xt, wt = torch.from_numpy(X), torch.from_numpy(w)
    enc = enc_t(Xt)
    tw = wt.sum()
    means = [(enc[:, i] * wt).sum() / tw for i in range(2)]
    variances = [
        (enc[:, i] ** 2 * wt).sum() / tw - means[i] ** 2 for i in range(2)
    ]
    ln_t = sum((v - 1.0) ** 2 for v in variances)
    cov = (enc[:, 0] * enc[:, 1] * wt).sum() / tw - means[0] * means[1]
    lo_t = cov**2
    np.testing.assert_allclose(float(ln), ln_t.item(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(float(lo), lo_t.item(), rtol=1e-3, atol=ATOL)


def test_enc_grad_loss():
    model = AutoEncoder([4, 8, 2], [2, 8, 4], seed=5)
    X, w = _data(B=20, d=4, seed=6)
    lg = losses.enc_grad_loss(model.encoder, lambda x: x, jnp.asarray(X),
                              jnp.asarray(w), 2)
    enc_t = torch_mlp_from_params(model.encoder.params)
    Xt = torch.from_numpy(X).requires_grad_()
    wt = torch.from_numpy(w)
    enc = enc_t(Xt)
    tw = wt.sum()
    grads = [
        torch.autograd.grad(enc[:, i].sum(), Xt, retain_graph=True,
                            create_graph=True)[0]
        for i in range(2)
    ]
    lg_t = sum(
        ((g**2).sum(dim=1) * wt).sum() / tw for g in grads
    )
    np.testing.assert_allclose(float(lg), lg_t.item(), rtol=RTOL)


def test_weighted_mse_lagged_loss():
    model_ae = AutoEncoder([4, 8, 2], [2, 8, 4], seed=7)
    X, w = _data(B=20, d=4, seed=8)
    X_l, _ = _data(B=20, d=4, seed=9)
    lj = losses.weighted_mse_lagged_loss(
        lambda z: model_ae(z), lambda x: x,
        jnp.asarray(X), jnp.asarray(X_l), jnp.asarray(w),
    )
    enc_t = torch_mlp_from_params(model_ae.encoder.params)
    dec_t = torch_mlp_from_params(model_ae.decoder.params)
    Xt, Xlt, wt = map(torch.from_numpy, (X, X_l, w))
    out = dec_t(enc_t(Xt))
    lt = (wt * ((out - Xlt) ** 2).sum(dim=1)).sum() / wt.sum()
    np.testing.assert_allclose(float(lj), lt.item(), rtol=RTOL)


def test_eigen_loss_fused_lagged_matches_unfused():
    """fuse_lagged evaluates x/x_lagged in one concatenated pass — the
    result must match the two-pass evaluation."""
    import jax.numpy as jnp
    import numpy as np

    from colvarsfinder_tpu.core.losses import eigen_loss
    from colvarsfinder_tpu.models import EigenFunctions

    rng = np.random.default_rng(9)
    X = jnp.asarray(rng.standard_normal((64, 4)).astype(np.float32))
    Xl = jnp.asarray(rng.standard_normal((64, 4)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    model = EigenFunctions([4, 10, 1], k=2, seed=0)
    kw = dict(k=2, alpha=5.0, eig_w=[1.0, 0.5], beta=1.0, diag_coeff=None,
              lag_idx=2, traj_dt=0.1, sort_eigvals=True)
    l1, a1 = eigen_loss(model, lambda z: z, X, w, Xl, w, fuse_lagged=False, **kw)
    l2, a2 = eigen_loss(model, lambda z: z, X, w, Xl, w, fuse_lagged=True, **kw)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a1.eig_vals), np.asarray(a2.eig_vals), rtol=1e-6
    )
