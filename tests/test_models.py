"""Model zoo tests: shapes, ensemble equivalence, torch transplant parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from colvarsfinder_tpu.models import (
    AutoEncoder,
    EigenFunctions,
    RegAutoEncoder,
    RegModel,
    Sequential,
    create_sequential_nn,
    mlp_apply,
    stacked_mlp_apply,
)
from helpers import torch_mlp_from_params


def test_create_sequential_shapes():
    nn1 = create_sequential_nn([10, 5, 1], seed=0)
    x = jnp.ones((7, 10))
    assert nn1(x).shape == (7, 1)
    # weight layout is torch-convention [d_out, d_in]
    assert nn1.params[0]["weight"].shape == (5, 10)
    assert nn1.params[1]["weight"].shape == (1, 5)


def test_create_sequential_requires_two_layers():
    with pytest.raises(AssertionError):
        create_sequential_nn([10])


def test_init_bounds_match_torch_linear_default():
    nn1 = create_sequential_nn([64, 32], seed=3)
    bound = 1.0 / np.sqrt(64)
    w = np.asarray(nn1.params[0]["weight"])
    assert np.abs(w).max() <= bound
    # distribution sanity: spread over most of the interval
    assert np.abs(w).max() > 0.8 * bound


def test_sequential_matches_torch_forward():
    nn1 = create_sequential_nn([6, 12, 4, 2], activation="tanh", seed=1)
    tm = torch_mlp_from_params(nn1.params, "tanh")
    x = np.random.default_rng(0).standard_normal((11, 6)).astype(np.float32)
    out_j = np.asarray(nn1(jnp.asarray(x)))
    out_t = tm(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(out_j, out_t, rtol=1e-5, atol=2e-6)


def test_stacked_mlp_equals_per_net_loop():
    key = jax.random.PRNGKey(7)
    model = EigenFunctions([5, 8, 8, 1], k=3, key=key)
    x = jax.random.normal(jax.random.PRNGKey(1), (9, 5))
    out = model(x)
    assert out.shape == (9, 3)
    # per-head forward with sliced params must agree
    for i in range(3):
        per = tuple(
            {"weight": l["weight"][i], "bias": l["bias"][i]}
            for l in model.params
        )
        ref = mlp_apply(per, x, "tanh")[:, 0]
        np.testing.assert_allclose(np.asarray(out[:, i]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_eigenfunctions_reorder():
    model = EigenFunctions([4, 6, 1], k=3, seed=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 4))
    out = model(x)
    perm = [2, 0, 1]
    re = model.reordered(perm)
    out_re = re(x)
    np.testing.assert_allclose(
        np.asarray(out_re), np.asarray(out[:, perm]), rtol=1e-6
    )


def test_eigenfunctions_scalar_head_assertion():
    with pytest.raises(AssertionError):
        EigenFunctions([4, 6, 2], k=2)


def test_eigenfunctions_get_params_of_cv():
    model = EigenFunctions([4, 6, 1], k=2, seed=0)
    pv = model.get_params_of_cv(1)
    names = [n for n, _ in pv]
    assert names == ["1.weight", "1.bias", "2.weight", "2.bias"]
    assert pv[0][1].shape == (6, 4)
    assert pv[2][1].shape == (1, 6)


def test_autoencoder_forward_and_cv_params():
    model = AutoEncoder([6, 10, 2], [2, 10, 6], seed=0)
    assert model.encoded_dim == 2
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 6))
    out = model(x)
    assert out.shape == (8, 6)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(model.decoder(model.encoder(x))),
        rtol=1e-6,
    )
    pv = model.get_params_of_cv(1)
    # last linear layer sliced to one row
    assert pv[-2][1].shape == (1, 10)
    assert pv[-1][1].shape == (1,)
    with pytest.raises(AssertionError):
        model.get_params_of_cv(2)


def test_autoencoder_dim_mismatch():
    with pytest.raises(AssertionError):
        AutoEncoder([6, 10, 2], [3, 10, 6])


def test_regautoencoder_forward_layout():
    model = RegAutoEncoder([6, 8, 2], [2, 8, 6], [2, 8, 1], K=3, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(4), (5, 6))
    full = model(x)
    assert full.shape == (5, 6 + 3)
    np.testing.assert_allclose(
        np.asarray(full[:, :6]), np.asarray(model.forward_ae(x)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(full[:, 6:]), np.asarray(model.forward_reg(x)), rtol=1e-6
    )


def test_regmodel_reorders():
    model = RegAutoEncoder([6, 8, 2], [2, 8, 6], [2, 8, 1], K=3, seed=1)
    x = jax.random.normal(jax.random.PRNGKey(5), (5, 6))
    y = model.forward_reg(x)
    rm = RegModel(model, [1, 2, 0])
    np.testing.assert_allclose(
        np.asarray(rm(x)), np.asarray(y[:, [1, 2, 0]]), rtol=1e-6
    )
    with pytest.raises(AssertionError):
        RegModel(model, [0, 0, 1])


def test_models_are_pytrees():
    model = AutoEncoder([4, 6, 2], [2, 6, 4], seed=0)
    leaves = jax.tree_util.tree_leaves(model)
    assert all(hasattr(l, "shape") for l in leaves)
    # jit/grad transparency
    x = jnp.ones((3, 4))

    @jax.jit
    def loss(m):
        return ((m(x) - x) ** 2).sum()

    g = jax.grad(loss)(model)
    assert isinstance(g, AutoEncoder)
    assert g.encoder.params[0]["weight"].shape == (6, 4)
