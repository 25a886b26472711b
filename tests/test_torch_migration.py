"""Migration to/from trained reference checkpoints: load the ACTUAL
reference models' torch state dicts into framework models (and write
reference-compatible state dicts BACK, consumed by the real reference with
``strict=True``), verifying identical forward outputs both ways."""

import numpy as np
import pytest
import torch

from colvarsfinder_tpu.checkpoint import (
    load_torch_state_dict,
    save_torch_state_dict,
)
from colvarsfinder_tpu.models import (
    AutoEncoder,
    EigenFunctions,
    RegAutoEncoder,
    create_sequential_nn,
)

from test_reference_golden import reference  # noqa: F401  (fixture)


def _fwd(model, x):
    return np.asarray(model(x.astype(np.float32)))


def test_sequential_from_torch(reference, tmp_path):
    _, ref_nn = reference
    dims = [3, 8, 2]
    net_t = ref_nn.create_sequential_nn(dims)
    path = str(tmp_path / "seq.pt")
    torch.save(net_t.state_dict(), path)

    net_j = load_torch_state_dict(create_sequential_nn(dims), path)
    x = np.random.default_rng(0).standard_normal((5, 3)).astype(np.float32)
    np.testing.assert_allclose(
        _fwd(net_j, x), net_t(torch.from_numpy(x)).detach().numpy(),
        atol=1e-6,
    )


def test_autoencoder_from_torch(reference, tmp_path):
    _, ref_nn = reference
    e, d = [4, 10, 1], [1, 10, 4]
    model_t = ref_nn.AutoEncoder(e, d)
    path = str(tmp_path / "ae.pt")
    torch.save(model_t.state_dict(), path)

    model_j = load_torch_state_dict(AutoEncoder(e, d, seed=0), path)
    x = np.random.default_rng(1).standard_normal((6, 4)).astype(np.float32)
    np.testing.assert_allclose(
        _fwd(model_j, x), model_t(torch.from_numpy(x)).detach().numpy(),
        atol=1e-6,
    )


def test_eigenfunctions_from_torch(reference, tmp_path):
    _, ref_nn = reference
    dims, k = [4, 10, 1], 3
    model_t = ref_nn.EigenFunctions(dims, k)
    path = str(tmp_path / "eig.pt")
    torch.save(model_t.state_dict(), path)

    model_j = load_torch_state_dict(EigenFunctions(dims, k, seed=0), path)
    x = np.random.default_rng(2).standard_normal((6, 4)).astype(np.float32)
    np.testing.assert_allclose(
        _fwd(model_j, x), model_t(torch.from_numpy(x)).detach().numpy(),
        atol=1e-6,
    )


def test_regautoencoder_from_torch(reference, tmp_path):
    _, ref_nn = reference
    e, d, r, K = [4, 10, 2], [2, 10, 4], [2, 6, 1], 2
    model_t = ref_nn.RegAutoEncoder(e, d, r, K)
    path = str(tmp_path / "regae.pt")
    torch.save(model_t.state_dict(), path)

    model_j = load_torch_state_dict(RegAutoEncoder(e, d, r, K, seed=0), path)
    x = np.random.default_rng(3).standard_normal((6, 4)).astype(np.float32)
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(
        np.asarray(model_j.forward_ae(x)),
        model_t.forward_ae(xt).detach().numpy(), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(model_j.forward_reg(x)),
        model_t.forward_reg(xt).detach().numpy(), atol=1e-6,
    )


def test_unsupported_type_raises():
    with pytest.raises(TypeError, match="unsupported model type"):
        load_torch_state_dict(object(), {})


# ---------------------------------------------------------------------------
# reverse migration: framework model -> reference model.pt (strict=True)
# ---------------------------------------------------------------------------


def test_sequential_to_torch(reference, tmp_path):
    _, ref_nn = reference
    dims = [3, 8, 2]
    net_j = create_sequential_nn(dims, seed=4)
    path = str(tmp_path / "seq_out.pt")
    save_torch_state_dict(net_j, path)

    net_t = ref_nn.create_sequential_nn(dims)
    # the round-trip contract: the reference consumes it strict=True
    net_t.load_state_dict(
        torch.load(path, weights_only=True), strict=True
    )
    x = np.random.default_rng(4).standard_normal((5, 3)).astype(np.float32)
    np.testing.assert_allclose(
        _fwd(net_j, x), net_t(torch.from_numpy(x)).detach().numpy(),
        atol=1e-6,
    )


def test_eigenfunctions_to_torch(reference, tmp_path):
    _, ref_nn = reference
    dims, k = [4, 10, 1], 3
    model_j = EigenFunctions(dims, k, seed=5)
    path = str(tmp_path / "eig_out.pt")
    save_torch_state_dict(model_j, path)

    model_t = ref_nn.EigenFunctions(dims, k)
    model_t.load_state_dict(
        torch.load(path, weights_only=True), strict=True
    )
    x = np.random.default_rng(5).standard_normal((6, 4)).astype(np.float32)
    np.testing.assert_allclose(
        _fwd(model_j, x), model_t(torch.from_numpy(x)).detach().numpy(),
        atol=1e-6,
    )


def test_autoencoder_to_torch(reference, tmp_path):
    _, ref_nn = reference
    e, d = [4, 10, 1], [1, 10, 4]
    model_j = AutoEncoder(e, d, seed=6)
    path = str(tmp_path / "ae_out.pt")
    save_torch_state_dict(model_j, path)

    model_t = ref_nn.AutoEncoder(e, d)
    model_t.load_state_dict(
        torch.load(path, weights_only=True), strict=True
    )
    x = np.random.default_rng(6).standard_normal((6, 4)).astype(np.float32)
    np.testing.assert_allclose(
        _fwd(model_j, x), model_t(torch.from_numpy(x)).detach().numpy(),
        atol=1e-6,
    )


def test_regautoencoder_to_torch(reference, tmp_path):
    _, ref_nn = reference
    e, d, r, K = [4, 10, 2], [2, 10, 4], [2, 6, 1], 2
    model_j = RegAutoEncoder(e, d, r, K, seed=7)
    path = str(tmp_path / "regae_out.pt")
    save_torch_state_dict(model_j, path)

    model_t = ref_nn.RegAutoEncoder(e, d, r, K)
    model_t.load_state_dict(
        torch.load(path, weights_only=True), strict=True
    )
    x = np.random.default_rng(7).standard_normal((6, 4)).astype(np.float32)
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(
        np.asarray(model_j.forward_ae(x)),
        model_t.forward_ae(xt).detach().numpy(), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(model_j.forward_reg(x)),
        model_t.forward_reg(xt).detach().numpy(), atol=1e-6,
    )


def test_torch_round_trip_identity(tmp_path):
    """save_torch_state_dict o load_torch_state_dict == identity (no
    reference needed)."""
    model = EigenFunctions([4, 8, 1], k=2, seed=8)
    sd = save_torch_state_dict(model)
    back = load_torch_state_dict(EigenFunctions([4, 8, 1], k=2, seed=9), sd)
    for la, lb in zip(model.params, back.params):
        np.testing.assert_array_equal(
            np.asarray(la["weight"]), np.asarray(lb["weight"])
        )
        np.testing.assert_array_equal(
            np.asarray(la["bias"]), np.asarray(lb["bias"])
        )


def test_save_torch_unsupported_type_raises():
    with pytest.raises(TypeError, match="unsupported model type"):
        save_torch_state_dict(object())
