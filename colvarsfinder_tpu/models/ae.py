r"""Autoencoder model families.

TPU-native counterparts of the reference's autoencoder classes
(reference: colvarsfinder/nn.py:61-239). All models are parameter pytrees
(see :mod:`colvarsfinder_tpu.models.module`) and therefore jit/grad/vmap
transparent.

Design divergence from the reference: the K regularizer heads of
:class:`RegAutoEncoder` are a *stacked ensemble* evaluated with one batched
matmul per layer instead of a ModuleList Python loop (reference nn.py:152,
194) — a single large MXU contraction instead of K small ones.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .module import (
    Sequential,
    mlp_init,
    resolve_activation,
    stacked_mlp_apply,
    stacked_mlp_init,
)

__all__ = ["AutoEncoder", "RegAutoEncoder", "RegModel"]


def _sliced_cv_params(encoder: Sequential, cv_idx: int, encoded_dim: int):
    """Shared implementation of get_params_of_cv for encoder-based models.

    Mirrors reference nn.py:89-105: all layers in full, except the last
    linear layer which is sliced to the single output row of the requested
    collective variable.
    """
    assert 0 <= cv_idx < encoded_dim, (
        f"index {cv_idx} exceeded the range [0, {encoded_dim - 1}]!"
    )
    num_layers = encoder.num_layers
    param_vec = []
    for i, layer in enumerate(encoder.params):
        w, b = layer["weight"], layer["bias"]
        if i == num_layers - 1:
            w = w[cv_idx : cv_idx + 1, ...]
            b = b[cv_idx : cv_idx + 1, ...]
        param_vec.append([f"{i + 1}.weight", w])
        param_vec.append([f"{i + 1}.bias", b])
    return param_vec


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AutoEncoder:
    """Autoencoder (reference: colvarsfinder/nn.py:61-114).

    Attributes:
        encoder: feedforward network representing the encoder
        decoder: feedforward network representing the decoder
        encoded_dim: bottleneck dimension
    """

    encoder: Sequential
    decoder: Sequential

    def __init__(
        self,
        e_layer_dims: Sequence[int] | None = None,
        d_layer_dims: Sequence[int] | None = None,
        activation="tanh",
        *,
        key: jax.Array | None = None,
        seed: int = 0,
        encoder: Sequential | None = None,
        decoder: Sequential | None = None,
    ):
        if encoder is not None and decoder is not None:
            self.encoder, self.decoder = encoder, decoder
            return
        assert e_layer_dims[-1] == d_layer_dims[0], (
            "ouput dimension of encoder and input dimension of decoder do not match!"
        )
        act = resolve_activation(activation)
        if key is None:
            key = jax.random.PRNGKey(seed)
        ke, kd = jax.random.split(key)
        self.encoder = Sequential(mlp_init(ke, e_layer_dims), act, tuple(e_layer_dims))
        self.decoder = Sequential(mlp_init(kd, d_layer_dims), act, tuple(d_layer_dims))

    # -- properties ----------------------------------------------------------
    @property
    def encoded_dim(self) -> int:
        return self.encoder.layer_dims[-1]

    @property
    def _num_encoder_layer(self) -> int:
        return self.encoder.num_layers

    # -- forward -------------------------------------------------------------
    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.encoder(inp))

    forward = __call__

    def get_params_of_cv(self, cv_idx: int):
        """Per-CV parameter slices (reference: colvarsfinder/nn.py:89-105)."""
        return _sliced_cv_params(self.encoder, cv_idx, self.encoded_dim)

    # -- pytree protocol -------------------------------------------------------
    def tree_flatten(self):
        return (self.encoder, self.decoder), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(encoder=children[0], decoder=children[1])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RegAutoEncoder:
    """Regularized autoencoder (reference: colvarsfinder/nn.py:116-203).

    The K regularizer networks are stored as a single stacked-parameter
    ensemble (``reg``: layers with weight [K, d_out, d_in]) and evaluated
    jointly — see module docstring.

    Attributes:
        encoder / decoder: feedforward networks
        reg: stacked regularizer parameters, or None when K == 0
        encoded_dim: bottleneck dimension
        num_reg: number of regularizer heads (K)
    """

    encoder: Sequential
    decoder: Sequential
    reg: Tuple[dict, ...] | None
    reg_layer_dims: Tuple[int, ...]
    num_reg: int

    def __init__(
        self,
        e_layer_dims: Sequence[int] | None = None,
        d_layer_dims: Sequence[int] | None = None,
        reg_layer_dims: Sequence[int] | None = None,
        K: int | None = None,
        activation="tanh",
        *,
        key: jax.Array | None = None,
        seed: int = 0,
        encoder: Sequential | None = None,
        decoder: Sequential | None = None,
        reg: Tuple[dict, ...] | None = None,
        _reg_layer_dims: Tuple[int, ...] = (),
        _num_reg: int = 0,
    ):
        if encoder is not None:
            self.encoder, self.decoder, self.reg = encoder, decoder, reg
            self.reg_layer_dims = _reg_layer_dims
            self.num_reg = _num_reg
            return
        assert e_layer_dims[-1] == d_layer_dims[0], (
            "ouput dimension of encoder and input dimension of decoder do not match!"
        )
        self.num_reg = int(K)
        assert self.num_reg == 0 or e_layer_dims[-1] == reg_layer_dims[0], (
            "ouput dimension of encoder and input dimension of regulator part "
            "do not match!"
        )
        act = resolve_activation(activation)
        if key is None:
            key = jax.random.PRNGKey(seed)
        ke, kd, kr = jax.random.split(key, 3)
        self.encoder = Sequential(mlp_init(ke, e_layer_dims), act, tuple(e_layer_dims))
        self.decoder = Sequential(mlp_init(kd, d_layer_dims), act, tuple(d_layer_dims))
        if self.num_reg > 0:
            self.reg = stacked_mlp_init(kr, reg_layer_dims, self.num_reg)
            self.reg_layer_dims = tuple(int(d) for d in reg_layer_dims)
        else:
            self.reg = None
            self.reg_layer_dims = ()

    @property
    def encoded_dim(self) -> int:
        return self.encoder.layer_dims[-1]

    @property
    def activation(self) -> str:
        return self.encoder.activation

    # -- forward passes (reference nn.py:173-203) ------------------------------
    def forward_ae(self, inp: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.encoder(inp))

    def forward_reg(self, inp: jnp.ndarray) -> jnp.ndarray:
        assert self.num_reg > 0, "number of regularizers is not positive."
        encoded = self.encoder(inp)
        return stacked_mlp_apply(self.reg, encoded, self.activation)

    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        encoded = self.encoder(inp)
        out_ae = self.decoder(encoded)
        out_reg = stacked_mlp_apply(self.reg, encoded, self.activation)
        return jnp.concatenate((out_ae, out_reg), axis=1)

    forward = __call__

    def get_params_of_cv(self, cv_idx: int):
        return _sliced_cv_params(self.encoder, cv_idx, self.encoded_dim)

    # -- pytree protocol -------------------------------------------------------
    def tree_flatten(self):
        return (self.encoder, self.decoder, self.reg), (
            self.reg_layer_dims,
            self.num_reg,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            encoder=children[0],
            decoder=children[1],
            reg=children[2],
            _reg_layer_dims=aux[0],
            _num_reg=aux[1],
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RegModel:
    """Eigenfunctions built from a trained RegAutoEncoder
    (reference: colvarsfinder/nn.py:205-239).

    Reordering by ``cvec`` is a stacked-parameter gather rather than a
    module-list permutation.
    """

    encoder: Sequential
    reg: Tuple[dict, ...]
    cvec: Tuple[int, ...]
    encoded_dim: int
    num_reg: int

    def __init__(
        self,
        reg_ae: RegAutoEncoder | None = None,
        cvec=None,
        *,
        encoder=None,
        reg=None,
        _encoded_dim=0,
        _num_reg=0,
    ):
        if encoder is not None:
            self.encoder, self.reg = encoder, reg
            self.cvec = tuple(cvec)
            self.encoded_dim, self.num_reg = _encoded_dim, _num_reg
            return
        assert reg_ae.num_reg > 0, "number of regularizers is not positive."
        cvec = [int(c) for c in np.asarray(cvec).tolist()]
        assert len(cvec) == reg_ae.num_reg, (
            "length of cvec doesn't equal to number of regularizers"
        )
        assert sorted(cvec) == list(range(reg_ae.num_reg)), (
            f"cvec should be a permutation of 0,1,...,{len(cvec) - 1}."
        )
        self.encoder = reg_ae.encoder
        order = jnp.asarray(cvec, dtype=jnp.int32)
        self.reg = tuple(
            {"weight": layer["weight"][order], "bias": layer["bias"][order]}
            for layer in reg_ae.reg
        )
        self.cvec = tuple(cvec)
        self.encoded_dim = reg_ae.encoded_dim
        self.num_reg = reg_ae.num_reg

    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        encoded = self.encoder(inp)
        return stacked_mlp_apply(self.reg, encoded, self.encoder.activation)

    forward = __call__

    # -- pytree protocol -------------------------------------------------------
    def tree_flatten(self):
        return (self.encoder, self.reg), (self.cvec, self.encoded_dim, self.num_reg)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            encoder=children[0],
            reg=children[1],
            cvec=aux[0],
            _encoded_dim=aux[1],
            _num_reg=aux[2],
        )
