r"""Eigenfunction ensemble model.

TPU-native counterpart of the reference's ``EigenFunctions``
(reference: colvarsfinder/nn.py:242-294): k scalar-valued feedforward
networks of identical architecture.

Design divergence: the reference keeps a ``torch.nn.ModuleList`` and
evaluates the k networks in a Python loop (nn.py:293). Here the k networks
are a stacked-parameter ensemble — weights [k, d_out, d_in] — evaluated with
one batched contraction per layer, so all k heads ride a single MXU pass.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .module import (
    resolve_activation,
    stacked_mlp_apply,
    stacked_mlp_init,
)

__all__ = ["EigenFunctions"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EigenFunctions:
    """k scalar eigenfunction networks with shared architecture.

    Args:
        layer_dims: layer dimensions of each eigenfunction net; last must be 1
        k: number of eigenfunctions
        activation: nonlinearity name (or registry function)

    Attributes:
        params: stacked layer parameters (weight [k, d_out, d_in])
        k: number of eigenfunctions
    """

    params: Tuple[dict, ...]
    activation: str
    layer_dims: Tuple[int, ...]
    k: int

    def __init__(
        self,
        layer_dims: Sequence[int] | None = None,
        k: int | None = None,
        activation="tanh",
        *,
        key: jax.Array | None = None,
        seed: int = 0,
        params: Tuple[dict, ...] | None = None,
        _layer_dims: Tuple[int, ...] = (),
        _k: int = 0,
    ):
        if params is not None:
            self.params = params
            self.activation = activation
            self.layer_dims = _layer_dims
            self.k = _k
            return
        assert layer_dims[-1] == 1, "each eigenfunction must be scalar-valued"
        self.activation = resolve_activation(activation)
        self.layer_dims = tuple(int(d) for d in layer_dims)
        self.k = int(k)
        if key is None:
            key = jax.random.PRNGKey(seed)
        self.params = stacked_mlp_init(key, layer_dims, self.k)

    def __call__(self, inp: jnp.ndarray) -> jnp.ndarray:
        """Evaluate all k eigenfunctions.

        Args:
            inp: [batch, d_r] (output of the preprocessing layer).

        Returns:
            [batch, k] (reference nn.py:286-293 concatenation layout).
        """
        return stacked_mlp_apply(self.params, inp, self.activation)

    forward = __call__

    def get_params_of_cv(self, cv_idx: int):
        """Named parameters of eigenfunction ``cv_idx``
        (reference: colvarsfinder/nn.py:274-284)."""
        param_vec = []
        for i, layer in enumerate(self.params):
            param_vec.append([f"{i + 1}.weight", layer["weight"][cv_idx]])
            param_vec.append([f"{i + 1}.bias", layer["bias"][cv_idx]])
        return param_vec

    def reordered(self, cvec) -> "EigenFunctions":
        """Return a new EigenFunctions with heads permuted by ``cvec``.

        Counterpart of the reference's deep-copy module-list reordering
        (reference: colvarsfinder/core.py:356-370) — here a stacked gather.
        """
        cvec_list = [int(c) for c in np.asarray(cvec).tolist()]
        assert sorted(cvec_list) == list(range(self.k)), (
            f"cvec should be a permutation of 0,1,...,{self.k - 1}."
        )
        order = jnp.asarray(cvec_list, dtype=jnp.int32)
        new_params = tuple(
            {"weight": layer["weight"][order], "bias": layer["bias"][order]}
            for layer in self.params
        )
        return EigenFunctions(
            params=new_params,
            activation=self.activation,
            _layer_dims=self.layer_dims,
            _k=self.k,
        )

    # -- pytree protocol -------------------------------------------------------
    def tree_flatten(self):
        return (self.params,), (self.activation, self.layer_dims, self.k)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            params=children[0], activation=aux[0], _layer_dims=aux[1], _k=aux[2]
        )
