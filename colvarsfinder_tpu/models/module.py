r"""Functional pytree module system for colvarsfinder-tpu.

TPU-first design notes
----------------------
Models are *pytrees of parameters* with static (hashable) architecture
metadata. They compose with ``jax.jit`` / ``jax.grad`` / ``jax.vmap``
directly: a model object can be passed straight into a jitted train step and
differentiated with respect to — the parameter leaves are traced, the
architecture is baked into the compiled program.

Parameter conventions intentionally mirror the reference framework's
``torch.nn.Linear`` (reference: colvarsfinder/nn.py:29-59) so that parameters
trained elsewhere can be transplanted verbatim for parity testing:

* ``weight`` has shape ``[d_out, d_in]`` and ``y = x @ W.T + b``;
* default initialization is U(-1/sqrt(d_in), 1/sqrt(d_in)) for both
  weight and bias (the torch.nn.Linear default);
* parameter names follow the reference's sequential-module naming
  (modules named ``'1'``, ``'2'``, ... so parameter names are
  ``'1.weight'``, ``'1.bias'``, ...; reference nn.py:52-57).

Everything here is pure: ``init`` consumes a PRNG key, ``__call__`` is a
pure function of (params, input).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import bf16_style, compute_dtype, default_dtype, matmul_precision

__all__ = [
    "ACTIVATIONS",
    "Sequential",
    "create_sequential_nn",
    "linear_init",
    "mlp_init",
    "mlp_apply",
    "stacked_mlp_init",
    "stacked_mlp_apply",
]

# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def _tanh_precise(x: jnp.ndarray) -> jnp.ndarray:
    """tanh via the exp formula, ~18x more accurate than the TPU backend's
    native polynomial approximation (2.4e-6 vs 4.4e-5 max abs error), which
    matters for the 1e-5 loss-parity bar against the f32 reference.

    The input is clipped to [-20, 20]: f32 tanh saturates to +-1 well before
    that, the clip prevents exp overflow, and the zeroed gradient outside
    the window equals the true gradient (~4e-18) at f32.
    """
    xc = jnp.clip(x, -20.0, 20.0)
    return 1.0 - 2.0 / (jnp.exp(2.0 * xc) + 1.0)


ACTIVATIONS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "tanh": _tanh_precise,
    "tanh_native": jnp.tanh,
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "celu": jax.nn.celu,
    "softplus": jax.nn.softplus,
    "identity": lambda x: x,
}


def resolve_activation(activation) -> str:
    """Normalize an activation spec (string or callable) to a registry name."""
    if isinstance(activation, str):
        name = activation.lower()
        if name not in ACTIVATIONS:
            raise ValueError(
                f"unknown activation '{activation}'; known: {sorted(ACTIVATIONS)}"
            )
        return name
    # accept callables that are values of the registry
    for name, fn in ACTIVATIONS.items():
        if activation is fn:
            return name
    raise ValueError(
        "activation must be a string name or a function from ACTIVATIONS; "
        f"got {activation!r}"
    )


# ---------------------------------------------------------------------------
# Parameter init / apply for plain MLPs
# ---------------------------------------------------------------------------


def linear_init(key: jax.Array, d_in: int, d_out: int, dtype=None) -> dict:
    """Init one linear layer with the torch.nn.Linear default distribution.

    Both weight and bias ~ U(-1/sqrt(d_in), 1/sqrt(d_in)); weight is
    [d_out, d_in] (torch convention) so transplant tests can copy
    state dicts without transposes.
    """
    if dtype is None:
        dtype = default_dtype()
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    weight = jax.random.uniform(kw, (d_out, d_in), dtype, -bound, bound)
    bias = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
    return {"weight": weight, "bias": bias}


def mlp_init(
    key: jax.Array, layer_dims: Sequence[int], dtype=None
) -> Tuple[dict, ...]:
    """Init parameters of a feedforward net with the given layer dims."""
    assert len(layer_dims) >= 2, (
        "Error: at least 2 layers are needed to define a neural network "
        f"(length={len(layer_dims)})!"
    )
    keys = jax.random.split(key, len(layer_dims) - 1)
    return tuple(
        linear_init(k, layer_dims[i], layer_dims[i + 1], dtype)
        for i, k in enumerate(keys)
    )


def mlp_apply(params: Sequence[dict], x: jnp.ndarray, activation: str) -> jnp.ndarray:
    """Apply an MLP: activation between layers, none after the last layer.

    When ``config.set_compute_dtype('bfloat16')`` is active (and the input
    is float32), layers run in mixed precision: inputs/weights cast to
    bfloat16 per layer, activations stored bfloat16, output cast back to
    the input dtype. See config.set_compute_dtype for the rationale
    (HBM-bandwidth-bound steps at this model scale).
    """
    act = ACTIVATIONS[activation]
    n = len(params)
    cdt = compute_dtype()
    mixed = cdt != jnp.float32 and x.dtype == jnp.float32
    style = bf16_style() if mixed else "pure"
    h = x.astype(cdt) if mixed else x
    for i, layer in enumerate(params):
        W, b = layer["weight"], layer["bias"]
        if mixed:
            if style == "w32":
                # f32 master weights enter the dot unrounded; the stored
                # bf16 activation upcasts exactly, so the contraction runs
                # at full matmul precision and only the activation storage
                # is quantized
                h = h.astype(x.dtype)
            else:
                # bf16 operands; 'acc32' accumulates in f32 (MXU-native
                # bf16xbf16->f32) and keeps the bias-add + activation f32
                W = W.astype(cdt)
                b = b if style == "acc32" else b.astype(cdt)
        pref = cdt if (mixed and style == "pure") else x.dtype
        h = (
            jnp.matmul(
                h, W.T, precision=matmul_precision(),
                preferred_element_type=pref,
            )
            + b
        )
        if i < n - 1:
            h = act(h)
            if mixed and style != "pure":
                h = h.astype(cdt)  # re-quantize for the next layer's read
    return h.astype(x.dtype) if mixed else h


# ---------------------------------------------------------------------------
# Stacked (ensemble) MLPs — the TPU-first replacement for ModuleList loops
# ---------------------------------------------------------------------------


def stacked_mlp_init(
    key: jax.Array, layer_dims: Sequence[int], k: int, dtype=None
) -> Tuple[dict, ...]:
    """Init k independent MLPs stored stacked along a leading axis.

    Where the reference evaluates k separate networks in a Python loop
    (reference: colvarsfinder/nn.py:272,293), we stack their parameters
    ([k, d_out, d_in] weights) and evaluate all k heads with one batched
    matmul per layer, which maps onto the MXU as a single large
    contraction rather than k small ones.
    """
    keys = jax.random.split(key, k)
    per_net = [mlp_init(kk, layer_dims, dtype) for kk in keys]
    stacked = []
    for li in range(len(layer_dims) - 1):
        stacked.append(
            {
                "weight": jnp.stack([p[li]["weight"] for p in per_net]),
                "bias": jnp.stack([p[li]["bias"] for p in per_net]),
            }
        )
    return tuple(stacked)


def stacked_mlp_apply(
    params: Sequence[dict], x: jnp.ndarray, activation: str
) -> jnp.ndarray:
    """Apply k stacked MLPs to a shared input batch.

    Args:
        params: layers with 'weight' [k, d_out, d_in], 'bias' [k, d_out].
        x: input [batch, d_in] shared by all k networks.

    Returns:
        [batch, k * d_out_last] — for scalar heads (d_out_last == 1) this is
        [batch, k], matching the reference's concatenated head layout
        (reference: colvarsfinder/nn.py:293).
    """
    act = ACTIVATIONS[activation]
    n = len(params)
    k = params[0]["weight"].shape[0]
    squeeze = x.ndim == 1  # single state, like torch.nn.Linear on a vector
    if squeeze:
        x = x[None]
    cdt = compute_dtype()
    mixed = cdt != jnp.float32 and x.dtype == jnp.float32
    style = bf16_style() if mixed else "pure"
    if mixed:
        x_c = x.astype(cdt)
    else:
        x_c = x
    # broadcast the batch across the ensemble axis: h [k, batch, d]
    h = jnp.broadcast_to(x_c[None], (k,) + x_c.shape)
    for i, layer in enumerate(params):
        W, b = layer["weight"], layer["bias"]
        if mixed:
            if style == "w32":
                # f32 master weights, exact bf16->f32 activation upcast:
                # contraction at full matmul precision, only the activation
                # storage is quantized (see config.set_bf16_style)
                h = h.astype(x.dtype)
            else:
                # bf16 operands; 'acc32' accumulates in f32 (MXU-native
                # bf16xbf16->f32) and keeps the bias-add + activation f32
                W = W.astype(cdt)
                b = b if style == "acc32" else b.astype(cdt)
        pref = cdt if (mixed and style == "pure") else x.dtype
        # [k,b,i] x [k,o,i] -> [k,b,o]: one batched contraction on the MXU
        h = (
            jax.lax.dot_general(
                h,
                W,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=pref,
                precision=matmul_precision(),
            )
            + b[:, None, :]
        )
        if i < n - 1:
            h = act(h)
            if mixed and style != "pure":
                h = h.astype(cdt)  # re-quantize for the next layer's read
    # [k, b, d_out] -> [b, k * d_out] with per-head blocks contiguous
    h = jnp.transpose(h, (1, 0, 2))
    h = h.reshape(h.shape[0], -1)
    if mixed:
        h = h.astype(x.dtype)
    return h[0] if squeeze else h


# ---------------------------------------------------------------------------
# Sequential: the user-facing feedforward network object
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Sequential:
    """A feedforward network as a parameter pytree.

    Mirrors the role of ``create_sequential_nn``'s return value in the
    reference (colvarsfinder/nn.py:29-59): linear layers with the given
    activation between them and no activation after the final layer.
    """

    params: Tuple[dict, ...]
    activation: str = "tanh"
    layer_dims: Tuple[int, ...] = ()

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return mlp_apply(self.params, x, self.activation)

    def get_params_of_cv(self, cv_idx: int):
        """Named parameters of output ``cv_idx`` as one CV (for direct
        heads like the committor's logit net; same dump format and
        last-layer slicing as the encoder-based models)."""
        from .ae import _sliced_cv_params

        encoded_dim = int(self.params[-1]["weight"].shape[0])
        return _sliced_cv_params(self, cv_idx, encoded_dim)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.params,), (self.activation, tuple(self.layer_dims))

    @classmethod
    def tree_unflatten(cls, aux, children):
        activation, layer_dims = aux
        return cls(children[0], activation, layer_dims)

    # -- torch-style parameter naming ---------------------------------------
    def named_parameters(self):
        """Yield (name, array) pairs with reference-compatible names.

        The reference names sequential submodules '1', '2', ... so parameter
        names are '1.weight', '1.bias', ... (reference nn.py:52-57).
        """
        for i, layer in enumerate(self.params):
            yield f"{i + 1}.weight", layer["weight"]
            yield f"{i + 1}.bias", layer["bias"]

    @property
    def num_layers(self) -> int:
        return len(self.params)


def create_sequential_nn(
    layer_dims: Sequence[int],
    activation="tanh",
    *,
    key: jax.Array | None = None,
    seed: int = 0,
    dtype=None,
) -> Sequential:
    """Construct a feedforward network (reference: colvarsfinder/nn.py:29).

    Unlike the reference this is a pure function of an explicit PRNG key
    (pass ``key=``, or ``seed=`` as a convenience).
    """
    act = resolve_activation(activation)
    if key is None:
        key = jax.random.PRNGKey(seed)
    params = mlp_init(key, layer_dims, dtype)
    return Sequential(params, act, tuple(int(d) for d in layer_dims))


def params_from_numpy(named: dict[str, np.ndarray], layer_dims, activation="tanh"):
    """Build a Sequential from a dict of torch-style named parameters.

    Used for transplanting a torch state_dict (parity tests, migration from
    the reference framework).
    """
    n = len(layer_dims) - 1
    params = []
    for i in range(n):
        params.append(
            {
                "weight": jnp.asarray(named[f"{i + 1}.weight"]),
                "bias": jnp.asarray(named[f"{i + 1}.bias"]),
            }
        )
    return Sequential(
        tuple(params), resolve_activation(activation), tuple(int(d) for d in layer_dims)
    )
