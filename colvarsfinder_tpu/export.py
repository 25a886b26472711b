r"""Collective-variable model composition and deployment export.

The reference's deployment artifact is a TorchScript module
``scripted_cv_cpu.pt`` consumed by downstream MD engines for biased sampling
(reference: colvarsfinder/core.py:212-227). The TPU-native replacement is:

* ``cv_params.npz`` + ``cv_spec.json`` — parameters and architecture spec,
  reloadable into a Python callable without any compiled artifact;
* ``cv_exported.bin`` — a serialized ``jax.export`` StableHLO program with a
  *symbolic batch dimension*, callable from any JAX runtime (CPU/TPU)
  without the model-building code. The program takes the parameter pytree as
  inputs, so re-saving after further training only rewrites the .npz —
  the StableHLO is exported once per architecture.
* ``cv_grad_exported.bin`` — a second StableHLO program computing
  ``(values, dCV/dx)``; biased-MD consumers need the input Jacobian for
  forces (the TorchScript artifact exposes it via torch autograd).

:class:`ColvarModel` is the composition :math:`\xi = g \circ r` of a
preprocessing layer and a trained head (reference: core.py:372-382,
:640-647); it is itself a pytree and can be jitted/vmapped/differentiated.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import save_pytree

__all__ = ["ColvarModel", "export_colvar", "load_colvar"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ColvarModel:
    """Composition of preprocessing layer and trained head: ``head(pp(x))``.

    Counterpart of the reference's ``torch.nn.Sequential(pp_layer, head)``
    (reference: colvarsfinder/core.py:382, :647, :868).
    """

    pp_layer: Any  # pytree or plain callable
    head: Any  # pytree model

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.head(self.pp_layer(x))

    forward = __call__

    def tree_flatten(self):
        return (self.pp_layer, self.head), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _apply_fn(cv_model_struct):
    """A (params, x) -> cv function where params carries all array leaves."""

    def apply(params, x):
        model = jax.tree_util.tree_unflatten(cv_model_struct, params)
        return model(x)

    return apply


def _apply_grad_fn(cv_model_struct):
    """A (params, x) -> (cv, dcv/dx) function: values plus the per-sample
    input Jacobian [batch, k, *state] — the forces a biased-MD consumer
    needs (the reference's TorchScript artifact exposes them via torch
    autograd, core.py:212-227)."""

    def apply(params, x):
        model = jax.tree_util.tree_unflatten(cv_model_struct, params)
        jac = jax.vmap(jax.jacrev(lambda s: model(s[None])[0]))(x)
        return model(x), jac

    return apply


def export_colvar(
    cv_model: ColvarModel,
    example_input: np.ndarray,
    out_dir: str,
    *,
    write_stablehlo: bool = True,
    _exported_cache: dict | None = None,
) -> None:
    """Write the deployment artifact set for a CV model.

    Args:
        cv_model: the composed CV model.
        example_input: one example state (or batch) defining input rank/dims;
            the exported program has a symbolic leading batch dimension.
        out_dir: directory to place ``cv_params.npz``, ``cv_spec.json`` and
            (optionally) ``cv_exported.bin``.
        write_stablehlo: skip the StableHLO program (cheap-save mode).
        _exported_cache: optional dict reused across saves so the StableHLO
            export (a compile) happens once per architecture.
    """
    os.makedirs(out_dir, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(cv_model)
    save_pytree(cv_model, os.path.join(out_dir, "cv_params.npz"))

    x = np.asarray(example_input)
    if x.ndim == 0:
        raise ValueError("example_input must have at least 1 dimension")
    state_shape = tuple(x.shape[1:]) if x.ndim > 1 else (x.shape[0],)

    from .checkpoint import tree_to_named_arrays

    spec = {
        "format": "colvarsfinder-tpu-cv/1",
        "input_state_shape": list(state_shape),
        "pp_layer": type(cv_model.pp_layer).__name__,
        "head": type(cv_model.head).__name__,
        # leaf names in tree_flatten order — load_colvar reconstructs the
        # parameter list by NAME from this manifest rather than relying on
        # np.load's file ordering
        "param_order": list(tree_to_named_arrays(cv_model).keys()),
    }
    with open(os.path.join(out_dir, "cv_spec.json"), "w") as f:
        json.dump(spec, f, indent=2)

    # best-effort numpy-only artifact for JAX-less consumers (MD-engine
    # plugins); Lambda-style opaque pp layers have no such representation
    from .deploy import UnsupportedLayerError, save_numpy_cv

    try:
        save_numpy_cv(cv_model, out_dir)
    except UnsupportedLayerError:
        pass

    # reference-format TorchScript artifact (scripted_cv_cpu.pt, reference
    # core.py:212-227) — written only when torch is ALREADY loaded in this
    # process, so non-torch users never pay the import; call
    # deploy_torch.export_torchscript_cv (or torchscript_from_numpy_cv on a
    # saved artifact) to write it explicitly.
    import sys

    if "torch" in sys.modules:
        from .deploy_torch import export_torchscript_cv

        try:
            export_torchscript_cv(cv_model, out_dir)
        except UnsupportedLayerError:
            pass

    if not write_stablehlo:
        return

    from jax import export as jax_export

    cache = _exported_cache if _exported_cache is not None else {}
    b = jax_export.symbolic_shape("b")[0]
    x_spec = jax.ShapeDtypeStruct((b,) + state_shape, jnp.float32)
    leaf_specs = [
        jax.ShapeDtypeStruct(np.shape(l), jnp.asarray(l).dtype) for l in leaves
    ]
    for tag, make_fn, fname in (
        ("stablehlo", _apply_fn, "cv_exported.bin"),
        ("stablehlo_grad", _apply_grad_fn, "cv_grad_exported.bin"),
    ):
        cache_key = (tag, treedef, state_shape)
        blob = cache.get(cache_key)
        if blob is None:
            exported = jax_export.export(jax.jit(make_fn(treedef)))(
                leaf_specs, x_spec
            )
            blob = bytes(exported.serialize())
            cache[cache_key] = blob
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(blob)


def load_colvar(
    out_dir: str, with_grad: bool = False
) -> Callable[[np.ndarray], jnp.ndarray]:
    """Load a deployed CV artifact as a plain callable ``x -> cv(x)``.

    Prefers the serialized StableHLO program (no model code needed); the
    parameters are fed from ``cv_params.npz``. With ``with_grad=True`` the
    callable returns ``(values, jacobian)`` from the exported gradient
    program (``cv_grad_exported.bin``) — forces for biased-MD consumers.
    """
    from jax import export as jax_export

    fname = "cv_grad_exported.bin" if with_grad else "cv_exported.bin"
    path = os.path.join(out_dir, fname)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no exported CV program at {path}; re-save with "
            "write_stablehlo=True"
        )
    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))

    spec_path = os.path.join(out_dir, "cv_spec.json")
    order = None
    if os.path.exists(spec_path):
        with open(spec_path) as f:
            order = json.load(f).get("param_order")
    with np.load(os.path.join(out_dir, "cv_params.npz")) as data:
        # leaves are keyed by tree-path name; the spec's param_order
        # manifest gives their tree_flatten order (artifacts written
        # before the manifest existed fall back to file order, which
        # savez preserved on the numpy versions that wrote them)
        keys = order if order is not None else list(data.files)
        params = [jnp.asarray(data[k]) for k in keys]

    def cv(x):
        x = jnp.asarray(x, dtype=jnp.float32)
        squeeze = x.ndim == len(exported.in_avals[-1].shape) - 1
        if squeeze:
            x = x[None]
        out = exported.call(params, x)
        if with_grad:
            val, jac = out
            return (val[0], jac[0]) if squeeze else (val, jac)
        return out[0] if squeeze else out

    return cv
