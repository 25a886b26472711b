r"""Parameter checkpointing.

Replaces the reference's ``state_dict`` save/load
(reference: colvarsfinder/core.py:156-161, :200-201) with a plain
``.npz`` of named parameter leaves plus a JSON spec. Loading follows
``strict=False`` semantics: leaves present in the file and matching in
shape are restored, everything else keeps its current value.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = [
    "tree_to_named_arrays",
    "save_pytree",
    "load_pytree",
    "load_torch_state_dict",
    "save_torch_state_dict",
    "save_spec",
    "save_orbax",
    "load_orbax",
]


def _key_name(path) -> str:
    """Stable, filesystem-friendly name for a tree path."""
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.FlattenedIndexKey):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return ".".join(parts)


def tree_to_named_arrays(tree: Any) -> dict[str, np.ndarray]:
    """Flatten a pytree into {path-name: numpy array}."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_key_name(path): np.asarray(leaf) for path, leaf in leaves}


def save_pytree(tree: Any, filename: str) -> None:
    """Save all array leaves of a pytree to an .npz file."""
    np.savez(filename, **tree_to_named_arrays(tree))


def load_pytree(tree: Any, filename: str, strict: bool = False) -> Any:
    """Restore leaves of ``tree`` from an .npz written by :func:`save_pytree`.

    Non-strict (default): keys missing from the file, or with mismatched
    shapes, keep the current value — mirroring the reference's
    ``load_state_dict(..., strict=False)`` restart path (core.py:158).
    """
    with np.load(filename) as data:
        stored = {k: data[k] for k in data.files}

    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    new_leaves = []
    for path, leaf in paths_and_leaves:
        name = _key_name(path)
        if name in stored:
            arr = stored[name]
            if arr.shape == np.shape(leaf):
                new_leaves.append(
                    jax.numpy.asarray(arr, dtype=jax.numpy.asarray(leaf).dtype)
                )
                continue
            if strict:
                raise ValueError(
                    f"shape mismatch for '{name}': "
                    f"file {arr.shape} vs model {np.shape(leaf)}"
                )
        elif strict:
            raise KeyError(f"parameter '{name}' not found in {filename}")
        new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_spec(spec: dict, filename: str) -> None:
    """Write a JSON architecture spec next to a checkpoint."""
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    with open(filename, "w") as f:
        json.dump(spec, f, indent=2, default=str)


# ---------------------------------------------------------------------------
# Orbax backend (TPU-ecosystem interop; sharded state stays sharded)
# ---------------------------------------------------------------------------


def save_orbax(tree: Any, directory: str) -> None:
    """Save a pytree as an Orbax checkpoint directory.

    The TPU-idiomatic alternative to :func:`save_pytree` for SHARDED
    state (ensemble sweeps / mesh-sharded replicas): each device writes
    its own shards — no gather onto one host, which is what ``np.asarray``
    in the npz path implies. Also the interop format the broader
    JAX/flax/orbax ecosystem consumes.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    if os.path.isdir(path) and not os.listdir(path):
        os.rmdir(path)  # orbax insists on creating the leaf dir itself
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_orbax(tree: Any, directory: str) -> Any:
    """Restore a pytree saved by :func:`save_orbax`.

    ``tree`` provides the target structure, dtypes, and — for jax arrays
    with a sharding — the placement: sharded leaves are restored
    DIRECTLY to their devices with the template's sharding. Plain
    numpy/scalar leaves come back as host values.
    """
    import orbax.checkpoint as ocp

    def _abstract(leaf):
        if isinstance(leaf, jax.Array):
            return jax.ShapeDtypeStruct(
                leaf.shape, leaf.dtype, sharding=leaf.sharding
            )
        if isinstance(leaf, np.generic):  # numpy scalar -> python scalar
            return leaf.item()
        return leaf

    target = jax.tree_util.tree_map(_abstract, tree)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(directory), target)


def load_torch_state_dict(model: Any, source) -> Any:
    """Build a new model carrying parameters from a PyTorch reference
    checkpoint — the ``model.pt`` state dicts the reference writes
    (reference: colvarsfinder/core.py:200-201) — the migration path for
    users with trained reference models.

    Args:
        model: a framework model supplying the architecture —
            :class:`~colvarsfinder_tpu.models.Sequential`,
            :class:`~colvarsfinder_tpu.models.AutoEncoder`,
            :class:`~colvarsfinder_tpu.models.EigenFunctions`, or
            :class:`~colvarsfinder_tpu.models.RegAutoEncoder`.
        source: path to a torch-saved state dict, or a mapping of
            parameter names to arrays/tensors.

    Returns:
        a new model of the same type with the checkpoint's parameters.
    """
    import jax.numpy as jnp

    from .models.ae import AutoEncoder, RegAutoEncoder
    from .models.eigen import EigenFunctions
    from .models.module import Sequential

    if isinstance(source, (str, os.PathLike)):
        import torch

        source = torch.load(source, map_location="cpu", weights_only=True)
    named = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                      else v)
        for k, v in source.items()
    }

    def seq(template: Sequential, prefix: str) -> Sequential:
        params = tuple(
            {
                "weight": jnp.asarray(named[f"{prefix}{i + 1}.weight"]),
                "bias": jnp.asarray(named[f"{prefix}{i + 1}.bias"]),
            }
            for i in range(template.num_layers)
        )
        return Sequential(params, template.activation, template.layer_dims)

    def stacked(template, prefix: str, k: int):
        """Stack per-head sequential parameters (torch ModuleList layout
        ``{prefix}{head}.{layer}.weight``) into ensemble params."""
        return tuple(
            {
                "weight": jnp.stack([
                    jnp.asarray(named[f"{prefix}{h}.{i + 1}.weight"])
                    for h in range(k)
                ]),
                "bias": jnp.stack([
                    jnp.asarray(named[f"{prefix}{h}.{i + 1}.bias"])
                    for h in range(k)
                ]),
            }
            for i in range(len(template))
        )

    if isinstance(model, Sequential):
        return seq(model, "")
    if isinstance(model, EigenFunctions):
        # reference nn.py:272: torch.nn.ModuleList named 'eigen_funcs'
        return EigenFunctions(
            params=tuple(stacked(model.params, "eigen_funcs.", model.k)),
            activation=model.activation,
            _layer_dims=model.layer_dims,
            _k=model.k,
        )
    if isinstance(model, RegAutoEncoder):
        reg = (
            tuple(stacked(model.reg, "reg.", model.num_reg))
            if model.num_reg > 0 else None
        )
        return RegAutoEncoder(
            encoder=seq(model.encoder, "encoder."),
            decoder=seq(model.decoder, "decoder."),
            reg=reg,
            _reg_layer_dims=model.reg_layer_dims,
            _num_reg=model.num_reg,
        )
    if isinstance(model, AutoEncoder):
        return AutoEncoder(
            encoder=seq(model.encoder, "encoder."),
            decoder=seq(model.decoder, "decoder."),
        )
    raise TypeError(
        f"unsupported model type {type(model).__name__} for torch "
        "state-dict migration"
    )


def save_torch_state_dict(model: Any, filename=None) -> dict:
    """Reference-compatible PyTorch state dict from a framework model —
    the REVERSE migration path: a model trained here can be handed back to
    reference-ecosystem tooling as the ``model.pt`` artifact the reference
    writes and loads (reference: colvarsfinder/core.py:156-161, :200-201).

    Key naming follows the reference's module layout exactly (Linear
    modules named '1', '2', ... inside each Sequential, reference
    nn.py:52-57; per-head ModuleLists 'eigen_funcs' / 'reg',
    nn.py:272/:150), so the reference's ``load_state_dict(...,
    strict=True)`` consumes it without remapping.

    Args:
        model: :class:`~colvarsfinder_tpu.models.Sequential`,
            :class:`~colvarsfinder_tpu.models.AutoEncoder`,
            :class:`~colvarsfinder_tpu.models.EigenFunctions`, or
            :class:`~colvarsfinder_tpu.models.RegAutoEncoder`.
        filename: if given, ``torch.save`` the dict there (``model.pt``).

    Returns:
        an OrderedDict of torch tensors (the state dict).
    """
    import collections

    import torch

    from .models.ae import AutoEncoder, RegAutoEncoder
    from .models.eigen import EigenFunctions
    from .models.module import Sequential

    sd: dict = collections.OrderedDict()

    def put_seq(prefix: str, params) -> None:
        # reference Linear modules are named '1', '2', ... (nn.py:52-57)
        for i, layer in enumerate(params):
            sd[f"{prefix}{i + 1}.weight"] = torch.from_numpy(
                np.asarray(layer["weight"], dtype=np.float32).copy()
            )
            sd[f"{prefix}{i + 1}.bias"] = torch.from_numpy(
                np.asarray(layer["bias"], dtype=np.float32).copy()
            )

    def put_stacked(prefix: str, params, k: int) -> None:
        # stacked-ensemble params [k, d_out, d_in] -> per-head ModuleList
        # entries '{prefix}{head}.{layer}.weight'
        for h in range(k):
            put_seq(
                f"{prefix}{h}.",
                [
                    {
                        "weight": np.asarray(layer["weight"])[h],
                        "bias": np.asarray(layer["bias"])[h],
                    }
                    for layer in params
                ],
            )

    if isinstance(model, Sequential):
        put_seq("", model.params)
    elif isinstance(model, EigenFunctions):
        put_stacked("eigen_funcs.", model.params, model.k)
    elif isinstance(model, RegAutoEncoder):
        put_seq("encoder.", model.encoder.params)
        put_seq("decoder.", model.decoder.params)
        if model.num_reg > 0:
            put_stacked("reg.", model.reg, model.num_reg)
    elif isinstance(model, AutoEncoder):
        put_seq("encoder.", model.encoder.params)
        put_seq("decoder.", model.decoder.params)
    else:
        raise TypeError(
            f"unsupported model type {type(model).__name__} for torch "
            "state-dict export"
        )

    if filename is not None:
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        torch.save(sd, filename)
    return sd
