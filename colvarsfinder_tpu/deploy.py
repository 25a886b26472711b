r"""Dependency-free CV deployment: numpy spec export + evaluator.

The reference ships its trained CV as a TorchScript module consumed by
downstream MD engines without the model-building code (reference:
colvarsfinder/core.py:212-227). This framework's primary replacement is the
serialized StableHLO program (:mod:`colvarsfinder_tpu.export`), which covers
any JAX runtime. This module covers the *other* deployment target: host-side
MD-engine plugins (PLUMED-style biasing, analysis scripts) that have numpy
but neither JAX nor torch.

Two halves, deliberately decoupled:

* **Spec building** (`save_numpy_cv`) walks a :class:`~colvarsfinder_tpu.
  export.ColvarModel` (or any supported pp layer / model) and writes
  ``cv_numpy_spec.json`` (a small computation graph of named node kinds)
  plus ``cv_numpy.npz`` (the array parameters). Imports from the JAX side
  of the package happen lazily here.
* **Evaluation** (`load_numpy_cv`, `eval_spec`) interprets the spec with
  nothing but numpy. This half has **no JAX imports** — the module can be
  vendored into an MD engine plugin as a single file together with the two
  artifacts (guarded by a subprocess test that evaluates a saved CV with
  ``jax`` never imported).

Supported graph node kinds (one per framework layer family):

=============  ==========================================================
``identity``   pass-through (torch.nn.Identity / ops.Identity)
``alignment``  rigid Kabsch alignment onto a stored reference
               (ops.AlignmentLayer; numpy SVD with the det-sign fix)
``features``   position / bond / angle / angle_rad / dihedral /
               dihedral_rad feature vector (ops.FeatureLayer)
``compose``    sequential composition of child nodes
``mlp``        feedforward net, activation between layers
               (models.Sequential)
``stacked_mlp`` k-head ensemble net, weights [k, d_out, d_in]
               (models.EigenFunctions heads, RegModel reg heads)
=============  ==========================================================
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

import numpy as np

__all__ = [
    "save_numpy_cv",
    "load_numpy_cv",
    "eval_spec",
    "build_spec",
    "UnsupportedLayerError",
]


class UnsupportedLayerError(TypeError):
    """A CV component has no dependency-free numpy representation
    (e.g. ops.Lambda wrapping an arbitrary traceable function)."""

SPEC_NAME = "cv_numpy_spec.json"
PARAMS_NAME = "cv_numpy.npz"
FORMAT = "colvarsfinder-tpu-cv-numpy/1"


# ---------------------------------------------------------------------------
# numpy evaluation (no JAX anywhere below)
# ---------------------------------------------------------------------------


def _np_elu(x):
    return np.where(x > 0, x, np.expm1(np.minimum(x, 0.0)))


def _np_gelu(x):
    # tanh approximation, matching jax.nn.gelu's default
    c = np.sqrt(2.0 / np.pi).astype(x.dtype) if hasattr(x, "dtype") else np.sqrt(2.0 / np.pi)
    return 0.5 * x * (1.0 + np.tanh(c * (x + 0.044715 * x**3)))


_NP_ACTIVATIONS: dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "tanh": np.tanh,
    "tanh_native": np.tanh,
    "relu": lambda x: np.maximum(x, 0.0),
    "elu": _np_elu,
    "gelu": _np_gelu,
    "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
    "celu": lambda x: np.where(x > 0, x, np.expm1(np.minimum(x, 0.0))),
    "softplus": lambda x: np.logaddexp(x, 0.0),
    "identity": lambda x: x,
}


def _np_kabsch_align(
    x: np.ndarray, ref_c: np.ndarray, idx: np.ndarray, weights=None
) -> np.ndarray:
    """Align frames [B, N, 3] onto the centered reference [m, 3].

    Same math as ops.alignment.align_frames (quaternion and SVD solutions
    coincide), including its weighted (e.g. mass-weighted) variant; numpy
    SVD with the determinant-sign fix is the simplest dependency-free
    formulation.
    """
    sel = x[:, idx, :]
    if weights is not None:
        wn = weights / weights.sum()
        com = np.einsum("m,bmi->bi", wn, sel)
        ref_c = ref_c - np.einsum("m,mi->i", wn, ref_c)
    else:
        com = sel.mean(axis=1)
    x_c = x - com[:, None, :]
    sel_c = sel - com[:, None, :]
    if weights is not None:
        sel_c = sel_c * weights[None, :, None]
    C = np.einsum("bmi,mj->bij", sel_c, ref_c)
    U, _, Vt = np.linalg.svd(C)
    det = np.linalg.det(np.einsum("bij,bjk->bik", U, Vt))
    D = np.ones_like(U[:, :, 0])
    D[:, 2] = det
    R = np.einsum("bij,bj,bjk->bik", U, D, Vt)
    return np.einsum("bni,bij->bnj", x_c, R)


def _np_dihedral_cos_sin(ra, rb, rc, rd):
    b1 = rb - ra
    b2 = rc - rb
    b3 = rd - rc
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    m1 = np.cross(n1, b2 / np.linalg.norm(b2, axis=-1, keepdims=True))
    c = (n1 * n2).sum(axis=-1)
    s = (m1 * n2).sum(axis=-1)
    norm = np.sqrt(c * c + s * s)
    return c / norm, s / norm


def _np_eval_feature(ftype: str, idx, x: np.ndarray) -> np.ndarray:
    if ftype == "position":
        return x[:, np.asarray(idx), :].reshape(x.shape[0], -1)
    a = x[:, idx[0], :]
    b = x[:, idx[1], :]
    if ftype == "bond":
        return np.linalg.norm(b - a, axis=-1)[:, None]
    c = x[:, idx[2], :]
    if ftype == "angle":
        u, v = a - b, c - b
        cos_t = (u * v).sum(-1) / (
            np.linalg.norm(u, axis=-1) * np.linalg.norm(v, axis=-1)
        )
        return cos_t[:, None]
    if ftype == "angle_rad":
        u, v = a - b, c - b
        cross = np.cross(u, v)
        return np.arctan2(
            np.linalg.norm(cross, axis=-1), (u * v).sum(-1)
        )[:, None]
    d = x[:, idx[3], :]
    cs, sn = _np_dihedral_cos_sin(a, b, c, d)
    if ftype == "dihedral":
        return np.stack([cs, sn], axis=-1)
    return np.arctan2(sn, cs)[:, None]


def _eval_node(node: dict, params: dict, x: np.ndarray) -> np.ndarray:
    kind = node["kind"]
    if kind == "identity":
        return x
    if kind == "compose":
        for stage in node["stages"]:
            x = _eval_node(stage, params, x)
        return x
    if kind == "alignment":
        return _np_kabsch_align(
            x,
            params[node["ref"]],
            np.asarray(node["align_idx"], dtype=np.int64),
            weights=params[node["weights"]] if "weights" in node else None,
        )
    if kind == "features":
        feats = [
            _np_eval_feature(f["type"], f["atom_indices"], x)
            for f in node["features"]
        ]
        return np.concatenate(feats, axis=1)
    if kind == "mlp":
        act = _NP_ACTIVATIONS[node["activation"]]
        n = len(node["layers"])
        for i, (wk, bk) in enumerate(node["layers"]):
            x = x @ params[wk].T + params[bk]
            if i < n - 1:
                x = act(x)
        return x
    if kind == "stacked_mlp":
        act = _NP_ACTIVATIONS[node["activation"]]
        n = len(node["layers"])
        w0 = params[node["layers"][0][0]]
        h = np.broadcast_to(x[None], (w0.shape[0],) + x.shape)
        for i, (wk, bk) in enumerate(node["layers"]):
            # [k,b,i] x [k,o,i] -> [k,b,o]
            h = np.einsum("kbi,koi->kbo", h, params[wk]) + params[bk][:, None, :]
            if i < n - 1:
                h = act(h)
        h = np.transpose(h, (1, 0, 2))
        return h.reshape(h.shape[0], -1)
    raise ValueError(f"unknown spec node kind '{kind}'")


def eval_spec(spec: dict, params: dict, x: np.ndarray) -> np.ndarray:
    """Evaluate a CV spec on a (batched or single) state with pure numpy."""
    x = np.asarray(x, dtype=np.float32)
    state_ndim = int(spec.get("state_ndim", 1))
    squeeze = x.ndim == state_ndim
    if squeeze:
        x = x[None]
    out = _eval_node(spec["graph"], params, x)
    return out[0] if squeeze else out


def load_numpy_cv(out_dir: str) -> Callable[[np.ndarray], np.ndarray]:
    """Load a saved numpy-CV artifact as a plain ``x -> cv(x)`` callable.

    Requires only numpy — usable from processes that have no JAX (MD engine
    plugins, analysis scripts).
    """
    with open(os.path.join(out_dir, SPEC_NAME)) as f:
        spec = json.load(f)
    if spec.get("format") != FORMAT:
        raise ValueError(f"not a {FORMAT} artifact: {spec.get('format')!r}")
    with np.load(os.path.join(out_dir, PARAMS_NAME)) as data:
        params = {k: data[k] for k in data.files}
    return lambda x: eval_spec(spec, params, x)


# ---------------------------------------------------------------------------
# Spec building (walks JAX-side objects; imports deferred)
# ---------------------------------------------------------------------------


def _store(params_out: dict, prefix: str, name: str, arr) -> str:
    key = f"{prefix}{name}"
    params_out[key] = np.asarray(arr)
    return key


def _mlp_node(seq, params_out: dict, prefix: str, kind: str) -> dict:
    layers = []
    for i, layer in enumerate(seq if isinstance(seq, (tuple, list)) else seq.params):
        layers.append(
            [
                _store(params_out, prefix, f"w{i}", layer["weight"]),
                _store(params_out, prefix, f"b{i}", layer["bias"]),
            ]
        )
    activation = seq.activation if hasattr(seq, "activation") else "tanh"
    return {"kind": kind, "activation": activation, "layers": layers}


def build_spec(obj: Any, params_out: dict, prefix: str = "n0_") -> dict:
    """Build a spec node for a pp layer / model object (recursive).

    Raises :class:`UnsupportedLayerError` for objects with no
    dependency-free representation (e.g. ops.Lambda wrapping an arbitrary
    traceable function).
    """
    from .export import ColvarModel
    from .models import AutoEncoder, EigenFunctions, RegModel, Sequential
    from .ops import (
        AlignmentLayer,
        FeatureLayer,
        Identity,
        PreprocessingANN,
    )

    if obj is None or isinstance(obj, Identity):
        return {"kind": "identity"}
    if isinstance(obj, ColvarModel):
        return {
            "kind": "compose",
            "stages": [
                build_spec(obj.pp_layer, params_out, prefix + "pp_"),
                build_spec(obj.head, params_out, prefix + "head_"),
            ],
        }
    if isinstance(obj, PreprocessingANN):
        stages = []
        if obj.alignment_layer is not None:
            stages.append(
                build_spec(obj.alignment_layer, params_out, prefix + "al_")
            )
        if obj.feature_layer is not None:
            stages.append(
                build_spec(obj.feature_layer, params_out, prefix + "ft_")
            )
        return {"kind": "compose", "stages": stages}
    if isinstance(obj, AlignmentLayer):
        node = {
            "kind": "alignment",
            "ref": _store(params_out, prefix, "ref", obj.ref_centered),
            "align_idx": np.asarray(obj.align_idx).tolist(),
        }
        if obj.align_weights is not None:
            node["weights"] = _store(
                params_out, prefix, "w", obj.align_weights
            )
        return node
    if isinstance(obj, FeatureLayer):
        return {
            "kind": "features",
            "features": [
                {
                    "name": f.name,
                    "type": f.feature_type,
                    "atom_indices": list(f.atom_indices),
                }
                for f in obj.feature_list
            ],
        }
    if isinstance(obj, Sequential):
        return _mlp_node(obj, params_out, prefix, "mlp")
    if isinstance(obj, EigenFunctions):
        node = _mlp_node(obj, params_out, prefix, "stacked_mlp")
        node["activation"] = obj.activation
        return node
    if isinstance(obj, AutoEncoder):
        return {
            "kind": "compose",
            "stages": [
                build_spec(obj.encoder, params_out, prefix + "enc_"),
                build_spec(obj.decoder, params_out, prefix + "dec_"),
            ],
        }
    if isinstance(obj, RegModel):
        enc = build_spec(obj.encoder, params_out, prefix + "enc_")
        reg = _mlp_node(obj.reg, params_out, prefix + "reg_", "stacked_mlp")
        reg["activation"] = obj.encoder.activation
        return {"kind": "compose", "stages": [enc, reg]}
    raise UnsupportedLayerError(
        f"no dependency-free spec for {type(obj).__name__}; deploy via the "
        "StableHLO artifact (export_colvar) instead"
    )


def _state_ndim(node: dict) -> int:
    """Input rank of one state implied by the graph head node."""
    kind = node["kind"]
    if kind in ("alignment", "features"):
        return 2  # [N, 3] coordinates
    if kind == "compose":
        for stage in node["stages"]:
            if stage["kind"] != "identity":
                return _state_ndim(stage)
    return 1  # feature/state vector


def save_numpy_cv(cv_model: Any, out_dir: str) -> None:
    """Write ``cv_numpy_spec.json`` + ``cv_numpy.npz`` for a CV model.

    The pair is evaluable by :func:`load_numpy_cv` with numpy alone.
    """
    os.makedirs(out_dir, exist_ok=True)
    params: dict[str, np.ndarray] = {}
    graph = build_spec(cv_model, params)
    spec = {
        "format": FORMAT,
        "state_ndim": _state_ndim(graph),
        "graph": graph,
    }
    with open(os.path.join(out_dir, SPEC_NAME), "w") as f:
        json.dump(spec, f, indent=1)
    np.savez(os.path.join(out_dir, PARAMS_NAME), **params)
