"""Native (C++) CV evaluator bindings — the engine-side deployment runtime.

The reference's CV artifact is TorchScript, consumed *natively* by MD
engines through libtorch's C++ runtime (reference: colvarsfinder/
core.py:212-227 exports ``scripted_cv_cpu.pt``; PLUMED-style plugins load
it from C++). This module provides the same property for this framework's
artifact: ``cv_native.bin`` is a dependency-free binary program evaluated
by ``native/cveval.cpp`` — values AND the input Jacobian (biasing forces)
— through a plain C API that an MD-engine plugin can call directly,
no Python, numpy, JAX, or torch in the loop.

The binary program is generated from the same graph spec + parameter set
as the numpy artifact (:mod:`colvarsfinder_tpu.deploy`); the numpy
evaluator remains the reference implementation the native one is tested
against (tests/test_native_cv.py, 1e-12 parity).

Binary format ``CVNATV02`` (little-endian, f64 params; the evaluator also
accepts v1 programs, whose payload is a strict subset)::

    magic[8] = "CVNATV02"
    i32 state_ndim              (1 = feature vector, 2 = [N, 3] coordinates)
    i32 n_params
    per param: i32 ndim, i32 dims[ndim], f64 data[prod(dims)]
    i32 n_ops
    per op: i32 kind, payload --
      kind 0 ALIGNMENT:   i32 ref_param, i32 weight_param (-1 none),
                          i32 m, i32 idx[m]
      kind 1 FEATURES:    i32 n_features, i32 has_box, [has_box: f64 box[3]],
                          per feature: i32 ftype,
                          i32 n_idx, i32 idx[n_idx],
                          [ftype >= 6 only: f64 r0, f64 d0, i32 nn, i32 mm]
                          (box = orthogonal minimum-image lengths applied
                           to pair-distance features: bond/contact/coord)
                          (ftype: 0 position, 1 bond, 2 angle, 3 angle_rad,
                           4 dihedral, 5 dihedral_rad, 6 contact,
                           7 coordination — 6/7 are RATIONAL switching
                           features over the pairwise-interpreted idx list)
      kind 2 MLP:         i32 act, i32 n_layers,
                          per layer: i32 w_param, i32 b_param
      kind 3 STACKED_MLP: i32 act, i32 k, i32 n_layers,
                          per layer: i32 w_param, i32 b_param
    (act: 0 tanh, 1 relu, 2 elu, 3 gelu, 4 sigmoid, 5 softplus, 6 celu,
     7 identity; ``identity`` graph nodes are dropped, ``compose`` nodes
     are flattened — the graph is always a linear pipeline)
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
import subprocess
from typing import Callable, Optional

import numpy as np

__all__ = ["write_native_cv", "load_native_cv", "native_available"]

MAGIC = b"CVNATV02"
NATIVE_NAME = "cv_native.bin"

_FTYPE = {
    "position": 0, "bond": 1, "angle": 2, "angle_rad": 3,
    "dihedral": 4, "dihedral_rad": 5, "contact": 6, "coordination": 7,
}
_ACT = {
    "tanh": 0, "tanh_native": 0, "relu": 1, "elu": 2, "gelu": 3,
    "sigmoid": 4, "softplus": 5, "celu": 6, "identity": 7,
}

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libcveval.so")

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


# ---------------------------------------------------------------------------
# writer: spec graph -> flat binary program
# ---------------------------------------------------------------------------


def _flatten_graph(node: dict, out: list) -> None:
    kind = node["kind"]
    if kind == "identity":
        return
    if kind == "compose":
        for stage in node["stages"]:
            _flatten_graph(stage, out)
        return
    out.append(node)


def write_native_cv(out_dir: str) -> str:
    """Convert a saved numpy-CV artifact (spec + npz) in ``out_dir`` into
    the native binary program ``cv_native.bin``. Returns its path."""
    from .deploy import FORMAT, PARAMS_NAME, SPEC_NAME

    with open(os.path.join(out_dir, SPEC_NAME)) as f:
        spec = json.load(f)
    if spec.get("format") != FORMAT:
        raise ValueError(f"not a {FORMAT} artifact")
    with np.load(os.path.join(out_dir, PARAMS_NAME)) as data:
        params = {k: np.asarray(data[k], dtype=np.float64) for k in data.files}

    nodes: list = []
    _flatten_graph(spec["graph"], nodes)

    # collect parameters in first-use order
    pidx: dict[str, int] = {}
    plist: list[np.ndarray] = []

    def use(name: str) -> int:
        if name not in pidx:
            pidx[name] = len(plist)
            plist.append(params[name])
        return pidx[name]

    ops = bytearray()
    for node in nodes:
        kind = node["kind"]
        if kind == "alignment":
            ref_p = use(node["ref"])
            w_p = use(node["weights"]) if "weights" in node else -1
            idx = [int(i) for i in node["align_idx"]]
            ops += struct.pack(f"<4i{len(idx)}i", 0, ref_p, w_p, len(idx), *idx)
        elif kind == "features":
            feats = node["features"]
            ops += struct.pack("<2i", 1, len(feats))
            box = node.get("box")
            if box is not None:
                ops += struct.pack("<i3d", 1, *[float(v) for v in box])
            else:
                ops += struct.pack("<i", 0)
            for feat in feats:
                ai = [int(i) for i in np.atleast_1d(feat["atom_indices"])]
                ops += struct.pack(
                    f"<2i{len(ai)}i", _FTYPE[feat["type"]], len(ai), *ai
                )
                if _FTYPE[feat["type"]] >= 6:
                    sw = feat["params"]
                    ops += struct.pack(
                        "<2d2i", float(sw["r0"]), float(sw["d0"]),
                        int(sw["nn"]), int(sw["mm"]),
                    )
        elif kind in ("mlp", "stacked_mlp"):
            layers = [(use(w), use(b)) for w, b in node["layers"]]
            act = _ACT[node["activation"]]
            if kind == "mlp":
                ops += struct.pack("<3i", 2, act, len(layers))
            else:
                k = plist[layers[0][0]].shape[0]
                ops += struct.pack("<4i", 3, act, k, len(layers))
            for w, b in layers:
                ops += struct.pack("<2i", w, b)
        else:
            raise ValueError(f"unknown spec node kind '{kind}'")

    blob = bytearray(MAGIC)
    blob += struct.pack("<2i", int(spec.get("state_ndim", 1)), len(plist))
    for arr in plist:
        blob += struct.pack(f"<i{arr.ndim}i", arr.ndim, *arr.shape)
        blob += np.ascontiguousarray(arr).tobytes()
    blob += struct.pack("<i", len(nodes))
    blob += ops
    path = os.path.join(out_dir, NATIVE_NAME)
    with open(path, "wb") as f:
        f.write(blob)
    return path


# ---------------------------------------------------------------------------
# ctypes loader
# ---------------------------------------------------------------------------


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            pass
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    lib.cveval_load.argtypes = [ctypes.c_char_p]
    lib.cveval_load.restype = ctypes.c_void_p
    lib.cveval_free.argtypes = [ctypes.c_void_p]
    lib.cveval_free.restype = None
    lib.cveval_n_out.argtypes = [ctypes.c_void_p]
    lib.cveval_n_out.restype = ctypes.c_int
    lib.cveval_eval.argtypes = [
        ctypes.c_void_p, f64p, ctypes.c_long, ctypes.c_long, f64p,
    ]
    lib.cveval_eval.restype = ctypes.c_int
    lib.cveval_eval_grad.argtypes = [
        ctypes.c_void_p, f64p, ctypes.c_long, ctypes.c_long, f64p, f64p,
    ]
    lib.cveval_eval_grad.restype = ctypes.c_int
    _LIB = lib
    return lib


def native_available() -> bool:
    """Whether the native evaluator library can be (lazily) built+loaded."""
    return _load_lib() is not None


class _NativeCV:
    """Callable handle over a loaded native CV program."""

    def __init__(self, path: str, state_ndim: int, with_grad: bool):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native CV evaluator unavailable (native/cveval.cpp did "
                "not build); use deploy.load_numpy_cv instead"
            )
        self._lib = lib
        self._h = lib.cveval_load(path.encode())
        if not self._h:
            raise ValueError(f"failed to load native CV program {path}")
        self._n_out = lib.cveval_n_out(self._h)
        self._state_ndim = state_ndim
        self._with_grad = with_grad

    def __call__(self, x: np.ndarray):
        x = np.ascontiguousarray(x, dtype=np.float64)
        squeeze = x.ndim == self._state_ndim
        if squeeze:
            x = x[None]
        n = x.shape[0]
        state = int(np.prod(x.shape[1:]))
        val = np.empty((n, self._n_out), dtype=np.float64)
        if self._with_grad:
            jac = np.empty((n, self._n_out, state), dtype=np.float64)
            rc = self._lib.cveval_eval_grad(
                self._h, x.reshape(n, state), n, state, val, jac
            )
            jac = jac.reshape((n, self._n_out) + x.shape[1:])
            if rc != 0:
                raise ValueError(f"native CV evaluation failed (code {rc})")
            return (val[0], jac[0]) if squeeze else (val, jac)
        rc = self._lib.cveval_eval(self._h, x.reshape(n, state), n, state, val)
        if rc != 0:
            raise ValueError(f"native CV evaluation failed (code {rc})")
        return val[0] if squeeze else val

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.cveval_free(self._h)
        except Exception:
            pass


def load_native_cv(out_dir: str, with_grad: bool = False) -> Callable:
    """Load ``cv_native.bin`` (writing it from the numpy artifact if
    absent) as an ``x -> cv(x)`` or ``x -> (cv(x), dcv/dx)`` callable
    backed by the C++ evaluator."""
    from .deploy import SPEC_NAME

    path = os.path.join(out_dir, NATIVE_NAME)
    if not os.path.exists(path):
        path = write_native_cv(out_dir)
    with open(os.path.join(out_dir, SPEC_NAME)) as f:
        state_ndim = int(json.load(f).get("state_ndim", 1))
    return _NativeCV(path, state_ndim, with_grad)
