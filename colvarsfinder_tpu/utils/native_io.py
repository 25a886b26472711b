"""ctypes bindings to the native IO library (native/fastio.cpp).

Provides the hot host-side data-pipeline paths — memory-mapped trajectory
text parsing and DCD frame decoding — with transparent fallback to the
pure-Python implementations when the shared library is unavailable. The
library is built lazily with ``make -C native`` (g++, ~1s) the first time
it is needed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libcvfio.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        # (re)build if sources are newer than the library; no-op otherwise
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

    lib.traj_txt_dims.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.traj_txt_dims.restype = ctypes.c_int
    lib.traj_txt_read.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.traj_txt_read.restype = ctypes.c_int64
    lib.dcd_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.dcd_decode.restype = ctypes.c_int64
    if hasattr(lib, "xtc_scan"):
        lib.xtc_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.xtc_scan.restype = ctypes.c_int
        lib.xtc_decode.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.xtc_decode.restype = ctypes.c_int64
    if hasattr(lib, "xtc_encode"):
        lib.xtc_encode.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            # double: quantization must use the full-precision factor so
            # output stays bit-identical with the Python codec even for
            # precisions not exactly representable in f32 (e.g. 100.3)
            ctypes.c_double,
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int64,
        ]
        lib.xtc_encode.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def load_time_series(filename: str) -> Optional[np.ndarray]:
    """Parse a whitespace numeric text file into [n, cols] float64, or None
    if the native library is unavailable / parsing fails."""
    lib = _load()
    if lib is None:
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.traj_txt_dims(filename.encode(), ctypes.byref(rows),
                           ctypes.byref(cols))
    if rc != 0 or rows.value == 0 or cols.value == 0:
        return None
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    got = lib.traj_txt_read(filename.encode(), out, rows.value, cols.value)
    if got != rows.value:
        return None
    return out


def scan_xtc(filename: str):
    """(n_frames, n_atoms) of an XTC file by walking frame headers without
    decoding, via the native library; None to fall back to Python."""
    lib = _load()
    if lib is None or not hasattr(lib, "xtc_scan"):
        return None
    n_frames = ctypes.c_int64()
    n_atoms = ctypes.c_int64()
    rc = lib.xtc_scan(
        filename.encode(), ctypes.byref(n_frames), ctypes.byref(n_atoms)
    )
    if rc != 0:
        return None
    # a frame can never hold more atoms than the file has bytes — guards
    # giant allocations from corrupt headers (fall back to the Python
    # codec, which raises a descriptive error)
    if n_frames.value > 0 and (
        n_atoms.value <= 0
        or n_frames.value * n_atoms.value * 12
        > 64 * os.path.getsize(filename)
    ):
        return None
    return n_frames.value, n_atoms.value


def decode_xtc(filename: str, coords_out: np.ndarray | None = None):
    """Bulk-decode an XTC file into ([n, atoms, 3] float32, times [n]) via
    the native library, or None to fall back to the Python codec.

    ``coords_out``: optional preallocated [n, atoms, 3] float32
    C-contiguous buffer the decoder writes into directly — pass a
    ``np.memmap`` (``numpy.lib.format.open_memmap``) to decode datasets
    larger than host RAM straight to disk (the input file is mmap'd by
    the native side, so neither side is fully resident).
    """
    lib = _load()
    scanned = scan_xtc(filename)
    if lib is None or scanned is None:
        return None
    n_frames, n_atoms = scanned
    if n_frames == 0:
        return None
    if coords_out is None:
        coords = np.empty((n_frames, n_atoms, 3), dtype=np.float32)
    else:
        assert coords_out.shape == (n_frames, n_atoms, 3), (
            f"coords_out shape {coords_out.shape} != "
            f"{(n_frames, n_atoms, 3)} from the file scan"
        )
        assert coords_out.dtype == np.float32 and coords_out.flags[
            "C_CONTIGUOUS"
        ], "coords_out must be C-contiguous float32"
        coords = coords_out
    times = np.empty(n_frames, dtype=np.float32)
    got = lib.xtc_decode(
        filename.encode(), coords, times, n_frames, n_atoms
    )
    if got != n_frames:
        return None
    return coords, times.astype(np.float64)


def encode_xtc(
    filename: str,
    coords: np.ndarray,
    precision: float,
    box_mat: np.ndarray,
    t0_ps: float,
    dt_ps: float,
    step_interval: int,
) -> bool:
    """Bulk-encode frames [n, atoms, 3] float32 to an XTC file via the
    native library. Returns False to fall back to the Python codec.

    Raises ValueError on coordinate overflow at the given precision (the
    same condition the Python codec rejects).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "xtc_encode"):
        return False
    coords = np.ascontiguousarray(coords, dtype=np.float32)
    n_frames, n_atoms = coords.shape[0], coords.shape[1]
    box9 = np.ascontiguousarray(box_mat, dtype=np.float64).reshape(9)
    got = lib.xtc_encode(
        filename.encode(), coords, n_frames, n_atoms,
        float(precision), box9, float(t0_ps), float(dt_ps),
        int(step_interval),
    )
    if got == -5:
        raise ValueError(
            "coordinate magnitude too large for XTC quantization; "
            "reduce the precision"
        )
    return got == n_frames


def decode_dcd_frames(
    filename: str,
    frame0_offset: int,
    n_atoms: int,
    n_frames: int,
    has_unitcell: bool,
) -> Optional[np.ndarray]:
    """Decode DCD coordinate records into [n_frames, n_atoms, 3] float32."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((n_frames, n_atoms, 3), dtype=np.float32)
    got = lib.dcd_decode(
        filename.encode(), frame0_offset, n_atoms, n_frames,
        1 if has_unitcell else 0, out,
    )
    if got < 0:
        return None
    return out[:got]
