"""Global numerics configuration.

On TPU the MXU's native matmul passes are bfloat16; the parity bar against
the float32 PyTorch reference (BASELINE.md: losses matching to 1e-5)
requires true-f32 contractions, so the framework defaults to
``jax.lax.Precision.HIGHEST`` in every model/feature contraction. Training
runs that don't need bit-level parity can trade precision for MXU
throughput with :func:`set_matmul_precision`.
"""

from __future__ import annotations

import jax

_PRECISION = jax.lax.Precision.HIGHEST

_NAMES = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
    "bfloat16": jax.lax.Precision.DEFAULT,
    "float32": jax.lax.Precision.HIGHEST,
}


def set_matmul_precision(precision) -> None:
    """Set the contraction precision used by all framework matmuls.

    Accepts a ``jax.lax.Precision`` or one of
    'default' | 'high' | 'highest' | 'bfloat16' | 'float32'.

    The value is read at trace time; the tasks key their compiled-program
    caches on it, so changing the precision mid-training triggers a
    recompile of subsequent epochs rather than being silently ignored.
    """
    global _PRECISION
    if isinstance(precision, str):
        precision = _NAMES[precision.lower()]
    _PRECISION = precision


def matmul_precision():
    """Current contraction precision."""
    return _PRECISION


_DTYPE_NAME = "float32"


def set_default_dtype(dtype) -> None:
    """Set the floating dtype used for model parameters and trajectories.

    Accepts 'float32' (default) or 'float64'. Selecting float64 enables
    jax's x64 mode (safe to call at any time — it is a tracing flag, not a
    backend-initialization flag) and exists primarily for the parity
    harness: in f64 the framework's losses match the PyTorch reference to
    ~1e-9, isolating algorithmic equivalence from f32 arithmetic noise.
    Must be set before models/tasks are constructed to take effect.
    """
    global _DTYPE_NAME
    import numpy as np

    name = np.dtype(dtype).name
    if name not in ("float32", "float64"):
        raise ValueError(f"unsupported default dtype {name}")
    # toggle x64 both ways so float32 after a float64 phase restores the
    # normal mode (otherwise untyped float64 numpy inputs would silently
    # stay f64 in traced programs)
    jax.config.update("jax_enable_x64", name == "float64")
    _DTYPE_NAME = name


def default_dtype():
    """Current default floating dtype (a jax.numpy dtype)."""
    import jax.numpy as jnp

    return jnp.float64 if _DTYPE_NAME == "float64" else jnp.float32
