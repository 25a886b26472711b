"""Global numerics configuration.

On TPU the MXU's native matmul passes are bfloat16; f32 contractions are
emulated by multiple bf16 passes — 6 per matmul at
``jax.lax.Precision.HIGHEST``, 3 at ``HIGH``. The framework default is
**HIGH**: measured against HIGHEST on the headline training workload the
final-epoch loss differs by 6e-7 relative (far inside the 1e-5
reference-parity bar) while throughput is ~13% higher, because this
model scale is bounded by MXU-pass count, not FLOPs
(benchmarks/RESULTS.md). The per-step parity harness pins HIGHEST (or
float64) explicitly; 'default' (single bf16 pass) is the fast mode for
production training that tolerates ~5e-5 relative loss noise.
"""

from __future__ import annotations

import jax

_PRECISION = jax.lax.Precision.HIGH

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
    'high' (bf16x3 on TPU, near-f32 accuracy) is the framework default;
    'highest'/'float32' (bf16x6, true f32) is the strict-parity mode;
    'default'/'bfloat16' is the fast mode.

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


_COMPUTE_DTYPE = "float32"


def set_compute_dtype(dtype) -> None:
    """Set the ACTIVATION dtype of network forward/backward passes.

    'float32' (default) stores activations at full width. 'bfloat16'
    runs the model layers in mixed precision: parameters and optimizer
    state stay float32 (master weights), but per-layer inputs/weights are
    cast to bfloat16, activations are stored in bfloat16, and the network
    output is cast back to float32 before the loss statistics.

    Why this exists: at dipeptide scale the training step is
    HBM-bandwidth-bound on activation traffic, not FLOP-bound — at a
    64-replica hyperparameter sweep every fusion streams
    [R, k, B, width] tensors (~0.4 GB each at f32), and halving the
    element size measured ~2x step throughput (benchmarks/
    ensemble_layout_ab.py). Gradients are correspondingly rounded
    (~1e-2 relative loss noise) — intended for exploratory sweeps and
    fast production training; re-train or fine-tune at float32 for
    parity-grade results (the sweep winner can be adopted with
    ``adopt_sweep_result`` and fine-tuned with ``task.train()``).

    Incompatible with ``set_default_dtype('float64')``. The value is read
    at trace time and is part of every compiled-program cache key, so
    flipping it triggers recompiles rather than being silently ignored.
    """
    global _COMPUTE_DTYPE
    import numpy as np

    name = (
        dtype if dtype in ("float32", "bfloat16") else np.dtype(dtype).name
    )
    if name not in ("float32", "bfloat16"):
        raise ValueError(
            f"unsupported compute dtype {name!r}; "
            "expected 'float32' or 'bfloat16'"
        )
    if name == "bfloat16" and _DTYPE_NAME == "float64":
        raise ValueError(
            "bfloat16 compute mode is incompatible with the float64 "
            "default dtype (set_default_dtype('float32') first)"
        )
    _COMPUTE_DTYPE = name


def compute_dtype():
    """Current activation compute dtype (a jax.numpy dtype)."""
    import jax.numpy as jnp

    return jnp.bfloat16 if _COMPUTE_DTYPE == "bfloat16" else jnp.float32


_BF16_STYLE = "pure"

_BF16_STYLES = ("pure", "acc32", "w32")


def set_bf16_style(style: str) -> None:
    """Select the arithmetic style of the bfloat16 compute mode.

    Only meaningful while ``set_compute_dtype('bfloat16')`` is active;
    activations are stored bfloat16 in every style (that is where the
    HBM-traffic saving lives — [batch, width] tensors), the styles differ
    in what else is rounded:

    - ``'pure'``: weights cast to bf16, matmuls accumulate in bf16.
      Fastest, noisiest (the original bf16 mode).
    - ``'acc32'``: weights cast to bf16, matmuls accumulate in float32
      (the MXU's native bf16xbf16->f32 path) and the activation function
      is evaluated in float32 before re-quantizing. Removes the
      accumulation error from each forward/backward pass.
    - ``'w32'``: weights stay float32 (master weights are tiny — [30,20]
      — so their traffic is negligible) and activations are upcast at the
      contraction, which runs at the configured matmul precision. Only
      remaining rounding is the bf16 activation storage itself.

    Measured tradeoff (benchmarks/bf16_modes_ab.py, headline transfer-op
    step on TPU): per-step speedup vs float32 is ``pure`` 2.23x,
    ``acc32`` 1.17x, ``w32`` 1.11x — the f32 accumulation/activation
    path gives back most of pure's win. acc32/w32 tighten *per-pass*
    numerics (strictly smaller forward error than pure,
    tests/test_compute_dtype.py), but over long training windows every
    bf16 style's loss trajectory drifts from f32 comparably (median
    ~18-33% at 3000 steps — trajectory divergence is chaotic
    sensitivity, not per-step error). Default therefore stays 'pure':
    if you pay the bf16 noise at all, take the full 2.2x; fine-tune
    winners at float32 either way (docs/performance.md).
    """
    global _BF16_STYLE
    if style not in _BF16_STYLES:
        raise ValueError(
            f"unknown bf16 style {style!r}; expected one of {_BF16_STYLES}"
        )
    _BF16_STYLE = style


def bf16_style() -> str:
    """Current bfloat16-mode arithmetic style ('pure' | 'acc32' | 'w32')."""
    return _BF16_STYLE


def compute_dtype_name() -> str:
    """Current activation compute dtype as its string name."""
    return _COMPUTE_DTYPE


def numerics_key() -> tuple:
    """Hashable fingerprint of the numerics configuration, for compiled-
    program cache keys (contraction precision + activation dtype + bf16
    style)."""
    return (_PRECISION, _COMPUTE_DTYPE, _BF16_STYLE)


# ---------------------------------------------------------------------------
# persistent (cross-process) compilation cache
# ---------------------------------------------------------------------------

_COMPILATION_CACHE_DIR: str | None = None


def set_compilation_cache(path=None, *, auto: bool = False) -> str | None:
    """Enable jax's persistent compilation cache for this process.

    The in-process compiled-program caches (``_EPOCH_FN_CACHE`` etc.) die
    with the process, so every fresh python re-pays XLA compilation —
    30+ s for an R=64 sweep program whose device run takes ~1 s
    (benchmarks/RESULTS.md, round 4). The persistent cache stores
    serialized XLA executables on disk keyed by HLO + compile options +
    backend, so a second process running the same-shaped task deserializes
    in ~a second instead.

    Args:
        path: cache directory. ``None`` (default) picks
            ``$XDG_CACHE_HOME/colvarsfinder_tpu/xla`` (falling back to
            ``~/.cache/colvarsfinder_tpu/xla``).

    Returns the directory in use, or ``None`` if the environment opts out
    via ``COLVARSFINDER_NO_COMPILATION_CACHE=1``.

    Called automatically at package import with ``auto=True``, which
    enables the cache on accelerator backends only (explicit calls also
    enable it on CPU); opt out with the env var or point elsewhere by
    calling this again — it is a tracing-layer flag, safe to flip at any
    time. Entries compiled for one jax version / backend do not collide
    with another's: the cache key includes both.
    """
    global _COMPILATION_CACHE_DIR
    import os

    if os.environ.get("COLVARSFINDER_NO_COMPILATION_CACHE", "") == "1":
        _COMPILATION_CACHE_DIR = None
        return None
    if auto:
        # import-time auto-enable targets accelerator backends, where a
        # single sweep program can cost 30+ s of XLA compile. On the CPU
        # backend the cache also works, but XLA:CPU prints a scary
        # (benign, same-machine) machine-feature E-log on every cached
        # load — so CPU runs opt in by calling this function explicitly.
        # Reading the flag does NOT initialize the backend.
        plats = (jax.config.jax_platforms or "").split(",")[0]
        if plats == "cpu":
            return None
    if path is None:
        base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache"
        )
        path = os.path.join(base, "colvarsfinder_tpu", "xla")
    path = str(path)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default thresholds skip exactly the small programs a CV
        # workload is made of: cache everything that took >=0.3 s
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # unwritable dir / unknown flags: stay in-memory
        _COMPILATION_CACHE_DIR = None
        return None
    _COMPILATION_CACHE_DIR = path
    return path


def compilation_cache_dir() -> str | None:
    """Directory of the persistent compilation cache (None = disabled)."""
    return _COMPILATION_CACHE_DIR
