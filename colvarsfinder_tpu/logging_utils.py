r"""Observability: TensorBoard scalars, loss dataframes, profiling.

Mirrors the reference's surfaces (reference: colvarsfinder/core.py:143,
:555-566, :738-744, :1204-1217): per-epoch train/test scalars under the same
tag names, pandas loss dataframes, and a plot-callback hook — plus an
optional ``jax.profiler`` trace the reference lacks.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import numpy as np
import pandas as pd

__all__ = ["MetricsWriter", "losses_to_dataframe", "profile_trace"]


class MetricsWriter:
    """Thin wrapper over tensorboardX SummaryWriter, gated on availability."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self._writer = None
        if enabled:
            try:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(log_dir)
            except ImportError:
                self._writer = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), step)

    def add_scalars_split(
        self, names: Sequence[str], train_vals, test_vals, epoch: int
    ) -> None:
        """Write '<name>/train' and '<name>/test' for each metric name
        (reference core.py:559-561 tag scheme)."""
        for i, name in enumerate(names):
            self.add_scalar(f"{name}/train", train_vals[i], epoch)
            self.add_scalar(f"{name}/test", test_vals[i], epoch)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


def losses_to_dataframe(
    per_epoch_means: Sequence[np.ndarray], columns: Sequence[str]
) -> pd.DataFrame:
    """Stack per-epoch mean metric vectors into the reference's loss
    dataframe format (core.py:563-566)."""
    if len(per_epoch_means) == 0:
        return pd.DataFrame(columns=list(columns))
    return pd.DataFrame(np.stack(per_epoch_means), columns=list(columns))


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Optionally wrap a block in a jax.profiler trace."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
