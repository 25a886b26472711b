r"""Weighted trajectory container and Boltzmann reweighting.

TPU-native counterpart of the reference's data layer
(reference: colvarsfinder/utils.py:62-169 and :354-417).

The container itself is host-side numpy — trajectories are produced by
samplers (files/MD engines) and consumed by training tasks which move them
to device once. Weight math is vectorized numpy (the reference used a
Python list comprehension per frame, utils.py:411).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

__all__ = [
    "WeightedTrajectory",
    "calc_weights",
    "concatenate_trajectories",
    "wrap_trajectory",
    "unwrap_trajectory",
]


def wrap_trajectory(coords, box):
    """Wrap coordinates into the primary cell [0, L) per axis
    (orthogonal box lengths [3])."""
    coords = np.asarray(coords)
    box = np.asarray(box, dtype=coords.dtype)
    return np.mod(coords, box)


def unwrap_trajectory(coords, box):
    """Continuity-based unwrap of a wrapped trajectory [n, N, 3]:
    remove box jumps between consecutive frames per atom, so positions
    become continuous in time — the preprocessing alignment layers and
    ``position`` features need (pair-DISTANCE features can instead use
    ``FeatureLayer(box=...)`` directly on wrapped data).

    Assumes true per-frame displacements are below L/2 in every axis
    (the standard continuity condition; holds for any reasonable MD
    output cadence). The first frame is kept as stored.
    """
    coords = np.asarray(coords)
    if coords.ndim != 3:
        raise ValueError(f"expected [n_frames, N, 3], got {coords.shape}")
    box = np.asarray(box, dtype=np.float64).reshape(-1)
    if box.size != 3 or (box <= 0).any():
        raise ValueError(f"box must be 3 positive lengths, got {box}")
    d = np.diff(np.asarray(coords, dtype=np.float64), axis=0)
    shifts = -box * np.round(d / box)  # per-step image corrections
    corr = np.concatenate(
        [np.zeros((1,) + coords.shape[1:]), np.cumsum(shifts, axis=0)]
    )
    return (coords + corr).astype(coords.dtype)


class WeightedTrajectory:
    r"""Holds trajectory states and per-state importance weights.

    Behavioral contract mirrors the reference class
    (reference: colvarsfinder/utils.py:62-169):

    * MD branch: if ``universe`` (an MDAnalysis Universe) is given, load
      frames as [n, N, 3] float array restricted to ``input_ag`` atoms, with
      ``dt`` converted ps -> ns (utils.py:106-113).
    * Text branch: otherwise read a whitespace text file where each row is
      ``time x_1 ... x_d``; trajectory is [n, d] and ``dt = t_1 - t_0``
      (utils.py:132-138).
    * Array branch (extension): pass ``trajectory`` (+ optional ``weights``,
      ``dt``) directly — the natural interface for on-device samplers.
    * Weights: loaded from single-column CSV, normalized to mean one,
      frames with weight outside (min_w, max_w) dropped, weights
      re-normalized to mean one (utils.py:140-169). Both normalizations are
      deliberately kept (reference quirk).

    Attributes:
        trajectory (np.ndarray): [n, N, 3] for MD data or [n, d] otherwise
        n_frames (int): number of retained states
        weights (np.ndarray): 1-d weights with mean ~1
        dt (float): time between consecutive states (ns for MD systems)
        segment_starts (np.ndarray | None): for a dataset built by
            :func:`concatenate_trajectories`, the frame offset where each
            contiguous source trajectory begins (first entry 0); ``None``
            for a single contiguous trajectory. Training tasks and the
            lag-based analysis estimators consult this so lagged pairs
            never straddle two source trajectories.
    """

    def __init__(
        self,
        universe=None,
        input_ag=None,
        traj_filename: Optional[str] = None,
        weight_filename: Optional[str] = None,
        min_w: float = 0.0,
        max_w: float = float("inf"),
        verbose: bool = True,
        *,
        trajectory: Optional[np.ndarray] = None,
        weights: Optional[np.ndarray] = None,
        dt: Optional[float] = None,
        segment_starts=None,
    ):
        self.segment_starts = None
        if universe is not None:
            if verbose:
                print("\nloading trajectory to numpy array...", end="")
            if input_ag is None:
                input_atom_indices = universe.atoms.ix
            else:
                input_atom_indices = input_ag.ix
            self.trajectory = universe.trajectory.timeseries(order="fac")[
                :, input_atom_indices, :
            ]
            if verbose:
                print("done.")
            self.n_frames = universe.trajectory.n_frames
            # unit: ns (MDAnalysis reports ps)
            self.dt = universe.trajectory.dt * 1e-3
            # multi-file Universe: keep the source-file boundaries so
            # lagged pairs never span two files
            seg = getattr(universe.trajectory, "segment_starts", None)
            if seg is not None:
                self.segment_starts = np.asarray(seg, dtype=np.int64)
            if verbose:
                print(
                    "\nTrajectory Info:\n"
                    "  no. of frames in trajectory data: {}\n"
                    "  stepsize: {:.1f}ps\n"
                    "  shape of trajectory data array: {}\n".format(
                        self.n_frames,
                        universe.trajectory.dt,
                        self.trajectory.shape,
                    )
                )
        elif trajectory is not None:
            # asanyarray: a np.memmap input stays a memmap (no copy, no
            # subclass stripping) — required by the tasks' streaming layout
            self.trajectory = np.asanyarray(trajectory)
            self.n_frames = self.trajectory.shape[0]
            self.dt = float(dt) if dt is not None else 1.0
        else:
            if traj_filename is None or not os.path.exists(traj_filename):
                raise FileNotFoundError("trajectory file not found")
            data_block = _load_time_series(traj_filename)
            self.n_frames = data_block.shape[0]
            self.trajectory = data_block[:, 1:]
            self.dt = data_block[1, 0] - data_block[0, 0]

        if segment_starts is not None:
            # explicit source boundaries (pooled windows/slots): set BEFORE
            # the weight filter below so zero-weight frame drops remap them
            self.segment_starts = np.unique(
                np.asarray(segment_starts, dtype=np.int64)
            )

        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            if self.n_frames != w.shape[0]:
                raise ValueError(
                    f"weights ({w.shape[0]}) and trajectory "
                    f"({self.n_frames} frames) have different lengths"
                )
            self._apply_weight_filter(w, min_w, max_w, verbose)
        elif weight_filename:
            weight_vec = pd.read_csv(weight_filename, usecols=[0], header=None)
            w = weight_vec[0].to_numpy(dtype=np.float64)
            if self.n_frames != w.shape[0]:
                raise ValueError(
                    f"weight file has {w.shape[0]} rows but the trajectory "
                    f"has {self.n_frames} frames"
                )
            if verbose:
                print("\nloading weights from file: ", weight_filename)
            self._apply_weight_filter(w, min_w, max_w, verbose)
        else:
            self.weights = np.ones(self.n_frames)

    def _apply_weight_filter(self, w: np.ndarray, min_w, max_w, verbose: bool):
        # first normalization to mean one (reference utils.py:145)
        w = w / w.mean()
        selected = (w > min_w) & (w < max_w)
        if not selected.all():
            # (an all-True mask would still copy — skipping it keeps
            # memory-mapped trajectories memory-mapped for the tasks'
            # streaming layout)
            self.trajectory = self.trajectory[selected, ...]
            w = w[selected]
            if self.segment_starts is not None:
                # remap source-file boundaries to the surviving frames
                kept_before = np.concatenate(
                    [[0], np.cumsum(selected)]
                )
                self.segment_starts = np.unique(
                    kept_before[np.asarray(self.segment_starts)]
                )
        # renormalize after filtering (reference utils.py:159)
        w = w / w.mean()
        self.n_frames = self.trajectory.shape[0]
        self.weights = w
        if verbose:
            print(
                "\nAfter selecting states whose weights are in "
                "[{:.3e}, {:.3e}] and renormalization:\n"
                "\nShape of trajectory: {}".format(
                    min_w, max_w, self.trajectory.shape
                )
            )

    # convenience: lagged view used by transfer-operator training
    def lagged_pairs_count(self, lag_idx: int) -> int:
        return self.n_frames - lag_idx

    def valid_lagged_starts(self, lag_idx: int) -> np.ndarray:
        """Start frames ``i`` for which the lagged pair ``(i, i+lag)``
        lies within ONE contiguous source trajectory.

        For a single trajectory this is all of ``range(n - lag)``; for a
        dataset built by :func:`concatenate_trajectories` the last
        ``lag`` frames of every segment are excluded (a pair straddling
        two independent trajectories is not a time-lagged observation of
        the dynamics). Segments shorter than ``lag + 1`` frames
        contribute nothing.
        """
        lag = int(lag_idx)
        if lag < 0:
            raise ValueError(f"lag_idx must be >= 0; got {lag}")
        n = self.n_frames
        if self.segment_starts is None:
            return np.arange(max(n - lag, 0), dtype=np.int64)
        bounds = np.append(np.asarray(self.segment_starts, dtype=np.int64), n)
        parts = [
            np.arange(bounds[s], bounds[s + 1] - lag, dtype=np.int64)
            for s in range(bounds.size - 1)
            if bounds[s + 1] - bounds[s] > lag
        ]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(parts)


def concatenate_trajectories(trajs, renormalize: bool = True):
    """Pool several :class:`WeightedTrajectory` objects into ONE dataset
    whose lagged pairs respect the source boundaries.

    The reference package trains on a single long trajectory
    (reference core.py:343-346 holds one tensor); in practice data often
    arrives as many short trajectories (independent launches, umbrella
    windows after :func:`~colvarsfinder_tpu.utils.mbar_weights`,
    segments between metadynamics restarts). This returns a
    WeightedTrajectory with frames/weights concatenated and
    ``segment_starts`` recording the source offsets — the training
    tasks and the lag-based analysis estimators
    (``autocorrelation``/``vamp_score``/``tica``/``msm``) then draw
    time-lagged pairs only WITHIN a source trajectory.

    Args:
        trajs: WeightedTrajectory objects with identical state shapes
            and identical ``dt``. Inputs that are themselves
            concatenations keep their internal boundaries.
        renormalize: rescale the pooled weights to mean one (default).
            Each input's weights are mean-one individually (the class
            contract), so pooling weights frames of every source
            equally; pass per-frame cross-trajectory weights (e.g. from
            ``mbar_weights``) to the inputs first if sources should not
            count equally, and set ``renormalize=False`` to keep them
            untouched.

    Returns:
        A new :class:`WeightedTrajectory` (array branch) with
        ``segment_starts`` set.
    """
    trajs = list(trajs)
    if not trajs:
        raise ValueError("need at least one trajectory")
    shape0 = trajs[0].trajectory.shape[1:]
    dt0 = float(trajs[0].dt)
    for t in trajs[1:]:
        if t.trajectory.shape[1:] != shape0:
            raise ValueError(
                f"state shapes differ: {shape0} vs {t.trajectory.shape[1:]}"
            )
        if not np.isclose(float(t.dt), dt0, rtol=1e-6, atol=0.0):
            raise ValueError(
                f"dt differs across trajectories: {dt0} vs {float(t.dt)} "
                "(lagged pairs would mix timescales)"
            )
    starts = []
    offset = 0
    for t in trajs:
        own = (
            np.zeros(1, dtype=np.int64)
            if t.segment_starts is None
            else np.asarray(t.segment_starts, dtype=np.int64)
        )
        starts.append(own + offset)
        offset += t.n_frames
    out = WeightedTrajectory(
        trajectory=np.concatenate([t.trajectory for t in trajs], axis=0),
        dt=dt0,
        verbose=False,
    )
    w = np.concatenate([np.asarray(t.weights, dtype=np.float64) for t in trajs])
    out.weights = w / w.mean() if renormalize else w
    out.segment_starts = np.concatenate(starts)
    return out


def _load_time_series(filename: str) -> np.ndarray:
    """Read a whitespace-delimited trajectory text file into [n, 1+d].

    Prefers the native C++ memory-mapped parser (native/fastio.cpp); falls
    back to pandas' C parser, itself roughly an order of magnitude faster
    than the reference's np.loadtxt on 5e5-line trajectory files.
    """
    from . import native_io

    data = native_io.load_time_series(filename)
    if data is not None:
        return data
    return pd.read_csv(
        filename, sep=r"\s+", header=None, dtype=np.float64
    ).to_numpy()


def calc_weights(
    csv_filename: str,
    sampling_beta: float,
    sys_beta: float,
    traj_weight_filename: str = "weights.txt",
    energy_col_idx: int = 1,
    verbose: bool = True,
):
    r"""Compute Boltzmann reweighting factors from a statistics CSV.

    Mirrors the reference (colvarsfinder/utils.py:354-417):
    :math:`v_i = e^{-(\beta_{sys}-\beta_{sim})(V_i - \bar V)} / Z` with the
    mean energy subtracted before exponentiation for numerical stability and
    Z chosen so the mean weight is one; weights written headerless, one per
    line.
    """
    vec = pd.read_csv(csv_filename)
    vec.rename(columns={vec.columns[0]: "Time"}, inplace=True)

    energy_col_name = vec.columns[energy_col_idx]
    if verbose:
        print(f"Reading potential from: {csv_filename}")
        print(
            "Use {:d}th column to reweight, name: {}".format(
                energy_col_idx, energy_col_name
            )
        )

    energy = vec[energy_col_name].to_numpy(dtype=np.float64)
    mean_energy = energy.mean()

    nonnormalized = np.exp(-(sys_beta - sampling_beta) * (energy - mean_energy))
    weights = pd.DataFrame(
        nonnormalized / nonnormalized.mean(), columns=["weight"]
    )

    weights.to_csv(traj_weight_filename, header=False, index=False)
    if verbose:
        print(f"weights saved to: {traj_weight_filename}")
    return weights["weight"].to_numpy()
