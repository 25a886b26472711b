"""Data pipeline: weighted trajectories, samplers, reweighting.

TPU-native counterpart of the reference module ``colvarsfinder.utils``
(reference: colvarsfinder/utils.py).
"""

from .trajectory import WeightedTrajectory, calc_weights
from .sampling import integrate_md_langevin, integrate_sde_overdamped

__all__ = [
    "WeightedTrajectory",
    "calc_weights",
    "integrate_md_langevin",
    "integrate_sde_overdamped",
]
