"""Training tasks: autoencoder, eigenfunction, regularized autoencoder,
committor.

TPU-native counterpart of the reference module ``colvarsfinder.core``
(reference: colvarsfinder/core.py), plus the committor task (transition
path theory's optimal reaction coordinate — beyond the reference's
inventory, built on the same task/loss machinery).
"""

from .task import TrainingTask
from .autoencoder import AutoEncoderTask
from .committor import CommittorTask
from .eigenfunction import EigenFunctionTask
from .regautoencoder import RegAutoEncoderTask
from . import losses

__all__ = [
    "TrainingTask",
    "AutoEncoderTask",
    "CommittorTask",
    "EigenFunctionTask",
    "RegAutoEncoderTask",
    "losses",
]
