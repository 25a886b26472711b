"""Training tasks: autoencoder, eigenfunction, regularized autoencoder.

TPU-native counterpart of the reference module ``colvarsfinder.core``
(reference: colvarsfinder/core.py).
"""

from .task import TrainingTask
from .autoencoder import AutoEncoderTask
from .eigenfunction import EigenFunctionTask
from .regautoencoder import RegAutoEncoderTask
from . import losses

__all__ = [
    "TrainingTask",
    "AutoEncoderTask",
    "EigenFunctionTask",
    "RegAutoEncoderTask",
    "losses",
]
