"""Model zoo: feedforward nets, autoencoders, eigenfunction ensembles.

TPU-native counterpart of the reference module ``colvarsfinder.nn``
(reference: colvarsfinder/nn.py).
"""

from .module import (
    ACTIVATIONS,
    Sequential,
    create_sequential_nn,
    mlp_apply,
    mlp_init,
    stacked_mlp_apply,
    stacked_mlp_init,
)
from .ae import AutoEncoder, RegAutoEncoder, RegModel
from .eigen import EigenFunctions

__all__ = [
    "ACTIVATIONS",
    "Sequential",
    "create_sequential_nn",
    "mlp_apply",
    "mlp_init",
    "stacked_mlp_apply",
    "stacked_mlp_init",
    "AutoEncoder",
    "RegAutoEncoder",
    "RegModel",
    "EigenFunctions",
]
