"""Compute ops: molecular feature transforms and rigid alignment.

Native equivalents of the molann preprocessing layers required by the
reference's dipeptide workflow (SURVEY.md §2.8).
"""

from .features import (
    Feature,
    FeatureLayer,
    Identity,
    Lambda,
    PreprocessingANN,
    as_pp_layer,
    bend_angle,
    bend_angle_cos,
    bond_length,
    coordination_pairs,
    dihedral_angle,
    dihedral_cos_sin,
    minimum_image,
    switching_rational,
)
from .alignment import (
    AlignmentLayer,
    align_frames,
    kabsch_rotations_quat,
    kabsch_rotations_svd,
)
from .builders import (
    backbone_dihedrals,
    heavy_atom_contacts,
)

__all__ = [
    "Feature",
    "FeatureLayer",
    "Identity",
    "Lambda",
    "PreprocessingANN",
    "as_pp_layer",
    "bend_angle",
    "bend_angle_cos",
    "bond_length",
    "coordination_pairs",
    "dihedral_angle",
    "dihedral_cos_sin",
    "minimum_image",
    "switching_rational",
    "AlignmentLayer",
    "align_frames",
    "kabsch_rotations_quat",
    "kabsch_rotations_svd",
    "backbone_dihedrals",
    "heavy_atom_contacts",
]
