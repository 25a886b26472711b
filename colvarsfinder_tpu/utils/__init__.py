"""Data pipeline: weighted trajectories, samplers, reweighting, IO.

TPU-native counterpart of the reference module ``colvarsfinder.utils``
(reference: colvarsfinder/utils.py).
"""

from .io import (
    Topology,
    Universe,
    parse_gro,
    parse_pdb,
    read_dcd,
    write_dcd,
    write_gro,
)
from .h5md import read_h5md, write_h5md
from .lammps import LAMMPSFrames, read_lammpstrj, write_lammpstrj
from .enhanced import (
    BiasedPotential,
    MBARResult,
    MetadynamicsResult,
    PlumedHills,
    REMDResult,
    SteeredResult,
    UmbrellaResult,
    harmonic_restraint,
    integrate_sde_metadynamics,
    integrate_sde_remd,
    integrate_sde_steered,
    integrate_sde_umbrella,
    mbar_weights,
    metad_frame_weights,
    read_plumed_colvar,
    read_plumed_hills,
)
from .sampling import (
    integrate_md_langevin,
    integrate_sde_langevin,
    integrate_sde_overdamped,
)
from .trajectory import (
    WeightedTrajectory,
    calc_weights,
    concatenate_trajectories,
    unwrap_trajectory,
    wrap_trajectory,
)
from .netcdf import (
    NetCDFFrames,
    read_netcdf,
    read_netcdf_full,
    read_netcdf_memmap,
    scan_netcdf,
    write_netcdf,
)
from .trr import TRRFrames, read_trr, scan_trr, write_trr
from .xtc import read_xtc, read_xtc_memmap, scan_xtc, write_xtc

__all__ = [
    "WeightedTrajectory",
    "calc_weights",
    "concatenate_trajectories",
    "unwrap_trajectory",
    "wrap_trajectory",
    "integrate_md_langevin",
    "integrate_sde_langevin",
    "integrate_sde_overdamped",
    "BiasedPotential",
    "MBARResult",
    "MetadynamicsResult",
    "harmonic_restraint",
    "integrate_sde_metadynamics",
    "integrate_sde_remd",
    "integrate_sde_steered",
    "integrate_sde_umbrella",
    "mbar_weights",
    "REMDResult",
    "SteeredResult",
    "UmbrellaResult",
    "PlumedHills",
    "read_plumed_hills",
    "read_lammpstrj",
    "read_h5md",
    "write_h5md",
    "write_lammpstrj",
    "LAMMPSFrames",
    "read_plumed_colvar",
    "metad_frame_weights",
    "Topology",
    "Universe",
    "parse_gro",
    "parse_pdb",
    "write_gro",
    "read_dcd",
    "write_dcd",
    "read_trr",
    "read_xtc",
    "read_xtc_memmap",
    "scan_trr",
    "scan_xtc",
    "TRRFrames",
    "write_trr",
    "write_xtc",
    "NetCDFFrames",
    "read_netcdf",
    "read_netcdf_full",
    "read_netcdf_memmap",
    "scan_netcdf",
    "write_netcdf",
]
