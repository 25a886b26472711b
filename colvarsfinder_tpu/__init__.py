"""colvarsfinder-tpu: TPU-native framework for learning collective variables.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
package ``colvars-finder`` (https://github.com/zwpku/colvars-finder):
learning collective variables of stochastic dynamical systems from weighted
trajectory data via autoencoders, eigenfunctions of the infinitesimal
generator / transfer operator, and regularized autoencoders.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

* :mod:`colvarsfinder_tpu.utils` — data pipeline: weighted trajectories,
  samplers (lax.scan SDE integrator), Boltzmann reweighting
* :mod:`colvarsfinder_tpu.models` — model zoo: MLPs, autoencoders,
  stacked-ensemble eigenfunctions
* :mod:`colvarsfinder_tpu.ops` — feature transforms + batched Kabsch
  alignment (molann-equivalents; Pallas kernel for the alignment hot path)
* :mod:`colvarsfinder_tpu.core` — training tasks with whole-epoch jitted
  lax.scan execution
* :mod:`colvarsfinder_tpu.parallel` — device meshes, data-parallel sharding
* :mod:`colvarsfinder_tpu.export` — StableHLO CV deployment artifacts
"""

__version__ = "0.1.0"

from . import (
    analysis,
    config,
    core,
    models,
    ops,
    parallel,
    plotting,
    tune,
    utils,
    workflow,
)
config.set_compilation_cache(auto=True)  # persistent XLA cache; opt out via
# COLVARSFINDER_NO_COMPILATION_CACHE=1 (see config.set_compilation_cache)

from .checkpoint import load_torch_state_dict, save_torch_state_dict
from .core import (
    AutoEncoderTask,
    CommittorTask,
    EigenFunctionTask,
    RegAutoEncoderTask,
    TrainingTask,
)
from .deploy import load_numpy_cv, save_numpy_cv
from .deploy_plumed import write_plumed_cv, write_plumed_metad
from .deploy_torch import export_torchscript_cv, torchscript_from_numpy_cv
from .export import ColvarModel, export_colvar, load_colvar
from .models import (
    AutoEncoder,
    EigenFunctions,
    RegAutoEncoder,
    RegModel,
    create_sequential_nn,
)
from .utils import (
    WeightedTrajectory,
    calc_weights,
    integrate_md_langevin,
    integrate_sde_overdamped,
)

__all__ = [
    "analysis",
    "config",
    "core",
    "models",
    "ops",
    "parallel",
    "plotting",
    "tune",
    "utils",
    "workflow",
    "ColvarModel",
    "export_colvar",
    "load_colvar",
    "load_numpy_cv",
    "save_numpy_cv",
    "export_torchscript_cv",
    "torchscript_from_numpy_cv",
    "write_plumed_cv",
    "write_plumed_metad",
    "load_torch_state_dict",
    "save_torch_state_dict",
    "TrainingTask",
    "AutoEncoderTask",
    "CommittorTask",
    "EigenFunctionTask",
    "RegAutoEncoderTask",
    "AutoEncoder",
    "EigenFunctions",
    "RegAutoEncoder",
    "RegModel",
    "create_sequential_nn",
    "WeightedTrajectory",
    "calc_weights",
    "integrate_md_langevin",
    "integrate_sde_overdamped",
    "__version__",
]
