"""Parallelism: device meshes and sharding for data-parallel training."""

from .ensemble import (
    adopt_sweep_result,
    explore_then_finetune,
    sweep_committor_checks,
    sweep_vamp_scores,
    train_architecture_ensemble,
    train_hyperparameter_sweep,
    train_replica_ensemble,
)
from .mesh import make_data_mesh, replicate, shard_batches, shard_frames

__all__ = [
    "adopt_sweep_result",
    "explore_then_finetune",
    "sweep_committor_checks",
    "sweep_vamp_scores",
    "train_architecture_ensemble",
    "make_data_mesh",
    "replicate",
    "shard_batches",
    "shard_frames",
    "train_replica_ensemble",
    "train_hyperparameter_sweep",
]
