r"""Device mesh and sharding helpers.

The reference is single-process, single-device (SURVEY.md §2: no
torch.distributed anywhere); the only parallelism dimension that matters for
this workload is **data parallelism over trajectory frames**. The TPU-native
equivalent is a 1-axis mesh ``('data',)``:

* model parameters and optimizer state are replicated;
* batched data (and batch index arrays) are sharded along the batch axis;
* the global weighted reductions inside the losses become cross-device
  ``psum``s inserted automatically by XLA under jit ("computation follows
  data"), riding ICI.

``shard_batches`` places [num_batches, batch, ...] arrays with sharding
P(None, 'data') so each scan step trains on a batch split across the mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_data_mesh",
    "replicate",
    "shard_batches",
    "shard_frames",
]


def make_data_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """Build a 1-axis data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree: Any, mesh: Optional[Mesh]) -> Any:
    """Replicate every leaf of a pytree across the mesh."""
    if mesh is None:
        return jax.device_put(tree)
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batches(tree: Any, mesh: Optional[Mesh], axis_name: str = "data") -> Any:
    """Shard arrays shaped [num_batches, batch, ...] along the batch axis."""
    if mesh is None:
        return jax.device_put(tree)

    def put(x):
        spec = [None] * np.ndim(x)
        if np.ndim(x) >= 2:
            spec[1] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)


def shard_frames(tree: Any, mesh: Optional[Mesh], axis_name: str = "data",
                 pad: bool = False) -> Any:
    """Shard arrays shaped [n_frames, ...] along the leading frame axis.

    With ``pad=True``, a frame count that does not divide the mesh size
    is zero-PADDED up to the next multiple before placement (XLA
    sharding needs equal shards). Only safe for GATHER-addressed arrays
    (the sharded-trajectory layout): batches address frames by explicit
    index arrays built from the real ``n_frames``, so padding rows are
    never read. Dense per-batch arrays must NOT be padded — leave the
    default, which surfaces the divisibility error instead."""
    if mesh is None:
        return jax.device_put(tree)
    n_dev = int(mesh.devices.size)

    def put(x):
        spec = [None] * np.ndim(x)
        if np.ndim(x) >= 1:
            spec[0] = axis_name
            if pad:
                n = np.shape(x)[0]
                extra = (-n) % n_dev
                if extra:
                    x = np.concatenate(
                        [np.asarray(x),
                         np.zeros((extra,) + np.shape(x)[1:],
                                  dtype=np.asarray(x).dtype)]
                    )
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)
