r"""Replica-ensemble training: run a sweep of same-shaped tasks as ONE
vmapped program.

The reference trains sweep replicas in a Python loop (one process, one
model at a time). On TPU the natural formulation is an *ensemble axis*:
stack the R replicas' parameters, optimizer states, trajectories, and
batch schedules along a leading axis and ``jax.vmap`` the (already pure)
multi-epoch program over it — R replicas advance in lock-step inside a
single compiled program, with every matmul batched R-fold onto the MXU.
This composes with the data mesh: the ensemble axis is vmapped while batch
reductions inside each replica still shard over the mesh's data axis.

Usage::

    tasks = [EigenFunctionTask(traj_r, pp, model_r, ...) for r in replicas]
    train_replica_ensemble(tasks)     # all tasks trained; per-task
                                      # train_loss_df / model populated
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..logging_utils import losses_to_dataframe

__all__ = ["train_replica_ensemble"]

# vmapped+jitted ensemble programs, shared across calls (same static
# config -> same compiled program; jax.jit handles new shapes/replica
# counts by retracing)
_ENSEMBLE_FN_CACHE: dict = {}


def _ensemble_fn(epochs: int, static: tuple):
    from ..config import matmul_precision
    from ..core.eigenfunction import _multi_epoch_impl

    key = (epochs, matmul_precision()) + static
    fn = _ENSEMBLE_FN_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            jax.vmap(_multi_epoch_impl(epochs, static)),
            donate_argnums=(0, 1),
        )
        _ENSEMBLE_FN_CACHE[key] = fn
    return fn


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _index_tree(tree, r):
    return jax.tree_util.tree_map(lambda x: x[r], tree)


def train_replica_ensemble(tasks: Sequence) -> None:
    """Train R same-shaped :class:`EigenFunctionTask` replicas in one
    vmapped program.

    All tasks must share the same static configuration (loss constants,
    lag, optimizer, trajectory/batch shapes); models, preprocessing-layer
    constants, data, and splits may differ per replica. After the call each
    task's ``model`` / ``opt_state`` / ``train_loss_df`` / ``test_loss_df``
    are populated exactly as if ``task.train()`` had run (without per-task
    checkpoint/plot hooks — drive those separately if needed).
    """
    from ..core.eigenfunction import EigenFunctionTask

    assert len(tasks) >= 1
    assert all(isinstance(t, EigenFunctionTask) for t in tasks), (
        "train_replica_ensemble currently supports EigenFunctionTask"
    )
    assert not any(getattr(t, "fused_step", False) for t in tasks), (
        "train_replica_ensemble does not support fused_step tasks (the "
        "Pallas kernels cannot be vmapped over the replica axis); "
        "construct the replicas with the default XLA step"
    )
    # prepare data BEFORE reading static configs: the data layout decides
    # the unroll flag, which is part of the static config
    prepared = [t._prepare_data() for t in tasks]
    static = tasks[0]._static_config()
    n0 = tasks[0]._traj_np.shape
    for r, t in enumerate(tasks[1:], start=1):
        assert t._static_config() == static, (
            "all replicas must share the same static configuration; "
            f"replica {r} has {t._static_config()} vs {static}"
        )
        assert t.num_epochs == tasks[0].num_epochs
        assert t.batch_size == tasks[0].batch_size
        # data shapes are NOT part of the static config (jit handles new
        # shapes by retracing) but must match across replicas for stacking
        assert t._traj_np.shape == n0, (
            f"replica {r} trajectory shape {t._traj_np.shape} != "
            f"replica 0's {n0}; all replicas must have the same data shape"
        )
        assert t.test_ratio == tasks[0].test_ratio, (
            f"replica {r} test_ratio {t.test_ratio} != "
            f"{tasks[0].test_ratio}"
        )

    # per-replica splits/batches and data layout
    models, opt_states, pps, diags, train_ds, test_ds = [], [], [], [], [], []
    for t, (train_data, test_data, _, _) in zip(tasks, prepared):
        train_ds.append(train_data)
        test_ds.append(test_data)
        # no _protect copies needed: jnp.stack below already materializes
        # fresh buffers, and only the stacked arrays are donated — the
        # user-held per-task leaves are never invalidated
        models.append(t.model)
        opt_states.append(t.opt_state)
        pps.append(t._pp_for_loss)
        diags.append(t._diag_coeff)

    model_e = _stack_trees(models)
    opt_e = _stack_trees(opt_states)
    pp_e = _stack_trees(pps)
    diag_e = None if diags[0] is None else jnp.stack(diags)
    train_e = _stack_trees(train_ds)
    test_e = _stack_trees(test_ds)

    epochs = tasks[0].num_epochs
    ens_fn = _ensemble_fn(epochs, static)

    t0 = time.perf_counter()
    model_e, opt_e, train_ms, test_ms = ens_fn(
        model_e, opt_e, pp_e, diag_e, train_e, test_e
    )
    train_ms = np.asarray(train_ms)  # [R, epochs, nb, n_metrics + k]
    test_ms = np.asarray(test_ms)
    elapsed = time.perf_counter() - t0

    k = tasks[0].k
    loss_names = ["loss", "eigen_non_penalty", "eigen_penalty"] + [
        "eig_%d" % (i + 1) for i in range(k)
    ]
    n_metrics = len(loss_names)
    for r, t in enumerate(tasks):
        t.model = _index_tree(model_e, r)
        t.opt_state = _index_tree(opt_e, r)
        t._cvec = train_ms[r, -1, -1, n_metrics:].astype(int)
        # per-epoch raw metric arrays, matching train()'s loss_list layout
        t.loss_list = [
            [train_ms[r, e, :, :n_metrics], test_ms[r, e, :, :n_metrics]]
            for e in range(epochs)
        ]
        t.train_loss_df = losses_to_dataframe(
            list(train_ms[r, :, :, :n_metrics].mean(axis=1)), loss_names
        )
        t.test_loss_df = losses_to_dataframe(
            list(test_ms[r, :, :, :n_metrics].mean(axis=1)), loss_names
        )
        t.epoch_times = [elapsed / epochs] * epochs
