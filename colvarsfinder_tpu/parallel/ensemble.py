r"""Replica-ensemble training: run a sweep of same-shaped tasks as ONE
vmapped program.

The reference trains sweep replicas in a Python loop (one process, one
model at a time; its sweep story is re-running ``train()``, reference
core.py:459). On TPU the natural formulation is an *ensemble axis*: stack
the R replicas' parameters, optimizer states, and hyperparameters along a
leading axis and ``jax.vmap`` the (already pure) multi-epoch program over
it — R replicas advance in lock-step inside a single compiled program,
with every matmul batched R-fold onto the MXU. This composes with the
data mesh: the ensemble axis is vmapped while batch reductions inside
each replica still shard over the mesh's data axis.

Two entry points:

* :func:`train_replica_ensemble` — R separately-constructed tasks (any of
  the four task families), each with its own data/split/model; data is
  stacked per replica. Hyperparameters (lr, loss constants) MAY differ
  across replicas — they are traced, not baked into the program.
* :func:`train_hyperparameter_sweep` — ONE task + a grid of
  hyperparameter values; the batch data is passed with ``in_axes=None``
  so the R replicas SHARE one copy of the trajectory batches on device.
  This is the chip-filling formulation for lr/alpha sweeps: R-fold
  batched matmuls with no data duplication.

Usage::

    tasks = [EigenFunctionTask(traj_r, pp, model_r, ...) for r in replicas]
    train_replica_ensemble(tasks)     # all tasks trained; per-task
                                      # train_loss_df / model populated

    results = train_hyperparameter_sweep(
        task,
        {"learning_rate": [3e-3, 1e-2, 3e-2], "alpha": [10., 20., 40.]},
    )
"""

from __future__ import annotations

import time
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..logging_utils import losses_to_dataframe

__all__ = [
    "train_replica_ensemble",
    "train_hyperparameter_sweep",
    "SweepResult",
    "adopt_sweep_result",
    "sweep_vamp_scores",
    "sweep_committor_checks",
    "ExploreResult",
    "explore_then_finetune",
    "train_architecture_ensemble",
]

# vmapped+jitted ensemble programs, shared across calls (same task family
# + static config -> same compiled program; jax.jit handles new
# shapes/replica counts by retracing)
_ENSEMBLE_FN_CACHE: dict = {}
_ENSEMBLE_FN_CACHE_MAX = 32

#: wall-clock seconds of the last ensemble/sweep DEVICE run (the jitted
#: vmapped program only, excluding host-side stacking/unpacking) — for
#: benchmarking the compute separately from tunnel transfer overheads.
last_run_seconds: float = 0.0


def _ensemble_fn(impl, cache_key, in_axes=0):
    fn = _ENSEMBLE_FN_CACHE.get(cache_key)
    if fn is None:
        fn = jax.jit(
            jax.vmap(impl, in_axes=in_axes),
            donate_argnums=(0, 1),
        )
        while len(_ENSEMBLE_FN_CACHE) >= _ENSEMBLE_FN_CACHE_MAX:
            _ENSEMBLE_FN_CACHE.pop(next(iter(_ENSEMBLE_FN_CACHE)))
        _ENSEMBLE_FN_CACHE[cache_key] = fn
    return fn


#: per stacked leaf: stack on host below this, on device above (a host
#: round-trip of per-replica trajectory data would dwarf dispatch savings)
_HOST_STACK_LIMIT_BYTES = 4 << 20


def _leaf_nbytes(x) -> int:
    shape = np.shape(x)
    dtype = getattr(x, "dtype", None) or np.asarray(x).dtype
    return int(np.prod(shape, dtype=np.int64)) * np.dtype(dtype).itemsize


def _stack_trees(trees):
    """Stack R same-structure pytrees along a new leading axis.

    ``jnp.stack`` over R device arrays issues R expand_dims dispatches
    per leaf — ~0.3 ms each through the TPU tunnel, so stacking 64
    replicas' model+optimizer leaves costs ~0.5 s of pure dispatch
    (measured, benchmarks/sweep_profile.py). Small leaves are instead
    fetched in ONE bulk device_get, stacked in numpy on the host, and
    re-placed in one transfer per leaf; large leaves (per-replica
    trajectory data in train_replica_ensemble) keep the on-device path.
    """
    R = len(trees)
    if R == 1:
        return jax.tree_util.tree_map(lambda x: jnp.stack([x]), trees[0])
    leaves0, treedef = jax.tree_util.tree_flatten(trees[0])
    all_leaves = [leaves0] + [
        jax.tree_util.tree_flatten(t)[0] for t in trees[1:]
    ]
    n = len(leaves0)
    small = [
        i for i in range(n)
        if _leaf_nbytes(leaves0[i]) * R <= _HOST_STACK_LIMIT_BYTES
    ]
    small_set = set(small)
    host = (
        jax.device_get([[lv[i] for i in small] for lv in all_leaves])
        if small else []
    )
    out = [None] * n
    for j, i in enumerate(small):
        out[i] = jnp.asarray(np.stack([host[r][j] for r in range(R)]))
    for i in range(n):
        if i not in small_set:
            out[i] = jnp.stack([lv[i] for lv in all_leaves])
    return jax.tree_util.tree_unflatten(treedef, out)


def _bulk_get(tree):
    """``jax.device_get`` with one transfer per dtype instead of one per
    leaf: each small-array fetch costs ~17 ms of tunnel latency (33
    leaves ≈ 0.6 s per sweep, benchmarks/sweep_profile.py). Leaves are
    raveled and concatenated on device by dtype group, fetched, and
    split/reshaped in numpy on the host."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if len(leaves) <= 2:
        return jax.device_get(tree)
    groups: dict = {}
    for i, leaf in enumerate(leaves):
        groups.setdefault(np.dtype(leaf.dtype).name, []).append(i)
    out = [None] * len(leaves)
    for idxs in groups.values():
        packed = jax.device_get(
            _pack_leaves([leaves[i] for i in idxs])
        )
        off = 0
        for i in idxs:
            size = int(np.prod(np.shape(leaves[i]), dtype=np.int64))
            out[i] = packed[off:off + size].reshape(np.shape(leaves[i]))
            off += size
    return jax.tree_util.tree_unflatten(treedef, out)


@jax.jit
def _pack_leaves(xs):
    return jnp.concatenate([x.ravel() for x in xs])


def _index_tree(tree, r):
    return jax.tree_util.tree_map(lambda x: x[r], tree)


def _shard_replica_axis(mesh, R: int, stacked_trees, replicated_trees):
    """Ensemble parallelism: place the replica-stacked pytrees with their
    leading axis sharded over ``mesh``'s first axis, and the shared pytrees
    fully replicated. Replicas are independent, so XLA partitions the
    vmapped program with zero collectives — each device advances R/n_dev
    replicas. Returns ``(stacked_trees, replicated_trees)`` re-placed."""
    from jax.sharding import NamedSharding, PartitionSpec

    n_dev = mesh.devices.size
    assert R % n_dev == 0, (
        f"replica count {R} must be divisible by the mesh size {n_dev} "
        "to shard the ensemble axis"
    )
    shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    rep = NamedSharding(mesh, PartitionSpec())
    stacked_trees = tuple(
        jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep if np.ndim(x) == 0 else shard), t
        )
        for t in stacked_trees
    )
    replicated_trees = tuple(
        jax.device_put(t, rep) for t in replicated_trees
    )
    return stacked_trees, replicated_trees


# ---------------------------------------------------------------------------
# per-task-family adapters
# ---------------------------------------------------------------------------


class _Plan(NamedTuple):
    """How to run one task family through the ensemble machinery."""

    impl: object  # un-jitted multi-epoch program
    args: tuple  # traced args after (model, opt_state)
    loss_names: list  # metric column names
    has_cvec: bool  # metric rows carry cvec columns after the metrics
    metrics_2d: bool  # metrics are [epochs, nb] scalars (AE) vs rows


def _plan_for(task) -> _Plan:
    from ..core.autoencoder import AutoEncoderTask
    from ..core.autoencoder import _multi_epoch_impl as _ae_impl
    from ..core.committor import _METRIC_COLS as _COM_COLS
    from ..core.committor import CommittorTask
    from ..core.committor import _multi_epoch_impl as _com_impl
    from ..core.eigenfunction import EigenFunctionTask
    from ..core.eigenfunction import _multi_epoch_impl as _eig_impl
    from ..core.regautoencoder import RegAutoEncoderTask
    from ..core.regautoencoder import _multi_epoch_impl as _regae_impl

    epochs = task.num_epochs
    if isinstance(task, EigenFunctionTask):
        assert not getattr(task, "fused_step", False), (
            "replica-ensemble training does not support fused_step tasks "
            "(the Pallas kernels cannot be vmapped over the replica axis); "
            "construct the replicas with the default XLA step"
        )
        train_data, test_data, _, _ = task._prepare_data()
        loss_names = ["loss", "eigen_non_penalty", "eigen_penalty"] + [
            "eig_%d" % (i + 1) for i in range(task.k)
        ]
        return _Plan(
            _eig_impl(epochs, task._static_config()),
            (task._pp_for_loss, task._diag_coeff, task._hyper(),
             train_data, test_data),
            loss_names, True, False,
        )
    if isinstance(task, RegAutoEncoderTask):
        data_args, _, _ = task._prepare_data()
        loss_names = (
            ["loss", "ae_loss", "eigen_non_penalty", "eigen_penalty"]
            + ["eig_%d" % i for i in range(task.num_reg)]
            + ["encoder_gradient", "encoder_norm", "encoder_orthogonality"]
        )
        return _Plan(
            _regae_impl(epochs, task._static_config()),
            (task._pp_for_loss, task._diag_coeff, task._hyper())
            + tuple(data_args),
            loss_names, True, False,
        )
    if isinstance(task, CommittorTask):
        data_args, _, _, _ = task._prepare_data()
        return _Plan(
            _com_impl(epochs, *task._static_config()),
            (task.preprocessing_layer, task.diag_coeff, task._hyper())
            + tuple(data_args),
            list(_COM_COLS), False, False,
        )
    if isinstance(task, AutoEncoderTask):
        data_args, _, _, _ = task._prepare_data()
        return _Plan(
            _ae_impl(epochs, *task._static_config()),
            tuple(data_args),
            ["loss"], False, True,
        )
    raise TypeError(
        f"unsupported task type {type(task).__name__} for ensemble "
        "training (expected EigenFunctionTask, AutoEncoderTask, "
        "RegAutoEncoderTask, or CommittorTask)"
    )


def _finalize(task, plan: _Plan, train_ms, test_ms, per_epoch_time):
    """Populate one task's post-train attributes from its replica's
    metric arrays, matching what ``task.train()`` would have set."""
    epochs = task.num_epochs
    if plan.metrics_2d:
        task.loss_list = [
            [train_ms[e], test_ms[e]] for e in range(epochs)
        ]
        train_means = [np.asarray([train_ms[e].mean()]) for e in range(epochs)]
        test_means = [np.asarray([test_ms[e].mean()]) for e in range(epochs)]
    else:
        n_metrics = len(plan.loss_names)
        if plan.has_cvec:
            task._cvec = train_ms[-1, -1, n_metrics:].astype(int)
        task.loss_list = [
            [train_ms[e, :, :n_metrics], test_ms[e, :, :n_metrics]]
            for e in range(epochs)
        ]
        train_means = list(train_ms[:, :, :n_metrics].mean(axis=1))
        test_means = list(test_ms[:, :, :n_metrics].mean(axis=1))
    task.train_loss_df = losses_to_dataframe(train_means, plan.loss_names)
    task.test_loss_df = losses_to_dataframe(test_means, plan.loss_names)
    task.epoch_times = [per_epoch_time] * epochs


def train_replica_ensemble(
    tasks: Sequence, mesh=None, compute_dtype: str | None = None,
    bf16_style: str | None = None,
) -> None:
    """Train R same-shaped task replicas in one vmapped program.

    Supports all four task families (:class:`EigenFunctionTask`,
    :class:`AutoEncoderTask`, :class:`RegAutoEncoderTask`,
    :class:`CommittorTask`); all tasks
    must be of the SAME family and share the same static configuration
    (lags, optimizer name, gate pattern, data layout, trajectory/batch
    shapes). Models, preprocessing-layer constants, data, splits, AND
    hyperparameters — learning rate, alpha/gamma/eta/eig_weights/beta —
    may differ per replica (they are traced arguments). After the call
    each task's ``model`` / ``opt_state`` / ``train_loss_df`` /
    ``test_loss_df`` are populated exactly as if ``task.train()`` had run
    (without per-task checkpoint/plot hooks — drive those separately if
    needed).

    Args:
        tasks: the R replicas.
        mesh: optional :class:`jax.sharding.Mesh` for **ensemble
            parallelism**: every replica-stacked input (models, optimizer
            states, data) has its replica axis sharded over the mesh's
            first axis, so each device trains R/n_dev replicas. Replicas
            are independent — XLA partitions the program with zero
            collectives. R must divide by the mesh size; the tasks must
            not themselves shard over a mesh (one lever at a time —
            combine ensembles with data sharding deliberately via
            per-task ``mesh=`` instead).
        compute_dtype: optional activation dtype for this run
            ('bfloat16' | 'float32'); temporarily overrides
            ``config.set_compute_dtype`` (see
            :func:`train_hyperparameter_sweep`).
        bf16_style: optional bfloat16 arithmetic style ('pure' | 'acc32'
            | 'w32') applied alongside ``compute_dtype='bfloat16'``; see
            :func:`colvarsfinder_tpu.config.set_bf16_style`.
    """
    if compute_dtype is not None or bf16_style is not None:
        from .. import config as _cfg

        prev = _cfg.compute_dtype_name()
        prev_style = _cfg.bf16_style()
        if compute_dtype is not None:
            _cfg.set_compute_dtype(compute_dtype)
        if bf16_style is not None:
            _cfg.set_bf16_style(bf16_style)
        try:
            return train_replica_ensemble(tasks, mesh=mesh)
        finally:
            _cfg.set_compute_dtype(prev)
            _cfg.set_bf16_style(prev_style)

    from ..config import numerics_key
    from ..core.task import TrainingTask

    assert len(tasks) >= 1
    t0_task = tasks[0]
    assert all(type(t) is type(t0_task) for t in tasks), (
        "all replicas must be the same task type; got "
        f"{sorted({type(t).__name__ for t in tasks})}"
    )

    plans = [_plan_for(t) for t in tasks]
    static = t0_task._static_config()
    for r, t in enumerate(tasks[1:], start=1):
        assert t._static_config() == static, (
            "all replicas must share the same static configuration; "
            f"replica {r} has {t._static_config()} vs {static}"
        )
        assert t.num_epochs == t0_task.num_epochs
        assert t.batch_size == t0_task.batch_size
        assert t.test_ratio == t0_task.test_ratio, (
            f"replica {r} test_ratio {t.test_ratio} != {t0_task.test_ratio}"
        )
    # traced-arg trees must match in structure and leaf shape for stacking
    # (data shapes are not part of the static config: jit retraces)
    flat0, treedef0 = jax.tree_util.tree_flatten(plans[0].args)
    for r, p in enumerate(plans[1:], start=1):
        flat, treedef = jax.tree_util.tree_flatten(p.args)
        assert treedef == treedef0, (
            f"replica {r} traced-argument structure differs from "
            "replica 0's (check data layouts and gate patterns)"
        )
        for a, b in zip(flat, flat0):
            assert np.shape(a) == np.shape(b), (
                f"replica {r} has a traced leaf of shape {np.shape(a)} vs "
                f"replica 0's {np.shape(b)}; all replicas must have the "
                "same data shape"
            )

    # no _protect copies needed: jnp.stack below already materializes
    # fresh buffers, and only the stacked arrays are donated — the
    # user-held per-task leaves are never invalidated
    _injected_states = (
        optax.InjectHyperparamsState, optax.InjectStatefulHyperparamsState,
    )
    for r, t in enumerate(tasks):
        assert not isinstance(t.opt_state, _injected_states), (
            f"replica {r}'s opt_state is already in injected-hyperparams "
            "format (e.g. taken from a prior ensemble/sweep result "
            "without TrainingTask.unwrap_opt_state); wrap would nest it. "
            "Pass the unwrapped inner state instead."
        )
    model_e = _stack_trees([t.model for t in tasks])
    opt_e = _stack_trees([t.opt_state for t in tasks])
    args_e = _stack_trees([p.args for p in plans])

    # tasks hold STATIC-lr optimizer states (solo mode); the vmapped
    # program needs the injected-hyperparams format with a per-replica
    # traced lr — wrap each task's inner state (structurally identical,
    # see TrainingTask.make_optimizer) with its own learning rate. The
    # jitted wrap is CACHED (a fresh closure would recompile inside
    # every warmed ensemble call and sink short windows)
    lrs_arr = jnp.asarray([float(t.learning_rate) for t in tasks])
    wrap_key = ("ens_wrap", t0_task.optimizer_name.lower(), numerics_key())
    wrap_fn = _ENSEMBLE_FN_CACHE.get(wrap_key)
    if wrap_fn is None:
        inj_opt = TrainingTask.make_optimizer(t0_task.optimizer_name)

        def _wrap_one(m, lr, inner):
            st = inj_opt.init(m)
            hp = dict(st.hyperparams)
            hp["learning_rate"] = jnp.asarray(
                lr, dtype=jnp.asarray(hp["learning_rate"]).dtype
            )
            return st._replace(hyperparams=hp, inner_state=inner)

        wrap_fn = jax.jit(jax.vmap(_wrap_one))
        while len(_ENSEMBLE_FN_CACHE) >= _ENSEMBLE_FN_CACHE_MAX:
            _ENSEMBLE_FN_CACHE.pop(next(iter(_ENSEMBLE_FN_CACHE)))
        _ENSEMBLE_FN_CACHE[wrap_key] = wrap_fn
    opt_e = wrap_fn(model_e, lrs_arr, opt_e)

    if mesh is not None:
        assert all(getattr(t, "mesh", None) is None for t in tasks), (
            "ensemble-parallel training requires tasks without their own "
            "data mesh"
        )
        (model_e, opt_e, args_e), _ = _shard_replica_axis(
            mesh, len(tasks), (model_e, opt_e, args_e), ()
        )

    epochs = t0_task.num_epochs
    key = (
        "replica", type(t0_task).__name__, epochs, numerics_key(),
        static,
    )
    ens_fn = _ensemble_fn(plans[0].impl, key)

    global last_run_seconds
    t0 = time.perf_counter()
    model_e, opt_e, train_ms, test_ms = ens_fn(model_e, opt_e, *args_e)
    train_ms = np.asarray(train_ms)  # [R, epochs, nb(, n_metrics + k)]
    elapsed = time.perf_counter() - t0
    last_run_seconds = elapsed
    # one bulk fetch; per-replica trees are then sliced on the host (the
    # tasks' model/opt_state leaves become numpy arrays — re-placed on
    # device automatically at next use)
    model_e, opt_e, test_ms = _bulk_get((model_e, opt_e, test_ms))

    for r, (t, p) in enumerate(zip(tasks, plans)):
        t.model = _index_tree(model_e, r)
        # back to the tasks' SOLO (static-lr) format: the injected
        # wrapper's inner state IS the static state
        t.opt_state = TrainingTask.unwrap_opt_state(_index_tree(opt_e, r))
        _finalize(t, p, train_ms[r], test_ms[r], elapsed / epochs)


# ---------------------------------------------------------------------------
# hyperparameter sweep over ONE task's data
# ---------------------------------------------------------------------------


class SweepResult(NamedTuple):
    """One replica's outcome of :func:`train_hyperparameter_sweep`.

    ``model`` / ``opt_state`` leaves are host numpy arrays (fetched in one
    bulk transfer); they are placed back on device automatically when next
    used in a jitted computation.
    """

    hyperparams: dict
    model: object
    opt_state: object
    train_loss_df: object
    test_loss_df: object
    cvec: np.ndarray | None


# hyper-tuple field index per task family (matching each task's _hyper())
_EIG_HYPER_IX = {"alpha": 0, "eig_weights": 1, "beta": 2}
_REGAE_HYPER_IX = {
    "alpha": 0, "gamma": 1, "eta": 2, "eig_weights": 3, "beta": 4,
}
_COMMITTOR_HYPER_IX = {"alpha": 0, "beta": 1}


def adopt_sweep_result(task, result: SweepResult):
    """Load a sweep winner back into ``task`` so its normal surface
    (``colvar_model``/``save_model``/``export_colvar``/checkpointing, or
    continued ``train()``) operates on the winning replica.

    Sets the model, optimizer state, head ordering (``cvec``), and the
    task's hyperparameter attributes to the replica's values. Returns the
    task for chaining.
    """
    from ..core.task import TrainingTask

    task.model = jax.tree.map(jnp.asarray, result.model)
    # sweep states are injected-hyperparams format; the task trains with
    # the static-lr solo optimizer whose state is the inner state
    task.opt_state = jax.tree.map(
        jnp.asarray, TrainingTask.unwrap_opt_state(result.opt_state)
    )
    if result.cvec is not None:
        task._cvec = np.asarray(result.cvec)
    attr_of = {  # task attribute candidates per sweepable hyperparameter
        "learning_rate": ("learning_rate",),
        "eig_weights": ("_eig_w",),
        "beta": ("_beta", "beta"),
        # RegAE stores plain `alpha`; eigen `_alpha`; committor `alpha`
        "alpha": ("alpha",) if hasattr(task, "gamma") else ("_alpha", "alpha"),
        "gamma": ("gamma",), "eta": ("eta",),
    }
    for name, value in result.hyperparams.items():
        attr = next(
            (a for a in attr_of.get(name, ()) if hasattr(task, a)), None
        )
        if attr is not None:
            old = getattr(task, attr)
            if isinstance(old, list) and old:
                value = [type(old[0])(v) for v in np.asarray(value).reshape(-1)]
            elif isinstance(old, float):
                value = float(value)
            setattr(task, attr, value)
    return task


def sweep_vamp_scores(
    task,
    results,
    lag: int | None = None,
    frames=None,
    weights=None,
    method: str = "VAMP-2",
    batch_size: int = 65536,
    segment_starts=None,
) -> np.ndarray:
    """Rank sweep replicas by the VAMP score of their CV — the
    head-mixing-invariant alternative to comparing final train losses
    (which are NOT comparable across ``alpha``/``eig_weights``/``gamma``
    values, since those reweight the objective itself).

    Each replica's CV is evaluated frame-ordered and scored with
    :func:`colvarsfinder_tpu.analysis.vamp_score`. The task is not
    mutated (replicas are adopted into a shallow proxy copy); adopt the
    argmax winner afterwards with :func:`adopt_sweep_result`.

    Args:
        task: the task the sweep was run on.
        results: list of :class:`SweepResult` from
            :func:`train_hyperparameter_sweep` (or a single result).
        lag: VAMP lag in FRAMES; defaults to the task's training
            ``lag_idx`` (transfer-operator tasks). Required for tasks
            without a positive training lag.
        frames: optional ``[n, ...state]`` frame-ordered states to
            score on (e.g. a held-out continuation trajectory); defaults
            to the task's full trajectory.
        weights: per-frame weights matching ``frames``; defaults to the
            task's trajectory weights when ``frames`` is omitted.
        method: ``'VAMP-1'`` or ``'VAMP-2'`` (default).
        batch_size: CV-evaluation chunk size (memory bound only — the
            score itself uses the full series).
        segment_starts: source-trajectory offsets when ``frames`` is a
            concatenated multi-trajectory series; defaults to the
            task's ``traj_obj.segment_starts`` when ``frames`` is
            omitted.

    Returns:
        ``[R]`` numpy array of scores, in ``results`` order.
    """
    import copy

    from ..analysis import vamp_score

    if lag is None:
        lag = getattr(task, "lag_idx", 0)
        if not lag:
            raise ValueError(
                "task has no positive training lag; pass lag= (in frames)"
            )
    if frames is None:
        frames = task.traj_obj.trajectory
        if weights is None:
            weights = task.traj_obj.weights
        if segment_starts is None:
            segment_starts = getattr(task.traj_obj, "segment_starts", None)
    frames = np.asarray(frames)
    if isinstance(results, SweepResult):
        results = [results]
    proxy = copy.copy(task)
    # place each frame chunk on device ONCE; replicas only differ in
    # their (tiny) model parameters, not the (large) frame data
    dev_chunks = [
        jnp.asarray(frames[s : s + batch_size])
        for s in range(0, frames.shape[0], batch_size)
    ]
    scores = np.empty(len(results))
    for i, res in enumerate(results):
        adopt_sweep_result(proxy, res)
        cv = proxy.colvar_model()
        y = np.concatenate([np.asarray(cv(c)) for c in dev_chunks])
        scores[i] = vamp_score(
            y, lag, weights=weights, method=method,
            segment_starts=segment_starts,
        )
    return scores


def sweep_committor_checks(
    task,
    results,
    lag: int,
    frames=None,
    weights=None,
    in_a=None,
    in_b=None,
    n_bins: int = 20,
    batch_size: int = 65536,
    segment_starts=None,
) -> np.ndarray:
    """Rank committor-sweep replicas by MSM self-consistency — the
    committor counterpart of :func:`sweep_vamp_scores` (final losses are
    NOT comparable across ``alpha`` values, since alpha reweights the
    boundary terms against the Dirichlet term).

    Each replica's predicted committor is evaluated frame-ordered and
    scored as the MAX of (a) the interior MSM self-consistency deviation
    (:func:`colvarsfinder_tpu.analysis.committor_self_consistency`) and
    (b) the weighted-mean boundary violations ``E[q | A]`` and
    ``E[1-q | B]`` — (b) is essential: a committor collapsed to the
    global crossing probability populates one interior bin and trivially
    passes (a), but fails its boundary conditions massively. LOWER is
    better; adopt ``results[np.argmin(devs)]`` with
    :func:`adopt_sweep_result`.

    Args:
        task: the :class:`~colvarsfinder_tpu.core.CommittorTask` the
            sweep was run on (its region masks define the MSM boundary
            states).
        results: list of :class:`SweepResult` (or a single result).
        lag: MSM estimation lag in frames (the data's decorrelation
            scale — see ``committor_self_consistency``).
        frames / weights / segment_starts: optional held-out
            frame-ordered states; default to the task's trajectory.
        in_a / in_b: [n] boolean A/B masks for ``frames`` (required with
            ``frames``; default to the task's own masks otherwise).
        n_bins: interior committor bins.
        batch_size: CV-evaluation chunk size.

    Returns:
        ``[R]`` numpy array of ``max_deviation`` scores, in ``results``
        order (nan where a replica's committor leaves every interior
        bin unpopulated).
    """
    import copy

    from ..analysis import committor_self_consistency
    from ..core.committor import CommittorTask

    if not isinstance(task, CommittorTask):
        raise TypeError(
            "sweep_committor_checks needs a CommittorTask (its region "
            f"masks define the boundary states); got {type(task).__name__}"
        )
    if frames is None:
        frames = task.traj_obj.trajectory
        in_a = np.asarray(task._mask_a, bool)
        in_b = np.asarray(task._mask_b, bool)
        if weights is None:
            weights = task.traj_obj.weights
        if segment_starts is None:
            segment_starts = getattr(task.traj_obj, "segment_starts", None)
    elif in_a is None or in_b is None:
        raise ValueError(
            "pass in_a and in_b boolean masks along with held-out frames"
        )
    frames = np.asarray(frames)
    in_a = np.asarray(in_a, bool)
    in_b = np.asarray(in_b, bool)
    if isinstance(results, SweepResult):
        results = [results]
    proxy = copy.copy(task)
    dev_chunks = [
        jnp.asarray(frames[s : s + batch_size])
        for s in range(0, frames.shape[0], batch_size)
    ]
    devs = np.empty(len(results))
    for i, res in enumerate(results):
        adopt_sweep_result(proxy, res)
        cv = proxy.colvar_model()
        logits = np.concatenate([np.asarray(cv(c))[:, 0] for c in dev_chunks])
        q = 1.0 / (1.0 + np.exp(-logits))
        chk = committor_self_consistency(
            q, in_a, in_b, lag=lag, n_bins=n_bins, weights=weights,
            segment_starts=segment_starts,
        )
        w = (
            np.ones(len(q)) if weights is None
            else np.asarray(weights, float)
        )
        bnd_a = float(np.average(q[in_a], weights=w[in_a]))
        bnd_b = float(np.average(1.0 - q[in_b], weights=w[in_b]))
        devs[i] = max(chk.max_deviation, bnd_a, bnd_b)
    return devs


# unrolled-epoch-body liveness budget for wide vmapped sweeps: the
# UNROLLED multi-batch body keeps every step's double-backprop
# temporaries live at once, so a generator-loss grid OOMs a 16 GB chip
# at R=64 while a single-batch R=64 SCAN fits (benchmarks/RESULTS.md,
# "generator-loss sweeps"); above this estimated liveness the sweep
# auto-relayouts the task to the stacked+scanned epoch body
SWEEP_UNROLL_BUDGET_BYTES = 12 << 30


def _maybe_relayout_for_width(task, R: int) -> bool:
    """Auto-select the scanned epoch body for wide generator-loss
    sweeps whose unrolled-body liveness estimate exceeds the HBM
    budget. Calibrated against the round-3 measurements: the dipeptide
    generator config (B=20k, widths 30+20+20+20+1, k=2, 5 train
    batches) fits unrolled at R=32 (~9 GB by this estimate) and OOMs at
    R=64 (~19 GB). An explicit ``unroll_batches=`` on the task wins.

    Returns True when it relayouted, so the sweep can restore the
    task's solo layout afterwards (the scanned body costs ~0.8 ms/step
    of stacked-slice overhead that a subsequent solo ``train()`` should
    not silently inherit)."""
    from ..core.eigenfunction import EigenFunctionTask

    if not isinstance(task, EigenFunctionTask):
        return False
    if (
        task.lag_idx != 0
        or task._streaming
        or not task._prebatch
        or task._unroll_override is not None
    ):
        return False
    train_idx, test_idx = task._lagged_split(task.lag_idx)
    nb_train = max(1, len(train_idx) // task.batch_size)
    nb_test = max(1, len(test_idx) // task.batch_size)
    if nb_train + nb_test > task.PREBATCH_UNROLL_LIMIT:
        return False  # the heuristic already picks the scanned body
    # per-replica-step working set of the generator double backprop:
    # ~C x batch x (sum of layer widths incl. input) x k activations
    widths = task.model.params[0]["weight"].shape[-1] + sum(
        layer["weight"].shape[-2] for layer in task.model.params
    )
    itemsize = np.dtype(np.asarray(task._weights_np).dtype).itemsize
    per_step = 4 * task.batch_size * widths * task.k * itemsize
    est = per_step * nb_train * R
    if est > SWEEP_UNROLL_BUDGET_BYTES:
        if task.verbose:
            print(
                f"sweep: unrolled generator epoch body would keep "
                f"~{est / 2**30:.1f} GiB of double-backprop temporaries "
                f"live across {R} replicas — relayouting to the "
                "stacked+scanned body (identical losses)",
                flush=True,
            )
        task.relayout(unroll=False)
        return True
    return False


def train_hyperparameter_sweep(
    task, grid: dict, models=None, chunk_size: int | None = None, mesh=None,
    compute_dtype: str | None = None, bf16_style: str | None = None,
) -> list:
    """Train R hyperparameter variants of one task as a single vmapped
    program, sharing the task's device-placed batch data across all
    replicas (``in_axes=None`` — no data duplication).

    This is the TPU-native replacement for the sweep loop around the
    reference's ``train()`` (reference core.py:459): with tiny CV models
    the chip is mostly idle on a single replica, and the ensemble axis
    batches every matmul R-fold onto the MXU, so a whole lr x alpha grid
    costs little more wall-clock than one run.

    Args:
        task: a constructed task (any of the four families). Its data,
            split, and static configuration are used for every replica;
            its own hyperparameter values are the defaults a grid entry
            overrides.
        grid: mapping of hyperparameter name -> length-R sequence of
            values. Supported names: ``learning_rate`` (all tasks);
            ``alpha``, ``eig_weights``, ``beta`` (EigenFunctionTask);
            ``alpha``, ``gamma``, ``eta``, ``eig_weights``, ``beta``
            (RegAutoEncoderTask); ``alpha``, ``beta`` (CommittorTask).
            For RegAutoEncoderTask the values must not toggle a term's
            on/off gate (a zero gamma cannot become nonzero across
            replicas — gates are compiled static).
        models: optional length-R list of model pytrees (same
            architecture) for per-replica initializations; default is R
            copies of ``task.model``.
        chunk_size: optional cap on the vmapped replica axis. Grids wider
            than this run as ceil(R/chunk_size) sequential vmapped
            programs sharing the same compiled program and device data.
            Use when R replicas' training temporaries exceed HBM — e.g.
            generator-loss sweeps OOM at R=64 on one v5e (16 GB) while
            the device rate saturates by R=16 anyway
            (benchmarks/RESULTS.md, generator-loss sweeps). The last
            chunk is padded by repeating its final entry (and the padding
            dropped from the results) so it reuses the same program.
        mesh: optional :class:`jax.sharding.Mesh` for **ensemble
            parallelism**: the replica axis of the stacked models /
            optimizer states / hyperparameters is sharded over the mesh's
            first axis (each device trains R/n_dev grid points; zero
            collectives — replicas are independent) while the shared
            batch data is replicated to every device. R (or chunk_size)
            must divide by the mesh size. The task must not itself shard
            its data over a mesh.
        compute_dtype: optional activation dtype for this sweep
            ('bfloat16' | 'float32'); temporarily overrides
            ``config.set_compute_dtype``. Sweeps at dipeptide scale are
            HBM-bandwidth-bound on activation traffic, and 'bfloat16'
            mixed precision (f32 master weights, bf16 activations)
            measured ~2x the device throughput with ~1e-2 relative loss
            noise — ample for ranking grid points; fine-tune the adopted
            winner at float32 (benchmarks/RESULTS.md round 3).
        bf16_style: optional bfloat16 arithmetic style ('pure' | 'acc32'
            | 'w32') applied alongside ``compute_dtype='bfloat16'``.
            'acc32' accumulates matmuls in float32 (the MXU's native
            bf16xbf16->f32 path), tightening per-pass numerics at the
            cost of most of pure's speedup (1.17x vs 2.23x per step on
            TPU); long-window loss trajectories drift under every style,
            so rank with 'pure' and fine-tune winners at float32 unless
            per-step arithmetic fidelity itself matters. See
            :func:`colvarsfinder_tpu.config.set_bf16_style`.

    Returns:
        list of R :class:`SweepResult`, in grid order. The task itself is
        NOT mutated.
    """
    if compute_dtype is not None or bf16_style is not None:
        from .. import config as _cfg

        prev = _cfg.compute_dtype_name()
        prev_style = _cfg.bf16_style()
        if compute_dtype is not None:
            _cfg.set_compute_dtype(compute_dtype)
        if bf16_style is not None:
            _cfg.set_bf16_style(bf16_style)
        try:
            return train_hyperparameter_sweep(
                task, grid, models=models, chunk_size=chunk_size, mesh=mesh
            )
        finally:
            _cfg.set_compute_dtype(prev)
            _cfg.set_bf16_style(prev_style)

    from ..config import numerics_key
    from ..core.regautoencoder import RegAutoEncoderTask, _EPS
    from ..core.task import TrainingTask

    assert grid, "grid must name at least one hyperparameter"
    lengths = {name: len(vals) for name, vals in grid.items()}
    R = next(iter(lengths.values()))
    assert all(n == R for n in lengths.values()), (
        f"all grid value lists must have equal length, got {lengths}"
    )

    if chunk_size is not None and R > int(chunk_size):
        cs = int(chunk_size)
        assert cs > 0, "chunk_size must be positive"
        out = []
        for lo in range(0, R, cs):
            hi = min(lo + cs, R)
            # pad the last chunk by repeating its final entry so every
            # chunk has width cs and shares ONE compiled program
            idx = list(range(lo, hi)) + [hi - 1] * (cs - (hi - lo))
            sub = {k: [list(v)[i] for i in idx] for k, v in grid.items()}
            subm = None if models is None else [models[i] for i in idx]
            out.extend(
                train_hyperparameter_sweep(
                    task, sub, models=subm, mesh=mesh
                )[:hi - lo]
            )
        return out

    from ..core.committor import CommittorTask

    auto_relayouted = _maybe_relayout_for_width(task, R)
    plan = _plan_for(task)
    has_hyper = not plan.metrics_2d  # AE takes no hyper tuple
    if isinstance(task, RegAutoEncoderTask):
        hyper_ix = _REGAE_HYPER_IX
    elif isinstance(task, CommittorTask):
        hyper_ix = _COMMITTOR_HYPER_IX
    else:
        hyper_ix = _EIG_HYPER_IX
    for name in grid:
        if name == "learning_rate":
            continue
        assert has_hyper and name in hyper_ix, (
            f"hyperparameter '{name}' is not sweepable for "
            f"{type(task).__name__}; supported: ['learning_rate'"
            + (", " + ", ".join(sorted(hyper_ix)) if has_hyper else "")
            + "]"
        )

    if models is None:
        models = [task.model] * R
    assert len(models) == R, f"models must have length {R}"

    # per-replica hyper tuples: the task's own values overridden by name
    if has_hyper:
        base_hyper = task._hyper()
        if isinstance(task, RegAutoEncoderTask):
            # gates are static: a sweep value may not cross _EPS relative
            # to the task's own value
            gate_of = {
                "alpha": lambda v: float(np.asarray(v)) > _EPS,
                "gamma": lambda v: float(np.sum(np.asarray(v))) > _EPS,
                "eta": lambda v: tuple(
                    float(e) > _EPS for e in np.asarray(v).reshape(-1)
                ),
            }
            for name, fn in gate_of.items():
                if name in grid:
                    want = fn(np.asarray(base_hyper[hyper_ix[name]]))
                    for v in grid[name]:
                        assert fn(v) == want, (
                            f"sweep value {v!r} for '{name}' toggles its "
                            "on/off gate relative to the task's value; "
                            "gates are compiled static — construct a "
                            "separate task/sweep for that regime"
                        )
        hypers = []
        for r in range(R):
            h = list(base_hyper)
            for name, vals in grid.items():
                if name == "learning_rate":
                    continue
                ix = hyper_ix[name]
                h[ix] = jnp.asarray(
                    vals[r], dtype=jnp.asarray(base_hyper[ix]).dtype
                )
                assert h[ix].shape == base_hyper[ix].shape, (
                    f"'{name}' sweep value {vals[r]!r} has shape "
                    f"{h[ix].shape}, expected {base_hyper[ix].shape}"
                )
            hypers.append(tuple(h))
        hyper_e = _stack_trees(hypers)

    # per-replica optimizer states: ONE vmapped+jitted init over the
    # stacked models with the lr injected inside (an eager per-replica
    # init loop costs R x n_leaves tiny device dispatches — several
    # seconds through the TPU tunnel at R=64)
    lrs = grid.get("learning_rate", [task.learning_rate] * R)
    model_e = _stack_trees(models)
    lrs_arr = jnp.asarray([float(v) for v in lrs])
    init_key = (
        "sweep_init", type(task).__name__, numerics_key(),
        task._static_config(),
    )
    init_fn = _ENSEMBLE_FN_CACHE.get(init_key)
    if init_fn is None:
        # the INJECTED-hyperparams optimizer (the task's own optimizer is
        # the static-lr solo variant): per-replica lrs ride in the state
        optimizer = TrainingTask.make_optimizer(task.optimizer_name)

        def _init_one(m, lr):
            return TrainingTask.set_learning_rate(optimizer.init(m), lr)

        init_fn = jax.jit(jax.vmap(_init_one))
        while len(_ENSEMBLE_FN_CACHE) >= _ENSEMBLE_FN_CACHE_MAX:
            _ENSEMBLE_FN_CACHE.pop(next(iter(_ENSEMBLE_FN_CACHE)))
        _ENSEMBLE_FN_CACHE[init_key] = init_fn
    opt_e = init_fn(model_e, lrs_arr)

    # replica axis on model/opt/hyper ONLY; pp constants, diag, and the
    # batch data are broadcast (shared on device across replicas)
    if has_hyper:
        args = (plan.args[0], plan.args[1], hyper_e) + plan.args[3:]
        in_axes = (0, 0, None, None, 0) + (None,) * len(plan.args[3:])
    else:
        args = plan.args
        in_axes = (0, 0) + (None,) * len(plan.args)

    if mesh is not None:
        assert getattr(task, "mesh", None) is None, (
            "ensemble-parallel sweeps require a task without its own "
            "data mesh"
        )
        if has_hyper:
            (model_e, opt_e, hyper_e), shared = _shard_replica_axis(
                mesh, R, (model_e, opt_e, hyper_e),
                (plan.args[0], plan.args[1]) + plan.args[3:],
            )
            args = (shared[0], shared[1], hyper_e) + shared[2:]
        else:
            (model_e, opt_e), shared = _shard_replica_axis(
                mesh, R, (model_e, opt_e), tuple(plan.args)
            )
            args = shared

    epochs = task.num_epochs
    key = (
        "sweep", type(task).__name__, epochs, numerics_key(),
        task._static_config(),
    )
    ens_fn = _ensemble_fn(plan.impl, key, in_axes=in_axes)

    global last_run_seconds
    t0 = time.perf_counter()
    model_e, opt_e, train_ms, test_ms = ens_fn(model_e, opt_e, *args)
    train_ms = np.asarray(train_ms)  # blocks until the device run finishes
    last_run_seconds = time.perf_counter() - t0
    # ONE bulk fetch, then slice per replica on the host: per-replica
    # device indexing costs R x n_leaves tiny dispatches through the
    # tunnel (~4 s at R=64), dwarfing the training itself. Result leaves
    # are host numpy arrays (documented in SweepResult).
    model_e, opt_e, test_ms = _bulk_get((model_e, opt_e, test_ms))

    results = []
    n_metrics = len(plan.loss_names)
    for r in range(R):
        if plan.metrics_2d:
            train_means = [
                np.asarray([train_ms[r, e].mean()]) for e in range(epochs)
            ]
            test_means = [
                np.asarray([test_ms[r, e].mean()]) for e in range(epochs)
            ]
            cvec = None
        else:
            train_means = list(train_ms[r, :, :, :n_metrics].mean(axis=1))
            test_means = list(test_ms[r, :, :, :n_metrics].mean(axis=1))
            cvec = (
                train_ms[r, -1, -1, n_metrics:].astype(int)
                if plan.has_cvec else None
            )
        results.append(
            SweepResult(
                hyperparams={name: vals[r] for name, vals in grid.items()},
                model=_index_tree(model_e, r),
                opt_state=_index_tree(opt_e, r),
                train_loss_df=losses_to_dataframe(
                    train_means, plan.loss_names
                ),
                test_loss_df=losses_to_dataframe(
                    test_means, plan.loss_names
                ),
                cvec=cvec,
            )
        )
    if auto_relayouted:
        # the scanned body was an ensemble-width decision, not the
        # task's own: restore the solo heuristic (and drop the prepared
        # cache) so subsequent solo train() calls don't inherit the
        # ~0.8 ms/step stacked-slice cost
        task._unroll_override = None
        if hasattr(task, "_prepared_data_cache"):
            del task._prepared_data_cache
    return results


# ---------------------------------------------------------------------------
# explore (bf16 sweep) -> adopt winner -> fine-tune (f32): one call
# ---------------------------------------------------------------------------


class ExploreResult(NamedTuple):
    """Outcome of :func:`explore_then_finetune`.

    ``results`` is the full sweep (grid order, as from
    :func:`train_hyperparameter_sweep`); ``best_index`` indexes the
    replica that was adopted and fine-tuned; ``best_hyperparams`` is its
    grid point. After the call the *task itself* holds the fine-tuned
    model — its ``train_loss_df`` / ``colvar_model()`` / ``save_model()``
    surface reflects the float32 fine-tune run.
    """

    results: list
    best_index: int
    best_hyperparams: dict


def explore_then_finetune(
    task, grid: dict, *, models=None, metric: str = "train",
    metric_lag: int | None = None,
    finetune_epochs: int | None = None, compute_dtype: str = "bfloat16",
    bf16_style: str | None = None, chunk_size: int | None = None,
    mesh=None,
) -> ExploreResult:
    """The documented explore→adopt→fine-tune workflow as one call.

    bfloat16 compute is an exploration mode on TPU: ~2x sweep throughput
    with a loss-trajectory noise band that is fine for *ranking* grid
    points but not for the final model (benchmarks/RESULTS.md, bf16
    characterization). This helper packages the recommended usage
    (docs/performance.md): sweep ``grid`` under ``compute_dtype``
    (default bfloat16), pick the replica with the lowest final loss,
    :func:`adopt_sweep_result` it into ``task``, and continue training
    the winner at float32 — so the returned model's numerics are
    full-precision while the grid search ran at exploration speed.

    The reference package has no sweep surface at all (its loop is
    re-running ``train()``, reference core.py:459); this is the
    TPU-native replacement for that outer loop.

    Args:
        task: the task to sweep and fine-tune (any of the three
            families). Mutated: after the call it holds the fine-tuned
            winner (model, optimizer state, hyperparameter attributes,
            loss dataframes).
        grid: hyperparameter grid, as for
            :func:`train_hyperparameter_sweep`.
        models: optional per-replica initial models (as for the sweep).
        metric: ``'train'`` (default), ``'test'``, ``'vamp'``, or
            ``'committor'`` — what ranks the replicas.
            ``'train'``/``'test'`` pick the lowest final loss
            (``'test'`` falls back to the train loss when the task has
            no test split). ``'vamp'`` picks the highest
            :func:`sweep_vamp_scores` VAMP-2 at the task's training lag
            — use it whenever the grid varies loss constants
            (``alpha``/``eig_weights``/``gamma``/...), whose losses are
            not mutually comparable; requires a positive training lag.
            ``'committor'`` (CommittorTask only) picks the lowest
            :func:`sweep_committor_checks` score at ``metric_lag``
            frames.
        metric_lag: MSM lag in frames for ``metric='committor'``
            (required there; unused otherwise).
        finetune_epochs: epochs for the float32 fine-tune; defaults to
            the task's own ``num_epochs``.
        compute_dtype: dtype for the exploration sweep (default
            ``'bfloat16'``; pass ``'float32'`` for a full-precision
            sweep when the grid is small enough that speed is moot).
        bf16_style: optional bf16 arithmetic style for the sweep
            (:func:`colvarsfinder_tpu.config.set_bf16_style`).
        chunk_size / mesh: forwarded to the sweep.

    Returns:
        :class:`ExploreResult`.
    """
    results = train_hyperparameter_sweep(
        task, grid, models=models, chunk_size=chunk_size, mesh=mesh,
        compute_dtype=compute_dtype, bf16_style=bf16_style,
    )
    if metric not in ("train", "test", "vamp", "committor"):
        raise ValueError(
            f"metric must be 'train', 'test', 'vamp', or 'committor'; "
            f"got {metric!r}"
        )
    if metric == "vamp":
        best = int(np.argmax(sweep_vamp_scores(task, results)))
    elif metric == "committor":
        if metric_lag is None:
            raise ValueError("metric='committor' needs metric_lag= (frames)")
        best = int(np.argmin(
            sweep_committor_checks(task, results, lag=int(metric_lag))
        ))
    else:
        finals = []
        for r in results:
            df = r.test_loss_df if metric == "test" else r.train_loss_df
            if df is None or len(df) == 0:  # no test split on this task
                df = r.train_loss_df
            finals.append(float(df["loss"].iloc[-1]))
        best = int(np.argmin(finals))
    adopt_sweep_result(task, results[best])

    from .. import config as _cfg

    prev_dtype = _cfg.compute_dtype_name()
    prev_epochs = task.num_epochs
    _cfg.set_compute_dtype("float32")
    if finetune_epochs is not None:
        task.num_epochs = int(finetune_epochs)
    try:
        task.train()  # continues from the adopted model/opt_state
    finally:
        task.num_epochs = prev_epochs
        _cfg.set_compute_dtype(prev_dtype)
    return ExploreResult(results, best, dict(results[best].hyperparams))


# ---------------------------------------------------------------------------
# architecture sweep: group vmappable replicas, ensemble each group
# ---------------------------------------------------------------------------


def _arch_group_key(task):
    """Cheap grouping key for :func:`train_architecture_ensemble`: tasks
    with equal keys are *candidates* for one vmapped ensemble (the
    ensemble's own asserts are the authority — a group that still fails
    them falls back to solo training)."""
    leaves, treedef = jax.tree_util.tree_flatten(task.model)
    return (
        type(task).__name__,
        task._static_config(),
        task.num_epochs,
        task.batch_size,
        task.test_ratio,
        treedef,
        tuple(np.shape(leaf) for leaf in leaves),
    )


def train_architecture_ensemble(
    tasks: Sequence, *, mesh=None, compute_dtype: str | None = None,
    bf16_style: str | None = None, verbose: bool = False,
) -> list:
    """Train tasks of VARYING architectures, vmapping wherever possible.

    :func:`train_replica_ensemble` requires identical shapes across
    replicas, so an architecture search (different widths/depths/k)
    cannot run as one vmapped program. This helper is the architecture-
    sweep front end: it groups the tasks by vmap compatibility (family,
    static config, model pytree structure + leaf shapes), trains each
    multi-task group as one vmapped ensemble, and trains singletons (or
    groups the ensemble rejects, e.g. for differing data shapes) solo.
    Every task ends populated exactly as if ``task.train()`` had run —
    rank architectures by ``task.train_loss_df`` / ``test_loss_df``.

    Seeds are the cheap replica axis: N architectures x S seeds groups
    into N vmapped programs of S replicas each, since same-architecture
    tasks differ only in (traced) parameters.

    Args:
        tasks: the task variants (any mix of the four families and any
            architectures; same-architecture tasks may differ in model
            init, data, splits, and traced hyperparameters).
        mesh: optional ensemble-parallel mesh, applied to groups whose
            replica count divides the mesh size (others run unsharded —
            the mesh constraint is per-program).
        compute_dtype / bf16_style: optional numerics override for the
            whole sweep (exploration mode; see
            :func:`train_hyperparameter_sweep`).
        verbose: print one line per trained group.

    Returns:
        the ``tasks`` list (trained in place), for chaining.
    """
    if compute_dtype is not None or bf16_style is not None:
        from .. import config as _cfg

        prev = _cfg.compute_dtype_name()
        prev_style = _cfg.bf16_style()
        if compute_dtype is not None:
            _cfg.set_compute_dtype(compute_dtype)
        if bf16_style is not None:
            _cfg.set_bf16_style(bf16_style)
        try:
            return train_architecture_ensemble(
                tasks, mesh=mesh, verbose=verbose
            )
        finally:
            _cfg.set_compute_dtype(prev)
            _cfg.set_bf16_style(prev_style)

    groups: dict = {}
    for i, t in enumerate(tasks):
        groups.setdefault(_arch_group_key(t), []).append(i)

    for key, idxs in groups.items():
        group = [tasks[i] for i in idxs]
        label = f"{key[0]} group of {len(group)}"
        if len(group) == 1:
            if verbose:
                print(f"[arch-sweep] {label}: solo train()")
            group[0].train()
            continue
        gmesh = (
            mesh
            if mesh is not None and len(group) % mesh.devices.size == 0
            else None
        )
        try:
            train_replica_ensemble(group, mesh=gmesh)
            if verbose:
                print(f"[arch-sweep] {label}: one vmapped ensemble")
        except AssertionError as e:
            # shapes agreed but traced args didn't (e.g. different
            # trajectory lengths) — train each solo instead
            if verbose:
                print(f"[arch-sweep] {label}: fell back to solo ({e})")
            for t in group:
                t.train()
    return list(tasks)
