r"""Training task base class.

TPU-native counterpart of the reference's ``TrainingTask``
(reference: colvarsfinder/core.py:60-249). The constructor surface is kept
(the API *is* the constructor surface — SURVEY.md §1), with TPU-specific
additions: ``mesh`` for data-parallel training, ``seed`` controlling model
init / split determinism, and ``export_cv`` to gate deployment-artifact
writes.

Execution model divergence (the point of the rewrite): instead of a Python
loop over minibatches doing per-batch host->device transfers
(reference core.py:498-522, :699-712), each epoch is **one jitted program**
— a ``lax.scan`` over on-device batches for training plus one for
evaluation — so the host touches the device once per epoch to fetch a small
metrics array.
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod
from typing import Optional

import jax
import numpy as np
import optax

from ..checkpoint import load_pytree, save_pytree
from ..export import ColvarModel, export_colvar
from ..logging_utils import MetricsWriter
from ..parallel.mesh import replicate, shard_batches

__all__ = ["TrainingTask"]

# jitted packed-transfer streaming step/eval wrappers, shared across
# train() calls and task instances (keyed by the wrapped jitted fn +
# the batch's pack spec) — a per-call closure would recompile every
# chunk
_PACKED_FN_CACHE: dict = {}
_PACKED_FN_CACHE_MAX = 64


class TrainingTask(ABC):
    r"""Abstract base class of training tasks
    (reference: colvarsfinder/core.py:60-249).

    Args:
        traj_obj: :class:`colvarsfinder_tpu.utils.WeightedTrajectory`
        pp_layer: preprocessing layer — any jax-traceable callable/pytree
            mapping raw states [batch, ...] -> features [batch, d_r]
        model: model pytree to be trained
        model_path: directory for training outputs
        learning_rate: learning rate
        load_model_filename: checkpoint (.npz) to warm-start from
        save_model_every_step: checkpoint every N epochs (0 disables)
        k: number of collective variables to learn
        batch_size: minibatch size
        num_epochs: number of epochs
        test_ratio: fraction of data held out for evaluation
        optimizer_name: 'Adam' or 'SGD' (case-insensitive)
        device: jax.Device, device-kind string, or None for default
        plot_class: object with a ``plot`` callback
        plot_frequency: epochs between plot callbacks (0 disables)
        verbose: print more information
        debug_mode: additionally snapshot a checkpoint per save epoch
        mesh: optional ``jax.sharding.Mesh`` with a 'data' axis for
            data-parallel training (TPU extension)
        seed: PRNG seed for the train/test split (TPU extension; the
            reference relied on global RNG state). ``None`` draws a random
            seed once at construction — the split stays fixed for the
            task's lifetime either way
        split_indices: optional (train_idx, test_idx) pair overriding the
            random split — the parity-harness injection point (SURVEY §7)
        export_cv: write the StableHLO CV deployment artifact on save
        tensorboard: enable TensorBoard scalar logging
        profile_dir: if set, wrap training in a ``jax.profiler`` trace
            written to this directory; per-epoch wall-clock is always
            recorded in :attr:`epoch_times`
        shard_trajectory: with a mesh, shard the trajectory's frame axis
            across devices instead of replicating it — memory scaling for
            trajectories larger than one chip's HBM (lagged gathers become
            ICI collectives)
        progress_interval: print a progress line at least every N epochs
            (reference parity: tqdm per epoch, reference core.py:493). The
            default 0 reports once per dispatch chunk — hook-free runs are
            one chunk, so set this for long runs that need feedback.
            Nonzero values cap the multi-epoch dispatch size, costing one
            device round-trip per interval.
    """

    def __init__(
        self,
        traj_obj,
        pp_layer,
        model,
        model_path: str,
        learning_rate: float,
        load_model_filename: Optional[str],
        save_model_every_step: int,
        k: int,
        batch_size: int,
        num_epochs: int,
        test_ratio: float,
        optimizer_name: str,
        device=None,
        plot_class=None,
        plot_frequency: int = 0,
        verbose: bool = True,
        debug_mode: bool = True,
        *,
        mesh=None,
        seed: int = 0,
        split_indices=None,
        export_cv: bool = True,
        tensorboard: bool = True,
        profile_dir=None,
        shard_trajectory: bool = False,
        progress_interval: int = 0,
    ):
        self.traj_obj = traj_obj
        self.preprocessing_layer = pp_layer
        self.learning_rate = learning_rate
        self.batch_size = batch_size
        self.num_epochs = num_epochs
        self.test_ratio = test_ratio
        self.k = k
        self.model = model
        self.load_model_filename = load_model_filename
        self.save_model_every_step = save_model_every_step
        self.model_path = model_path
        self.optimizer_name = optimizer_name
        self.device = self._resolve_device(device)
        self.mesh = mesh
        self.plot_class = plot_class
        self.plot_frequency = plot_frequency
        self.verbose = verbose
        self.debug_mode = debug_mode
        # seed=None means "a random split" — resolved to a concrete seed
        # HERE so the split is genuinely fixed at construction (prepared
        # batch data is cached across train() calls; a per-call re-split
        # would silently be frozen at the first call anyway)
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        self.seed = seed
        self.split_indices = split_indices
        self.export_cv = export_cv
        self.profile_dir = profile_dir
        self.shard_trajectory = bool(shard_trajectory)
        self.progress_interval = int(progress_interval)
        self.epoch_times: list = []

        self.model_name = type(self).__name__
        self._export_cache: dict = {}

        if self.verbose:
            print(f"\n[Info] Log directory: {self.model_path}\n", flush=True)

        self.writer = MetricsWriter(self.model_path, enabled=tensorboard)

    # ------------------------------------------------------------------
    @staticmethod
    def _resolve_device(device):
        if device is None or isinstance(device, jax.Device):
            return device
        kind = device if isinstance(device, str) else None
        if kind is None:
            # tolerate torch.device-style objects with a .type attribute
            kind = getattr(device, "type", None)
        if isinstance(kind, str) and kind.startswith("cuda:"):
            kind = "cuda"  # torch-style indexed device string
        if kind == "cuda":
            import warnings

            warnings.warn(
                "device 'cuda' requested; this framework targets TPU — "
                "remapping to the 'tpu' backend"
            )
            kind = "tpu"
        if kind is None:
            return None
        try:
            return jax.devices(kind)[0]
        except RuntimeError:
            import warnings

            warnings.warn(
                f"device kind '{kind}' unavailable on this platform; "
                "using the default device"
            )
            return None

    @staticmethod
    def _protect(tree):
        """Copy array leaves before they are donated into the jitted epoch
        functions, so user-held references (the initial model object, a
        loaded checkpoint) are never invalidated by buffer donation."""
        import jax.numpy as jnp

        return jax.tree_util.tree_map(
            lambda a: jnp.array(a, copy=True), tree
        )

    def _place_replicated(self, tree):
        if self.mesh is not None:
            return replicate(tree, self.mesh)
        if self.device is not None:
            return jax.device_put(tree, self.device)
        return jax.device_put(tree)

    def _place_batched(self, tree):
        if self.mesh is not None:
            return shard_batches(tree, self.mesh)
        if self.device is not None:
            return jax.device_put(tree, self.device)
        return jax.device_put(tree)

    # ------------------------------------------------------------------
    def init_model_and_optimizer(self):
        r"""Initialize :attr:`model` and :attr:`optimizer`
        (reference: colvarsfinder/core.py:145-166).

        Loads a previous checkpoint when :attr:`load_model_filename` points
        to an existing file (non-strict), then builds an optax Adam or SGD.
        """
        if self.load_model_filename:
            if os.path.isfile(self.load_model_filename):
                self.model = load_pytree(self.model, self.load_model_filename)
                if self.verbose:
                    print(
                        "model parameters loaded from: "
                        f"{self.load_model_filename}"
                    )
            else:
                if self.verbose:
                    print(f"model file not found: {self.load_model_filename}")

        self.optimizer = self._build_optimizer()
        self.opt_state = self.optimizer.init(self.model)

    def _build_optimizer(self):
        return self.make_optimizer(self.optimizer_name, self.learning_rate)

    # bound on each compiled-program cache: hyperparameter sweeps put the
    # swept values (lr, loss constants) in the key, and unbounded caches
    # would pin every compiled executable for the life of the process
    EPOCH_FN_CACHE_MAX = 64

    @staticmethod
    def compile_multi_epoch(cache: dict, key, length: int, epoch_body):
        """Build (or fetch) the jitted `length`-epoch program scanning
        ``epoch_body(model, opt_state, *data)`` — the shared scaffolding of
        all three tasks' compiled-program caches. Stores ``(jitted, impl)``
        so the replica ensemble can vmap the un-jitted impl. Evicts the
        oldest entry beyond :attr:`EPOCH_FN_CACHE_MAX` (dicts preserve
        insertion order)."""
        cached = cache.get(key)
        if cached is not None:
            return cached[0]

        def multi_impl(model, opt_state, *data):
            def body(carry, _):
                model, opt_state = carry
                model, opt_state, tr, te = epoch_body(
                    model, opt_state, *data
                )
                return (model, opt_state), (tr, te)

            (model, opt_state), (train_ms, test_ms) = jax.lax.scan(
                body, (model, opt_state), None, length=length
            )
            return model, opt_state, train_ms, test_ms

        fn = jax.jit(multi_impl, donate_argnums=(0, 1))
        while len(cache) >= TrainingTask.EPOCH_FN_CACHE_MAX:
            cache.pop(next(iter(cache)))
        cache[key] = (fn, multi_impl)
        return fn

    @staticmethod
    def make_optimizer(name: str, learning_rate: float | None = None):
        """Optax optimizer from (name, lr) — also used by the shared
        compiled-epoch-program caches, where optimizers are reconstructed
        from hashable config instead of captured from a task instance.

        Two modes:

        * ``learning_rate=None`` (the ENSEMBLE/SWEEP mode): the rate is
          wrapped with ``optax.inject_hyperparams`` so it lives in the
          optimizer STATE (a traced array) — a replica-ensemble vmap
          carries a per-replica lr through one compiled program.
        * ``learning_rate=<float>`` (the SOLO mode): a plain static-lr
          optimizer. ``inject_hyperparams`` measured a consistent
          **1.47x step cost** on dispatch-scale configs (the 2D toy
          AE, same-process interleaved A/B — the real cause of the
          round-3 "toy-config regression"; benchmarks/RESULTS.md round
          4), so single-task compiled programs bake the lr in (one
          executable per lr value, as in round 2) and only the
          ensemble paths pay for the traced rate.

        The two modes' ADAM states are structurally compatible: the
        injected state's ``inner_state`` IS the static state
        (:meth:`unwrap_opt_state` / the ensemble's wrap inverse).
        """
        if name.lower() == "adam":
            # matches torch.optim.Adam defaults: betas=(0.9, 0.999),
            # eps applied outside the sqrt of the bias-corrected second moment
            if learning_rate is None:
                return optax.inject_hyperparams(optax.adam)(
                    1.0, b1=0.9, b2=0.999, eps=1e-8
                )
            return optax.adam(
                float(learning_rate), b1=0.9, b2=0.999, eps=1e-8
            )
        if learning_rate is None:
            return optax.inject_hyperparams(optax.sgd)(1.0)
        return optax.sgd(float(learning_rate))

    @staticmethod
    def unwrap_opt_state(opt_state):
        """The static-optimizer state inside an injected-hyperparams
        state (identity for already-static states) — the bridge from
        ensemble/sweep results back to a solo task's optimizer."""
        import optax

        injected = (
            optax.InjectHyperparamsState,
            optax.InjectStatefulHyperparamsState,
        )
        if isinstance(opt_state, injected):
            return opt_state.inner_state
        return opt_state

    @staticmethod
    def set_learning_rate(opt_state, learning_rate):
        """New optimizer state with the injected learning rate replaced —
        the per-replica knob for mixed-hyperparameter sweeps."""
        import jax.numpy as jnp

        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(
            learning_rate, dtype=jnp.asarray(hp["learning_rate"]).dtype
        )
        return opt_state._replace(hyperparams=hp)

    # ------------------------------------------------------------------
    def _make_split(self, n: int, candidates=None):
        """Train/test split of range(n) (reference core.py:465-468, :672).

        Uses sklearn's ``train_test_split`` on index arrays so the reference
        semantics (shuffled split, then shuffle=False loaders over the split
        order) are preserved; ``split_indices`` overrides for parity runs.
        The reference's duplicated-split quirk (core.py:465-468) is
        deliberately not reproduced.

        ``candidates`` restricts the sampled index pool (multi-trajectory
        datasets: only lagged-pair start frames that stay within one
        source segment, ``WeightedTrajectory.valid_lagged_starts``).
        """
        if self.split_indices is not None:
            train_idx, test_idx = self.split_indices
            return np.asarray(train_idx), np.asarray(test_idx)
        from sklearn.model_selection import train_test_split

        idx = np.arange(n) if candidates is None else np.asarray(candidates)
        if idx.size < 2:
            raise ValueError(
                "not enough lagged-pair start frames to split "
                f"({idx.size}); segments shorter than lag_idx+1 frames "
                "contribute no pairs"
            )
        train_idx, test_idx = train_test_split(
            idx, test_size=self.test_ratio, random_state=self.seed
        )
        return train_idx, test_idx

    def _lagged_split(self, lag_idx: int):
        """Split over valid lagged-pair start frames: all of
        ``range(n - lag)`` for a contiguous trajectory, segment-interior
        starts for a concatenated multi-trajectory dataset."""
        n = self._traj_np.shape[0]
        segs = getattr(self.traj_obj, "segment_starts", None)
        if segs is None:
            return self._make_split(n - lag_idx)
        return self._make_split(
            n - lag_idx, candidates=self.traj_obj.valid_lagged_starts(lag_idx)
        )

    def _print_train_banner(self, train_b: np.ndarray, test_b: np.ndarray):
        """Print the pre-training summary shared by all tasks (the reference
        printed an equivalent block at the top of each train(); this is the
        framework's own wording). Suppressed when ``verbose=False`` so
        repeated train() calls (autotuning, sweeps) stay quiet."""
        if not self.verbose:
            return
        nb_tr, bs_tr = train_b.shape
        nb_te, bs_te = test_b.shape
        print(
            f"\n=== training: {self.num_epochs} epochs ===\n"
            f"  train split: {nb_tr * bs_tr} samples -> {nb_tr} batches of "
            f"{bs_tr} ({nb_tr * self.num_epochs} steps total)\n"
            f"  test split:  {nb_te * bs_te} samples -> {nb_te} batches of "
            f"{bs_te}",
            flush=True,
        )

    def _next_chunk(self, epoch: int) -> int:
        """Epochs until the next host-side event fires (inclusive):
        checkpoint, plot hook, or progress report. All epochs in between
        run as ONE jitted multi-epoch dispatch."""
        remaining = self.num_epochs - epoch
        chunk = remaining
        for period in (
            self.save_model_every_step,
            self.plot_frequency,
            self.progress_interval,
        ):
            if period and period > 0:
                until = period - (epoch % period)
                chunk = min(chunk, until)
        return max(1, chunk)

    def _print_progress(
        self, epoch_done: int, train_loss: float, chunk_time: float
    ) -> None:
        """One line per dispatch chunk: epoch counter, last train loss,
        per-epoch rate, and remaining-time estimate (the chunked-execution
        stand-in for the reference's per-epoch tqdm bar, core.py:493)."""
        if not self.verbose:
            return
        remaining = self.num_epochs - epoch_done
        eta = remaining * chunk_time
        eta_txt = f", eta {eta:.1f} s" if remaining else ""
        print(
            f"[{self.model_name}] epoch {epoch_done}/{self.num_epochs}  "
            f"train loss {train_loss:.6g}  "
            f"({chunk_time * 1e3:.1f} ms/epoch{eta_txt})",
            flush=True,
        )

    # STREAMING layout (data larger than HBM): above this estimated
    # device-resident data size, tasks auto-switch to host-resident data
    # with per-batch host gathers -> async device_put -> jitted donated
    # steps. Leaves headroom on a 16 GB chip for model/optimizer state,
    # activations, and the in-flight batch buffers.
    STREAMING_AUTO_LIMIT_BYTES = 8 << 30

    def _resolve_streaming(self, streaming, device_bytes: int) -> bool:
        """Decide the streaming layout: explicit ``streaming=`` wins;
        ``None`` auto-enables when the device-resident layout would
        exceed :attr:`STREAMING_AUTO_LIMIT_BYTES` (and no mesh is set —
        a mesh defaults to ``shard_trajectory`` for capacity scaling).
        Explicit ``streaming=True`` MAY combine with a mesh: the
        host-streamed batches are then sharded along their batch axis
        and the step runs SPMD (>host-HBM data on multiple chips)."""
        if streaming is None:
            streaming = (
                device_bytes > self.STREAMING_AUTO_LIMIT_BYTES
                and self.mesh is None
                and not self.shard_trajectory
            )
        streaming = bool(streaming)
        if streaming:
            assert not self.shard_trajectory, (
                "streaming=True keeps the trajectory on the HOST; it "
                "cannot combine with shard_trajectory (device-resident "
                "frame sharding). Pick one >HBM strategy."
            )
            if self.mesh is not None:
                # streaming + mesh = per-batch data parallelism: each
                # host-gathered batch is device_put SHARDED along its
                # batch axis, and the jitted step runs SPMD (XLA turns
                # the losses' weighted reductions into psums over ICI)
                n_dev = int(self.mesh.devices.size)
                assert self.batch_size % n_dev == 0, (
                    f"streaming with a mesh shards each batch across "
                    f"the {n_dev} devices: batch_size "
                    f"({self.batch_size}) must be divisible by the "
                    "mesh size"
                )
        return streaming

    # tri-state override of the unrolled-vs-scanned prebatched epoch
    # body (None = per-family PREBATCH_UNROLL_LIMIT heuristic); honored
    # by the families that expose ``unroll_batches`` in their
    # constructors (EigenFunctionTask, CommittorTask)
    _unroll_override: bool | None = None

    def relayout(self, *, unroll: bool) -> None:
        """Switch the prebatched epoch-body layout (unrolled per-batch
        arrays vs stacked+scanned) and drop the prepared-data cache so
        the next ``train()``/ensemble call rebuilds it. Loss
        trajectories are identical across layouts; only compile time,
        per-step dispatch cost, and — crucially for wide vmapped
        sweeps — buffer LIVENESS differ: the scanned body keeps one
        step's buffers live at a time, which is what lets R=64
        generator-loss sweeps fit in a 16 GB chip
        (benchmarks/RESULTS.md, generator sweeps)."""
        self._unroll_override = bool(unroll)
        if hasattr(self, "_prepared_data_cache"):
            del self._prepared_data_cache

    @staticmethod
    def _chunked_apply(fn, arr, chunk: int = 65536):
        """Apply a device function over axis 0 in fixed-size chunks,
        returning host numpy — the streaming replacement for a
        whole-trajectory device call (eager preprocessing of data larger
        than HBM). The last partial chunk compiles once more."""
        import jax.numpy as jnp

        jfn = jax.jit(fn)
        n = arr.shape[0]
        outs = [
            np.asarray(jfn(jnp.asarray(arr[s:s + chunk])))
            for s in range(0, n, chunk)
        ]
        return np.concatenate(outs, axis=0)

    #: prefetch depth of the streaming pipeline (class default; set the
    #: ``stream_prefetch`` attribute on a task instance to override).
    #: 0 = fully synchronous gather->transfer->dispatch loop.
    STREAM_PREFETCH_DEPTH = 2

    #: max dispatched-but-unfinished streaming steps (class default; set
    #: the ``stream_inflight`` attribute on a task instance to override).
    #: Bounds host memory pinned by queued H2D transfers on async
    #: backends; 32 steps ≈ 32 x batch bytes of in-flight buffers.
    STREAM_INFLIGHT_STEPS = 32

    #: parallel H2D transfer workers in the streaming pipeline (class
    #: default; set ``stream_transfer_workers`` on an instance to
    #: override). Transfers release the GIL; on a latency-bound tunnel
    #: several in-flight puts overlap, on local PCIe/ICI 1-2 suffice.
    STREAM_TRANSFER_WORKERS = 4

    def _sorted_gather(self, arr) -> bool:
        """Should a streaming host gather SORT its frame indices first?

        The batch losses are weighted means — permutation-invariant
        within a batch — so gather order is a free choice. For a
        memory-mapped trajectory, sorted indices turn 20k random page
        touches across a >HBM file into one quasi-sequential sweep
        (measured ~2x pack throughput cold-cache); for in-RAM arrays the
        unsorted reference order is kept so streaming remains bitwise
        identical to the in-memory layouts. Override with the
        ``stream_sorted_gather`` attribute (True/False)."""
        ov = getattr(self, "stream_sorted_gather", None)
        if ov is not None:
            return bool(ov)
        seen = 0
        while isinstance(arr, np.ndarray) and seen < 8:
            if isinstance(arr, np.memmap):
                return True
            arr = arr.base
            seen += 1
        return False

    #: coalesce each streamed batch into ONE contiguous host buffer per
    #: dtype before the H2D transfer (unpacked by slice/reshape inside
    #: the jitted step — free under fusion). On a latency-bound link
    #: this replaces 4-5 per-leaf transfers with 1-2. Class default;
    #: set ``stream_pack_transfers`` on an instance to override.
    #: Automatically disabled with a mesh (the packed buffer has no
    #: single batch axis to shard).
    STREAM_PACK_TRANSFERS = True

    def _stream_epochs(
        self, chunk, model, opt_state, extra, step_fn, eval_fn,
        pack_train, pack_test, train_b, test_b,
    ):
        """Run ``chunk`` epochs in the STREAMING layout: the data stays on
        the HOST (numpy — possibly a ``np.memmap`` over a decoded
        trajectory file), each batch is gathered on the host and
        ``device_put`` just-in-time, and the jitted per-batch ``step_fn``
        donates model/opt_state.

        The loop is an explicit THREE-stage software pipeline
        (``stream_prefetch`` > 0, the default): a gather thread packs
        batch *i+2* from the memmap (host memcpy / page-cache reads), a
        transfer thread ``device_put``s batch *i+1* (H2D releases the
        GIL, so both host stages overlap even on one core), and the main
        thread dispatches step *i* (async — the device computes behind
        it). The batch schedule is identical every epoch (shuffle=False
        reference semantics), so the pipeline also stays full across
        epoch boundaries. Measured on the TPU tunnel this hides most of
        the host gather + H2D cost behind device compute
        (benchmarks/streaming_bench.py).

        Returns ``(model, opt_state, train_cm, test_cm)`` with metric
        arrays shaped ``[chunk, nb, ...]`` — the same contract as the
        compiled multi-epoch programs, so callers' metric handling is
        layout-independent.
        """
        import queue as _queue
        import threading

        import jax.numpy as jnp

        dev = self.device
        if self.mesh is not None:
            # streaming + mesh: each batch is placed SHARDED along its
            # leading (batch) axis; the jitted step then runs SPMD
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            _axis = self.mesh.axis_names[0]

            def _put(batch):
                def one(x):
                    spec = [None] * np.ndim(x)
                    if np.ndim(x) >= 1:
                        spec[0] = _axis
                    return jax.device_put(
                        x, NamedSharding(self.mesh, _P(*spec))
                    )

                return jax.tree_util.tree_map(one, batch)
        else:
            def _put(batch):
                return jax.device_put(batch, dev)
        depth = int(
            getattr(self, "stream_prefetch", self.STREAM_PREFETCH_DEPTH)
        )
        packs = {"train": pack_train, "test": pack_test}

        # transfer coalescing: ship each batch as ONE contiguous buffer
        # per dtype and slice/reshape back inside the jitted step (free
        # under XLA fusion). On a latency-bound tunnel this replaces 4-5
        # per-leaf puts with 1-2 (benchmarks/streaming_bench.py).
        pack_xfer = self.mesh is None and bool(
            getattr(self, "stream_pack_transfers",
                    self.STREAM_PACK_TRANSFERS)
        )
        # opt-in H2D WIRE dtype for float32 payloads ('float16' halves
        # the bytes on a bandwidth-bound link; coordinates round to
        # ~1e-3 relative — an input-precision choice, not an arithmetic
        # mode: the step upcasts to float32 on arrival)
        wire = getattr(self, "stream_wire_dtype", None)
        if wire is not None:
            wire = np.dtype(wire).name
            assert wire in ("float16", "bfloat16"), wire
            assert pack_xfer, (
                "stream_wire_dtype requires the packed-transfer path "
                "(stream_pack_transfers=True, no mesh)"
            )
        use_step, use_eval = step_fn, eval_fn
        if pack_xfer:
            specs: dict = {}
            real_packs = packs

            def _host_pack(kind, rows):
                batch = real_packs[kind](rows)
                leaves, treedef = jax.tree_util.tree_flatten(batch)
                leaves = [np.asarray(x) for x in leaves]
                spec = specs.get(kind)
                if spec is None:
                    shapes = tuple(x.shape for x in leaves)
                    dtypes = tuple(x.dtype.name for x in leaves)
                    by_dt: dict = {}
                    for i, dt in enumerate(dtypes):
                        by_dt.setdefault(dt, []).append(i)
                    groups = tuple(
                        (dt, tuple(ix)) for dt, ix in sorted(by_dt.items())
                    )
                    spec = (treedef, shapes, groups)
                    specs[kind] = spec
                _, shapes, groups = spec
                bufs = tuple(
                    leaves[ix[0]].ravel() if len(ix) == 1 else
                    np.concatenate([leaves[i].ravel() for i in ix])
                    for _, ix in groups
                )
                if wire is not None:
                    import ml_dtypes

                    wdt = (np.float16 if wire == "float16"
                           else ml_dtypes.bfloat16)
                    bufs = tuple(
                        b.astype(wdt) if b.dtype == np.float32 else b
                        for b in bufs
                    )
                return bufs

            def _wrapped(kind, fn, donate):
                spec = specs[kind]
                key = (fn, wire) + spec
                cached = _PACKED_FN_CACHE.get(key)
                if cached is not None:
                    return cached
                treedef, shapes, groups = spec

                def unpack(bufs):
                    import jax.numpy as jnp

                    leaves = [None] * len(shapes)
                    for (gdt, ix), buf in zip(groups, bufs):
                        if wire is not None and gdt == "float32":
                            buf = buf.astype(jnp.float32)
                        off = 0
                        for i in ix:
                            size = int(np.prod(shapes[i], dtype=np.int64))
                            leaves[i] = buf[off:off + size].reshape(
                                shapes[i]
                            )
                            off += size
                    return jax.tree_util.tree_unflatten(treedef, leaves)

                if donate:
                    w = jax.jit(
                        lambda m, o, *a: fn(m, o, *a[:-1], unpack(a[-1])),
                        donate_argnums=(0, 1),
                    )
                else:
                    w = jax.jit(
                        lambda m, *a: fn(m, *a[:-1], unpack(a[-1]))
                    )
                while len(_PACKED_FN_CACHE) >= _PACKED_FN_CACHE_MAX:
                    _PACKED_FN_CACHE.pop(next(iter(_PACKED_FN_CACHE)))
                _PACKED_FN_CACHE[key] = w
                return w

            packs = {
                k: (lambda kind: lambda rows: _host_pack(kind, rows))(k)
                for k in real_packs
            }

            def use_step(model, opt_state, *rest):
                return _wrapped("train", step_fn, True)(
                    model, opt_state, *rest
                )

            def use_eval(model, *rest):
                return _wrapped("test", eval_fn, False)(model, *rest)

        def schedule():
            for _ in range(chunk):
                for rows in train_b:
                    yield "train", rows
                for rows in test_b:
                    yield "test", rows

        if depth > 0:
            # H2D transfers release the GIL and a tunneled backend has
            # per-transfer LATENCY, so several put workers overlap their
            # in-flight transfers (measured transfer-bound streaming
            # epochs; benchmarks/streaming_bench.py). Results re-order
            # by sequence number so the training order is unchanged.
            n_put = max(1, int(getattr(
                self, "stream_transfer_workers",
                self.STREAM_TRANSFER_WORKERS,
            )))
            # strict round-robin: worker w owns seqs with seq % n_put ==
            # w, via bounded per-worker in/out queues. The consumer reads
            # qs_out[i % n_put] in order — ordering is restored with no
            # reorder buffer, and every stage has natural backpressure
            # (a shared work queue + semaphore was deadlock-prone: fast
            # workers could exhaust the in-flight budget while the
            # worker holding the next-needed seq starved)
            qs_in = [_queue.Queue(maxsize=max(1, depth))
                     for _ in range(n_put)]
            qs_out = [_queue.Queue(maxsize=max(1, depth))
                      for _ in range(n_put)]

            def _gather():
                seq = 0
                try:
                    for kind, rows in schedule():
                        qs_in[seq % n_put].put((kind, packs[kind](rows)))
                        seq += 1
                    for q in qs_in:
                        q.put(None)
                except BaseException as e:  # surfaced by the consumer
                    # deliver into the NEXT ordered queue: the consumer
                    # is guaranteed to reach exactly this position
                    qs_in[seq % n_put].put(e)

            def _transfer(w):
                while True:
                    item = qs_in[w].get()
                    if item is None or isinstance(item, BaseException):
                        qs_out[w].put(item)
                        return
                    kind, host_batch = item
                    try:
                        qs_out[w].put((kind, _put(host_batch)))
                    except BaseException as e:
                        qs_out[w].put(e)
                        return

            threading.Thread(target=_gather, daemon=True).start()
            for w in range(n_put):
                threading.Thread(
                    target=_transfer, args=(w,), daemon=True
                ).start()

            def batches():
                i = 0
                while True:
                    item = qs_out[i % n_put].get()
                    if item is None:
                        return
                    if isinstance(item, BaseException):
                        raise item
                    yield item
                    i += 1
        else:
            def batches():
                for kind, rows in schedule():
                    yield kind, _put(packs[kind](rows))

        from collections import deque

        train_cms, test_cms = [], []
        ms, tms = [], []
        nb_train, nb_test = len(train_b), len(test_b)
        # FLOW CONTROL: async dispatch means the host can run thousands
        # of steps ahead of the device, and every streamed batch in that
        # gap pins host-side transfer buffers (measured: a whole 8.9k-
        # batch epoch queued at once held ~45 GB on the tunnel backend).
        # Bound the in-flight window with a HOST FETCH of the metric
        # from STREAM_INFLIGHT_STEPS ago — np.asarray, not
        # block_until_ready, which has been observed returning early on
        # the tunnel backend (benchmarks/RESULTS.md timing-methodology
        # note). One small fetch per window step: zero cost when the
        # device keeps up, bounded memory when it doesn't.
        inflight: deque = deque()
        window = int(getattr(self, "stream_inflight",
                             self.STREAM_INFLIGHT_STEPS))
        emitted = 0
        for kind, batch in batches():
            if kind == "train":
                model, opt_state, m = use_step(
                    model, opt_state, *extra, batch
                )
                ms.append(m)
                latest = m
            else:
                latest = use_eval(model, *extra, batch)
                tms.append(latest)
            emitted += 1
            if emitted % window == 0:
                inflight.append(latest)
                if len(inflight) > 1:
                    # fetch the metric from `window` steps ago: caps
                    # dispatched-but-unfinished steps at ~2x window
                    np.asarray(inflight.popleft())
            if len(ms) == nb_train and len(tms) == nb_test:
                train_cms.append(jnp.stack(ms))
                test_cms.append(jnp.stack(tms))
                ms, tms = [], []
        return model, opt_state, jnp.stack(train_cms), jnp.stack(test_cms)

    @staticmethod
    def _make_batches(indices: np.ndarray, batch_size: int) -> np.ndarray:
        """[num_batches, batch] index matrix with drop_last=True,
        shuffle=False semantics (reference core.py:472-481)."""
        if len(indices) == 0:
            raise ValueError(
                "empty data split — check test_ratio against the dataset "
                "size (the reference silently produced an empty DataLoader "
                "here, core.py:483)"
            )
        bs = min(batch_size, len(indices))
        nb = len(indices) // bs
        return np.asarray(indices[: nb * bs], dtype=np.int32).reshape(nb, bs)

    # ------------------------------------------------------------------
    def save_model(self, epoch: int, description: str = "latest"):
        r"""Save the model and CV deployment artifacts
        (reference: colvarsfinder/core.py:168-227).

        Writes ``model.npz`` (state dict replacement), per-CV plain-text
        parameter dumps, and — via :func:`colvarsfinder_tpu.export
        .export_colvar` — the StableHLO CV program replacing TorchScript.
        """
        if self.verbose:
            print(f"\n\nEpoch={epoch}:")

        if self.debug_mode:
            snap_dir = f"{self.model_path}/models"
            os.makedirs(snap_dir, exist_ok=True)
            save_pytree(self.model, f"{snap_dir}/model_{epoch}.npz")

        model_save_dir = f"{self.model_path}/{description}"
        os.makedirs(model_save_dir, exist_ok=True)

        model_filename = f"{model_save_dir}/model.npz"
        save_pytree(self.model, model_filename)

        # per-CV text dumps (reference core.py:203-208)
        for idx in range(self.k):
            param_vec = self.model.get_params_of_cv(idx)
            for name, param in param_vec:
                fname = "%s/%d_" % (model_save_dir, idx) + name.replace(
                    ".", "_"
                ) + ".txt"
                np.savetxt(fname, np.atleast_1d(np.asarray(param)))

        if self.verbose:
            print(f"  trained model saved at:\n\t{model_filename}")

        cv = self.colvar_model()
        example = np.asarray(self.traj_obj.trajectory[:1], dtype=np.float32)
        export_colvar(
            cv,
            example,
            model_save_dir,
            write_stablehlo=self.export_cv,
            _exported_cache=self._export_cache,
        )
        if self.verbose and self.export_cv:
            print(
                "  exported CV program saved at:\n\t"
                f"{model_save_dir}/cv_exported.bin\n",
                flush=True,
            )

        # full training state (model + optimizer moments + epoch) — a
        # resume capability the reference lacks (its restart loses optimizer
        # state and the epoch counter; reference core.py:156-161)
        self.save_training_state(epoch, f"{model_save_dir}/train_state.npz")

    def save_training_state(self, epoch: int, filename: str) -> None:
        """Checkpoint model parameters, optimizer state, and epoch."""
        state = {
            "model": self.model,
            "opt_state": self.opt_state,
            "epoch": np.asarray(epoch, dtype=np.int64),
        }
        save_pytree(state, filename)

    def load_training_state(self, filename: str) -> int:
        """Restore model + optimizer state; returns the saved epoch."""
        state = {
            "model": self.model,
            "opt_state": self.opt_state,
            "epoch": np.asarray(0, dtype=np.int64),
        }
        state = load_pytree(state, filename)
        self.model = state["model"]
        self.opt_state = state["opt_state"]
        return int(state["epoch"])

    def release_device_data(self) -> None:
        """Drop the cached device-placed batch data.

        Tasks cache their prepared batch buffers across ``train()`` calls
        (re-placing them costs far more than the training compute through
        a tunneled device — see ``_prepare_data``). The cache lives for
        the task's lifetime; call this to free the HBM when keeping many
        trained tasks alive (e.g. large sweeps). The next ``train()``
        simply re-prepares the data.
        """
        self._prepared_data_cache = None

    # ------------------------------------------------------------------
    @abstractmethod
    def train(self):
        r"""Train the model (implemented by derived classes)."""

    @abstractmethod
    def colvar_model(self) -> ColvarModel:
        r"""Return the CV model built from :attr:`preprocessing_layer` and
        :attr:`model` (reference core.py:238-245)."""

    @abstractmethod
    def reg_model(self):
        r"""Return the regularizer model, or None."""
