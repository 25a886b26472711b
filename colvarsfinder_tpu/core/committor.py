r"""Committor-function training task (transition path theory).

Beyond the reference's three loss families: learns the committor
:math:`q(x) = P(\text{reach } B \text{ before } A \mid X_0 = x)` between
two metastable sets — the provably optimal one-dimensional reaction
coordinate — from the same weighted trajectory data the other tasks
consume, by minimizing the variational (Dirichlet-form) objective with
soft boundary penalties (see :func:`colvarsfinder_tpu.core.losses
.committor_loss`). The per-sample input gradients reuse the generator
eigenfunction path's single-jacrev-of-the-batch formulation, so the whole
epoch compiles to the same one-dispatch ``lax.scan`` execution model as
the other tasks (reference execution pattern being replaced:
colvarsfinder/core.py:493-561's per-batch Python loop).

The trained CV exposed by :meth:`CommittorTask.colvar_model` is the
pre-sigmoid logit :math:`g(r(x))` — a monotone transform of :math:`q`
with identical level sets, which keeps every deployment artifact
(StableHLO / numpy / TorchScript / PLUMED) working unchanged; committor
probabilities come from :meth:`CommittorTask.committor_values` or the
callable :meth:`CommittorTask.committor_fn`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import default_dtype
from ..export import ColvarModel
from ..logging_utils import losses_to_dataframe, profile_trace
from ..ops.features import as_pp_layer
from .losses import committor_loss
from .task import TrainingTask

__all__ = ["CommittorTask"]

_EPOCH_FN_CACHE: dict = {}

_METRIC_COLS = ["loss", "dirichlet", "boundary_a", "boundary_b"]


def _batch_metrics_fn(gram: bool):
    def batch_metrics(model, pp_layer, diag_coeff, hyper, batch):
        if gram:
            H, M, w, a, b = batch
            loss, (dirichlet, pa, pb) = committor_loss(
                model, pp_layer, H, w, a, b, hyper, None, pp_gram=M
            )
        else:
            loss, (dirichlet, pa, pb) = committor_loss(
                model, pp_layer, *batch, hyper, diag_coeff
            )
        return loss, jnp.stack([loss, dirichlet, pa, pb])

    return batch_metrics


def _multi_epoch_fn(length: int, opt_name: str, unroll: bool,
                    gram: bool = False, lr: float | None = None):
    from ..config import numerics_key

    key = ("committor", length, numerics_key(), opt_name, unroll,
           gram, lr)
    cached = _EPOCH_FN_CACHE.get(key)
    if cached is not None:
        return cached[0]
    # solo programs bake the lr in; lr=None = ensemble traced-rate
    # mode (RESULTS.md round 4: inject_hyperparams costs 1.47x on
    # dispatch-scale steps)
    optimizer = TrainingTask.make_optimizer(opt_name, lr)
    batch_metrics = _batch_metrics_fn(gram)

    if unroll:
        def epoch_body(
            model, opt_state, pp_layer, diag_coeff, hyper,
            train_batches, test_batches,
        ):
            train_m = []
            for batch in train_batches:
                (loss, metrics), grads = jax.value_and_grad(
                    batch_metrics, has_aux=True
                )(model, pp_layer, diag_coeff, hyper, batch)
                updates, opt_state = optimizer.update(grads, opt_state, model)
                model = optax.apply_updates(model, updates)
                train_m.append(metrics)
            test_m = [
                batch_metrics(model, pp_layer, diag_coeff, hyper, batch)[1]
                for batch in test_batches
            ]
            return model, opt_state, jnp.stack(train_m), jnp.stack(test_m)
    else:
        def epoch_body(
            model, opt_state, pp_layer, diag_coeff, hyper,
            train_data, test_data,
        ):
            def train_step(carry, batch):
                model, opt_state = carry
                (loss, metrics), grads = jax.value_and_grad(
                    batch_metrics, has_aux=True
                )(model, pp_layer, diag_coeff, hyper, batch)
                updates, opt_state = optimizer.update(grads, opt_state, model)
                model = optax.apply_updates(model, updates)
                return (model, opt_state), metrics

            (model, opt_state), train_m = jax.lax.scan(
                train_step, (model, opt_state), train_data
            )

            def eval_step(_, batch):
                return None, batch_metrics(
                    model, pp_layer, diag_coeff, hyper, batch
                )[1]

            _, test_m = jax.lax.scan(eval_step, None, test_data)
            return model, opt_state, train_m, test_m

    return TrainingTask.compile_multi_epoch(
        _EPOCH_FN_CACHE, key, length, epoch_body
    )


def _stream_fns(opt_name: str, lr: float | None = None):
    """Jitted per-batch ``(step, eval)`` pair for the STREAMING layout
    (trajectories larger than HBM) — vjp Dirichlet path only (the gram
    precompute is a device-resident layout); the step donates
    model/opt_state."""
    from ..config import numerics_key

    key = ("committor_stream", numerics_key(), opt_name, lr)
    cached = _EPOCH_FN_CACHE.get(key)
    if cached is not None:
        return cached

    optimizer = TrainingTask.make_optimizer(opt_name, lr)
    batch_metrics = _batch_metrics_fn(False)

    def step(model, opt_state, pp_layer, diag_coeff, hyper, batch):
        (loss, metrics), grads = jax.value_and_grad(
            batch_metrics, has_aux=True
        )(model, pp_layer, diag_coeff, hyper, batch)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, metrics

    def eval_one(model, pp_layer, diag_coeff, hyper, batch):
        return batch_metrics(model, pp_layer, diag_coeff, hyper, batch)[1]

    fns = (jax.jit(step, donate_argnums=(0, 1)), jax.jit(eval_one))
    while len(_EPOCH_FN_CACHE) >= TrainingTask.EPOCH_FN_CACHE_MAX:
        _EPOCH_FN_CACHE.pop(next(iter(_EPOCH_FN_CACHE)))
    _EPOCH_FN_CACHE[key] = fns
    return fns


def _multi_epoch_impl(length: int, opt_name: str, unroll: bool,
                      gram: bool = False):
    """Un-jitted multi-epoch program (for the replica-ensemble vmap)."""
    from ..config import numerics_key

    _multi_epoch_fn(length, opt_name, unroll, gram)  # lr=None mode
    key = ("committor", length, numerics_key(), opt_name, unroll,
           gram, None)
    return _EPOCH_FN_CACHE[key][1]


class CommittorTask(TrainingTask):
    r"""Learn the committor between metastable sets A and B.

    Args:
        traj_obj: a :class:`~colvarsfinder_tpu.utils.WeightedTrajectory`
            sampling the (possibly reweighted) Boltzmann distribution.
            The trajectory should VISIT both sets; frames outside A and B
            carry the Dirichlet term.
        pp_layer: preprocessing layer ``r`` (gradients flow through it,
            exactly as in the generator eigenfunction task).
        model: scalar-output network ``g`` (e.g.
            ``create_sequential_nn([d_r, 20, 20, 1])``); the committor is
            ``sigmoid(g(r(x)))``.
        model_path: checkpoint/metrics directory (same contract as the
            other tasks).
        region_a / region_b: the metastable sets — either boolean
            arrays over the trajectory's frames, or callables mapping the
            raw frame array [n, *state] to [n] booleans (evaluated once,
            on the host). Both must be non-empty and disjoint.
        alpha: boundary-penalty strength (traced: tasks differing only in
            alpha share compiled programs). Large enough that the
            boundary terms dominate the Dirichlet term near A/B.
        beta: inverse temperature of the target dynamics.
        diag_coeff: optional [d] diffusion diagonal (as in
            :class:`~colvarsfinder_tpu.core.EigenFunctionTask`'s
            generator mode).
        gram_pp: precompute the preprocessing layer's per-batch
            input-jacobian Gram so the per-step Dirichlet term is a
            quadratic form in the model-only jacobian (the generator
            gram path; default: on for a non-identity preprocessing
            layer under the unrolled layout).
        streaming: host/disk-resident data layout for trajectories
            larger than HBM (works directly on a ``np.memmap``): batches
            are gathered on the host and transferred just-in-time into a
            jitted donated step (vjp Dirichlet path; gram requires the
            device-resident layout). Default: auto above
            ``STREAMING_AUTO_LIMIT_BYTES``.
        (remaining arguments as in the other tasks)

    Attributes:
        train_loss_df / test_loss_df: per-epoch dataframes with columns
            ``loss, dirichlet, boundary_a, boundary_b``.
    """

    PREBATCH_UNROLL_LIMIT = 32
    GRAM_AUTO_LIMIT_BYTES = 4 << 30

    def __init__(
        self,
        traj_obj,
        pp_layer,
        model,
        model_path,
        region_a,
        region_b,
        alpha: float = 100.0,
        beta: float = 1.0,
        diag_coeff=None,
        gram_pp: bool | None = None,
        streaming: bool | None = None,
        unroll_batches: bool | None = None,
        learning_rate: float = 0.01,
        load_model_filename=None,
        save_model_every_step: int = 10,
        batch_size: int = 1000,
        num_epochs: int = 10,
        test_ratio: float = 0.2,
        optimizer_name: str = "Adam",
        device=None,
        plot_class=None,
        plot_frequency: int = 0,
        verbose: bool = True,
        debug_mode: bool = True,
        **kwargs,
    ):
        pp_layer = as_pp_layer(pp_layer)
        super().__init__(
            traj_obj, pp_layer, model, model_path, learning_rate,
            load_model_filename, save_model_every_step, 1,
            batch_size, num_epochs, test_ratio, optimizer_name, device,
            plot_class, plot_frequency, verbose, debug_mode, **kwargs,
        )
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.diag_coeff = (
            None if diag_coeff is None
            else jnp.asarray(np.asarray(diag_coeff), dtype=default_dtype())
        )
        self.init_model_and_optimizer()
        self._unroll = False
        # tri-state unrolled-vs-scanned epoch-body override (see
        # TrainingTask.relayout; the scanned body bounds buffer liveness
        # for wide vmapped sweeps)
        self._unroll_override = (
            None if unroll_batches is None else bool(unroll_batches)
        )
        # Gram-path Dirichlet term (losses.committor_loss pp_gram): the
        # preprocessing input-jacobian Gram is loop-invariant, so it is
        # precomputed per batch and the per-step Dirichlet term becomes
        # a quadratic form in the model-only jacobian — the same lever
        # as the generator eigen loss's gram_pp. Default: on for a
        # non-identity preprocessing layer under the unrolled layout
        # (resolved in _prepare_data).
        from ..ops.features import Identity

        if gram_pp is None:
            self._gram_requested = not isinstance(
                self.preprocessing_layer, Identity
            )
        else:
            self._gram_requested = bool(gram_pp)
        self._gram_explicit = gram_pp is not None
        self._gram = False

        # asanyarray: a np.memmap stays a memmap for the streaming layout
        raw = np.asanyarray(traj_obj.trajectory)
        traj_bytes = (
            int(np.prod(raw.shape, dtype=np.int64))
            * np.dtype(default_dtype()).itemsize
        )
        self._streaming = self._resolve_streaming(streaming, traj_bytes)
        self._traj = (
            raw if self._streaming
            else np.asarray(raw, dtype=default_dtype())
        )
        self._weights = np.asarray(traj_obj.weights, dtype=default_dtype())
        n = self._traj.shape[0]

        # output must be scalar (one committor)
        out = jax.eval_shape(
            lambda x: self.model(self.preprocessing_layer(x)),
            jax.ShapeDtypeStruct(
                (1,) + self._traj.shape[1:], default_dtype()
            ),
        )
        if len(out.shape) != 2 or int(out.shape[1]) != 1:
            raise ValueError(
                f"committor model must map [B, d_r] -> [B, 1], got output "
                f"shape {out.shape}"
            )

        self._mask_a = self._resolve_region(region_a, n, "region_a")
        self._mask_b = self._resolve_region(region_b, n, "region_b")
        if (self._mask_a * self._mask_b).any():
            raise ValueError("region_a and region_b overlap")

        if self.verbose:
            print(
                f"\ncommittor task: {n} frames, "
                f"{int(self._mask_a.sum())} in A, "
                f"{int(self._mask_b.sum())} in B\n",
                flush=True,
            )

    def _resolve_region(self, region, n: int, name: str) -> np.ndarray:
        if callable(region):
            mask = np.asarray(region(self._traj)).reshape(-1)
        else:
            mask = np.asarray(region).reshape(-1)
        if mask.shape[0] != n:
            raise ValueError(
                f"{name} yields {mask.shape[0]} values for {n} frames"
            )
        mask = mask.astype(bool)
        if not mask.any():
            raise ValueError(
                f"{name} matches no trajectory frame — the committor "
                "boundary condition cannot be imposed"
            )
        return mask.astype(default_dtype())

    # ------------------------------------------------------------------
    def colvar_model(self) -> ColvarModel:
        r"""The logit-committor CV ``g(r(x))`` (same level sets as q;
        every deployment artifact applies)."""
        return ColvarModel(self.preprocessing_layer, self.model)

    def reg_model(self):
        return None

    def committor_fn(self):
        """Callable ``q(X) = sigmoid(g(r(X)))`` on raw state batches."""
        cv = self.colvar_model()

        def q(X):
            return jax.nn.sigmoid(jnp.asarray(cv(X)))[:, 0]

        return q

    def committor_values(self, X) -> np.ndarray:
        """Committor probabilities on raw states [n, *state] -> [n]."""
        return np.asarray(self.committor_fn()(jnp.asarray(X)))

    # ------------------------------------------------------------------
    def _static_config(self):
        """Hashable tuple of everything baked into the compiled epoch
        program (alpha/beta/lr are traced; valid after
        :meth:`_prepare_data` decided the batch layout)."""
        return (self.optimizer_name.lower(), self._unroll, self._gram)

    def _prepare_data(self):
        cached = getattr(self, "_prepared_data_cache", None)
        if cached is not None:
            return cached
        n = self._traj.shape[0]
        train_idx, test_idx = self._make_split(n)

        train_b = self._make_batches(
            np.arange(len(train_idx)), self.batch_size
        )
        test_b = self._make_batches(np.arange(len(test_idx)), self.batch_size)

        # both boundary sets must survive the split and drop_last batching
        # — a training stream with no A (or B) frames zeroes that penalty
        # and the loss happily minimizes to a silently wrong committor
        used = np.asarray(train_idx)[np.asarray(train_b).reshape(-1)]
        for name, mask in (("region_a", self._mask_a),
                           ("region_b", self._mask_b)):
            if not mask[used].any():
                raise ValueError(
                    f"no {name} frame lands in the training batches "
                    f"(test_ratio/batch_size ate them all) — enlarge the "
                    f"region, lower test_ratio, or add boundary samples"
                )

        unroll = (
            self._unroll_override
            if self._unroll_override is not None and not self._streaming
            else len(train_b) + len(test_b) <= self.PREBATCH_UNROLL_LIMIT
        )
        self._unroll = unroll

        # resolve the Gram Dirichlet path (same conditions as the eigen
        # task's generator gram_pp: prebatched layout — unrolled OR
        # stacked+scanned — with the M tensors fitting in HBM; streaming
        # keeps data host-side, so no gram)
        self._gram = self._gram_requested and not self._streaming
        state_shape = tuple(self._traj.shape[1:])
        tot_dim = int(np.prod(state_shape))
        if self._gram:
            d_r = int(np.prod(jax.eval_shape(
                self.preprocessing_layer,
                jax.ShapeDtypeStruct((1,) + state_shape, self._traj.dtype),
            ).shape[1:]))
            n_rows = sum(len(np.asarray(r).reshape(-1))
                         for r in list(train_b) + list(test_b))
            m_bytes = n_rows * d_r * d_r * self._traj.itemsize
            if m_bytes > self.GRAM_AUTO_LIMIT_BYTES:
                self._gram = False
        if self._gram_requested and self._gram_explicit and not self._gram:
            import warnings

            warnings.warn(
                "gram_pp=True could not be honored (it requires the "
                "prebatched layout with Gram tensors within "
                "GRAM_AUTO_LIMIT_BYTES; streaming keeps data host-side); "
                "training backprops through the preprocessing layer "
                "instead"
            )

        if self._streaming:
            # STREAMING layout: trajectory stays host-resident (no
            # whole-split gathered copy); batches are gathered
            # just-in-time in train()
            self._unroll = False
            self._stream_split = (
                np.asarray(train_idx), np.asarray(test_idx)
            )
            self._prepared_data_cache = (None, False, train_b, test_b)
            return self._prepared_data_cache

        def gather(idx):
            return (
                self._traj[idx], self._weights[idx],
                self._mask_a[idx], self._mask_b[idx],
            )

        tr = gather(train_idx)
        te = gather(test_idx)

        if unroll:
            if self.mesh is not None:
                from ..parallel.mesh import shard_frames

                place = lambda t: shard_frames(t, self.mesh)  # noqa: E731
            else:
                place = self._place_batched
            if self._gram:
                from .eigenfunction import _gram_fn

                gf = _gram_fn(state_shape, tot_dim)
                diag_d = (
                    jnp.ones((tot_dim,), default_dtype())
                    if self.diag_coeff is None else self.diag_coeff
                )

                def pack(arrs, row):
                    Xf = jnp.asarray(
                        arrs[0][row].reshape(len(row), -1)
                    )
                    H, M = gf(self.preprocessing_layer, diag_d, Xf)
                    return (H, M, arrs[1][row], arrs[2][row], arrs[3][row])

                data_args = (
                    place(tuple(pack(tr, row) for row in train_b)),
                    place(tuple(pack(te, row) for row in test_b)),
                )
            else:
                data_args = (
                    place(tuple(
                        tuple(a[row] for a in tr) for row in train_b
                    )),
                    place(tuple(
                        tuple(a[row] for a in te) for row in test_b
                    )),
                )
        elif self._gram:
            from .eigenfunction import _gram_fn

            gf = _gram_fn(state_shape, tot_dim)
            diag_d = (
                jnp.ones((tot_dim,), default_dtype())
                if self.diag_coeff is None else self.diag_coeff
            )

            def pack_gram_stacked(arrs, rows):
                # gf per batch ROW keeps the basis-JVP transient
                # ([tot_dim, n_rows, d_r]) at per-batch scale; a
                # split-wide call is nb x larger and can OOM data prep
                # in exactly the HBM-pressure regime the scanned layout
                # exists for (same fix as the eigen task's)
                shape = tuple(np.shape(rows))
                Hs, Ms = [], []
                for row in np.asarray(rows):
                    bd = row.reshape(-1)
                    Xf = jnp.asarray(arrs[0][bd].reshape(len(bd), -1))
                    H, M = gf(self.preprocessing_layer, diag_d, Xf)
                    Hs.append(H)
                    Ms.append(M)
                bd_all = np.asarray(rows).reshape(-1)
                return (
                    jnp.stack(Hs),
                    jnp.stack(Ms),
                    jnp.asarray(arrs[1][bd_all]).reshape(shape),
                    jnp.asarray(arrs[2][bd_all]).reshape(shape),
                    jnp.asarray(arrs[3][bd_all]).reshape(shape),
                )

            data_args = (
                self._place_batched(pack_gram_stacked(tr, train_b)),
                self._place_batched(pack_gram_stacked(te, test_b)),
            )
        else:
            def stack(arrs, rows):
                return tuple(
                    self._place_batched(
                        a[rows.reshape(-1)].reshape(
                            rows.shape + a.shape[1:]
                        )
                    )
                    for a in arrs
                )

            data_args = (stack(tr, train_b), stack(te, test_b))
        self._prepared_data_cache = (data_args, unroll, train_b, test_b)
        return self._prepared_data_cache

    def _stream_pack(self, split: int, rows):
        """Host gather of one batch for the streaming layout (split 0 =
        train, 1 = test); casts memmap frames to the compute dtype."""
        sel = self._stream_split[split][np.asarray(rows)]
        if self._sorted_gather(self._traj):
            sel = np.sort(sel)  # quasi-sequential memmap sweep; the
            # batch losses are permutation-invariant (_sorted_gather)
        return (
            np.asarray(self._traj[sel], dtype=default_dtype()),
            self._weights[sel],
            self._mask_a[sel],
            self._mask_b[sel],
        )

    def _hyper(self):
        dt = default_dtype()
        return (jnp.asarray(self.alpha, dt), jnp.asarray(self.beta, dt))

    def train(self):
        r"""Train the committor (same chunked one-dispatch execution model
        as the other tasks)."""
        data_args, unroll, train_b, test_b = self._prepare_data()

        model = self._place_replicated(self._protect(self.model))
        opt_state = self._place_replicated(self._protect(self.opt_state))
        pp_dev = self._place_replicated(self.preprocessing_layer)

        self._print_train_banner(train_b, test_b)

        self.loss_list = []
        min_loss = float("inf")
        train_means, test_means = [], []

        import time as _time

        self.epoch_times = []
        with profile_trace(self.profile_dir):
            epoch = 0
            while epoch < self.num_epochs:
                chunk = self._next_chunk(epoch)
                _t0 = _time.perf_counter()
                if self._streaming:
                    step_fn, eval_fn = _stream_fns(
                        self.optimizer_name.lower(),
                        lr=float(self.learning_rate),
                    )
                    model, opt_state, train_ms, test_ms = (
                        self._stream_epochs(
                            chunk, model, opt_state,
                            (pp_dev, self.diag_coeff, self._hyper()),
                            step_fn, eval_fn,
                            lambda rows: self._stream_pack(0, rows),
                            lambda rows: self._stream_pack(1, rows),
                            train_b, test_b,
                        )
                    )
                else:
                    model, opt_state, train_ms, test_ms = _multi_epoch_fn(
                        chunk, self.optimizer_name.lower(), unroll,
                        self._gram, lr=float(self.learning_rate),
                    )(
                        model, opt_state, pp_dev, self.diag_coeff,
                        self._hyper(), *data_args,
                    )
                train_ms, test_ms = jax.device_get((train_ms, test_ms))
                chunk_time = (_time.perf_counter() - _t0) / chunk
                self.model = model
                self.opt_state = opt_state

                for j in range(chunk):
                    e = epoch + j
                    tm, sm = train_ms[j], test_ms[j]  # [nb, 4]
                    self.loss_list.append([tm, sm])
                    train_means.append(tm.mean(axis=0))
                    test_means.append(sm.mean(axis=0))
                    for ci, col in enumerate(_METRIC_COLS):
                        self.writer.add_scalar(
                            f"{col}/train", train_means[-1][ci], e
                        )
                        self.writer.add_scalar(
                            f"{col}/test", test_means[-1][ci], e
                        )
                    self.epoch_times.append(chunk_time)
                epoch += chunk
                e = epoch - 1
                self._print_progress(
                    epoch, float(train_means[-1][0]), chunk_time
                )

                if (
                    self.save_model_every_step > 0
                    and e % self.save_model_every_step
                    == self.save_model_every_step - 1
                ):
                    self.save_model(e)
                    # best on last-batch train loss (house convention,
                    # matching the preserved reference quirk)
                    last_loss = float(train_ms[-1, -1, 0])
                    if last_loss < min_loss:
                        min_loss = last_loss
                        self.save_model(e, "best")

                if (
                    self.plot_frequency > 0
                    and e % self.plot_frequency == self.plot_frequency - 1
                    and self.plot_class is not None
                ):
                    self.plot_class.plot(self.colvar_model(), epoch=e)

        self.model = model
        self.opt_state = opt_state
        self.train_loss_df = losses_to_dataframe(train_means, _METRIC_COLS)
        self.test_loss_df = losses_to_dataframe(test_means, _METRIC_COLS)
