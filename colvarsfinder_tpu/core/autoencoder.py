r"""Autoencoder training task.

TPU-native counterpart of the reference's ``AutoEncoderTask``
(reference: colvarsfinder/core.py:569-744).

Execution model: features are computed for the whole trajectory once
(matching the reference's eager preprocessing, core.py:635) and placed on
device; each epoch is a single jitted program — a ``lax.scan`` over training
batches performing loss/grad/optimizer updates entirely on device, followed
by a scanned evaluation pass — instead of the reference's Python batch loop
with per-batch host->device copies (core.py:699-712).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import default_dtype
from ..export import ColvarModel
from ..logging_utils import losses_to_dataframe, profile_trace
from ..models.ae import AutoEncoder
from ..ops.features import as_pp_layer
from .losses import weighted_mse_loss
from .task import TrainingTask

__all__ = ["AutoEncoderTask"]

# compiled multi-epoch programs shared ACROSS task instances (see
# core/eigenfunction.py for the design rationale): model, optimizer state,
# and batched feature/weight arrays are all traced arguments, so the key
# only needs the config baked into the trace.
_EPOCH_FN_CACHE: dict = {}


def _multi_epoch_fn(length: int, opt_name: str, unroll: bool,
                    lr: float | None = None):
    from ..config import matmul_precision, numerics_key
    from .task import TrainingTask

    key = (length, numerics_key(), opt_name, unroll, lr)
    cached = _EPOCH_FN_CACHE.get(key)
    if cached is not None:
        return cached[0]
    # solo programs bake the lr in (lr=<float>; inject_hyperparams costs
    # 1.47x on dispatch-scale steps — RESULTS.md round 4); the ensemble
    # impl passes lr=None so the traced rate rides in the state
    optimizer = TrainingTask.make_optimizer(opt_name, lr)

    if unroll:
        # batches as separate per-batch arrays, epoch unrolled: slicing a
        # stacked [nb, B, ...] array costs ~0.8 ms/step on this backend
        # (benchmarks/RESULTS.md "unrolled batch layout")
        def epoch_body(model, opt_state, train_batches, test_batches):
            train_l = []
            for (X, w) in train_batches:
                loss, grads = jax.value_and_grad(weighted_mse_loss)(
                    model, X, w
                )
                updates, opt_state = optimizer.update(
                    grads, opt_state, model
                )
                model = optax.apply_updates(model, updates)
                train_l.append(loss)
            test_l = [
                weighted_mse_loss(model, X, w) for (X, w) in test_batches
            ]
            return (
                model, opt_state, jnp.stack(train_l), jnp.stack(test_l)
            )
    else:
        def epoch_body(model, opt_state, train_X, train_w, test_X, test_w):
            def train_step(carry, batch):
                model, opt_state = carry
                X, w = batch
                loss, grads = jax.value_and_grad(weighted_mse_loss)(
                    model, X, w
                )
                updates, opt_state = optimizer.update(
                    grads, opt_state, model
                )
                model = optax.apply_updates(model, updates)
                return (model, opt_state), loss

            (model, opt_state), train_losses = jax.lax.scan(
                train_step, (model, opt_state), (train_X, train_w)
            )

            def eval_step(_, batch):
                X, w = batch
                return None, weighted_mse_loss(model, X, w)

            _, test_losses = jax.lax.scan(eval_step, None, (test_X, test_w))
            return model, opt_state, train_losses, test_losses

    return TrainingTask.compile_multi_epoch(
        _EPOCH_FN_CACHE, key, length, epoch_body
    )


def _multi_epoch_impl(length: int, opt_name: str, unroll: bool):
    """Un-jitted multi-epoch program (for the replica-ensemble vmap)."""
    from ..config import matmul_precision, numerics_key

    _multi_epoch_fn(length, opt_name, unroll)  # populate the cache (lr=None)
    key = (length, numerics_key(), opt_name, unroll, None)
    return _EPOCH_FN_CACHE[key][1]


def _stream_fns(opt_name: str, lr: float | None = None):
    """Jitted per-batch ``(step, eval)`` pair for the STREAMING layout
    (feature datasets larger than HBM) — same loss and optimizer update
    as the compiled epoch programs; the step donates model/opt_state."""
    from ..config import numerics_key
    from .task import TrainingTask

    key = ("stream", numerics_key(), opt_name, lr)
    cached = _EPOCH_FN_CACHE.get(key)
    if cached is not None:
        return cached

    optimizer = TrainingTask.make_optimizer(opt_name, lr)

    def step(model, opt_state, batch):
        X, w = batch
        loss, grads = jax.value_and_grad(weighted_mse_loss)(model, X, w)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    def eval_one(model, batch):
        X, w = batch
        return weighted_mse_loss(model, X, w)

    fns = (jax.jit(step, donate_argnums=(0, 1)), jax.jit(eval_one))
    while len(_EPOCH_FN_CACHE) >= TrainingTask.EPOCH_FN_CACHE_MAX:
        _EPOCH_FN_CACHE.pop(next(iter(_EPOCH_FN_CACHE)))
    _EPOCH_FN_CACHE[key] = fns
    return fns


class AutoEncoderTask(TrainingTask):
    r"""Train an autoencoder with the weighted reconstruction loss
    (reference: colvarsfinder/core.py:569-744; math:
    docs/math_backgrounds.rst:35-52).

    Attributes:
        model: same as the input parameter
        preprocessing_layer: same as the input parameter pp_layer
        train_loss_df / test_loss_df: per-epoch mean loss dataframes
    """

    def __init__(
        self,
        traj_obj,
        pp_layer,
        model,
        model_path,
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
        streaming: bool | None = None,
        **kwargs,
    ):
        assert isinstance(model, AutoEncoder), (
            "model must be an object of the class AutoEncoder"
        )
        if kwargs.get("shard_trajectory"):
            # option-surface consistency (docs/api.md option matrix): the
            # AE task precomputes features once and pre-gathers batches, so
            # there is no trajectory left on device to frame-shard; batches
            # are already split over the mesh's data axis.
            import warnings

            warnings.warn(
                "AutoEncoderTask ignores shard_trajectory: features are "
                "precomputed and pre-batched; batches are sharded over the "
                "mesh's data axis instead"
            )
        pp_layer = as_pp_layer(pp_layer)
        super().__init__(
            traj_obj, pp_layer, model, model_path, learning_rate,
            load_model_filename, save_model_every_step, model.encoded_dim,
            batch_size, num_epochs, test_ratio, optimizer_name, device,
            plot_class, plot_frequency, verbose, debug_mode, **kwargs,
        )

        self.init_model_and_optimizer()
        self._unroll = False  # decided per data layout in _prepare_data

        # STREAMING layout (feature datasets larger than HBM): resolved
        # BEFORE the eager feature pass so that pass runs chunked. The
        # device-resident layout holds ~one copy of the feature
        # trajectory (pre-gathered batches), so size the decision on the
        # feature shape from eval_shape.
        traj_np = np.asarray(traj_obj.trajectory, dtype=default_dtype())
        feat_struct = jax.eval_shape(
            self.preprocessing_layer,
            jax.ShapeDtypeStruct(
                (1,) + traj_np.shape[1:], traj_np.dtype
            ),
        )
        feat_bytes = (
            traj_np.shape[0]
            * int(np.prod(feat_struct.shape[1:]))
            * traj_np.itemsize
        )
        self._streaming = self._resolve_streaming(streaming, feat_bytes)

        # eager preprocessing of the whole trajectory (reference core.py:635)
        from ..ops.features import Identity as _Identity

        if isinstance(self.preprocessing_layer, _Identity):
            # zero-copy fast path: an identity pp keeps the trajectory
            # array itself (a np.memmap input STAYS memmapped, so a
            # >RAM streaming AE never materializes the features)
            self._feature_traj = traj_np
        elif self._streaming:
            self._feature_traj = self._chunked_apply(
                self.preprocessing_layer, traj_np
            )
        else:
            self._feature_traj = np.asarray(
                jax.jit(self.preprocessing_layer)(
                    jnp.asarray(traj_np)
                )
            )
        self._weights = np.asarray(traj_obj.weights, dtype=default_dtype())

        if self.verbose:
            print(
                "\nShape of trajectory data array:\n {}".format(
                    self._feature_traj.shape
                ),
                flush=True,
            )


    # ------------------------------------------------------------------
    def colvar_model(self) -> ColvarModel:
        r"""CV model: preprocessing layer followed by the encoder
        (reference core.py:640-647)."""
        return ColvarModel(self.preprocessing_layer, self.model.encoder)

    def reg_model(self):
        return None

    def weighted_MSE_loss(self, X, weight):
        r"""Reconstruction loss of the current model on a feature batch
        (reference core.py:652-666)."""
        return weighted_mse_loss(self.model, jnp.asarray(X), jnp.asarray(weight))

    # prebatched batches are unrolled as separate per-batch arrays up to
    # this total batch count (see core/eigenfunction.py for the measured
    # rationale); beyond it, the stacked+scanned layout bounds compile time
    PREBATCH_UNROLL_LIMIT = 32

    # ------------------------------------------------------------------
    def _static_config(self):
        """Hashable tuple of everything baked into the compiled epoch
        program (lr rides in the optimizer state; see
        core/eigenfunction.py for the shared-cache design). Valid after
        :meth:`_prepare_data` has decided the batch layout."""
        return (self.optimizer_name.lower(), self._unroll)

    def _get_multi_epoch_fn(self, length: int, unroll: bool):
        """Jitted scan of `length` epochs — one device dispatch per chunk of
        epochs between host-side hooks (checkpoint/plot). Per-epoch metrics
        are returned stacked so TensorBoard logging stays per-epoch.
        Compiled programs are shared across task instances (sweeps over
        same-shaped tasks compile once)."""
        return _multi_epoch_fn(
            length, self.optimizer_name.lower(), unroll,
            lr=float(self.learning_rate),
        )

    def _prepare_data(self):
        """Device-placed data arguments + layout flag, cached across
        ``train()`` calls (the split and batch schedule are fixed at
        construction; re-placing costs far more than the training compute
        through the tunnel — see core/eigenfunction.py)."""
        cached = getattr(self, "_prepared_data_cache", None)
        if cached is not None:
            return cached
        n = self._feature_traj.shape[0]
        train_idx, test_idx = self._make_split(n)

        train_b = self._make_batches(np.arange(len(train_idx)), self.batch_size)
        test_b = self._make_batches(np.arange(len(test_idx)), self.batch_size)

        if self._streaming:
            # STREAMING layout: features stay host-resident; batches are
            # gathered just-in-time in train() via _stream_pack, indexed
            # through the stored split (no gathered X_train copy either)
            self._unroll = False
            self._stream_split = (
                np.asarray(train_idx), np.asarray(test_idx)
            )
            self._prepared_data_cache = (None, False, train_b, test_b)
            return self._prepared_data_cache

        X_train = self._feature_traj[train_idx]
        w_train = self._weights[train_idx]
        X_test = self._feature_traj[test_idx]
        w_test = self._weights[test_idx]

        unroll = len(train_b) + len(test_b) <= self.PREBATCH_UNROLL_LIMIT
        self._unroll = unroll
        if unroll:
            # per-batch arrays ([B, ...] leaves, batch dim LEADING): mesh
            # placement shards axis 0
            if self.mesh is not None:
                from ..parallel.mesh import shard_frames

                place = lambda t: shard_frames(t, self.mesh)  # noqa: E731
            else:
                place = self._place_batched
            data_args = (
                place(tuple(
                    (X_train[row], w_train[row]) for row in train_b
                )),
                place(tuple(
                    (X_test[row], w_test[row]) for row in test_b
                )),
            )
        else:
            train_X = self._place_batched(
                X_train[train_b.reshape(-1)].reshape(
                    train_b.shape + X_train.shape[1:]
                )
            )
            train_w = self._place_batched(w_train[train_b])
            test_X = self._place_batched(
                X_test[test_b.reshape(-1)].reshape(
                    test_b.shape + X_test.shape[1:]
                )
            )
            test_w = self._place_batched(w_test[test_b])
            data_args = (train_X, train_w, test_X, test_w)
        self._prepared_data_cache = (data_args, unroll, train_b, test_b)
        return self._prepared_data_cache

    def _stream_pack_train(self, rows):
        """Host gather of one training batch (rows index positions within
        the train split, reference loader semantics)."""
        sel = self._stream_split[0][np.asarray(rows)]
        if self._sorted_gather(self._feature_traj):
            sel = np.sort(sel)  # quasi-sequential memmap sweep; the
            # batch losses are permutation-invariant (_sorted_gather)
        return (
            np.asarray(self._feature_traj[sel]),
            np.asarray(self._weights[sel]),
        )

    def _stream_pack_test(self, rows):
        sel = self._stream_split[1][np.asarray(rows)]
        if self._sorted_gather(self._feature_traj):
            sel = np.sort(sel)
        return (
            np.asarray(self._feature_traj[sel]),
            np.asarray(self._weights[sel]),
        )

    def train(self):
        r"""Train the model (reference core.py:668-744)."""
        data_args, unroll, train_b, test_b = self._prepare_data()

        model = self._place_replicated(self._protect(self.model))
        opt_state = self._place_replicated(self._protect(self.opt_state))

        self._print_train_banner(train_b, test_b)

        self.loss_list = []
        min_loss = float("inf")
        train_means, test_means = [], []

        import time as _time

        self.epoch_times = []
        with profile_trace(self.profile_dir):
            epoch = 0
            while epoch < self.num_epochs:
                # all epochs until the next host-side hook run as ONE
                # jitted multi-epoch scan (one device dispatch)
                chunk = self._next_chunk(epoch)
                _t0 = _time.perf_counter()
                if self._streaming:
                    step_fn, eval_fn = _stream_fns(
                        self.optimizer_name.lower(),
                        lr=float(self.learning_rate),
                    )
                    model, opt_state, train_ms, test_ms = (
                        self._stream_epochs(
                            chunk, model, opt_state, (),
                            step_fn, eval_fn,
                            self._stream_pack_train, self._stream_pack_test,
                            train_b, test_b,
                        )
                    )
                else:
                    model, opt_state, train_ms, test_ms = (
                        self._get_multi_epoch_fn(chunk, unroll)(
                            model, opt_state, *data_args
                        )
                    )
                # ONE device->host fetch for both metric arrays (each
                # fetch is a full tunnel round trip)
                train_ms, test_ms = jax.device_get((train_ms, test_ms))
                chunk_time = (_time.perf_counter() - _t0) / chunk
                self.model = model
                self.opt_state = opt_state

                for j in range(chunk):
                    e = epoch + j
                    train_losses, test_losses = train_ms[j], test_ms[j]
                    self.loss_list.append([train_losses, test_losses])
                    mean_train = train_losses.mean()
                    mean_test = test_losses.mean()
                    train_means.append(np.asarray([mean_train]))
                    test_means.append(np.asarray([mean_test]))
                    self.writer.add_scalar("Loss/train", mean_train, e)
                    self.writer.add_scalar("Loss/test", mean_test, e)
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
                    # best selection on LAST-BATCH train loss: preserved
                    # reference quirk (core.py:716-718)
                    last_loss = float(train_ms[-1, -1])
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
        self.train_loss_df = losses_to_dataframe(train_means, ["loss"])
        self.test_loss_df = losses_to_dataframe(test_means, ["loss"])
