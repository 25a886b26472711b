r"""Eigenfunction training task (generator and transfer operator).

TPU-native counterpart of the reference's ``EigenFunctionTask``
(reference: colvarsfinder/core.py:251-567) — the flagship path.

Execution model: the full trajectory and weights live on device; each epoch
is one jitted program scanning over *index batches*: lagged pairs are
on-device gathers ``traj[idx + lag_idx]`` (reference core.py:511-512), and
the generator's per-sample input gradients are k fused batched vjps
(``jacrev`` of the batched head sums) inside the step (reference runs k
separate autograd backward passes per batch, core.py:424). The outer parameter gradient differentiates through
the input-gradient computation (double backprop, core.py:517).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import default_dtype
from ..export import ColvarModel
from ..logging_utils import losses_to_dataframe, profile_trace
from ..models.eigen import EigenFunctions
from ..ops.features import as_pp_layer
from .losses import eigen_loss
from .task import TrainingTask

__all__ = ["EigenFunctionTask"]

# compiled multi-epoch programs shared ACROSS task instances: keyed by the
# static configuration baked into the trace; model parameters, the
# preprocessing layer, diag coefficients, and the data are all traced
# arguments. A multi-replica sweep over same-shaped tasks compiles once.
_EPOCH_FN_CACHE: dict = {}

# jitted per-batch (H, M) preprocessing-Gram computation for the gram
# generator path, shared across same-shaped tasks
_GRAM_FN_CACHE: dict = {}


def _gram_fn(state_shape: tuple, tot_dim: int):
    """Jitted ``(pp, diag_coeff, Xf) -> (H, M)``: features and the
    preprocessing-jacobian Gram matrix M = J_pp diag(c) J_pp^T per sample
    (tot_dim basis JVPs through pp — one-time per batch; the training
    step then never backprops through the preprocessing layer)."""
    from ..config import matmul_precision, numerics_key

    key = (tuple(state_shape), int(tot_dim), matmul_precision())
    fn = _GRAM_FN_CACHE.get(key)
    if fn is None:
        prec = matmul_precision()

        def impl(pp, diag_coeff, Xf):
            def ppf(xf):
                out = pp(xf.reshape((-1,) + tuple(state_shape)))
                return out.reshape(out.shape[0], -1)

            H = ppf(Xf)
            basis = jnp.eye(tot_dim, dtype=Xf.dtype)
            A = jax.vmap(
                lambda e: jax.jvp(
                    ppf, (Xf,), (jnp.broadcast_to(e, Xf.shape),)
                )[1]
            )(basis)  # [D, B, d_r]
            M = jnp.einsum(
                "dbi,d,dbj->bij", A, diag_coeff, A, precision=prec
            )
            return H, M

        fn = jax.jit(impl)
        _GRAM_FN_CACHE[key] = fn
    return fn


def _feat_fn(state_shape: tuple):
    """Jitted ``(pp, Xf) -> H``: flat features of flat-row batches (used
    by gram-mode data prep for rows that need features but no Gram)."""
    key = ("feat", tuple(state_shape))
    fn = _GRAM_FN_CACHE.get(key)
    if fn is None:

        def impl(pp, Xf):
            out = pp(Xf.reshape((-1,) + tuple(state_shape)))
            return out.reshape(out.shape[0], -1)

        fn = jax.jit(impl)
        _GRAM_FN_CACHE[key] = fn
    return fn


def _make_loss(static: tuple):
    """Per-batch loss core ``(model, pp, diag, hyper, X, w, X_l, w_l) ->
    (loss, metrics)`` for a static config — shared by the compiled epoch
    programs and the streaming per-batch step."""
    (state_shape, k, lag_idx, traj_dt,
     sort_eigvals, opt_name, prebatch, unroll, fused, gram) = static

    if fused:
        # Pallas fused step (transfer-op only): the whole loss forward and
        # parameter backward are two kernels; see ops/fused_eigen.py for
        # the design and its measured error budget
        from ..ops.fused_eigen import (
            eigen_loss_from_stats,
            params_t_of,
            transfer_stats,
        )

        def _loss(model, pp_layer, diag_coeff, hyper, X, w, X_l, w_l):
            alpha, eig_w, _beta = hyper
            F = pp_layer(X)
            F_l = pp_layer(X_l)
            F = F.reshape(F.shape[0], -1)
            F_l = F_l.reshape(F_l.shape[0], -1)
            stats = transfer_stats(params_t_of(model), F, F_l, w, w_l)
            loss, (eig_vals, non_pen, pen, cvec) = eigen_loss_from_stats(
                stats, k=k, alpha=alpha, eig_w=eig_w,
                lag_idx=lag_idx, traj_dt=traj_dt,
                sort_eigvals=sort_eigvals,
            )
            metrics = jnp.concatenate(
                [
                    jnp.stack([loss, non_pen, pen]),
                    eig_vals,
                    cvec.astype(loss.dtype),
                ]
            )
            return loss, metrics
    else:
        def _loss(model, pp_layer, diag_coeff, hyper, X, w, X_l, w_l):
            alpha, eig_w, beta = hyper
            loss, aux = eigen_loss(
                model, pp_layer, X, w, X_l, w_l,
                k=k, alpha=alpha, eig_w=eig_w, beta=beta,
                diag_coeff=diag_coeff, lag_idx=lag_idx, traj_dt=traj_dt,
                sort_eigvals=sort_eigvals,
            )
            metrics = jnp.concatenate(
                [
                    jnp.stack([loss, aux.non_penalty_loss, aux.penalty]),
                    aux.eig_vals,
                    aux.cvec.astype(loss.dtype),
                ]
            )
            return loss, metrics

    return _loss


def _make_batch_loss(static: tuple):
    """Per-batch loss over PREBATCH-format batches — ``(Xf, w)`` /
    ``(Xf, Xlf, w, w_l)`` / gram ``(H, M, w)`` tuples of pre-gathered
    arrays — shared by the prebatched epoch programs and the streaming
    per-batch step (which host-gathers the same tuples)."""
    (state_shape, k, lag_idx, traj_dt,
     sort_eigvals, opt_name, prebatch, unroll, fused, gram) = static
    _loss = _make_loss(static)

    def batch_loss(model, pp_layer, diag_coeff, hyper, batch):
        if lag_idx > 0:
            Xf, Xlf, w, w_l = batch
            X_l = Xlf.reshape((-1,) + state_shape)
        elif gram:
            # Gram path: the batch carries (H, M, w) — features and
            # the precomputed pp-jacobian Gram matrix (see
            # _prepare_data); diag_coeff is folded into M
            H, M, w = batch
            alpha, eig_w, beta = hyper
            loss, aux = eigen_loss(
                model, None, H, w, None, None,
                k=k, alpha=alpha, eig_w=eig_w, beta=beta,
                diag_coeff=None, lag_idx=0, traj_dt=traj_dt,
                sort_eigvals=sort_eigvals, pp_gram=M,
            )
            metrics = jnp.concatenate(
                [
                    jnp.stack([loss, aux.non_penalty_loss, aux.penalty]),
                    aux.eig_vals,
                    aux.cvec.astype(loss.dtype),
                ]
            )
            return loss, metrics
        else:
            Xf, w = batch
            X_l = w_l = None
        X = Xf.reshape((-1,) + state_shape)
        return _loss(model, pp_layer, diag_coeff, hyper, X, w, X_l, w_l)

    return batch_loss


def _multi_epoch_fn(length: int, static: tuple,
                    lr: float | None = None):
    from ..config import matmul_precision, numerics_key

    key = (length, numerics_key(), lr) + static
    cached = _EPOCH_FN_CACHE.get(key)
    if cached is not None:
        return cached[0]

    (state_shape, k, lag_idx, traj_dt,
     sort_eigvals, opt_name, prebatch, unroll, fused, gram) = static
    from .task import TrainingTask

    # solo programs bake the lr in (lr=<float>; inject_hyperparams
    # costs 1.47x on dispatch-scale steps — RESULTS.md round 4); the
    # ensemble impl passes lr=None so the traced rate rides in the
    # state and a sweep/replica vmap carries per-replica values
    optimizer = TrainingTask.make_optimizer(opt_name, lr)

    if prebatch:
        # batches were gathered ONCE before training (the schedule is
        # static, shuffle=False semantics): the scan streams pre-shaped
        # [nb, B, ...] arrays — measured ~15% faster than per-step
        # gathers at dipeptide scale (benchmarks/RESULTS.md)
        batch_loss = _make_batch_loss(static)
    else:
        # trajectory stays whole on device (required for frame-axis
        # sharding); flat 2-D gathers per scan step (3-5x faster than
        # N-D gathers on TPU), reshape per batch
        _loss = _make_loss(static)

        def batch_loss(model, pp_layer, diag_coeff, hyper, batch):
            traj, weights, idx = batch
            X = traj[idx].reshape((-1,) + state_shape)
            w = weights[idx]
            if lag_idx > 0:
                X_l = traj[idx + lag_idx].reshape((-1,) + state_shape)
                w_l = weights[idx + lag_idx]
            else:
                X_l = w_l = None
            return _loss(model, pp_layer, diag_coeff, hyper, X, w, X_l, w_l)

    def epoch_body(model, opt_state, pp_layer, diag_coeff, hyper,
                   train_data, test_data):
        if prebatch and unroll:
            # batches arrive as a TUPLE of separate per-batch arrays and
            # the epoch unrolls over them: slicing a batch out of a
            # stacked [nb, B, ...] array costs ~0.8 ms/step on this
            # backend — 2x the whole gradient step (benchmarks/RESULTS.md
            # "unrolled batch layout"); separate arrays avoid it entirely
            train_ms = []
            for batch in train_data:
                (_, metrics), grads = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(model, pp_layer, diag_coeff, hyper, batch)
                updates, opt_state = optimizer.update(
                    grads, opt_state, model
                )
                model = optax.apply_updates(model, updates)
                train_ms.append(metrics)
            # the reference evaluates the test loss with gradients
            # enabled (core.py:535-551) — semantics identical here
            test_ms = [
                batch_loss(model, pp_layer, diag_coeff, hyper, b)[1]
                for b in test_data
            ]
            return (
                model, opt_state, jnp.stack(train_ms), jnp.stack(test_ms)
            )

        def train_step(carry, scanned):
            model, opt_state = carry
            batch = scanned if prebatch else train_data[:2] + (scanned,)
            (_, metrics), grads = jax.value_and_grad(
                batch_loss, has_aux=True
            )(model, pp_layer, diag_coeff, hyper, batch)
            updates, opt_state = optimizer.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            return (model, opt_state), metrics

        train_xs = train_data if prebatch else train_data[2]
        (model, opt_state), train_metrics = jax.lax.scan(
            train_step, (model, opt_state), train_xs
        )

        def eval_step(_, scanned):
            # the reference evaluates the test loss with gradients
            # enabled (core.py:535-551) — semantics identical here
            batch = scanned if prebatch else test_data[:2] + (scanned,)
            _, metrics = batch_loss(model, pp_layer, diag_coeff, hyper, batch)
            return None, metrics

        test_xs = test_data if prebatch else test_data[2]
        _, test_metrics = jax.lax.scan(eval_step, None, test_xs)
        return model, opt_state, train_metrics, test_metrics

    return TrainingTask.compile_multi_epoch(
        _EPOCH_FN_CACHE, key, length, epoch_body
    )


def _multi_epoch_impl(length: int, static: tuple):
    """Un-jitted multi-epoch program (for the replica-ensemble vmap)."""
    from ..config import matmul_precision, numerics_key

    _multi_epoch_fn(length, static)  # populate the cache (lr=None)
    key = (length, numerics_key(), None) + static
    return _EPOCH_FN_CACHE[key][1]


def _stream_fns(static: tuple, lr: float | None = None):
    """Jitted per-batch ``(step, eval)`` pair for the STREAMING layout
    (trajectories larger than HBM): batches arrive pre-gathered from the
    HOST in the prebatch tuple format, the step donates model/opt_state
    buffers, and the arithmetic is identical to the prebatched epoch
    program (same :func:`_make_batch_loss`, same optimizer update)."""
    from ..config import numerics_key
    from .task import TrainingTask

    key = ("stream", numerics_key(), lr) + static
    cached = _EPOCH_FN_CACHE.get(key)
    if cached is not None:
        return cached

    (state_shape, k, lag_idx, traj_dt,
     sort_eigvals, opt_name, prebatch, unroll, fused, gram) = static
    batch_loss = _make_batch_loss(static)
    optimizer = TrainingTask.make_optimizer(opt_name, lr)

    def step(model, opt_state, pp_layer, diag_coeff, hyper, batch):
        (_, metrics), grads = jax.value_and_grad(
            batch_loss, has_aux=True
        )(model, pp_layer, diag_coeff, hyper, batch)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, metrics

    def eval_one(model, pp_layer, diag_coeff, hyper, batch):
        # the reference evaluates the test loss with gradients enabled
        # (core.py:535-551) — semantics identical here
        return batch_loss(model, pp_layer, diag_coeff, hyper, batch)[1]

    fns = (jax.jit(step, donate_argnums=(0, 1)), jax.jit(eval_one))
    while len(_EPOCH_FN_CACHE) >= TrainingTask.EPOCH_FN_CACHE_MAX:
        _EPOCH_FN_CACHE.pop(next(iter(_EPOCH_FN_CACHE)))
    _EPOCH_FN_CACHE[key] = fns
    return fns


class EigenFunctionTask(TrainingTask):
    r"""Learn eigenfunctions of the infinitesimal generator (``lag_tau == 0``)
    or the transfer operator (``lag_tau > 0``)
    (reference: colvarsfinder/core.py:251-567; math:
    docs/math_backgrounds.rst:54-105).

    Attributes:
        model: same as the input parameter
        preprocessing_layer: same as the input parameter pp_layer
        train_loss_df / test_loss_df: per-epoch mean metric dataframes with
            columns ['loss', 'eigen_non_penalty', 'eigen_penalty',
            'eig_1', ..., 'eig_k']
    """

    # auto prebatch is disabled above this estimated size of the batched
    # copies (2x trajectory with a lag): leaves headroom on a 16 GB chip
    # for the trajectory itself, activations, and the optimizer state
    PREBATCH_AUTO_LIMIT_BYTES = 4 << 30

    # prebatched batches are passed as separate per-batch arrays and the
    # epoch body unrolls over them (slicing a stacked [nb, B, ...] array
    # costs ~0.8 ms/step on this backend — 2x the gradient step itself);
    # above this batch count the unrolled program would compile too long,
    # so the stacked+scanned layout is used instead
    PREBATCH_UNROLL_LIMIT = 32

    # the gram generator path stores one [B, d_r, d_r] Gram tensor per
    # batch; above this total it falls back to the vjp path
    GRAM_AUTO_LIMIT_BYTES = 4 << 30

    def __init__(
        self,
        traj_obj,
        pp_layer,
        model,
        model_path,
        alpha: float,
        eig_weights,
        diag_coeff=None,
        beta: float = 1.0,
        lag_tau: float = 0,
        learning_rate: float = 0.01,
        load_model_filename=None,
        save_model_every_step: int = 10,
        sort_eigvals_in_training: bool = True,
        k: int = 1,
        batch_size: int = 1000,
        num_epochs: int = 10,
        test_ratio: float = 0.2,
        optimizer_name: str = "Adam",
        device=None,
        plot_class=None,
        plot_frequency: int = 0,
        verbose: bool = True,
        debug_mode: bool = True,
        precompute_features: bool = False,
        prebatch: bool | None = None,
        fused_step: bool = False,
        gram_pp: bool | None = None,
        gram_dtype=None,
        streaming: bool | None = None,
        unroll_batches: bool | None = None,
        **kwargs,
    ):
        assert isinstance(model, EigenFunctions), (
            "model must be an object of the class EigenFunctions"
        )
        assert k == model.k, (
            f"number of cv ({k}) must equal the number of eigenfunctions "
            f"({model.k})"
        )
        pp_layer = as_pp_layer(pp_layer)
        super().__init__(
            traj_obj, pp_layer, model, model_path, learning_rate,
            load_model_filename, save_model_every_step, k, batch_size,
            num_epochs, test_ratio, optimizer_name, device, plot_class,
            plot_frequency, verbose, debug_mode, **kwargs,
        )

        self._alpha = float(alpha)
        self._sort_eigvals_in_training = bool(sort_eigvals_in_training)
        self._eig_w = list(eig_weights)
        self._cvec = None

        self.traj_dt = float(traj_obj.dt)
        lag_idx = lag_tau / self.traj_dt
        assert abs(lag_idx - round(lag_idx)) < 1e-6, (
            f"lag-time ({lag_tau}) not divisable by the timestep "
            f"{self.traj_dt} of the trajectory"
        )
        self.lag_idx = int(round(lag_idx))

        if self.verbose:
            print("\nEigenfunctions:\n", self.model, flush=True)

        self.init_model_and_optimizer()

        self._traj_np = np.asarray(traj_obj.trajectory, dtype=default_dtype())
        self._weights_np = np.asarray(traj_obj.weights, dtype=default_dtype())
        self.tot_dim = int(np.prod(self._traj_np.shape[1:]))

        # STREAMING layout (trajectories larger than HBM): the data stays
        # host-resident (numpy / np.memmap) and batches are host-gathered
        # and device_put just-in-time — see TrainingTask._stream_epochs.
        # Resolved BEFORE eager preprocessing so the feature pass is
        # chunked rather than one whole-trajectory device call.
        self._streaming = self._resolve_streaming(
            streaming,
            (2 if self.lag_idx > 0 else 1) * self._traj_np.nbytes,
        )

        # optional eager preprocessing (the AE task's pattern, reference
        # core.py:635, exposed as a pipeline option per SURVEY §7): features
        # are computed once for the whole trajectory instead of per batch.
        # Only valid for the transfer-operator loss — the generator takes
        # input gradients through the preprocessing layer (core.py:424).
        self.precompute_features = bool(precompute_features)
        self._pp_for_loss = self.preprocessing_layer
        if self.precompute_features:
            assert self.lag_idx > 0, (
                "precompute_features requires the transfer-operator loss "
                "(lag_tau > 0); the generator loss differentiates through "
                "the preprocessing layer"
            )
            from ..ops.features import Identity

            if self._streaming:
                self._traj_np = self._chunked_apply(
                    self.preprocessing_layer, self._traj_np
                )
            else:
                feats = jax.jit(self.preprocessing_layer)(
                    jnp.asarray(self._traj_np)
                )
                self._traj_np = np.asarray(feats)
            self._pp_for_loss = Identity()

        # batch-data layout (docs/api.md option matrix): pre-gathered
        # batches by default (~15% faster); per-step device gathers when
        # the trajectory is frame-sharded (required), when the batched
        # copies would be too large for HBM (auto fallback), or on request
        if self._streaming:
            # batches arrive pre-gathered (from the host) in the prebatch
            # tuple format; the gram/unroll sub-layouts are device-side
            # optimizations that do not apply
            self._prebatch = True
            assert prebatch is not False, (
                "streaming=True gathers batches on the host (the prebatch "
                "tuple format); prebatch=False selects the on-device "
                "gather layout, which requires device-resident data"
            )
        elif prebatch is None:
            prebatched_bytes = (
                2 if self.lag_idx > 0 else 1
            ) * self._traj_np.nbytes
            self._prebatch = (
                not self.shard_trajectory
                and prebatched_bytes <= self.PREBATCH_AUTO_LIMIT_BYTES
            )
        else:
            self._prebatch = bool(prebatch)
            assert not (self._prebatch and self.shard_trajectory), (
                "prebatch=True is incompatible with shard_trajectory: the "
                "frame-sharded layout requires per-step gathers"
            )
        self._unroll = False  # decided per data layout in _prepare_data
        # tri-state override of the unroll-vs-scan epoch-body choice
        # (None = PREBATCH_UNROLL_LIMIT heuristic). unroll_batches=False
        # selects the stacked+scanned body: one step's buffers live at a
        # time, which is what lets R=64 GENERATOR sweeps fit in 16 GB
        # (the unrolled multi-batch body's liveness, not one step's
        # working set, was the sweep OOM — benchmarks/RESULTS.md)
        self._unroll_override = (
            None if unroll_batches is None else bool(unroll_batches)
        )

        # opt-in Pallas fused step (ops/fused_eigen.py): the loss forward
        # and parameter backward run as two kernels; transfer-op only
        # (the generator loss needs input gradients, which the fused
        # backward does not produce)
        self.fused_step = bool(fused_step)
        if self.fused_step:
            assert self.lag_idx > 0, (
                "fused_step requires the transfer-operator loss "
                "(lag_tau > 0)"
            )
            assert model.activation == "tanh", (
                f"fused_step kernels implement the 'tanh' activation "
                f"(got '{model.activation}'); use the default XLA step "
                "for other activations"
            )
            fused_width = self.k * max(model.layer_dims[1:-1], default=0)
            assert fused_width <= 256, (
                f"fused_step supports k * hidden_width <= 256 (got "
                f"{fused_width}): the block-diagonal kernel activations "
                "must fit scoped VMEM; use the default XLA step for "
                "wider models"
            )
            # the stats vector must fit one 128-lane row:
            # m = 2 + 5k + (k-1)k columns
            assert self.k * (self.k + 4) + 2 <= 128, (
                f"fused_step supports k <= 9 (got {self.k}): the stats "
                "row must fit 128 lanes"
            )
            assert default_dtype() == jnp.float32, (
                "fused_step computes in float32; with "
                "set_default_dtype('float64') (the parity mode) use the "
                "default XLA step"
            )
            assert self.mesh is None, (
                "fused_step kernels are single-device; data-parallel "
                "training over a mesh uses the default XLA step"
            )

        if self.lag_idx == 0:  # generator
            self._beta = float(beta)
            if diag_coeff is not None:
                dc = np.asarray(diag_coeff, dtype=default_dtype()).reshape(-1)
                assert dc.shape[0] == self.tot_dim, (
                    f"diag_coeff should be a 1d tensor of length "
                    f"{self.tot_dim}, current shape: {dc.shape}"
                )
                self._diag_coeff = jnp.asarray(dc)
            else:
                self._diag_coeff = jnp.ones(self.tot_dim, dtype=default_dtype())
        else:
            self._beta = float(beta)
            self._diag_coeff = None

        # Gram-path generator loss (losses.eigen_loss pp_gram): the
        # preprocessing input-jacobian is loop-invariant across the epoch
        # scan, so its Gram matrix M = J_pp diag(c) J_pp^T is precomputed
        # per batch and the per-step Dirichlet term becomes a quadratic
        # form in the model-only jacobian — 1.61x faster per step at
        # dipeptide scale (benchmarks/gram_ab.py). Default: on for
        # generator tasks with a non-identity preprocessing layer under
        # the prebatched-unrolled layout (resolved in _prepare_data).
        from ..ops.features import Identity

        if gram_pp is None:
            self._gram_requested = (
                self.lag_idx == 0
                and not isinstance(self._pp_for_loss, Identity)
            )
        else:
            self._gram_requested = bool(gram_pp)
            assert not (self._gram_requested and self.lag_idx > 0), (
                "gram_pp applies to the generator loss only (lag_tau == 0)"
            )
        self._gram_explicit = gram_pp is not None
        # storage dtype of the precomputed pp-jacobian Gram tensor M.
        # 'bfloat16' halves the HBM traffic that BOUNDS the gram step
        # (benchmarks/genphase_scan.py: ~3-4 M-traversals/step dominate;
        # the quadratic form then runs bf16 x bf16 -> f32 on the MXU).
        # Opt-in: M rounds to bf16 (~1e-2 relative on the Dirichlet
        # term) — explore fast, fine-tune at the f32 default.
        if gram_dtype is not None:
            import numpy as _np

            name = (
                gram_dtype if gram_dtype == "bfloat16"
                else _np.dtype(gram_dtype).name
            )
            assert name in ("float32", "bfloat16"), name
            gram_dtype = None if name == "float32" else name
        self._gram_dtype = gram_dtype
        self._gram = False  # resolved with the data layout in _prepare_data


    @property
    def _traj_flat(self):
        """Trajectory flattened to [n, prod(state)] — the on-device layout
        (flat 2-D gathers are 3-5x faster than N-D gathers on TPU)."""
        return self._traj_np.reshape(self._traj_np.shape[0], -1)

    # ------------------------------------------------------------------
    def get_reordered_eigenfunctions(self, model, cvec):
        r"""New EigenFunctions with heads permuted by ``cvec``
        (reference core.py:356-370)."""
        return model.reordered(cvec)

    def colvar_model(self) -> ColvarModel:
        r"""CV model :math:`\xi = (g_1 \circ r, ..., g_k \circ r)^T` with
        heads ordered by the last training ``cvec``
        (reference core.py:372-382)."""
        if self._cvec is None:
            self._cvec = np.arange(self.k)
        reordered = self.model.reordered(self._cvec)
        return ColvarModel(self.preprocessing_layer, reordered)

    def reg_model(self):
        return None

    # ------------------------------------------------------------------
    def loss_func(self, X, weight, X_lagged=None, weight_lagged=None):
        r"""Loss on one batch (reference core.py:387-457). Returns
        (loss, eig_vals, non_penalty_loss, penalty, cvec)."""
        loss, aux = eigen_loss(
            self.model,
            self._pp_for_loss,
            jnp.asarray(X),
            jnp.asarray(weight),
            None if X_lagged is None else jnp.asarray(X_lagged),
            None if weight_lagged is None else jnp.asarray(weight_lagged),
            k=self.k,
            alpha=self._alpha,
            eig_w=self._eig_w,
            beta=self._beta,
            diag_coeff=self._diag_coeff,
            lag_idx=self.lag_idx,
            traj_dt=self.traj_dt,
            sort_eigvals=self._sort_eigvals_in_training,
        )
        return loss, aux.eig_vals, aux.non_penalty_loss, aux.penalty, aux.cvec

    # ------------------------------------------------------------------
    def _static_config(self):
        """Hashable tuple of everything baked into the compiled epoch
        program. Two tasks with equal static configs share one compiled
        program — the preprocessing layer, diag coefficients, data,
        parameters, loss constants (alpha/eig_weights/beta, via
        :meth:`_hyper`), and the learning rate (injected into the
        optimizer state) are all traced *arguments* — so a
        mixed-hyperparameter sweep compiles once, not once per value."""
        return (
            tuple(self._traj_np.shape[1:]),
            self.k,
            self.lag_idx,
            self.traj_dt,
            self._sort_eigvals_in_training,
            self.optimizer_name.lower(),
            self._prebatch,
            self._unroll,
            self.fused_step,
            self._gram,
        )

    def _hyper(self):
        """Traced loss-constant arguments of the compiled epoch program."""
        dt = default_dtype()
        return (
            jnp.asarray(self._alpha, dtype=dt),
            jnp.asarray(self._eig_w, dtype=dt),
            jnp.asarray(self._beta, dtype=dt),
        )

    def _get_multi_epoch_fn(self, length: int):
        return _multi_epoch_fn(
            length, self._static_config(),
            lr=float(self.learning_rate),
        )

    def _prepare_data(self):
        """Device-placed data arguments of the multi-epoch program:
        ``(train_data, test_data, train_b, test_b)``.

        prebatch mode (default): the static batch schedule is gathered
        ONCE on the host into [nb, B, ...] arrays the epoch scan streams —
        ~15% faster than per-step device gathers at dipeptide scale.
        gather mode (``shard_trajectory`` or ``prebatch=False``): the
        whole trajectory stays on device (frame-sharded over the mesh when
        requested) and batches are per-step flat gathers.

        The result is cached on the instance: the trajectory, split, and
        batch schedule are fixed at construction, and re-placing the data
        costs ~0.35 s per ``train()`` through the tunnel (host->device
        transfer + per-batch gather dispatches) against ~60 ms of actual
        training compute at dipeptide scale.
        """
        cached = getattr(self, "_prepared_data_cache", None)
        if cached is not None:
            return cached
        train_idx, test_idx = self._lagged_split(self.lag_idx)
        train_b = self._make_batches(train_idx, self.batch_size)
        test_b = self._make_batches(test_idx, self.batch_size)

        if self._streaming:
            # STREAMING layout: nothing is placed on device here — the
            # trajectory stays host-resident (possibly memory-mapped) and
            # _stream_pack gathers each batch just-in-time in train()
            self._unroll = False
            self._gram = False
            train_data = test_data = None
        elif self._prebatch:
            # transfer the (small) flat trajectory once and gather the
            # batch copies ON DEVICE: host-side gathering would push ~4x
            # the trajectory volume through the host->device link on every
            # train() call (measured 1.5x slower end-to-end on the tunnel)
            flat_d = jnp.asarray(self._traj_flat)
            w_d = jnp.asarray(self._weights_np)
            feat_shape = self._traj_flat.shape[1:]
            self._unroll = (
                self._unroll_override
                if self._unroll_override is not None
                else len(train_b) + len(test_b)
                <= self.PREBATCH_UNROLL_LIMIT
            )

            # resolve the Gram generator path: requested, generator loss,
            # prebatched layout (unrolled OR stacked+scanned — the scan
            # body slices the stacked (H, M, w) arrays per step), and the
            # Gram M tensors fit in HBM
            self._gram = self._gram_requested and self.lag_idx == 0
            if self._gram:
                state_shape = tuple(self._traj_np.shape[1:])
                d_r = int(np.prod(jax.eval_shape(
                    self._pp_for_loss,
                    jax.ShapeDtypeStruct(
                        (1,) + state_shape, self._traj_np.dtype
                    ),
                ).shape[1:]))
                n_rows = sum(len(np.asarray(b).reshape(-1))
                             for b in list(train_b) + list(test_b))
                m_bytes = n_rows * d_r * d_r * self._traj_np.itemsize
                if m_bytes > self.GRAM_AUTO_LIMIT_BYTES:
                    self._gram = False
                    if self.verbose:
                        print(
                            f"gram_pp: per-batch Gram tensors would need "
                            f"{m_bytes / 2**30:.1f} GiB; falling back to "
                            "the vjp generator path",
                            flush=True,
                        )

            def pack_one(rows):
                shape = tuple(np.shape(rows))
                bd = jnp.asarray(np.asarray(rows).reshape(-1))
                Xf = flat_d[bd].reshape(shape + feat_shape)
                if self.lag_idx > 0:
                    bld = bd + self.lag_idx
                    Xlf = flat_d[bld].reshape(shape + feat_shape)
                    return (Xf, Xlf,
                            w_d[bd].reshape(shape),
                            w_d[bld].reshape(shape))
                return (Xf, w_d[bd].reshape(shape))

            if self._unroll:
                # separate per-batch arrays, epoch body unrolled — avoids
                # the per-step stacked-array slice (see PREBATCH_UNROLL_
                # LIMIT note). Per-batch leaves are [B, ...]: the batch
                # dim is LEADING here, so mesh placement shards axis 0
                # (shard_batches targets axis 1 of stacked [nb, B, ...])
                if self.mesh is not None:
                    from ..parallel.mesh import shard_frames

                    place = lambda t: shard_frames(t, self.mesh)  # noqa: E731
                else:
                    place = self._place_batched
                if self._gram:
                    gf = _gram_fn(
                        tuple(self._traj_np.shape[1:]), self.tot_dim
                    )

                    def pack_gram(rows):
                        bd = jnp.asarray(np.asarray(rows).reshape(-1))
                        H, M = gf(
                            self._pp_for_loss, self._diag_coeff, flat_d[bd]
                        )
                        if self._gram_dtype == "bfloat16":
                            M = M.astype(jnp.bfloat16)
                        return (H, M, w_d[bd])

                    pack = pack_gram
                else:
                    pack = pack_one
                train_data = place(tuple(pack(row) for row in train_b))
                test_data = place(tuple(pack(row) for row in test_b))
            elif self._gram:
                gf = _gram_fn(tuple(self._traj_np.shape[1:]), self.tot_dim)

                def pack_gram_stacked(rows):
                    # gf per batch ROW: the basis-JVP transient inside gf
                    # is [tot_dim, n_rows, d_r] — a split-wide call makes
                    # it nb x larger than the per-batch unrolled path's,
                    # which can OOM data prep exactly when the scanned
                    # layout was chosen for HBM pressure
                    Hs, Ms, ws = [], [], []
                    for row in np.asarray(rows):
                        bd = jnp.asarray(row.reshape(-1))
                        H, M = gf(
                            self._pp_for_loss, self._diag_coeff, flat_d[bd]
                        )
                        if self._gram_dtype == "bfloat16":
                            M = M.astype(jnp.bfloat16)
                        Hs.append(H)
                        Ms.append(M)
                        ws.append(w_d[bd])
                    return (jnp.stack(Hs), jnp.stack(Ms), jnp.stack(ws))

                train_data = self._place_batched(pack_gram_stacked(train_b))
                test_data = self._place_batched(pack_gram_stacked(test_b))
            else:
                train_data = self._place_batched(pack_one(train_b))
                test_data = self._place_batched(pack_one(test_b))
        else:
            self._gram = False  # gather layout backprops through pp
            if self.shard_trajectory and self.mesh is not None:
                # long-trajectory scaling (SURVEY.md §5): the frame axis
                # is sharded across the mesh so trajectories larger than
                # one chip's HBM can be trained on; per-batch (lagged)
                # gathers become XLA collectives over ICI
                from ..parallel.mesh import shard_frames

                traj = shard_frames(jnp.asarray(self._traj_flat), self.mesh,
                                    pad=True)
                weights = shard_frames(
                    jnp.asarray(self._weights_np), self.mesh, pad=True
                )
            else:
                traj = self._place_replicated(jnp.asarray(self._traj_flat))
                weights = self._place_replicated(
                    jnp.asarray(self._weights_np)
                )
            train_data = (traj, weights, self._place_batched(train_b))
            test_data = (traj, weights, self._place_batched(test_b))
        if self._gram_requested and self._gram_explicit and not self._gram:
            import warnings

            warnings.warn(
                "gram_pp=True could not be honored (it requires the "
                "prebatched layout with Gram tensors within "
                "GRAM_AUTO_LIMIT_BYTES); training uses the vjp "
                "generator path"
            )
        self._prepared_data_cache = (train_data, test_data, train_b, test_b)
        return self._prepared_data_cache

    def _stream_pack(self, rows):
        """Host gather of one batch in the prebatch tuple format —
        ``(Xf, w)`` or ``(Xf, Xlf, w, w_l)`` — from the host-resident
        flat trajectory (works unchanged on a ``np.memmap``)."""
        flat = self._traj_flat
        w = self._weights_np
        bd = np.asarray(rows, dtype=np.int64).reshape(-1)
        if self._sorted_gather(flat):
            bd = np.sort(bd)  # quasi-sequential memmap sweep; the batch
            # losses are permutation-invariant (task.py _sorted_gather)
        shape = tuple(np.shape(rows))
        feat_shape = flat.shape[1:]
        Xf = np.asarray(flat[bd]).reshape(shape + feat_shape)
        if self.lag_idx > 0:
            bld = bd + self.lag_idx
            Xlf = np.asarray(flat[bld]).reshape(shape + feat_shape)
            return (
                Xf, Xlf,
                np.asarray(w[bd]).reshape(shape),
                np.asarray(w[bld]).reshape(shape),
            )
        return (Xf, np.asarray(w[bd]).reshape(shape))

    def train(self):
        r"""Train the model (reference core.py:459-566)."""
        train_data, test_data, train_b, test_b = self._prepare_data()
        model = self._place_replicated(self._protect(self.model))
        opt_state = self._place_replicated(self._protect(self.opt_state))

        self._print_train_banner(train_b, test_b)

        loss_names = ["loss", "eigen_non_penalty", "eigen_penalty"] + [
            "eig_%d" % (i + 1) for i in range(self.k)
        ]
        n_metrics = len(loss_names)

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
                        self._static_config(),
                        lr=float(self.learning_rate),
                    )
                    model, opt_state, train_cm, test_cm = (
                        self._stream_epochs(
                            chunk, model, opt_state,
                            (self._pp_for_loss, self._diag_coeff,
                             self._hyper()),
                            step_fn, eval_fn,
                            self._stream_pack, self._stream_pack,
                            train_b, test_b,
                        )
                    )
                else:
                    model, opt_state, train_cm, test_cm = (
                        self._get_multi_epoch_fn(chunk)(
                            model, opt_state, self._pp_for_loss,
                            self._diag_coeff, self._hyper(),
                            train_data, test_data
                        )
                    )
                # ONE device->host fetch for both metric arrays (each
                # fetch is a full tunnel round trip)
                train_cm, test_cm = jax.device_get((train_cm, test_cm))
                chunk_time = (_time.perf_counter() - _t0) / chunk
                # last column block is cvec per batch; keep the final one
                self._cvec = train_cm[-1, -1, n_metrics:].astype(int)
                self.model = model
                self.opt_state = opt_state

                for j in range(chunk):
                    e = epoch + j
                    train_m = train_cm[j, :, :n_metrics]
                    test_m = test_cm[j, :, :n_metrics]
                    self.loss_list.append([train_m, test_m])
                    mean_train = train_m.mean(axis=0)
                    mean_test = test_m.mean(axis=0)
                    train_means.append(mean_train)
                    test_means.append(mean_test)
                    self.writer.add_scalars_split(
                        loss_names, mean_train, mean_test, e
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
                    last_loss = float(train_cm[-1, -1, 0])
                    if last_loss < min_loss:  # reference quirk: last-batch loss
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
        self.train_loss_df = losses_to_dataframe(train_means, loss_names)
        self.test_loss_df = losses_to_dataframe(test_means, loss_names)
