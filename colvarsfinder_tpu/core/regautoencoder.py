r"""Regularized autoencoder training task.

TPU-native counterpart of the reference's ``RegAutoEncoderTask``
(reference: colvarsfinder/core.py:746-1218): a weighted sum of up to six
loss terms — (time-lagged) reconstruction, eigenfunction variational
objective + orthonormality penalty on the regularizer heads, and encoder
gradient/norm/orthogonality constraints — gated by their weights
(core.py:1082-1124). The gating constants are Python-level, so disabled
terms are compiled out of the step entirely.

``freeze_encoder`` is realized by zeroing encoder gradients inside the
jitted step: with Adam moments starting at zero and gradients identically
zero, encoder parameters and their optimizer state never change — exactly
the effect of the reference's requires_grad toggling (core.py:1078-1080,
:1129-1131).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import default_dtype
from ..export import ColvarModel
from ..logging_utils import losses_to_dataframe, profile_trace
from ..models.ae import RegAutoEncoder, RegModel
from ..ops.features import as_pp_layer
from .losses import (
    enc_grad_loss,
    enc_norm_loss,
    enc_orthogonality_loss,
    reg_eigen_loss,
    weighted_mse_lagged_loss,
)
from .task import TrainingTask

__all__ = ["RegAutoEncoderTask"]

_EPS = 1e-5

# compiled multi-epoch programs shared ACROSS task instances (see
# core/eigenfunction.py for the design rationale)
_EPOCH_FN_CACHE: dict = {}


def _regae_gather(loss_static, traj, weights, idx):
    """Gather one index batch's (X, X_ae_lagged, X_l, w, w_l) from the
    whole trajectory (reference core.py:1069-1076 semantics). Unused
    pieces (disabled terms / zero lags) are None."""
    (state_shape, k, num_reg, ae_on, eig_on, eta_on,
     lag_ae_idx, lag_idx, traj_dt) = loss_static
    X = traj[idx].reshape((-1,) + state_shape)
    w = weights[idx]
    X_ae_lagged = (
        traj[idx + lag_ae_idx].reshape((-1,) + state_shape)
        if (ae_on and lag_ae_idx > 0) else None
    )
    if eig_on and lag_idx > 0:
        X_l = traj[idx + lag_idx].reshape((-1,) + state_shape)
        w_l = weights[idx + lag_idx]
    else:
        X_l = w_l = None
    return (X, X_ae_lagged, X_l, w, w_l)


def _regae_batch_loss(loss_static, model, pp, diag_coeff, hyper, batch,
                      pp_gram=None):
    """All gated loss terms for one pre-gathered batch
    (reference core.py:1069-1135). ``loss_static`` is the hashable config
    prefix (state_shape, k, num_reg, ae_on, eig_on, eta_on, lag_ae_idx,
    lag_idx, traj_dt); gating is Python-level (static on/off booleans) so
    disabled terms compile out of the step, while the term WEIGHTS arrive
    in the traced ``hyper`` tuple (alpha, gamma, eta, eig_w, beta) — a
    sweep over loss constants shares one compiled program.

    ``pp_gram`` (gram mode, see :class:`RegAutoEncoderTask`): the batch
    carries precomputed FEATURES and ``pp`` is the identity; the
    generator eigen regularizer takes the quadratic form against the
    precomputed preprocessing-jacobian Gram matrix instead of
    backpropagating through the preprocessing layer."""
    (state_shape, k, num_reg, ae_on, eig_on, eta_on,
     lag_ae_idx, lag_idx, traj_dt) = loss_static
    alpha, gamma, eta, eig_w, beta = hyper
    X, X_ae_lagged, X_l, w, w_l = batch

    if ae_on:
        ae = weighted_mse_lagged_loss(
            model.forward_ae, pp, X,
            X if X_ae_lagged is None else X_ae_lagged, w,
        )
    else:
        ae = jnp.zeros(())

    e0 = enc_grad_loss(model.encoder, pp, X, w, k) if eta_on[0] else (
        jnp.zeros(())
    )
    e1 = enc_norm_loss(model.encoder, pp, X, w, k) if eta_on[1] else (
        jnp.zeros(())
    )
    e2 = (
        enc_orthogonality_loss(model.encoder, pp, X, w, k)
        if eta_on[2] else jnp.zeros(())
    )

    if eig_on:
        eig_vals, g0, g1, cvec = reg_eigen_loss(
            model, pp, X, w, X_l, w_l,
            num_reg=num_reg,
            eig_w=eig_w,
            beta=beta,
            diag_coeff=diag_coeff,
            lag_idx=lag_idx,
            traj_dt=traj_dt,
            pp_gram=pp_gram,
        )
    else:
        g0 = jnp.zeros(())
        g1 = jnp.zeros(())
        eig_vals = jnp.zeros(num_reg)
        cvec = jnp.arange(num_reg)

    loss = (
        alpha * ae
        + gamma[0] * g0
        + gamma[1] * g1
        + eta[0] * e0
        + eta[1] * e1
        + eta[2] * e2
    )
    metrics = jnp.concatenate(
        [
            jnp.stack([loss, ae, g0, g1]),
            eig_vals,
            jnp.stack([e0, e1, e2]),
            cvec.astype(loss.dtype),
        ]
    )
    return loss, metrics


def _zero_encoder_grads(grads):
    # masked by named field (not pytree child position) so a future
    # reordering of RegAutoEncoder.tree_flatten cannot silently freeze
    # the wrong subtree
    return RegAutoEncoder(
        encoder=jax.tree_util.tree_map(jnp.zeros_like, grads.encoder),
        decoder=grads.decoder,
        reg=grads.reg,
        _reg_layer_dims=grads.reg_layer_dims,
        _num_reg=grads.num_reg,
    )


def _multi_epoch_fn(length: int, static: tuple,
                    lr: float | None = None):
    from ..config import matmul_precision, numerics_key
    from .task import TrainingTask

    key = (length, numerics_key(), lr) + static
    cached = _EPOCH_FN_CACHE.get(key)
    if cached is not None:
        return cached[0]
    loss_static = static[:9]
    freeze, opt_name, prebatch, unroll, gram = static[9:]
    state_shape = loss_static[0]
    # solo programs bake the lr in; lr=None = ensemble traced-rate
    # mode (see core/eigenfunction.py and RESULTS.md round 4:
    # inject_hyperparams costs 1.47x on dispatch-scale steps)
    optimizer = TrainingTask.make_optimizer(opt_name, lr)

    if prebatch:
        # pre-gathered batch tuples of FLAT [., prod(state)] leaves
        # (reshaped to state rank per batch); the epoch body unrolls over
        # separate per-batch tuples up to the unroll limit, and scans a
        # stacked [nb, B, ...] layout above it (see core/eigenfunction.py
        # for the measured rationale of both layouts)
        if gram:
            from ..ops.features import Identity

            _ident = Identity()

            def batch_loss(model, pp, diag_coeff, hyper, batch):
                # gram mode: the batch carries FEATURES (flat [B, d_r])
                # plus the precomputed pp-jacobian Gram matrix M; pp and
                # diag_coeff args are ignored (pp backward hoisted to
                # data prep — see _prepare_data)
                H, Hae, M, w = batch
                return _regae_batch_loss(
                    loss_static, model, _ident, None, hyper,
                    (H, Hae, None, w, None), pp_gram=M,
                )
        else:
            def batch_loss(model, pp, diag_coeff, hyper, batch):
                Xf, Xaef, Xlf, w, w_l = batch
                X = Xf.reshape((-1,) + state_shape)
                X_ae = (
                    None if Xaef is None
                    else Xaef.reshape((-1,) + state_shape)
                )
                X_l = (
                    None if Xlf is None
                    else Xlf.reshape((-1,) + state_shape)
                )
                return _regae_batch_loss(
                    loss_static, model, pp, diag_coeff, hyper,
                    (X, X_ae, X_l, w, w_l),
                )

        if unroll:
            def epoch_body(model, opt_state, pp, diag_coeff, hyper,
                           train_batches, test_batches):
                train_ms = []
                for batch in train_batches:
                    (_, metrics), grads = jax.value_and_grad(
                        batch_loss, has_aux=True
                    )(model, pp, diag_coeff, hyper, batch)
                    if freeze:
                        grads = _zero_encoder_grads(grads)
                    updates, opt_state = optimizer.update(
                        grads, opt_state, model
                    )
                    model = optax.apply_updates(model, updates)
                    train_ms.append(metrics)
                test_ms = [
                    batch_loss(model, pp, diag_coeff, hyper, b)[1]
                    for b in test_batches
                ]
                return (
                    model, opt_state,
                    jnp.stack(train_ms), jnp.stack(test_ms),
                )
        else:
            def epoch_body(model, opt_state, pp, diag_coeff, hyper,
                           train_batches, test_batches):
                def train_step(carry, batch):
                    model, opt_state = carry
                    (_, metrics), grads = jax.value_and_grad(
                        batch_loss, has_aux=True
                    )(model, pp, diag_coeff, hyper, batch)
                    if freeze:
                        grads = _zero_encoder_grads(grads)
                    updates, opt_state = optimizer.update(
                        grads, opt_state, model
                    )
                    model = optax.apply_updates(model, updates)
                    return (model, opt_state), metrics

                (model, opt_state), train_ms = jax.lax.scan(
                    train_step, (model, opt_state), train_batches
                )

                def eval_step(_, batch):
                    return None, batch_loss(
                        model, pp, diag_coeff, hyper, batch
                    )[1]

                _, test_ms = jax.lax.scan(eval_step, None, test_batches)
                return model, opt_state, train_ms, test_ms
    else:
        def epoch_body(model, opt_state, pp, diag_coeff, hyper, traj,
                       weights, train_idx, test_idx):
            def batch_loss(model, idx):
                return _regae_batch_loss(
                    loss_static, model, pp, diag_coeff, hyper,
                    _regae_gather(loss_static, traj, weights, idx),
                )

            def train_step(carry, idx):
                model, opt_state = carry
                (_, metrics), grads = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(model, idx)
                if freeze:
                    grads = _zero_encoder_grads(grads)
                updates, opt_state = optimizer.update(
                    grads, opt_state, model
                )
                model = optax.apply_updates(model, updates)
                return (model, opt_state), metrics

            (model, opt_state), train_metrics = jax.lax.scan(
                train_step, (model, opt_state), train_idx
            )

            def eval_step(_, idx):
                _, metrics = batch_loss(model, idx)
                return None, metrics

            _, test_metrics = jax.lax.scan(eval_step, None, test_idx)
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
    HOST as flat ``(Xf, Xaef, Xlf, w, w_l)`` tuples (None pieces for
    disabled terms), arithmetic identical to the prebatched epoch
    program; the step donates model/opt_state."""
    from ..config import numerics_key
    from .task import TrainingTask

    key = ("stream", numerics_key(), lr) + static
    cached = _EPOCH_FN_CACHE.get(key)
    if cached is not None:
        return cached

    loss_static = static[:9]
    freeze, opt_name, prebatch, unroll, gram = static[9:]
    state_shape = loss_static[0]
    optimizer = TrainingTask.make_optimizer(opt_name, lr)

    def batch_loss(model, pp, diag_coeff, hyper, batch):
        Xf, Xaef, Xlf, w, w_l = batch
        X = Xf.reshape((-1,) + state_shape)
        X_ae = None if Xaef is None else Xaef.reshape((-1,) + state_shape)
        X_l = None if Xlf is None else Xlf.reshape((-1,) + state_shape)
        return _regae_batch_loss(
            loss_static, model, pp, diag_coeff, hyper,
            (X, X_ae, X_l, w, w_l),
        )

    def step(model, opt_state, pp, diag_coeff, hyper, batch):
        (_, metrics), grads = jax.value_and_grad(
            batch_loss, has_aux=True
        )(model, pp, diag_coeff, hyper, batch)
        if freeze:
            grads = _zero_encoder_grads(grads)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, metrics

    def eval_one(model, pp, diag_coeff, hyper, batch):
        return batch_loss(model, pp, diag_coeff, hyper, batch)[1]

    fns = (jax.jit(step, donate_argnums=(0, 1)), jax.jit(eval_one))
    while len(_EPOCH_FN_CACHE) >= TrainingTask.EPOCH_FN_CACHE_MAX:
        _EPOCH_FN_CACHE.pop(next(iter(_EPOCH_FN_CACHE)))
    _EPOCH_FN_CACHE[key] = fns
    return fns


class RegAutoEncoderTask(TrainingTask):
    r"""Train a regularized autoencoder
    (reference: colvarsfinder/core.py:746-1218; math:
    docs/math_backgrounds.rst:107-128).

    Attributes:
        model / preprocessing_layer: same as input parameters
        train_loss_df / test_loss_df: per-epoch mean metric dataframes with
            columns ['loss', 'ae_loss', 'eigen_non_penalty', 'eigen_penalty',
            'eig_0', ..., 'encoder_gradient', 'encoder_norm',
            'encoder_orthogonality']
    """

    # see core/eigenfunction.py for all three limits' rationale
    PREBATCH_AUTO_LIMIT_BYTES = 4 << 30
    PREBATCH_UNROLL_LIMIT = 32
    GRAM_AUTO_LIMIT_BYTES = 4 << 30

    def __init__(
        self,
        traj_obj,
        pp_layer,
        model,
        model_path,
        eig_weights=(),
        learning_rate: float = 0.01,
        load_model_filename=None,
        save_model_every_step: int = 10,
        batch_size: int = 1000,
        num_epochs: int = 10,
        test_ratio: float = 0.2,
        optimizer_name: str = "Adam",
        alpha: float = 1.0,
        gamma=(0.0, 0.0),
        eta=(0.0, 0.0, 0.0),
        lag_tau_ae: float = 0,
        lag_tau_reg: float = 0,
        beta: float = 1.0,
        device=None,
        plot_class=None,
        plot_frequency: int = 0,
        freeze_encoder: bool = False,
        verbose: bool = True,
        debug_mode: bool = True,
        precompute_features: bool = False,
        prebatch: bool | None = None,
        gram_pp: bool | None = None,
        streaming: bool | None = None,
        **kwargs,
    ):
        assert isinstance(model, RegAutoEncoder), (
            "model must be an object of the class RegAutoEncoder"
        )
        assert model.num_reg == len(eig_weights), (
            "number of weights does not match the number of eigenfunctions!"
        )
        pp_layer = as_pp_layer(pp_layer)
        super().__init__(
            traj_obj, pp_layer, model, model_path, learning_rate,
            load_model_filename, save_model_every_step, model.encoded_dim,
            batch_size, num_epochs, test_ratio, optimizer_name, device,
            plot_class, plot_frequency, verbose, debug_mode, **kwargs,
        )

        self.init_model_and_optimizer()

        self._traj_np = np.asarray(traj_obj.trajectory, dtype=default_dtype())
        self._weights_np = np.asarray(traj_obj.weights, dtype=default_dtype())

        self.alpha = float(alpha)
        self.gamma = [float(g) for g in gamma]
        self.eta = [float(e) for e in eta]
        self.num_reg = model.num_reg
        self.tot_dim = int(np.prod(self._traj_np.shape[1:]))
        self._eps = _EPS
        self._eig_w = list(eig_weights)
        self._cvec = None
        self.freeze_encoder = bool(freeze_encoder)

        self.traj_dt = float(traj_obj.dt)
        lag_ae_idx = lag_tau_ae / self.traj_dt
        lag_idx = lag_tau_reg / self.traj_dt
        assert (
            abs(lag_ae_idx - round(lag_ae_idx)) < 1e-6
            and abs(lag_idx - round(lag_idx)) < 1e-6
        ), (
            f"lag-times ({lag_tau_ae}, {lag_tau_reg}) not divisable by the "
            f"timestep {self.traj_dt} of the trajectory"
        )
        self.lag_ae_idx = int(round(lag_ae_idx))
        self.lag_idx = int(round(lag_idx))

        # STREAMING layout (trajectories larger than HBM): resolved BEFORE
        # eager preprocessing so that pass runs chunked (see
        # TrainingTask._stream_epochs). Device-resident estimate: one flat
        # copy per active lag offset.
        _n_copies = 1
        if float(alpha) > _EPS and self.lag_ae_idx > 0:
            _n_copies += 1
        if float(gamma[0]) + float(gamma[1]) > _EPS and self.lag_idx > 0:
            _n_copies += 1
        self._streaming = self._resolve_streaming(
            streaming, _n_copies * self._traj_np.nbytes
        )

        # optional eager preprocessing (docs/api.md option matrix). The AE
        # and encoder-constraint terms act on features (the reference takes
        # enc gradients w.r.t. r(x), core.py:910-911), so precompute is
        # valid unless the generator-type eigen regularizer (gamma on,
        # lag_tau_reg == 0) needs gradients through the raw coordinates.
        self.precompute_features = bool(precompute_features)
        if self.precompute_features:
            assert not (
                float(gamma[0]) + float(gamma[1]) > _EPS and self.lag_idx == 0
            ), (
                "precompute_features is incompatible with the generator "
                "eigen regularizer (gamma > 0 with lag_tau_reg == 0), which "
                "differentiates through the preprocessing layer"
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
            # keep self.preprocessing_layer intact for colvar_model();
            # only the in-loss preprocessing becomes the identity
            self._pp_for_loss = Identity()
        else:
            self._pp_for_loss = self.preprocessing_layer

        self._beta = float(beta)
        if self.gamma[0] + self.gamma[1] > self._eps:
            assert self.num_reg > 0, (
                "number of eigenfunctions must be positive!"
            )
            if self.lag_idx == 0:
                # identity diffusion matrix only, as in the reference
                # (core.py:852)
                self._diag_coeff = jnp.ones(self.tot_dim, dtype=default_dtype())
            else:
                self._diag_coeff = None
        else:
            self._diag_coeff = None

        # Gram-path generator regularizer (losses.reg_eigen_loss pp_gram;
        # same design as EigenFunctionTask.gram_pp): the frozen
        # preprocessing layer's input-jacobian Gram matrix is precomputed
        # per batch, every term then runs on precomputed features and the
        # per-step Dirichlet term never backprops through the
        # preprocessing layer. Default: on when the generator-type eigen
        # regularizer is active with a non-identity preprocessing layer
        # (resolved with the data layout in _prepare_data).
        from ..ops.features import Identity

        _gen_reg_on = (
            self.gamma[0] + self.gamma[1] > self._eps and self.lag_idx == 0
        )
        if gram_pp is None:
            self._gram_requested = _gen_reg_on and not isinstance(
                self._pp_for_loss, Identity
            )
        else:
            self._gram_requested = bool(gram_pp)
            assert not (self._gram_requested and not _gen_reg_on), (
                "gram_pp applies to the generator-type eigen regularizer "
                "only (gamma > 0 with lag_tau_reg == 0)"
            )
        self._gram_explicit = gram_pp is not None
        self._gram = False  # resolved with the data layout in _prepare_data

        # batch-data layout (docs/api.md option matrix): pre-gathered
        # per-batch tuples with the epoch body unrolled (the fast layout,
        # see core/eigenfunction.py), unless the trajectory is
        # frame-sharded, the gathered copies would be too large, or the
        # batch count exceeds the unroll limit (checked in _prepare_data)
        n_copies = 1
        if self.alpha > _EPS and self.lag_ae_idx > 0:
            n_copies += 1
        if self.gamma[0] + self.gamma[1] > _EPS and self.lag_idx > 0:
            n_copies += 1
        if self._streaming:
            # batches arrive pre-gathered (from the host) in the prebatch
            # tuple format; gram/unroll are device-side layouts
            self._prebatch = True
            assert prebatch is not False, (
                "streaming=True gathers batches on the host (the prebatch "
                "tuple format); prebatch=False selects the on-device "
                "gather layout, which requires device-resident data"
            )
        elif prebatch is None:
            self._prebatch = (
                not self.shard_trajectory
                and n_copies * self._traj_np.nbytes
                <= self.PREBATCH_AUTO_LIMIT_BYTES
            )
        else:
            self._prebatch = bool(prebatch)
            assert not (self._prebatch and self.shard_trajectory), (
                "prebatch=True is incompatible with shard_trajectory: the "
                "frame-sharded layout requires per-step gathers"
            )
        self._unroll = False  # decided per data layout in _prepare_data

        if self.verbose:
            print(
                "\nShape of trajectory data array:\n {}".format(
                    self._traj_np.shape
                ),
                flush=True,
            )


    @property
    def _traj_flat(self):
        """Trajectory flattened to [n, prod(state)] — the on-device layout
        (flat 2-D gathers are 3-5x faster than N-D gathers on TPU)."""
        return self._traj_np.reshape(self._traj_np.shape[0], -1)

    # ------------------------------------------------------------------
    def colvar_model(self) -> ColvarModel:
        r"""CV model: preprocessing layer + encoder
        (reference core.py:861-868)."""
        return ColvarModel(self.preprocessing_layer, self.model.encoder)

    def reg_model(self):
        r"""Regularizer (eigenfunction) model: preprocessing layer +
        reordered reg heads on the latent space
        (reference core.py:870-882)."""
        if self._cvec is None:
            self._cvec = np.arange(self.model.num_reg)
        reg_reordered = RegModel(self.model, self._cvec)
        return ColvarModel(self.preprocessing_layer, reg_reordered)

    # ------------------------------------------------------------------
    # per-term loss surface (reference core.py:884-1034) — thin method
    # wrappers over the pure loss functions in core/losses.py, kept so
    # reference users find the same callable names on the task object
    def weighted_MSE_loss(self, X, X_lagged, weight):
        r"""Time-lagged reconstruction loss (reference core.py:884-897)."""
        return weighted_mse_lagged_loss(
            self.model.forward_ae, self._pp_for_loss,
            jnp.asarray(X), jnp.asarray(X_lagged), jnp.asarray(weight),
        )

    def reg_enc_grad_loss(self, X, weight):
        r"""Squared L2 norm of encoder feature-gradients
        (reference core.py:899-920)."""
        return enc_grad_loss(
            self.model.encoder, self._pp_for_loss,
            jnp.asarray(X), jnp.asarray(weight), self.k,
        )

    def reg_enc_norm_loss(self, X, weight):
        r"""Penalty on encoder-component variances
        (reference core.py:922-944)."""
        return enc_norm_loss(
            self.model.encoder, self._pp_for_loss,
            jnp.asarray(X), jnp.asarray(weight), self.k,
        )

    def reg_enc_orthognal_loss(self, X, weight):
        r"""Penalty on pairwise encoder-component covariances (reference
        core.py:946-973; the reference's spelling is preserved)."""
        return enc_orthogonality_loss(
            self.model.encoder, self._pp_for_loss,
            jnp.asarray(X), jnp.asarray(weight), self.k,
        )

    def reg_eigen_loss(self, X, weight, X_lagged, weight_lagged):
        r"""Eigenfunction regularization on the reg heads (reference
        core.py:975-1034). Returns ``(eig_vals, non_penalty, penalty,
        cvec)``."""
        return reg_eigen_loss(
            self.model, self._pp_for_loss,
            jnp.asarray(X), jnp.asarray(weight),
            None if X_lagged is None else jnp.asarray(X_lagged),
            None if weight_lagged is None else jnp.asarray(weight_lagged),
            num_reg=self.num_reg,
            eig_w=jnp.asarray(self._eig_w, dtype=default_dtype()),
            beta=self._beta,
            diag_coeff=self._diag_coeff,
            lag_idx=self.lag_idx,
            traj_dt=self.traj_dt,
        )

    # ------------------------------------------------------------------
    def _static_config(self):
        """Hashable tuple of everything baked into the compiled epoch
        program (see core/eigenfunction.py for the shared-cache design).
        Term on/off gates are static (disabled terms compile out); the
        term weights themselves (alpha/gamma/eta/eig_weights/beta) are
        traced via :meth:`_hyper`, and lr rides in the optimizer state —
        a sweep over any of them shares one compiled program."""
        return (
            tuple(self._traj_np.shape[1:]),
            self.k,
            self.num_reg,
            self.alpha > _EPS,
            self.gamma[0] + self.gamma[1] > _EPS,
            tuple(e > _EPS for e in self.eta),
            self.lag_ae_idx,
            self.lag_idx,
            self.traj_dt,
            self.freeze_encoder,
            self.optimizer_name.lower(),
            self._prebatch,
            self._unroll,
            self._gram,
        )

    def _hyper(self):
        """Traced loss-constant arguments of the compiled epoch program."""
        dt = default_dtype()
        return (
            jnp.asarray(self.alpha, dtype=dt),
            jnp.asarray(self.gamma, dtype=dt),
            jnp.asarray(self.eta, dtype=dt),
            jnp.asarray(
                self._eig_w if self._eig_w else np.zeros(0), dtype=dt
            ),
            jnp.asarray(self._beta, dtype=dt),
        )

    def _batch_loss(self, model, traj, weights, idx):
        """All gated loss terms for one index batch
        (reference core.py:1069-1135); kept as a method for direct use —
        the compiled epoch programs use the module-level equivalent."""
        loss_static = self._static_config()[:9]
        return _regae_batch_loss(
            loss_static, model, self._pp_for_loss, self._diag_coeff,
            self._hyper(),
            _regae_gather(loss_static, traj, weights, idx),
        )

    def _get_multi_epoch_fn(self, length: int):
        return _multi_epoch_fn(
            length, self._static_config(),
            lr=float(self.learning_rate),
        )

    # ------------------------------------------------------------------
    def _prepare_data(self):
        """Device-placed data arguments of the multi-epoch program +
        batch schedules, cached across ``train()`` calls (see
        core/eigenfunction.py for the rationale)."""
        cached = getattr(self, "_prepared_data_cache", None)
        if cached is not None:
            return cached
        train_idx, test_idx = self._lagged_split(
            max(self.lag_idx, self.lag_ae_idx)
        )

        train_b = self._make_batches(train_idx, self.batch_size)
        test_b = self._make_batches(test_idx, self.batch_size)

        if self._streaming:
            # STREAMING layout: nothing is placed on device here — the
            # trajectory stays host-resident (possibly memory-mapped) and
            # _stream_pack gathers each batch just-in-time in train()
            self._unroll = False
            self._gram = False
            data_args = None
        elif self._prebatch:
            self._unroll = (
                len(train_b) + len(test_b) <= self.PREBATCH_UNROLL_LIMIT
            )
            # pre-gather each batch's (X, X_ae_lagged, X_l, w, w_l) once
            # on device, as FLAT [., prod(state)] leaves (reshaped in the
            # epoch body); the body unrolls over per-batch tuples up to
            # the unroll limit and scans a stacked [nb, B, ...] layout
            # above it
            flat_d = jnp.asarray(self._traj_flat)
            w_d = jnp.asarray(self._weights_np)
            feat_shape = self._traj_flat.shape[1:]
            alpha_ae_on = self.alpha > _EPS and self.lag_ae_idx > 0
            eig_lag_on = (
                self.gamma[0] + self.gamma[1] > _EPS and self.lag_idx > 0
            )

            # resolve the Gram generator-regularizer path (see __init__):
            # unrolled layout only, and the per-batch M tensors must fit
            self._gram = self._gram_requested and self._unroll
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
                            "the vjp regularizer path",
                            flush=True,
                        )

            def pack_flat(rows):
                shape = tuple(np.shape(rows))
                bd = jnp.asarray(np.asarray(rows).reshape(-1))

                def g(offset):
                    return flat_d[bd + offset].reshape(shape + feat_shape)

                Xf = g(0)
                Xaef = g(self.lag_ae_idx) if alpha_ae_on else None
                if eig_lag_on:
                    Xlf = g(self.lag_idx)
                    w_l = w_d[bd + self.lag_idx].reshape(shape)
                else:
                    Xlf = w_l = None
                return (Xf, Xaef, Xlf, w_d[bd].reshape(shape), w_l)

            if self._unroll:
                # per-batch leaves are [B, ...] with the batch dim
                # LEADING: mesh placement shards axis 0 (shard_batches
                # targets axis 1 of stacked [nb, B, ...] arrays)
                if self.mesh is not None:
                    from ..parallel.mesh import shard_frames

                    place = lambda t: shard_frames(t, self.mesh)  # noqa: E731
                else:
                    place = self._place_batched
                if self._gram:
                    from .eigenfunction import _feat_fn, _gram_fn

                    state_shape = tuple(self._traj_np.shape[1:])
                    gf = _gram_fn(state_shape, self.tot_dim)
                    ff = _feat_fn(state_shape)

                    def pack_gram(rows):
                        bd = jnp.asarray(np.asarray(rows).reshape(-1))
                        H, M = gf(
                            self._pp_for_loss, self._diag_coeff, flat_d[bd]
                        )
                        Hae = (
                            ff(self._pp_for_loss,
                               flat_d[bd + self.lag_ae_idx])
                            if alpha_ae_on else None
                        )
                        return (H, Hae, M, w_d[bd])

                    pack = pack_gram
                else:
                    pack = pack_flat
                data_args = (
                    place(tuple(pack(row) for row in train_b)),
                    place(tuple(pack(row) for row in test_b)),
                )
            else:
                data_args = (
                    self._place_batched(pack_flat(train_b)),
                    self._place_batched(pack_flat(test_b)),
                )
        elif self.shard_trajectory and self.mesh is not None:
            # long-trajectory scaling (SURVEY.md §5): the frame axis is
            # sharded across the mesh so trajectories larger than one
            # chip's HBM can be trained on; per-batch (lagged) gathers
            # become XLA collectives over ICI
            from ..parallel.mesh import shard_frames

            traj = shard_frames(jnp.asarray(self._traj_flat), self.mesh,
                                    pad=True)
            weights = shard_frames(jnp.asarray(self._weights_np), self.mesh,
                                   pad=True)
            data_args = (
                traj, weights,
                self._place_batched(train_b), self._place_batched(test_b),
            )
        else:
            traj = self._place_replicated(jnp.asarray(self._traj_flat))
            weights = self._place_replicated(jnp.asarray(self._weights_np))
            data_args = (
                traj, weights,
                self._place_batched(train_b), self._place_batched(test_b),
            )
        if self._gram_requested and self._gram_explicit and not self._gram:
            import warnings

            warnings.warn(
                "gram_pp=True could not be honored (it requires the "
                "prebatched-unrolled layout and per-batch Gram tensors "
                "within GRAM_AUTO_LIMIT_BYTES); training uses the vjp "
                "regularizer path"
            )
        self._prepared_data_cache = (data_args, train_b, test_b)
        return self._prepared_data_cache

    def _stream_pack(self, rows):
        """Host gather of one batch in the prebatch tuple format —
        ``(Xf, Xaef, Xlf, w, w_l)`` with None pieces for disabled terms —
        from the host-resident flat trajectory (works unchanged on a
        ``np.memmap``)."""
        flat = self._traj_flat
        wts = self._weights_np
        bd = np.asarray(rows, dtype=np.int64).reshape(-1)
        if self._sorted_gather(flat):
            bd = np.sort(bd)  # quasi-sequential memmap sweep; the batch
            # losses are permutation-invariant (task.py _sorted_gather)
        shape = tuple(np.shape(rows))
        feat_shape = flat.shape[1:]
        alpha_ae_on = self.alpha > _EPS and self.lag_ae_idx > 0
        eig_lag_on = (
            self.gamma[0] + self.gamma[1] > _EPS and self.lag_idx > 0
        )

        def g(offset):
            return np.asarray(flat[bd + offset]).reshape(shape + feat_shape)

        Xf = g(0)
        Xaef = g(self.lag_ae_idx) if alpha_ae_on else None
        if eig_lag_on:
            Xlf = g(self.lag_idx)
            w_l = np.asarray(wts[bd + self.lag_idx]).reshape(shape)
        else:
            Xlf = w_l = None
        return (Xf, Xaef, Xlf, np.asarray(wts[bd]).reshape(shape), w_l)

    def train(self):
        r"""Train the model (reference core.py:1036-1217)."""
        data_args, train_b, test_b = self._prepare_data()
        model = self._place_replicated(self._protect(self.model))
        opt_state = self._place_replicated(self._protect(self.opt_state))

        self._print_train_banner(train_b, test_b)

        loss_names = (
            ["loss", "ae_loss", "eigen_non_penalty", "eigen_penalty"]
            + ["eig_%d" % i for i in range(self.num_reg)]
            + ["encoder_gradient", "encoder_norm", "encoder_orthogonality"]
        )
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
                            self._diag_coeff, self._hyper(), *data_args
                        )
                    )
                # ONE device->host fetch for both metric arrays (each
                # fetch is a full tunnel round trip)
                train_cm, test_cm = jax.device_get((train_cm, test_cm))
                chunk_time = (_time.perf_counter() - _t0) / chunk
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
                    self.plot_class.plot(
                        self.colvar_model(), self.reg_model(), epoch=e
                    )

        self.model = model
        self.opt_state = opt_state
        self.train_loss_df = losses_to_dataframe(train_means, loss_names)
        self.test_loss_df = losses_to_dataframe(test_means, loss_names)
