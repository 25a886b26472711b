r"""Fused Pallas kernels for the transfer-operator eigenfunction step.

Motivation (benchmarks/RESULTS.md, "Unrolled batch layout" + ablation):
after all layout work, the 20k-sample gradient step still costs ~0.78 ms
of device time of which ~0.42 ms is FIXED — per-kernel overhead of the
~hundreds of small XLA ops the step compiles to (the same step at batch
80k costs only 2.6x more). The fix is structural: collapse the entire
loss forward AND parameter backward into two Pallas kernels.

Key observation: the transfer-operator loss (reference core.py:428-455)
depends on the batch only through a handful of weighted statistics of the
head outputs ``y = mlp(F)`` and ``y_l = mlp(F_l)``:

====================  ====================================================
``tw, twl``           Σ w, Σ w_l
``s1, s2``            Σ w y, Σ w y²                 (per head)
``s1l, s2l``          Σ w_l y_l, Σ w_l y_l²         (per head)
``sd``                Σ w (y_l − y)²                (per head)
``sc``                Σ w y_i y_j                   (per head pair i<j)
====================  ====================================================

so the step factors into ``loss = g(stats(params, F, F_l, w, w_l))`` where
``g`` is a tiny O(k²) function. :func:`transfer_stats` computes the stats
vector with ONE Pallas kernel (per-tile stacked-MLP forward + accumulated
partial sums; TPU grids are sequential, so all tiles accumulate into one
output block), and its ``custom_vjp`` backward is ONE more kernel that
recomputes the activations per tile, forms the per-sample co-gradients
``dy, dy_l`` from ``dL/dstats`` (each stat is linear in per-sample terms),
backpropagates through the MLP locally, and accumulates parameter-gradient
partials. The surrounding program (``g``, Adam) stays in XLA.

Gradients flow to the MLP parameters ONLY — ``F, F_l, w, w_l`` receive
zero cotangents (they are data in this task; the generator loss, which
needs input gradients, does not use this path).

Numerics: per-tile f32 accumulation in tile order differs from XLA's
reduction tree by O(1e-7) relative — the fused path is therefore opt-in
via ``EigenFunctionTask(fused_step=True)`` with its error budget
documented, not a silent default.

On non-TPU backends the kernels run in interpreter mode, so the CPU test
suite exercises the exact same code path (pattern as in kabsch_pallas).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "transfer_stats",
    "transfer_stats_reference",
    "stats_layout",
    "eigen_loss_from_stats",
    "params_t_of",
]

TILE_B = 1024  # 2048 measured identical but leaves no scoped-VMEM headroom (the bwd kernel OOMs at very large padded batches)
_LANES = 128


from ..models.module import _tanh_precise as _act  # single tanh source
from .kabsch_pallas import _should_interpret


def stats_layout(k: int):
    """Index layout of the stats vector; returns (n_stats, index dict)."""
    idx = {"tw": 0, "twl": 1}
    pos = 2
    for name in ("s1", "s2", "s1l", "s2l", "sd"):
        idx[name] = pos
        pos += k
    idx["sc"] = pos
    pos += k * (k - 1) // 2
    return pos, idx


def _pairs(k: int):
    return [(i, j) for i in range(k) for j in range(i + 1, k)]


# ---------------------------------------------------------------------------
# jnp oracle (single source of truth for the math; used by tests and as
# the shape/semantics spec of the kernels)
# ---------------------------------------------------------------------------


def _mlp_heads(params_t, x):
    """Stacked-MLP forward on [B, d] -> y [B, k] for transposed params
    (tuples of (W_t [k, h_in, h_out], b [k, h_out]))."""
    from ..config import matmul_precision

    k = params_t[0][0].shape[0]
    ys = []
    for kk in range(k):
        h = x
        for li, (w_t, b) in enumerate(params_t):
            h = jnp.matmul(
                h, w_t[kk], precision=matmul_precision()
            ) + b[kk]
            if li < len(params_t) - 1:
                h = _act(h)
        ys.append(h[:, 0])
    return jnp.stack(ys, axis=1)


def transfer_stats_reference(params_t, F, F_l, w, w_l):
    """jnp implementation of the stats vector (the kernel oracle)."""
    k = params_t[0][0].shape[0]
    y = _mlp_heads(params_t, F)
    y_l = _mlp_heads(params_t, F_l)
    parts = [
        w.sum()[None],
        w_l.sum()[None],
        (y * w[:, None]).sum(axis=0),
        (y**2 * w[:, None]).sum(axis=0),
        (y_l * w_l[:, None]).sum(axis=0),
        (y_l**2 * w_l[:, None]).sum(axis=0),
        (((y_l - y) ** 2) * w[:, None]).sum(axis=0),
    ]
    sc = [
        (y[:, i] * y[:, j] * w).sum()[None] for (i, j) in _pairs(k)
    ]
    return jnp.concatenate(parts + sc)


# ---------------------------------------------------------------------------
# fused kernels (block-diagonal formulation)
#
# A first kernel version evaluated the k heads and the x / x_lagged passes
# as separate small dots: 16 MXU ops per tile, and the forward kernel
# alone cost 0.58 ms at batch 20k -- per-dot overhead, same disease as the
# XLA graph. This version concatenates both passes along the batch axis
# and fuses the k heads into block-diagonal weight matrices, so a tile is
# 4 forward dots + 1 dot for the <y_i, y_j> Gram matrix (and ~7 in the
# backward), each k-fold larger.
# ---------------------------------------------------------------------------


def _fwd_kernel_factory(dims: Tuple[int, ...], k: int, precision):
    """Forward stats kernel over fused block-diagonal weights.

    All statistics are columns of one per-sample integrand matrix
    ``A [2T, 128]`` reduced by a single ``[8, 2T] @ [2T, 128]`` matmul —
    scalar extraction / re-broadcast inside a Mosaic kernel costs ~2 us
    apiece (a first version assembling the 13 stats from scalars spent
    0.4 ms on it), so the kernel is built entirely from vector ops and
    six MXU dots per tile.

    Inputs: F [TILE, d], Fl [TILE, d], w / wl as [TILE, 1] columns, then
    per-layer fused (W, b) refs. Output: one [8, LANES] accumulator tile;
    row 0 carries the stats (kernel-order layout, see _KERNEL_COLS).
    """
    n_layers = len(dims) - 1
    n_stats, _ = stats_layout(k)

    def kernel(f_ref, fl_ref, w_ref, wl_ref, *wb_refs):
        out_ref = wb_refs[-1]
        wb = wb_refs[:-1]

        w = w_ref[...]   # [TILE, 1]
        wl = wl_ref[...]

        # both passes in one batch: rows [:T] = x, rows [T:] = x_lagged
        z = jnp.concatenate([f_ref[...], fl_ref[...]], axis=0)
        for li in range(n_layers):
            z = jnp.dot(
                z, wb[2 * li][...], preferred_element_type=jnp.float32, precision=precision
            ) + wb[2 * li + 1][0, :][None, :]
            if li < n_layers - 1:
                z = _act(z)
        T = f_ref.shape[0]
        Y = z[:T]       # [T, k]
        Yl = z[T:]      # [T, k]
        dYd = Yl - Y

        # per-sample integrand columns (kernel-order layout)
        cols = [w, wl, w * Y, w * Y * Y, wl * Yl, wl * Yl * Yl,
                w * dYd * dYd]
        # cross products via lane rolls: block r has columns
        # w * y_i * y_{(i + r) mod k}
        for r in range(1, k):
            ri = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
            roll_mat = jnp.where((ci - ri) % k == r, 1.0, 0.0)
            Yr = jnp.dot(
                Y, roll_mat, preferred_element_type=jnp.float32,
                precision=precision,
            )
            cols.append(w * Y * Yr)
        m = 2 + 5 * k + (k - 1) * k
        cols.append(jnp.zeros((T, _LANES - m), jnp.float32))
        A = jnp.concatenate(cols, axis=1)  # [T, LANES]

        # single-dot reduction into row 0 of the accumulator
        rsel = jax.lax.broadcasted_iota(jnp.int32, (8, T), 0)
        ones_row = jnp.where(rsel == 0, 1.0, 0.0)
        acc = jnp.dot(
            ones_row, A, preferred_element_type=jnp.float32,
            precision=precision,
        )

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] += acc

    return kernel, n_stats


def _kernel_cols_to_stats(row, k):
    """Reorder the kernel-layout stats row into the stats_layout vector."""
    m_base = 2 + 5 * k
    base = row[:m_base]
    pairs = []
    for (i, j) in _pairs(k):
        # roll block r, column c holds w * y_c * y_{(c - r) % k}
        r = (j - i) % k
        pairs.append(row[m_base + (r - 1) * k + j])
    return jnp.concatenate([base, jnp.stack(pairs)]) if pairs else base


def _bwd_kernel_factory(dims: Tuple[int, ...], k: int, precision):
    """Backward: recompute block-form activations, build the per-sample
    output cotangents dY from dL/dstats (each stat is linear in
    per-sample terms), backpropagate through the fused layers, accumulate
    fused-gradient partials (off-diagonal blocks are discarded on the
    host).

    Inputs: F, Fl, w-tiles, wl-tiles, fused (W, b) per layer, ds (SMEM).
    Outputs: fused (dW, db) per layer.
    """
    n_layers = len(dims) - 1
    pairs = _pairs(k)

    def kernel(f_ref, fl_ref, w_ref, wl_ref, *refs):
        wb = refs[: 2 * n_layers]
        ds_ref = refs[2 * n_layers]
        outs = refs[2 * n_layers + 1:]

        w = w_ref[...]   # [TILE, 1]
        wl = wl_ref[...]

        def ds(i):
            return ds_ref[0, i]

        o_s1, o_s2 = 2, 2 + k
        o_s1l, o_s2l = 2 + 2 * k, 2 + 3 * k
        o_sd = 2 + 4 * k
        o_sc = 2 + 5 * k

        # forward, saving post-activation values (block form)
        z = jnp.concatenate([f_ref[...], fl_ref[...]], axis=0)
        acts = [z]
        for li in range(n_layers):
            z = jnp.dot(
                z, wb[2 * li][...], preferred_element_type=jnp.float32, precision=precision
            ) + wb[2 * li + 1][0, :][None, :]
            if li < n_layers - 1:
                z = _act(z)
                acts.append(z)
        T = f_ref.shape[0]
        Y = z[:T]
        Yl = z[T:]
        dYd = Yl - Y

        # [k] coefficient rows from the dstats scalars
        r_s1 = jnp.stack([ds(o_s1 + i) for i in range(k)])
        r_s2 = jnp.stack([ds(o_s2 + i) for i in range(k)])
        r_s1l = jnp.stack([ds(o_s1l + i) for i in range(k)])
        r_s2l = jnp.stack([ds(o_s2l + i) for i in range(k)])
        r_sd = jnp.stack([ds(o_sd + i) for i in range(k)])
        # symmetric cross matrix M[i, j] = dS_sc(i,j), zero diagonal
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        M = jnp.zeros((k, k), jnp.float32)
        for pi, (i, j) in enumerate(pairs):
            hit = ((lane_i == i) & (lane_j == j)) | (
                (lane_i == j) & (lane_j == i)
            )
            M = M + jnp.where(hit, ds(o_sc + pi), 0.0)

        cross = jnp.dot(
            Y, M, preferred_element_type=jnp.float32, precision=precision,
        )
        dY = w * (
            r_s1[None, :] + 2.0 * r_s2[None, :] * Y
            - 2.0 * r_sd[None, :] * dYd + cross
        )
        dYl = wl * (
            r_s1l[None, :] + 2.0 * r_s2l[None, :] * Yl
        ) + 2.0 * w * r_sd[None, :] * dYd

        @pl.when(pl.program_id(0) == 0)
        def _():
            for o in outs:
                o[...] = jnp.zeros_like(o)

        g = jnp.concatenate([dY, dYl], axis=0)
        for li in range(n_layers - 1, -1, -1):
            # dW_li += acts[li]^T @ g (contract the batch dim directly)
            outs[2 * li][...] += jax.lax.dot_general(
                acts[li], g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            outs[2 * li + 1][...] += jnp.sum(g, axis=0)[None, :]
            if li > 0:
                g = jax.lax.dot_general(
                    g, wb[2 * li][...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )
                g = g * (1.0 - acts[li] * acts[li])

    return kernel


# ---------------------------------------------------------------------------
# host-side plumbing
# ---------------------------------------------------------------------------


def _pad_rows(x, Bp):
    """Pad the batch axis to Bp (padded weights are 0, so padded rows
    contribute nothing to any statistic)."""
    B = x.shape[0]
    pad = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x.astype(jnp.float32), pad)


def _kernel_precision():
    """Mosaic supports only DEFAULT and HIGHEST dot precision; the
    framework's HIGH default rounds UP to HIGHEST inside the kernels
    (strictly more accurate, and the kernel dots are a small fraction of
    the step cost)."""
    from ..config import matmul_precision

    p = matmul_precision()
    if p == jax.lax.Precision.DEFAULT:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def _fuse_params(params_t):
    """Per-head (W_t [k, h_in, h_out], b [k, h_out]) -> fused matrices:
    layer 0 is a column-concat [d, k*h_out] (all heads share the input);
    deeper layers are block-diagonal [k*h_in, k*h_out]; biases are
    concatenated as [1, k*h_out] rows."""
    import jax.scipy.linalg as jsl

    k = params_t[0][0].shape[0]
    flat = []
    for li, (w_t, b) in enumerate(params_t):
        w_t = w_t.astype(jnp.float32)
        if li == 0:
            fused = jnp.concatenate([w_t[kk] for kk in range(k)], axis=1)
        else:
            fused = jsl.block_diag(*[w_t[kk] for kk in range(k)])
        flat.append(fused)
        flat.append(
            jnp.concatenate(
                [b[kk] for kk in range(k)]
            ).astype(jnp.float32)[None, :]
        )
    return flat


def _unfuse_grads(flat_grads, params_t):
    """Extract per-head gradient blocks from the fused gradients (the
    cross-head blocks of a block-diagonal layer's gradient correspond to
    its structural zeros and are discarded)."""
    k = params_t[0][0].shape[0]
    out = []
    for li, (w_t, b) in enumerate(params_t):
        h_in, h_out = w_t.shape[1], w_t.shape[2]
        gW = flat_grads[2 * li]
        gb = flat_grads[2 * li + 1][0]
        if li == 0:
            dW = jnp.stack(
                [gW[:, kk * h_out:(kk + 1) * h_out] for kk in range(k)]
            )
        else:
            dW = jnp.stack(
                [
                    gW[kk * h_in:(kk + 1) * h_in,
                       kk * h_out:(kk + 1) * h_out]
                    for kk in range(k)
                ]
            )
        db = jnp.stack(
            [gb[kk * h_out:(kk + 1) * h_out] for kk in range(k)]
        )
        out.append((dW, db))
    return tuple(out)


def _data_specs(d):
    # sample weights arrive as [Bp, 1] columns with (TILE, 1) blocks
    # (lane dim equal to the array dim is allowed); the column broadcasts
    # directly against [TILE, k] head outputs
    return [
        pl.BlockSpec((TILE_B, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_B, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(
    jax.jit, static_argnames=("dims", "k", "interpret", "precision")
)
def _stats_fwd_impl(params_flat, F, F_l, w, w_l, *, dims, k, interpret,
                    precision):
    B = F.shape[0]
    nb = max(1, -(-B // TILE_B))
    Bp = nb * TILE_B
    Fp, Flp = _pad_rows(F, Bp), _pad_rows(F_l, Bp)
    wp = _pad_rows(w, Bp)[:, None]
    wlp = _pad_rows(w_l, Bp)[:, None]

    kernel, n_stats = _fwd_kernel_factory(dims, k, precision)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    in_specs = _data_specs(dims[0]) + [full(p.shape) for p in params_flat]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, _LANES), jnp.float32),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=full((8, _LANES)),
        cost_estimate=pl.CostEstimate(
            flops=4 * Bp * k * sum(
                a * b for a, b in zip(dims[:-1], dims[1:])
            ),
            bytes_accessed=2 * Bp * (dims[0] + 1) * 4,
            transcendentals=2 * Bp * k * sum(dims[1:-1]),
        ),
        interpret=interpret,
    )(Fp, Flp, wp, wlp, *params_flat)
    return _kernel_cols_to_stats(out[0], k)


@functools.partial(
    jax.jit, static_argnames=("dims", "k", "interpret", "precision")
)
def _stats_bwd_impl(params_flat, F, F_l, w, w_l, d_stats, *, dims, k,
                    interpret, precision):
    B = F.shape[0]
    nb = max(1, -(-B // TILE_B))
    Bp = nb * TILE_B
    Fp, Flp = _pad_rows(F, Bp), _pad_rows(F_l, Bp)
    wp = _pad_rows(w, Bp)[:, None]
    wlp = _pad_rows(w_l, Bp)[:, None]
    n_stats, _ = stats_layout(k)
    n_pad = -(-n_stats // 8) * 8
    ds_smem = jnp.zeros((1, n_pad), jnp.float32).at[0, :n_stats].set(
        d_stats.astype(jnp.float32)
    )

    kernel = _bwd_kernel_factory(dims, k, precision)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    in_specs = (
        _data_specs(dims[0])
        + [full(p.shape) for p in params_flat]
        + [pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)]
    )

    out_shapes = [
        jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params_flat
    ]
    grads = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[full(p.shape) for p in params_flat],
        cost_estimate=pl.CostEstimate(
            flops=12 * Bp * k * sum(
                a * b for a, b in zip(dims[:-1], dims[1:])
            ),
            bytes_accessed=2 * Bp * (dims[0] + 1) * 4,
            transcendentals=2 * Bp * k * sum(dims[1:-1]),
        ),
        interpret=interpret,
    )(Fp, Flp, wp, wlp, *params_flat, ds_smem)
    return grads


def _dims_of(params_t) -> Tuple[int, ...]:
    dims = [params_t[0][0].shape[1]]
    for (w_t, _) in params_t:
        dims.append(w_t.shape[2])
    return tuple(dims)


@jax.custom_vjp
def transfer_stats(params_t, F, F_l, w, w_l):
    """Batch statistics of the transfer-operator loss (see module
    docstring), computed by one fused Pallas kernel.

    Args:
        params_t: tuple of per-layer ``(W_t [k, h_in, h_out],
            b [k, h_out])`` — note the TRANSPOSED weight layout.
        F / F_l: preprocessed feature batches [B, d].
        w / w_l: sample weights [B].

    Returns:
        stats [n_stats] float32 (layout per :func:`stats_layout`).

    The custom VJP backpropagates to ``params_t`` ONLY; the data inputs
    receive zero cotangents.
    """
    dims = _dims_of(params_t)
    k = params_t[0][0].shape[0]
    return _stats_fwd_impl(
        _fuse_params(params_t), F, F_l, w, w_l,
        dims=dims, k=k, interpret=_should_interpret(),
        precision=_kernel_precision(),
    )


def _ts_fwd(params_t, F, F_l, w, w_l):
    return transfer_stats(params_t, F, F_l, w, w_l), (params_t, F, F_l, w, w_l)


def _ts_bwd(res, d_stats):
    params_t, F, F_l, w, w_l = res
    dims = _dims_of(params_t)
    k = params_t[0][0].shape[0]
    flat_grads = _stats_bwd_impl(
        _fuse_params(params_t), F, F_l, w, w_l, d_stats,
        dims=dims, k=k, interpret=_should_interpret(),
        precision=_kernel_precision(),
    )
    d_params = _unfuse_grads(flat_grads, params_t)
    return (
        d_params,
        jnp.zeros_like(F),
        jnp.zeros_like(F_l),
        jnp.zeros_like(w),
        jnp.zeros_like(w_l),
    )


transfer_stats.defvjp(_ts_fwd, _ts_bwd)


# ---------------------------------------------------------------------------
# loss on top of the stats (used by EigenFunctionTask(fused_step=True))
# ---------------------------------------------------------------------------


def eigen_loss_from_stats(
    stats, *, k: int, alpha: float, eig_w, lag_idx: int, traj_dt: float,
    sort_eigvals: bool,
):
    """Transfer-operator eigen loss computed from the stats vector.

    Mirrors core.losses.eigen_loss's transfer-operator branch (reference
    core.py:428-455) including the preserved numerator/denominator
    indexing quirk; returns ``(loss, (eig_vals, non_penalty, penalty,
    cvec))``.
    """
    _, ix = stats_layout(k)
    tw, twl = stats[0], stats[1]
    s1 = stats[ix["s1"]:ix["s1"] + k]
    s2 = stats[ix["s2"]:ix["s2"] + k]
    s1l = stats[ix["s1l"]:ix["s1l"] + k]
    s2l = stats[ix["s2l"]:ix["s2l"] + k]
    sd = stats[ix["sd"]:ix["sd"] + k]
    sc = stats[ix["sc"]:]

    means = s1 / tw
    variances = s2 / tw - means**2
    means_l = s1l / twl
    variances_l = s2l / twl - means_l**2
    quot_unsorted_num = sd / tw
    quotients = (
        quot_unsorted_num / (variances + variances_l)
    ) / (traj_dt * lag_idx)
    eig_vals = jax.lax.stop_gradient(quotients)
    if sort_eigvals:
        cvec = jnp.argsort(eig_vals)
        eig_vals = eig_vals[cvec]
    else:
        cvec = jnp.arange(k)

    eig_w_arr = jnp.asarray(eig_w, dtype=stats.dtype)
    # preserved reference quirk (core.py:440): unsorted numerator,
    # sorted denominator
    denom = variances[cvec] + variances_l[cvec]
    non_penalty = (
        (eig_w_arr * quot_unsorted_num / denom).sum() / (traj_dt * lag_idx)
    )
    penalty = ((variances - 1.0) ** 2).sum()
    for pi, (i, j) in enumerate(_pairs(k)):
        cov = sc[pi] / tw - means[i] * means[j]
        penalty = penalty + cov**2
    loss = non_penalty + alpha * penalty
    return loss, (eig_vals, non_penalty, penalty, cvec)


def params_t_of(model) -> tuple:
    """Transposed-parameter view of an EigenFunctions model for
    :func:`transfer_stats`."""
    return tuple(
        (jnp.swapaxes(layer["weight"], 1, 2), layer["bias"])
        for layer in model.params
    )
