r"""Enhanced sampling along learned collective variables.

The reference's deployment story is: train a CV, export it, and hand it to
an MD engine for biased sampling (its TorchScript artifact exists for
exactly this — reference: colvarsfinder/core.py:212-227 — and its MD
sampler accepts a PLUMED bias script, reference utils.py:220-223). This
module closes that loop natively for the built-in SDE sampler: a trained
:class:`~colvarsfinder_tpu.export.ColvarModel` (or any jax-traceable
callable) can drive

* **umbrella sampling** — :class:`BiasedPotential` composes
  ``V(x) + bias(cv(x))`` into a potential object that plugs straight into
  :func:`~colvarsfinder_tpu.utils.sampling.integrate_sde_overdamped`;
* **(well-tempered) metadynamics** — :func:`integrate_sde_metadynamics`
  runs the entire metadynamics loop (integration + periodic hill
  deposition + history-dependent bias forces) as ONE jitted ``lax.scan``
  program: the hill pool lives in the scan carry on device, the bias force
  is ``jax.grad`` through the hill sum and the CV model, and no Python
  executes between hills.

TPU design notes: hills are a fixed-size [n_hills, cv_dim] buffer
(zero-height entries contribute nothing), so shapes are static; each
deposition block draws its Brownian increments in one counter-based batch
(same scheme as the plain sampler); multiple walkers vmap over the whole
program with independent hill pools.
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from functools import partial
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "BiasedPotential",
    "harmonic_restraint",
    "integrate_sde_metadynamics",
    "integrate_sde_umbrella",
    "integrate_sde_remd",
    "MetadynamicsResult",
    "MBARResult",
    "mbar_weights",
    "UmbrellaResult",
    "REMDResult",
    "PlumedHills",
    "read_plumed_hills",
    "read_plumed_colvar",
    "metad_frame_weights",
]


def harmonic_restraint(center, kappa: float) -> Callable:
    """Umbrella restraint ``0.5 * kappa * |s - center|^2`` on a CV value."""
    center = jnp.asarray(center, dtype=jnp.float32)

    def bias(s):
        d = jnp.asarray(s, dtype=jnp.float32).reshape(-1) - center.reshape(-1)
        return 0.5 * kappa * jnp.sum(d * d)

    return bias


class BiasedPotential:
    """``V_b(x) = V(x) + bias(cv(x))`` as a sampler-ready potential object.

    Satisfies the ``dim / beta / V`` contract of
    :func:`integrate_sde_overdamped` (``gradV`` is derived by ``jax.grad``
    inside the sampler, flowing through both the base potential and the CV
    model). ``cv_model`` is any jax-traceable callable on a single state —
    e.g. a trained ``ColvarModel`` or ``task.colvar_model()``.
    """

    def __init__(self, pot_obj, cv_model: Callable, bias_fn: Callable):
        self.dim = pot_obj.dim
        self.beta = pot_obj.beta
        self._pot = pot_obj
        self._cv = cv_model
        self._bias = bias_fn

    def V(self, x):
        return self._pot.V(x) + self._bias(self._cv(x))


def _hill_energy(s, centers, heights, inv_two_sigma2):
    """Sum of deposited Gaussians at CV value ``s`` ([k])."""
    d2 = jnp.sum((s[None, :] - centers) ** 2, axis=-1)  # [H]
    return jnp.sum(heights * jnp.exp(-d2 * inv_two_sigma2))


@dataclasses.dataclass
class MetadynamicsResult:
    """Outcome of a metadynamics run (single walker or [w, ...] stacked).

    Attributes:
        frames: states at each deposition time [n_hills, dim]
        cv_values: CV at each deposition [n_hills, cv_dim]
        hill_centers / hill_heights: the deposited bias
        hill_width: Gaussian sigma
        bias_factor: well-tempered gamma (None for standard metadynamics)
        beta: inverse temperature of the run
    """

    frames: np.ndarray
    cv_values: np.ndarray
    hill_centers: np.ndarray
    hill_heights: np.ndarray
    hill_width: float
    bias_factor: Optional[float]
    beta: float

    def select_walker(self, c: int) -> "MetadynamicsResult":
        """Single-walker view of a multi-walker (``n_chains > 1``) result."""
        return dataclasses.replace(
            self,
            frames=self.frames[c],
            cv_values=self.cv_values[c],
            hill_centers=self.hill_centers[c],
            hill_heights=self.hill_heights[c],
        )

    def bias(self, s) -> np.ndarray:
        """Evaluate the accumulated bias at CV value(s) ``s``."""
        if self.hill_centers.ndim == 3:
            raise ValueError(
                "multi-walker result: use .select_walker(c).bias(s)"
            )
        s = np.atleast_2d(np.asarray(s, dtype=np.float32))
        if s.shape[-1] != self.hill_centers.shape[-1]:
            s = s.reshape(-1, self.hill_centers.shape[-1])
        inv = 1.0 / (2.0 * self.hill_width**2)
        d2 = ((s[:, None, :] - self.hill_centers[None, :, :]) ** 2).sum(-1)
        return (self.hill_heights[None, :] * np.exp(-d2 * inv)).sum(-1)

    def free_energy(self, s) -> np.ndarray:
        """Free-energy estimate at CV value(s) ``s`` (up to a constant).

        Standard metadynamics: ``F(s) = -V_bias(s)``; well-tempered:
        ``F(s) = -gamma/(gamma-1) * V_bias(s)``.
        """
        scale = (
            1.0
            if self.bias_factor is None
            else self.bias_factor / (self.bias_factor - 1.0)
        )
        return -scale * self.bias(s)

    # ------------------------------------------------------------------
    def _cv_grid(self, grid_points: int) -> np.ndarray:
        """Default CV grid covering the visited region (+4 sigma margin)."""
        dim = self.hill_centers.shape[-1]
        if dim > 2:
            raise ValueError(
                f"no default grid for a {dim}-dimensional CV — pass "
                "grid=[n_points, cv_dim] explicitly"
            )
        axes = [
            np.linspace(
                self.hill_centers[:, d].min() - 4 * self.hill_width,
                self.hill_centers[:, d].max() + 4 * self.hill_width,
                grid_points,
            )
            for d in range(dim)
        ]
        mesh = np.meshgrid(*axes, indexing="ij")
        return np.stack([m.ravel() for m in mesh], axis=-1)

    def frame_weights(
        self,
        method: str = "final-bias",
        grid: Optional[np.ndarray] = None,
        grid_points: int = 129,
    ) -> np.ndarray:
        """Unbiased-ensemble weights for the deposition-time frames.

        Turns a biased run into :class:`~colvarsfinder_tpu.utils.trajectory
        .WeightedTrajectory` input (weights mean-normalized to 1, the
        package convention) so the CV can be *retrained* on data that
        crossed the barriers — the iterate-the-CV workflow the reference
        ecosystem runs through a PLUMED reweight plus ``calc_weights``
        (reference utils.py:220-223, :354-417).

        Args:
            method: ``'final-bias'`` — the quasi-static estimator
                ``w_i ∝ exp(beta * V_b(s_i))`` with ``V_b`` the final
                accumulated bias (the stationary distribution of
                well-tempered metadynamics is ``∝ exp(-beta (F + V_b))``).
                ``'tiwary'`` — the time-dependent estimator of Tiwary &
                Parrinello (J. Phys. Chem. B 119, 2015):
                ``w_i ∝ exp(beta * (V(s_i, t_i) - c(t_i)))`` where
                ``V(·, t_i)`` is the bias when frame ``i`` was recorded and
                ``c(t) = (1/beta) ln(∫ e^{beta*gamma*V/(gamma-1)} ds /
                ∫ e^{beta*V/(gamma-1)} ds)`` on a CV grid (for standard
                metadynamics the ``gamma -> inf`` limit is used).
            grid: optional explicit CV grid [n_points, cv_dim] for the
                ``c(t)`` integrals (``'tiwary'`` only).
            grid_points: per-dimension size of the default grid.

        Returns:
            weights [n_hills] with mean 1, aligned with ``self.frames``.
        """
        if self.hill_centers.ndim == 3:
            raise ValueError(
                "multi-walker result: use .select_walker(c).frame_weights()"
            )
        # delegate to the general estimator (the deposition frames are
        # the special case: frame i sees hills j < i)
        n_h = self.hill_centers.shape[0]
        hills = PlumedHills(
            times=np.arange(n_h, dtype=np.float64),
            centers=np.asarray(self.hill_centers, dtype=np.float64),
            sigmas=np.full(
                (n_h, self.hill_centers.shape[-1]), float(self.hill_width)
            ),
            heights=np.asarray(self.hill_heights, dtype=np.float64),
            bias_factor=self.bias_factor,
        )
        return metad_frame_weights(
            self.cv_values, hills, beta=self.beta, method=method,
            grid=grid, grid_points=grid_points,
            _cutoffs=np.arange(n_h),
        )


def _metad_scan(
    grad_total, cv_fn, bias_e, x0, key, step_size, beta, hill_height,
    wt_denom, n_hills, deposit_interval, pre_steps, well_tempered,
):
    """One walker's full metadynamics run (traced; the caller jits the
    vmapped wrapper LOCALLY so the compiled executable — which closes over
    the CV model — is garbage-collected with the call instead of pinned
    in a module-level jit cache).

    x0: [d]. Returns (frames [H, d], cvs [H, k], centers [H, k],
    heights [H]).
    """
    noise_scale = jnp.sqrt(2.0 * step_size / beta)
    cv_dim = cv_fn(x0).reshape(-1).shape[0]
    centers0 = jnp.zeros((n_hills, cv_dim), jnp.float32)
    heights0 = jnp.zeros((n_hills,), jnp.float32)

    burn_key, main_key = jax.random.split(key)

    # unbiased burn-in
    if pre_steps:
        noise = jax.random.normal(burn_key, (pre_steps,) + x0.shape, x0.dtype)

        def burn(j, xx):
            return (
                xx
                - grad_total(xx, centers0, heights0) * step_size
                + noise_scale * noise[j]
            )

        x0 = jax.lax.fori_loop(0, pre_steps, burn, x0)

    def block(carry, i):
        x, centers, heights = carry
        noise = jax.random.normal(
            jax.random.fold_in(main_key, i),
            (deposit_interval,) + x.shape,
            x.dtype,
        )

        def body(j, xx):
            return (
                xx
                - grad_total(xx, centers, heights) * step_size
                + noise_scale * noise[j]
            )

        x = jax.lax.fori_loop(0, deposit_interval, body, x)
        s = cv_fn(x).reshape(-1)
        if well_tempered:
            h = hill_height * jnp.exp(-bias_e(s, centers, heights) / wt_denom)
        else:
            h = hill_height
        centers = centers.at[i].set(s)
        heights = heights.at[i].set(h)
        return (x, centers, heights), (x, s)

    (x, centers, heights), (frames, cvs) = jax.lax.scan(
        block, (x0, centers0, heights0), jnp.arange(n_hills)
    )
    return frames, cvs, centers, heights


def integrate_sde_metadynamics(
    pot_obj,
    cv_model: Callable,
    n_steps: int,
    sampling_output_path: Optional[str] = None,
    X0: Optional[np.ndarray] = None,
    pre_steps: int = 0,
    step_size: float = 0.01,
    deposit_interval: int = 500,
    hill_height: float = 1.0,
    hill_width: float = 0.2,
    bias_factor: Optional[float] = None,
    n_chains: int = 1,
    seed: Optional[int] = None,
    mesh=None,
    verbose: bool = True,
) -> MetadynamicsResult:
    """Metadynamics along a (learned) CV, fully compiled on device.

    Every ``deposit_interval`` integrator steps a Gaussian hill of width
    ``hill_width`` is deposited at the current CV value; the history-
    dependent bias force acts through ``jax.grad`` of the hill sum composed
    with the CV model. ``bias_factor`` (gamma > 1) enables well-tempered
    metadynamics: deposited heights decay as
    ``exp(-beta * V_bias / (gamma - 1))``.

    Args:
        pot_obj: base potential (``dim`` / ``beta`` / ``V``, optional
            ``gradV``) — same contract as ``integrate_sde_overdamped``.
        cv_model: jax-traceable map from a single state [dim] to CV values.
        n_steps: total integrator steps (``n_steps // deposit_interval``
            hills are deposited).
        sampling_output_path: when given, writes ``traj.txt`` rows at the
            deposition times plus a PLUMED-style ``HILLS`` file
            (time, center..., sigma..., height, biasf).
        n_chains: independent walkers, vmapped over the whole program
            (each with its own hill pool).
        mesh: optional :class:`jax.sharding.Mesh` — walkers are
            independent, so the chain axis is sharded over the mesh's
            first axis (``n_chains`` must divide by the mesh size; zero
            collectives in the scan body).

    Returns:
        :class:`MetadynamicsResult`; arrays gain a leading walker axis
        when ``n_chains > 1``.
    """
    if bias_factor is not None and bias_factor <= 1.0:
        raise ValueError("bias_factor (well-tempered gamma) must be > 1")
    n_hills = n_steps // deposit_interval
    if n_hills < 1:
        raise ValueError("n_steps must be at least deposit_interval")
    dim = pot_obj.dim
    beta = float(pot_obj.beta)

    if seed is None:
        seed = np.random.randint(0, 2**31 - 1)
    key = jax.random.PRNGKey(seed)
    if X0 is None:
        key, sub = jax.random.split(key)
        X0 = np.asarray(jax.random.normal(sub, (n_chains, dim)))
    else:
        X0 = np.broadcast_to(np.asarray(X0, np.float64), (n_chains, dim))

    inv_two_sigma2 = jnp.float32(1.0 / (2.0 * hill_width**2))

    def bias_e(s, centers, heights):
        return _hill_energy(s, centers, heights, inv_two_sigma2)

    def cv_fn(x):
        return jnp.asarray(cv_model(x), dtype=jnp.float32)

    def total_energy(x, centers, heights):
        return jnp.asarray(pot_obj.V(x)) + bias_e(
            cv_fn(x).reshape(-1), centers, heights
        )

    grad_total = jax.grad(total_energy)
    wt_denom = jnp.float32(
        (bias_factor - 1.0) / beta if bias_factor is not None else 1.0
    )

    run = jax.jit(jax.vmap(
        lambda x0, k: _metad_scan(
            grad_total, cv_fn, bias_e, x0, k,
            jnp.float32(step_size), jnp.float32(beta),
            jnp.float32(hill_height), wt_denom,
            int(n_hills), int(deposit_interval), int(pre_steps),
            bias_factor is not None,
        )
    ))
    keys = jax.random.split(key, n_chains)
    x0_dev = jnp.asarray(X0, jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis0 = mesh.axis_names[0]
        n_ax = int(mesh.shape[axis0])
        if n_chains % n_ax:
            raise ValueError(
                f"n_chains {n_chains} must be divisible by the size of "
                f"mesh axis '{axis0}' ({n_ax}), which the walkers shard over"
            )
        shard = NamedSharding(mesh, PartitionSpec(axis0))
        x0_dev = jax.device_put(x0_dev, shard)
        keys = jax.device_put(keys, shard)
    frames, cvs, centers, heights = run(x0_dev, keys)
    frames, cvs, centers, heights = (
        np.asarray(frames), np.asarray(cvs),
        np.asarray(centers), np.asarray(heights),
    )

    if sampling_output_path is not None:
        os.makedirs(sampling_output_path, exist_ok=True)
        times = (np.arange(n_hills) + 1) * deposit_interval * step_size
        for c in range(n_chains):
            suffix = "" if c == 0 else f"_chain{c}"
            with open(
                os.path.join(sampling_output_path, f"traj{suffix}.txt"), "w"
            ) as f:
                for j in range(n_hills):
                    f.write(
                        f"{times[j]:.3f} "
                        + " ".join(f"{v:.6f}" for v in frames[c, j])
                        + "\n"
                    )
            with open(
                os.path.join(sampling_output_path, f"HILLS{suffix}"), "w"
            ) as f:
                k = centers.shape[-1]
                cols = (
                    ["time"]
                    + [f"cv_{i}" for i in range(k)]
                    + [f"sigma_cv_{i}" for i in range(k)]
                    + ["height", "biasf"]
                )
                f.write("#! FIELDS " + " ".join(cols) + "\n")
                bf = bias_factor if bias_factor is not None else -1.0
                # PLUMED convention: well-tempered HILLS store heights
                # rescaled by gamma/(gamma-1) (sum_hills then integrates
                # to -F); read_plumed_hills undoes this on load
                hscale = (
                    bias_factor / (bias_factor - 1.0)
                    if bias_factor is not None
                    else 1.0
                )
                for j in range(n_hills):
                    row = (
                        [times[j]]
                        + list(centers[c, j])
                        + [hill_width] * k
                        + [heights[c, j] * hscale, bf]
                    )
                    f.write(" ".join(f"{v:.6f}" for v in row) + "\n")

    if verbose:
        print(
            f"metadynamics: {n_hills} hills deposited per walker "
            f"({n_chains} walkers, gamma="
            f"{bias_factor if bias_factor is not None else 'inf (standard)'})"
        )

    squeeze = n_chains == 1
    return MetadynamicsResult(
        frames=frames[0] if squeeze else frames,
        cv_values=cvs[0] if squeeze else cvs,
        hill_centers=centers[0] if squeeze else centers,
        hill_heights=heights[0] if squeeze else heights,
        hill_width=float(hill_width),
        bias_factor=bias_factor,
        beta=beta,
    )


# ---------------------------------------------------------------------------
# umbrella-sampling recombination (MBAR)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MBARResult:
    """Outcome of :func:`mbar_weights`.

    Attributes:
        weights: per-window unbiased-ensemble frame weights, normalized so
            the POOLED mean is 1 (the package's WeightedTrajectory
            convention) — concatenate along with the frames to retrain.
        free_energies: window free energies f_k in kT (f_0 = 0): the
            log-normalizers MBAR solves for.
        n_iter: self-consistent iterations used.
        converged: whether ``max|df|`` fell below ``tol``.
    """

    weights: list
    free_energies: np.ndarray
    n_iter: int
    converged: bool


def mbar_weights(
    cv_values,
    bias_fns=None,
    beta: float = 1.0,
    *,
    u_kn: Optional[np.ndarray] = None,
    tol: float = 1e-10,
    max_iter: int = 2_000,
) -> MBARResult:
    """Unbiased-ensemble weights for pooled umbrella-sampling windows (MBAR).

    Solves the multistate Bennett acceptance ratio equations (Shirts &
    Chodera, J. Chem. Phys. 129, 2008) for K umbrella windows sampled with
    :class:`BiasedPotential` + :func:`integrate_sde_overdamped`:

    .. math::

        f_k = -\\ln \\sum_n \\frac{e^{-u_k(x_n)}}
              {\\sum_j N_j e^{f_j - u_j(x_n)}},
        \\qquad w_n \\propto \\Big(\\sum_j N_j e^{f_j - u_j(x_n)}\\Big)^{-1}

    with reduced bias energies ``u_k = beta * bias_k(cv)`` (the windows
    share the base potential, so only the bias enters). The returned
    weights feed :class:`~colvarsfinder_tpu.utils.trajectory
    .WeightedTrajectory` directly — the umbrella counterpart of
    :meth:`MetadynamicsResult.frame_weights`, closing the same
    bias-then-retrain loop the reference ecosystem runs through PLUMED +
    ``calc_weights`` (reference utils.py:220-223, :354-417).

    Args:
        cv_values: list of per-window CV samples, each [n_k] or
            [n_k, cv_dim] (map the window's frames through the trained CV).
        bias_fns: list of K bias callables on a single CV value (e.g.
            :func:`harmonic_restraint` closures — jax-traceable; they are
            vmapped over the pooled samples once per window).
        beta: inverse temperature of the runs.
        u_kn: alternatively, the precomputed reduced bias-energy matrix
            [K, N_total] over the pooled samples (numpy-only path;
            overrides ``bias_fns``).
        tol: convergence threshold on ``max|df|`` per iteration.
        max_iter: iteration cap (a warning is emitted if hit).

    Returns:
        :class:`MBARResult`.
    """
    cvs = [np.atleast_2d(np.asarray(c, dtype=np.float64).T).T for c in cv_values]
    cvs = [c.reshape(c.shape[0], -1) for c in cvs]
    n_k = np.asarray([c.shape[0] for c in cvs])
    pooled = np.concatenate(cvs, axis=0)
    n_tot = pooled.shape[0]

    if u_kn is None:
        if bias_fns is None:
            raise ValueError("pass either bias_fns or u_kn")
        if len(bias_fns) != len(cvs):
            raise ValueError(
                f"{len(bias_fns)} bias_fns for {len(cvs)} windows"
            )
        rows = []
        for fn in bias_fns:
            vals = jax.vmap(lambda s, fn=fn: jnp.asarray(fn(s)).reshape(()))(
                jnp.asarray(pooled, jnp.float64)
                if jax.config.read("jax_enable_x64")
                else jnp.asarray(pooled, jnp.float32)
            )
            rows.append(np.asarray(vals, dtype=np.float64))
        u = beta * np.stack(rows, axis=0)
    else:
        u = np.asarray(u_kn, dtype=np.float64)
        if u.shape != (len(cvs), n_tot):
            raise ValueError(
                f"u_kn shape {u.shape} != {(len(cvs), n_tot)}"
            )

    log_n = np.log(n_k.astype(np.float64))
    K = len(cvs)

    def _log_denom(f):
        # log denominator per pooled sample:
        # logsumexp_j(log N_j + f_j - u_jn)
        a = log_n[:, None] + f[:, None] - u  # [K, N]
        m = a.max(axis=0)
        return np.log(np.exp(a - m[None, :]).sum(axis=0)) + m

    def _scf_step(f, log_d):
        # f_k update: -logsumexp_n(-u_kn - log_d)
        b = -u - log_d[None, :]
        mb = b.max(axis=1)
        f_new = -(np.log(np.exp(b - mb[:, None]).sum(axis=1)) + mb)
        return f_new - f_new[0]

    # Self-consistent iteration alone converges geometrically and stalls
    # when window overlap is weak; after a short SCF warm-up we switch to
    # Newton-Raphson on the (convex) MBAR objective
    # phi(f) = sum_n log sum_j N_j e^{f_j - u_jn} - sum_k N_k f_k
    # (Shirts & Chodera 2008), which reaches machine precision in a
    # handful of steps. f_0 is pinned; the Newton solve runs in the
    # (K-1)-dim subspace. A Newton step that fails to reduce the gradient
    # norm falls back to an SCF step for that iteration.
    f = np.zeros(K)
    converged = False
    it = 0
    delta = np.inf
    scf_warmup = 10
    log_d_next = None  # carried from an accepted Newton step
    for it in range(1, max_iter + 1):
        log_d = _log_denom(f) if log_d_next is None else log_d_next
        log_d_next = None
        if it <= scf_warmup or K == 1:
            f_new = _scf_step(f, log_d)
        else:
            # W_kn = exp(f_k - u_kn - log_d_n); grad_k = N_k (sum_n W_kn - 1)
            W = np.exp(f[:, None] - u - log_d[None, :])
            nw = n_k[:, None] * W  # [K, N]
            grad = nw.sum(axis=1) - n_k
            # Hessian: H_kl = -sum_n (N_k W_kn)(N_l W_ln) (k != l),
            # H_kk = sum_n N_k W_kn (1 - N_k W_kn)
            H = -(nw @ nw.T)
            np.fill_diagonal(H, np.diag(H) + nw.sum(axis=1))
            try:
                step = np.zeros(K)
                step[1:] = np.linalg.solve(H[1:, 1:], -grad[1:])
                f_try = f + step
                f_try -= f_try[0]
                log_d_try = _log_denom(f_try)
                W_t = np.exp(f_try[:, None] - u - log_d_try[None, :])
                grad_try = (n_k[:, None] * W_t).sum(axis=1) - n_k
                if np.abs(grad_try).max() < np.abs(grad).max():
                    f_new = f_try
                    log_d_next = log_d_try  # reuse next iteration
                else:
                    f_new = _scf_step(f, log_d)
            except np.linalg.LinAlgError:
                f_new = _scf_step(f, log_d)
        delta = np.abs(f_new - f).max()
        f = f_new
        if delta < tol:
            converged = True
            break
    if not converged:
        import warnings

        warnings.warn(
            f"MBAR did not converge in {max_iter} iterations "
            f"(last max|df| = {delta:.2e})"
        )

    log_d = _log_denom(f)
    log_w = -log_d
    w = np.exp(log_w - log_w.max())
    w /= w.mean()
    splits = np.cumsum(n_k)[:-1]
    return MBARResult(
        weights=[np.asarray(s) for s in np.split(w, splits)],
        free_energies=f,
        n_iter=it,
        converged=converged,
    )


# ---------------------------------------------------------------------------
# umbrella-sampling window runner
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class UmbrellaResult:
    """Outcome of :func:`integrate_sde_umbrella` (K windows).

    Attributes:
        frames: states at the report times, [K, n_reports, dim].
        cv_values: CV at each recorded frame, [K, n_reports, cv_dim].
        centers: restraint centers, [K, cv_dim].
        kappas: restraint strengths, [K].
        beta: inverse temperature of the runs.
        dt: time between recorded frames (``step_size * report_interval``).
    """

    frames: np.ndarray
    cv_values: np.ndarray
    centers: np.ndarray
    kappas: np.ndarray
    beta: float
    dt: float

    @property
    def n_windows(self) -> int:
        return len(self.centers)

    def bias_fns(self):
        """The K restraints as callables on a CV value — exactly the
        biases the windows were integrated under, ready for
        :func:`mbar_weights`."""
        return [
            harmonic_restraint(c, float(k))
            for c, k in zip(self.centers, self.kappas)
        ]

    def mbar(self, **kwargs) -> MBARResult:
        """Recombine the windows: MBAR unbiased-ensemble weights + window
        free energies (forwards ``tol`` / ``max_iter``)."""
        return mbar_weights(
            list(self.cv_values), self.bias_fns(), beta=self.beta, **kwargs
        )

    def to_weighted_trajectory(self, mbar_result: Optional[MBARResult] = None):
        """Pool every window into ONE training-ready
        :class:`~colvarsfinder_tpu.utils.trajectory.WeightedTrajectory`:
        frames concatenated, MBAR unbiased-ensemble weights attached
        (pooled mean 1), ``segment_starts`` marking window boundaries so
        time-lagged objectives never pair frames across windows."""
        from .trajectory import WeightedTrajectory

        mb = mbar_result if mbar_result is not None else self.mbar()
        n = self.frames.shape[1]
        # boundaries go through the constructor so the zero-weight frame
        # filter (MBAR weights can underflow to 0.0) remaps them
        return WeightedTrajectory(
            trajectory=self.frames.reshape(-1, *self.frames.shape[2:]),
            weights=np.concatenate(mb.weights),
            dt=self.dt,
            verbose=False,
            segment_starts=np.arange(self.n_windows) * n,
        )

    def subsample(self, g: Optional[float] = None) -> "UmbrellaResult":
        """Decimate every window to (approximately) independent frames.

        Strides the report axis by ``ceil(g)``, where ``g`` defaults to
        the CONSERVATIVE statistical inefficiency — the maximum of
        :func:`~colvarsfinder_tpu.analysis.statistical_inefficiency`
        over all windows and CV heads — so that the MBAR solve and its
        downstream error estimates (which assume independent samples)
        see one frame per correlation time. The pymbar
        ``subsample_correlated_data`` workflow; chain as
        ``result.subsample().to_weighted_trajectory()``.
        """
        from ..analysis import statistical_inefficiency

        if g is None:
            g = max(
                float(np.max(statistical_inefficiency(cv)))
                for cv in self.cv_values
            )
        stride = max(1, int(np.ceil(float(g) - 1e-9)))
        return dataclasses.replace(
            self,
            frames=self.frames[:, ::stride],
            cv_values=self.cv_values[:, ::stride],
            dt=self.dt * stride,
        )


def integrate_sde_umbrella(
    pot_obj,
    cv_model: Callable,
    centers,
    kappa,
    n_steps: int,
    sampling_output_path: Optional[str] = None,
    X0: Optional[np.ndarray] = None,
    pre_steps: int = 0,
    step_size: float = 0.01,
    report_interval: int = 100,
    seed: Optional[int] = None,
    mesh=None,
    verbose: bool = True,
) -> UmbrellaResult:
    """Umbrella sampling along a (learned) CV — all K windows in ONE
    compiled, vmapped Euler–Maruyama scan.

    Each window k integrates ``V(x) + 0.5 * kappa_k * |cv(x) - c_k|^2``
    (restraint force through ``jax.grad`` of the composition, i.e.
    through the CV model). The reference ecosystem runs one PLUMED
    ``restraint`` simulation per window (reference utils.py:220-223);
    here the windows are rows of a single ``[K, dim]`` chain batch, so
    the whole schedule is one device dispatch and K fills the batch
    dimension of every model matmul.

    Args:
        pot_obj: base potential (``dim`` / ``beta`` / ``V`` jax-traceable,
            as for :func:`integrate_sde_metadynamics`).
        cv_model: jax-traceable map from a single state [dim] to CV
            values (any shape; flattened).
        centers: [K] (scalar CV) or [K, cv_dim] restraint centers.
        kappa: restraint strength — scalar or per-window [K]. Strong
            enough that neighboring windows' CV histograms overlap.
        n_steps: integrator steps per window.
        sampling_output_path: when given, writes per-window
            ``traj_win{k}.txt`` rows (t, x...) plus ``windows.csv``
            (center..., kappa).
        X0: initial state [dim] shared by all windows (each relaxes into
            its own window during ``pre_steps``), or per-window [K, dim]
            starts (e.g. a steered chain). Defaults to a standard-normal
            draw shared by all windows.
        pre_steps: per-window burn-in steps (discarded).
        step_size / report_interval / seed / verbose: as in
            :func:`~colvarsfinder_tpu.utils.sampling.integrate_sde_overdamped`.
        mesh: optional :class:`jax.sharding.Mesh` — windows are
            embarrassingly parallel, so the K axis is sharded over the
            mesh's first axis (K must divide by the mesh size; zero
            collectives in the scan body).

    Returns:
        :class:`UmbrellaResult` — call ``.mbar()`` for window free
        energies and unbiased weights, ``.to_weighted_trajectory()`` for
        a training-ready pooled dataset.
    """
    from .sampling import _em_scan

    centers = np.asarray(centers, dtype=np.float64)
    if centers.ndim == 1:
        centers = centers[:, None]
    K, cv_dim = centers.shape
    kappas = np.broadcast_to(
        np.asarray(kappa, dtype=np.float64), (K,)
    ).astype(np.float64)
    if n_steps < 1:
        raise ValueError("n_steps must be >= 1")
    dim = pot_obj.dim
    beta = float(pot_obj.beta)

    if seed is None:
        seed = np.random.randint(0, 2**31 - 1)
    key = jax.random.PRNGKey(seed)
    if X0 is None:
        key, sub = jax.random.split(key)
        X0 = np.asarray(jax.random.normal(sub, (dim,)))
    X0 = np.asarray(X0, dtype=np.float64)
    if X0.ndim == 1:
        X0 = np.broadcast_to(X0, (K, dim))
    elif X0.shape != (K, dim):
        raise ValueError(f"X0 must be [dim] or [K, dim]; got {X0.shape}")

    c_arr = jnp.asarray(centers, jnp.float32)
    k_arr = jnp.asarray(kappas, jnp.float32)

    def cv_fn(x):
        return jnp.asarray(cv_model(x), dtype=jnp.float32).reshape(-1)

    def biased_v(x, c, kap):
        d = cv_fn(x) - c
        return jnp.asarray(pot_obj.V(x)) + 0.5 * kap * jnp.sum(d * d)

    grad_single = jax.grad(biased_v)

    def grad_fn(x):  # x: [K, dim]
        return jax.vmap(grad_single)(x, c_arr, k_arr)

    # fail fast on a CV/centers dimensionality mismatch — inside biased_v
    # a size-1 mismatch would silently broadcast for the whole run
    cv_shape = jax.eval_shape(cv_fn, jnp.zeros((dim,), jnp.float32))
    cv_out = int(np.prod(cv_shape.shape)) if cv_shape.shape else 1
    if cv_out != cv_dim:
        raise ValueError(
            f"cv_model returns {cv_out} components but centers have {cv_dim}"
        )

    n_reports = (n_steps - 1) // report_interval + 1
    x0_dev = jnp.asarray(X0, jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis0 = mesh.axis_names[0]
        n_ax = int(mesh.shape[axis0])
        if K % n_ax:
            raise ValueError(
                f"window count {K} must be divisible by the size of mesh "
                f"axis '{axis0}' ({n_ax}), which the windows shard over"
            )
        x0_dev = jax.device_put(
            x0_dev, NamedSharding(mesh, PartitionSpec(axis0))
        )
    _, frames = _em_scan(
        grad_fn,
        x0_dev,
        key,
        jnp.float32(step_size),
        jnp.float32(beta),
        int(report_interval),
        int(n_reports),
        int(pre_steps),
    )
    frames = np.asarray(frames).transpose(1, 0, 2)  # [K, n_reports, dim]

    flat = jnp.asarray(frames.reshape(-1, dim))
    cv_values = np.asarray(jax.vmap(cv_fn)(flat)).reshape(
        K, n_reports, cv_dim
    )

    if sampling_output_path is not None:
        os.makedirs(sampling_output_path, exist_ok=True)
        times = np.arange(n_reports) * step_size * report_interval
        for k in range(K):
            np.savetxt(
                os.path.join(sampling_output_path, f"traj_win{k}.txt"),
                np.column_stack([times, frames[k]]),
                fmt="%.8g",
            )
        header = ",".join(
            [f"center_{d}" for d in range(cv_dim)] + ["kappa"]
        )
        np.savetxt(
            os.path.join(sampling_output_path, "windows.csv"),
            np.column_stack([centers, kappas]),
            fmt="%.8g",
            delimiter=",",
            header=header,
            comments="",
        )

    if verbose:
        means = cv_values.mean(axis=1)
        print(
            f"umbrella sampling: {K} windows x {n_reports} frames; "
            f"window CV means {np.round(means.ravel(), 3)}"
        )

    return UmbrellaResult(
        frames=frames.astype(np.float32),
        cv_values=cv_values,
        centers=centers,
        kappas=kappas,
        beta=beta,
        dt=step_size * report_interval,
    )


# ---------------------------------------------------------------------------
# steered pulling along a CV (Jarzynski nonequilibrium work)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SteeredResult:
    """Outcome of :func:`integrate_sde_steered` (M pulling realizations).

    The restraint center moves linearly from ``cv_start`` to ``cv_end``
    over the protocol; ``works[m, t]`` is realization m's accumulated
    PROTOCOL work :math:`W_t = \\sum_s [U(x_s; \\lambda_{s+1}) -
    U(x_s; \\lambda_s)]` up to report t (the discrete Jarzynski/Crooks
    convention — work is tallied at fixed configuration when the
    restraint moves, then the state evolves under the new restraint).

    Attributes:
        frames: [M, n_reports, dim] states at the report times.
        cv_values: [M, n_reports, cv_dim] CV at each recorded frame.
        works: [M, n_reports] cumulative protocol work (energy units).
        schedule: [n_reports, cv_dim] restraint center at each report.
        kappa: restraint strength.
        beta: inverse temperature of the runs.
        dt: time between recorded frames.
    """

    frames: np.ndarray
    cv_values: np.ndarray
    works: np.ndarray
    schedule: np.ndarray
    kappa: float
    beta: float
    dt: float

    @property
    def n_realizations(self) -> int:
        return self.frames.shape[0]

    def jarzynski(self) -> np.ndarray:
        """Free-energy profile along the pulling schedule by the
        Jarzynski equality: ``dF_t = -ln E[exp(-beta W_t)] / beta``
        over the M realizations ([n_reports], relative to the
        equilibrated start; stiff-spring interpretation: the free
        energy of the RESTRAINED ensemble at ``schedule[t]``, which
        approaches the potential of mean force as ``kappa`` grows).
        The exponential average is dominated by rare low-work
        realizations — check :meth:`cumulant` agreement (near-Gaussian
        work) before trusting a fast-pulling estimate."""
        w = self.beta * self.works  # [M, T]
        m = w.min(axis=0)
        return (
            m - np.log(np.mean(np.exp(-(w - m)), axis=0))
        ) / self.beta

    def cumulant(self) -> np.ndarray:
        """Second-order cumulant estimate ``E[W_t] - beta Var[W_t]/2``
        ([n_reports]) — exact for Gaussian work distributions, far
        lower variance than :meth:`jarzynski` at small M; large
        disagreement between the two flags non-Gaussian dissipation
        (pull slower or add realizations)."""
        # unbiased (ddof=1) work variance: at the default M=16 the
        # ddof=0 estimate under-reads the dissipation correction ~6%
        ddof = 1 if self.works.shape[0] > 1 else 0
        return self.works.mean(axis=0) - (
            self.beta * self.works.var(axis=0, ddof=ddof) / 2.0
        )

    @property
    def dissipated_work(self) -> np.ndarray:
        """Mean dissipation ``E[W_t] - dF_t`` ([n_reports], >= 0 by the
        second law up to estimator noise); a quasi-static pull keeps it
        well under ``1/beta``."""
        return self.works.mean(axis=0) - self.jarzynski()

    def window_starts(self, centers) -> np.ndarray:
        """Per-window initial states for
        :func:`integrate_sde_umbrella`'s ``X0`` — for each requested
        center, the recorded frame (any realization) whose CV is
        closest, at the report where the schedule passed nearest that
        center. Returns [K, dim]: the steered chain seeds every
        umbrella window inside its own basin, eliminating long
        relaxation burn-ins for windows far from the unbiased start."""
        centers = np.asarray(centers, dtype=np.float64)
        if centers.ndim == 1:
            centers = centers[:, None]
        starts = np.empty(
            (centers.shape[0], self.frames.shape[2]), dtype=np.float64
        )
        for j, c in enumerate(centers):
            t = int(
                np.argmin(((self.schedule - c) ** 2).sum(axis=-1))
            )
            m = int(
                np.argmin(((self.cv_values[:, t] - c) ** 2).sum(axis=-1))
            )
            starts[j] = self.frames[m, t]
        return starts


@partial(
    jax.jit,
    static_argnames=("grad_b", "cv_fn", "n_sub", "n_reports", "pre_steps"),
)
def _steered_scan(
    grad_b, cv_fn, x0, key, step_size, beta, c0, c1, kappa,
    n_sub, n_reports, pre_steps,
):
    """All M realizations of the pulling protocol as one scan over
    report blocks (x0: [M, dim]); per-block noise generation as in
    ``sampling._em_scan``. Burn-in equilibrates under the restraint
    FIXED at c0 (each realization decorrelates into its own equilibrium
    start); the main loop tallies the work of each center move at fixed
    state, then steps the dynamics under the moved restraint."""
    n_steps = n_sub * n_reports
    noise_scale = jnp.sqrt(2.0 * step_size / beta)
    burn_key, main_key = jax.random.split(key)
    batched_cv = jax.vmap(cv_fn)

    def em(x, xi, c):
        return x - grad_b(x, c) * step_size + noise_scale * xi

    n_burn_blocks = -(-pre_steps // n_sub) if pre_steps else 0

    def burn_block(x, i):
        noise = jax.random.normal(
            jax.random.fold_in(burn_key, i), (n_sub,) + x.shape, x.dtype
        )

        def body(j, xx):
            take = i * n_sub + j < pre_steps
            return jax.lax.cond(
                take, lambda: em(xx, noise[j], c0), lambda: xx
            )

        return jax.lax.fori_loop(0, n_sub, body, x), None

    if n_burn_blocks:
        x0, _ = jax.lax.scan(burn_block, x0, jnp.arange(n_burn_blocks))

    dc = c1 - c0

    def center(s):
        return c0 + (s.astype(jnp.float32) / n_steps) * dc

    def report_block(carry, i):
        x, w = carry
        noise = jax.random.normal(
            jax.random.fold_in(main_key, i), (n_sub,) + x.shape, x.dtype
        )

        def body(j, xw):
            x, w = xw
            s = i * n_sub + j
            ca, cb = center(s), center(s + 1)
            y = batched_cv(x)
            dw = 0.5 * kappa * (
                jnp.sum((y - cb) ** 2, axis=-1)
                - jnp.sum((y - ca) ** 2, axis=-1)
            )
            return em(x, noise[j], cb), w + dw

        x, w = jax.lax.fori_loop(0, n_sub, body, (x, w))
        return (x, w), (x, batched_cv(x), w, center((i + 1) * n_sub))

    (x, w), (frames, cvs, works, sched) = jax.lax.scan(
        report_block,
        (x0, jnp.zeros(x0.shape[0], x0.dtype)),
        jnp.arange(n_reports),
    )
    return frames, cvs, works, sched


def integrate_sde_steered(
    pot_obj,
    cv_model: Callable,
    cv_start,
    cv_end,
    kappa,
    n_steps: int,
    n_realizations: int = 16,
    X0: Optional[np.ndarray] = None,
    pre_steps: int = 0,
    step_size: float = 0.01,
    report_interval: int = 100,
    seed: Optional[int] = None,
    mesh=None,
    verbose: bool = True,
) -> SteeredResult:
    """Steered pulling along a (learned) CV with Jarzynski work
    accounting — all M realizations as ONE compiled, vmapped scan.

    A stiff harmonic restraint ``0.5 * kappa * |cv(x) - c(t)|^2`` is
    dragged linearly from ``cv_start`` to ``cv_end`` over ``n_steps``
    while the accumulated protocol work is tallied per realization
    (the reference ecosystem's equivalent is a PLUMED ``MOVINGRESTRAINT``
    run per realization, post-processed by hand; reference
    utils.py:220-223 shows only the static-bias path). Uses:

    * :meth:`SteeredResult.jarzynski` / :meth:`~SteeredResult.cumulant`
      — nonequilibrium free-energy profiles along the learned CV
      without waiting for barrier-crossing statistics;
    * :meth:`SteeredResult.window_starts` — equilibrium-path seeds for
      :func:`integrate_sde_umbrella`'s per-window ``X0`` (the steered
      chain crosses barriers the unbiased start never would).

    Args:
        pot_obj: base potential (``dim`` / ``beta`` / ``V``
            jax-traceable, as for :func:`integrate_sde_metadynamics`).
        cv_model: jax-traceable map from a single state [dim] to CV
            values (any shape; flattened).
        cv_start / cv_end: restraint center endpoints (scalar CV or
            [cv_dim]); start near the CV's equilibrium value so the
            burn-in equilibrates the restrained ensemble.
        kappa: restraint strength (scalar). Stiff-spring regime
            ``kappa >> beta^-1 / (CV scale)^2`` makes the restrained
            free energy approach the potential of mean force.
        n_steps: protocol length in integrator steps (must divide by
            ``report_interval``); slower pulls dissipate less.
        n_realizations: independent pulls M, vmapped (the Jarzynski
            average runs over these).
        X0: shared start [dim] (default standard normal) or per-
            realization [M, dim] starts.
        pre_steps: equilibration steps under the restraint FIXED at
            ``cv_start`` (discarded; gives each realization an
            independent equilibrium start — required for the Jarzynski
            identity). With ``pre_steps=0`` a warning is emitted unless
            ``X0`` provides per-realization starts (which the caller
            then asserts are already restrained-equilibrium samples).
        step_size / report_interval / seed / verbose: as in
            :func:`~colvarsfinder_tpu.utils.sampling.integrate_sde_overdamped`.
        mesh: optional :class:`jax.sharding.Mesh` — realizations are
            independent, so the M axis shards over the mesh's first
            axis (M must divide by the mesh size; zero collectives).

    Returns:
        :class:`SteeredResult`.
    """
    dim = pot_obj.dim
    beta = float(pot_obj.beta)
    c0 = np.asarray(cv_start, dtype=np.float64).reshape(-1)
    c1 = np.asarray(cv_end, dtype=np.float64).reshape(-1)
    if c0.shape != c1.shape:
        raise ValueError(
            f"cv_start {c0.shape} and cv_end {c1.shape} must match"
        )
    cv_dim = c0.size
    if n_steps < 1 or n_steps % report_interval:
        raise ValueError(
            f"n_steps ({n_steps}) must be a positive multiple of "
            f"report_interval ({report_interval}) so every report "
            "carries an exact work tally"
        )
    M = int(n_realizations)
    if pre_steps == 0 and (X0 is None or np.ndim(X0) == 1):
        # shared (often random) starts with no burn-in: the pulls do
        # not begin in the restrained equilibrium ensemble, so the
        # Jarzynski/cumulant free energies are silently biased
        warnings.warn(
            "integrate_sde_steered: pre_steps=0 with a shared X0 start "
            "— realizations are not equilibrated under the fixed "
            "cv_start restraint, biasing jarzynski()/cumulant(). Pass "
            "pre_steps>0 (the umbrella example uses 3000) or "
            "per-realization equilibrium X0 [M, dim].",
            stacklevel=2,
        )

    if seed is None:
        seed = np.random.randint(0, 2**31 - 1)
    key = jax.random.PRNGKey(seed)
    if X0 is None:
        key, sub = jax.random.split(key)
        X0 = np.asarray(jax.random.normal(sub, (dim,)))
    X0 = np.asarray(X0, dtype=np.float64)
    if X0.ndim == 1:
        X0 = np.broadcast_to(X0, (M, dim))
    elif X0.shape != (M, dim):
        raise ValueError(f"X0 must be [dim] or [M, dim]; got {X0.shape}")

    def cv_fn(x):
        return jnp.asarray(cv_model(x), dtype=jnp.float32).reshape(-1)

    cv_shape = jax.eval_shape(cv_fn, jnp.zeros((dim,), jnp.float32))
    cv_out = int(np.prod(cv_shape.shape)) if cv_shape.shape else 1
    if cv_out != cv_dim:
        raise ValueError(
            f"cv_model returns {cv_out} components but cv_start has "
            f"{cv_dim}"
        )

    kap = jnp.float32(kappa)

    def biased_v(x, c):
        d = cv_fn(x) - c
        return jnp.asarray(pot_obj.V(x)) + 0.5 * kap * jnp.sum(d * d)

    grad_single = jax.grad(biased_v)

    def grad_b(x, c):  # x: [M, dim], shared center
        return jax.vmap(lambda xx: grad_single(xx, c))(x)

    n_reports = n_steps // report_interval
    x0_dev = jnp.asarray(X0, jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis0 = mesh.axis_names[0]
        n_ax = int(mesh.shape[axis0])
        if M % n_ax:
            raise ValueError(
                f"n_realizations {M} must be divisible by the size of "
                f"mesh axis '{axis0}' ({n_ax}), which the pulls shard over"
            )
        x0_dev = jax.device_put(
            x0_dev, NamedSharding(mesh, PartitionSpec(axis0))
        )
    frames, cvs, works, sched = _steered_scan(
        grad_b,
        cv_fn,
        x0_dev,
        key,
        jnp.float32(step_size),
        jnp.float32(beta),
        jnp.asarray(c0, jnp.float32),
        jnp.asarray(c1, jnp.float32),
        kap,
        int(report_interval),
        int(n_reports),
        int(pre_steps),
    )
    res = SteeredResult(
        frames=np.asarray(frames).transpose(1, 0, 2),
        cv_values=np.asarray(cvs).transpose(1, 0, 2),
        works=np.asarray(works, dtype=np.float64).T,
        schedule=np.asarray(sched, dtype=np.float64),
        kappa=float(kappa),
        beta=beta,
        dt=step_size * report_interval,
    )
    if verbose:
        print(
            f"steered pulling: {M} realizations x {n_reports} reports; "
            f"<W> {res.works[:, -1].mean():.4g}, "
            f"dF(Jarzynski) {res.jarzynski()[-1]:.4g}"
        )
    return res


# ---------------------------------------------------------------------------
# replica-exchange molecular dynamics (parallel tempering)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class REMDResult:
    """Outcome of :func:`integrate_sde_remd` (K temperature slots).

    ``frames[k]`` is the TEMPERATURE-SLOT trajectory at ``betas[k]`` —
    slot k always samples the Boltzmann distribution at its own beta;
    accepted exchanges teleport configurations between slots, so slot
    trajectories are thermodynamically exact but kinetically
    discontinuous at swap points (``swap_history`` records them; the
    pooled :meth:`to_weighted_trajectory` turns each swap into a segment
    boundary so time-lagged objectives never pair across a teleport).

    Attributes:
        frames: [K, n_reports, dim] recorded states per slot.
        energies: [K, n_reports] potential energies of the recorded states.
        betas: [K] inverse temperatures (slot order).
        dt: time between recorded frames.
        pair_attempts / pair_accepts: [K-1] exchange statistics for the
            neighbor pairs (k, k+1).
        swap_history: [n_reports, K] bool — True where slot k's
            configuration was swapped just before recording frame j.
    """

    frames: np.ndarray
    energies: np.ndarray
    betas: np.ndarray
    dt: float
    pair_attempts: np.ndarray
    pair_accepts: np.ndarray
    swap_history: np.ndarray

    @property
    def n_replicas(self) -> int:
        return len(self.betas)

    @property
    def pair_acceptance(self) -> np.ndarray:
        """Acceptance rate per neighbor pair (nan where never attempted);
        a well-designed ladder sits around 0.2-0.4 everywhere."""
        with np.errstate(invalid="ignore"):
            return np.where(
                self.pair_attempts > 0,
                self.pair_accepts / np.maximum(self.pair_attempts, 1),
                np.nan,
            )

    def mbar(self, sys_beta: Optional[float] = None, **kwargs) -> MBARResult:
        """Temperature-MBAR weights targeting ``sys_beta`` (default: the
        coldest ladder temperature, i.e. the LARGEST beta): reduced bias
        energies
        ``u_k(x) = (beta_k - sys_beta) V(x)`` over the pooled samples —
        every slot contributes, hot slots downweighted exactly."""
        target = float(self.betas.max() if sys_beta is None else sys_beta)
        v_pooled = self.energies.reshape(-1)
        u_kn = (self.betas[:, None] - target) * v_pooled[None, :]
        return mbar_weights(
            [e[:, None] for e in self.energies], u_kn=u_kn, **kwargs
        )

    def to_weighted_trajectory(
        self,
        sys_beta: Optional[float] = None,
        mbar_result: Optional[MBARResult] = None,
    ):
        """Pool every slot into ONE training-ready
        :class:`~colvarsfinder_tpu.utils.trajectory.WeightedTrajectory`:
        frames concatenated, temperature-MBAR weights at ``sys_beta``
        attached (pooled mean 1), and ``segment_starts`` marking both the
        slot boundaries and every ACCEPTED exchange, so time-lagged
        training pairs never span a configuration teleport."""
        from .trajectory import WeightedTrajectory

        mb = mbar_result if mbar_result is not None else self.mbar(sys_beta)
        K, n, _ = self.frames.shape
        starts = [np.arange(K) * n]
        swap_j, swap_k = np.nonzero(self.swap_history)
        if swap_j.size:
            starts.append(swap_k * n + swap_j)
        # boundaries go through the constructor so the zero-weight frame
        # filter (temperature-MBAR weights of hot-slot energy spikes can
        # underflow to 0.0) remaps them to the surviving frames
        return WeightedTrajectory(
            trajectory=self.frames.reshape(-1, *self.frames.shape[2:]),
            weights=np.concatenate(mb.weights),
            dt=self.dt,
            verbose=False,
            segment_starts=np.unique(np.concatenate(starts)),
        )

    def subsample(self, g: Optional[float] = None) -> "REMDResult":
        """Decimate every temperature slot to (approximately)
        independent frames.

        Strides the report axis by ``ceil(g)``, with ``g`` defaulting to
        the maximum statistical inefficiency of the per-slot POTENTIAL
        ENERGY series (the observable temperature-MBAR actually
        reweights by) — computed with per-slot swap points as segment
        boundaries so the correlation estimate never spans a
        configuration teleport. ``swap_history`` is folded down so a
        kept frame is marked swapped iff ANY swap occurred since the
        previous kept frame; :meth:`to_weighted_trajectory` on the
        subsampled result therefore still breaks lagged pairs at every
        surviving discontinuity.
        """
        from ..analysis import statistical_inefficiency

        K, n = self.energies.shape
        if g is None:
            g = 1.0
            for k in range(K):
                segs = np.unique(
                    np.concatenate(
                        [[0], np.nonzero(self.swap_history[:, k])[0]]
                    )
                )
                g = max(
                    g,
                    float(statistical_inefficiency(
                        self.energies[k], segment_starts=segs
                    )[0]),
                )
        stride = max(1, int(np.ceil(float(g) - 1e-9)))
        kept = np.arange(0, n, stride)
        swapped = np.empty((kept.size, K), dtype=bool)
        swapped[0] = self.swap_history[0]
        for i in range(1, kept.size):
            swapped[i] = self.swap_history[
                kept[i - 1] + 1 : kept[i] + 1
            ].any(axis=0)
        return dataclasses.replace(
            self,
            frames=self.frames[:, kept],
            energies=self.energies[:, kept],
            swap_history=swapped,
            dt=self.dt * stride,
        )


@partial(
    jax.jit,
    static_argnames=(
        "grad_fn", "pot_v", "n_sub", "n_reports", "pre_steps",
        "exchange_every_blocks",
    ),
)
def _remd_scan(
    grad_fn, pot_v, x0, key, step_size, betas,
    n_sub, n_reports, pre_steps, exchange_every_blocks,
):
    """All K temperature slots as one scan: Euler–Maruyama blocks with the
    per-slot noise scale sqrt(2 dt / beta_k), and a vectorized
    even/odd-alternating neighbor-swap Metropolis attempt every
    ``exchange_every_blocks`` report blocks (before the block's first
    step). Same block-noise structure as sampling._em_scan."""
    K = x0.shape[0]
    noise_scale = jnp.sqrt(2.0 * step_size / betas)[:, None]
    burn_key, main_key, ex_key = jax.random.split(key, 3)
    i_arr = jnp.arange(K)

    def em_step(x, xi):
        return x - grad_fn(x) * step_size + noise_scale * xi

    n_burn_blocks = -(-pre_steps // n_sub) if pre_steps else 0

    def burn_block(x, i):
        noise = jax.random.normal(
            jax.random.fold_in(burn_key, i), (n_sub,) + x0.shape, x0.dtype
        )

        def body(j, xx):
            take = i * n_sub + j < pre_steps
            return jax.lax.cond(
                take, lambda: em_step(xx, noise[j]), lambda: xx
            )

        return jax.lax.fori_loop(0, n_sub, body, x), None

    x = x0
    if n_burn_blocks:
        x, _ = jax.lax.scan(burn_block, x, jnp.arange(n_burn_blocks))

    def attempt_exchange(x, attempt):
        vs = pot_v(x)  # [K]
        parity = attempt % 2
        partner = jnp.where((i_arr - parity) % 2 == 0, i_arr + 1, i_arr - 1)
        valid = (partner >= 0) & (partner < K)
        partner_c = jnp.clip(partner, 0, K - 1)
        lo = jnp.minimum(i_arr, partner_c)
        hi = jnp.maximum(i_arr, partner_c)
        # swapping x_lo <-> x_hi between slots lo/hi changes the joint
        # Gibbs exponent by (beta_lo - beta_hi)(V_lo - V_hi); accept in
        # log space (exp can overflow when the move is downhill)
        dlt = (betas[lo] - betas[hi]) * (vs[lo] - vs[hi])
        u = jax.random.uniform(jax.random.fold_in(ex_key, attempt), (K,))
        acc = valid & (jnp.log(u[lo]) < dlt)  # symmetric within a pair
        x = x[jnp.where(acc, partner_c, i_arr)]
        is_lo = valid & (i_arr == lo)
        return x, acc, is_lo, is_lo & acc

    zeros_b = jnp.zeros((K,), bool)

    def report_block(carry, b):
        x, att, accs = carry
        do_ex = (b % exchange_every_blocks == 0)
        x, moved, attempted, accepted = jax.lax.cond(
            do_ex,
            lambda: attempt_exchange(x, b // exchange_every_blocks),
            lambda: (x, zeros_b, zeros_b, zeros_b),
        )
        att = att + attempted.astype(jnp.int32)
        accs = accs + accepted.astype(jnp.int32)
        noise = jax.random.normal(
            jax.random.fold_in(main_key, b), (n_sub,) + x0.shape, x0.dtype
        )
        x = em_step(x, noise[0])
        frame = x

        def body(j, xx):
            return em_step(xx, noise[j])

        x = jax.lax.fori_loop(1, n_sub, body, x)
        return (x, att, accs), (frame, moved)

    counts0 = jnp.zeros((K,), jnp.int32)
    (_, att, accs), (frames, moved) = jax.lax.scan(
        report_block, (x, counts0, counts0), jnp.arange(n_reports)
    )
    return frames, moved, att, accs


def integrate_sde_remd(
    pot_obj,
    betas,
    n_steps: int,
    sampling_output_path: Optional[str] = None,
    X0: Optional[np.ndarray] = None,
    pre_steps: int = 0,
    step_size: float = 0.01,
    report_interval: int = 100,
    exchange_interval: Optional[int] = None,
    seed: Optional[int] = None,
    mesh=None,
    verbose: bool = True,
) -> REMDResult:
    """Replica-exchange (parallel tempering) sampling — all K temperature
    slots as ONE compiled, vmapped Euler–Maruyama scan with vectorized
    neighbor-swap Metropolis attempts folded into the scan body.

    Hot replicas cross barriers the target temperature cannot; accepted
    swaps hand those configurations down the ladder, so the cold slot
    explores every basin while still sampling its exact Boltzmann
    distribution (swaps satisfy detailed balance:
    ``P = min(1, exp((beta_a - beta_b)(V_a - V_b)))``, alternating
    even/odd neighbor pairs). The reference ecosystem has no native
    counterpart — this is the standard companion to its
    higher-temperature reweighting workflow (``calc_weights`` with
    ``sampling_beta != sys_beta``, reference utils.py:354-417),
    generalized from one hot trajectory to a coupled ladder.

    Args:
        pot_obj: potential (``dim`` / ``beta`` / ``V``, jax-traceable;
            ``gradV`` optional). ``pot_obj.beta`` is the conventional
            target — include it in the ladder (usually as ``betas[0]``).
        betas: [K] inverse-temperature ladder (any order; slot k stays at
            ``betas[k]``). Geometric spacing between the target and the
            hottest beta is the usual starting point; check
            ``result.pair_acceptance`` (aim for ~0.2-0.4 per pair).
        n_steps: integrator steps per slot.
        exchange_interval: steps between swap attempts (must be a
            multiple of ``report_interval``; default
            ``10 * report_interval``).
        sampling_output_path: when given, writes per-slot
            ``traj_replica{k}.txt`` (t, x...) and ``replicas.csv``
            (beta, pair acceptance).
        X0: initial state [dim] shared by all slots, or per-slot
            [K, dim].
        mesh: optional :class:`jax.sharding.Mesh` — slots shard over the
            mesh's first axis (K divisible by its size); the EM blocks
            are collective-free, exchanges gather across devices.
        pre_steps / step_size / report_interval / seed / verbose: as in
            :func:`~colvarsfinder_tpu.utils.sampling.integrate_sde_overdamped`.

    Returns:
        :class:`REMDResult` — ``.frames[k]`` per-slot trajectories,
        ``.pair_acceptance`` ladder diagnostics, ``.mbar()`` /
        ``.to_weighted_trajectory()`` for a pooled training-ready dataset
        (swap points become segment boundaries).
    """
    from .sampling import _batched_energy, _resolve_grad

    betas = np.asarray(betas, dtype=np.float64).reshape(-1)
    K = betas.shape[0]
    if K < 2:
        raise ValueError("replica exchange needs at least 2 betas")
    if (betas <= 0).any():
        raise ValueError("betas must be positive")
    if n_steps < 1:
        raise ValueError("n_steps must be >= 1")
    if exchange_interval is None:
        exchange_interval = 10 * report_interval
    if exchange_interval % report_interval:
        raise ValueError(
            f"exchange_interval ({exchange_interval}) must be a multiple "
            f"of report_interval ({report_interval})"
        )
    eeb = exchange_interval // report_interval
    dim = pot_obj.dim

    if seed is None:
        seed = np.random.randint(0, 2**31 - 1)
    key = jax.random.PRNGKey(seed)
    if X0 is None:
        key, sub = jax.random.split(key)
        X0 = np.asarray(jax.random.normal(sub, (dim,)))
    X0 = np.asarray(X0, dtype=np.float64)
    if X0.ndim == 1:
        X0 = np.broadcast_to(X0, (K, dim))
    elif X0.shape != (K, dim):
        raise ValueError(f"X0 must be [dim] or [K, dim]; got {X0.shape}")

    grad_single = _resolve_grad(pot_obj)
    grad_fn = jax.vmap(lambda x: jnp.asarray(grad_single(x)))
    pot_v = jax.vmap(lambda x: jnp.asarray(pot_obj.V(x)).reshape(()))

    n_reports = (n_steps - 1) // report_interval + 1
    x0_dev = jnp.asarray(X0, jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis0 = mesh.axis_names[0]
        n_ax = int(mesh.shape[axis0])
        if K % n_ax:
            raise ValueError(
                f"replica count {K} must be divisible by the size of mesh "
                f"axis '{axis0}' ({n_ax}), which the slots shard over"
            )
        x0_dev = jax.device_put(
            x0_dev, NamedSharding(mesh, PartitionSpec(axis0))
        )
    frames, moved, att, accs = _remd_scan(
        grad_fn, pot_v, x0_dev, key,
        jnp.float32(step_size), jnp.asarray(betas, jnp.float32),
        int(report_interval), int(n_reports), int(pre_steps), int(eeb),
    )
    frames = np.asarray(frames).transpose(1, 0, 2)  # [K, n_reports, dim]
    swap_history = np.asarray(moved)  # [n_reports, K]
    att = np.asarray(att)[: K - 1]
    accs = np.asarray(accs)[: K - 1]

    energies = _batched_energy(pot_obj, frames)

    result = REMDResult(
        frames=frames.astype(np.float32),
        energies=energies,
        betas=betas,
        dt=step_size * report_interval,
        pair_attempts=att,
        pair_accepts=accs,
        swap_history=swap_history,
    )

    if sampling_output_path is not None:
        os.makedirs(sampling_output_path, exist_ok=True)
        times = np.arange(n_reports) * step_size * report_interval
        for k in range(K):
            np.savetxt(
                os.path.join(sampling_output_path, f"traj_replica{k}.txt"),
                np.column_stack([times, frames[k]]),
                fmt="%.8g",
            )
        acc_rates = np.append(result.pair_acceptance, np.nan)
        np.savetxt(
            os.path.join(sampling_output_path, "replicas.csv"),
            np.column_stack([betas, acc_rates]),
            fmt="%.8g",
            delimiter=",",
            header="beta,pair_acceptance_up",
            comments="",
        )

    if verbose:
        print(
            f"replica exchange: {K} slots x {n_reports} frames; "
            f"pair acceptance {np.round(result.pair_acceptance, 3)}"
        )
    return result


# ---------------------------------------------------------------------------
# PLUMED interop: HILLS files + generalized metadynamics reweighting
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PlumedHills:
    """Contents of a (PLUMED-style) HILLS file.

    Attributes:
        times: ``[H]`` deposition times.
        centers: ``[H, k]`` hill centers (the CV at deposition).
        sigmas: ``[H, k]`` per-hill Gaussian widths.
        heights: ``[H]`` DEPOSITED heights. For well-tempered runs
            :func:`read_plumed_hills` has already undone PLUMED's
            ``gamma/(gamma-1)`` file rescaling, so these are the heights
            the bias is actually built from.
        bias_factor: well-tempered gamma, or None for standard
            metadynamics (PLUMED writes ``biasf`` of 1, or -1 in this
            package's writer, for non-tempered runs).
    """

    times: np.ndarray
    centers: np.ndarray
    sigmas: np.ndarray
    heights: np.ndarray
    bias_factor: Optional[float]

    @property
    def n_hills(self) -> int:
        return len(self.heights)

    def bias(self, s) -> np.ndarray:
        """Accumulated (final) bias at CV value(s) ``s`` [m, k] or [m]."""
        s = np.atleast_2d(np.asarray(s, dtype=np.float64))
        if s.shape[-1] != self.centers.shape[-1]:
            s = s.reshape(-1, self.centers.shape[-1])
        inv = 1.0 / (2.0 * self.sigmas**2)  # [H, k]
        d2 = ((s[:, None, :] - self.centers[None, :, :]) ** 2 * inv[None])
        return (self.heights[None, :] * np.exp(-d2.sum(-1))).sum(-1)


def read_plumed_hills(path: str) -> PlumedHills:
    """Parse a PLUMED ``HILLS`` file (also the format this package's
    :func:`integrate_sde_metadynamics` writes).

    Layout: ``#! FIELDS time <cv...> sigma_<cv...> height biasf`` header
    followed by numeric rows; repeated header blocks (PLUMED restarts)
    and comment lines are tolerated. The CV dimensionality is inferred
    from the FIELDS names (columns between ``time`` and the first
    ``sigma_*``).

    The reweighting entry point for trajectories biased by an EXTERNAL
    engine: run PLUMED metadynamics anywhere, then
    :func:`metad_frame_weights` with the CV series of the frames (e.g.
    the COLVAR file) to get unbiased-ensemble training weights
    (reference ecosystem path: utils.py:220-223 + :354-417).
    """
    rows: list = []
    k = None
    header: Optional[list] = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                toks = line.split()
                if "SET" in toks and "multivariate" in toks:
                    flag = toks[toks.index("multivariate") + 1 :]
                    if flag and flag[0].lower() == "true":
                        raise ValueError(
                            f"{path}: multivariate (adaptive-Gaussian) "
                            "HILLS files store k(k+1)/2 covariance "
                            "columns and are not supported"
                        )
                if "FIELDS" in toks:
                    # names like: #! FIELDS time cv1 ... sigma_cv1 ... height biasf
                    try:
                        fields = toks[toks.index("FIELDS") + 1 :]
                        if header is not None and fields != header:
                            raise ValueError(
                                f"{path}: restart block changes the "
                                f"columns ({header} -> {fields})"
                            )
                        header = fields
                        t_idx = fields.index("time")
                        sig0 = next(
                            i for i, nm in enumerate(fields)
                            if nm.startswith("sigma_")
                        )
                        k = sig0 - (t_idx + 1)
                        if fields[sig0 + k] != "height":
                            raise ValueError(
                                f"{path}: expected 'height' after {k} "
                                f"sigma columns, found "
                                f"'{fields[sig0 + k]}' — non-diagonal "
                                "(multivariate) sigma layout?"
                            )
                    except (StopIteration, IndexError):
                        raise ValueError(
                            f"{path}: unrecognized FIELDS header: {line}"
                        ) from None
                continue
            rows.append([float(v) for v in line.split()])
    if not rows:
        raise ValueError(f"{path}: no hill rows")
    data = np.asarray(rows, dtype=np.float64)
    if k is None:
        # no header: infer from column count (time, k cv, k sigma,
        # height, biasf)
        if (data.shape[1] - 3) % 2:
            raise ValueError(
                f"{path}: cannot infer CV dimensionality from "
                f"{data.shape[1]} columns without a FIELDS header"
            )
        k = (data.shape[1] - 3) // 2
    if data.shape[1] < 2 * k + 3:
        raise ValueError(
            f"{path}: rows have {data.shape[1]} columns, expected "
            f"{2 * k + 3} (time, {k} cv, {k} sigma, height, biasf)"
        )
    times = data[:, 0]
    centers = data[:, 1 : 1 + k]
    sigmas = data[:, 1 + k : 1 + 2 * k]
    heights = data[:, 1 + 2 * k].copy()
    biasf = data[:, 2 + 2 * k]
    bf = float(biasf[0])
    bias_factor = bf if bf > 1.0 else None
    if bias_factor is not None:
        # PLUMED convention (MetaD::writeGaussian): well-tempered HILLS
        # store heights rescaled by gamma/(gamma-1) so sum_hills
        # integrates to -F directly; undo it to recover the DEPOSITED
        # heights the bias is actually built from (PLUMED's own reader
        # does the same division).
        heights *= (bias_factor - 1.0) / bias_factor
    return PlumedHills(times, centers, sigmas, heights, bias_factor)


def _hills_grid(centers: np.ndarray, sigmas: np.ndarray,
                grid_points: int) -> np.ndarray:
    dim = centers.shape[-1]
    if dim > 2:
        raise ValueError(
            f"no default grid for a {dim}-dimensional CV — pass "
            "grid=[n_points, cv_dim] explicitly"
        )
    smax = float(sigmas.max())
    axes = [
        np.linspace(
            centers[:, d].min() - 4 * smax,
            centers[:, d].max() + 4 * smax,
            grid_points,
        )
        for d in range(dim)
    ]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.ravel() for m in mesh], axis=-1)


def metad_frame_weights(
    cv_values,
    hills: PlumedHills,
    frame_times=None,
    beta: float = 1.0,
    method: str = "tiwary",
    grid: Optional[np.ndarray] = None,
    grid_points: int = 129,
    _cutoffs=None,
) -> np.ndarray:
    """Unbiased-ensemble weights for ARBITRARY frames of a metadynamics
    run described by a HILLS file.

    The generalization of :meth:`MetadynamicsResult.frame_weights` to
    frames that are not the deposition frames — e.g. a PLUMED COLVAR
    series sampled every MD step while hills were deposited every
    PACE steps, or frames re-evaluated through a retrained CV.

    Args:
        cv_values: ``[n]`` or ``[n, k]`` CV values of the frames to
            reweight (must be the same CV the hills act on).
        hills: :class:`PlumedHills` (from :func:`read_plumed_hills` or
            built directly from arrays).
        frame_times: ``[n]`` times of the frames on the SAME clock as
            ``hills.times``. Required for ``method='tiwary'`` (each
            frame sees only hills deposited strictly before it);
            ignored by ``'final-bias'``.
        beta: inverse temperature of the run.
        method: ``'final-bias'`` (quasi-static, ``w ∝ exp(beta V_b(s))``
            with the final bias) or ``'tiwary'`` (time-dependent
            estimator — see :meth:`MetadynamicsResult.frame_weights`).
        grid / grid_points: CV grid for the Tiwary ``c(t)`` integrals.

    Returns:
        weights ``[n]`` with mean 1, aligned with ``cv_values``.
    """
    s = np.atleast_2d(np.asarray(cv_values, dtype=np.float64))
    k = hills.centers.shape[-1]
    if s.shape[-1] != k:
        s = s.reshape(-1, k)
    n = s.shape[0]
    H = hills.n_hills
    inv = 1.0 / (2.0 * hills.sigmas**2)  # [H, k]
    heights = hills.heights.astype(np.float64)

    if method == "final-bias":
        expo = beta * hills.bias(s)
    elif method == "tiwary":
        if _cutoffs is not None:
            cut = np.asarray(_cutoffs, dtype=np.int64)
        else:
            if frame_times is None:
                raise ValueError(
                    "method='tiwary' needs frame_times (hills deposited "
                    "strictly before each frame define its bias)"
                )
            cut = np.searchsorted(
                hills.times, np.asarray(frame_times, dtype=np.float64),
                side="left",
            )
        if grid is None:
            grid = _hills_grid(hills.centers, hills.sigmas, grid_points)
        grid = np.asarray(grid, dtype=np.float64)

        beta_f = float(beta)
        if hills.bias_factor is None:  # standard metadynamics
            a1, a2 = beta_f, 0.0
        else:
            g = hills.bias_factor
            a1, a2 = beta_f * g / (g - 1.0), beta_f / (g - 1.0)

        # c after j hills, j = 0..H, via grid integrals of the partial
        # bias (log-sum-exp, chunked over grid points)
        log_i1 = np.full(H + 1, -np.inf)
        log_i2 = np.full(H + 1, -np.inf)
        chunk = max(1, int(2e7) // max(H, 1))
        for lo in range(0, grid.shape[0], chunk):
            gpts = grid[lo : lo + chunk]
            d2 = (
                (gpts[None, :, :] - hills.centers[:, None, :]) ** 2
                * inv[:, None, :]
            ).sum(-1)
            hill_mat = heights[:, None] * np.exp(-d2)  # [H, g]
            vpart = np.concatenate(
                [np.zeros((1, gpts.shape[0])), np.cumsum(hill_mat, axis=0)],
                axis=0,
            )  # [H+1, g]: bias after j hills
            for log_acc, a in ((log_i1, a1), (log_i2, a2)):
                m = (a * vpart).max(axis=1)
                ssum = np.log(
                    np.exp(a * vpart - m[:, None]).sum(axis=1)
                ) + m
                hi = np.maximum(log_acc, ssum)
                log_acc[:] = hi + np.log(
                    np.exp(log_acc - hi) + np.exp(ssum - hi)
                )
        c_after = (log_i1 - log_i2) / beta_f  # [H+1]

        # V(s_i, t_i): partial bias at each frame's own CV (chunked)
        v_own = np.empty(n)
        fchunk = max(1, int(2e7) // max(H, 1))
        for lo in range(0, n, fchunk):
            sl = s[lo : lo + fchunk]
            d2f = (
                (sl[:, None, :] - hills.centers[None, :, :]) ** 2
                * inv[None, :, :]
            ).sum(-1)
            M = heights[None, :] * np.exp(-d2f)  # [m, H]
            csum = np.concatenate(
                [np.zeros((sl.shape[0], 1)), np.cumsum(M, axis=1)], axis=1
            )
            v_own[lo : lo + fchunk] = csum[
                np.arange(sl.shape[0]), cut[lo : lo + fchunk]
            ]
        expo = beta_f * (v_own - c_after[cut])
    else:
        raise ValueError(
            f"unknown reweighting method '{method}' "
            "(use 'final-bias' or 'tiwary')"
        )
    w = np.exp(expo - expo.max())
    return w / w.mean()


def read_plumed_colvar(path: str, fields: Optional[list] = None):
    """Parse a PLUMED ``COLVAR`` file (``PRINT`` output: ``#! FIELDS
    time <name...>`` header + numeric rows; restart blocks tolerated).

    Args:
        path: COLVAR file path.
        fields: optional list of column names to return (default: every
            column after ``time``).

    Returns:
        ``(times [n], values [n, len(fields)], names)`` — feed
        ``values``/``times`` straight into :func:`metad_frame_weights`
        (select the biased CV columns via ``fields``).
    """
    names: Optional[list] = None
    rows: list = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                if "FIELDS" in line:
                    toks = line.split()
                    new = toks[toks.index("FIELDS") + 1 :]
                    if names is not None and new != names:
                        raise ValueError(
                            f"{path}: restart block changes the columns "
                            f"({names} -> {new})"
                        )
                    names = new
                continue
            rows.append([float(v) for v in line.split()])
    if names is None:
        raise ValueError(f"{path}: no FIELDS header")
    if not rows:
        raise ValueError(f"{path}: no data rows")
    data = np.asarray(rows, dtype=np.float64)
    if data.shape[1] != len(names):
        raise ValueError(
            f"{path}: rows have {data.shape[1]} columns but FIELDS "
            f"names {len(names)}"
        )
    if "time" not in names:
        raise ValueError(f"{path}: no 'time' column in FIELDS")
    t_idx = names.index("time")
    times = data[:, t_idx]
    value_names = [nm for i, nm in enumerate(names) if i != t_idx]
    if fields is not None:
        missing = [nm for nm in fields if nm not in value_names]
        if missing:
            raise ValueError(
                f"{path}: columns {missing} not present "
                f"(available: {value_names})"
            )
        value_names = list(fields)
    cols = [names.index(nm) for nm in value_names]
    return times, data[:, cols], value_names
