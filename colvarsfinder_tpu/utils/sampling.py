r"""Trajectory samplers.

TPU-native counterpart of the reference's samplers
(reference: colvarsfinder/utils.py:172-352).

* :func:`integrate_sde_overdamped` — Euler–Maruyama integration of
  overdamped Langevin dynamics. Where the reference runs a Python loop
  calling the potential's numpy ``gradV`` once per step
  (utils.py:324-348, the structural bottleneck), here the entire
  integration is one ``lax.scan`` compiled by XLA, with
  ``report_interval`` decimation folded into the scan and optional
  vmapped independent chains. A numpy fallback reproduces the reference
  loop for potentials that are not jax-traceable.
* :func:`integrate_sde_langevin` — UNDERDAMPED Langevin dynamics via the
  BAOAB splitting (the same integrator family as OpenMM's
  ``LangevinMiddleIntegrator``), same one-scan structure; the native
  sampler for systems with inertia when no MD engine is available.
* :func:`integrate_md_langevin` — thin host-side wrapper around OpenMM
  (reference utils.py:172-255); OpenMM import is gated since MD
  integration is inherently sequential engine work that stays off-TPU.
"""

from __future__ import annotations

import os
import time
import warnings
from functools import partial
from typing import Optional

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

__all__ = [
    "integrate_sde_overdamped",
    "integrate_sde_langevin",
    "integrate_md_langevin",
]


def _resolve_grad(pot_obj):
    """Return a jax-traceable gradV, deriving it from V if absent."""
    grad_fn = getattr(pot_obj, "gradV", None)
    if grad_fn is None:
        grad_fn = jax.grad(lambda x: jnp.asarray(pot_obj.V(x)).sum())
    return grad_fn


@partial(jax.jit, static_argnames=("grad_fn", "n_sub", "n_reports", "pre_steps"))
def _em_scan(grad_fn, x0, key, step_size, beta, n_sub, n_reports, pre_steps):
    """Scan n_reports blocks of n_sub Euler–Maruyama steps, recording once
    per block (after the first step of the block, matching the reference's
    ``i % report_interval == 0`` recording points, utils.py:340).

    TPU note: Brownian increments are generated one *block* at a time
    (counter-based ``fold_in`` + a single [n_sub, c, d] normal draw) rather
    than one threefry call per step — 3x faster and a much smaller compiled
    program than per-step key splitting; the sequential dependence of the
    integrator itself is irreducible.

    x0: [c, d] chains; returns (final_x, frames [n_reports, c, d]).
    """
    noise_scale = jnp.sqrt(2.0 * step_size / beta)
    burn_key, main_key = jax.random.split(key)

    def em_step(x, xi):
        return x - grad_fn(x) * step_size + noise_scale * xi

    # burn-in in blocks of n_sub
    n_burn_blocks = -(-pre_steps // n_sub) if pre_steps else 0

    def burn_block(x, i):
        noise = jax.random.normal(
            jax.random.fold_in(burn_key, i), (n_sub,) + x.shape, x.dtype
        )

        def body(j, xx):
            take = i * n_sub + j < pre_steps
            return jax.lax.cond(
                take, lambda: em_step(xx, noise[j]), lambda: xx
            )

        return jax.lax.fori_loop(0, n_sub, body, x), None

    if n_burn_blocks:
        x, _ = jax.lax.scan(
            burn_block, x0, jnp.arange(n_burn_blocks)
        )
    else:
        x = x0

    def report_block(x, i):
        noise = jax.random.normal(
            jax.random.fold_in(main_key, i), (n_sub,) + x.shape, x.dtype
        )
        # one recorded step, then n_sub - 1 unrecorded ones
        # (unrolling measured: 8-wide is 15% SLOWER and costs 20x compile —
        # the chain is sequential, so unrolling only bloats the program)
        x = em_step(x, noise[0])
        frame = x

        def body(j, xx):
            return em_step(xx, noise[j])

        x = jax.lax.fori_loop(1, n_sub, body, x)
        return x, frame

    x, frames = jax.lax.scan(report_block, x, jnp.arange(n_reports))
    return x, frames


def integrate_sde_overdamped(
    pot_obj,
    n_steps: int,
    sampling_output_path: str,
    X0: Optional[np.ndarray] = None,
    pre_steps: int = 0,
    step_size: float = 0.01,
    traj_txt_filename: str = "traj.txt",
    csv_filename: str = "output.csv",
    report_interval: int = 100,
    report_interval_stdout: int = 100,
    seed: Optional[int] = None,
    n_chains: int = 1,
    verbose: bool = True,
):
    r"""Sample overdamped Langevin dynamics with Euler–Maruyama.

    Contract mirrors the reference (colvarsfinder/utils.py:257-352):
    ``pot_obj`` has ``dim``, ``beta`` and member functions ``V`` /
    ``gradV``; a trajectory text file (rows ``t x_1 ... x_d``) and a
    Time,Energy CSV are written to ``sampling_output_path``.

    TPU-native extensions:

    * the whole integration (burn-in + main loop + decimation) is one
      jitted ``lax.scan`` when the potential is jax-traceable;
    * ``n_chains`` > 1 integrates independent chains in a single vmapped
      program; chain c > 0 writes ``traj_chain{c}.txt`` etc.;
    * ``gradV`` is optional — derived by ``jax.grad`` from ``V`` if absent;
    * recorded frames are also returned as arrays (frames [n_reports, d]
      or [n_chains, n_reports, d], energies likewise) so callers can skip
      file round-trips entirely.

    Recording semantics match the reference: state after the update of step
    ``i`` is recorded iff ``i % report_interval == 0``, with time stamped
    ``i * step_size`` (utils.py:340-344); trailing unrecorded steps are
    skipped since no observable depends on them.
    """
    dim = pot_obj.dim
    sampling_beta = float(pot_obj.beta)

    if verbose:
        print(f"writing trajectory outputs to: {sampling_output_path}")
        print(f"sampling beta={sampling_beta:.3f}, dt={step_size:.3f}\n")

    if seed is None:
        seed = np.random.randint(0, 2**31 - 1)
    key = jax.random.PRNGKey(seed)

    if X0 is None:
        key, sub = jax.random.split(key)
        X0 = np.asarray(jax.random.normal(sub, (n_chains, dim)))
    else:
        X0 = np.broadcast_to(np.asarray(X0, dtype=np.float64), (n_chains, dim))

    n_reports = (n_steps - 1) // report_interval + 1 if n_steps > 0 else 0

    try:
        frames = _run_jax(
            pot_obj, X0, key, step_size, sampling_beta,
            report_interval, n_reports, pre_steps,
        )
    except (jax.errors.TracerArrayConversionError,
            jax.errors.TracerBoolConversionError,
            jax.errors.ConcretizationTypeError,
            TypeError) as e:
        warnings.warn(
            f"potential is not jax-traceable ({type(e).__name__}); "
            "falling back to host numpy integration"
        )
        frames = _run_numpy(
            pot_obj, X0, seed, step_size, sampling_beta,
            report_interval, n_reports, pre_steps, n_steps,
        )

    # energies of recorded frames (batched evaluation)
    times = np.arange(n_reports) * report_interval * step_size
    energies = _batched_energy(pot_obj, frames)

    # write outputs per chain, preserving the reference file formats
    os.makedirs(sampling_output_path, exist_ok=True)
    for c in range(n_chains):
        suffix = "" if c == 0 else f"_chain{c}"
        tname = _with_suffix(traj_txt_filename, suffix)
        cname = _with_suffix(csv_filename, suffix)
        traj_path = os.path.join(sampling_output_path, tname)
        with open(traj_path, "w+") as f:
            for j in range(n_reports):
                row = frames[c, j]
                f.write(
                    f"{times[j]:.3f} "
                    + " ".join(f"{x:.6f}" for x in row)
                    + "\n"
                )
        csv_data = pd.DataFrame(
            {"Time": times, "Energy": energies[c]}
        )
        csv_data.to_csv(os.path.join(sampling_output_path, cname), index=False)

    if verbose:
        print(f"{n_reports} frames recorded per chain ({n_chains} chains)")

    if n_chains == 1:
        return frames[0], energies[0]
    return frames, energies


def _with_suffix(filename: str, suffix: str) -> str:
    if not suffix:
        return filename
    root, ext = os.path.splitext(filename)
    return f"{root}{suffix}{ext}"


def _run_jax(pot_obj, X0, key, step_size, beta, report_interval,
             n_reports, pre_steps):
    grad_single = _resolve_grad(pot_obj)
    # vmap over chains; the user contract is single-state V/gradV ([d] -> [d])
    grad_fn = jax.vmap(lambda x: jnp.asarray(grad_single(x)))
    x0 = jnp.asarray(X0, dtype=jnp.float32)
    _, frames = _em_scan(
        grad_fn, x0, key,
        jnp.float32(step_size), jnp.float32(beta),
        int(report_interval), int(n_reports), int(pre_steps),
    )
    # frames: [n_reports, c, d] -> [c, n_reports, d]
    return np.asarray(jnp.swapaxes(frames, 0, 1), dtype=np.float64)


def _numpy_grad(pot_obj):
    """Host-side gradient for the numpy fallback: ``gradV`` if the potential
    defines it, else central finite differences on ``V`` (the jax path
    derives gradV by autodiff, but a potential that reached this fallback is
    not traceable, so derive it numerically instead of crashing)."""
    grad_fn = getattr(pot_obj, "gradV", None)
    if grad_fn is not None:
        return lambda x: np.asarray(grad_fn(x), dtype=np.float64)
    V = getattr(pot_obj, "V", None)
    if V is None:
        raise AttributeError(
            "potential defines neither gradV nor V; cannot integrate"
        )

    def fd_grad(x, eps=1e-6):
        g = np.empty_like(x)
        for i in range(x.shape[0]):
            xp, xm = x.copy(), x.copy()
            xp[i] += eps
            xm[i] -= eps
            g[i] = (float(V(xp)) - float(V(xm))) / (2 * eps)
        return g

    return fd_grad


def _run_numpy(pot_obj, X0, seed, step_size, beta, report_interval,
               n_reports, pre_steps, n_steps):
    """Host fallback replicating the reference loop semantics
    (utils.py:320-348)."""
    rng = np.random.default_rng(seed)
    grad_fn = _numpy_grad(pot_obj)
    n_chains, dim = X0.shape
    frames = np.zeros((n_chains, n_reports, dim))
    noise_scale = np.sqrt(2 * step_size / beta)
    for c in range(n_chains):
        x = np.array(X0[c], dtype=np.float64)
        for _ in range(pre_steps):
            xi = rng.standard_normal(dim)
            x = x - grad_fn(x) * step_size + noise_scale * xi
        j = 0
        last_record = (n_reports - 1) * report_interval
        for i in range(last_record + 1):
            xi = rng.standard_normal(dim)
            x = x - grad_fn(x) * step_size + noise_scale * xi
            if i % report_interval == 0:
                frames[c, j] = x
                j += 1
    return frames


def _batched_energy(pot_obj, frames: np.ndarray) -> np.ndarray:
    """Evaluate V on all recorded frames; vectorized when traceable."""
    n_chains, n_reports, dim = frames.shape
    flat = frames.reshape(-1, dim)
    try:
        v = jax.jit(jax.vmap(lambda x: jnp.asarray(pot_obj.V(x)).reshape(())))(
            jnp.asarray(flat, dtype=jnp.float32)
        )
        return np.asarray(v, dtype=np.float64).reshape(n_chains, n_reports)
    except Exception:
        vals = np.array(
            [np.asarray(pot_obj.V(x)).reshape(()) for x in flat]
        )
        return vals.reshape(n_chains, n_reports)


# ---------------------------------------------------------------------------
# underdamped Langevin (BAOAB)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("grad_fn", "n_sub", "n_reports", "pre_steps"),
)
def _baoab_scan(
    grad_fn, x0, v0, key, dt, c1, c2, inv_mass, sigma_v,
    n_sub, n_reports, pre_steps,
):
    """BAOAB splitting of underdamped Langevin dynamics as one scan.

    Same block-noise / decimation structure as :func:`_em_scan` (one
    [n_sub, c, d] normal draw per report block). The force at the end of a
    step's trailing B is reused as the next step's leading B, so each step
    costs one gradient evaluation. Carry: (x, v, f).
    """
    half_dt = 0.5 * dt
    burn_key, main_key = jax.random.split(key)

    def baoab_step(carry, xi):
        x, v, f = carry
        v = v - half_dt * f * inv_mass          # B
        x = x + half_dt * v                     # A
        v = c1 * v + c2 * sigma_v * xi          # O
        x = x + half_dt * v                     # A
        f = grad_fn(x)
        v = v - half_dt * f * inv_mass          # B
        return (x, v, f)

    carry = (x0, v0, grad_fn(x0))

    n_burn_blocks = -(-pre_steps // n_sub) if pre_steps else 0

    def burn_block(carry, i):
        noise = jax.random.normal(
            jax.random.fold_in(burn_key, i), (n_sub,) + x0.shape, x0.dtype
        )

        def body(j, cc):
            take = i * n_sub + j < pre_steps
            return jax.lax.cond(
                take, lambda: baoab_step(cc, noise[j]), lambda: cc
            )

        return jax.lax.fori_loop(0, n_sub, body, carry), None

    if n_burn_blocks:
        carry, _ = jax.lax.scan(
            burn_block, carry, jnp.arange(n_burn_blocks)
        )

    def report_block(carry, i):
        noise = jax.random.normal(
            jax.random.fold_in(main_key, i), (n_sub,) + x0.shape, x0.dtype
        )
        carry = baoab_step(carry, noise[0])
        frame = (carry[0], carry[1])

        def body(j, cc):
            return baoab_step(cc, noise[j])

        carry = jax.lax.fori_loop(1, n_sub, body, carry)
        return carry, frame

    carry, (frames, vels) = jax.lax.scan(
        report_block, carry, jnp.arange(n_reports)
    )
    return frames, vels


def integrate_sde_langevin(
    pot_obj,
    n_steps: int,
    sampling_output_path: str,
    X0: Optional[np.ndarray] = None,
    V0: Optional[np.ndarray] = None,
    friction: float = 1.0,
    masses=None,
    pre_steps: int = 0,
    step_size: float = 0.01,
    traj_txt_filename: str = "traj.txt",
    csv_filename: str = "output.csv",
    report_interval: int = 100,
    seed: Optional[int] = None,
    n_chains: int = 1,
    return_velocities: bool = False,
    verbose: bool = True,
):
    r"""Sample UNDERDAMPED Langevin dynamics with the BAOAB integrator.

    The native analog of the reference's OpenMM MD sampler
    (``integrate_md_langevin``, reference colvarsfinder/utils.py:172-255,
    whose engine integrates the same underdamped Langevin equation):

    .. math::
        dx = v\,dt,\qquad
        m\,dv = -\nabla V(x)\,dt - \gamma m v\,dt
                + \sqrt{2\gamma m/\beta}\,dW

    via the BAOAB splitting (Leimkuhler & Matthews 2013) — the same family
    as OpenMM's ``LangevinMiddleIntegrator`` — which samples the
    configurational Boltzmann distribution with :math:`O(dt^2)` accuracy
    and tolerates much larger steps than Euler–Maruyama. The exact OU
    substep uses :math:`c_1 = e^{-\gamma dt}`,
    :math:`c_2 = \sqrt{1 - c_1^2}`.

    Contract mirrors :func:`integrate_sde_overdamped`: ``pot_obj`` has
    ``dim``, ``beta``, ``V`` (and optionally ``gradV``); trajectory text
    files (rows ``t x_1 ... x_d``) and a Time,Energy CSV (potential energy
    — what :func:`~colvarsfinder_tpu.utils.calc_weights` consumes) are
    written per chain; the whole integration (burn-in + main loop +
    decimation) is one jitted ``lax.scan`` with vmapped chains, with a
    host-numpy fallback for non-traceable potentials.

    Args:
        friction: :math:`\gamma` in 1/time units.
        masses: scalar or per-dimension [d] masses (default 1).
        V0: initial velocities [d] or [n_chains, d]; default drawn from the
            Maxwell–Boltzmann distribution at ``pot_obj.beta``.
        return_velocities: also return recorded velocities.

    Returns:
        ``(frames, energies)`` — shapes as in
        :func:`integrate_sde_overdamped` — or ``(frames, energies,
        velocities)`` when ``return_velocities``.
    """
    dim = pot_obj.dim
    sampling_beta = float(pot_obj.beta)

    if verbose:
        print(f"writing trajectory outputs to: {sampling_output_path}")
        print(
            f"sampling beta={sampling_beta:.3f}, dt={step_size:.3f}, "
            f"friction={friction:.3f} (BAOAB)\n"
        )

    if seed is None:
        seed = np.random.randint(0, 2**31 - 1)
    key = jax.random.PRNGKey(seed)

    mass = np.broadcast_to(
        np.asarray(1.0 if masses is None else masses, dtype=np.float64),
        (dim,),
    )
    inv_mass = 1.0 / mass
    sigma_v = np.sqrt(1.0 / (sampling_beta * mass))
    c1 = float(np.exp(-friction * step_size))
    c2 = float(np.sqrt(1.0 - c1 * c1))

    if X0 is None:
        key, sub = jax.random.split(key)
        X0 = np.asarray(jax.random.normal(sub, (n_chains, dim)))
    else:
        X0 = np.broadcast_to(np.asarray(X0, dtype=np.float64), (n_chains, dim))
    if V0 is None:
        key, sub = jax.random.split(key)
        V0 = np.asarray(jax.random.normal(sub, (n_chains, dim))) * sigma_v
    else:
        V0 = np.broadcast_to(np.asarray(V0, dtype=np.float64), (n_chains, dim))

    n_reports = (n_steps - 1) // report_interval + 1 if n_steps > 0 else 0

    try:
        grad_single = _resolve_grad(pot_obj)
        grad_fn = jax.vmap(lambda x: jnp.asarray(grad_single(x)))
        frames, vels = _baoab_scan(
            grad_fn,
            jnp.asarray(X0, dtype=jnp.float32),
            jnp.asarray(V0, dtype=jnp.float32),
            key,
            jnp.float32(step_size),
            jnp.float32(c1),
            jnp.float32(c2),
            jnp.asarray(inv_mass, dtype=jnp.float32),
            jnp.asarray(sigma_v, dtype=jnp.float32),
            int(report_interval), int(n_reports), int(pre_steps),
        )
        frames = np.asarray(jnp.swapaxes(frames, 0, 1), dtype=np.float64)
        vels = np.asarray(jnp.swapaxes(vels, 0, 1), dtype=np.float64)
    except (jax.errors.TracerArrayConversionError,
            jax.errors.TracerBoolConversionError,
            jax.errors.ConcretizationTypeError,
            TypeError) as e:
        warnings.warn(
            f"potential is not jax-traceable ({type(e).__name__}); "
            "falling back to host numpy integration"
        )
        frames, vels = _run_numpy_baoab(
            pot_obj, X0, V0, seed, step_size, c1, c2, inv_mass, sigma_v,
            report_interval, n_reports, pre_steps,
        )

    times = np.arange(n_reports) * report_interval * step_size
    energies = _batched_energy(pot_obj, frames)

    os.makedirs(sampling_output_path, exist_ok=True)
    for c in range(n_chains):
        suffix = "" if c == 0 else f"_chain{c}"
        tname = _with_suffix(traj_txt_filename, suffix)
        cname = _with_suffix(csv_filename, suffix)
        with open(os.path.join(sampling_output_path, tname), "w+") as f:
            for j in range(n_reports):
                row = frames[c, j]
                f.write(
                    f"{times[j]:.3f} "
                    + " ".join(f"{x:.6f}" for x in row)
                    + "\n"
                )
        pd.DataFrame({"Time": times, "Energy": energies[c]}).to_csv(
            os.path.join(sampling_output_path, cname), index=False
        )

    if verbose:
        print(f"{n_reports} frames recorded per chain ({n_chains} chains)")

    if n_chains == 1:
        frames, energies, vels = frames[0], energies[0], vels[0]
    if return_velocities:
        return frames, energies, vels
    return frames, energies


def _run_numpy_baoab(pot_obj, X0, V0, seed, dt, c1, c2, inv_mass, sigma_v,
                     report_interval, n_reports, pre_steps):
    """Host fallback with the same BAOAB stepping and recording points."""
    rng = np.random.default_rng(seed)
    grad_fn = _numpy_grad(pot_obj)
    n_chains, dim = X0.shape
    frames = np.zeros((n_chains, n_reports, dim))
    vels = np.zeros((n_chains, n_reports, dim))
    half_dt = 0.5 * dt
    for c in range(n_chains):
        x = np.array(X0[c], dtype=np.float64)
        v = np.array(V0[c], dtype=np.float64)
        f = grad_fn(x)

        def step(x, v, f):
            v = v - half_dt * f * inv_mass
            x = x + half_dt * v
            v = c1 * v + c2 * sigma_v * rng.standard_normal(dim)
            x = x + half_dt * v
            f = grad_fn(x)
            v = v - half_dt * f * inv_mass
            return x, v, f

        for _ in range(pre_steps):
            x, v, f = step(x, v, f)
        j = 0
        last_record = (n_reports - 1) * report_interval
        for i in range(last_record + 1):
            x, v, f = step(x, v, f)
            if i % report_interval == 0:
                frames[c, j] = x
                vels[c, j] = v
                j += 1
    return frames, vels


def integrate_md_langevin(
    pdb,
    system,
    integrator,
    n_steps: int,
    sampling_output_path: str,
    pre_steps: int = 0,
    traj_dcd_filename: str = "traj.dcd",
    csv_filename: str = "output.csv",
    report_interval: int = 100,
    report_interval_stdout: int = 100,
    plumed_script: Optional[str] = None,
    verbose: bool = True,
):
    r"""Generate MD trajectory data by running Langevin dynamics in OpenMM
    (same capability as reference colvarsfinder/utils.py:172-255).

    MD integration is inherently sequential engine work and stays on the
    host (OpenMM's C++/CUDA engine); the products — a DCD trajectory and a
    statistics CSV under ``sampling_output_path`` — feed the on-device
    training pipeline via :class:`WeightedTrajectory` /
    :func:`colvarsfinder_tpu.utils.calc_weights`.

    Pipeline: [optional PLUMED bias] -> energy minimization ->
    ``pre_steps`` of un-recorded equilibration -> ``n_steps`` of production
    with a DCD reporter (every ``report_interval`` steps), a CSV reporter
    recording time/potential/total energy/temperature (needed downstream by
    ``calc_weights``), and a stdout progress reporter.

    Returns ``(dcd_path, csv_path, elapsed_seconds)``.
    """
    try:
        import openmm.app as mm_app
    except ImportError as e:  # pragma: no cover - depends on environment
        raise ImportError(
            "integrate_md_langevin requires OpenMM "
            "(pip install openmm); for SDE systems use "
            "integrate_sde_overdamped instead"
        ) from e
    import sys

    os.makedirs(sampling_output_path, exist_ok=True)
    dcd_path = os.path.join(sampling_output_path, traj_dcd_filename)
    csv_path = os.path.join(sampling_output_path, csv_filename)

    if plumed_script is not None:
        # bias the dynamics with a PLUMED script (optional plugin)
        from openmmplumed import PlumedForce

        system.addForce(PlumedForce(plumed_script))
        if verbose:
            print(f"PLUMED bias enabled:\n{plumed_script}", flush=True)

    simulation = mm_app.Simulation(pdb.topology, system, integrator)
    simulation.context.setPositions(pdb.positions)
    if verbose:
        name = simulation.context.getPlatform().getName()
        print(f"OpenMM platform: {name}", flush=True)
        print("minimizing energy...", flush=True)

    simulation.minimizeEnergy()

    if pre_steps > 0:
        if verbose:
            print(f"equilibrating for {pre_steps} steps...", flush=True)
        simulation.step(pre_steps)

    # reporters attach only for the production phase, so equilibration
    # frames never reach the trajectory file
    simulation.reporters = [
        mm_app.DCDReporter(dcd_path, report_interval),
        mm_app.StateDataReporter(
            csv_path, report_interval, time=True,
            potentialEnergy=True, totalEnergy=True, temperature=True,
        ),
        mm_app.StateDataReporter(
            sys.stdout, report_interval_stdout, step=True,
            temperature=True, elapsedTime=True,
        ),
    ]

    if verbose:
        print(f"production run: {n_steps} steps...", flush=True)
    t0 = time.time()
    simulation.step(n_steps)
    elapsed = time.time() - t0
    if verbose:
        print(
            f"done in {elapsed:.1f} s; trajectory -> {dcd_path}, "
            f"statistics -> {csv_path}",
            flush=True,
        )
    return dcd_path, csv_path, elapsed
