"""Umbrella-window recombination via MBAR (utils.enhanced.mbar_weights).

The umbrella counterpart of the metadynamics reweighting tests: K biased
windows pooled into one set of unbiased-ensemble frame weights for
retraining (reference-ecosystem equivalent: PLUMED windows + WHAM/MBAR +
calc_weights). Oracles: a discrete-state synthetic sampler where the exact
window free energies are computable in closed form, and the double-well SDE
workflow against Boltzmann statistics.
"""

import numpy as np
import pytest

from colvarsfinder_tpu.utils import (
    BiasedPotential,
    WeightedTrajectory,
    harmonic_restraint,
    integrate_sde_overdamped,
    mbar_weights,
)


def test_single_unbiased_window_gives_uniform_weights():
    rng = np.random.default_rng(0)
    cvs = [rng.standard_normal(200)]
    res = mbar_weights(cvs, u_kn=np.zeros((1, 200)))
    assert res.converged and res.n_iter <= 2
    np.testing.assert_allclose(res.weights[0], np.ones(200), atol=1e-12)
    np.testing.assert_allclose(res.free_energies, [0.0], atol=1e-12)


def test_identical_windows_get_equal_free_energies():
    rng = np.random.default_rng(1)
    cvs = [rng.standard_normal(150) for _ in range(3)]
    bias = harmonic_restraint([0.0], kappa=4.0)
    res = mbar_weights(cvs, [bias, bias, bias], beta=2.0)
    assert res.converged
    np.testing.assert_allclose(
        res.free_energies, res.free_energies[0], atol=1e-8
    )


def test_recovers_exact_free_energies_on_discrete_states():
    """Draw samples EXACTLY from the biased distributions of a discrete
    system; MBAR must recover the analytic window free energies to
    stochastic error."""
    rng = np.random.default_rng(42)
    s = np.linspace(-2.0, 2.0, 81)  # discrete CV states
    beta = 2.0
    F = (s**2 - 1.0) ** 2  # double-well free-energy surface
    centers = [-1.0, -0.3, 0.3, 1.0]
    kappa = 8.0
    n_per = 4000

    cvs, u_rows, f_true = [], [], []
    p0 = np.exp(-beta * F)
    for c in centers:
        b = 0.5 * kappa * (s - c) ** 2
        pk = p0 * np.exp(-beta * b)
        zk = pk.sum()
        f_true.append(-np.log(zk / p0.sum()))
        draws = rng.choice(s, size=n_per, p=pk / zk)
        cvs.append(draws)
    pooled = np.concatenate(cvs)
    for c in centers:
        u_rows.append(beta * 0.5 * kappa * (pooled - c) ** 2)
    res = mbar_weights(cvs, u_kn=np.stack(u_rows))
    assert res.converged
    f_true = np.asarray(f_true) - f_true[0]
    np.testing.assert_allclose(res.free_energies, f_true, atol=0.08)

    # the reweighted pooled samples must reproduce the UNBIASED state
    # distribution p0 (here: mean of the CV under exp(-beta F), which is 0
    # by symmetry, and the barrier population)
    w = np.concatenate(res.weights)
    mean_cv = (w * pooled).sum() / w.sum()
    assert abs(mean_cv) < 0.1, mean_cv
    p_barrier_true = p0[np.abs(s) < 0.4].sum() / p0.sum()
    p_barrier_rw = w[np.abs(pooled) < 0.4].sum() / w.sum()
    assert abs(p_barrier_rw - p_barrier_true) < 0.5 * p_barrier_true + 0.01


def test_bias_fns_path_matches_u_kn_path():
    rng = np.random.default_rng(3)
    cvs = [rng.standard_normal(60) - 1.0, rng.standard_normal(60) + 1.0]
    centers = [-1.0, 1.0]
    kappa = 10.0
    beta = 4.0
    fns = [harmonic_restraint([c], kappa=kappa) for c in centers]
    res_fn = mbar_weights(cvs, fns, beta=beta)
    pooled = np.concatenate(cvs)
    u = np.stack(
        [beta * 0.5 * kappa * (pooled - c) ** 2 for c in centers]
    )
    res_u = mbar_weights(cvs, u_kn=u)
    # bias fns evaluate in f32 on the jax side; allow that rounding
    np.testing.assert_allclose(
        res_fn.free_energies, res_u.free_energies, atol=1e-4
    )
    np.testing.assert_allclose(
        np.concatenate(res_fn.weights),
        np.concatenate(res_u.weights),
        rtol=1e-3,
    )


def test_max_iter_zero_returns_unconverged():
    rng = np.random.default_rng(0)
    cvs = [rng.standard_normal(20), rng.standard_normal(20)]
    u = np.abs(rng.standard_normal((2, 40)))
    with pytest.warns(UserWarning, match="did not converge"):
        res = mbar_weights(cvs, u_kn=u, max_iter=0)
    assert not res.converged and res.n_iter == 0
    assert np.isfinite(np.concatenate(res.weights)).all()


def test_input_validation():
    rng = np.random.default_rng(0)
    cvs = [rng.standard_normal(10)]
    with pytest.raises(ValueError, match="bias_fns or u_kn"):
        mbar_weights(cvs)
    with pytest.raises(ValueError, match="windows"):
        mbar_weights(cvs, [lambda s: 0.0, lambda s: 0.0])
    with pytest.raises(ValueError, match="shape"):
        mbar_weights(cvs, u_kn=np.zeros((1, 5)))


def test_umbrella_workflow_recovers_boltzmann():
    """End-to-end: umbrella windows over the double well, MBAR weights,
    Boltzmann check — the umbrella twin of the metadynamics reweighting
    integration test."""

    class DoubleWell1D:
        dim = 1

        def __init__(self, beta=8.0):
            self.beta = beta

        def V(self, x):
            return (x[0] ** 2 - 1.0) ** 2

    pot = DoubleWell1D(beta=8.0)
    centers = np.linspace(-1.3, 1.3, 9)
    kappa = 30.0
    windows_cv, fns = [], []
    import tempfile

    for i, c in enumerate(centers):
        bias = harmonic_restraint([c], kappa=kappa)
        biased = BiasedPotential(pot, lambda x: x, bias)
        with tempfile.TemporaryDirectory() as td:
            frames, _ = integrate_sde_overdamped(
                biased, n_steps=20_000, sampling_output_path=td,
                X0=np.asarray([float(c)]), step_size=0.002,
                report_interval=10, seed=100 + i, verbose=False,
            )
        windows_cv.append(frames[200:, 0])  # drop equilibration
        fns.append(bias)
    res = mbar_weights(windows_cv, fns, beta=pot.beta)
    assert res.converged

    pooled = np.concatenate(windows_cv)
    w = np.concatenate(res.weights)
    np.testing.assert_allclose(w.mean(), 1.0, atol=1e-10)

    xs = np.linspace(-2.0, 2.0, 4001)
    boltz = np.exp(-pot.beta * (xs**2 - 1.0) ** 2)
    p_barrier_true = boltz[np.abs(xs) < 0.4].sum() / boltz.sum()
    barrier = np.abs(pooled) < 0.4
    p_biased = barrier.mean()
    p_rw = w[barrier].sum() / w.sum()
    # umbrella windows heavily oversample the barrier; MBAR must restore
    # the Boltzmann population
    assert p_rw < 0.2 * p_biased, (p_rw, p_biased)
    assert p_rw < 5 * p_barrier_true + 0.01, (p_rw, p_barrier_true)
    # symmetric wells
    ratio = w[pooled < -0.4].sum() / w[pooled > 0.4].sum()
    assert 1 / 3 < ratio < 3, ratio
    # and the weights feed WeightedTrajectory
    traj = WeightedTrajectory(
        trajectory=pooled[:, None].astype(np.float32), weights=w,
        dt=0.002 * 10, verbose=False,
    )
    assert traj.n_frames == pooled.shape[0]
