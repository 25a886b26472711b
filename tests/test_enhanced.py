"""Enhanced sampling along learned CVs (utils.enhanced).

The reference's biased-sampling path hands an exported CV to an external
engine (TorchScript + PLUMED, reference core.py:212-227 / utils.py:220-223);
here umbrella sampling and metadynamics run natively through the SDE
sampler, so these tests check the physics: a restraint shifts the sampled
CV mean, metadynamics drives barrier crossings an unbiased run cannot make,
and the accumulated bias recovers the free-energy profile.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from colvarsfinder_tpu.utils import (
    BiasedPotential,
    harmonic_restraint,
    integrate_sde_metadynamics,
    integrate_sde_overdamped,
)


class DoubleWell1D:
    """V(x) = (x^2 - 1)^2: wells at +-1, barrier height 1 at x = 0."""

    dim = 1

    def __init__(self, beta=8.0):
        self.beta = beta

    def V(self, x):
        return (x[0] ** 2 - 1.0) ** 2


def test_umbrella_restraint_shifts_sampled_mean(tmp_path):
    pot = DoubleWell1D(beta=8.0)
    center = 0.6
    biased = BiasedPotential(
        pot, lambda x: x, harmonic_restraint([center], kappa=60.0)
    )
    assert biased.dim == 1 and biased.beta == 8.0
    frames, _ = integrate_sde_overdamped(
        biased, n_steps=20_000, sampling_output_path=str(tmp_path),
        X0=np.asarray([-1.0]), step_size=0.002, report_interval=10,
        seed=3, verbose=False,
    )
    mean_x = frames[len(frames) // 2 :, 0].mean()
    # unrestrained dynamics at beta=8 stays in the x=-1 well (see the
    # metadynamics test); the umbrella must pull the mean near its center
    assert abs(mean_x - center) < 0.25, mean_x


def test_metadynamics_crosses_barrier_unbiased_does_not(tmp_path):
    pot = DoubleWell1D(beta=8.0)
    frames, _ = integrate_sde_overdamped(
        pot, n_steps=30_000, sampling_output_path=str(tmp_path / "ub"),
        X0=np.asarray([-1.0]), step_size=0.002, report_interval=10,
        seed=5, verbose=False,
    )
    assert frames[:, 0].max() < 0.5  # stuck in the starting well

    res = integrate_sde_metadynamics(
        pot, lambda x: x, n_steps=30_000,
        sampling_output_path=str(tmp_path / "mtd"),
        X0=np.asarray([-1.0]), step_size=0.002, deposit_interval=100,
        hill_height=0.15, hill_width=0.15, seed=5, verbose=False,
    )
    assert res.cv_values[:, 0].max() > 0.5  # escaped to the other well
    assert res.cv_values[:, 0].min() < -0.5
    assert (res.hill_heights > 0).all()
    # outputs written
    assert (tmp_path / "mtd" / "HILLS").exists()
    assert (tmp_path / "mtd" / "traj.txt").exists()


def test_metadynamics_free_energy_recovers_profile():
    pot = DoubleWell1D(beta=8.0)
    res = integrate_sde_metadynamics(
        pot, lambda x: x, n_steps=120_000, X0=np.asarray([-1.0]),
        step_size=0.002, deposit_interval=100, hill_height=0.08,
        hill_width=0.15, bias_factor=8.0, seed=11, verbose=False,
    )
    # well-tempered heights decay as the bias fills in
    first, last = res.hill_heights[:50].mean(), res.hill_heights[-200:].mean()
    assert last < 0.6 * first
    f = res.free_energy(np.asarray([[-1.0], [0.0], [1.0]]))
    barrier_l = f[1] - f[0]
    barrier_r = f[1] - f[2]
    # true barrier is 1.0 from either well; wells are symmetric
    assert 0.4 < barrier_l < 1.8, barrier_l
    assert 0.4 < barrier_r < 1.8, barrier_r
    assert abs(f[0] - f[2]) < 0.5  # equal-depth wells


def test_metadynamics_multi_walker_shapes():
    pot = DoubleWell1D(beta=8.0)
    res = integrate_sde_metadynamics(
        pot, lambda x: x, n_steps=2_000, X0=np.asarray([-1.0]),
        step_size=0.002, deposit_interval=100, hill_height=0.1,
        hill_width=0.15, n_chains=3, seed=0, verbose=False,
    )
    assert res.frames.shape == (3, 20, 1)
    assert res.hill_heights.shape == (3, 20)
    with pytest.raises(ValueError, match="select_walker"):
        res.bias([0.0])
    w0 = res.select_walker(0)
    assert np.isfinite(w0.bias(np.asarray([[0.0]]))).all()


@pytest.mark.slow
def test_metadynamics_with_learned_cv_on_triple_well(tmp_path):
    """End-to-end deployment loop: train an eigenfunction CV on triple-well
    data, then drive metadynamics along the learned CV and check it
    induces transitions between metastable states."""
    import math

    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.utils import WeightedTrajectory

    class TripleWell:
        dim = 2
        beta = 4.0

        def V(self, x):
            theta = jnp.arctan2(x[1], x[0])
            r = jnp.sqrt(x[0] ** 2 + x[1] ** 2)
            # minima of 1 + cos(3θ) at θ = ±π/3 and π, matching the
            # well labels below and the training clusters
            return 1.0 + jnp.cos(3.0 * theta) + 8.0 * (r - 1.0) ** 2

    pot = TripleWell()
    # training data: frames around the three wells
    rng = np.random.default_rng(0)
    theta = rng.choice(
        [math.pi / 3, math.pi, -math.pi / 3], size=4000
    ) + 0.25 * rng.standard_normal(4000)
    r = 1.0 + 0.08 * rng.standard_normal(4000)
    data = np.stack([r * np.cos(theta), r * np.sin(theta)], 1).astype(
        np.float32
    )
    traj = WeightedTrajectory(trajectory=data, dt=0.01, verbose=False)
    task = EigenFunctionTask(
        traj, None, EigenFunctions([2, 16, 16, 1], 1, seed=0),
        str(tmp_path), alpha=10.0, eig_weights=[1.0], lag_tau=0.01, k=1,
        learning_rate=0.01, batch_size=1000, num_epochs=40, test_ratio=0.2,
        save_model_every_step=0, verbose=False, tensorboard=False, seed=0,
    )
    task.train()
    cv = task.colvar_model()

    res = integrate_sde_metadynamics(
        pot, cv, n_steps=40_000, X0=np.asarray([0.5, -0.866]),
        step_size=0.001, deposit_interval=200, hill_height=0.25,
        hill_width=0.35 * float(np.std(np.asarray(cv(data)))),
        seed=2, verbose=False,
    )
    angles = np.arctan2(res.frames[:, 1], res.frames[:, 0])
    wells = set()
    for th in angles:
        if abs(th - math.pi / 3) < 0.6:
            wells.add("A")
        elif abs(th + math.pi / 3) < 0.6:
            wells.add("B")
        elif abs(abs(th) - math.pi) < 0.6:
            wells.add("C")
    assert len(wells) >= 2, (
        f"metadynamics along the learned CV visited only {wells}"
    )
