"""Replica-exchange sampler (integrate_sde_remd): one vmapped scan drives
the whole temperature ladder; swaps preserve each slot's Boltzmann
distribution (detailed balance), hot replicas hand barrier crossings down
to the cold slot, and the pooled result is training-ready with swap points
as segment boundaries."""

import numpy as np
import pytest

from colvarsfinder_tpu.utils import WeightedTrajectory, integrate_sde_remd


class Harmonic1D:
    dim = 1
    beta = 1.0

    def V(self, x):
        return 0.5 * x[0] ** 2


class DoubleWell1D:
    """V = (x^2 - 1)^2: barrier 1 at x = 0 -> 8 kT at beta 8."""

    dim = 1
    beta = 8.0

    def V(self, x):
        return (x[0] ** 2 - 1.0) ** 2


def test_slot_equilibrium_preserved():
    """Exchanges satisfy detailed balance: every temperature SLOT still
    samples its own Boltzmann distribution. Harmonic oracle:
    std(x | beta_k) = 1/sqrt(beta_k)."""
    betas = np.array([1.0, 2.0, 4.0])
    res = integrate_sde_remd(
        Harmonic1D(), betas, n_steps=150_000, step_size=0.02,
        report_interval=10, exchange_interval=100, pre_steps=1_000,
        seed=5, verbose=False,
    )
    stds = res.frames[:, :, 0].std(axis=1)
    np.testing.assert_allclose(stds, 1.0 / np.sqrt(betas), rtol=0.08)
    # a sensible ladder actually exchanges
    assert (res.pair_attempts > 0).all()
    assert (res.pair_acceptance > 0.2).all()
    assert res.swap_history.any()


def test_equal_betas_always_accept():
    """Identical temperatures: the Metropolis rule accepts every swap."""
    res = integrate_sde_remd(
        Harmonic1D(), [2.0, 2.0], n_steps=20_000, step_size=0.02,
        report_interval=10, exchange_interval=50, seed=1, verbose=False,
    )
    np.testing.assert_allclose(res.pair_acceptance, 1.0)


def test_cold_slot_crosses_barrier():
    """The point of REMD: at beta 8 the double-well barrier is 8 kT —
    a single chain started in the left well stays there, while the
    replica-exchange cold slot samples both wells."""
    from colvarsfinder_tpu.utils import integrate_sde_overdamped

    kw = dict(n_steps=200_000, step_size=0.002, report_interval=50)
    single, _ = integrate_sde_overdamped(
        DoubleWell1D(), sampling_output_path="/tmp/remd_ab_single",
        X0=np.array([-1.0]), seed=3, verbose=False, **kw,
    )
    frac_single = (single[:, 0] > 0).mean()
    assert frac_single < 0.02  # trapped

    res = integrate_sde_remd(
        DoubleWell1D(), [8.0, 4.0, 2.0, 0.8], X0=np.array([-1.0]),
        exchange_interval=500, seed=3, verbose=False, **kw,
    )
    frac_cold = (res.frames[0, :, 0] > 0).mean()
    assert 0.15 < frac_cold < 0.85  # both wells visited substantially
    # symmetric potential: cold-slot well populations are ~equal in the
    # exact distribution; just require real crossings, tested above


def test_pooled_weighted_trajectory(tmp_path):
    res = integrate_sde_remd(
        Harmonic1D(), [1.0, 2.0, 4.0], n_steps=30_000, step_size=0.02,
        report_interval=10, exchange_interval=100, seed=7,
        sampling_output_path=str(tmp_path), verbose=False,
    )
    traj = res.to_weighted_trajectory(sys_beta=1.0)
    K, n = 3, 3_000
    assert traj.n_frames == K * n
    np.testing.assert_allclose(traj.weights.mean(), 1.0, rtol=1e-6)
    # slot boundaries present; accepted swaps add more
    starts = np.asarray(traj.segment_starts)
    for s in (0, n, 2 * n):
        assert s in starts
    assert len(starts) > K
    # MBAR reweighting recovers the target-beta variance from ALL slots
    x = traj.trajectory[:, 0]
    w = traj.weights
    var = np.average(x**2, weights=w) - np.average(x, weights=w) ** 2
    np.testing.assert_allclose(var, 1.0, rtol=0.1)
    # per-slot outputs
    assert (tmp_path / "traj_replica0.txt").exists()
    assert (tmp_path / "replicas.csv").exists()
    # lagged pairs never span a teleport: WeightedTrajectory consumes
    # segment_starts (same contract as multi-file Universes)
    assert isinstance(traj, WeightedTrajectory)


def test_validation_errors():
    with pytest.raises(ValueError, match="at least 2"):
        integrate_sde_remd(Harmonic1D(), [1.0], n_steps=10, verbose=False)
    with pytest.raises(ValueError, match="multiple"):
        integrate_sde_remd(
            Harmonic1D(), [1.0, 2.0], n_steps=100,
            report_interval=30, exchange_interval=100, verbose=False,
        )


def test_mesh_sharded_replicas():
    """Slots shard over the (virtual 8-device) mesh with identical
    results — the exchange gathers cross devices."""
    import jax

    from colvarsfinder_tpu.parallel import make_data_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_data_mesh()
    betas = np.geomspace(4.0, 0.5, 8)
    kw = dict(
        n_steps=5_000, step_size=0.02, report_interval=10,
        exchange_interval=100, seed=9, X0=np.array([1.0]), verbose=False,
    )
    res_plain = integrate_sde_remd(Harmonic1D(), betas, **kw)
    res_mesh = integrate_sde_remd(Harmonic1D(), betas, mesh=mesh, **kw)
    np.testing.assert_allclose(
        res_mesh.frames, res_plain.frames, rtol=0, atol=1e-5
    )
    np.testing.assert_array_equal(
        res_mesh.swap_history, res_plain.swap_history
    )
    with pytest.raises(ValueError, match="divisible"):
        integrate_sde_remd(
            Harmonic1D(), np.geomspace(4.0, 0.5, 6), mesh=mesh, **kw
        )


def test_mbar_default_targets_coldest():
    """Review fix: the default MBAR target is the COLDEST temperature
    (largest beta), matching the docstring."""
    res = integrate_sde_remd(
        Harmonic1D(), [4.0, 1.0, 0.5], n_steps=20_000, step_size=0.02,
        report_interval=10, exchange_interval=100, seed=13, verbose=False,
    )
    mb_default = res.mbar()
    mb_cold = res.mbar(sys_beta=4.0)
    for a, b in zip(mb_default.weights, mb_cold.weights):
        np.testing.assert_allclose(a, b)
    # pooled, default-target variance matches the beta=4 oracle (1/beta)
    traj = res.to_weighted_trajectory()
    x, w = traj.trajectory[:, 0], traj.weights
    var = np.average(x**2, weights=w) - np.average(x, weights=w) ** 2
    np.testing.assert_allclose(var, 0.25, rtol=0.12)


def test_segment_starts_survive_zero_weight_filter():
    """Review fix: pooled segment boundaries pass through the constructor
    so WeightedTrajectory's zero-weight frame filter remaps them."""
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((12, 1)).astype(np.float32)
    w = np.ones(12)
    w[2] = 0.0   # dropped by the (w > 0) filter
    w[7] = 0.0
    traj = WeightedTrajectory(
        trajectory=frames, weights=w, dt=0.1, verbose=False,
        segment_starts=np.array([0, 4, 8]),
    )
    assert traj.n_frames == 10
    # boundaries 4 and 8 shift left past the dropped frames 2 and 7
    np.testing.assert_array_equal(traj.segment_starts, [0, 3, 6])
