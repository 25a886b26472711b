"""Data layer tests: WeightedTrajectory, calc_weights, SDE sampler."""

import numpy as np
import pandas as pd
import pytest

from colvarsfinder_tpu.utils import (
    WeightedTrajectory,
    calc_weights,
    integrate_sde_langevin,
    integrate_sde_overdamped,
)


def _write_traj(tmp_path, n=50, d=2, dt=0.1, seed=0):
    rng = np.random.default_rng(seed)
    times = np.arange(n) * dt
    coords = rng.standard_normal((n, d))
    fname = tmp_path / "traj.txt"
    with open(fname, "w") as f:
        for t, row in zip(times, coords):
            f.write(f"{t:.3f} " + " ".join(f"{x:.6f}" for x in row) + "\n")
    return str(fname), coords, dt


def test_weighted_trajectory_text_branch(tmp_path):
    fname, coords, dt = _write_traj(tmp_path)
    traj = WeightedTrajectory(traj_filename=fname, verbose=False)
    assert traj.n_frames == 50
    assert traj.trajectory.shape == (50, 2)
    np.testing.assert_allclose(traj.dt, dt, atol=1e-9)
    np.testing.assert_allclose(traj.trajectory, coords, atol=1e-6)
    np.testing.assert_allclose(traj.weights, np.ones(50))


def test_weighted_trajectory_missing_file():
    with pytest.raises(FileNotFoundError):
        WeightedTrajectory(traj_filename="/nonexistent/file.txt",
                           verbose=False)


def test_weighted_trajectory_weight_filtering(tmp_path):
    fname, coords, _ = _write_traj(tmp_path, n=10)
    w = np.asarray([0.1, 5.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])
    wfile = tmp_path / "weights.txt"
    pd.DataFrame(w).to_csv(wfile, header=False, index=False)

    traj = WeightedTrajectory(
        traj_filename=fname, weight_filename=str(wfile),
        min_w=0.2, max_w=3.0, verbose=False,
    )
    # first normalization: mean(w)=1.31 -> w/1.31; 0.1/1.31<0.2 dropped,
    # 5/1.31>3 dropped
    assert traj.n_frames == 8
    assert traj.trajectory.shape == (8, 2)
    np.testing.assert_allclose(traj.trajectory, coords[2:], atol=1e-6)
    # renormalized to mean one
    np.testing.assert_allclose(traj.weights.mean(), 1.0, rtol=1e-12)


def test_weighted_trajectory_length_mismatch(tmp_path):
    fname, _, _ = _write_traj(tmp_path, n=10)
    wfile = tmp_path / "weights.txt"
    pd.DataFrame(np.ones(7)).to_csv(wfile, header=False, index=False)
    with pytest.raises(ValueError):
        WeightedTrajectory(traj_filename=fname, weight_filename=str(wfile),
                           verbose=False)


def test_weighted_trajectory_array_branch():
    x = np.random.default_rng(0).standard_normal((20, 3))
    traj = WeightedTrajectory(trajectory=x, dt=0.5, verbose=False)
    assert traj.n_frames == 20
    assert traj.dt == 0.5
    np.testing.assert_allclose(traj.weights, np.ones(20))


def test_calc_weights_formula(tmp_path):
    rng = np.random.default_rng(1)
    energy = rng.uniform(0, 5, 30)
    csv = tmp_path / "output.csv"
    pd.DataFrame({"Time": np.arange(30.0), "Energy": energy}).to_csv(
        csv, index=False
    )
    out = tmp_path / "weights.txt"
    w = calc_weights(str(csv), sampling_beta=2.0, sys_beta=3.0,
                     traj_weight_filename=str(out), verbose=False)
    # expected: exp(-(3-2)(V - Vbar)) normalized to mean one
    expect = np.exp(-(3.0 - 2.0) * (energy - energy.mean()))
    expect /= expect.mean()
    np.testing.assert_allclose(w, expect, rtol=1e-12)
    np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-12)
    # file round trip
    back = pd.read_csv(out, header=None)[0].to_numpy()
    np.testing.assert_allclose(back, expect, rtol=1e-6)


def test_calc_weights_equal_betas(tmp_path):
    csv = tmp_path / "output.csv"
    pd.DataFrame({"Time": [0.0, 1.0], "Energy": [1.0, 4.0]}).to_csv(
        csv, index=False
    )
    out = tmp_path / "w.txt"
    w = calc_weights(str(csv), 1.0, 1.0, str(out), verbose=False)
    np.testing.assert_allclose(w, np.ones(2))


class QuadPot:
    """Simple jax-traceable quadratic potential."""

    def __init__(self):
        self.dim = 2
        self.beta = 1.0

    def V(self, x):
        return 0.5 * x[0] ** 2 + 2.0 * x[1] ** 2

    def gradV(self, x):
        import jax.numpy as jnp

        return jnp.asarray([x[0], 4.0 * x[1]])


def test_integrate_sde_overdamped_jax(tmp_path):
    pot = QuadPot()
    frames, energies = integrate_sde_overdamped(
        pot, n_steps=2000, sampling_output_path=str(tmp_path),
        X0=np.asarray([1.0, 1.0]), step_size=0.01, report_interval=20,
        seed=42, verbose=False,
    )
    n_reports = (2000 - 1) // 20 + 1
    assert frames.shape == (n_reports, 2)
    assert energies.shape == (n_reports,)
    # stationary variance of OU: x1 ~ N(0,1), x2 ~ N(0,1/4)
    tail = frames[n_reports // 2:]
    assert abs(tail[:, 0].std() - 1.0) < 0.5
    assert tail[:, 1].std() < 0.8
    # output files exist and round-trip through WeightedTrajectory
    traj = WeightedTrajectory(
        traj_filename=str(tmp_path / "traj.txt"), verbose=False
    )
    assert traj.n_frames == n_reports
    np.testing.assert_allclose(traj.dt, 0.2, atol=1e-9)
    np.testing.assert_allclose(traj.trajectory, frames, atol=1e-5)
    # CSV energies
    csv = pd.read_csv(tmp_path / "output.csv")
    assert list(csv.columns) == ["Time", "Energy"]
    np.testing.assert_allclose(csv["Energy"].to_numpy(), energies, rtol=1e-4,
                               atol=1e-5)


def test_integrate_sde_multichain(tmp_path):
    pot = QuadPot()
    frames, energies = integrate_sde_overdamped(
        pot, n_steps=100, sampling_output_path=str(tmp_path),
        step_size=0.01, report_interval=10, seed=0, n_chains=3,
        verbose=False,
    )
    assert frames.shape == (3, 10, 2)
    assert (tmp_path / "traj.txt").exists()
    assert (tmp_path / "traj_chain1.txt").exists()
    assert (tmp_path / "traj_chain2.txt").exists()


class NumpyOnlyPot:
    """Potential with data-dependent python control flow — not traceable."""

    def __init__(self):
        self.dim = 1
        self.beta = 1.0

    def V(self, x):
        return float(x[0] ** 2) if x[0] > 0 else float(2 * x[0] ** 2)

    def gradV(self, x):
        return np.asarray([2 * x[0]]) if x[0] > 0 else np.asarray([4 * x[0]])


def test_integrate_sde_numpy_fallback(tmp_path):
    pot = NumpyOnlyPot()
    with pytest.warns(UserWarning, match="not jax-traceable"):
        frames, _ = integrate_sde_overdamped(
            pot, n_steps=50, sampling_output_path=str(tmp_path),
            X0=np.asarray([0.5]), step_size=0.01, report_interval=10,
            seed=1, verbose=False,
        )
    assert frames.shape == (5, 1)


# ------------------------------------------------- underdamped (BAOAB)
def test_integrate_sde_langevin_equilibrium(tmp_path):
    """BAOAB samples the full phase-space Gibbs measure of a quadratic
    potential: Var(x_i) = 1/(beta k_i) and equipartition
    Var(v_i) = 1/(beta m_i), per-dimension masses included."""
    pot = QuadPot()  # k = (1, 4), beta = 1
    frames, energies, vels = integrate_sde_langevin(
        pot, n_steps=200_000, sampling_output_path=str(tmp_path),
        X0=np.zeros(2), step_size=0.05, friction=2.0, masses=[1.0, 2.0],
        report_interval=10, pre_steps=2_000, seed=3,
        return_velocities=True, verbose=False,
    )
    assert frames.shape == vels.shape == (20_000, 2)
    np.testing.assert_allclose(frames.mean(axis=0), [0, 0], atol=0.08)
    np.testing.assert_allclose(frames.std(axis=0), [1.0, 0.5], rtol=0.08)
    np.testing.assert_allclose(
        vels.std(axis=0), [1.0, 1.0 / np.sqrt(2.0)], rtol=0.08
    )
    # file outputs round-trip like the overdamped sampler's
    traj = WeightedTrajectory(
        traj_filename=str(tmp_path / "traj.txt"), verbose=False
    )
    assert traj.n_frames == 20_000
    np.testing.assert_allclose(traj.dt, 0.5, atol=1e-9)
    csv = pd.read_csv(tmp_path / "output.csv")
    assert list(csv.columns) == ["Time", "Energy"]
    np.testing.assert_allclose(
        csv["Energy"].to_numpy(), energies, rtol=1e-4, atol=1e-5
    )


def test_integrate_sde_langevin_multichain(tmp_path):
    pot = QuadPot()
    frames, energies = integrate_sde_langevin(
        pot, n_steps=100, sampling_output_path=str(tmp_path),
        step_size=0.01, report_interval=10, seed=0, n_chains=3,
        verbose=False,
    )
    assert frames.shape == (3, 10, 2)
    assert energies.shape == (3, 10)
    assert (tmp_path / "traj_chain2.txt").exists()


def test_integrate_sde_langevin_numpy_fallback(tmp_path):
    pot = NumpyOnlyPot()
    with pytest.warns(UserWarning, match="not jax-traceable"):
        frames, _, vels = integrate_sde_langevin(
            pot, n_steps=50, sampling_output_path=str(tmp_path),
            X0=np.asarray([0.5]), step_size=0.01, report_interval=10,
            seed=1, return_velocities=True, verbose=False,
        )
    assert frames.shape == vels.shape == (5, 1)
    assert np.isfinite(frames).all()


# ------------------------------------------------- multi-trajectory datasets
def test_concatenate_trajectories_segments_and_weights():
    from colvarsfinder_tpu.utils import WeightedTrajectory, concatenate_trajectories

    rng = np.random.default_rng(0)
    t1 = WeightedTrajectory(
        trajectory=rng.standard_normal((10, 2)),
        weights=rng.uniform(0.5, 2.0, 10), dt=0.1, verbose=False,
    )
    t2 = WeightedTrajectory(
        trajectory=rng.standard_normal((4, 2)),
        weights=rng.uniform(0.5, 2.0, 4), dt=0.1, verbose=False,
    )
    t3 = WeightedTrajectory(
        trajectory=rng.standard_normal((7, 2)), dt=0.1, verbose=False,
    )
    cat = concatenate_trajectories([t1, t2, t3])
    assert cat.n_frames == 21
    np.testing.assert_array_equal(cat.segment_starts, [0, 10, 14])
    np.testing.assert_allclose(cat.weights.mean(), 1.0, rtol=1e-12)
    np.testing.assert_array_equal(cat.trajectory[10:14], t2.trajectory)
    assert cat.dt == 0.1

    # nested concatenation keeps inner boundaries
    t4 = WeightedTrajectory(
        trajectory=rng.standard_normal((3, 2)), dt=0.1, verbose=False,
    )
    nested = concatenate_trajectories([cat, t4])
    np.testing.assert_array_equal(nested.segment_starts, [0, 10, 14, 21])

    # renormalize=False keeps weights untouched (e.g. MBAR output)
    raw = concatenate_trajectories([t1, t2], renormalize=False)
    np.testing.assert_array_equal(
        raw.weights, np.concatenate([t1.weights, t2.weights])
    )

    # validation
    import pytest as _pytest
    with _pytest.raises(ValueError):
        concatenate_trajectories([])
    bad_dt = WeightedTrajectory(
        trajectory=rng.standard_normal((5, 2)), dt=0.2, verbose=False,
    )
    with _pytest.raises(ValueError):
        concatenate_trajectories([t1, bad_dt])
    bad_shape = WeightedTrajectory(
        trajectory=rng.standard_normal((5, 3)), dt=0.1, verbose=False,
    )
    with _pytest.raises(ValueError):
        concatenate_trajectories([t1, bad_shape])


def test_valid_lagged_starts():
    from colvarsfinder_tpu.utils import WeightedTrajectory, concatenate_trajectories

    rng = np.random.default_rng(1)
    single = WeightedTrajectory(
        trajectory=rng.standard_normal((8, 1)), dt=0.1, verbose=False,
    )
    np.testing.assert_array_equal(single.valid_lagged_starts(3), np.arange(5))
    np.testing.assert_array_equal(single.valid_lagged_starts(0), np.arange(8))

    parts = [
        WeightedTrajectory(
            trajectory=rng.standard_normal((m, 1)), dt=0.1, verbose=False
        )
        for m in (6, 2, 5)
    ]
    cat = concatenate_trajectories(parts)
    # lag 3: starts 0..2 (segment 0), none (segment 1, too short), 8..9
    np.testing.assert_array_equal(
        cat.valid_lagged_starts(3), [0, 1, 2, 8, 9]
    )
    # lag 0: every frame
    np.testing.assert_array_equal(cat.valid_lagged_starts(0), np.arange(13))
    # lag longer than every segment: empty
    assert cat.valid_lagged_starts(6).size == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cat.valid_lagged_starts(-1)


def test_wrap_unwrap_trajectory():
    """unwrap_trajectory removes box jumps from a wrapped random walk:
    wrap -> unwrap recovers the original up to the first frame's image,
    making wrapped MD output usable for alignment/position features."""
    from colvarsfinder_tpu.utils import unwrap_trajectory, wrap_trajectory

    rng = np.random.default_rng(0)
    box = np.array([1.0, 1.5, 2.0])
    # diffusing cluster: per-frame displacements well under L/2
    steps = rng.normal(0, 0.05, size=(200, 4, 3))
    x = np.cumsum(steps, axis=0) + np.array([0.2, 0.3, 0.4])
    xw = wrap_trajectory(x, box)
    assert (xw >= 0).all() and (xw < box).all()
    assert not np.allclose(xw, x)  # the walk left the primary cell

    xu = unwrap_trajectory(xw, box)
    # frame 0 is kept as stored -> constant integer-image offset per atom
    off = xu[0] - x[0]
    np.testing.assert_allclose(
        np.round(off / box), off / box, atol=1e-9
    )
    np.testing.assert_allclose(xu - off[None], x, atol=1e-9)

    # idempotent on already-continuous data
    np.testing.assert_allclose(unwrap_trajectory(x, box), x, atol=1e-12)

    with pytest.raises(ValueError):
        unwrap_trajectory(x[0], box)
    with pytest.raises(ValueError):
        unwrap_trajectory(x, (1.0, -1.0, 1.0))
