"""Umbrella-sampling window runner (integrate_sde_umbrella): one vmapped
scan drives all windows, window CV means track the restraint centers,
MBAR recombination recovers the analytic free-energy profile, and the
pooled result is training-ready."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from colvarsfinder_tpu import analysis
from colvarsfinder_tpu.utils import integrate_sde_umbrella


class DoubleWell1D:
    """V = (x^2 - 1)^2, barrier 1 at x = 0."""

    dim = 1
    beta = 4.0

    def V(self, x):
        return (x[0] ** 2 - 1.0) ** 2


def _cv(x):
    return x[:1]  # the coordinate itself


CENTERS = np.linspace(-1.4, 1.4, 15)


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("umbrella"))
    return integrate_sde_umbrella(
        DoubleWell1D(),
        _cv,
        centers=CENTERS,
        kappa=60.0,
        n_steps=30_000,
        sampling_output_path=out,
        X0=np.array([1.0]),
        pre_steps=3_000,
        step_size=0.002,
        report_interval=20,
        seed=11,
        verbose=False,
    ), out


def test_shapes_and_windows(result):
    res, _ = result
    K, n = len(CENTERS), 30_000 // 20
    assert res.frames.shape == (K, n, 1)
    assert res.cv_values.shape == (K, n, 1)
    assert res.n_windows == K
    assert res.dt == pytest.approx(0.002 * 20)


def test_window_means_track_centers(result):
    """With kappa >> |V''|, each window's CV mean sits near its center —
    including windows past the barrier that the shared X0 never visited
    unbiased (the restraint dragged them there during burn-in)."""
    res, _ = result
    means = res.cv_values.mean(axis=1)[:, 0]
    assert np.all(np.abs(means - CENTERS) < 0.25)


def test_mbar_recovers_profile(result):
    """F(x) from the MBAR-reweighted pooled histogram matches the
    analytic V(x) (beta-scaled) inside the sampled range."""
    res, _ = result
    mb = res.mbar()
    assert mb.converged
    pooled_cv = res.cv_values.reshape(-1)
    w = np.concatenate(mb.weights)
    assert w.mean() == pytest.approx(1.0, abs=1e-8)
    centers_h, F = analysis.free_energy_profile(
        pooled_cv, weights=w, beta=res.beta, bins=36,
        value_range=(-1.4, 1.4),
    )
    # free_energy_profile returns energy units (F = -ln p / beta);
    # compare in kT against the analytic potential on the same grid
    F_ref = res.beta * (centers_h**2 - 1.0) ** 2
    ok = np.isfinite(F)
    F, F_ref = res.beta * F[ok], F_ref[ok]
    F_ref = F_ref - F_ref.min()
    # pointwise agreement in the thermally relevant band (F_ref < 6 kT)
    band = F_ref < 6.0
    assert np.abs(F[band] - F_ref[band]).max() < 1.0
    # window free energies: symmetric potential => symmetric f_k
    f = mb.free_energies
    assert np.abs(f - f[::-1]).max() < 0.8


def test_pooled_weighted_trajectory(result):
    res, _ = result
    traj = res.to_weighted_trajectory()
    K, n = res.frames.shape[:2]
    assert traj.n_frames == K * n
    np.testing.assert_array_equal(
        traj.segment_starts, np.arange(K) * n
    )
    assert traj.weights.mean() == pytest.approx(1.0, abs=1e-8)
    assert traj.dt == pytest.approx(res.dt)
    # lagged starts respect window boundaries
    starts = traj.valid_lagged_starts(5)
    assert len(starts) == K * (n - 5)


def test_output_files(result):
    res, out = result
    assert os.path.exists(os.path.join(out, "windows.csv"))
    t0 = np.loadtxt(os.path.join(out, "traj_win0.txt"))
    assert t0.shape == (res.frames.shape[1], 2)  # time + x


def test_per_window_kappa_and_2d_centers():
    class Harmonic2:
        dim = 2
        beta = 2.0

        def V(self, x):
            return 0.5 * jnp.sum(x**2)

    centers = np.array([[-0.5, 0.0], [0.5, 0.0]])
    res = integrate_sde_umbrella(
        Harmonic2(),
        lambda x: x[:2],
        centers=centers,
        kappa=[40.0, 80.0],
        n_steps=5_000,
        step_size=0.005,
        report_interval=10,
        seed=1,
        verbose=False,
    )
    assert res.cv_values.shape[-1] == 2
    means = res.cv_values.mean(axis=1)
    assert np.abs(means - centers).max() < 0.2
    # stiffer window => tighter distribution
    stds = res.cv_values[:, :, 0].std(axis=1)
    assert stds[1] < stds[0]


def test_bad_x0_shape_raises():
    with pytest.raises(ValueError, match="X0"):
        integrate_sde_umbrella(
            DoubleWell1D(), _cv, centers=[0.0, 1.0], kappa=10.0,
            n_steps=100, X0=np.zeros((3, 1)), verbose=False,
        )


def test_mesh_sharded_windows():
    """Windows shard over the (virtual 8-device) mesh with identical
    physics — same seed, same trajectories as the unsharded run."""
    import jax

    from colvarsfinder_tpu.parallel import make_data_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_data_mesh()
    kw = dict(
        centers=np.linspace(-1.2, 1.2, 16), kappa=40.0, n_steps=2_000,
        X0=np.array([1.0]), step_size=0.002, report_interval=20,
        seed=5, verbose=False,
    )
    res_plain = integrate_sde_umbrella(DoubleWell1D(), _cv, **kw)
    res_mesh = integrate_sde_umbrella(DoubleWell1D(), _cv, mesh=mesh, **kw)
    np.testing.assert_allclose(
        res_mesh.frames, res_plain.frames, rtol=0, atol=1e-5
    )
    with pytest.raises(ValueError, match="divisible"):
        integrate_sde_umbrella(
            DoubleWell1D(), _cv, mesh=mesh,
            centers=np.linspace(-1, 1, 10), kappa=40.0, n_steps=100,
            verbose=False,
        )
