"""Steered pulling with Jarzynski work accounting
(integrate_sde_steered): the work-based free-energy estimates recover
the ANALYTIC restrained free energy of a harmonic system, dissipation
obeys the second law, and the steered chain seeds umbrella windows.

Analytic oracle: for V = 0.5*k0*x^2 under the restraint
0.5*kappa*(x - c)^2, completing the square gives the restrained free
energy F(c) = 0.5 * (k0*kappa/(k0+kappa)) * c^2 + const — so the
Jarzynski estimate of F(c_end) - F(c_start) has a closed form.
"""

import numpy as np
import pytest

from colvarsfinder_tpu.utils import integrate_sde_steered, integrate_sde_umbrella


class Harmonic2D:
    """V = 0.5*k0*x^2 + 0.5*y^2; the CV is x."""

    dim = 2
    beta = 1.0
    k0 = 1.0

    def V(self, x):
        return 0.5 * self.k0 * x[0] ** 2 + 0.5 * x[1] ** 2


class DoubleWell1D:
    dim = 1
    beta = 4.0

    def V(self, x):
        return (x[0] ** 2 - 1.0) ** 2


def _cv(x):
    return x[:1]


@pytest.fixture(scope="module")
def pulled():
    return integrate_sde_steered(
        Harmonic2D(), _cv, cv_start=0.0, cv_end=1.5, kappa=50.0,
        n_steps=20_000, n_realizations=64, pre_steps=2_000,
        step_size=1e-3, report_interval=200, seed=11, verbose=False,
    )


def test_shapes_and_schedule(pulled):
    assert pulled.frames.shape == (64, 100, 2)
    assert pulled.cv_values.shape == (64, 100, 1)
    assert pulled.works.shape == (64, 100)
    # linear schedule ends at cv_end; reports are evenly spaced
    np.testing.assert_allclose(pulled.schedule[-1], [1.5], atol=1e-6)
    np.testing.assert_allclose(
        np.diff(pulled.schedule[:, 0]), 1.5 / 100, atol=1e-6
    )
    assert pulled.dt == pytest.approx(0.2)


def test_jarzynski_matches_analytic(pulled):
    # F(c) = 0.5 * k_eff * c^2 with k_eff = k0*kappa/(k0+kappa)
    k_eff = 1.0 * 50.0 / 51.0
    c = pulled.schedule[:, 0]
    analytic = 0.5 * k_eff * c**2
    dF = pulled.jarzynski()
    # slow pull: both estimators track the analytic profile
    np.testing.assert_allclose(dF[-1], analytic[-1], rtol=0.1)
    np.testing.assert_allclose(dF, analytic, atol=0.12)
    np.testing.assert_allclose(pulled.cumulant(), analytic, atol=0.15)


def test_second_law_and_monotone_work(pulled):
    # mean work exceeds the free-energy change (dissipation >= 0 up to
    # estimator noise) and grows along this uphill protocol
    diss = pulled.dissipated_work
    assert diss[-1] > -0.05
    w = pulled.works.mean(axis=0)
    assert w[-1] > w[0]
    # the restrained CV tracks the moving center
    gap = np.abs(pulled.cv_values[:, :, 0].mean(axis=0) - pulled.schedule[:, 0])
    assert gap.max() < 0.1, gap.max()


def test_window_starts_seed_umbrella():
    # pull a double-well chain over the barrier, then seed umbrella
    # windows from the steered path: every window starts inside its own
    # basin (no per-window relaxation needed)
    pot = DoubleWell1D()
    res = integrate_sde_steered(
        pot, _cv, cv_start=-1.0, cv_end=1.0, kappa=60.0,
        n_steps=10_000, n_realizations=8, pre_steps=1_000,
        step_size=2e-4, report_interval=100, seed=3, verbose=False,
    )
    centers = np.linspace(-1.0, 1.0, 5)
    x0 = res.window_starts(centers)
    assert x0.shape == (5, 1)
    np.testing.assert_allclose(x0[:, 0], centers, atol=0.25)
    # feed straight into the umbrella runner's per-window X0
    umb = integrate_sde_umbrella(
        pot, _cv, centers[:, None], kappa=40.0, X0=x0,
        n_steps=2_000, pre_steps=200, step_size=2e-4,
        report_interval=20, seed=4, verbose=False,
    )
    means = umb.cv_values.mean(axis=1)[:, 0]
    np.testing.assert_allclose(means, centers, atol=0.3)


def test_validation_errors():
    with pytest.raises(ValueError, match="multiple"):
        integrate_sde_steered(
            Harmonic2D(), _cv, 0.0, 1.0, kappa=10.0,
            n_steps=150, report_interval=100, verbose=False,
        )
    with pytest.raises(ValueError, match="components"):
        integrate_sde_steered(
            Harmonic2D(), _cv, [0.0, 0.0], [1.0, 1.0], kappa=10.0,
            n_steps=200, report_interval=100, verbose=False,
        )
    with pytest.raises(ValueError, match="X0"):
        integrate_sde_steered(
            Harmonic2D(), _cv, 0.0, 1.0, kappa=10.0, n_steps=200,
            report_interval=100, X0=np.zeros((3, 2)), verbose=False,
        )


def test_mesh_sharded_realizations():
    """Realizations shard over the (virtual 8-device) mesh with
    identical physics — same seed, same works as the unsharded run."""
    import jax

    from colvarsfinder_tpu.parallel import make_data_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_data_mesh()
    kw = dict(
        cv_start=0.0, cv_end=1.0, kappa=30.0, n_steps=1_000,
        n_realizations=16, X0=np.zeros(2), step_size=1e-3,
        report_interval=100, seed=7, verbose=False,
    )
    res_plain = integrate_sde_steered(Harmonic2D(), _cv, **kw)
    res_mesh = integrate_sde_steered(Harmonic2D(), _cv, mesh=mesh, **kw)
    np.testing.assert_allclose(
        res_mesh.works, res_plain.works, rtol=0, atol=1e-5
    )
    with pytest.raises(ValueError, match="divisible"):
        integrate_sde_steered(
            Harmonic2D(), _cv, mesh=mesh, n_realizations=6,
            cv_start=0.0, cv_end=1.0, kappa=30.0, n_steps=200,
            report_interval=100, verbose=False,
        )


def test_pre_steps_zero_warns_and_ddof():
    # advisor round-3: pre_steps=0 with a shared start biases Jarzynski
    with pytest.warns(UserWarning, match="pre_steps=0"):
        res = integrate_sde_steered(
            Harmonic2D(), _cv, cv_start=0.0, cv_end=0.5, kappa=20.0,
            n_steps=400, n_realizations=4, pre_steps=0,
            step_size=1e-3, report_interval=100, seed=0, verbose=False,
        )
    # cumulant uses the unbiased (ddof=1) work variance
    expect = res.works.mean(axis=0) - (
        res.beta * res.works.var(axis=0, ddof=1) / 2.0
    )
    np.testing.assert_allclose(res.cumulant(), expect, rtol=1e-12)
    # per-realization X0 suppresses the warning (caller asserts equilibrium)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        integrate_sde_steered(
            Harmonic2D(), _cv, cv_start=0.0, cv_end=0.5, kappa=20.0,
            n_steps=200, n_realizations=4, pre_steps=0,
            X0=np.zeros((4, 2)), step_size=1e-3, report_interval=100,
            seed=0, verbose=False,
        )
