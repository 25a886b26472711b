"""Metadynamics frame reweighting (MetadynamicsResult.frame_weights).

The reference ecosystem's iterate-the-CV workflow is: bias an MD run along
the current CV (PLUMED, reference utils.py:220-223), reweight the biased
frames back to the unbiased ensemble, and retrain (calc_weights,
utils.py:354-417). These tests check the native equivalents: the
quasi-static final-bias estimator and the Tiwary–Parrinello time-dependent
estimator, on potentials with known Boltzmann statistics.
"""

import numpy as np
import pytest

from colvarsfinder_tpu.utils import (
    WeightedTrajectory,
    integrate_sde_metadynamics,
)
from colvarsfinder_tpu.utils.enhanced import MetadynamicsResult


class DoubleWell1D:
    """V(x) = (x^2 - 1)^2: wells at +-1, barrier height 1 at x = 0."""

    dim = 1

    def __init__(self, beta=8.0):
        self.beta = beta

    def V(self, x):
        return (x[0] ** 2 - 1.0) ** 2


def _run(n_steps=40_000, bias_factor=8.0, seed=7, **kw):
    return integrate_sde_metadynamics(
        DoubleWell1D(beta=8.0), lambda x: x, n_steps=n_steps,
        X0=np.asarray([-1.0]), step_size=0.002, deposit_interval=100,
        hill_height=0.12, hill_width=0.15, bias_factor=bias_factor,
        seed=seed, verbose=False, **kw,
    )


@pytest.mark.parametrize("method", ["final-bias", "tiwary"])
def test_frame_weights_basic_properties(method):
    res = _run(n_steps=8_000)
    w = res.frame_weights(method=method)
    assert w.shape == (res.frames.shape[0],)
    assert np.isfinite(w).all() and (w >= 0).all()
    np.testing.assert_allclose(w.mean(), 1.0, atol=1e-12)


def test_final_bias_formula():
    res = _run(n_steps=6_000)
    w = res.frame_weights(method="final-bias")
    expo = res.beta * res.bias(res.cv_values).astype(np.float64)
    expected = np.exp(expo - expo.max())
    expected /= expected.mean()
    # frame_weights delegates to the float64 metad_frame_weights path;
    # res.bias evaluates with float32 inputs, hence the loose rtol
    np.testing.assert_allclose(w, expected, rtol=1e-5)


@pytest.mark.parametrize("method", ["final-bias", "tiwary"])
@pytest.mark.parametrize("bias_factor", [None, 6.0])
def test_zero_bias_gives_uniform_weights(method, bias_factor):
    """With no deposited bias both estimators reduce to the unbiased
    ensemble: uniform weights."""
    rng = np.random.default_rng(0)
    n = 50
    res = MetadynamicsResult(
        frames=rng.standard_normal((n, 1)),
        cv_values=rng.standard_normal((n, 1)).astype(np.float32),
        hill_centers=rng.standard_normal((n, 1)).astype(np.float32),
        hill_heights=np.zeros(n, dtype=np.float32),
        hill_width=0.2,
        bias_factor=bias_factor,
        beta=4.0,
    )
    w = res.frame_weights(method=method)
    np.testing.assert_allclose(w, np.ones(n), atol=1e-10)


def test_multi_walker_requires_selection():
    res = _run(n_steps=2_000, n_chains=2)
    with pytest.raises(ValueError, match="select_walker"):
        res.frame_weights()
    w = res.select_walker(1).frame_weights()
    assert w.shape == (20,)


def test_reweighted_ensemble_recovers_boltzmann():
    """A converged well-tempered run overpopulates the barrier region; the
    reweighted frames must restore the Boltzmann barrier population and the
    symmetric well balance."""
    res = _run(n_steps=160_000, seed=13)
    x = res.cv_values[:, 0]
    assert x.max() > 0.5 and x.min() < -0.5  # both wells visited

    beta = res.beta
    xs = np.linspace(-2.0, 2.0, 4001)
    boltz = np.exp(-beta * (xs**2 - 1.0) ** 2)
    p_barrier_true = boltz[np.abs(xs) < 0.4].sum() / boltz.sum()

    barrier = np.abs(x) < 0.4
    p_biased = barrier.mean()
    for method in ("final-bias", "tiwary"):
        w = res.frame_weights(method=method)
        p_rw = w[barrier].sum() / w.sum()
        # reweighting must pull the barrier population from the biased
        # level (~flat sampling) back toward the Boltzmann value
        assert p_rw < 0.1 * p_biased, (method, p_rw, p_biased)
        assert p_rw < 5 * p_barrier_true + 0.02, (method, p_rw, p_barrier_true)

    # symmetric wells: only the time-corrected Tiwary estimator balances
    # them (the quasi-static final-bias estimator misweights frames from
    # early in the run, before the bias had filled the first well — that
    # deficiency is exactly why the c(t) correction exists)
    w = res.frame_weights(method="tiwary")
    ratio = w[x < -0.4].sum() / w[x > 0.4].sum()
    assert 1 / 3 < ratio < 3, ratio


def test_weights_feed_weighted_trajectory():
    res = _run(n_steps=6_000)
    w = res.frame_weights()
    traj = WeightedTrajectory(
        trajectory=res.frames.astype(np.float32),
        weights=w,
        dt=0.002 * 100,
        verbose=False,
    )
    assert traj.n_frames == res.frames.shape[0]
    np.testing.assert_allclose(traj.weights.mean(), 1.0, atol=1e-6)


def test_tiwary_explicit_grid_matches_default():
    res = _run(n_steps=6_000)
    grid = res._cv_grid(129)
    w_default = res.frame_weights(method="tiwary")
    w_explicit = res.frame_weights(method="tiwary", grid=grid)
    # the default grid is now built from float64 hill centers while
    # _cv_grid ranges come from the float32 originals — same grid up to
    # edge jitter
    np.testing.assert_allclose(w_default, w_explicit, rtol=1e-5)


def test_grid_rejected_above_2d():
    rng = np.random.default_rng(1)
    n = 10
    res = MetadynamicsResult(
        frames=rng.standard_normal((n, 3)),
        cv_values=rng.standard_normal((n, 3)).astype(np.float32),
        hill_centers=rng.standard_normal((n, 3)).astype(np.float32),
        hill_heights=np.ones(n, dtype=np.float32),
        hill_width=0.2,
        bias_factor=None,
        beta=1.0,
    )
    with pytest.raises(ValueError, match="grid"):
        res.frame_weights(method="tiwary")
    # explicit grid works
    w = res.frame_weights(
        method="tiwary", grid=rng.standard_normal((64, 3))
    )
    assert np.isfinite(w).all()


def test_mesh_sharded_walkers():
    """Multi-walker metadynamics shards over the mesh with identical
    physics (same seed => same trajectories as the unsharded run)."""
    import jax

    from colvarsfinder_tpu.parallel import make_data_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_data_mesh()
    kw = dict(
        n_steps=1_000, X0=np.array([1.0]), step_size=0.005,
        deposit_interval=50, hill_height=0.4, hill_width=0.3,
        bias_factor=8.0, n_chains=8, seed=4, verbose=False,
    )
    pot = DoubleWell1D()
    cv = lambda x: x[:1]  # noqa: E731
    res_plain = integrate_sde_metadynamics(pot, cv, **kw)
    res_mesh = integrate_sde_metadynamics(pot, cv, mesh=mesh, **kw)
    np.testing.assert_allclose(
        res_mesh.frames, res_plain.frames, rtol=0, atol=1e-5
    )
    with pytest.raises(ValueError, match="divisible"):
        integrate_sde_metadynamics(
            pot, cv, mesh=mesh, n_chains=3, n_steps=100,
            deposit_interval=50, verbose=False,
        )
