"""Post-training analysis helpers (colvarsfinder_tpu.analysis):
implied timescales, free-energy profiles, CV-subspace consistency."""

import numpy as np
import pytest

from colvarsfinder_tpu import analysis

from colvarsfinder_tpu.analysis import (
    autocorrelation,
    ck_test,
    cv_consistency,
    free_energy_profile,
    implied_timescales,
    timescales_vs_lag,
    vamp_score,
)


# ---------------------------------------------------------------- timescales
def test_implied_timescales_rate():
    t = implied_timescales([2.0, 0.5, 0.0, -1.0])
    np.testing.assert_allclose(t[:2], [0.5, 2.0])
    assert np.isinf(t[2]) and np.isinf(t[3])


def test_implied_timescales_log_undoes_finite_lag_bias():
    # a process with true timescale T sampled at lag tau has
    # autocorrelation rho = exp(-tau/T); the transfer-op estimate is
    # lambda = (1 - rho)/tau. 'log' must recover T exactly; 'rate' only
    # to first order.
    T, tau = 5.0, 1.0
    lam = (1.0 - np.exp(-tau / T)) / tau
    t_log = implied_timescales([lam], lag_time=tau, method="log")
    np.testing.assert_allclose(t_log, [T], rtol=1e-12)
    t_rate = implied_timescales([lam])
    assert abs(t_rate[0] - T) > 0.3  # visibly biased at this lag

    # non-decaying / overshooting estimates degrade gracefully
    t = implied_timescales([0.0, 1.5], lag_time=tau, method="log")
    assert np.isinf(t[0]) and np.isnan(t[1])


def test_implied_timescales_validation():
    with pytest.raises(ValueError):
        implied_timescales([1.0], method="banana")
    with pytest.raises(ValueError):
        implied_timescales([1.0], method="log")  # lag_time required


# ------------------------------------------------------------- free energy
def test_free_energy_profile_1d_double_well():
    # Boltzmann-distributed samples from F(s) = (s^2 - 1)^2 at beta=3,
    # drawn by rejection; the recovered profile must match F up to the
    # additive constant within sampling noise.
    rng = np.random.default_rng(0)
    beta = 3.0
    F = lambda s: (s**2 - 1.0) ** 2
    s = rng.uniform(-2, 2, 400_000)
    keep = rng.uniform(0, 1, s.size) < np.exp(-beta * F(s))
    s = s[keep]
    centers, prof = free_energy_profile(
        s, beta=beta, bins=40, value_range=(-1.6, 1.6)
    )
    ref = F(centers) - F(centers).min()
    ok = np.isfinite(prof)
    assert ok.sum() > 30
    np.testing.assert_allclose(prof[ok], ref[ok], atol=0.12)
    assert prof.min() == 0.0


def test_free_energy_profile_weights_reweight():
    # uniform samples + Boltzmann weights must reproduce the same
    # profile as Boltzmann-distributed samples
    rng = np.random.default_rng(1)
    beta = 2.0
    F = lambda s: 0.5 * s**2
    s = rng.uniform(-3, 3, 300_000)
    w = np.exp(-beta * F(s))
    centers, prof = free_energy_profile(
        s, weights=w, beta=beta, bins=30, value_range=(-2.4, 2.4)
    )
    ref = F(centers) - F(centers).min()
    np.testing.assert_allclose(prof, ref, atol=0.08)


def test_free_energy_profile_2d_shape_and_norm():
    rng = np.random.default_rng(2)
    xy = rng.standard_normal((100_000, 2))
    (cx, cy), F2 = free_energy_profile(xy, beta=1.0, bins=24)
    assert cx.shape == (24,) and cy.shape == (24,) and F2.shape == (24, 24)
    assert F2.min() == 0.0
    # Gaussian: isotropic quadratic well; compare a center slice
    ix = np.argmin(np.abs(cx))
    ref = 0.5 * cy**2
    ok = np.isfinite(F2[ix]) & (np.abs(cy) < 1.5)
    np.testing.assert_allclose(
        F2[ix][ok] - F2[ix][ok].min(), ref[ok] - ref[ok].min(), atol=0.15
    )


def test_free_energy_profile_rejects_bad_shape():
    with pytest.raises(ValueError):
        free_energy_profile(np.zeros((10, 3)))


# ------------------------------------------------------------- consistency
def test_cv_consistency_mixing_invariance():
    # the same 2-D subspace under different invertible mixings (incl.
    # head swap + sign flip) must score 1; an unrelated subspace ~0
    rng = np.random.default_rng(3)
    X = rng.standard_normal((2000, 6))
    W = rng.standard_normal((6, 2))
    base = lambda x: x @ W
    mixed = lambda x: (x @ W) @ np.array([[0.0, -2.0], [1.5, 0.3]]) + 7.0
    other = lambda x: x @ rng.standard_normal((6, 2))
    M = cv_consistency([base, mixed, other], X)
    assert M.shape == (3, 3)
    np.testing.assert_allclose(np.diag(M), 1.0)
    np.testing.assert_allclose(M, M.T)
    assert M[0, 1] > 0.999
    assert M[0, 2] < 0.8


def test_cv_consistency_mixed_head_counts_and_dead_heads():
    rng = np.random.default_rng(4)
    X = rng.standard_normal((1000, 4))
    W = rng.standard_normal((4, 2))
    two = lambda x: x @ W
    one = lambda x: (x @ W[:, :1])[:, 0]  # 1-D output, ndim-1 shape
    dead = lambda x: np.concatenate(
        [x @ W, np.ones((x.shape[0], 1))], axis=1
    )  # constant third head must be dropped, not pollute
    M = cv_consistency([two, one, dead], X)
    assert M[0, 1] > 0.999  # the shared head's span agrees
    assert M[0, 2] > 0.999  # dead head ignored


def test_cv_consistency_on_trained_seed_pair(tmp_path):
    """End-to-end: two seeds of the same eigen task on the same data
    must learn a more consistent CV subspace than a third model trained
    on unrelated data."""
    from colvarsfinder_tpu.core import EigenFunctionTask
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.utils import WeightedTrajectory

    rng = np.random.default_rng(5)
    # plant a slow direction: strong variance along a fixed axis
    z = rng.standard_normal((600, 1)) * 3.0
    noise = rng.standard_normal((600, 3)) * 0.3
    data = np.concatenate([z, noise], axis=1).astype(np.float32)
    traj = WeightedTrajectory(
        trajectory=data, weights=np.ones(600), dt=0.1, verbose=False
    )
    unrel = WeightedTrajectory(
        trajectory=rng.standard_normal((600, 4)).astype(np.float32),
        weights=np.ones(600), dt=0.1, verbose=False,
    )

    def train(t, seed, tag):
        m = EigenFunctions([4, 12, 1], k=1, seed=seed)
        task = EigenFunctionTask(
            t, None, m, str(tmp_path / tag),
            alpha=10.0, eig_weights=[1.0], lag_tau=0.2, k=1,
            learning_rate=0.02, seed=seed, batch_size=128, num_epochs=25,
            test_ratio=0.25, save_model_every_step=0, verbose=False,
            tensorboard=False, debug_mode=False,
        )
        task.train()
        return task.colvar_model()

    cvs = [train(traj, 0, "s0"), train(traj, 1, "s1"),
           train(unrel, 2, "u")]
    X = data[:400]
    M = cv_consistency(cvs, X)
    assert M[0, 1] > 0.9, M
    assert M[0, 1] > M[0, 2], M


# ----------------------------------------------------------- markovianity
def _ar1(a, n, seed, k=1):
    """Stationary AR(1) series with exact rho(L) = a^L per head."""
    rng = np.random.default_rng(seed)
    y = np.empty((n, k))
    y[0] = rng.standard_normal(k)
    xi = rng.standard_normal((n - 1, k)) * np.sqrt(1.0 - a * a)
    for t in range(1, n):
        y[t] = a * y[t - 1] + xi[t - 1]
    return y


def test_autocorrelation_matches_ar1_analytic():
    a, n = 0.9, 200_000
    y = _ar1(a, n, seed=10, k=2)
    lags = [1, 5, 10, 20]
    rho = autocorrelation(y, lags)
    assert rho.shape == (4, 2)
    expected = np.broadcast_to(a ** np.asarray(lags)[:, None], (4, 2))
    np.testing.assert_allclose(rho, expected, atol=0.02)
    # lag 0 is exactly 1; uniform explicit weights change nothing
    np.testing.assert_allclose(autocorrelation(y, [0]), 1.0, rtol=1e-12)
    np.testing.assert_array_equal(
        autocorrelation(y, lags), autocorrelation(y, lags, weights=np.full(n, 3.0))
    )


def test_autocorrelation_validation():
    y = np.zeros(100)
    with pytest.raises(ValueError):
        autocorrelation(y, [100])  # lag >= n
    with pytest.raises(ValueError):
        autocorrelation(y, [-1])
    with pytest.raises(ValueError):
        autocorrelation(y, [1], weights=np.ones(99))
    with pytest.raises(ValueError):
        autocorrelation(np.zeros((10, 2, 2)), [1])


def test_ck_test_markovian_vs_mixed():
    # a single AR(1) head is Markovian: rho(i*tau) = rho(tau)^i holds.
    # A sum of two AR(1) processes with well-separated timescales is
    # not: the CK prediction from the base lag decays too fast.
    n, tau = 200_000, 5
    markov = _ar1(0.9, n, seed=11)
    fast, slow = _ar1(0.5, n, seed=12), _ar1(0.985, n, seed=13)
    mixed = fast + slow
    r_markov = ck_test(markov, lag=tau, n_multiples=4)
    r_mixed = ck_test(mixed, lag=tau, n_multiples=4)
    assert r_markov.lags.tolist() == [5, 10, 15, 20]
    assert r_markov.estimated.shape == (4, 1)
    np.testing.assert_allclose(
        r_markov.predicted[:, 0], r_markov.estimated[0, 0] ** np.arange(1, 5)
    )
    assert r_markov.max_deviation < 0.03
    assert r_mixed.max_deviation > 0.08
    assert r_mixed.max_deviation > 3 * r_markov.max_deviation
    with pytest.raises(ValueError):
        ck_test(markov, lag=0)


def test_timescales_vs_lag_plateau():
    # AR(1): implied timescale is -dt/ln(a) at EVERY lag (flat curve);
    # the two-timescale mixture's curve must rise with the lag.
    a, dt = 0.92, 0.1
    y = _ar1(a, 200_000, seed=14)
    lags = [1, 4, 8, 16]
    t = timescales_vs_lag(y, lags, dt=dt)
    t_true = -dt / np.log(a)
    np.testing.assert_allclose(t[:, 0], t_true, rtol=0.12)
    mixed = _ar1(0.5, 200_000, seed=15) + _ar1(0.985, 200_000, seed=16)
    tm = timescales_vs_lag(mixed, lags, dt=dt)[:, 0]
    assert tm[-1] > 1.5 * tm[0]
    # degenerate correlations degrade gracefully
    white = np.asarray(
        np.random.default_rng(17).standard_normal(50_000)
    )
    tw = timescales_vs_lag(white, [200], dt=dt)
    # rho is ~N(0, 1/sqrt(n-L)) ≈ ±0.005: either the nan branch
    # (rho <= 0) or a short spurious timescale -20/ln(rho) << 20
    # (tw < 20 would require rho > 1/e, ~70 sigma away)
    assert np.isnan(tw).all() or (tw < 20.0).all()
    with pytest.raises(ValueError):
        timescales_vs_lag(y, [0], dt=dt)


# ------------------------------------------------------------- vamp score
def test_vamp_score_ar1_analytic():
    # single AR(1) head: VAMP-2 = rho(L)^2 = a^(2L); VAMP-1 = a^L.
    a, L = 0.9, 5
    y = _ar1(a, 200_000, seed=20)
    s2 = vamp_score(y, lag=L)
    s1 = vamp_score(y, lag=L, method="VAMP-1")
    np.testing.assert_allclose(s2, a ** (2 * L), atol=0.02)
    np.testing.assert_allclose(s1, a**L, atol=0.02)
    # two INDEPENDENT slow heads: contributions add
    y2 = np.concatenate([y, _ar1(0.8, 200_000, seed=21)], axis=1)
    np.testing.assert_allclose(
        vamp_score(y2, lag=L), a ** (2 * L) + 0.8 ** (2 * L), atol=0.03
    )


def test_vamp_score_mixing_invariance_and_degeneracy():
    # the defining VAMP property: invariant under invertible linear
    # mixing of the heads (which the raw train loss is NOT).
    y = np.concatenate(
        [_ar1(0.9, 100_000, seed=22), _ar1(0.7, 100_000, seed=23)], axis=1
    )
    A = np.array([[2.0, 0.7], [-0.4, 0.1]])  # invertible
    base = vamp_score(y, lag=4)
    np.testing.assert_allclose(vamp_score(y @ A, lag=4), base, rtol=1e-8)
    # adding a CONSTANT head changes nothing (truncated whitening) ...
    y3 = np.concatenate([y, np.full((y.shape[0], 1), 3.7)], axis=1)
    np.testing.assert_allclose(vamp_score(y3, lag=4), base, rtol=1e-6)
    # ... and a white-noise head adds ~nothing
    rng = np.random.default_rng(24)
    y4 = np.concatenate([y, rng.standard_normal((y.shape[0], 1))], axis=1)
    assert abs(vamp_score(y4, lag=4) - base) < 0.01
    # uniform explicit weights are a no-op
    np.testing.assert_allclose(
        vamp_score(y, lag=4, weights=np.full(y.shape[0], 2.0)), base, rtol=1e-12
    )


def test_vamp_score_ranks_cv_quality():
    # a CV that mixes the slow mode with fast noise scores lower than
    # the clean slow mode — the model-selection use case.
    slow = _ar1(0.95, 150_000, seed=25)
    fast = _ar1(0.3, 150_000, seed=26)
    clean = vamp_score(slow, lag=8)
    noisy = vamp_score(0.5 * slow + fast, lag=8)
    assert clean > noisy + 0.1, (clean, noisy)
    with pytest.raises(ValueError):
        vamp_score(slow, lag=0)
    with pytest.raises(ValueError):
        vamp_score(slow, lag=8, method="VAMP-3")
    with pytest.raises(ValueError):
        vamp_score(slow, lag=8, weights=np.ones(7))


def test_lag_integrality_validation():
    """Float lags from lag_tau/dt arithmetic are accepted when they are
    integral up to fp error (6.999999999999999 -> 7) and REJECTED when
    genuinely fractional — never silently floored."""
    y = _ar1(0.9, 5_000, seed=30)
    near7 = 0.7 / 0.1  # 6.999999999999999
    np.testing.assert_array_equal(
        autocorrelation(y, [near7]), autocorrelation(y, [7])
    )
    r = ck_test(y, lag=near7, n_multiples=2)
    assert r.lags.tolist() == [7, 14]
    np.testing.assert_array_equal(
        timescales_vs_lag(y, [near7], dt=0.1), timescales_vs_lag(y, [7], dt=0.1)
    )
    assert vamp_score(y, near7) == vamp_score(y, 7)
    for fn in (
        lambda: autocorrelation(y, [6.5]),
        lambda: ck_test(y, lag=6.5),
        lambda: timescales_vs_lag(y, [6.5], dt=0.1),
        lambda: vamp_score(y, 6.5),
    ):
        with pytest.raises(ValueError):
            fn()


def test_validate_cv_pass_and_fail():
    """validate_cv applies the docs/validation.md rules: an AR(1) head
    passes (Markovian, flat timescale curve); a two-timescale mixture
    fails both Markovianity and lag convergence."""
    from colvarsfinder_tpu.analysis import validate_cv

    good = _ar1(0.92, 200_000, seed=31)
    r = validate_cv(good, lag=5, dt=0.1)
    assert r.markovian and r.converged and r.passed
    assert r.timescales.shape == (4, 1)
    assert 0.0 < r.vamp2 <= 1.0
    assert "pass" in repr(r) and "FAIL" not in repr(r)

    mixed = _ar1(0.5, 200_000, seed=32) + _ar1(0.985, 200_000, seed=33)
    rm = validate_cv(mixed, lag=5, dt=0.1)
    assert not rm.markovian and not rm.converged and not rm.passed
    assert "FAIL" in repr(rm)

    with pytest.raises(ValueError):
        validate_cv(good, lag=0, dt=0.1)
    with pytest.raises(ValueError):
        validate_cv(good, lag=5.5, dt=0.1)


# ------------------------------------------------------------- TICA / PCA
def test_tica_unmixes_ar1_modes():
    """TICA on a linear mixture of AR(1) heads with distinct
    autocorrelations must recover the per-mode eigenvalues a^lag and,
    whitened, un-mix the slow mode (|corr| with the true slow series
    ~= 1)."""
    from colvarsfinder_tpu.analysis import tica

    n, lag = 300_000, 4
    slow = _ar1(0.95, n, seed=40)
    fast = _ar1(0.60, n, seed=41)
    y = np.concatenate([slow, fast], axis=1)
    A = np.array([[1.3, -0.7], [0.4, 1.1]])  # invertible mixing
    X = y @ A.T
    t = tica(X, lag=lag)
    np.testing.assert_allclose(t.eigenvalues, [0.95**lag, 0.60**lag], atol=0.02)
    s = t(X)
    assert s.shape == (n, 2)
    c = np.corrcoef(s[:, 0], slow[:, 0])[0, 1]
    assert abs(c) > 0.99
    # whitened outputs: unit variance per component
    np.testing.assert_allclose(s.var(axis=0), 1.0, atol=0.02)
    # implied timescales follow -lag*dt/ln(lam)
    np.testing.assert_allclose(
        t.timescales, -lag * 1.0 / np.log(t.eigenvalues), rtol=1e-12
    )


def test_tica_agrees_with_vamp_score():
    """VAMP-2 of the TICA projection equals the sum of squared TICA
    eigenvalues (both estimate the same whitened cross-covariance
    norm), up to estimator differences vanishing with n."""
    from colvarsfinder_tpu.analysis import tica, vamp_score

    n, lag = 300_000, 3
    y = np.concatenate(
        [_ar1(0.9, n, seed=42), _ar1(0.5, n, seed=43)], axis=1
    )
    X = y @ np.array([[0.9, 0.2], [-0.3, 1.4]]).T
    t = tica(X, lag=lag)
    v2 = vamp_score(t(X), lag)
    np.testing.assert_allclose(v2, np.sum(t.eigenvalues**2), atol=0.02)


def test_tica_degenerate_and_weighted():
    from colvarsfinder_tpu.analysis import tica

    n, lag = 100_000, 2
    y = _ar1(0.9, n, seed=44, k=2)
    # constant feature column is dropped, not amplified
    Xc = np.concatenate([y, np.full((n, 1), 3.7)], axis=1)
    t = tica(Xc, lag=lag)
    assert t.components.shape == (3, 2)
    assert np.all(np.isfinite(t.eigenvalues))
    # weight-scale invariance
    w = np.random.default_rng(45).uniform(0.5, 2.0, n)
    t1 = tica(y, lag=lag, weights=w)
    t2 = tica(y, lag=lag, weights=3.0 * w)
    np.testing.assert_allclose(t1.eigenvalues, t2.eigenvalues, rtol=1e-12)
    np.testing.assert_allclose(t1.components, t2.components, rtol=1e-9)
    # n_components selects the top mode
    tt = tica(y, lag=lag, n_components=1)
    assert tt.components.shape == (2, 1)
    assert tt.eigenvalues.shape == (1,)


def test_tica_validation_errors():
    from colvarsfinder_tpu.analysis import tica

    y = _ar1(0.9, 1000, seed=46)
    for bad in (
        lambda: tica(y, lag=0),
        lambda: tica(y, lag=1000),
        lambda: tica(y, lag=2.5),
        lambda: tica(y, lag=2, weights=np.ones(7)),
        lambda: tica(y, lag=2, n_components=5),
    ):
        with pytest.raises(ValueError):
            bad()


def test_pca_matches_duplication_and_numpy():
    from colvarsfinder_tpu.analysis import pca

    rng = np.random.default_rng(47)
    X = rng.standard_normal((5000, 3)) @ np.diag([3.0, 1.0, 0.2])
    p = pca(X)
    # eigenvalue fractions: descending, sum to ~1 for full rank
    assert np.all(np.diff(p.eigenvalues) <= 1e-12)
    np.testing.assert_allclose(p.eigenvalues.sum(), 1.0, rtol=1e-12)
    # matches numpy eigh of the covariance (up to sign)
    C = np.cov(X.T, bias=True)
    vals, vecs = np.linalg.eigh(C)
    lead = vecs[:, np.argmax(vals)]
    got = p.components[:, 0] * np.sqrt(vals.max())  # undo whitening
    assert min(
        np.abs(got - lead).max(), np.abs(got + lead).max()
    ) < 1e-8
    # whitened outputs
    np.testing.assert_allclose(p(X).var(axis=0), 1.0, rtol=1e-9)
    # integer weights == row duplication
    idx = rng.integers(0, 5000, 2000)
    w = np.bincount(idx, minlength=5000).astype(float)
    pw = pca(X, weights=w, n_components=2)
    pd = pca(X[np.repeat(np.arange(5000), w.astype(int))], n_components=2)
    np.testing.assert_allclose(pw.eigenvalues, pd.eigenvalues, rtol=1e-9)
    np.testing.assert_allclose(np.abs(pw.components), np.abs(pd.components), rtol=1e-6)


def test_linear_cv_plugs_into_battery():
    """LinearCV satisfies the package CV contract: cv_consistency can
    compare a TICA baseline against the true slow map, and
    validate_cv accepts its output series."""
    from colvarsfinder_tpu.analysis import tica, validate_cv

    n, lag = 200_000, 5
    slow = _ar1(0.95, n, seed=48)
    fast = _ar1(0.5, n, seed=49)
    X = np.concatenate([slow, fast], axis=1) @ np.array(
        [[1.0, 0.5], [-0.2, 1.0]]
    ).T
    t = tica(X, lag=lag, n_components=1)
    truth = lambda Z: (np.linalg.solve(
        np.array([[1.0, 0.5], [-0.2, 1.0]]), Z.T
    ).T)[:, :1]
    M = cv_consistency([t, truth], X)
    assert M[0, 1] > 0.99
    r = validate_cv(t(X), lag=lag, dt=0.1)
    assert r.markovian and r.passed


# --------------------------------------------------------------------- MSM
def _sample_chain(T, n, seed, pi0=None):
    """Sample a trajectory from an exact discrete chain."""
    rng = np.random.default_rng(seed)
    m = T.shape[0]
    s = np.empty(n, dtype=np.int64)
    s[0] = rng.integers(m) if pi0 is None else rng.choice(m, p=pi0)
    cdf = np.cumsum(T, axis=1)
    u = rng.uniform(size=n - 1)
    for t in range(1, n):
        s[t] = np.searchsorted(cdf[s[t - 1]], u[t - 1])
    return s


def _exact_committor(T, A, B):
    m = T.shape[0]
    q = np.zeros(m)
    q[list(B)] = 1.0
    free = [i for i in range(m) if i not in set(A) | set(B)]
    M = np.eye(len(free)) - T[np.ix_(free, free)]
    q[free] = np.linalg.solve(M, T[np.ix_(free, list(B))].sum(axis=1))
    return q


def test_msm_recovers_exact_chain():
    """Estimated transition matrix, stationary distribution, committor
    and MFPT all converge to the exact values of a known birth-death
    chain."""
    from colvarsfinder_tpu.analysis import msm

    # 5-state birth-death chain (reversible by construction)
    p, q = 0.08, 0.12
    T = np.zeros((5, 5))
    for i in range(5):
        if i < 4:
            T[i, i + 1] = p
        if i > 0:
            T[i, i - 1] = q
        T[i, i] = 1.0 - T[i].sum()
    s = _sample_chain(T, 400_000, seed=50)
    r = msm(s, lag=1)
    assert r.active.all()
    np.testing.assert_allclose(r.transition_matrix, T, atol=0.01)
    # analytic stationary: pi_i ~ (p/q)^i
    pi = (p / q) ** np.arange(5)
    pi /= pi.sum()
    np.testing.assert_allclose(r.stationary, pi, atol=0.01)
    # committor between the two end states vs exact solve on true T
    np.testing.assert_allclose(
        r.committor([0], [4]), _exact_committor(T, [0], [4]), atol=0.03
    )
    assert r.committor([0], [4])[0] == 0.0
    assert r.committor([0], [4])[4] == 1.0
    # MFPT to state 4 from 3: exact solve on true T
    m_true = np.zeros(5)
    free = [0, 1, 2, 3]
    m_true[free] = np.linalg.solve(
        np.eye(4) - T[np.ix_(free, free)], np.ones(4)
    )
    np.testing.assert_allclose(r.mfpt([4])[free], m_true[free], rtol=0.1)
    # spectral timescale of the slowest mode matches the true chain's
    lam_true = np.sort(np.abs(np.linalg.eigvals(T)))[-2]
    np.testing.assert_allclose(
        r.timescales(k=1)[0], -1.0 / np.log(lam_true), rtol=0.1
    )


def test_msm_lag_and_weights_and_validation():
    from colvarsfinder_tpu.analysis import msm

    # hand-checked counts at lag 2: pairs (s_t, s_{t+2})
    s = np.array([0, 1, 0, 1, 2, 2, 0])
    r = msm(s, lag=2, reversible=False)
    C = np.zeros((3, 3))
    for t in range(5):
        C[s[t], s[t + 2]] += 1
    np.testing.assert_allclose(r.counts, C)
    rows = C.sum(1)
    np.testing.assert_allclose(
        r.transition_matrix[rows > 0], C[rows > 0] / rows[rows > 0, None]
    )
    # weight-scale invariance
    w = np.linspace(1, 2, s.size)
    r1 = msm(s, lag=1, weights=w)
    r2 = msm(s, lag=1, weights=5 * w)
    np.testing.assert_allclose(r1.transition_matrix, r2.transition_matrix)
    # n_states pads inactive self-loop states
    r3 = msm(s, lag=1, n_states=5)
    assert r3.n_states == 5 and not r3.active[4]
    assert np.isnan(r3.committor([0], [2])[4])
    # validation errors
    for bad in (
        lambda: msm(s.astype(float), lag=1),
        lambda: msm(s, lag=0),
        lambda: msm(s, lag=7),
        lambda: msm(s, lag=1, n_states=2),
        lambda: msm(s, lag=1, weights=np.ones(3)),
    ):
        with pytest.raises(ValueError):
            bad()
    r4 = msm(s, lag=1)
    with pytest.raises(ValueError):
        r4.committor([0], [0])  # not disjoint
    with pytest.raises(ValueError):
        r4.committor([], [1])
    with pytest.raises(ValueError):
        r4.mfpt([9])


def test_discretize_and_committor_sigmoid_on_double_well():
    """End-to-end reaction-coordinate check: the committor along the
    slow AR(1)-like coordinate of a double-well-ish process is a
    monotone sigmoid crossing ~1/2 between the basins."""
    from colvarsfinder_tpu.analysis import discretize, msm

    # overdamped Langevin in V(x) = (x^2-1)^2 at beta=5: bistable,
    # basins at +-1, transition state at 0
    rng = np.random.default_rng(51)
    n, h, beta = 400_000, 0.02, 5.0
    x = np.empty(n)
    x[0] = -1.0
    xi = rng.standard_normal(n - 1) * np.sqrt(2 * h / beta)
    for t in range(1, n):
        x[t] = x[t - 1] - h * 4 * x[t - 1] * (x[t - 1] ** 2 - 1) + xi[t - 1]
    idx, centers = discretize(x, n_bins=30, value_range=(-1.8, 1.8))
    assert idx.min() >= 0 and idx.max() < 30 and centers.shape == (30,)
    r = msm(idx, lag=2, n_states=30)
    A = np.flatnonzero(centers < -0.9)
    B = np.flatnonzero(centers > 0.9)
    q = r.committor(A, B)
    mid = np.flatnonzero((centers >= -0.9) & (centers <= 0.9))
    qm = q[mid]
    assert np.all(np.isfinite(qm))
    assert np.all(np.diff(qm) > -0.02)  # monotone up to noise
    # sigmoid: pinned near the basins, crossing 1/2 at the barrier top
    assert qm[0] < 0.2 and qm[-1] > 0.8
    j = int(np.argmin(np.abs(qm - 0.5)))
    assert abs(centers[mid][j]) < 0.35


def test_discretize_2d_grid():
    from colvarsfinder_tpu.analysis import discretize

    y = np.array([[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [0.0, 0.0]])
    idx, (cx, cy) = discretize(y, n_bins=2, value_range=[(-1, 1), (-1, 1)])
    # interior-edge values go right (numpy digitize convention):
    # (0,0) lands in the upper-right cell
    np.testing.assert_array_equal(idx, [0, 3, 1, 3])
    assert cx.shape == (2,) and cy.shape == (2,)
    with pytest.raises(ValueError):
        discretize(y, n_bins=1)
    with pytest.raises(ValueError):
        discretize(y, n_bins=2, value_range=[(-1, 1)])
    with pytest.raises(ValueError):
        discretize(y[:, 0], n_bins=2, value_range=(1, 1))


# --------------------------------------------- multi-trajectory estimators
def test_segment_aware_estimators_ignore_boundary_pairs():
    """With segment_starts, lagged pairs never straddle source
    trajectories: estimates on a concatenation of two AR(1) runs with a
    huge artificial offset between them match the single-trajectory
    estimates, while the naive (no-segments) estimator is corrupted."""
    from colvarsfinder_tpu.analysis import autocorrelation, tica, vamp_score

    n1, n2, L = 60_000, 40_000, 4
    y1 = _ar1(0.9, n1, seed=60)
    y2 = _ar1(0.9, n2, seed=61) + 50.0  # second run far away
    y = np.concatenate([y1, y2])
    segs = [0, n1]

    rho_seg = autocorrelation(y, [L], segment_starts=segs)[0, 0]
    # manual oracle: pooled pairs from both segments (same estimator)
    a = np.concatenate([y1[:-L], y2[:-L]])[:, 0]
    b = np.concatenate([y1[L:], y2[L:]])[:, 0]
    da, db = a - a.mean(), b - b.mean()
    rho_manual = (da @ db) / np.sqrt((da @ da) * (db @ db))
    np.testing.assert_allclose(rho_seg, rho_manual, rtol=1e-12)

    # the offset makes the pooled windowed variance huge; rho_seg is the
    # inflated cross-segment correlation (~1), NOT the dynamics' 0.9^4 —
    # per-segment series give the clean value, and the point here is
    # that segment_starts controls PAIRING, not centering:
    rho_naive = autocorrelation(y, [L])[0, 0]
    # naive includes L boundary-crossing pairs; with the 50-sigma offset
    # the two must differ measurably even at 1e5 samples
    assert abs(rho_naive - rho_seg) > 1e-6

    # vamp/tica accept and use segments without error and stay in range
    v = vamp_score(y, L, segment_starts=segs)
    assert 0.0 <= v <= 1.0
    t = tica(y, lag=L, segment_starts=segs)
    assert np.all(t.eigenvalues <= 1.0 + 1e-9)

    # a lag no segment supports raises
    with pytest.raises(ValueError):
        autocorrelation(y, [n1 + 1], segment_starts=[0, n1])


def test_msm_segment_counts_exact():
    from colvarsfinder_tpu.analysis import msm

    s = np.array([0, 1, 0, 1, 2, 2, 0])
    # two segments: [0,1,0] and [1,2,2,0]; lag-1 pairs within segments:
    # (0,1),(1,0) and (1,2),(2,2),(2,0)
    r = msm(s, lag=1, segment_starts=[0, 3], reversible=False)
    C = np.zeros((3, 3))
    for a, b in [(0, 1), (1, 0), (1, 2), (2, 2), (2, 0)]:
        C[a, b] += 1
    np.testing.assert_allclose(r.counts, C)


def test_validate_cv_with_segments_matches_weights_convention():
    from colvarsfinder_tpu.analysis import validate_cv

    y = np.concatenate([_ar1(0.92, 150_000, seed=62),
                        _ar1(0.92, 150_000, seed=63)])
    r = validate_cv(y, lag=5, dt=0.1, segment_starts=[0, 150_000])
    assert r.passed


# ---------------------------------------------------------------------------
# PCCA+ metastable coarse-graining
# ---------------------------------------------------------------------------

def _block_chain_traj(n_steps=60_000, seed=0):
    """Sample a 9-state Markov chain with three metastable 3-state blocks;
    returns (assignments, true_block_of_state)."""
    rng = np.random.default_rng(seed)
    T = np.full((9, 9), 1e-4)
    for b in range(3):
        sl = slice(3 * b, 3 * b + 3)
        T[sl, sl] = 1.0  # fast mixing inside the block
    # slow inter-block channels between block edges
    T[2, 3] = T[3, 2] = 5e-3
    T[5, 6] = T[6, 5] = 5e-3
    T = T / T.sum(axis=1, keepdims=True)
    s = np.empty(n_steps, dtype=np.int64)
    s[0] = 0
    cdf = np.cumsum(T, axis=1)
    u = rng.uniform(size=n_steps)
    for t in range(1, n_steps):
        s[t] = np.searchsorted(cdf[s[t - 1]], u[t])
    return s, np.repeat(np.arange(3), 3)


def test_pcca_recovers_metastable_blocks():
    s, true_blocks = _block_chain_traj()
    m = analysis.msm(s, lag=1, n_states=9)
    chi = m.pcca(3)
    assert chi.shape == (9, 3)
    act = m.active
    np.testing.assert_allclose(chi[act].sum(axis=1), 1.0, atol=1e-10)
    assert np.all(chi[act] >= 0.0)

    crisp = m.metastable_assignments(3)
    # the partition must match the generating blocks up to relabeling
    seen = {}
    for state in np.flatnonzero(act):
        b = true_blocks[state]
        if b in seen:
            assert crisp[state] == seen[b], (
                f"state {state} split off its block: {crisp}"
            )
        else:
            seen[b] = crisp[state]
    assert len(set(seen.values())) == 3, f"blocks merged: {crisp}"
    # membership of a block-interior state in its own set is near 1
    assert chi[1, crisp[1]] > 0.9
    assert chi[4, crisp[4]] > 0.9
    assert chi[7, crisp[7]] > 0.9


def test_pcca_coarse_grain_is_metastable():
    s, _ = _block_chain_traj(seed=3)
    m = analysis.msm(s, lag=1, n_states=9)
    T_c, pi_c = m.coarse_grain(3)
    assert T_c.shape == (3, 3)
    np.testing.assert_allclose(T_c.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(pi_c.sum(), 1.0, atol=1e-10)
    # the coarse model must be strongly diagonal (metastability survives
    # coarse-graining)
    assert np.all(np.diag(T_c) > 0.95), T_c
    # coarse stationary weights are all substantial (three real wells)
    assert np.all(pi_c > 0.1)


def test_pcca_validates_n():
    s, _ = _block_chain_traj(n_steps=5000)
    m = analysis.msm(s, lag=1, n_states=9)
    with pytest.raises(ValueError, match="n must lie"):
        m.pcca(1)
    with pytest.raises(ValueError, match="n must lie"):
        m.pcca(100)


# ---------------------------------------------------------------------------
# free_energy_profile bootstrap errors
# ---------------------------------------------------------------------------

def test_fep_bootstrap_errors_1d():
    rng = np.random.default_rng(0)
    # correlated series sampling a known double-well density
    n = 40000
    y = np.where(rng.uniform(size=n) < 0.5, -1.0, 1.0) + 0.3 * rng.normal(
        size=n
    )
    centers, F, F_err = analysis.free_energy_profile(
        y, bins=24, n_bootstrap=30, block_frames=50, seed=1
    )
    assert F_err.shape == F.shape
    core = np.isfinite(F) & np.isfinite(F_err)
    assert core.sum() > 10
    # the anchor bin (profile minimum) has zero spread by construction
    well = np.argmin(F)
    assert F_err[well] == 0.0
    # neighboring well-populated bins: small but nonzero uncertainty
    nb = well + 1 if well + 1 < len(F) else well - 1
    assert 0.0 < F_err[nb] < 0.3
    # errors grow toward rarely-visited (high-F) bins
    hi = core & (F > np.nanpercentile(F[core], 80))
    lo = core & (F < np.nanpercentile(F[core], 20))
    assert F_err[hi].mean() > F_err[lo].mean()
    # the two-tuple contract is unchanged without bootstrap
    out = analysis.free_energy_profile(y, bins=24)
    assert len(out) == 2


def test_fep_bootstrap_errors_2d():
    rng = np.random.default_rng(2)
    y = rng.normal(size=(20000, 2))
    centers, F, F_err = analysis.free_energy_profile(
        y, bins=12, n_bootstrap=12, seed=0
    )
    assert F.shape == (12, 12) and F_err.shape == (12, 12)
    mid = np.unravel_index(np.argmin(F), F.shape)
    assert np.isfinite(F_err[mid]) and F_err[mid] < 0.2


class TestTimescalesBootstrap:
    def _ar1(self, n=20000, rho=0.95, k=1, seed=0):
        rng = np.random.default_rng(seed)
        x = np.zeros((n, k))
        for t in range(1, n):
            x[t] = rho * x[t - 1] + rng.normal(0, 1, k)
        return x

    def test_band_brackets_truth(self):
        from colvarsfinder_tpu.analysis import timescales_vs_lag_bootstrap

        rho = 0.95
        x = self._ar1(rho=rho)
        lags = [1, 2, 5, 10]
        t, lo, hi = timescales_vs_lag_bootstrap(
            x, lags, dt=1.0, n_bootstrap=60, seed=1
        )
        assert t.shape == lo.shape == hi.shape == (4, 1)
        truth = -1.0 / np.log(rho)
        # band is ordered, positive-width, brackets the point estimate
        # (the band measures THIS realization's sampling variance, so it
        # centers on the realization's estimate, not the ensemble truth),
        # and is tight relative to the timescale
        assert np.all(lo < hi)
        assert np.all((lo <= t) & (t <= hi))
        assert np.all((hi - lo) < 0.3 * t)
        # the estimator itself is consistent with the AR(1) truth
        assert np.all(np.abs(t - truth) / truth < 0.15)
        # point estimate consistent with the plain estimator
        from colvarsfinder_tpu.analysis import timescales_vs_lag

        np.testing.assert_allclose(
            t, timescales_vs_lag(x, lags, dt=1.0)
        )

    def test_block_must_exceed_lag(self):
        from colvarsfinder_tpu.analysis import timescales_vs_lag_bootstrap

        x = self._ar1(n=2000)
        with pytest.raises(ValueError, match="block"):
            timescales_vs_lag_bootstrap(
                x, [50], block_frames=40, n_bootstrap=4
            )

    def test_segment_starts_respected(self):
        from colvarsfinder_tpu.analysis import timescales_vs_lag_bootstrap

        x = self._ar1(n=6000)
        t, lo, hi = timescales_vs_lag_bootstrap(
            x, [1, 5], segment_starts=[0, 3000], n_bootstrap=12,
            block_frames=200, seed=2,
        )
        assert np.isfinite(t).all()
        assert np.all(lo <= hi)


class TestMSMCK:
    def _sample_chain(self, T, n, seed=0):
        rng = np.random.default_rng(seed)
        m = T.shape[0]
        s = np.zeros(n, dtype=np.int64)
        cum = np.cumsum(T, axis=1)
        u = rng.uniform(size=n)
        for t in range(1, n):
            s[t] = np.searchsorted(cum[s[t - 1]], u[t])
        return s

    def test_markov_chain_passes(self):
        """A genuinely Markovian 4-state chain with 2-block metastable
        structure satisfies CK at every lag multiple."""
        from colvarsfinder_tpu.analysis import msm_ck_test

        eps, d = 0.02, 0.2  # rare inter-block, fast intra-block moves
        T = np.array(
            [
                [1 - d - eps, d, eps, 0.0],
                [d, 1 - d - eps, 0.0, eps],
                [eps, 0.0, 1 - d - eps, d],
                [0.0, eps, d, 1 - d - eps],
            ]
        )
        s = self._sample_chain(T, 60_000, seed=1)
        res = msm_ck_test(s, lag=1, n_sets=2, n_multiples=5)
        assert res.estimated.shape == (5, 2, 2)
        assert res.predicted.shape == (5, 2, 2)
        # sets recover the block structure
        sets = res.sets
        assert sets[0] == sets[1] and sets[2] == sets[3]
        assert sets[0] != sets[2]
        assert res.max_deviation < 0.03

    def test_non_markovian_observable_fails(self):
        """Projecting a 3-state chain onto 2 observable states breaks
        Markovianity at short lags — CK must flag it."""
        from colvarsfinder_tpu.analysis import msm_ck_test

        # A(sticky) <-> B(fast intermediate) <-> C; observe {A,B} vs {C}.
        # Fresh entries into the lump land in B and exit quickly while
        # long residents sit in A — strongly non-exponential residence.
        T = np.array(
            [
                [0.99, 0.01, 0.0],
                [0.01, 0.50, 0.49],
                [0.0, 0.02, 0.98],
            ]
        )
        s3 = self._sample_chain(T, 60_000, seed=2)
        obs = np.where(s3 == 2, 1, 0)  # lump A,B
        res = msm_ck_test(obs, lag=1, n_sets=2, n_multiples=5)
        # the lumped process is NOT Markov at lag 1 (measured ~0.26)
        assert res.max_deviation > 0.1

    def test_empty_set_raises(self):
        from colvarsfinder_tpu.analysis import msm_ck_test

        s = np.zeros(500, dtype=np.int64)  # single visited state
        with pytest.raises(ValueError, match="metastable set|active"):
            msm_ck_test(s, lag=1, n_sets=2)


# ------------------------------------------------------------- sensitivity
def test_cv_sensitivity_linear_oracle():
    """For a linear CV g(x) = W x the jacobian is W everywhere, so
    sensitivity with normalize='none' is exactly |W|, and 'std' scales
    column d by std(x_d)."""
    from colvarsfinder_tpu.analysis import cv_sensitivity

    rng = np.random.default_rng(0)
    W = np.array([[1.0, -2.0, 0.0], [0.5, 0.0, 3.0]])
    X = rng.standard_normal((4000, 3)) * np.array([1.0, 2.0, 0.5])

    res = cv_sensitivity(lambda x: x @ W.T, X, normalize="none")
    np.testing.assert_allclose(res.sensitivity, np.abs(W), rtol=1e-5)
    np.testing.assert_allclose(res.relative.sum(axis=1), 1.0, rtol=1e-9)

    res_std = cv_sensitivity(lambda x: x @ W.T, X, normalize="std")
    sigma = X.std(axis=0)
    np.testing.assert_allclose(
        res_std.sensitivity, np.abs(W) * sigma[None, :], rtol=2e-3
    )


def test_cv_sensitivity_numpy_fallback():
    """A non-traceable callable (numpy deployment evaluator) falls back
    to finite differences and matches the analytic jacobian."""
    from colvarsfinder_tpu.analysis import cv_sensitivity

    W = np.array([[2.0, -1.0]])

    def np_cv(x):
        x = np.asarray(x)  # breaks tracing; fine for numpy
        if x.dtype.kind not in "fd":
            raise TypeError("not traceable")
        return np.tanh(x) @ W.T

    rng = np.random.default_rng(1)
    X = rng.standard_normal((500, 2)) * 0.3
    res = cv_sensitivity(np_cv, X, normalize="none")
    # d tanh = 1 - tanh^2; RMS over the ensemble
    J = (1 - np.tanh(X) ** 2)[:, None, :] * W[None, :, :]
    want = np.sqrt((J**2).mean(axis=0))
    np.testing.assert_allclose(res.sensitivity, want, rtol=1e-3)


def test_cv_sensitivity_xyz_aggregation():
    """Coordinate CVs aggregate x/y/z per atom; untouched atoms score 0
    and .top() ranks the used atom first."""
    from colvarsfinder_tpu.analysis import cv_sensitivity

    rng = np.random.default_rng(2)
    X = rng.standard_normal((300, 4, 3)).astype(np.float32)

    def cv(x):  # depends only on atom 1
        return (x[:, 1, :] ** 2).sum(axis=-1, keepdims=True)

    res = cv_sensitivity(cv, X, aggregate="xyz")
    assert res.sensitivity.shape == (1, 4)
    assert res.labels == ["atom0", "atom1", "atom2", "atom3"]
    assert res.relative[0, 1] > 0.99
    label, share = res.top(0, n=1)[0]
    assert label == "atom1" and share > 0.99

    with pytest.raises(ValueError, match="labels"):
        cv_sensitivity(cv, X, aggregate="xyz", labels=["a", "b"])
    with pytest.raises(ValueError, match="xyz"):
        cv_sensitivity(lambda x: x[:, :1], np.zeros((5, 3)), aggregate="xyz")


def test_cv_sensitivity_trained_model():
    """The real surface: a ColvarModel with feature preprocessing —
    feature labels attach and every score is finite."""
    from colvarsfinder_tpu import ColvarModel
    from colvarsfinder_tpu.analysis import cv_sensitivity
    from colvarsfinder_tpu.models import EigenFunctions
    from colvarsfinder_tpu.ops import Feature, FeatureLayer, PreprocessingANN

    feat = FeatureLayer(
        [
            Feature("phi", "dihedral_rad", [0, 1, 2, 3]),
            Feature("b", "bond", [0, 4]),
        ]
    )
    pp = PreprocessingANN(None, feat)
    cv = ColvarModel(pp, EigenFunctions([2, 8, 1], 2, seed=0))
    rng = np.random.default_rng(3)
    X = (rng.standard_normal((200, 5, 3)) * 0.5).astype(np.float32)
    res = cv_sensitivity(cv, X, aggregate="xyz")
    assert res.sensitivity.shape == (2, 5)
    assert np.isfinite(res.sensitivity).all()
    # atom 4 only enters through the bond feature; atoms 0-3 through both
    assert (res.relative > 0).all()


def test_cv_sensitivity_1d_output():
    """Review fix: a [B]-shaped CV (e.g. committor_fn) is promoted to
    [B, 1] on both the jax and finite-difference paths."""
    from colvarsfinder_tpu.analysis import cv_sensitivity

    W = np.array([1.0, -3.0])
    rng = np.random.default_rng(4)
    X = rng.standard_normal((400, 2))

    res_jax = cv_sensitivity(lambda x: x @ W, X, normalize="none")
    np.testing.assert_allclose(res_jax.sensitivity, np.abs(W)[None], rtol=1e-5)

    def np_cv(x):
        x = np.asarray(x)
        if x.dtype.kind not in "fd":
            raise TypeError("not traceable")
        return x @ W  # [B]

    res_np = cv_sensitivity(np_cv, X, normalize="none")
    assert res_np.sensitivity.shape == (1, 2)
    np.testing.assert_allclose(res_np.sensitivity, np.abs(W)[None], rtol=1e-4)


def test_tpt_rate_two_state_exact():
    """For a 2-state chain the TPT rate is the exact escape rate p/dt,
    and equals 1/mfpt(A -> B)."""
    from colvarsfinder_tpu.analysis import msm

    p, q = 0.05, 0.2
    rng = np.random.default_rng(0)
    n = 200_000
    s = np.empty(n, dtype=np.int64)
    s[0] = 0
    u = rng.uniform(size=n)
    for t in range(1, n):
        if s[t - 1] == 0:
            s[t] = 1 if u[t] < p else 0
        else:
            s[t] = 0 if u[t] < q else 1
    model = msm(s, lag=1, reversible=True)
    dt = 0.5
    k = model.tpt_rate([0], [1], dt=dt)
    np.testing.assert_allclose(k, p / dt, rtol=0.05)
    m = model.mfpt([1], dt=dt)
    np.testing.assert_allclose(k, 1.0 / m[0], rtol=0.05)


def test_tpt_rate_validation():
    from colvarsfinder_tpu.analysis import msm

    s = np.array([0, 1, 0, 1, 2, 1, 0, 2, 1, 0] * 50)
    model = msm(s, lag=1)
    with pytest.raises(ValueError, match="disjoint"):
        model.tpt_rate([0], [0])
    assert model.tpt_rate([0], [2]) > 0


def test_tpt_rate_multistate_counting_oracle():
    """Review fix: with interior states the rate must equal the
    brute-force count of reactive A->B events per time spent 'last in
    A' — the earlier all-edges flux over-counted each multi-hop path
    once per hop (3-13x on chains like this)."""
    from colvarsfinder_tpu.analysis import msm

    # 4-state birth-death chain with a soft interior barrier
    T = np.array([
        [0.90, 0.10, 0.00, 0.00],
        [0.30, 0.55, 0.15, 0.00],
        [0.00, 0.15, 0.55, 0.30],
        [0.00, 0.00, 0.10, 0.90],
    ])
    rng = np.random.default_rng(1)
    n = 400_000
    s = np.empty(n, dtype=np.int64)
    s[0] = 0
    for t in range(1, n):
        s[t] = rng.choice(4, p=T[s[t - 1]])

    A, B = [0], [3]
    dt = 1.0
    model = msm(s, lag=1, reversible=True)
    k = model.tpt_rate(A, B, dt=dt)

    # brute force: b_t = 1 when the chain last visited A (not B);
    # a reactive event = entering B while b is set
    b = np.zeros(n, dtype=bool)
    events = 0
    last_a = s[0] == 0
    for t in range(n):
        if s[t] == 0:
            last_a = True
        elif s[t] == 3:
            if last_a:
                events += 1
            last_a = False
        b[t] = last_a
    k_count = events / (n * dt * b.mean())
    np.testing.assert_allclose(k, k_count, rtol=0.1)


# ------------------------------------------- statistical inefficiency
def test_statistical_inefficiency_ar1_analytic():
    # AR(1) integrated autocorrelation: g = (1 + a) / (1 - a)
    a, n = 0.9, 100_000
    y = _ar1(a, n, seed=3, k=2)
    g = analysis.statistical_inefficiency(y)
    assert g.shape == (2,)
    np.testing.assert_allclose(g, (1 + a) / (1 - a), rtol=0.15)


def test_statistical_inefficiency_white_noise_is_one():
    rng = np.random.default_rng(0)
    g = analysis.statistical_inefficiency(rng.standard_normal(50_000))
    assert g.shape == (1,)
    assert 1.0 <= g[0] < 1.3


def test_statistical_inefficiency_segments():
    # two independent AR(1) runs concatenated: with segment_starts the
    # estimate still matches the analytic g (the junction never pairs)
    a = 0.9
    y = np.concatenate([_ar1(a, 60_000, seed=1), _ar1(a, 60_000, seed=2)])
    g = analysis.statistical_inefficiency(y, segment_starts=[0, 60_000])
    np.testing.assert_allclose(g[0], (1 + a) / (1 - a), rtol=0.15)


def test_statistical_inefficiency_constant_raises():
    with pytest.raises(ValueError, match="constant"):
        analysis.statistical_inefficiency(np.ones(100))


def test_decorrelated_indices_explicit_g_and_segments():
    y = np.arange(20, dtype=float) % 7  # values irrelevant with g given
    idx = analysis.decorrelated_indices(
        y, segment_starts=[0, 10], g=4.0, offset=1
    )
    np.testing.assert_array_equal(idx, [1, 5, 9, 11, 15, 19])
    assert np.all(np.diff(idx) > 0)


def test_decorrelated_indices_estimates_stride():
    a = 0.75  # g = 7
    y = _ar1(a, 80_000, seed=5)
    idx = analysis.decorrelated_indices(y)
    stride = int(np.diff(idx)[0])
    assert 5 <= stride <= 9, stride
    assert idx[0] == 0 and np.all(np.diff(idx) == stride)


def test_umbrella_result_subsample():
    from colvarsfinder_tpu.utils.enhanced import UmbrellaResult

    K, n = 3, 4_000
    rng = np.random.default_rng(7)
    cv = np.stack([_ar1(0.6, n, seed=k) for k in range(K)])  # g = 4
    res = UmbrellaResult(
        frames=rng.standard_normal((K, n, 2)),
        cv_values=cv,
        centers=np.linspace(-1, 1, K)[:, None],
        kappas=np.full(K, 10.0),
        beta=1.0,
        dt=0.05,
    )
    sub = res.subsample()
    stride = int(round(sub.dt / res.dt))
    assert 3 <= stride <= 6, stride
    assert sub.frames.shape == (K, len(range(0, n, stride)), 2)
    assert sub.cv_values.shape[1] == sub.frames.shape[1]
    # unchanged window metadata; MBAR still solves on the decimated data
    np.testing.assert_array_equal(sub.centers, res.centers)
    mb = sub.mbar()
    assert len(mb.weights) == K
    explicit = res.subsample(g=2.0)
    assert explicit.frames.shape[1] == n // 2


def test_remd_result_subsample_folds_swaps():
    from colvarsfinder_tpu.utils.enhanced import REMDResult

    K, n = 2, 9
    swap = np.zeros((n, K), dtype=bool)
    swap[0, 0] = True   # survives at kept frame 0
    swap[2, 1] = True   # folds into kept frame 1 (covers j in 1..3)
    swap[7, 0] = True   # beyond the last kept frame -> dropped
    res = REMDResult(
        frames=np.arange(K * n * 1, dtype=float).reshape(K, n, 1),
        energies=np.arange(K * n, dtype=float).reshape(K, n) % 5,
        betas=np.array([1.0, 0.5]),
        dt=0.1,
        pair_attempts=np.array([4]),
        pair_accepts=np.array([2]),
        swap_history=swap,
    )
    sub = res.subsample(g=3.0)
    np.testing.assert_array_equal(sub.frames[:, :, 0],
                                  res.frames[:, [0, 3, 6], 0])
    np.testing.assert_allclose(sub.dt, 0.3)
    # kept frame i covers swaps in (kept[i-1], kept[i]]; swap[7,0] lies
    # beyond the last kept frame (j=7,8 dropped) and must not appear
    expected = np.array([[True, False],    # j=0 verbatim
                         [False, True],    # j in 1..3 -> swap[2,1]
                         [False, False]])  # j in 4..6 -> none
    np.testing.assert_array_equal(sub.swap_history, expected)


def test_free_energy_auto_block():
    # strongly correlated AR(1): the auto block (2*g) yields honest
    # (larger) bootstrap bands than naive per-frame resampling
    y = _ar1(0.95, 20_000, seed=9)[:, 0]
    kw = dict(beta=1.0, bins=20, n_bootstrap=24, seed=0)
    cen, F, err_auto = analysis.free_energy_profile(
        y, block_frames="auto", **kw
    )
    _, _, err_naive = analysis.free_energy_profile(y, block_frames=1, **kw)
    m = np.isfinite(err_auto) & np.isfinite(err_naive)
    assert m.sum() > 5
    assert err_auto[m].mean() > 1.5 * err_naive[m].mean(), (
        err_auto[m].mean(), err_naive[m].mean())
    with pytest.raises(ValueError, match="auto"):
        analysis.free_energy_profile(y, block_frames="bogus", **kw)


def test_statistical_inefficiency_trended_series_terminates_fast():
    # a trended (non-stationary) series never crosses C(t)=0; the
    # default n//2 cap + geometric lag stepping keep it from the old
    # O(n^2) scan (advisor round-3 finding)
    import time

    y = np.linspace(0.0, 1.0, 200_000)
    y = y + 1e-3 * np.random.default_rng(0).standard_normal(y.size)
    t0 = time.perf_counter()
    g = analysis.statistical_inefficiency(y)
    elapsed = time.perf_counter() - t0
    assert elapsed < 20.0, elapsed
    assert g[0] > 1_000  # trend => huge apparent correlation time


def test_statistical_inefficiency_max_lag_cap():
    a = 0.9
    y = _ar1(a, 60_000, seed=7)
    g_full = analysis.statistical_inefficiency(y)
    g_capped = analysis.statistical_inefficiency(y, max_lag=500)
    # AR(1) with g=19 decorrelates well before lag 500: same answer
    np.testing.assert_allclose(g_capped, g_full, rtol=0.05)
    g_tight = analysis.statistical_inefficiency(y, max_lag=2)
    assert g_tight[0] < g_full[0]  # truncated sum under-reads


def test_free_energy_auto_block_segment_aware():
    # pooled = two independent copies of the same AR(1) window; the
    # segment-aware auto block must not differ wildly from the
    # single-window one (cross-window correlation excluded), and
    # bootstrap blocks must respect boundaries (no crash, finite bands)
    y1 = _ar1(0.9, 10_000, seed=1)[:, 0]
    y2 = _ar1(0.9, 10_000, seed=2)[:, 0]
    pooled = np.concatenate([y1, y2])
    cen, F, err = analysis.free_energy_profile(
        pooled, beta=1.0, bins=15, n_bootstrap=16, seed=0,
        block_frames="auto", segment_starts=[0, 10_000],
    )
    assert np.isfinite(err[np.isfinite(F)]).sum() > 5
    with pytest.raises(ValueError, match="segment"):
        analysis.free_energy_profile(
            pooled, beta=1.0, bins=15, n_bootstrap=4,
            block_frames=15_000, segment_starts=[0, 10_000],
        )
