"""Plotting helpers: every figure function runs headless (Agg), returns a
matplotlib Axes with the expected artists, and consumes the real outputs
of the analysis/task surfaces it documents."""

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import pandas as pd  # noqa: E402

from colvarsfinder_tpu import analysis, plotting  # noqa: E402


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close("all")


def _loss_df(n=20, cols=("loss",)):
    rng = np.random.default_rng(0)
    data = {"epoch": np.arange(n)}
    for c in cols:
        data[c] = np.exp(-0.1 * np.arange(n)) + 0.05 * rng.random(n)
    return pd.DataFrame(data)


def test_loss_curves_train_test():
    train, test = _loss_df(), _loss_df()
    ax = plotting.plot_loss_curves(train, test)
    assert len(ax.get_lines()) == 2  # train solid + test dashed
    assert ax.get_lines()[1].get_linestyle() == "--"
    assert ax.get_legend() is not None


def test_loss_curves_accepts_task_duck():
    class Task:
        train_loss_df = _loss_df()
        test_loss_df = _loss_df()

    ax = plotting.plot_loss_curves(Task(), log=True)
    assert ax.get_yscale() == "log"


def test_eigenvalues_plot():
    df = _loss_df(cols=("loss", "eig_1", "eig_2"))
    ax = plotting.plot_eigenvalues(df)
    assert len(ax.get_lines()) == 2
    labels = [ln.get_label() for ln in ax.get_lines()]
    assert labels == ["eig_1", "eig_2"]
    with pytest.raises(ValueError, match="eig_"):
        plotting.plot_eigenvalues(_loss_df())


def test_cv_contour_with_trajectory():
    def cv(pts):
        return np.stack([pts[:, 0] ** 2 + pts[:, 1], pts[:, 1]], axis=1)

    traj = np.random.default_rng(1).normal(0, 1, (200, 2))
    ax = plotting.plot_cv_contour(
        cv, (-2, 2), (-2, 2), cv_index=1, n_grid=24, trajectory=traj
    )
    assert len(ax.collections) >= 1  # contour set (+ scatter)
    # colorbar created on the figure
    assert len(ax.figure.axes) == 2


def test_cv_scatter():
    rng = np.random.default_rng(2)
    phi, psi = rng.uniform(-np.pi, np.pi, (2, 300))
    ax = plotting.plot_cv_scatter(phi, psi, np.cos(psi))
    assert len(ax.collections) == 1
    assert len(ax.figure.axes) == 2  # + colorbar


def test_free_energy_1d_with_errors():
    rng = np.random.default_rng(3)
    s = rng.normal(0, 1, 5000)
    centers, F, err = analysis.free_energy_profile(
        s, bins=30, n_bootstrap=8, block_frames=50
    )
    ax = plotting.plot_free_energy(centers, F, err)
    assert len(ax.get_lines()) == 1
    assert len(ax.collections) == 1  # the error band


def test_free_energy_2d_surface():
    rng = np.random.default_rng(4)
    s = rng.normal(0, 1, (5000, 2))
    centers, F = analysis.free_energy_profile(s, bins=20)
    ax = plotting.plot_free_energy(centers, F)
    assert len(ax.collections) == 1  # pcolormesh
    assert len(ax.figure.axes) == 2  # + colorbar


def test_ck_panel_from_analysis():
    rng = np.random.default_rng(5)
    n, k = 4000, 2
    x = np.zeros((n, k))
    for t in range(1, n):
        x[t] = 0.95 * x[t - 1] + rng.normal(0, 1, k)
    ck = analysis.ck_test(x, lag=5, n_multiples=3)
    ax = plotting.plot_ck_test(ck)
    assert len(ax.get_lines()) == 2 * k  # estimated + predicted per head


def test_timescales_plot():
    rng = np.random.default_rng(6)
    n = 6000
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = 0.97 * x[t - 1] + rng.normal()
    lags = [1, 2, 5, 10, 20]
    ts = analysis.timescales_vs_lag(x, lags, dt=0.1)
    ax = plotting.plot_timescales(lags, ts, dt=0.1)
    assert ax.get_yscale() == "log"
    assert len(ax.get_lines()) == 1
    assert len(ax.collections) == 1  # unresolvable-region shading


def test_figures_save(tmp_path):
    ax = plotting.plot_free_energy(
        np.linspace(-1, 1, 10), np.abs(np.linspace(-1, 1, 10))
    )
    out = tmp_path / "fes.png"
    ax.figure.savefig(out, dpi=60)
    assert out.stat().st_size > 0


def test_timescales_with_bootstrap_band():
    rng = np.random.default_rng(7)
    n = 8000
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = 0.96 * x[t - 1] + rng.normal()
    lags = [1, 2, 5, 10]
    t_pt, lo, hi = analysis.timescales_vs_lag_bootstrap(
        x, lags, dt=0.5, n_bootstrap=12, seed=0
    )
    ax = plotting.plot_timescales(lags, t_pt, dt=0.5, t_lo=lo, t_hi=hi)
    assert len(ax.get_lines()) == 1
    assert len(ax.collections) == 2  # CI band + unresolvable shading


def test_msm_ck_grid():
    rng = np.random.default_rng(9)
    # fast-mixing 2-state chain
    s = (rng.uniform(size=3000) < 0.5).astype(np.int64)
    res = analysis.msm_ck_test(s, lag=1, n_sets=2, n_multiples=3)
    axes = plotting.plot_msm_ck(res)
    assert axes.shape == (2, 2)
    for ax in axes.ravel():
        assert len(ax.get_lines()) == 2  # estimated + predicted


def test_cv_sensitivity_plot():
    rng = np.random.default_rng(5)
    W = rng.standard_normal((2, 6))
    X = rng.standard_normal((500, 6))
    res = analysis.cv_sensitivity(lambda x: x @ W.T, X)
    ax = plotting.plot_cv_sensitivity(res, top_n=4)
    # 2 CV series x 4 kept inputs = 8 bars
    assert len(ax.patches) == 8
    assert len(ax.get_yticklabels()) == 4
    ax2 = plotting.plot_cv_sensitivity(res, cv_idx=1)
    assert len(ax2.patches) == 6


def test_cv_sensitivity_plot_numpy_index():
    """Review fix: numpy integer cv_idx (np.argmax output) is accepted."""
    rng = np.random.default_rng(6)
    res = analysis.cv_sensitivity(
        lambda x: x @ rng.standard_normal((2, 3)).T, rng.standard_normal((50, 3))
    )
    ax = plotting.plot_cv_sensitivity(res, cv_idx=np.int64(1))
    assert len(ax.patches) == 3


def test_committor_check_plot():
    from colvarsfinder_tpu.analysis import CommittorCheck

    chk = CommittorCheck(
        np.linspace(0.05, 0.95, 10),
        np.linspace(0.05, 0.95, 10) + 0.02,
        np.full(10, 20.0),
    )
    ax = plotting.plot_committor_check(chk)
    assert len(ax.lines) == 2
    assert "max dev" in ax.get_legend().get_texts()[1].get_text()


def test_steered_work_plot():
    from colvarsfinder_tpu.utils.enhanced import SteeredResult

    M, T = 6, 20
    rng = np.random.default_rng(8)
    sched = np.linspace(0.0, 1.0, T)[:, None]
    works = np.cumsum(np.abs(rng.standard_normal((M, T))) * 0.05, axis=1)
    res = SteeredResult(
        frames=rng.standard_normal((M, T, 2)),
        cv_values=sched[None].repeat(M, axis=0),
        works=works,
        schedule=sched,
        kappa=50.0,
        beta=1.0,
        dt=0.1,
    )
    ax = plotting.plot_steered_work(res)
    # M grey traces + mean + jarzynski + cumulant
    assert len(ax.lines) == M + 3
    labels = [t.get_text() for t in ax.get_legend().get_texts()]
    assert any("Jarzynski" in t for t in labels)
