"""Physics integration tests (SURVEY.md §4 integration tier): learned
eigenvalues against the analytically known spectrum of the
Ornstein-Uhlenbeck process.

For overdamped Langevin dynamics with V(x) = x^2/2 at beta = 1 the
generator's first nontrivial eigenvalue is exactly 1 with eigenfunction
f(x) = x; the transfer-operator quotient at lag tau estimates
(1 - exp(-2 tau)) / (2 tau) * 2 ~ eigenvalue-dependent decay. We verify the
trained estimates land near the analytic values and the learned CV is
monotone in x.
"""

import numpy as np
import pytest

from colvarsfinder_tpu.core import EigenFunctionTask
from colvarsfinder_tpu.models import EigenFunctions
from colvarsfinder_tpu.utils import WeightedTrajectory


@pytest.fixture(scope="module")
def ou_traj():
    """Exact OU sampling: x_{t+dt} = a x_t + sqrt(1-a^2) xi with
    a = exp(-dt); stationary N(0, 1)."""
    rng = np.random.default_rng(123)
    n, dt = 20_000, 0.1
    a = np.exp(-dt)
    x = np.zeros(n, dtype=np.float64)
    x[0] = rng.standard_normal()
    noise = rng.standard_normal(n)
    for t in range(1, n):
        x[t] = a * x[t - 1] + np.sqrt(1 - a * a) * noise[t]
    return WeightedTrajectory(
        trajectory=x[:, None].astype(np.float32), dt=dt, verbose=False
    )


def _kw(tmp_path, name, epochs):
    return dict(
        model_path=str(tmp_path / name), learning_rate=0.01, batch_size=2000,
        num_epochs=epochs, test_ratio=0.2, save_model_every_step=0,
        verbose=False, tensorboard=False, seed=0,
    )


@pytest.mark.slow
def test_ou_generator_eigenvalue(ou_traj, tmp_path):
    model = EigenFunctions([1, 16, 16, 1], k=1, seed=0)
    task = EigenFunctionTask(
        ou_traj, None, model, alpha=20.0, eig_weights=[1.0], beta=1.0,
        lag_tau=0.0, k=1, **_kw(tmp_path, "gen", 60),
    )
    task.train()
    eig = task.train_loss_df["eig_1"].iloc[-5:].mean()
    # analytic lambda_1 = 1
    assert 0.75 < eig < 1.3, f"generator eigenvalue estimate {eig}"
    # learned CV monotone in x over the bulk of the distribution
    cv = task.colvar_model()
    xs = np.linspace(-2, 2, 21, dtype=np.float32)[:, None]
    vals = np.asarray(cv(xs))[:, 0]
    diffs = np.diff(vals)
    assert (diffs > 0).all() or (diffs < 0).all()


@pytest.mark.slow
def test_ou_transfer_operator_eigenvalue(ou_traj, tmp_path):
    tau = 0.5  # lag_idx = 5
    model = EigenFunctions([1, 16, 16, 1], k=1, seed=1)
    task = EigenFunctionTask(
        ou_traj, None, model, alpha=20.0, eig_weights=[1.0],
        lag_tau=tau, k=1, **_kw(tmp_path, "top", 60),
    )
    task.train()
    eig = task.train_loss_df["eig_1"].iloc[-5:].mean()
    # for f = x: E[(x_{t+tau} - x_t)^2] = 2 var (1 - e^-tau);
    # quotient = 2 var (1 - e^-tau) / (tau * 2 var) = (1 - e^-tau)/tau
    analytic = (1 - np.exp(-tau)) / tau
    assert abs(eig - analytic) < 0.3 * analytic, (
        f"transfer eigenvalue {eig} vs analytic {analytic}"
    )
