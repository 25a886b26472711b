"""Whole-run CV-FIELD parity against the ACTUAL reference package.

The per-step harnesses (tests/test_eigen_parity.py, benchmarks/parity_step.py)
prove losses and gradients match to <=2.4e-9 in f64; this module closes the
remaining inferential gap: after training BOTH frameworks for the notebooks'
full epoch counts from identical initial parameters, identical data, and
identical injected splits, the *learned CV itself* — the reference's own
correctness criterion (reference core.py:372-382 colvar_model; the
examples/2d/2d.ipynb cell-14 contour is judged on this field) — must agree
pointwise on held-out states: per-head |Pearson correlation| > 0.99 after
sign/order alignment, and the trained eigenvalues must match.

Two configurations mirror the BASELINE.md shapes:

* 2D generator config (BASELINE config 2 shape): k=1 eigenfunction of the
  infinitesimal generator on equilibrium samples of a 2D double-well,
  notebook-scale 200 epochs (2d.ipynb cell 16).
* transfer-operator config (BASELINE config 4 SHAPE: d=30, k=2,
  [30,20,20,20,1]-per-head): the reference's dipeptide run needs molann's
  PreprocessingANN (unavailable here), so the same tensor shapes are driven
  with pp_layer = Identity on planted AR(1) slow modes whose transfer-op
  eigenfunctions are known to be the two slow channel coordinates — the
  head-matching is therefore well-separated, not near-degenerate.

Marked ``slow``: several hundred epochs in both frameworks (~2-4 min total).
"""

import os
import sys

import numpy as np
import pytest
import torch

from colvarsfinder_tpu.core import EigenFunctionTask
from colvarsfinder_tpu.models import EigenFunctions
from colvarsfinder_tpu.utils import WeightedTrajectory

pytestmark = pytest.mark.slow

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="module")
def reference(tmp_path_factory):
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference package not mounted")
    stub = tmp_path_factory.mktemp("openmm_stub")
    pkg = stub / "openmm"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("class unit:\n    pass\n")
    (pkg / "app.py").write_text("")
    sys.path.insert(0, str(stub))
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import colvarsfinder.core as ref_core
        import colvarsfinder.nn as ref_nn
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    yield ref_core, ref_nn
    sys.path.remove(str(stub))
    sys.path.remove(REFERENCE_PATH)


class _RefTraj:
    """Duck-typed WeightedTrajectory for the reference tasks."""

    def __init__(self, x, w, dt):
        self.trajectory = x
        self.weights = w
        self.dt = dt
        self.n_frames = x.shape[0]


def _transplant_eigenfunctions(jax_model, torch_model):
    for i in range(jax_model.k):
        sd = {}
        for li, layer in enumerate(jax_model.params):
            sd[f"{li + 1}.weight"] = torch.from_numpy(
                np.asarray(layer["weight"][i]).copy()
            )
            sd[f"{li + 1}.bias"] = torch.from_numpy(
                np.asarray(layer["bias"][i]).copy()
            )
        torch_model.eigen_funcs[i].load_state_dict(sd)


def _replay_split(n, seed, times):
    from sklearn.model_selection import train_test_split

    np.random.seed(seed)
    for _ in range(times):
        tr, te = train_test_split(np.arange(n), test_size=0.2)
    return tr, te


def _aligned_correlations(cv_a, cv_b):
    """Best per-head |Pearson r| matching between two CV fields
    [G, k]: greedy assignment on the |corr| matrix (k is tiny). Returns
    the [k] matched |r| values and the permutation b_head[a_head]."""
    k = cv_a.shape[1]
    c = np.empty((k, k))
    for i in range(k):
        for j in range(k):
            c[i, j] = abs(np.corrcoef(cv_a[:, i], cv_b[:, j])[0, 1])
    # greedy max assignment — exact for the well-separated spectra here
    perm = np.full(k, -1)
    out = np.zeros(k)
    cwork = c.copy()
    for _ in range(k):
        i, j = np.unravel_index(np.argmax(cwork), (k, k))
        perm[i] = j
        out[i] = c[i, j]
        cwork[i, :] = -1.0
        cwork[:, j] = -1.0
    return out, perm


def _train_pair(
    reference, tmp_path, x, w, dt, dims, k, lag_tau, num_epochs,
    batch_size, alpha, eig_weights, beta, split_seed, model_seed, tag,
    pp_j=None, pp_t=None,
):
    """Co-train our task and the reference task from identical initial
    parameters / data / splits; returns (jax_task, ref_task).

    ``pp_j`` / ``pp_t`` optionally supply matching preprocessing layers
    (our native ops vs a torch mini-molann) so the co-training runs
    through the FULL molecular path (reference core.py:403 applies
    ``preprocessing_layer`` per batch)."""
    ref_core, ref_nn = reference
    lag_idx = int(round(lag_tau / dt))
    ll = len(x) - lag_idx
    # reference's eigen task draws the split twice (core.py:465-468)
    train_idx, test_idx = _replay_split(ll, seed=split_seed, times=2)

    model_j = EigenFunctions(dims, k, seed=model_seed)
    traj_j = WeightedTrajectory(
        trajectory=x, weights=w, dt=dt, verbose=False
    )
    diag = np.ones(dims[0], dtype=np.float64)
    task_j = EigenFunctionTask(
        traj_j, pp_j, model_j, str(tmp_path / f"jax_{tag}"),
        alpha=alpha, eig_weights=eig_weights, diag_coeff=diag,
        beta=beta, lag_tau=lag_tau, k=k, learning_rate=0.005,
        batch_size=batch_size, num_epochs=num_epochs, test_ratio=0.2,
        save_model_every_step=0, verbose=False, tensorboard=False,
        split_indices=(train_idx, test_idx),
    )
    task_j.train()

    model_t = ref_nn.EigenFunctions(dims, k)
    _transplant_eigenfunctions(model_j, model_t)
    traj_t = _RefTraj(x.astype(np.float64), w.astype(np.float64), dt)
    task_t = ref_core.EigenFunctionTask(
        traj_t, pp_t if pp_t is not None else torch.nn.Identity(),
        model_t,
        str(tmp_path / f"ref_{tag}"),
        alpha=alpha, eig_weights=eig_weights,
        diag_coeff=torch.ones(dims[0]),
        beta=beta, lag_tau=lag_tau, k=k, learning_rate=0.005,
        batch_size=batch_size, num_epochs=num_epochs, test_ratio=0.2,
        save_model_every_step=0, verbose=False, debug_mode=False,
    )
    np.random.seed(split_seed)
    task_t.train()
    return task_j, task_t


def _cv_fields(task_j, task_t, grid):
    """Evaluate both learned CV models on held-out states [G, d]."""
    cv_j = np.asarray(task_j.colvar_model()(grid.astype(np.float32)))
    with torch.no_grad():
        cv_t = (
            task_t.colvar_model()(torch.from_numpy(grid).to(torch.float32))
            .numpy()
        )
    return cv_j.reshape(len(grid), -1), cv_t.reshape(len(grid), -1)


def test_cv_field_parity_2d_generator(reference, tmp_path):
    """BASELINE config-2 shape: 2D generator eigenfunction, k=1,
    notebook-scale 200 epochs (2d.ipynb cell 16). The learned CV must be
    the same FIELD in both frameworks, not just the same loss curve."""
    # equilibrium samples of V(x, y) = (x^2-1)^2 + 2 y^2 at beta=2.5:
    # double-well x via rejection sampling, Gaussian y — the slowest
    # generator mode is the well-hopping coordinate (a tanh-like
    # function of x), cleanly separated from the y relaxation
    rng = np.random.default_rng(42)
    beta = 2.5
    n = 5000
    xs = []
    while sum(len(a) for a in xs) < n:
        cand = rng.uniform(-2.2, 2.2, 4 * n)
        acc = rng.uniform(0, 1, 4 * n) < np.exp(
            -beta * (cand**2 - 1.0) ** 2
        )
        xs.append(cand[acc])
    xcoord = np.concatenate(xs)[:n]
    ycoord = rng.normal(0.0, 1.0 / np.sqrt(2 * 2.0 * beta), n)
    data = np.stack([xcoord, ycoord], axis=1).astype(np.float32)
    w = np.ones(n, dtype=np.float32)

    task_j, task_t = _train_pair(
        reference, tmp_path, data, w, dt=0.1, dims=[2, 20, 20, 1], k=1,
        lag_tau=0.0, num_epochs=200, batch_size=1000, alpha=10.0,
        eig_weights=[1.0], beta=beta, split_seed=123, model_seed=7,
        tag="gen2d",
    )

    # held-out evaluation grid over the sampled region (the notebook's
    # contour field, 2d.ipynb cell 14)
    gx, gy = np.meshgrid(
        np.linspace(-1.8, 1.8, 61), np.linspace(-0.9, 0.9, 31)
    )
    grid = np.stack([gx.ravel(), gy.ravel()], axis=1)
    cv_j, cv_t = _cv_fields(task_j, task_t, grid)

    corrs, _ = _aligned_correlations(cv_j, cv_t)
    assert np.all(corrs > 0.99), corrs

    # trained eigenvalues agree (final-epoch estimates)
    ev_j = task_j.train_loss_df["eig_1"].to_numpy()[-1]
    ev_t = task_t.train_loss_df["eig_1"].to_numpy()[-1]
    np.testing.assert_allclose(ev_j, ev_t, rtol=0.05)


def test_cv_field_parity_transfer_op(reference, tmp_path):
    """BASELINE config-4 SHAPE: d=30, k=2, [30,20,20,20,1]-per-head
    transfer-operator run (dipeptide notebook scale: 100 epochs,
    main.ipynb cell 18) on planted AR(1) slow modes; both frameworks
    must learn the same two slow coordinates."""
    rng = np.random.default_rng(3)
    n, d = 20_000, 30
    a = np.zeros(d)
    a[0], a[1] = 0.995, 0.96  # two well-separated slow channels
    x = np.empty((n, d), dtype=np.float64)
    x[0] = rng.standard_normal(d)
    noise = rng.standard_normal((n - 1, d))
    for t in range(1, n):
        x[t] = a * x[t - 1] + np.sqrt(1 - a**2) * noise[t - 1]
    data = x.astype(np.float32)
    w = np.ones(n, dtype=np.float32)

    dims = [30, 20, 20, 20, 1]
    task_j, task_t = _train_pair(
        reference, tmp_path, data, w, dt=0.1, dims=dims, k=2,
        lag_tau=0.5, num_epochs=100, batch_size=4000, alpha=20.0,
        eig_weights=[1.0, 1.0], beta=1.0, split_seed=88, model_seed=11,
        tag="top30",
    )

    # held-out states: a fresh stationary draw from the same process
    m = 4000
    y = np.empty((m, d))
    y[0] = rng.standard_normal(d)
    for t in range(1, m):
        y[t] = a * y[t - 1] + np.sqrt(1 - a**2) * rng.standard_normal(d)
    grid = y.astype(np.float64)
    cv_j, cv_t = _cv_fields(task_j, task_t, grid)

    corrs, perm = _aligned_correlations(cv_j, cv_t)
    assert np.all(corrs > 0.99), (corrs, perm)

    # both found the PLANTED modes: each head correlates with one of
    # the two slow channels
    planted = grid[:, :2]
    pc_j, _ = _aligned_correlations(cv_j, planted)
    assert np.all(pc_j > 0.8), pc_j

    # eigenvalues agree head-by-head after the same alignment
    ev_j = np.array(
        [task_j.train_loss_df[f"eig_{i + 1}"].to_numpy()[-1]
         for i in range(2)]
    )
    ev_t = np.array(
        [task_t.train_loss_df[f"eig_{i + 1}"].to_numpy()[-1]
         for i in range(2)]
    )
    np.testing.assert_allclose(np.sort(ev_j), np.sort(ev_t), rtol=0.1)


def test_cv_field_parity_2d_autoencoder(reference, tmp_path):
    """BASELINE config-1 shape: 2D autoencoder, notebook-scale 200
    epochs — the learned 1-D encoder CV must be the same FIELD in both
    frameworks (reference core.py:640-647 colvar_model = pp + encoder)."""
    from colvarsfinder_tpu.core import AutoEncoderTask
    from colvarsfinder_tpu.models import AutoEncoder

    rng = np.random.default_rng(21)
    n = 5000
    theta = rng.uniform(-np.pi, np.pi, n)
    rad = 1.0 + 0.15 * rng.standard_normal(n)
    data = np.stack(
        [rad * np.cos(theta), rad * np.sin(theta)], axis=1
    ).astype(np.float32)
    w = np.ones(n, dtype=np.float32)

    dims_e, dims_d = [2, 20, 20, 1], [1, 20, 20, 2]
    train_idx, test_idx = _replay_split(n, seed=55, times=1)

    model_j = AutoEncoder(dims_e, dims_d, seed=9)
    traj_j = WeightedTrajectory(
        trajectory=data, weights=w, dt=0.1, verbose=False
    )
    task_j = AutoEncoderTask(
        traj_j, None, model_j, str(tmp_path / "jax_ae"),
        learning_rate=0.005, batch_size=1000, num_epochs=200,
        test_ratio=0.2, save_model_every_step=0, verbose=False,
        tensorboard=False, split_indices=(train_idx, test_idx),
    )
    task_j.train()

    ref_core, ref_nn = reference
    model_t = ref_nn.AutoEncoder(dims_e, dims_d)

    def transplant(jax_seq, torch_seq):
        sd = {}
        for name, arr in jax_seq.named_parameters():
            sd[name] = torch.from_numpy(np.asarray(arr).copy())
        torch_seq.load_state_dict(sd)

    transplant(model_j.encoder, model_t.encoder)
    transplant(model_j.decoder, model_t.decoder)
    traj_t = _RefTraj(data.astype(np.float64), w.astype(np.float64), 0.1)
    task_t = ref_core.AutoEncoderTask(
        traj_t, torch.nn.Identity(), model_t, str(tmp_path / "ref_ae"),
        learning_rate=0.005, batch_size=1000, num_epochs=200,
        test_ratio=0.2, save_model_every_step=0, verbose=False,
    )
    np.random.seed(55)
    task_t.train()

    gx, gy = np.meshgrid(
        np.linspace(-1.3, 1.3, 41), np.linspace(-1.3, 1.3, 41)
    )
    grid = np.stack([gx.ravel(), gy.ravel()], axis=1)
    cv_j, cv_t = _cv_fields(task_j, task_t, grid)
    corrs, _ = _aligned_correlations(cv_j, cv_t)
    assert np.all(corrs > 0.99), corrs
    assert np.isfinite(cv_j).all() and np.isfinite(cv_t).all()


def test_cv_field_parity_full_preprocessing(reference, tmp_path):
    """Round-4 verdict missing #1: whole-run CV-field parity through the
    FULL molecular preprocessing path. A ~60-line torch "mini-molann"
    (Kabsch AlignmentLayer + dihedral/position FeatureLayer per the
    SURVEY §2.8 contracts; formulas mirror molann's, cf. the reference
    dipeptide workflow examples/dipeptide/main.ipynb cell 12) drives the
    ACTUAL reference EigenFunctionTask per batch (reference core.py:403),
    while our native ops drive ours — co-trained from identical initial
    parameters, frames, and injected splits on 22-atom alanine-dipeptide
    frames with a planted two-state psi mode. The learned CV FIELDS must
    agree per-head at |r| > 0.99."""
    import importlib.util

    from colvarsfinder_tpu.ops import (
        AlignmentLayer, Feature, FeatureLayer, PreprocessingANN,
    )
    from colvarsfinder_tpu.utils import read_xtc

    # ---- 22-atom frames with a planted slow psi mode + random rigid
    # motion per frame (so the alignment has real work to do)
    ex_path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "dipeptide.py"
    )
    spec = importlib.util.spec_from_file_location("dipeptide_example",
                                                  ex_path)
    ex = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex)
    top = ex.build_topology()
    n = 8000
    xtc_path, psi_planted = ex.synthesize_trajectory(
        top, n, dt_ps=10.0, outdir=str(tmp_path)
    )
    frames = read_xtc(xtc_path)[0].astype(np.float32)  # [n, 22, 3]
    w = np.ones(n, dtype=np.float32)
    n_atoms = frames.shape[1]

    # ---- our native preprocessing: align on all atoms, then
    # [phi(cos,sin), psi(cos,sin), all positions] -> d_r = 4 + 66
    quads = [tuple(ex.PHI_ATOMS), tuple(ex.PSI_ATOMS)]
    pp_j = PreprocessingANN(
        AlignmentLayer(top.positions, align_indices=list(range(n_atoms))),
        FeatureLayer([
            Feature("phi", "dihedral", quads[0]),
            Feature("psi", "dihedral", quads[1]),
            Feature("pos", "position", list(range(n_atoms))),
        ]),
    )
    d_r = 4 + 3 * n_atoms

    # ---- torch mini-molann with the IDENTICAL contract
    class MiniMolannPP(torch.nn.Module):
        """AlignmentLayer (subset Kabsch, SVD form) + FeatureLayer
        ([dihedral..., position]) exactly as ops/alignment.py
        align_frames and ops/features.py _eval_feature define them."""

        def __init__(self, ref_pos, align_idx, quadruples, pos_idx):
            super().__init__()
            ref = torch.as_tensor(np.asarray(ref_pos),
                                  dtype=torch.get_default_dtype())
            ref = ref[align_idx]
            self.register_buffer(
                "ref_c", ref - ref.mean(0, keepdim=True)
            )
            self.align_idx = align_idx
            self.quadruples = quadruples
            self.pos_idx = pos_idx

        def forward(self, x):  # [B, N, 3]
            x = x.to(self.ref_c.dtype)
            sel = x[:, self.align_idx]
            com = sel.mean(1, keepdim=True)
            xc = x - com
            selc = sel - com
            C = torch.einsum("bmi,mj->bij", selc, self.ref_c)
            U, S, Vt = torch.linalg.svd(C)
            det = torch.det(torch.bmm(U, Vt))
            D = torch.stack(
                [torch.ones_like(det), torch.ones_like(det), det], -1
            )
            R = torch.einsum("bij,bj,bjk->bik", U, D, Vt)
            aligned = torch.einsum("bni,bij->bnj", xc, R)
            feats = []
            for (a, b, c, d) in self.quadruples:
                b1 = aligned[:, b] - aligned[:, a]
                b2 = aligned[:, c] - aligned[:, b]
                b3 = aligned[:, d] - aligned[:, c]
                n1 = torch.cross(b1, b2, dim=1)
                n2 = torch.cross(b2, b3, dim=1)
                m1 = torch.cross(
                    n1, b2 / b2.norm(dim=1, keepdim=True), dim=1
                )
                cosv = (n1 * n2).sum(1)
                sinv = (m1 * n2).sum(1)
                norm = torch.sqrt(cosv**2 + sinv**2)
                feats.append(torch.stack(
                    [cosv / norm, sinv / norm], dim=1
                ))
            feats.append(
                aligned[:, self.pos_idx].reshape(x.shape[0], -1)
            )
            return torch.cat(feats, dim=1)

    pp_t = MiniMolannPP(
        top.positions, list(range(n_atoms)), quads, list(range(n_atoms))
    )

    # ---- direct preprocessing parity (the canary before co-training):
    # QCP quaternion (ours) vs SVD Kabsch (torch) on identical frames
    probe = frames[:256]
    f_j = np.asarray(pp_j(probe))
    with torch.no_grad():
        f_t = pp_t(torch.from_numpy(probe)).numpy()
    assert f_j.shape == (256, d_r)
    np.testing.assert_allclose(f_j, f_t, atol=5e-4)

    # ---- co-train both frameworks through their full paths
    dims = [d_r, 20, 20, 20, 1]
    task_j, task_t = _train_pair(
        reference, tmp_path, frames, w, dt=10.0, dims=dims, k=2,
        lag_tau=50.0, num_epochs=150, batch_size=2000, alpha=20.0,
        eig_weights=[1.0, 1.0], beta=1.0, split_seed=77, model_seed=5,
        tag="fullpp", pp_j=pp_j, pp_t=pp_t,
    )

    # the CV field over the trajectory's configurations (test split
    # held out from training; both tasks saw identical train frames)
    cv_j, cv_t = _cv_fields(task_j, task_t, frames.astype(np.float64))
    corrs, perm = _aligned_correlations(cv_j, cv_t)
    assert np.all(corrs > 0.99), (corrs, perm)

    # and BOTH recovered the planted psi mode: the leading head tracks
    # cos/sin psi (the dipeptide example's own validation criterion)
    basis = np.stack(
        [np.ones(n), np.cos(psi_planted), np.sin(psi_planted)], axis=1
    )
    for cv in (cv_j, cv_t):
        best = 0.0
        for h in range(cv.shape[1]):
            coef, *_ = np.linalg.lstsq(basis, cv[:, h], rcond=None)
            fit = basis @ coef
            r = abs(np.corrcoef(fit, cv[:, h])[0, 1])
            best = max(best, r)
        assert best > 0.6, best
