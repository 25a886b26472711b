"""PLUMED interop: HILLS parsing (incl. the file our own metadynamics
writer emits), and generalized frame reweighting for arbitrary
COLVAR-style frames against an external HILLS file."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from colvarsfinder_tpu.utils import (
    PlumedHills,
    integrate_sde_metadynamics,
    metad_frame_weights,
    read_plumed_hills,
)


class DoubleWell1D:
    dim = 1
    beta = 6.0

    def V(self, x):
        return (x[0] ** 2 - 1.0) ** 2


@pytest.fixture(scope="module")
def metad_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plumed"))
    res = integrate_sde_metadynamics(
        DoubleWell1D(), lambda x: x[:1], n_steps=20_000,
        sampling_output_path=out, X0=np.asarray([1.0]), step_size=0.002,
        deposit_interval=100, hill_height=0.25, hill_width=0.15,
        bias_factor=8.0, seed=3, verbose=False,
    )
    return res, out


def test_read_own_hills_file(metad_run):
    res, out = metad_run
    hills = read_plumed_hills(os.path.join(out, "HILLS"))
    assert hills.n_hills == len(res.hill_heights)
    np.testing.assert_allclose(hills.centers[:, 0],
                               res.hill_centers[:, 0], atol=1e-5)
    np.testing.assert_allclose(hills.heights, res.hill_heights, rtol=1e-4)
    np.testing.assert_allclose(hills.sigmas, 0.15, atol=1e-7)
    assert hills.bias_factor == pytest.approx(8.0)
    # final bias agrees with the result object's
    s = np.linspace(-1.5, 1.5, 11)
    np.testing.assert_allclose(hills.bias(s), res.bias(s), rtol=1e-4)


def test_generalized_weights_match_result_method(metad_run):
    """metad_frame_weights on the deposition frames reproduces
    MetadynamicsResult.frame_weights for both estimators."""
    res, out = metad_run
    hills = read_plumed_hills(os.path.join(out, "HILLS"))
    for method in ("final-bias", "tiwary"):
        ref = res.frame_weights(method=method)
        got = metad_frame_weights(
            res.cv_values, hills, frame_times=hills.times, beta=res.beta,
            method=method,
        )
        np.testing.assert_allclose(got, ref, rtol=2e-4)


def test_denser_colvar_frames(metad_run):
    """Frames BETWEEN depositions (a PLUMED COLVAR sampled more often
    than PACE) reweight sensibly: mean-one, finite, and frames at
    high-bias CV values carry larger weights."""
    res, out = metad_run
    hills = read_plumed_hills(os.path.join(out, "HILLS"))
    rng = np.random.default_rng(0)
    t_max = hills.times[-1]
    times = np.sort(rng.uniform(0, t_max, 3000))
    cv = rng.uniform(-1.4, 1.4, 3000)
    w = metad_frame_weights(cv, hills, frame_times=times,
                            beta=res.beta, method="tiwary")
    assert w.shape == (3000,)
    assert np.isfinite(w).all()
    assert w.mean() == pytest.approx(1.0, abs=1e-10)
    # late frames at the bias maximum vs late frames far from hills
    late = times > 0.8 * t_max
    vb = hills.bias(cv)
    hi = late & (vb > np.quantile(vb[late], 0.8))
    lo = late & (vb < np.quantile(vb[late], 0.2))
    assert w[hi].mean() > w[lo].mean()


def test_tiwary_requires_times(metad_run):
    res, out = metad_run
    hills = read_plumed_hills(os.path.join(out, "HILLS"))
    with pytest.raises(ValueError, match="frame_times"):
        metad_frame_weights(res.cv_values, hills, beta=res.beta)


def test_parse_real_plumed_layout(tmp_path):
    """A hand-written file in genuine PLUMED style: restart blocks,
    multi-dimensional CV, per-hill sigmas, biasf column of 1 (standard
    metadynamics convention)."""
    path = str(tmp_path / "HILLS")
    with open(path, "w") as f:
        f.write("#! FIELDS time phi psi sigma_phi sigma_psi height biasf\n")
        f.write("#! SET multivariate false\n")
        f.write("1.0  0.5 -0.2  0.3 0.35  1.2  1\n")
        f.write("2.0  0.6 -0.1  0.3 0.35  1.1  1\n")
        # PLUMED restart: the header repeats
        f.write("#! FIELDS time phi psi sigma_phi sigma_psi height biasf\n")
        f.write("3.0  0.7  0.0  0.3 0.35  1.0  1\n")
    hills = read_plumed_hills(path)
    assert hills.n_hills == 3
    assert hills.centers.shape == (3, 2)
    np.testing.assert_allclose(hills.sigmas[0], [0.3, 0.35])
    np.testing.assert_allclose(hills.times, [1.0, 2.0, 3.0])
    assert hills.bias_factor is None  # biasf == 1 -> standard

    # headerless file: dimensionality inferred from column count
    path2 = str(tmp_path / "HILLS2")
    with open(path2, "w") as f:
        f.write("1.0  0.5  0.3  1.2  10\n")
        f.write("2.0  0.6  0.3  1.1  10\n")
    h2 = read_plumed_hills(path2)
    assert h2.centers.shape == (2, 1)
    assert h2.bias_factor == pytest.approx(10.0)


def test_parse_errors(tmp_path):
    p = str(tmp_path / "empty")
    open(p, "w").close()
    with pytest.raises(ValueError, match="no hill rows"):
        read_plumed_hills(p)
    p2 = str(tmp_path / "badcols")
    with open(p2, "w") as f:
        f.write("1.0 2.0 3.0 4.0\n")  # even column count: ambiguous
    with pytest.raises(ValueError, match="infer"):
        read_plumed_hills(p2)


def test_standard_metadynamics_weights(tmp_path):
    """Non-tempered hills (bias_factor None) go through the gamma->inf
    Tiwary limit without error."""
    hills = PlumedHills(
        times=np.array([1.0, 2.0, 3.0]),
        centers=np.array([[0.0], [0.5], [1.0]]),
        sigmas=np.full((3, 1), 0.3),
        heights=np.array([0.2, 0.2, 0.2]),
        bias_factor=None,
    )
    w = metad_frame_weights(
        np.array([0.0, 0.5, 1.0, 2.0]), hills,
        frame_times=np.array([1.5, 2.5, 3.5, 3.5]), beta=2.0,
        method="tiwary",
    )
    assert np.isfinite(w).all() and w.mean() == pytest.approx(1.0)


def test_read_colvar(tmp_path):
    from colvarsfinder_tpu.utils import read_plumed_colvar

    path = str(tmp_path / "COLVAR")
    with open(path, "w") as f:
        f.write("#! FIELDS time phi psi metad.bias\n")
        f.write("0.0  0.1 -0.5  0.0\n")
        f.write("0.5  0.2 -0.4  0.3\n")
        f.write("#! FIELDS time phi psi metad.bias\n")  # restart
        f.write("1.0  0.3 -0.3  0.6\n")
    t, vals, names = read_plumed_colvar(path)
    np.testing.assert_allclose(t, [0.0, 0.5, 1.0])
    assert names == ["phi", "psi", "metad.bias"]
    assert vals.shape == (3, 3)
    # column selection
    t2, v2, n2 = read_plumed_colvar(path, fields=["psi"])
    np.testing.assert_allclose(v2[:, 0], [-0.5, -0.4, -0.3])
    with pytest.raises(ValueError, match="not present"):
        read_plumed_colvar(path, fields=["chi"])
    bad = str(tmp_path / "noheader")
    with open(bad, "w") as f:
        f.write("0.0 1.0\n")
    with pytest.raises(ValueError, match="FIELDS"):
        read_plumed_colvar(bad)
