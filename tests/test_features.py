"""Feature transform and Kabsch alignment tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from colvarsfinder_tpu.ops import (
    AlignmentLayer,
    Feature,
    FeatureLayer,
    Identity,
    PreprocessingANN,
    align_frames,
    dihedral_angle,
    kabsch_rotations_quat,
    kabsch_rotations_svd,
)
from colvarsfinder_tpu.ops.alignment import _cross_covariances


def _random_rotations(n, rng):
    """Uniform-ish random rotations via QR with det fix."""
    rots = []
    for _ in range(n):
        A = rng.standard_normal((3, 3))
        Q, R = np.linalg.qr(A)
        Q = Q * np.sign(np.diag(R))
        if np.linalg.det(Q) < 0:
            Q[:, 0] = -Q[:, 0]
        rots.append(Q)
    return np.stack(rots)


def test_feature_position():
    f = Feature("p", "position", [0, 2])
    layer = FeatureLayer([f])
    x = np.arange(2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3)
    out = np.asarray(layer(jnp.asarray(x)))
    assert out.shape == (2, 6)
    np.testing.assert_allclose(out[0], x[0, [0, 2]].reshape(-1))
    assert layer.output_dimension == 6


def test_feature_bond():
    f = Feature("b", "bond", [0, 1])
    layer = FeatureLayer([f])
    x = np.zeros((1, 2, 3), dtype=np.float32)
    x[0, 1] = [3.0, 4.0, 0.0]
    out = np.asarray(layer(jnp.asarray(x)))
    np.testing.assert_allclose(out, [[5.0]], rtol=1e-6)


def test_feature_angle():
    f = Feature("a", "angle", [0, 1, 2])
    layer = FeatureLayer([f])
    # 90-degree angle at atom 1
    x = np.asarray([[[1, 0, 0], [0, 0, 0], [0, 1, 0]]], dtype=np.float32)
    out = np.asarray(layer(jnp.asarray(x)))
    np.testing.assert_allclose(out, [[0.0]], atol=1e-6)
    f2 = Feature("a", "angle_rad", [0, 1, 2])
    out2 = np.asarray(FeatureLayer([f2])(jnp.asarray(x)))
    np.testing.assert_allclose(out2, [[np.pi / 2]], rtol=1e-6)


def test_feature_dihedral_sign_convention():
    # staggered butane-like configuration with known +90 deg torsion
    x = np.asarray(
        [[[0, 1, 0], [0, 0, 0], [1, 0, 0], [1, 0, 1]]], dtype=np.float32
    )
    phi = np.asarray(
        dihedral_angle(
            jnp.asarray(x[:, 0]), jnp.asarray(x[:, 1]),
            jnp.asarray(x[:, 2]), jnp.asarray(x[:, 3]),
        )
    )
    assert abs(abs(phi[0]) - np.pi / 2) < 1e-6
    f = Feature("d", "dihedral", [0, 1, 2, 3])
    out = np.asarray(FeatureLayer([f])(jnp.asarray(x)))
    np.testing.assert_allclose(out[0, 0], np.cos(phi[0]), atol=1e-6)
    np.testing.assert_allclose(out[0, 1], np.sin(phi[0]), atol=1e-6)


def test_feature_dihedral_vs_numpy_oracle(rng):
    """Random configurations against the classic atan2 torsion formula."""
    x = rng.standard_normal((16, 4, 3)).astype(np.float32)
    phi = np.asarray(
        dihedral_angle(
            jnp.asarray(x[:, 0]), jnp.asarray(x[:, 1]),
            jnp.asarray(x[:, 2]), jnp.asarray(x[:, 3]),
        )
    )
    # oracle
    b1 = x[:, 1] - x[:, 0]
    b2 = x[:, 2] - x[:, 1]
    b3 = x[:, 3] - x[:, 2]
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    m1 = np.cross(n1, b2 / np.linalg.norm(b2, axis=1, keepdims=True))
    xx = (n1 * n2).sum(1)
    yy = (m1 * n2).sum(1)
    ref = np.arctan2(yy, xx)
    np.testing.assert_allclose(phi, ref, rtol=1e-4, atol=1e-5)


def test_feature_arity_validation():
    with pytest.raises(ValueError):
        Feature("b", "bond", [0, 1, 2])
    with pytest.raises(ValueError):
        Feature("x", "nonsense", [0])


def test_switching_rational_values_and_limits():
    from colvarsfinder_tpu.ops import switching_rational

    # closed form away from x = 1
    r = jnp.asarray([0.15, 0.45, 0.9])
    s = np.asarray(switching_rational(r, 0.3, 0.0, 6, 12))
    xx = np.asarray([0.5, 1.5, 3.0])
    np.testing.assert_allclose(
        s, (1 - xx**6) / (1 - xx**12), rtol=1e-6
    )
    # clamp region r <= d0 -> exactly 1, with zero gradient
    assert float(switching_rational(jnp.asarray(0.01), 0.3, 0.05)) == 1.0
    g = jax.grad(lambda rr: switching_rational(rr, 0.3, 0.05))(
        jnp.asarray(0.01)
    )
    assert float(g) == 0.0
    # removable singularity at x = 1: value nn/mm, finite analytic slope
    s1 = switching_rational(jnp.asarray(0.3), 0.3, 0.0, 6, 12)
    assert abs(float(s1) - 0.5) < 1e-6
    g1 = jax.grad(lambda rr: switching_rational(rr, 0.3, 0.0, 6, 12))(
        jnp.asarray(0.3)
    )
    # d/dr at r = r0: nn(nn-mm)/(2 mm) / r0 = 6*(-6)/24 / 0.3 = -5
    np.testing.assert_allclose(float(g1), -5.0, rtol=1e-4)


def test_contact_and_coordination_features():
    from colvarsfinder_tpu.ops import coordination_pairs

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 6, 3)).astype(np.float32) * 0.4

    def sw(r, r0, d0, nn, mm):
        xx = max(0.0, (r - d0) / r0)
        return (1 - xx**nn) / (1 - xx**mm) if abs(xx - 1) > 1e-12 else nn / mm

    pairs = coordination_pairs([0, 1], [1, 4, 5])
    assert pairs == (0, 1, 0, 4, 0, 5, 1, 4, 1, 5)  # self-pair (1,1) skipped
    layer = FeatureLayer(
        [
            Feature("c", "contact", [2, 3], params={"r0": 0.5}),
            Feature(
                "cn", "coordination", pairs,
                params={"r0": 0.3, "d0": 0.1, "nn": 8, "mm": 14},
            ),
        ]
    )
    assert layer.output_dimension == 2
    out = np.asarray(layer(jnp.asarray(x)))
    for b in range(4):
        want_c = sw(np.linalg.norm(x[b, 3] - x[b, 2]), 0.5, 0.0, 6, 12)
        want_n = sum(
            sw(np.linalg.norm(x[b, j] - x[b, i]), 0.3, 0.1, 8, 14)
            for i, j in np.asarray(pairs).reshape(-1, 2)
        )
        np.testing.assert_allclose(out[b], [want_c, want_n], rtol=1e-5)

    # gradients: jacrev vs the analytic chain (numpy oracle)
    def sw_dr(r, r0, d0, nn, mm):
        xx = (r - d0) / r0
        if xx <= 0:
            return 0.0
        num = -nn * xx ** (nn - 1) * (1 - xx**mm) + mm * xx ** (mm - 1) * (
            1 - xx**nn
        )
        return num / (1 - xx**mm) ** 2 / r0

    jac = np.asarray(jax.jacrev(lambda xx: layer(xx).sum(0))(jnp.asarray(x)))
    b = 1
    # contact (2, 3): dcv0/dx_3 = sw'(r) * (x3 - x2)/r
    d23 = x[b, 3] - x[b, 2]
    r23 = np.linalg.norm(d23)
    np.testing.assert_allclose(
        jac[0, b, 3], sw_dr(r23, 0.5, 0.0, 6, 12) * d23 / r23,
        rtol=1e-4, atol=1e-6,
    )
    # coordination: atom 4 appears in pairs (0,4) and (1,4)
    want = np.zeros(3)
    for i in (0, 1):
        dv = x[b, 4] - x[b, i]
        rr = np.linalg.norm(dv)
        want += sw_dr(rr, 0.3, 0.1, 8, 14) * dv / rr
    np.testing.assert_allclose(jac[1, b, 4], want, rtol=1e-4, atol=1e-6)


def test_minimum_image_pair_features():
    """FeatureLayer(box=...) applies the minimum-image convention to
    bond/contact/coordination; angles and positions are untouched."""
    from colvarsfinder_tpu.ops import minimum_image

    box = np.array([2.0, 2.5, 3.0])
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1.8, size=(6, 4, 3)).astype(np.float32)
    x[:, 1, 0] = 1.95
    x[:, 0, 0] = 0.05  # pair (0, 1) wraps across the x face

    feats = [
        Feature("b", "bond", [0, 1]),
        Feature("c", "contact", [0, 1], params={"r0": 0.3}),
        Feature("a", "angle", [0, 2, 3]),
    ]
    lay_pbc = FeatureLayer(feats, box=tuple(box))
    lay_raw = FeatureLayer(feats)
    out_p = np.asarray(lay_pbc(jnp.asarray(x)))
    out_r = np.asarray(lay_raw(jnp.asarray(x)))

    d = x[:, 1] - x[:, 0]
    d_mic = d - box * np.round(d / box)
    r_mic = np.linalg.norm(d_mic, axis=-1)
    np.testing.assert_allclose(out_p[:, 0], r_mic, rtol=1e-5)
    assert (out_p[:, 0] < out_r[:, 0]).all()  # imaging shortened the pair
    assert (out_p[:, 1] > out_r[:, 1]).all()  # so the contact strengthens
    np.testing.assert_allclose(out_p[:, 2], out_r[:, 2], rtol=1e-6)  # angle

    # helper matches, gradient flows through the (locally constant) shift
    np.testing.assert_allclose(
        np.asarray(minimum_image(jnp.asarray(d), box)), d_mic, rtol=1e-5
    )
    g = jax.grad(lambda xx: lay_pbc(xx)[:, 0].sum())(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(g)[:, 1], d_mic / r_mic[:, None], rtol=1e-4
    )
    # jit with the box as static aux
    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda xx: lay_pbc(xx))(jnp.asarray(x))),
        out_p, rtol=1e-6,
    )
    with pytest.raises(ValueError):
        FeatureLayer(feats, box=(2.0, -1.0, 3.0))


def test_feature_wrap_invariance():
    """With a box, pair-distance features are invariant to wrapping the
    coordinates into the box — training on wrapped MD output matches
    training on whole/unwrapped coordinates (true pair spans < L/2)."""
    box = np.array([1.0, 1.2, 1.4])
    rng = np.random.default_rng(8)
    # a compact cluster far outside the box (several images away)
    x = rng.normal(5.0, 0.05, size=(16, 5, 3)).astype(np.float32)
    xw = np.mod(x, box).astype(np.float32)
    assert not np.allclose(x, xw)
    layer = FeatureLayer(
        [
            Feature("c", "contact", [0, 1], params={"r0": 0.2}),
            Feature("b", "bond", [2, 4]),
            Feature(
                "cn", "coordination", (0, 2, 1, 3),
                params={"r0": 0.15, "nn": 4},
            ),
        ],
        box=tuple(box),
    )
    np.testing.assert_allclose(
        np.asarray(layer(jnp.asarray(xw))),
        np.asarray(layer(jnp.asarray(x))),
        rtol=1e-4, atol=1e-6,
    )


def test_switch_feature_validation():
    with pytest.raises(ValueError):  # r0 required
        Feature("c", "contact", [0, 1])
    with pytest.raises(ValueError):  # odd pair list
        Feature("cn", "coordination", [0, 1, 2], params={"r0": 1.0})
    with pytest.raises(ValueError):  # mm must exceed nn
        Feature("c", "contact", [0, 1], params={"r0": 1.0, "nn": 6, "mm": 6})
    with pytest.raises(ValueError):  # params only on switch types
        Feature("b", "bond", [0, 1], params={"r0": 1.0})
    # defaults fill in: d0=0, nn=6, mm=2*nn
    f = Feature("c", "contact", [0, 1], params={"r0": 0.4, "nn": 5})
    assert f.switch_params == {"r0": 0.4, "d0": 0.0, "nn": 5, "mm": 10}


def _tripeptide_topology():
    """Minimal 3-residue backbone topology (+ a water) for the builders."""
    from colvarsfinder_tpu.utils.io import Topology

    names, resids, resnames = [], [], []
    for r in (1, 2, 3):
        for n in ("N", "H", "CA", "HA", "C", "O", "CB"):
            names.append(n)
            resids.append(r)
            resnames.append("ALA")
    names += ["OW", "HW1", "HW2"]
    resids += [4, 4, 4]
    resnames += ["SOL"] * 3
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((len(names), 3)).astype(np.float32) * 0.3
    return Topology(
        names=names, resids=resids, resnames=resnames, positions=pos
    )


def test_backbone_dihedrals_builder():
    from colvarsfinder_tpu.ops import backbone_dihedrals

    top = _tripeptide_topology()
    feats = backbone_dihedrals(top.atoms)
    # 3 residues -> phi_2, phi_3 and psi_1, psi_2 (termini lack partners)
    assert sorted(f.name for f in feats) == [
        "phi_2", "phi_3", "psi_1", "psi_2",
    ]
    by_name = {f.name: f for f in feats}
    gi = {
        (r, n): i
        for i, (n, r) in enumerate(zip(top.names, top.resids))
    }
    # phi(2) = C(1), N(2), CA(2), C(2)
    assert by_name["phi_2"].atom_indices == (
        gi[(1, "C")], gi[(2, "N")], gi[(2, "CA")], gi[(2, "C")]
    )
    # psi(1) = N(1), CA(1), C(1), N(2)
    assert by_name["psi_1"].atom_indices == (
        gi[(1, "N")], gi[(1, "CA")], gi[(1, "C")], gi[(2, "N")]
    )
    assert all(f.feature_type == "dihedral" for f in feats)
    # the layer remaps global -> relative through a selection
    sel = top.select_atoms("not resname SOL")
    layer = FeatureLayer(feats, input_ag=sel)
    x = np.asarray(top.positions[sel.ix])[None]
    out = np.asarray(layer(jnp.asarray(x)))
    assert out.shape == (1, 2 * len(feats)) and np.isfinite(out).all()
    # waters never produce torsions
    with pytest.raises(ValueError):
        backbone_dihedrals(top.select_atoms("resname SOL"))


def test_heavy_atom_contacts_builder():
    from colvarsfinder_tpu.ops import heavy_atom_contacts

    top = _tripeptide_topology()
    ag = top.select_atoms("not resname SOL")
    feats = heavy_atom_contacts(ag, r0=0.5, min_resid_sep=2, cutoff=None)
    assert all(f.feature_type == "contact" for f in feats)
    names = set(top.names[i] for f in feats for i in f.atom_indices)
    assert not any(n.startswith("H") for n in names)  # hydrogens filtered
    resid_of = dict(enumerate(top.resids))
    for f in feats:
        i, j = f.atom_indices
        assert abs(resid_of[i] - resid_of[j]) >= 2  # sep filter
        assert f.switch_params["r0"] == 0.5
    # heavy atoms per residue = 5 (N, CA, C, O, CB); only resid pairs
    # (1, 3) survive min_resid_sep=2 -> 25 pairs
    assert len(feats) == 25

    # reference-structure cutoff prunes pairs
    some = heavy_atom_contacts(ag, r0=0.5, min_resid_sep=2, cutoff=0.6)
    assert 0 < len(some) < len(feats)

    # pooled coordination variant: one feature, value = sum of switches
    pooled = heavy_atom_contacts(
        ag, r0=0.5, min_resid_sep=2, as_coordination=True
    )
    assert len(pooled) == 1
    assert pooled[0].feature_type == "coordination"
    layer_pp = FeatureLayer(feats, input_ag=top.atoms)
    layer_cn = FeatureLayer(pooled, input_ag=top.atoms)
    x = np.asarray(top.positions)[None]
    per_pair = np.asarray(layer_pp(jnp.asarray(x)))
    total = np.asarray(layer_cn(jnp.asarray(x)))
    np.testing.assert_allclose(total[0, 0], per_pair.sum(), rtol=1e-5)

    with pytest.raises(ValueError):  # everything filtered away
        heavy_atom_contacts(ag, min_resid_sep=10)


def test_multi_feature_concat():
    feats = [
        Feature("p", "position", [0]),
        Feature("b", "bond", [0, 1]),
        Feature("d", "dihedral", [0, 1, 2, 3]),
    ]
    layer = FeatureLayer(feats)
    assert layer.output_dimension == 3 + 1 + 2
    x = np.random.default_rng(0).standard_normal((5, 4, 3)).astype(np.float32)
    out = layer(jnp.asarray(x))
    assert out.shape == (5, 6)


# ---------------------------------------------------------------------------
# Kabsch alignment
# ---------------------------------------------------------------------------


def test_kabsch_svd_recovers_known_rotation(rng):
    """Frames that are exact rotations+translations of the reference must be
    mapped back onto it."""
    m, B = 7, 12
    ref = rng.standard_normal((m, 3)).astype(np.float32)
    ref -= ref.mean(0)
    rots = _random_rotations(B, rng).astype(np.float32)
    shifts = rng.standard_normal((B, 1, 3)).astype(np.float32) * 5
    # frame = ref @ R + t (row-vector rotation)
    frames = np.einsum("mi,bij->bmj", ref, rots) + shifts

    aligned = np.asarray(
        align_frames(
            jnp.asarray(frames), jnp.asarray(ref),
            jnp.arange(m, dtype=jnp.int32),
        )
    )
    np.testing.assert_allclose(
        aligned, np.broadcast_to(ref, (B, m, 3)), atol=2e-4
    )


def test_kabsch_rotation_properties(rng):
    B = 20
    C = rng.standard_normal((B, 3, 3)).astype(np.float32)
    R = np.asarray(kabsch_rotations_svd(jnp.asarray(C)))
    # orthogonal with det +1
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (B, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(B), atol=1e-5)


def test_kabsch_quaternion_matches_svd(rng):
    """Horn quaternion (Pallas-oracle path) must agree with SVD Kabsch."""
    m, B = 6, 16
    ref = rng.standard_normal((m, 3)).astype(np.float32)
    ref -= ref.mean(0)
    frames = (
        np.broadcast_to(ref, (B, m, 3))
        + 0.3 * rng.standard_normal((B, m, 3))
    ).astype(np.float32)
    frames_c = frames - frames.mean(1, keepdims=True)
    C = _cross_covariances(jnp.asarray(frames_c), jnp.asarray(ref))
    R_svd = np.asarray(kabsch_rotations_svd(C))
    R_quat = np.asarray(kabsch_rotations_quat(C))
    np.testing.assert_allclose(R_quat, R_svd, atol=5e-4)


@pytest.mark.slow
def test_implicit_newton_derivative_parity(rng):
    """QCP implicit differentiation (stop-gradient convergence + short
    differentiable tail, ops/alignment.py:newton_diff_mode) must match the
    SVD oracle's value, gradient, AND hessian-vector product — the
    generator loss double-backprops through alignment."""
    from colvarsfinder_tpu.ops.alignment import align_frames, newton_diff_mode

    m, B = 7, 6
    ref = rng.standard_normal((m, 3))
    ref -= ref.mean(0)
    refj = jnp.asarray(ref, dtype=jnp.float32)
    x = jnp.asarray(
        ref[None] + 0.3 * rng.standard_normal((B, m, 3)), dtype=jnp.float32
    )
    idx = jnp.arange(m)

    def scalar(xx, method):
        out = align_frames(xx, refj, idx, method=method)
        return (jnp.sin(out) * jnp.cos(out[..., ::-1])).sum()

    v = jnp.asarray(rng.standard_normal(x.shape), dtype=jnp.float32)
    with newton_diff_mode(2):
        val_q = scalar(x, "quaternion")
        g_q = jax.grad(scalar)(x, "quaternion")
        h_q = jax.jvp(
            jax.grad(lambda xx: scalar(xx, "quaternion")), (x,), (v,)
        )[1]
    val_s = scalar(x, "svd")
    g_s = jax.grad(scalar)(x, "svd")
    h_s = jax.jvp(jax.grad(lambda xx: scalar(xx, "svd")), (x,), (v,))[1]
    np.testing.assert_allclose(float(val_q), float(val_s), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(g_s), atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_s), atol=2e-3)


def test_alignment_layer_and_differentiability(rng):
    m = 5
    ref = rng.standard_normal((m, 3)).astype(np.float32)
    layer = AlignmentLayer(ref, align_indices=list(range(m)))
    x = (ref[None] + 0.1 * rng.standard_normal((4, m, 3))).astype(np.float32)
    out = layer(jnp.asarray(x))
    assert out.shape == (4, m, 3)

    # input gradients flow through the SVD (needed by generator loss)
    def scalar(frame):
        return layer(frame[None])[0].sum()

    g = jax.grad(scalar)(jnp.asarray(x[0]))
    assert np.isfinite(np.asarray(g)).all()


def test_alignment_invariance_property(rng):
    """Aligned output must be invariant to rigid motion of the input —
    the whole point of the layer."""
    m = 6
    ref = rng.standard_normal((m, 3)).astype(np.float32)
    layer = AlignmentLayer(ref, align_indices=list(range(m)))
    x = (ref[None] + 0.2 * rng.standard_normal((1, m, 3))).astype(np.float32)
    R = _random_rotations(1, rng)[0].astype(np.float32)
    t = np.asarray([1.0, -2.0, 0.5], dtype=np.float32)
    x_moved = np.einsum("bmi,ij->bmj", x, R) + t
    out1 = np.asarray(layer(jnp.asarray(x)))
    out2 = np.asarray(layer(jnp.asarray(x_moved)))
    np.testing.assert_allclose(out1, out2, atol=2e-4)


def test_alignment_layer_mass_weighted(rng):
    """align_weights plumbs through __call__: the layer must reproduce
    weighted align_frames, be rigid-motion invariant, and differ from the
    unweighted result for non-uniform weights."""
    m = 6
    ref = rng.standard_normal((m, 3)).astype(np.float32)
    masses = np.asarray([12.0, 1.0, 1.0, 14.0, 16.0, 12.0], np.float32)
    layer_w = AlignmentLayer(
        ref, align_indices=list(range(m)), align_weights=masses
    )
    layer_u = AlignmentLayer(ref, align_indices=list(range(m)))
    x = (ref[None] + 0.2 * rng.standard_normal((4, m, 3))).astype(np.float32)

    out_w = np.asarray(layer_w(jnp.asarray(x)))
    expect = np.asarray(align_frames(
        jnp.asarray(x), layer_w.ref_centered, layer_w.align_idx,
        align_weights=jnp.asarray(masses),
    ))
    np.testing.assert_allclose(out_w, expect, atol=1e-6)
    # non-uniform weights change the alignment
    assert np.abs(out_w - np.asarray(layer_u(jnp.asarray(x)))).max() > 1e-3

    # invariance to rigid motion still holds under weighting
    R = _random_rotations(1, rng)[0].astype(np.float32)
    t = np.asarray([0.3, -1.0, 2.0], dtype=np.float32)
    moved = np.einsum("bmi,ij->bmj", x, R) + t
    np.testing.assert_allclose(
        out_w, np.asarray(layer_w(jnp.asarray(moved))), atol=2e-4
    )

    # uniform weights reduce to the unweighted alignment
    layer_1 = AlignmentLayer(
        ref, align_indices=list(range(m)),
        align_weights=np.full(m, 3.0, np.float32),
    )
    np.testing.assert_allclose(
        np.asarray(layer_1(jnp.asarray(x))),
        np.asarray(layer_u(jnp.asarray(x))), atol=1e-5,
    )


def test_preprocessing_ann_composition(rng):
    m = 4
    ref = rng.standard_normal((m, 3)).astype(np.float32)
    align = AlignmentLayer(ref, align_indices=list(range(m)))
    feat = FeatureLayer([Feature("p", "position", list(range(m)))])
    pp = PreprocessingANN(align, feat)
    assert pp.output_dimension == 12
    x = rng.standard_normal((3, m, 3)).astype(np.float32)
    out = pp(jnp.asarray(x))
    assert out.shape == (3, 12)
    # None alignment = features only
    pp2 = PreprocessingANN(None, feat)
    np.testing.assert_allclose(
        np.asarray(pp2(jnp.asarray(x))), x.reshape(3, -1), atol=1e-6
    )


def test_feature_layer_remaps_global_indices():
    """molann semantics: Features referencing global topology indices are
    remapped to columns of the input atom list when input_ag is given."""

    class AG:
        def __init__(self, ix):
            self.ix = np.asarray(ix)

    input_ag = AG([4, 7, 9, 12])  # global indices of the 4 input atoms
    f = Feature("b", "bond", [7, 12])  # global indices
    layer = FeatureLayer([f], input_ag=input_ag)
    assert layer.feature_list[0].atom_indices == (1, 3)

    x = np.zeros((1, 4, 3), dtype=np.float32)
    x[0, 3] = [0.0, 3.0, 4.0]
    out = np.asarray(layer(jnp.asarray(x)))
    np.testing.assert_allclose(out, [[5.0]], rtol=1e-6)

    with pytest.raises(ValueError, match="not part of input_ag"):
        FeatureLayer([Feature("b", "bond", [7, 99])], input_ag=input_ag)
