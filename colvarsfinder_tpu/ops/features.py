r"""Molecular feature transforms (preprocessing layers).

Native TPU equivalents of the external ``molann`` package's preprocessing
layers, whose usage contract is exercised by the reference's dipeptide
example (reference: examples/dipeptide/main.ipynb cells 0, 10, 12; see
SURVEY.md §2.8): ``Feature``, ``FeatureLayer``, ``AlignmentLayer`` (in
:mod:`colvarsfinder_tpu.ops.alignment`) and ``PreprocessingANN``.

All layers are parameter-free pytrees — pure, differentiable functions of
the input coordinates, applied batched under jit/vmap. Differentiability
w.r.t. the *input* is required because generator-loss input gradients flow
through the preprocessing layer (reference: colvarsfinder/core.py:403,424).

Feature conventions (bounded, smooth encodings — the standard choice for
NN inputs):

==================  ==============  =======================================
type                output dim      value
==================  ==============  =======================================
``position``        3 * n_atoms     flattened coordinates
``bond``            1               distance |r_ab|
``angle``           1               cosine of the angle a-b-c
``dihedral``        2               (cos φ, sin φ) of the torsion a-b-c-d
``contact``         1               rational switching s(|r_ab|)
``coordination``    1               Σ_pairs s(|r_ab|) over an explicit
                                    pair list (PLUMED ``COORDINATION``
                                    with ``PAIR`` semantics)
==================  ==============  =======================================

Raw-angle variants ``angle_rad`` / ``dihedral_rad`` (radians, via atan2)
are provided for analysis code such as Ramachandran plots.

``contact`` / ``coordination`` use PLUMED's RATIONAL switching function

.. math:: s(r) = \frac{1 - x^{n}}{1 - x^{m}}, \qquad x = \max(0, (r - d_0)/r_0)

with defaults :math:`n = 6`, :math:`m = 2n`, :math:`d_0 = 0` (s = 1 for
r ≤ d0; the removable x = 1 singularity is evaluated by series). Pass
``params=dict(r0=..., d0=..., nn=..., mm=...)`` to :class:`Feature`
(``r0`` required). These are the standard smooth, bounded contact-map
inputs of the deep-TICA / VAMPnet literature; no reference counterpart
(molann has none) — a beyond-inventory extension.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Feature",
    "FeatureLayer",
    "PreprocessingANN",
    "Identity",
    "Lambda",
    "as_pp_layer",
    "bond_length",
    "bend_angle_cos",
    "bend_angle",
    "dihedral_angle",
    "dihedral_cos_sin",
    "switching_rational",
    "coordination_pairs",
    "minimum_image",
]


# ---------------------------------------------------------------------------
# Geometry primitives ([..., 3] vectors; fully batched)
# ---------------------------------------------------------------------------


def bond_length(ra, rb):
    """|r_ab| for coordinates [..., 3]."""
    d = rb - ra
    return jnp.sqrt((d * d).sum(axis=-1))


def bend_angle_cos(ra, rb, rc):
    """cos of the bend angle at b formed by a-b-c."""
    u = ra - rb
    v = rc - rb
    nu = jnp.sqrt((u * u).sum(axis=-1))
    nv = jnp.sqrt((v * v).sum(axis=-1))
    return (u * v).sum(axis=-1) / (nu * nv)


def bend_angle(ra, rb, rc):
    """Bend angle at b in radians, computed via atan2 for stability."""
    u = ra - rb
    v = rc - rb
    cross = jnp.cross(u, v)
    sin_t = jnp.sqrt((cross * cross).sum(axis=-1))
    cos_t = (u * v).sum(axis=-1)
    return jnp.arctan2(sin_t, cos_t)


def _dihedral_cos_sin(ra, rb, rc, rd):
    """(cos φ, sin φ) of the torsion a-b-c-d (IUPAC sign convention)."""
    b1 = rb - ra
    b2 = rc - rb
    b3 = rd - rc
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True))
    x = (n1 * n2).sum(axis=-1)
    y = (m1 * n2).sum(axis=-1)
    norm = jnp.sqrt(x * x + y * y)
    return x / norm, y / norm


def dihedral_cos_sin(ra, rb, rc, rd):
    c, s = _dihedral_cos_sin(ra, rb, rc, rd)
    return jnp.stack([c, s], axis=-1)


def dihedral_angle(ra, rb, rc, rd):
    """Torsion angle in radians in (-pi, pi]."""
    c, s = _dihedral_cos_sin(ra, rb, rc, rd)
    return jnp.arctan2(s, c)


def switching_rational(r, r0, d0=0.0, nn=6, mm=12):
    r"""PLUMED RATIONAL switching function, elementwise over ``r``.

    s(r) = (1 - x^nn) / (1 - x^mm) with x = max(0, (r - d0) / r0), so
    s = 1 for r <= d0 and s -> 0 as r -> inf (for mm > nn). ``nn`` and
    ``mm`` must be static Python ints. The removable singularity at
    x = 1 is evaluated by first-order series (s(1) = nn/mm), with the
    double-``where`` pattern so gradients stay NaN-free under jit.
    """
    nn = int(nn)
    mm = int(mm)
    x = jnp.maximum((jnp.asarray(r) - d0) / r0, 0.0)
    near1 = jnp.abs(x - 1.0) < 1e-8
    xs = jnp.where(near1, 0.5, x)
    s = (1.0 - xs**nn) / (1.0 - xs**mm)
    # series at x=1: s = nn/mm + nn*(nn-mm)/(2*mm) * (x-1) + O((x-1)^2)
    lim = nn / mm + nn * (nn - mm) / (2.0 * mm) * (x - 1.0)
    return jnp.where(near1, lim, s)


def coordination_pairs(group_a, group_b):
    """Flattened all-cross pair list (i1, j1, i2, j2, ...) between two
    atom groups, skipping self-pairs — the atom_indices for a
    ``'coordination'`` Feature with PLUMED ``GROUPA``/``GROUPB``
    (non-PAIR) semantics. Accepts MDAnalysis AtomGroup-likes."""
    ga = [int(i) for i in np.asarray(getattr(group_a, "ix", group_a)).reshape(-1)]
    gb = [int(j) for j in np.asarray(getattr(group_b, "ix", group_b)).reshape(-1)]
    out = []
    for i in ga:
        for j in gb:
            if i != j:
                out.extend((i, j))
    if not out:
        raise ValueError("coordination_pairs produced an empty pair list")
    return tuple(out)


# ---------------------------------------------------------------------------
# Feature spec
# ---------------------------------------------------------------------------

_FEATURE_ARITY = {
    "position": None,  # any number of atoms
    "bond": 2,
    "angle": 3,
    "angle_rad": 3,
    "dihedral": 4,
    "dihedral_rad": 4,
    "contact": 2,
    "coordination": None,  # even count >= 2, interpreted pairwise
}

_SWITCH_TYPES = ("contact", "coordination")


def _canonical_switch_params(params) -> Tuple[Tuple[str, float], ...]:
    """Validate and freeze switching-function parameters to a hashable,
    deterministic tuple (d0, mm, nn, r0)."""
    p = dict(params or {})
    unknown = set(p) - {"r0", "d0", "nn", "mm"}
    if unknown:
        raise ValueError(f"unknown switching params {sorted(unknown)}")
    if "r0" not in p:
        raise ValueError(
            "contact/coordination features require params={'r0': ...} "
            "(the RATIONAL switching radius)"
        )
    r0 = float(p["r0"])
    if r0 <= 0:
        raise ValueError(f"switching r0 must be > 0, got {r0}")
    d0 = float(p.get("d0", 0.0))
    nn = int(p.get("nn", 6))
    mm = int(p.get("mm", 2 * nn))
    if nn <= 0 or mm <= nn:
        raise ValueError(f"switching exponents need 0 < nn < mm, got {nn},{mm}")
    return (("d0", d0), ("mm", mm), ("nn", nn), ("r0", r0))


@dataclasses.dataclass(frozen=True)
class Feature:
    """Specification of one feature (molann ``Feature`` equivalent).

    Args:
        name: label for display
        feature_type: one of 'position', 'bond', 'angle', 'angle_rad',
            'dihedral', 'dihedral_rad', 'contact', 'coordination'
        atom_indices: indices of the participating atoms **within the input
            atom list** (i.e. column indices of the [batch, N, 3] input);
            an MDAnalysis AtomGroup is also accepted and converted. For
            'coordination' this is a flat pair list (i1, j1, i2, j2, ...)
            — see :func:`coordination_pairs`.
        params: switching-function parameters for 'contact'/'coordination'
            ({'r0': ..., 'd0': 0, 'nn': 6, 'mm': 2*nn}; r0 required,
            units of the input coordinates).
    """

    name: str
    feature_type: str
    atom_indices: Tuple[int, ...]
    params: Tuple[Tuple[str, float], ...]

    def __init__(self, name, feature_type, atom_indices, params=None):
        ft = feature_type.lower()
        if ft not in _FEATURE_ARITY:
            raise ValueError(
                f"unknown feature type '{feature_type}'; "
                f"known: {sorted(_FEATURE_ARITY)}"
            )
        # accept MDAnalysis AtomGroup-likes
        ix = getattr(atom_indices, "ix", atom_indices)
        idx = tuple(int(i) for i in np.asarray(ix).reshape(-1))
        arity = _FEATURE_ARITY[ft]
        if arity is not None and len(idx) != arity:
            raise ValueError(
                f"feature '{ft}' needs {arity} atoms, got {len(idx)}"
            )
        if ft == "coordination" and (len(idx) < 2 or len(idx) % 2):
            raise ValueError(
                "'coordination' needs a flat even-length pair list "
                f"(i1, j1, i2, j2, ...), got {len(idx)} indices"
            )
        if ft in _SWITCH_TYPES:
            sw = _canonical_switch_params(params)
        else:
            if params:
                raise ValueError(f"feature '{ft}' takes no params")
            sw = ()
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "feature_type", ft)
        object.__setattr__(self, "atom_indices", idx)
        object.__setattr__(self, "params", sw)

    @property
    def switch_params(self) -> dict:
        """Switching parameters as a plain dict (empty for non-switch
        feature types)."""
        return dict(self.params)

    @property
    def output_dim(self) -> int:
        if self.feature_type == "position":
            return 3 * len(self.atom_indices)
        if self.feature_type == "dihedral":
            return 2
        return 1


def minimum_image(d: jnp.ndarray, box) -> jnp.ndarray:
    """Minimum-image displacement for an orthogonal box (lengths [3]).
    The image shift is locally constant, so gradients flow through ``d``
    untouched."""
    b = jnp.asarray(box, dtype=d.dtype)
    return d - b * jnp.round(d / b)


def _pair_distance(ra, rb, box):
    d = rb - ra
    if box is not None:
        d = minimum_image(d, box)
    return jnp.sqrt((d * d).sum(axis=-1))


def _eval_feature(feat: Feature, x: jnp.ndarray, box=None) -> jnp.ndarray:
    """Evaluate one feature on a coordinate batch x [batch, N, 3] ->
    [batch, feat_dim]. ``box``: optional orthogonal box lengths applied
    (minimum image) to pair-distance features only."""
    idx = feat.atom_indices
    ft = feat.feature_type
    if ft == "position":
        sel = x[:, jnp.asarray(idx), :]
        return sel.reshape(x.shape[0], -1)
    if ft in _SWITCH_TYPES:
        p = feat.switch_params
        ra = x[:, jnp.asarray(idx[0::2]), :]  # [B, P, 3]
        rb = x[:, jnp.asarray(idx[1::2]), :]
        s = switching_rational(
            _pair_distance(ra, rb, box), p["r0"], p["d0"], p["nn"], p["mm"]
        )  # [B, P]
        if ft == "coordination":
            return s.sum(axis=1, keepdims=True)
        return s  # contact: P == 1 -> [B, 1]
    a = x[:, idx[0], :]
    b = x[:, idx[1], :]
    if ft == "bond":
        return _pair_distance(a, b, box)[:, None]
    c = x[:, idx[2], :]
    if ft == "angle":
        return bend_angle_cos(a, b, c)[:, None]
    if ft == "angle_rad":
        return bend_angle(a, b, c)[:, None]
    d = x[:, idx[3], :]
    if ft == "dihedral":
        return dihedral_cos_sin(a, b, c, d)
    return dihedral_angle(a, b, c, d)[:, None]


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class FeatureLayer:
    """Map coordinates [batch, N, 3] to a feature vector [batch, d_r]
    (molann ``FeatureLayer`` equivalent; see module docstring).

    Parameter-free and differentiable; the feature list is static so the
    whole map compiles to one fused gather + elementwise program.

    Args:
        feature_list: the Feature specs.
        input_ag: optional training atom selection; features with global
            topology indices are remapped to input columns.
        box: optional orthogonal box lengths ``(Lx, Ly, Lz)`` in the
            trajectory's length unit. When set, PAIR-DISTANCE features
            (bond / contact / coordination) use the minimum-image
            convention — required when trajectories are wrapped and the
            pair spans molecules. Angles/dihedrals/positions are left
            untouched (bonded atoms: make molecules whole upstream).
    """

    def __init__(self, feature_list: Sequence[Feature], input_ag=None,
                 box=None):
        if len(feature_list) == 0:
            raise ValueError("feature_list must not be empty")
        if box is not None:
            box = tuple(float(v) for v in np.asarray(box).reshape(-1))
            if len(box) != 3 or any(v <= 0 for v in box):
                raise ValueError(
                    f"box must be 3 positive orthogonal lengths, got {box}"
                )
        if input_ag is not None and hasattr(input_ag, "ix"):
            # molann semantics: features reference atoms by their global
            # topology index; remap to column positions within the input
            # atom list (the [batch, N, 3] array columns)
            lookup = {int(g): j for j, g in enumerate(np.asarray(input_ag.ix))}
            remapped = []
            for f in feature_list:
                try:
                    rel = tuple(lookup[int(i)] for i in f.atom_indices)
                except KeyError as e:
                    raise ValueError(
                        f"feature '{f.name}' references atom {e} which is "
                        "not part of input_ag"
                    ) from None
                remapped.append(
                    Feature(f.name, f.feature_type, rel, f.switch_params or None)
                )
            feature_list = remapped
        self.feature_list = tuple(feature_list)
        self.input_ag = input_ag
        self.box = box

    @property
    def output_dimension(self) -> int:
        return sum(f.output_dim for f in self.feature_list)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(x)
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        feats = [
            _eval_feature(f, x, self.box) for f in self.feature_list
        ]
        out = jnp.concatenate(feats, axis=1)
        return out[0] if squeeze else out

    def get_feature_info(self):
        import pandas as pd

        return pd.DataFrame(
            [
                {
                    "name": f.name,
                    "type": f.feature_type,
                    "atom_indices": f.atom_indices,
                    "dim": f.output_dim,
                }
                for f in self.feature_list
            ]
        )

    # -- pytree protocol (no array leaves) --------------------------------
    def tree_flatten(self):
        return (), (self.feature_list, self.box)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], box=aux[1])


@jax.tree_util.register_pytree_node_class
class Identity:
    """Identity preprocessing layer (torch.nn.Identity analog)."""

    def __call__(self, x):
        return x

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()


@jax.tree_util.register_pytree_node_class
class Lambda:
    """Wrap an arbitrary jax-traceable function as a preprocessing layer."""

    def __init__(self, fn: Callable):
        self.fn = fn

    def __call__(self, x):
        return self.fn(x)

    def tree_flatten(self):
        return (), (self.fn,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0])


@jax.tree_util.register_pytree_node_class
class PreprocessingANN:
    """Composition r(x) = feature_layer(alignment_layer(x))
    (molann ``PreprocessingANN`` equivalent).

    Either stage may be None (skipped).
    """

    def __init__(self, alignment_layer, feature_layer):
        self.alignment_layer = alignment_layer
        self.feature_layer = feature_layer

    @property
    def output_dimension(self) -> int:
        return self.feature_layer.output_dimension

    def __call__(self, x):
        if self.alignment_layer is not None:
            x = self.alignment_layer(x)
        if self.feature_layer is not None:
            x = self.feature_layer(x)
        return x

    def tree_flatten(self):
        return (self.alignment_layer,), (self.feature_layer,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


def as_pp_layer(pp_layer):
    """Normalize a preprocessing layer to a pytree-compatible callable.

    Plain Python callables (including torch.nn.Identity-style objects that
    are not jax pytree nodes) are wrapped in :class:`Lambda` / replaced by
    :class:`Identity` so the composed CV model remains a well-formed pytree.
    """
    if pp_layer is None:
        return Identity()
    # already a registered pytree node class from this module family?
    if isinstance(
        pp_layer, (FeatureLayer, Identity, Lambda, PreprocessingANN)
    ):
        return pp_layer
    # other registered pytree objects (e.g. AlignmentLayer) pass through
    flat, treedef = jax.tree_util.tree_flatten(pp_layer)
    if not any(callable(l) and not hasattr(l, "shape") for l in flat):
        if treedef.num_leaves == 1 and flat and flat[0] is pp_layer:
            # an opaque callable leaf -> wrap
            if callable(pp_layer):
                name = type(pp_layer).__name__
                if name == "Identity":
                    return Identity()
                return Lambda(pp_layer)
        return pp_layer
    return Lambda(pp_layer)
