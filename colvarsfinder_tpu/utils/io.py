r"""Native molecular topology and trajectory I/O.

The reference delegates topology/trajectory I/O to MDAnalysis
(reference: colvarsfinder/utils.py:96-130; examples/dipeptide/main.ipynb
cell 2). This module provides a native, dependency-free equivalent
sufficient for the dipeptide-class workflows:

* :func:`parse_gro` — GROMACS .gro topology/coordinate reader
  (e.g. reference examples/dipeptide/top.gro);
* :class:`Topology` / :class:`AtomGroup` — atom metadata with an
  MDAnalysis-style selection mini-language (``type C or type O``,
  ``resid 2``, ``name CA``, ``not type H``, ...); AtomGroup exposes
  ``.ix`` and ``.positions`` so it is accepted anywhere the framework
  takes an MDAnalysis AtomGroup;
* :func:`parse_pdb` — PDB first-model reader (the reference's MD systems
  originate from PDB files, reference utils.py:172);
* :func:`read_dcd` / :func:`write_dcd` — CHARMM/NAMD-style DCD binary
  trajectory format (the format OpenMM's DCDReporter writes,
  reference utils.py:240), implemented with numpy record I/O.

GROMACS XTC (compressed) and TRR (full-precision) trajectory codecs live
in :mod:`colvarsfinder_tpu.utils.xtc` / :mod:`colvarsfinder_tpu.utils.trr`;
:class:`Universe` dispatches on the trajectory extension.

A C++ fast path for bulk text/DCD decoding lives in ``native/`` and is used
automatically when built (see :mod:`colvarsfinder_tpu.utils.native_io`).
"""

from __future__ import annotations

import os
import re
import struct
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

__all__ = [
    "Atom",
    "AtomGroup",
    "Topology",
    "Universe",
    "parse_gro",
    "parse_pdb",
    "write_gro",
    "read_dcd",
    "write_dcd",
]


def _guess_type(name: str) -> str:
    """Element type from atom name, MDAnalysis-style: first alphabetic
    character after stripping leading digits ('HH31'->H, 'CH3'->C, '1CA'->C).
    """
    s = name.strip()
    s = s.lstrip("0123456789")
    return s[0].upper() if s else ""


@dataclass(frozen=True)
class Atom:
    index: int
    name: str
    type: str
    resid: int
    resname: str


class AtomGroup:
    """A subset of a topology's atoms with positions.

    Duck-type compatible with the slice of the MDAnalysis AtomGroup API the
    framework consumes: ``.ix``, ``.positions``, ``.names``, ``len()``.
    """

    def __init__(self, topology: "Topology", indices: Sequence[int]):
        self._top = topology
        self.ix = np.asarray(indices, dtype=np.int64)

    def __len__(self):
        return len(self.ix)

    @property
    def names(self):
        return [self._top.names[i] for i in self.ix]

    @property
    def types(self):
        return [self._top.types[i] for i in self.ix]

    @property
    def resids(self):
        return [self._top.resids[i] for i in self.ix]

    @property
    def positions(self) -> np.ndarray:
        return self._top.positions[self.ix]

    def indices_within(self, other: "AtomGroup") -> List[int]:
        """Positions of this group's atoms within ``other``'s atom list."""
        lookup = {int(g): j for j, g in enumerate(other.ix)}
        return [lookup[int(i)] for i in self.ix]

    def __repr__(self):
        return f"<AtomGroup of {len(self.ix)} atoms>"


@dataclass
class Topology:
    """Molecular topology with reference coordinates.

    Attributes:
        names / types / resids / resnames: per-atom metadata
        positions: reference coordinates [N, 3]
        box: box vector lengths [3] (or None)
        title: title line of the source file
    """

    names: List[str]
    resids: List[int]
    resnames: List[str]
    positions: np.ndarray
    box: Optional[np.ndarray] = None
    title: str = ""
    types: List[str] = field(default_factory=list)

    def __post_init__(self):
        if not self.types:
            self.types = [_guess_type(n) for n in self.names]

    @property
    def n_atoms(self) -> int:
        return len(self.names)

    @property
    def atoms(self) -> AtomGroup:
        return AtomGroup(self, np.arange(self.n_atoms))

    # -- selection mini-language -------------------------------------------
    def select_atoms(self, expr: str) -> AtomGroup:
        """MDAnalysis-style atom selection.

        Supported: ``all``, ``type X``, ``name X``, ``resname X``,
        ``resid N`` / ``resid N:M``, ``index I:J``, combined with
        ``and`` / ``or`` / ``not`` and parentheses.
        """
        mask = _SelectionParser(self).parse(expr)
        return AtomGroup(self, np.nonzero(mask)[0])


class _SelectionParser:
    """Recursive-descent parser for the selection mini-language."""

    _TOKEN_RE = re.compile(r"\(|\)|[^\s()]+")

    def __init__(self, top: Topology):
        self.top = top

    def parse(self, expr: str) -> np.ndarray:
        self.tokens = self._TOKEN_RE.findall(expr)
        self.pos = 0
        mask = self._or()
        if self.pos != len(self.tokens):
            raise ValueError(
                f"unexpected token '{self.tokens[self.pos]}' in '{expr}'"
            )
        return mask

    def _peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def _next(self):
        tok = self._peek()
        self.pos += 1
        return tok

    def _or(self):
        left = self._and()
        while self._peek() == "or":
            self._next()
            left = left | self._and()
        return left

    def _and(self):
        left = self._not()
        while self._peek() == "and":
            self._next()
            left = left & self._not()
        return left

    def _not(self):
        if self._peek() == "not":
            self._next()
            return ~self._not()
        return self._primary()

    def _primary(self):
        top = self.top
        n = top.n_atoms
        tok = self._next()
        if tok is None:
            raise ValueError("unexpected end of selection")
        if tok == "(":
            mask = self._or()
            if self._next() != ")":
                raise ValueError("missing ')'")
            return mask
        if tok == "all":
            return np.ones(n, dtype=bool)
        if tok in ("type", "name", "resname"):
            values = []
            while self._peek() not in (None, "and", "or", ")", "not"):
                values.append(self._next())
            attr = {"type": top.types, "name": top.names,
                    "resname": top.resnames}[tok]
            vset = {v.upper() for v in values}
            return np.asarray([a.upper() in vset for a in attr], dtype=bool)
        if tok in ("resid", "index"):
            spec = self._next()
            if spec is None:
                raise ValueError(f"'{tok}' needs a value")
            if ":" in spec:
                lo, hi = spec.split(":")
                lo, hi = int(lo), int(hi)
            else:
                lo = hi = int(spec)
            if tok == "resid":
                vals = np.asarray(top.resids)
            else:
                vals = np.arange(n)
            return (vals >= lo) & (vals <= hi)
        raise ValueError(f"unknown selection keyword '{tok}'")


def write_gro(filename: str, top: Topology) -> None:
    """Write a Topology as a GROMACS .gro file (fixed-column format,
    positions in nm) — inverse of :func:`parse_gro`.

    Atom serials and residue ids wrap modulo 100000 (the GROMACS
    convention for the 5-character fields); coordinates outside the
    fixed 8.3f columns raise instead of silently shifting the layout.
    """
    pos = np.asarray(top.positions, dtype=np.float64)
    if pos.size and (pos.min() <= -1000.0 or pos.max() >= 10000.0):
        raise ValueError(
            "coordinates outside the .gro fixed-width range "
            "(-1000, 10000) nm would corrupt the column layout"
        )
    with open(filename, "w") as f:
        f.write((top.title or "written by colvarsfinder-tpu") + "\n")
        f.write(f"{top.n_atoms:>5d}\n")
        for i in range(top.n_atoms):
            f.write(
                f"{top.resids[i] % 100000:>5d}{top.resnames[i]:<5s}"
                f"{top.names[i]:>5s}{(i + 1) % 100000:>5d}"
                f"{pos[i, 0]:8.3f}{pos[i, 1]:8.3f}{pos[i, 2]:8.3f}\n"
            )
        if top.box is not None:
            f.write("".join(f"{b:10.5f}" for b in top.box) + "\n")
        else:
            f.write(f"{0.0:10.5f}{0.0:10.5f}{0.0:10.5f}\n")


def parse_gro(filename: str) -> Topology:
    """Parse a GROMACS .gro file (fixed-column format, positions in nm)."""
    with open(filename) as f:
        lines = f.readlines()
    title = lines[0].rstrip("\n")
    n_atoms = int(lines[1].split()[0])
    names, resids, resnames = [], [], []
    pos = np.zeros((n_atoms, 3), dtype=np.float32)
    for i in range(n_atoms):
        ln = lines[2 + i]
        resids.append(int(ln[0:5]))
        resnames.append(ln[5:10].strip())
        names.append(ln[10:15].strip())
        # coordinates: three fields of width 8 starting at col 20
        pos[i, 0] = float(ln[20:28])
        pos[i, 1] = float(ln[28:36])
        pos[i, 2] = float(ln[36:44])
    box = None
    if len(lines) > 2 + n_atoms:
        tail = lines[2 + n_atoms].split()
        if len(tail) >= 3:
            box = np.asarray([float(x) for x in tail[:3]], dtype=np.float32)
    return Topology(
        names=names, resids=resids, resnames=resnames,
        positions=pos, box=box, title=title,
    )


def parse_pdb(filename: str) -> Topology:
    """Parse a PDB file's first model into a :class:`Topology`
    (fixed-column ATOM/HETATM records; Å converted to nm).

    The reference's MD workflow loads its system from a PDB through
    OpenMM (reference: colvarsfinder/utils.py:172 takes an
    ``app.PDBFile``); this native parser lets :class:`Universe` couple the
    same file with an XTC/DCD/TRR trajectory without MDAnalysis."""
    names: List[str] = []
    resids: List[int] = []
    resnames: List[str] = []
    pos_l: List[List[float]] = []
    box = None
    title = ""
    with open(filename) as f:
        for ln in f:
            rec = ln[:6]
            if rec in ("ATOM  ", "HETATM"):
                names.append(ln[12:16].strip())
                resnames.append(ln[17:21].strip())
                resseq = ln[22:26].strip()
                resids.append(int(resseq) if resseq else 0)
                pos_l.append([
                    float(ln[30:38]) * 0.1,
                    float(ln[38:46]) * 0.1,
                    float(ln[46:54]) * 0.1,
                ])
            elif rec == "CRYST1":
                box = np.asarray(
                    [float(ln[6:15]), float(ln[15:24]), float(ln[24:33])],
                    dtype=np.float32,
                ) * 0.1
            elif rec == "TITLE ":
                title = (title + " " + ln[10:].strip()).strip()
            elif rec.rstrip() in ("END", "ENDMDL"):
                break  # first model only
    if not names:
        raise ValueError(f"no ATOM/HETATM records found in {filename}")
    return Topology(
        names=names, resids=resids, resnames=resnames,
        positions=np.asarray(pos_l, dtype=np.float32), box=box,
        title=title,
    )


# ---------------------------------------------------------------------------
# Universe: topology + trajectory, MDAnalysis-style entry point
# ---------------------------------------------------------------------------


class _TrajectoryView:
    """The ``universe.trajectory`` facade: frames + timing metadata with the
    slice of the MDAnalysis Reader API the framework consumes
    (``timeseries(order='fac')``, ``dt`` in ps, ``n_frames``)."""

    def __init__(self, coords: np.ndarray, dt_ps: float, segment_starts=None):
        self._coords = np.asarray(coords, dtype=np.float32)
        self.dt = float(dt_ps)
        #: frame offsets of the source files when the Universe was built
        #: from several trajectory files; None for a single source
        self.segment_starts = segment_starts

    @property
    def n_frames(self) -> int:
        return self._coords.shape[0]

    def timeseries(self, order: str = "fac") -> np.ndarray:
        if order != "fac":
            raise ValueError(
                f"only order='fac' (frame, atom, coordinate) is supported, "
                f"got {order!r}"
            )
        return self._coords

    def __len__(self):
        return self.n_frames


class Universe:
    """Native replacement for the reference's MDAnalysis entry point
    (reference: examples/dipeptide/main.ipynb cell 2,
    ``mda.Universe('top.gro', 'md_center.xtc')``).

    Couples a topology file (.gro or .pdb) with a trajectory file (.xtc,
    .trr, .dcd, .nc, .lammpstrj, .h5, or none — topology coordinates become a
    single
    frame), or with a LIST of trajectory files (independent launches,
    restart chains — formats may be mixed): frames are concatenated and
    ``trajectory.segment_starts`` records the file boundaries, which
    :class:`~colvarsfinder_tpu.utils.WeightedTrajectory` propagates so
    time-lagged training pairs never span two files. Exposes the
    duck-type surface :class:`colvarsfinder_tpu.utils.WeightedTrajectory`'s
    MD branch consumes: ``.atoms``, ``.select_atoms``, and ``.trajectory``
    with ``timeseries(order='fac')`` / ``dt`` (ps) / ``n_frames``.

    Args:
        topology_file: path to a .gro or .pdb file
        trajectory_file: optional path to a .xtc, .trr, .dcd, Amber
            .nc, or LAMMPS .lammpstrj/.dump trajectory, or a list of such
            paths (all must share the topology's atom count and agree on
            the frame spacing unless ``dt_ps`` overrides it)
        dt_ps: override the frame spacing (ps) when the trajectory file
            has none — single-frame or zero-time XTC files, and ALWAYS
            for LAMMPS dumps (their TIMESTEP counters are step counts,
            not time; without ``dt_ps`` the spacing silently defaults
            to 1 ps). Note this is the FULL spacing between stored
            frames, unlike ``read_lammpstrj``'s per-step ``dt_ps``.
    """

    def __init__(
        self,
        topology_file: str,
        trajectory_file: Optional[str] = None,
        dt_ps: Optional[float] = None,
    ):
        top_ext = os.path.splitext(topology_file)[1].lower()
        if top_ext == ".pdb":
            self._top = parse_pdb(topology_file)
        else:
            self._top = parse_gro(topology_file)
        segment_starts = None
        if trajectory_file is None:
            coords = self._top.positions[None]
            dt = dt_ps if dt_ps is not None else 1.0
        else:
            files = (
                list(trajectory_file)
                if isinstance(trajectory_file, (list, tuple))
                else [trajectory_file]
            )
            if not files:
                raise ValueError("trajectory_file list is empty")
            parts, dts = [], []
            for path in files:
                c, d = self._read_trajectory_file(path)
                if c.shape[1] != self._top.n_atoms:
                    raise ValueError(
                        f"{path}: trajectory has {c.shape[1]} atoms but "
                        f"the topology has {self._top.n_atoms}"
                    )
                parts.append(c)
                dts.append(d)
            # files with no timing info (dt <= 0, e.g. single-frame or
            # zero-time files) don't vote on the spacing
            timed = [d for d in dts if d > 0]
            if dt_ps is not None:
                dt = dt_ps
            elif not timed:
                dt = 1.0
            else:
                dt = timed[0]
                if any(
                    abs(d - dt) > 1e-6 * max(dt, 1.0) for d in timed[1:]
                ):
                    raise ValueError(
                        f"trajectory files disagree on the frame spacing "
                        f"({dts} ps) — pass dt_ps to override"
                    )
            if len(parts) == 1:
                coords = parts[0]
            else:
                # several source files (independent launches, restarts):
                # concatenate frames, remember the boundaries so lagged
                # estimators never pair frames across files
                coords = np.concatenate(parts, axis=0)
                segment_starts = np.cumsum(
                    [0] + [len(p) for p in parts[:-1]]
                )
        self.trajectory = _TrajectoryView(coords, dt, segment_starts)

    @staticmethod
    def _read_trajectory_file(path: str):
        """Decode one trajectory file -> (coords [n, atoms, 3], dt_ps)."""
        ext = os.path.splitext(path)[1].lower()
        if ext == ".xtc":
            from .xtc import read_xtc

            coords, dt, _times = read_xtc(path)
        elif ext == ".trr":
            from .trr import read_trr

            coords, dt, _times = read_trr(path)
        elif ext == ".dcd":
            coords, dt = read_dcd(path)
        elif ext in (".nc", ".ncdf", ".netcdf"):
            from .netcdf import read_netcdf

            coords, dt, _times = read_netcdf(path)
        elif ext in (".h5", ".h5md"):
            from .h5md import read_h5md

            coords, dt, _times = read_h5md(path)
        elif ext in (".lammpstrj", ".dump"):
            from .lammps import read_lammpstrj

            # biomolecular LAMMPS dumps (units real/metal) are Angstrom;
            # TIMESTEP counters are NOT time, so report "no timing info"
            # (dt = -1): Universe then requires/uses dt_ps for the frame
            # spacing. Call read_lammpstrj directly for lj-unit dumps.
            coords, _step_dt, _times = read_lammpstrj(path, length_scale=0.1)
            dt = -1.0
        else:
            raise ValueError(
                f"unsupported trajectory format '{ext}' "
                "(supported: .xtc, .trr, .dcd, .nc, .lammpstrj, .dump, .h5)"
            )
        return coords, dt

    @property
    def atoms(self) -> AtomGroup:
        return self._top.atoms

    def select_atoms(self, expr: str) -> AtomGroup:
        return self._top.select_atoms(expr)

    @property
    def topology(self) -> Topology:
        return self._top

    @property
    def box(self):
        """Orthogonal box lengths [3] from the topology file (nm), or
        None — pass straight to ``FeatureLayer(feats, box=u.box)`` for
        minimum-image pair-distance features on wrapped trajectories."""
        return None if self._top.box is None else tuple(
            float(v) for v in self._top.box
        )

    def __repr__(self):
        return (
            f"<Universe: {self._top.n_atoms} atoms, "
            f"{self.trajectory.n_frames} frames, "
            f"dt={self.trajectory.dt:g} ps>"
        )


# ---------------------------------------------------------------------------
# DCD trajectory format
# ---------------------------------------------------------------------------

_DCD_MAGIC = b"CORD"


def write_dcd(
    filename: str,
    coords: np.ndarray,
    dt_ps: float = 1.0,
    step_interval: int = 1,
) -> None:
    """Write frames [n_frames, n_atoms, 3] (float32) as a CHARMM-style DCD.

    Minimal but standard-compliant: the layout produced matches what
    OpenMM's DCDReporter and MDAnalysis emit (84-byte header block, title
    block, natoms block, per-frame x/y/z float32 records with Fortran-style
    length prefixes).

    ``dt_ps`` is the time between *stored frames* (ps); ``step_interval``
    is NSAVC, the number of integrator steps per stored frame. Following
    the CHARMM convention (frame spacing = DELTA * NSAVC, the convention
    OpenMM's DCDReporter and MDAnalysis use), DELTA is written as the
    per-integrator-step time ``dt_ps / step_interval`` in AKMA units.
    """
    coords = np.asarray(coords, dtype=np.float32)
    n_frames, n_atoms, _ = coords.shape
    step_interval = max(1, int(step_interval))
    with open(filename, "wb") as f:
        def record(payload: bytes):
            f.write(struct.pack("<i", len(payload)))
            f.write(payload)
            f.write(struct.pack("<i", len(payload)))

        # header: CORD + 20 int32 control words
        icntrl = [0] * 20
        icntrl[0] = n_frames            # NSET
        icntrl[1] = step_interval      # ISTART
        icntrl[2] = step_interval      # NSAVC
        icntrl[19] = 24                 # CHARMM version tag
        # AKMA per-step timestep (DELTA) in control word 10 as float
        header = _DCD_MAGIC + struct.pack("<9i", *icntrl[:9])
        header += struct.pack("<f", dt_ps / step_interval / 0.04888821)
        header += struct.pack("<10i", *icntrl[10:])
        record(header)
        title = b"Created by colvarsfinder-tpu".ljust(80)
        record(struct.pack("<i", 1) + title)
        record(struct.pack("<i", n_atoms))
        for frame in coords:
            for axis in range(3):
                record(frame[:, axis].tobytes())


def read_dcd(filename: str):
    """Read a DCD file -> (coords [n_frames, n_atoms, 3] float32, dt_ps).

    Handles the common CHARMM/NAMD/OpenMM layout, including the optional
    per-frame unit-cell record (skipped).
    """
    with open(filename, "rb") as f:
        data = f.read()
    off = 0

    def record():
        nonlocal off
        (n,) = struct.unpack_from("<i", data, off)
        off += 4
        payload = data[off : off + n]
        off += n
        (n2,) = struct.unpack_from("<i", data, off)
        off += 4
        if n2 != n:
            raise ValueError("corrupt DCD record")
        return payload

    header = record()
    if header[:4] != _DCD_MAGIC:
        raise ValueError("not a DCD file")
    icntrl = struct.unpack_from("<9i", header, 4)
    n_frames = icntrl[0]
    (akma_dt,) = struct.unpack_from("<f", header, 40)
    extra = struct.unpack_from("<10i", header, 44)
    has_unitcell = extra[0] == 1  # ICNTRL[11]: crystal record flag
    # frame spacing = DELTA * NSAVC (CHARMM convention; OpenMM's DCDReporter
    # writes DELTA = integrator step and NSAVC = report_interval, so ignoring
    # NSAVC would understate dt by that factor and corrupt lag_idx)
    nsavc = max(1, icntrl[2])
    dt_ps = akma_dt * 0.04888821 * nsavc

    record()  # title block
    natoms_payload = record()
    (n_atoms,) = struct.unpack_from("<i", natoms_payload, 0)

    # number of whole frames actually present (tolerate truncation)
    blk = 4 + n_atoms * 4 + 4
    cell = (4 + 48 + 4) if has_unitcell else 0
    avail = (len(data) - off) // (cell + 3 * blk)

    # native fast path: fixed-stride gather in C++
    from . import native_io

    coords = native_io.decode_dcd_frames(
        filename, off, n_atoms, avail, has_unitcell
    )
    if coords is None:
        frames = []
        while off + cell + 3 * blk <= len(data):
            if has_unitcell:
                record()  # 6 doubles of cell info
            x = np.frombuffer(record(), dtype="<f4")
            y = np.frombuffer(record(), dtype="<f4")
            z = np.frombuffer(record(), dtype="<f4")
            frames.append(np.stack([x, y, z], axis=1))
        coords = (
            np.stack(frames) if frames else np.zeros((0, n_atoms, 3), "f4")
        )
    return coords, dt_ps
