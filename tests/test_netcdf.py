"""Amber NetCDF codec: round-trips, cross-validation against scipy's
independent classic-NetCDF implementation (the external golden the XTC/DCD
codecs lack an offline producer for), header golden bytes, convention
attributes, and the Universe integration."""

import struct

import numpy as np
import pytest

from colvarsfinder_tpu.utils import (
    Universe,
    WeightedTrajectory,
    read_netcdf,
    read_netcdf_full,
    scan_netcdf,
    write_netcdf,
)

scipy_netcdf = pytest.importorskip("scipy.io", reason="scipy cross-check")
from scipy.io import netcdf_file  # noqa: E402


def _coords(n=7, atoms=5, seed=0):
    rng = np.random.default_rng(seed)
    return (
        np.cumsum(rng.normal(0, 0.3, (n, atoms, 3)), axis=0) + 12.0
    ).astype(np.float32)


def test_roundtrip_coords_times(tmp_path):
    x = _coords()
    path = str(tmp_path / "t.nc")
    write_netcdf(path, x, dt_ps=2.0)
    coords, dt, times = read_netcdf(path)
    np.testing.assert_array_equal(coords, x)
    assert dt == 2.0
    np.testing.assert_allclose(times, 2.0 * np.arange(7), atol=1e-5)


def test_roundtrip_velocities_cell(tmp_path):
    x = _coords()
    rng = np.random.default_rng(1)
    v = rng.normal(0, 1, x.shape).astype(np.float32)
    cl = np.abs(rng.normal(30, 1, (len(x), 3)))
    ca = np.full((len(x), 3), 90.0)
    path = str(tmp_path / "vc.nc")
    write_netcdf(path, x, dt_ps=1.0, velocities=v, cell_lengths=cl,
                 cell_angles=ca)
    fr = read_netcdf_full(path)
    np.testing.assert_array_equal(fr.coords, x)
    np.testing.assert_array_equal(fr.velocities, v)
    np.testing.assert_array_equal(fr.cell_lengths, cl)
    np.testing.assert_array_equal(fr.cell_angles, ca)
    assert fr.attrs["Conventions"] == "AMBER"
    assert fr.attrs["ConventionVersion"] == "1.0"


def test_scan(tmp_path):
    x = _coords(n=4, atoms=3)
    path = str(tmp_path / "s.nc")
    write_netcdf(path, x, title="hello")
    meta = scan_netcdf(path)
    assert meta["n_frames"] == 4
    assert meta["n_atoms"] == 3
    assert meta["has_coordinates"] and not meta["has_velocities"]
    assert not meta["has_cell"]
    assert meta["conventions"] == "AMBER"
    assert meta["title"] == "hello"


def test_scipy_reads_our_file(tmp_path):
    """Cross-validation #1: an independent NetCDF implementation decodes
    our writer's output bit-exactly, including the interleaved-record
    layout with mixed float/double record variables."""
    x = _coords()
    rng = np.random.default_rng(2)
    v = rng.normal(0, 1, x.shape).astype(np.float32)
    cl = np.abs(rng.normal(25, 2, (len(x), 3)))
    ca = np.full((len(x), 3), 90.0)
    path = str(tmp_path / "ours.nc")
    write_netcdf(path, x, dt_ps=0.5, velocities=v, cell_lengths=cl,
                 cell_angles=ca, title="xval")

    with netcdf_file(path, "r", mmap=False) as nc:
        assert nc.Conventions == b"AMBER"
        assert nc.dimensions["spatial"] == 3
        assert nc.dimensions["atom"] == x.shape[1]
        np.testing.assert_array_equal(nc.variables["coordinates"][:], x)
        np.testing.assert_array_equal(nc.variables["velocities"][:], v)
        np.testing.assert_array_equal(nc.variables["cell_lengths"][:], cl)
        np.testing.assert_array_equal(nc.variables["cell_angles"][:], ca)
        np.testing.assert_allclose(
            nc.variables["time"][:], 0.5 * np.arange(7), atol=1e-6
        )
        assert nc.variables["coordinates"].units == b"angstrom"
        assert bytes(nc.variables["spatial"][:].tobytes()) == b"xyz"


def test_we_read_scipy_file(tmp_path):
    """Cross-validation #2: decode a file authored entirely by scipy's
    writer (independent header/offset/record-interleave computation)."""
    x = _coords(n=5, atoms=4, seed=3)
    t = (0.25 * np.arange(5)).astype(np.float32)
    path = str(tmp_path / "scipy.nc")
    with netcdf_file(path, "w") as nc:
        nc.Conventions = "AMBER"
        nc.ConventionVersion = "1.0"
        nc.createDimension("frame", None)
        nc.createDimension("spatial", 3)
        nc.createDimension("atom", 4)
        vs = nc.createVariable("spatial", "c", ("spatial",))
        vs[:] = np.frombuffer(b"xyz", dtype="S1")
        vt = nc.createVariable("time", "f", ("frame",))
        vt[:] = t
        vt.units = "picosecond"
        vc = nc.createVariable("coordinates", "f", ("frame", "atom", "spatial"))
        vc[:] = x
        vc.units = "angstrom"

    coords, dt, times = read_netcdf(path)
    np.testing.assert_array_equal(coords, x)
    np.testing.assert_allclose(times, t, atol=1e-7)
    assert abs(dt - 0.25) < 1e-7
    meta = scan_netcdf(path)
    assert meta["n_frames"] == 5 and meta["n_atoms"] == 4


def test_header_golden_bytes(tmp_path):
    """Byte-level spec conformance of the writer's header prefix."""
    x = _coords(n=2, atoms=1)
    path = str(tmp_path / "g.nc")
    write_netcdf(path, x)
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"CDF\x01"
    (numrecs,) = struct.unpack_from(">i", data, 4)
    assert numrecs == 2
    # dimension list: tag NC_DIMENSION, 3 dims, first named 'frame' size 0
    tag, ndims = struct.unpack_from(">ii", data, 8)
    assert tag == 0x0A and ndims == 3
    (nlen,) = struct.unpack_from(">i", data, 16)
    assert data[20 : 20 + nlen] == b"frame"
    off = 20 + (nlen + 3) // 4 * 4
    (size,) = struct.unpack_from(">i", data, off)
    assert size == 0  # UNLIMITED


def test_scale_factor_applied(tmp_path):
    """Amber writes velocity scale_factor attributes; the reader applies
    them (netCDF4/MDAnalysis behavior)."""
    x = _coords(n=3, atoms=2)
    path = str(tmp_path / "sf.nc")
    with netcdf_file(path, "w") as nc:
        nc.createDimension("frame", None)
        nc.createDimension("spatial", 3)
        nc.createDimension("atom", 2)
        vc = nc.createVariable("coordinates", "f", ("frame", "atom", "spatial"))
        vc[:] = x
        vc.scale_factor = 2.5
    fr = read_netcdf_full(path)
    np.testing.assert_allclose(fr.coords, 2.5 * x, rtol=1e-6)


def test_bad_magic_raises(tmp_path):
    path = str(tmp_path / "bad.nc")
    with open(path, "wb") as f:
        f.write(b"HDF5....not classic")
    with pytest.raises(ValueError, match="magic"):
        read_netcdf(path)


def test_truncated_file_yields_whole_frames(tmp_path):
    x = _coords(n=6, atoms=3)
    path = str(tmp_path / "trunc.nc")
    write_netcdf(path, x)
    with open(path, "rb") as f:
        data = f.read()
    with open(path, "wb") as f:
        f.write(data[: len(data) - 10])  # chop into the last record
    coords, _dt, _times = read_netcdf(path)
    assert len(coords) == 5
    np.testing.assert_array_equal(coords, x[:5])


def test_universe_reads_netcdf(tmp_path):
    gro = tmp_path / "top.gro"
    n_atoms = 3
    with open(gro, "w") as f:
        f.write("test\n")
        f.write(f"{n_atoms}\n")
        for i in range(n_atoms):
            f.write(
                f"{1:>5d}{'ALA':<5s}{'CA':>5s}{i + 1:>5d}"
                f"{0.1 * i:8.3f}{0.2 * i:8.3f}{0.3 * i:8.3f}\n"
            )
        f.write("   5.00000   5.00000   5.00000\n")
    x = _coords(n=8, atoms=n_atoms)
    nc = tmp_path / "traj.nc"
    write_netcdf(str(nc), x, dt_ps=4.0)

    u = Universe(str(gro), str(nc))
    assert u.trajectory.n_frames == 8
    assert u.trajectory.dt == 4.0
    np.testing.assert_array_equal(u.trajectory.timeseries(order="fac"), x)

    traj = WeightedTrajectory(universe=u)
    assert traj.n_frames == 8
    assert abs(traj.dt - 4.0e-3) < 1e-12  # ps -> ns


def test_memmap_decode(tmp_path):
    from colvarsfinder_tpu.utils import read_netcdf_memmap

    x = _coords(n=9, atoms=6, seed=7)
    rng = np.random.default_rng(8)
    v = rng.normal(0, 1, x.shape).astype(np.float32)
    src = str(tmp_path / "m.nc")
    # velocities present => interleaved multi-variable records, the
    # stride the memmap path must honor
    write_netcdf(src, x, dt_ps=0.5, velocities=v)
    out = str(tmp_path / "m.npy")
    coords, dt, times = read_netcdf_memmap(src, out)
    assert isinstance(coords, np.memmap)
    np.testing.assert_array_equal(np.asarray(coords), x)
    assert dt == 0.5
    np.testing.assert_allclose(times, 0.5 * np.arange(9), atol=1e-6)
    # the artifact is a standalone .npy
    reloaded = np.load(out, mmap_mode="r")
    np.testing.assert_array_equal(np.asarray(reloaded), x)


def test_memmap_truncated(tmp_path):
    from colvarsfinder_tpu.utils import read_netcdf_memmap

    x = _coords(n=5, atoms=2, seed=9)
    src = str(tmp_path / "t.nc")
    write_netcdf(src, x)
    data = open(src, "rb").read()
    with open(src, "wb") as f:
        f.write(data[:-6])
    coords, _dt, times = read_netcdf_memmap(src, str(tmp_path / "t.npy"))
    assert coords.shape[0] == 4 == len(times)
    np.testing.assert_array_equal(np.asarray(coords), x[:4])


def test_truncated_times_stay_aligned(tmp_path):
    """Truncation clamps ALL record variables consistently — times and
    coords keep the same frame count."""
    x = _coords(n=6, atoms=3)
    path = str(tmp_path / "tr2.nc")
    write_netcdf(path, x)
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[:-10])
    coords, _dt, times = read_netcdf(path)
    assert len(coords) == len(times) == 5
    fr = read_netcdf_full(path)
    assert len(fr.times) == len(fr.coords) == 5


def test_memmap_applies_scale_factor(tmp_path):
    from colvarsfinder_tpu.utils import read_netcdf_memmap

    x = _coords(n=3, atoms=2)
    src = str(tmp_path / "sfm.nc")
    with netcdf_file(src, "w") as nc:
        nc.createDimension("frame", None)
        nc.createDimension("spatial", 3)
        nc.createDimension("atom", 2)
        vc = nc.createVariable("coordinates", "f", ("frame", "atom", "spatial"))
        vc[:] = x
        vc.scale_factor = 2.5
    coords, _dt, _t = read_netcdf_memmap(src, str(tmp_path / "sfm.npy"))
    np.testing.assert_allclose(np.asarray(coords), 2.5 * x, rtol=1e-6)


def test_scan_streaming_sentinel(tmp_path):
    """numrecs = -1 (STREAMING) files get their frame count inferred from
    the file size by scan/read/memmap alike."""
    import struct as _struct

    from colvarsfinder_tpu.utils import read_netcdf_memmap

    x = _coords(n=4, atoms=2)
    path = str(tmp_path / "stream.nc")
    write_netcdf(path, x)
    data = bytearray(open(path, "rb").read())
    data[4:8] = _struct.pack(">i", -1)
    with open(path, "wb") as f:
        f.write(bytes(data))
    assert scan_netcdf(path)["n_frames"] == 4
    coords, _dt, times = read_netcdf(path)
    assert len(coords) == len(times) == 4
    np.testing.assert_array_equal(coords, x)
    mm, _dt2, _t2 = read_netcdf_memmap(path, str(tmp_path / "st.npy"))
    np.testing.assert_array_equal(np.asarray(mm), x)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_roundtrip_vs_scipy(tmp_path, seed):
    """Randomized layouts (frame/atom counts, optional velocities/cell,
    random title) round-trip through our writer AND decode identically
    via scipy's independent implementation."""
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 40))
    atoms = int(rng.integers(1, 30))
    x = rng.normal(0, 50, (n, atoms, 3)).astype(np.float32)
    kw = {}
    if rng.random() < 0.5:
        kw["velocities"] = rng.normal(0, 5, x.shape).astype(np.float32)
    if rng.random() < 0.5:
        kw["cell_lengths"] = np.abs(rng.normal(30, 3, (n, 3)))
        kw["cell_angles"] = np.full((n, 3), 90.0)
    title = "".join(chr(int(c)) for c in rng.integers(65, 90, 12))
    path = str(tmp_path / f"f{seed}.nc")
    write_netcdf(path, x, dt_ps=float(rng.uniform(0.1, 5)), title=title,
                 **kw)

    coords, _dt, _times = read_netcdf(path)
    np.testing.assert_array_equal(coords, x)
    with netcdf_file(path, "r", mmap=False) as nc:
        np.testing.assert_array_equal(nc.variables["coordinates"][:], x)
        if "velocities" in kw:
            np.testing.assert_array_equal(
                nc.variables["velocities"][:], kw["velocities"]
            )
        if "cell_lengths" in kw:
            np.testing.assert_array_equal(
                nc.variables["cell_lengths"][:], kw["cell_lengths"]
            )
    assert scan_netcdf(path)["title"] == title

    from colvarsfinder_tpu.utils import read_netcdf_memmap

    mm, _d2, _t2 = read_netcdf_memmap(path, str(tmp_path / f"f{seed}.npy"))
    np.testing.assert_array_equal(np.asarray(mm), x)
