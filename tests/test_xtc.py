"""XTC codec tests: quantization semantics, roundtrips across coordinate
regimes (exercising the run-length / magnitude-class transitions), file
structure golden bytes, and trajectory-pipeline integration."""

import struct

import numpy as np
import pytest

from colvarsfinder_tpu.utils.xtc import (
    XTC_MAGIC,
    _decode_frame_coords,
    _encode_frame_coords,
    read_xtc,
    write_xtc,
)


def _roundtrip_frame(coords, precision=1000.0):
    blob = _encode_frame_coords(np.asarray(coords, np.float32), precision)
    out, prec, off = _decode_frame_coords(
        memoryview(blob), 0, len(coords)
    )
    assert off == len(blob)
    assert prec == precision
    return out


def test_frame_roundtrip_random_spread_out():
    """Widely spread coordinates: no small-delta runs, pure big encoding."""
    rng = np.random.default_rng(0)
    coords = rng.uniform(-5, 5, (50, 3)).astype(np.float32)
    out = _roundtrip_frame(coords)
    np.testing.assert_allclose(out, coords, atol=0.5e-3 + 1e-6)


def test_frame_roundtrip_clustered():
    """Tightly clustered atoms trigger the small-delta run path (and the
    water-swap heuristic)."""
    rng = np.random.default_rng(1)
    base = rng.uniform(-2, 2, (10, 1, 3))
    jitter = rng.uniform(-0.005, 0.005, (10, 8, 3))
    coords = (base + jitter).reshape(-1, 3).astype(np.float32)
    out = _roundtrip_frame(coords)
    np.testing.assert_allclose(out, coords, atol=0.5e-3 + 1e-6)


def test_frame_roundtrip_molecule_like():
    """Bonded-chain geometry (~0.1 nm steps): mixed big/small encoding with
    magnitude-class growth and shrinkage."""
    rng = np.random.default_rng(2)
    steps = rng.normal(0, 0.1, (200, 3))
    coords = np.cumsum(steps, axis=0).astype(np.float32)
    out = _roundtrip_frame(coords)
    np.testing.assert_allclose(out, coords, atol=0.5e-3 + 1e-6)


def test_frame_roundtrip_high_precision():
    rng = np.random.default_rng(3)
    coords = rng.uniform(-1, 1, (22, 3)).astype(np.float32)
    out = _roundtrip_frame(coords, precision=100000.0)
    np.testing.assert_allclose(out, coords, atol=0.5e-5 + 1e-7)


def test_frame_roundtrip_identical_atoms():
    """Degenerate case: all atoms at the same point (sizeint == 1)."""
    coords = np.ones((12, 3), dtype=np.float32) * 0.25
    out = _roundtrip_frame(coords)
    np.testing.assert_allclose(out, coords, atol=1e-3)


def test_quantization_is_round_to_nearest():
    coords = np.array([[0.0012344, -0.0016, 0.0024]], dtype=np.float32)
    # natoms <= 9 stores plain floats; force the compressed path with 10
    coords = np.tile(coords, (10, 1)) + np.arange(10)[:, None] * 0.1
    out = _roundtrip_frame(coords, precision=1000.0)
    np.testing.assert_allclose(
        out, np.round(coords * 1000) / 1000, atol=1e-6
    )


def test_file_roundtrip_multiframe(tmp_path):
    rng = np.random.default_rng(4)
    coords = np.cumsum(
        rng.normal(0, 0.05, (7, 22, 3)), axis=0
    ).astype(np.float32)
    path = str(tmp_path / "t.xtc")
    write_xtc(path, coords, dt_ps=10.0, t0_ps=5.0)
    back, dt, times = read_xtc(path)
    assert back.shape == coords.shape
    np.testing.assert_allclose(back, coords, atol=0.5e-3 + 1e-6)
    assert abs(dt - 10.0) < 1e-5
    np.testing.assert_allclose(times, 5.0 + 10.0 * np.arange(7), atol=1e-4)


def test_file_roundtrip_small_system_plain_floats(tmp_path):
    """natoms <= 9 stores uncompressed floats (format rule) — lossless."""
    rng = np.random.default_rng(5)
    coords = rng.standard_normal((4, 5, 3)).astype(np.float32)
    path = str(tmp_path / "small.xtc")
    write_xtc(path, coords, dt_ps=2.0)
    back, dt, _ = read_xtc(path)
    np.testing.assert_array_equal(back, coords)
    assert abs(dt - 2.0) < 1e-6


def test_header_layout_golden(tmp_path):
    """Fixed header fields: XDR big-endian magic/natoms/step/time."""
    coords = np.zeros((2, 5, 3), dtype=np.float32)
    path = str(tmp_path / "h.xtc")
    write_xtc(path, coords, dt_ps=4.0, step_interval=100)
    with open(path, "rb") as f:
        data = f.read()
    magic, natoms, step, t = struct.unpack_from(">iiif", data, 0)
    assert magic == XTC_MAGIC and natoms == 5 and step == 0 and t == 0.0
    # lsize is repeated before the coordinate payload (libxdrf convention)
    (lsize,) = struct.unpack_from(">i", data, 16 + 36)
    assert lsize == 5
    # second frame: 16-byte header + 36-byte box + lsize + 5*12 plain floats
    off2 = 16 + 36 + 4 + 60
    magic2, _, step2, t2 = struct.unpack_from(">iiif", data, off2)
    assert magic2 == XTC_MAGIC and step2 == 100 and abs(t2 - 4.0) < 1e-6


def test_bad_magic_raises(tmp_path):
    path = str(tmp_path / "bad.xtc")
    with open(path, "wb") as f:
        f.write(struct.pack(">iiif", 1234, 3, 0, 0.0) + b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        read_xtc(path)


def test_native_decoder_matches_python(tmp_path):
    """The C++ bulk decoder must agree bit-exactly with the Python codec
    across mixed big/small-delta encodings."""
    from colvarsfinder_tpu.utils import native_io

    if not native_io.available() or native_io.decode_xtc.__doc__ is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    coords = np.cumsum(
        rng.normal(0, 0.03, (50, 64, 3)), axis=0
    ).astype(np.float32) + 2.0
    path = str(tmp_path / "x.xtc")
    write_xtc(path, coords, dt_ps=2.0)

    native = native_io.decode_xtc(path)
    if native is None:
        pytest.skip("native xtc decoder not built")
    ncoords, ntimes = native

    # python path, bypassing the native fast path
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    frames, off = [], 0
    while off + 16 <= len(buf):
        off += 52
        fr, _p, off = _decode_frame_coords(buf, off, 64)
        frames.append(fr)
    py = np.stack(frames)
    np.testing.assert_array_equal(ncoords, py)
    np.testing.assert_allclose(ntimes, 2.0 * np.arange(50), atol=1e-4)


def test_xtc_feeds_weighted_trajectory(tmp_path):
    """End-to-end: XTC -> WeightedTrajectory (the reference's dipeptide
    ingestion path, main.ipynb cell 2, without MDAnalysis)."""
    from colvarsfinder_tpu.utils import WeightedTrajectory

    rng = np.random.default_rng(6)
    coords = np.cumsum(
        rng.normal(0, 0.02, (20, 10, 3)), axis=0
    ).astype(np.float32)
    path = str(tmp_path / "traj.xtc")
    write_xtc(path, coords, dt_ps=10.0)

    frames, dt_ps, _ = read_xtc(path)
    traj = WeightedTrajectory(
        trajectory=frames, dt=dt_ps * 1e-3  # ps -> ns, reference convention
    )
    assert traj.trajectory.shape == (20, 10, 3)
    assert abs(traj.dt - 0.01) < 1e-9


def test_corrupt_minmax_header_raises_cleanly(tmp_path):
    """maxint < minint in a frame header must raise the documented
    ValueError in the Python codec, and the native bulk decoder must fall
    back (return fewer frames / None) rather than corrupt memory."""
    rng = np.random.default_rng(8)
    coords = rng.uniform(0, 2, (2, 22, 3)).astype(np.float32)
    path = str(tmp_path / "c.xtc")
    write_xtc(path, coords, dt_ps=1.0)
    data = bytearray(open(path, "rb").read())
    # frame 0 compressed block: header(16) + box(36), then lsize+prec(8),
    # minint at +8 .. maxint at +20; swap them to force maxint < minint
    base = 16 + 36 + 8
    lo = bytes(data[base:base + 12])
    hi = bytes(data[base + 12:base + 24])
    data[base:base + 12] = hi
    data[base + 12:base + 24] = lo
    bad = str(tmp_path / "bad.xtc")
    open(bad, "wb").write(bytes(data))

    from colvarsfinder_tpu.utils import native_io

    native = native_io.decode_xtc(bad)
    assert native is None or len(native[0]) < 2  # clean refusal, no crash

    with pytest.raises(ValueError, match="corrupt"):
        # bypass the native path to exercise the Python decoder
        buf = memoryview(bytes(data))
        _decode_frame_coords(buf, 16 + 36, 22)


def test_fuzz_corrupted_files_never_crash(tmp_path):
    """Random truncations and byte flips must produce clean Python errors
    (ValueError) or clean native refusals — never crashes or OOB reads."""
    from colvarsfinder_tpu.utils import native_io

    rng = np.random.default_rng(123)
    coords = np.cumsum(
        rng.normal(0, 0.05, (4, 22, 3)), axis=0
    ).astype(np.float32)
    path = str(tmp_path / "base.xtc")
    write_xtc(path, coords, dt_ps=1.0)
    blob = open(path, "rb").read()

    for trial in range(60):
        data = bytearray(blob)
        if trial % 2 == 0:
            data = data[: rng.integers(1, len(data))]  # truncate
        else:
            for _ in range(rng.integers(1, 6)):  # flip random bytes
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
        bad = str(tmp_path / f"fuzz{trial}.xtc")
        open(bad, "wb").write(bytes(data))

        # native bulk decoder: any outcome but a crash/garbage-size is fine
        out = native_io.decode_xtc(bad)
        if out is not None:
            assert out[0].shape[1:] == (22, 3)
            assert len(out[0]) <= 4

        # full reader (native first, Python fallback): clean ValueError or
        # a (possibly partial) parse — never a crash or giant allocation
        try:
            frames, _dt, _times = read_xtc(bad)
            assert frames.shape[0] <= 4
        except ValueError:
            pass


@pytest.mark.parametrize(
    "case",
    ["spread", "clustered", "large_extent", "mixed", "ten_atoms", "small"],
)
def test_native_encoder_bitidentical_with_python(tmp_path, case):
    """The C++ bulk encoder must produce byte-identical files to the Python
    codec across coordinate regimes (big-branch, run-length deltas,
    bitsize==0 wide extents, and the <=9-atom plain-float branch)."""
    from colvarsfinder_tpu.utils import native_io

    if not native_io.available() or not hasattr(
        native_io._load(), "xtc_encode"
    ):
        pytest.skip("native xtc encoder not built")

    rng = np.random.default_rng(7)
    coords = {
        "spread": rng.uniform(-5, 5, (20, 40, 3)),
        "clustered": rng.uniform(0, 2, (12, 1, 3))
        + 0.002 * rng.standard_normal((12, 150, 3)),
        "large_extent": rng.uniform(-2e4, 2e4, (8, 30, 3)),
        "mixed": np.concatenate(
            [rng.uniform(0, 1, (6, 25, 3)), rng.uniform(0, 3000, (6, 25, 3))],
            axis=1,
        ),
        "ten_atoms": rng.uniform(0, 5, (5, 10, 3)),
        "small": rng.uniform(0, 5, (5, 6, 3)),  # plain-float branch
    }[case].astype(np.float32)

    p_native = str(tmp_path / "native.xtc")
    p_python = str(tmp_path / "python.xtc")
    write_xtc(p_native, coords, dt_ps=2.0)  # native path (when built)
    real = native_io.encode_xtc
    native_io.encode_xtc = lambda *a, **k: False
    try:
        write_xtc(p_python, coords, dt_ps=2.0)
    finally:
        native_io.encode_xtc = real

    with open(p_native, "rb") as f1, open(p_python, "rb") as f2:
        assert f1.read() == f2.read()

    out, dt, _ = read_xtc(p_native)
    assert dt == 2.0
    tol = 5e-4 * max(1.0, float(np.abs(coords).max()) / 1000.0) + 1e-6
    np.testing.assert_allclose(out, coords, atol=tol)


def test_native_encoder_overflow_raises(tmp_path):
    from colvarsfinder_tpu.utils import native_io

    if not native_io.available() or not hasattr(
        native_io._load(), "xtc_encode"
    ):
        pytest.skip("native xtc encoder not built")
    coords = np.full((1, 12, 3), 3e6, dtype=np.float32)  # 3e9 > 2^31 quanta
    with pytest.raises(ValueError, match="precision"):
        write_xtc(str(tmp_path / "x.xtc"), coords, precision=1000.0)


def test_native_encoder_bitidentical_nonf32_precision(tmp_path):
    """Quantization must use the full-double precision factor: 100.3 is
    not exactly representable in f32, so an f32-narrowed factor rounds
    boundary values differently from the Python codec."""
    from colvarsfinder_tpu.utils import native_io

    if not native_io.available() or not hasattr(
        native_io._load(), "xtc_encode"
    ):
        pytest.skip("native xtc encoder not built")
    rng = np.random.default_rng(11)
    coords = rng.uniform(-50, 50, (30, 40, 3)).astype(np.float32)
    p_native = str(tmp_path / "n.xtc")
    p_python = str(tmp_path / "p.xtc")
    write_xtc(p_native, coords, precision=100.3)
    real = native_io.encode_xtc
    native_io.encode_xtc = lambda *a, **k: False
    try:
        write_xtc(p_python, coords, precision=100.3)
    finally:
        native_io.encode_xtc = real
    with open(p_native, "rb") as f1, open(p_python, "rb") as f2:
        assert f1.read() == f2.read()


def test_scan_xtc_counts_frames(tmp_path, monkeypatch):
    from colvarsfinder_tpu.utils import native_io
    from colvarsfinder_tpu.utils.xtc import scan_xtc

    rng = np.random.default_rng(3)
    coords = rng.normal(0, 1, (7, 20, 3)).astype(np.float32)
    path = str(tmp_path / "scan.xtc")
    write_xtc(path, coords, dt_ps=1.0)

    assert scan_xtc(path) == (7, 20)
    # pure-Python header walk (mmap'd) must agree
    monkeypatch.setattr(native_io, "scan_xtc", lambda _p: None)
    assert scan_xtc(path) == (7, 20)


def test_read_xtc_memmap_matches_read_xtc(tmp_path, monkeypatch):
    """Decoding straight into an on-disk .npy memmap must be bit-identical
    to the in-RAM decode, on both the native and the Python paths."""
    from colvarsfinder_tpu.utils import native_io
    from colvarsfinder_tpu.utils.xtc import read_xtc_memmap

    rng = np.random.default_rng(9)
    coords = np.cumsum(
        rng.normal(0, 0.05, (30, 40, 3)), axis=0
    ).astype(np.float32)
    path = str(tmp_path / "big.xtc")
    write_xtc(path, coords, dt_ps=2.0)
    ref, ref_dt, ref_times = read_xtc(path)

    mm, dt, times = read_xtc_memmap(path, str(tmp_path / "a.npy"))
    assert isinstance(mm, np.memmap)
    np.testing.assert_array_equal(np.asarray(mm), ref)
    assert dt == ref_dt
    np.testing.assert_allclose(times, ref_times, atol=1e-5)
    # the artifact must reload as a standard .npy
    reread = np.load(str(tmp_path / "a.npy"), mmap_mode="r")
    np.testing.assert_array_equal(np.asarray(reread), ref)

    # force the Python per-frame fallback
    monkeypatch.setattr(native_io, "decode_xtc", lambda *_a, **_k: None)
    monkeypatch.setattr(native_io, "scan_xtc", lambda _p: None)
    mm2, dt2, times2 = read_xtc_memmap(path, str(tmp_path / "b.npy"))
    np.testing.assert_array_equal(np.asarray(mm2), ref)
    assert dt2 == ref_dt


def test_read_xtc_memmap_small_atoms(tmp_path):
    """natoms <= 9 frames use the plain-float branch."""
    from colvarsfinder_tpu.utils.xtc import read_xtc_memmap, scan_xtc

    coords = np.arange(5 * 3 * 3, dtype=np.float32).reshape(5, 3, 3) * 0.01
    path = str(tmp_path / "small.xtc")
    write_xtc(path, coords, dt_ps=1.0)
    assert scan_xtc(path) == (5, 3)
    mm, _dt, _t = read_xtc_memmap(path, str(tmp_path / "s.npy"))
    ref, _, _ = read_xtc(path)
    np.testing.assert_array_equal(np.asarray(mm), ref)
