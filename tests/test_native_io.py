"""Native C++ IO library tests: build, parse parity, DCD decode parity."""

import numpy as np
import pytest

from colvarsfinder_tpu.utils import native_io
from colvarsfinder_tpu.utils.io import read_dcd, write_dcd
from colvarsfinder_tpu.utils.trajectory import _load_time_series

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library not built (no g++?)"
)


def test_native_text_parse_matches_pandas(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((500, 4))
    fname = tmp_path / "traj.txt"
    with open(fname, "w") as f:
        for row in data:
            f.write(" ".join(f"{x:.8f}" for x in row) + "\n")
    native = native_io.load_time_series(str(fname))
    assert native is not None
    assert native.shape == (500, 4)
    np.testing.assert_allclose(native, data, atol=1e-8)
    # the public loader also returns the same
    loaded = _load_time_series(str(fname))
    np.testing.assert_allclose(loaded, data, atol=1e-8)


def test_native_text_parse_irregular_whitespace(tmp_path):
    fname = tmp_path / "t.txt"
    fname.write_text("  1.0\t2.0   3.0 \n\n4.0 5.0 6.0\n")
    out = native_io.load_time_series(str(fname))
    np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6]])


def test_native_dcd_decode_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    coords = rng.standard_normal((7, 22, 3)).astype(np.float32)
    path = str(tmp_path / "t.dcd")
    write_dcd(path, coords, dt_ps=1.0)
    back, _ = read_dcd(path)  # uses native path when available
    np.testing.assert_allclose(back, coords, atol=1e-6)
