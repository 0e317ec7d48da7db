"""Golden-file tests for the binary interchange formats.

Each test writes with our vectorized writer and re-reads with a struct-based
byte-literal reader (mirroring the documented layouts) to pin byte-exactness.
"""

import struct

import numpy as np
import pytest

from animsnapbases_tpu.io import binfmt


def _read_doubles(f, n):
    return [struct.unpack("<d", f.read(8))[0] for n_ in range(n)]


def test_components_bin_layout(tmp_path):
    rng = np.random.default_rng(0)
    K, N, dim = 4, 7, 3
    bases = rng.normal(size=(K, N, dim))
    path = tmp_path / "comps.bin"
    binfmt.write_components_bin(str(path), bases)

    # byte-literal re-read in the documented d -> k -> i order
    with open(path, "rb") as f:
        n_, dimk = struct.unpack("<ii", f.read(8))
        assert (n_, dimk) == (N, dim * K)
        for d in range(dim):
            for k in range(K):
                for i in range(N):
                    (val,) = struct.unpack("<d", f.read(8))
                    assert val == bases[k, i, d]
        assert f.read() == b""

    out = binfmt.read_components_bin(str(path), K=K, dim=dim)
    np.testing.assert_array_equal(out, bases)


def test_components_filename_grammar(tmp_path):
    bases = np.zeros((2, 3, 3))
    path = binfmt.write_components(str(tmp_path / "q_pos_"), 150, 2, 3, 3,
                                   bases, ".bin", "K")
    assert path.endswith("q_pos_F150K2.bin")
    path = binfmt.write_components(str(tmp_path / "p_nl_"), 150, 2, 3, 3,
                                   bases, ".bin", "Kp")
    assert path.endswith("p_nl_F150Kp2.bin")
    path = binfmt.write_components(str(tmp_path / "q_pos_"), 150, 2, 3, 3,
                                   bases, ".npy")
    assert path.endswith("q_pos_150K2.npy")


def test_points_vector_roundtrip(tmp_path):
    pts = np.array([3.0, 1.0, 4.0, 1.0, 5.0])
    path = binfmt.write_points_vector(str(tmp_path / "p_nl_interpol_points_"),
                                      150, 3, pts)
    assert path.endswith("p_nl_interpol_points_F150K3_points5.bin")
    with open(path, "rb") as f:
        n, one = struct.unpack("<ii", f.read(8))
        assert (n, one) == (5, 1)
        assert _read_doubles(f, 5) == pts.tolist()
    np.testing.assert_array_equal(binfmt.read_points_vector(path), pts)


def test_vector_roundtrip(tmp_path):
    v = np.arange(6, dtype=float)
    path = binfmt.write_vector(str(tmp_path / "corrVerts"), v)
    assert path.endswith("corrVerts_6.bin")
    np.testing.assert_array_equal(binfmt.read_points_vector(path), v)


def test_matrix_layout(tmp_path):
    mat = np.arange(12, dtype=float).reshape(3, 4)
    path = binfmt.write_matrix(str(tmp_path / "mat"), mat)
    with open(path, "rb") as f:
        d2, d1 = struct.unpack("<ii", f.read(8))
        assert (d2, d1) == (4, 3)  # column count first in the header
        vals = _read_doubles(f, 12)
    assert vals == list(mat.flatten())  # row-major payload
    np.testing.assert_array_equal(binfmt.read_matrix_bin(path), mat)


def test_masses_roundtrip(tmp_path):
    m = np.random.default_rng(1).random(11)
    path = str(tmp_path / "mass.bin")
    binfmt.write_masses_bin(path, m)
    np.testing.assert_array_equal(binfmt.read_masses_bin(path), m)


def test_tensor_colmajor_roundtrip(tmp_path):
    t = np.random.default_rng(2).normal(size=(5, 4, 3))
    path = str(tmp_path / "tensor.bin")
    binfmt.write_tensor_colmajor(path, t)
    with open(path, "rb") as f:
        dims = np.frombuffer(f.read(12), dtype="<u4")
        assert tuple(dims) == (5, 4, 3)
        payload = np.frombuffer(f.read(), dtype="<f8")
    np.testing.assert_array_equal(payload, t.flatten(order="F"))
    np.testing.assert_array_equal(binfmt.read_tensor_colmajor(path), t)


def test_sparse_bin_roundtrip(tmp_path):
    path = str(tmp_path / "sparse.bin")
    r = np.array([0, 1, 2])
    c = np.array([1, 0, 2])
    v = np.array([1.5, -2.0, 3.25])
    binfmt.write_sparse_bin(path, 3, 3, r, c, v)
    # byte-literal: interleaved (i32, i32, f64) records
    with open(path, "rb") as f:
        rows, cols, nnz = struct.unpack("<iii", f.read(12))
        assert (rows, cols, nnz) == (3, 3, 3)
        for k in range(3):
            ri, ci = struct.unpack("<ii", f.read(8))
            (vi,) = struct.unpack("<d", f.read(8))
            assert (ri, ci, vi) == (r[k], c[k], v[k])
    rows, cols, ro, co, vo = binfmt.read_sparse_bin(path)
    np.testing.assert_array_equal(ro, r)
    np.testing.assert_array_equal(co, c)
    np.testing.assert_array_equal(vo, v)
    sp = binfmt.read_sparse_scipy(path)
    assert sp.shape == (3, 3)
    assert sp[1, 0] == -2.0


def test_masses_bin_matches_reference_reader(tmp_path):
    """The reference reads masses with sequential struct.unpack('<d') after an
    (ni, mi) int header (posSnapshots.py:142-151) — pin that layout."""
    m = np.array([0.25, 0.5, 0.125])
    path = str(tmp_path / "m.bin")
    binfmt.write_masses_bin(path, m)
    with open(path, "rb") as f:
        ni = struct.unpack("<i", f.read(4))[0]
        mi = struct.unpack("<i", f.read(4))[0]
        assert ni == 3 and mi == 1
        vals = [struct.unpack("<d", f.read(8))[0] for _ in range(ni)]
    assert vals == m.tolist()
