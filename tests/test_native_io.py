"""Native (C++) I/O runtime: byte parity with the Python codecs and the
threaded OFF sequence loader."""

import os

import numpy as np
import pytest

from animsnapbases_tpu.geometry.procedural import cloth_model
from animsnapbases_tpu.io import binfmt, meshes
from animsnapbases_tpu.io import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def test_native_load_off_matches_python(tmp_path):
    V, F = cloth_model(7, 5)
    path = str(tmp_path / "m.off")
    meshes.save_off(path, V, F)
    v_py, f_py = meshes.load_off(path)
    v_na, f_na = native.load_off(path)
    np.testing.assert_allclose(v_na, v_py)
    np.testing.assert_array_equal(f_na, f_py)


def test_native_sequence_loader(tmp_path):
    V, F = cloth_model(6, 6)
    rng = np.random.default_rng(0)
    paths = []
    frames = []
    for i in range(12):
        vi = V + 0.1 * rng.normal(size=V.shape)
        p = str(tmp_path / f"pos_{i}.off")
        meshes.save_off(p, vi, F)
        paths.append(p)
        frames.append(vi)
    verts, faces = native.load_off_sequence(paths, n_threads=4)
    assert verts.shape == (12, 36, 3)
    np.testing.assert_allclose(verts, np.stack(frames), atol=1e-12)
    np.testing.assert_array_equal(faces, F)


def test_native_components_bin_byte_parity(tmp_path):
    rng = np.random.default_rng(1)
    bases = rng.normal(size=(5, 9, 3))
    py_path = str(tmp_path / "py.bin")
    na_path = str(tmp_path / "na.bin")
    binfmt.write_components_bin(py_path, bases)
    native.write_components_bin(na_path, bases)
    with open(py_path, "rb") as a, open(na_path, "rb") as b:
        assert a.read() == b.read()
    out = native.read_components_bin(py_path, K=5, N=9)
    np.testing.assert_array_equal(out, bases)


def test_native_vector_bin_byte_parity(tmp_path):
    v = np.random.default_rng(2).normal(size=17)
    py_path = str(tmp_path / "py.bin")
    na_path = str(tmp_path / "na.bin")
    binfmt.write_masses_bin(py_path, v)
    native.write_vector_bin(na_path, v)
    with open(py_path, "rb") as a, open(na_path, "rb") as b:
        assert a.read() == b.read()
    np.testing.assert_array_equal(native.read_vector_bin(py_path, 17), v)
