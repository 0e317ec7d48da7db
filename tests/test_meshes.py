import numpy as np
import pytest

from animsnapbases_tpu.io import meshes


TET_VERTS = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
TET_FACES = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])


def test_off_roundtrip(tmp_path):
    path = str(tmp_path / "tet.off")
    meshes.save_off(path, TET_VERTS, TET_FACES)
    v, f = meshes.load_off(path)
    np.testing.assert_allclose(v, TET_VERTS)
    np.testing.assert_array_equal(f, TET_FACES)


def test_coff_colors(tmp_path):
    path = tmp_path / "c.off"
    path.write_text(
        "COFF\n2 0 0\n0 0 0 255 0 0\n1 1 1 0 255 0\n")
    v, colors, f = meshes.load_off(str(path), no_colors=False)
    assert v.shape == (2, 3)
    assert colors.shape == (2, 3)
    assert f is None


def test_obj_roundtrip(tmp_path):
    path = str(tmp_path / "tet.obj")
    meshes.save_obj(path, TET_VERTS, TET_FACES)
    v, f = meshes.load_obj(path)
    np.testing.assert_allclose(v, TET_VERTS)
    np.testing.assert_array_equal(f, TET_FACES)


def test_obj_quad_triangulation(tmp_path):
    path = tmp_path / "quad.obj"
    path.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    v, f = meshes.load_obj(str(path))
    assert f.shape == (2, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])


def test_obj_with_texture_normals(tmp_path):
    path = tmp_path / "vt.obj"
    path.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nf 1/1 2/1 3/1\n")
    v, f = meshes.load_obj(str(path))
    np.testing.assert_array_equal(f, [[0, 1, 2]])


def test_obj_non_utf8_comment(tmp_path):
    # OBJ headers in the wild carry latin-1 bytes (the reference's
    # armadillo.obj has a (c) sign, 0xa9) — the loader must not choke
    path = tmp_path / "copyright.obj"
    path.write_bytes(b"# \xa9 some artist\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
                     b"f 1 2 3\n")
    v, f = meshes.load_obj(str(path))
    assert v.shape == (3, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2]])


def test_ply_ascii(tmp_path):
    path = tmp_path / "tri.ply"
    path.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 3\nproperty float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    v, f = meshes.load_ply(str(path))
    assert v.shape == (3, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2]])


def test_medit_roundtrip(tmp_path):
    path = str(tmp_path / "tet.mesh")
    tets = np.array([[0, 1, 2, 3]])
    meshes.save_medit_mesh(path, TET_VERTS, tets=tets, tris=TET_FACES)
    v, t, f = meshes.load_medit_mesh(path)
    np.testing.assert_allclose(v, TET_VERTS)
    np.testing.assert_array_equal(t, tets)
    np.testing.assert_array_equal(f, TET_FACES)


def test_medit_reads_reference_bar():
    """The committed bar.mesh from the reference data set must parse."""
    v, t, f = meshes.load_medit_mesh("/root/reference/data/bar.mesh")
    assert v.shape[0] == 1000
    assert t.shape[1] == 4 and t.shape[0] > 0
    assert t.min() >= 0 and t.max() < v.shape[0]


def test_load_reference_obj():
    v, f = meshes.load_obj("/root/reference/data/sphere.obj")
    assert v.shape[0] == 382
    assert f.min() >= 0 and f.max() < v.shape[0]


def test_auto_dispatch(tmp_path):
    path = str(tmp_path / "m.obj")
    meshes.save_obj(path, TET_VERTS, TET_FACES)
    v, f = meshes.load_mesh_auto(path)
    assert v.shape == (4, 3)
    with pytest.raises(ValueError):
        meshes.load_mesh_auto("foo.xyz")
