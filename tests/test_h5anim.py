import numpy as np

from animsnapbases_tpu.io import h5anim


def test_animation_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(5, 10, 3)).astype(np.float32)
    tris = rng.integers(0, 10, size=(6, 3))
    path = str(tmp_path / "anim.h5")
    h5anim.write_animation_h5(path, verts, tris, mean=np.zeros(3), scale=2.0)
    v, t, attrs = h5anim.read_animation_h5(path)
    np.testing.assert_allclose(v, verts, rtol=1e-6)
    np.testing.assert_array_equal(t, tris)
    assert attrs["scale"] == 2.0
    assert v.dtype == np.float64  # reference reads .astype(float)


def test_components_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    rest = rng.normal(size=(10, 3))
    tris = rng.integers(0, 10, size=(6, 3))
    comps = rng.normal(size=(4, 10, 3))
    path = str(tmp_path / "components.h5")
    h5anim.write_components_h5(path, rest, tris, comps)
    r, t, c, names = h5anim.read_components_h5(path)
    np.testing.assert_allclose(r, rest)
    np.testing.assert_allclose(c, comps)
    assert names == [f"comp{i:03d}" for i in range(4)]
