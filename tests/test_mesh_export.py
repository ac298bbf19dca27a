"""Marching tetrahedra + PLY round trip tests."""
import numpy as np

from level_s2fm_tpu.utils import marching_cubes as mc


def sphere_volume(n=48, r=0.5, lo=-1.0, hi=1.0):
    xs = np.linspace(lo, hi, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    return np.linalg.norm(g, axis=-1) - r, xs[1] - xs[0]


def test_sphere_mesh_radius():
    vol, sp = sphere_volume()
    verts, faces = mc.marching_cubes(vol, 0.0, origin=(-1, -1, -1),
                                     spacing=(sp, sp, sp))
    assert len(verts) > 500 and len(faces) > 500
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.01)
    assert r.std() < 0.01
    assert faces.max() < len(verts)


def test_empty_volume():
    vol = np.ones((8, 8, 8))
    verts, faces = mc.marching_cubes(vol, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_ply_roundtrip(tmp_path):
    vol, sp = sphere_volume(n=24)
    verts, faces = mc.marching_cubes(vol, 0.0, origin=(-1, -1, -1),
                                     spacing=(sp, sp, sp))
    path = str(tmp_path / "m.ply")
    mc.write_ply(path, verts, faces)
    v2, f2 = mc.read_ply(path)
    np.testing.assert_allclose(v2, verts, atol=1e-4)
    np.testing.assert_array_equal(f2, faces)


def test_mesh_is_connected_surface():
    """Every vertex should be used by at least one face after welding."""
    vol, sp = sphere_volume(n=24)
    verts, faces = mc.marching_cubes(vol, 0.0)
    used = np.zeros(len(verts), bool)
    used[faces.reshape(-1)] = True
    assert used.mean() > 0.99
