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


def test_extract_mesh_high_res_sphere(tmp_path):
    """PCA-regrid two-pass mesh (ref plots.py:140-223): recovers a sphere
    with vertices ~on the radius and tighter sampling than single-pass."""
    import jax
    from level_s2fm_tpu.utils import export as export_mod
    from level_s2fm_tpu.config import Opt
    from level_s2fm_tpu.fields import sdf as sdf_mod
    o = Opt({"Res": 100, "Ablate_config": {"dual_field": False},
             "SDF": {"arch": {"layers": [None, 32, 16], "skip": []},
                     "NN_Init": {"scale_mlp": 1, "bias": 0.4, "tf_init": True},
                     "VolSDF": {"sample_intvs": 16, "final_sample_intvs": 8,
                                "volsdf_sampling": False, "max_upsample_iter": 2,
                                "iters_max_st": 6, "eps": 0.1, "beta_init": 0.05,
                                "rescale": 1.0, "beta_speed": 1.0,
                                "sdf_threshold": 1e-3},
                     "Hash_config": {"n_levels": 4, "n_features_per_level": 2,
                                     "log2_hashmap_size": 12,
                                     "base_resolution": 8}},
             "RadF": {"arch": {"layers": [None, 16, 16, 3], "skip": []}},
             "data": {"bound_min": [-1, -1, -1], "bound_max": [1, 1, 1],
                      "inside": True, "bg_sdf": None, "bg_rad": 2.0,
                      "scene": "m", "bgcolor": [0, 0, 0]}})
    cfg = sdf_mod.config_from_opt(o)
    params = {"sdf": sdf_mod.init_params(jax.random.PRNGKey(0), cfg)}
    path = str(tmp_path / "hr.ply")
    verts, faces = export_mod.extract_mesh_high_res(
        params, cfg, path, resolution=64, low_resolution=32)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    # geometric init ~ sphere of radius 0.4
    assert abs(float(np.median(r)) - 0.4) < 0.08
    import os as _os
    assert _os.path.exists(path)
