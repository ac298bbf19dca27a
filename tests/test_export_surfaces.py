"""Export surfaces: traced depth maps, NDC rays, novel-view video."""
import os

import numpy as np

import jax.numpy as jnp

from level_s2fm_tpu.geometry import transforms as T
from level_s2fm_tpu.sfm.phases import PhaseCfgs
from level_s2fm_tpu.utils import export as ex
from tests.test_dual_field import build


def _setup():
    params, sdf_cfg, rad_cfg, ren_cfg = build(dual=False)
    cfgs = PhaseCfgs(sdf=sdf_cfg, rad=rad_cfg, ren=ren_cfg, H=32, W=32,
                     rand_rays=512)
    pose = np.concatenate([np.eye(3, dtype=np.float32),
                           np.asarray([[0], [0], [2.0]], np.float32)], 1)
    K = np.asarray([[28.8, 0, 16], [0, 28.8, 16], [0, 0, 1]], np.float32)
    return params, cfgs, pose, K


def test_traced_depth_map():
    params, cfgs, pose, K = _setup()
    out = ex.render_traced_depth(params, cfgs.sdf, pose, K, 32, 32)
    assert out["depth"].shape == (32, 32)
    assert out["normal"].shape == (32, 32, 3)
    center = out["depth"][16, 16]
    # camera at z=-2 looking at the init sphere (r=0.5): front face depth ~1.5
    assert abs(center - 1.5) < 0.25
    assert out["finish"][16, 16]
    nn = np.linalg.norm(out["normal"][out["finish"]], axis=-1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-4)


def test_traced_depth_downscale():
    params, cfgs, pose, K = _setup()
    out = ex.render_traced_depth(params, cfgs.sdf, pose, K, 32, 32, factor=2)
    assert out["depth"].shape == (16, 16)


def test_convert_ndc_rays():
    pose = jnp.concatenate([jnp.eye(3), jnp.asarray([[0.0], [0.0], [0.0]])], 1)[None]
    K = jnp.asarray([[[20.0, 0, 16], [0, 20.0, 16], [0, 0, 1]]])
    grid = T.mesh_grid(8, 8)
    c, r = T.get_center_and_ray(pose, K[0], grid)
    # push rays forward so z>0 (the NDC convention assumes +z facing)
    c = c + jnp.asarray([0.0, 0.0, 2.0])
    cn, rn = T.convert_NDC(c, r, K, near=1.0)
    assert np.isfinite(np.asarray(cn)).all() and np.isfinite(np.asarray(rn)).all()
    # after reparametrization the center z must lie in [-1, 1]
    assert (np.asarray(cn)[..., 2] >= -1 - 1e-5).all()
    assert (np.asarray(cn)[..., 2] <= 1 + 1e-5).all()


def test_novel_view_video(tmp_path):
    params, cfgs, pose, K = _setup()
    frames = ex.render_novel_views(params, cfgs, pose, K, 16, 16, n_views=3,
                                   scale=0.05, out_dir=str(tmp_path),
                                   video=True)
    assert frames.shape == (3, 16, 16, 3)
    vids = [f for f in os.listdir(tmp_path) if f.endswith((".mp4", ".gif"))]
    assert vids, os.listdir(tmp_path)
