"""GT-depth eval metric (utils/export.eval_depth_vs_gt).

The reference loads ScanNet GT depth but never consumes it
(`data/scannet.py:76`); we close the loop with a traced-depth abs-rel/
RMSE metric. Oracle here: the untrained geometric-init SDF is ~a sphere
of radius `bias`, so traced depth from ring cameras must match the
analytic sphere depth to the known init tolerance (~0.1, cf.
tests/test_sphere_tracing.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from level_s2fm_tpu.config import Opt
from level_s2fm_tpu.data import synthetic
from level_s2fm_tpu.fields import radiance as radf, sdf as sdf_mod
from level_s2fm_tpu.geometry import lie
from level_s2fm_tpu.sfm import entities
from level_s2fm_tpu.utils import export as export_mod

RAD = 0.5
H = W = 48


def _build():
    opt = Opt({
        "Res": 100,
        "Ablate_config": {"dual_field": False},
        "SDF": {"arch": {"layers": [None, 64, 16], "skip": []},
                "NN_Init": {"scale_mlp": 1, "bias": RAD, "tf_init": True},
                "VolSDF": {"sample_intvs": 32, "final_sample_intvs": 16,
                           "volsdf_sampling": False, "max_upsample_iter": 2,
                           "iters_max_st": 20, "eps": 0.1, "beta_init": 0.05,
                           "rescale": 1.0, "beta_speed": 1.0,
                           "sdf_threshold": 1e-3},
                "Hash_config": {"compute_dtype": "float32"}},
        "RadF": {"arch": {"layers": [None, 64, 64, 3], "skip": []}},
        "data": {"bound_min": [-1, -1, -1], "bound_max": [1, 1, 1],
                 "inside": True, "bg_sdf": None, "bg_rad": 2.0,
                 "scene": "t", "bgcolor": [0, 0, 0], "image_size": [H, W]},
        "Renderer": {"rand_rays": 512},
    })
    sdf_cfg = sdf_mod.config_from_opt(opt)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"sdf": sdf_mod.init_params(k1, sdf_cfg),
              "rad": radf.init_params(k2, radf.config_from_opt(opt))}
    return params, sdf_cfg


def _analytic_sphere_zdepth(pose_w2c, K, h, w, rad):
    """z-depth (t along the (u,v,1)-parameterized ray) of the sphere hit,
    0 where the ray misses — i.e. what a perfect SDF trace reports."""
    R, t = pose_w2c[:, :3], pose_w2c[:, 3]
    cam = -R.T @ t
    ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
    dirs = (pix @ np.linalg.inv(K).T) @ R
    a = np.sum(dirs * dirs, -1)
    b = 2 * dirs @ cam
    c = cam @ cam - rad ** 2
    disc = b * b - 4 * a * c
    hit = disc > 0
    tdep = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0.0)
    return tdep.reshape(h, w).astype(np.float32)


@pytest.fixture(scope="module")
def camset_and_depth():
    scene = synthetic.make_scene(n_views=3, H=H, W=W, n_points=32, seed=0,
                                 sphere_rad=RAD)
    cs = entities.CameraSet()
    depth_gt = []
    for i in range(3):
        se3 = np.asarray(lie.SE3_to_se3(
            jnp.asarray(scene.poses_gt[i])[None]))[0]
        cam = entities.Camera(
            id=i, img=scene.images[i], intr=scene.intrs[i],
            pose_gt=scene.poses_gt[i], kypts=scene.kypts[i],
            matches=scene.matches[i], inlier_masks=scene.masks[i], se3=se3)
        cs.add(cam)
        # GT depth at 2x the image resolution: exercises the nearest
        # resampling path (ScanNet depth/color resolutions differ)
        K2 = scene.intrs[i].copy()
        K2[:2] *= 2
        depth_gt.append(_analytic_sphere_zdepth(scene.poses_gt[i], K2,
                                                2 * H, 2 * W, RAD))
    return cs, np.stack(depth_gt)


def test_depth_eval_matches_analytic(camset_and_depth):
    params, sdf_cfg = _build()
    cs, depth_gt = camset_and_depth
    res = export_mod.eval_depth_vs_gt(params, sdf_cfg, cs, depth_gt,
                                      factor=2, verbose=False)
    # sphere covers ~95 px/view on the 24x24 eval grid (3 views)
    assert res["n_px"] > 150
    assert len(res["per_view"]) == 3
    # init-SDF trace error ~0.1 on gt depth ~1.5 => abs_rel well under 0.25
    assert res["abs_rel"] < 0.25, res
    assert res["rmse"] < 0.4, res


def test_depth_eval_no_gt_pixels(camset_and_depth):
    params, sdf_cfg = _build()
    cs, depth_gt = camset_and_depth
    res = export_mod.eval_depth_vs_gt(params, sdf_cfg, cs,
                                      np.zeros_like(depth_gt), factor=2,
                                      verbose=False)
    assert res["n_px"] == 0 and np.isnan(res["abs_rel"])
