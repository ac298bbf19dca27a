"""Camera-axis shape bucketing (bundle.cam_bucket / render_core cam_mask).

Every distinct camera count used to compile a fresh phase program
(multi-minute through the remote-TPU compiler); the camera axis is now
padded to ~2 buckets/octave with padded slots excluded from every loss.
These tests pin the invariant that padding is loss-neutral.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from level_s2fm_tpu.sfm import bundle, phases
from tests.test_dual_field import build


def test_cam_bucket_values():
    assert [bundle.cam_bucket(n) for n in (1, 2, 3, 4, 5, 7, 9, 13, 17)] == \
        [1, 2, 3, 4, 6, 8, 12, 16, 24]
    assert bundle.cam_bucket(128) == 128
    assert bundle.cam_bucket(129) % 32 == 0 and bundle.cam_bucket(129) >= 129


def test_pad_cam_ids_prefix():
    ids, n = bundle.pad_cam_ids([7, 3, 9, 1, 4])
    assert n == 5 and ids == [7, 3, 9, 1, 4, 7]


def _two_cam_setup(rand_rays):
    params, sdf_cfg, rad_cfg, ren_cfg = build(dual=False)
    ren_cfg = dataclasses.replace(ren_cfg, sample_intvs=16, ray_chunk=None)
    H = W = 16
    cfgs = phases.PhaseCfgs(sdf=sdf_cfg, rad=rad_cfg, ren=ren_cfg,
                            H=H, W=W, rand_rays=rand_rays,
                            dc_unfinish_weight=0.1)
    # two cameras on -z / +x looking at the origin sphere
    p0 = np.concatenate([np.eye(3), [[0], [0], [2.0]]], 1)
    Ry = np.asarray([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float64)
    p1 = np.concatenate([Ry, [[0], [0], [2.0]]], 1)
    poses = jnp.asarray(np.stack([p0, p1]), jnp.float32)
    intr = jnp.asarray([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]],
                       jnp.float32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0.2, 0.8, (2, H * W, 3)),
                         jnp.float32)
    from level_s2fm_tpu.geometry import transforms as T
    grid = T.mesh_grid(H, W)
    Nt = 8
    tracing = {
        "center": jnp.broadcast_to(jnp.asarray([0.0, 0, -2]), (2, Nt, 3)),
        "ray": jnp.broadcast_to(jnp.asarray([0.0, 0, 1]), (2, Nt, 3)),
        "xyz": jnp.asarray(rng.normal(size=(2, Nt, 3)) * 0.3, jnp.float32),
        "mask": jnp.ones((2, Nt), bool),
    }
    return params, cfgs, poses, intr, images, grid, tracing


def test_render_core_padding_is_loss_neutral():
    """C=2 unpadded vs C=4 padded (same per-camera ray count): every
    scalar loss/metric must agree to reduction tolerance."""
    params, cfgs2, poses, intr, images, grid, tracing = _two_cam_setup(256)
    cfgs4 = dataclasses.replace(cfgs2, rand_rays=512)  # 512//4 == 256//2
    key = jax.random.PRNGKey(42)

    out2 = phases.render_core(params, cfgs2, key, poses, intr, images, grid,
                              tracing=tracing)
    # padded axis: replicate camera 0; garbage image for padded slots
    poses4 = jnp.concatenate([poses, poses[:1], poses[:1]], 0)
    images4 = jnp.concatenate(
        [images, jnp.ones_like(images[:1]), jnp.ones_like(images[:1])], 0)
    tracing4 = {k: jnp.concatenate([v, v[:1], v[:1]], 0)
                for k, v in tracing.items()}
    tracing4["mask"] = tracing4["mask"].at[2:].set(False)
    cam_mask = jnp.asarray([True, True, False, False])
    out4 = phases.render_core(params, cfgs4, key, poses4, intr, images4,
                              grid, tracing=tracing4, cam_mask=cam_mask)

    for k in ("rgb_loss", "DC_loss", "PSNR", "tracing_loss"):
        np.testing.assert_allclose(np.asarray(out2[k]), np.asarray(out4[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    eik2 = phases.eikonal_from_normals(out2["normals"], out2["ray_real"])
    eik4 = phases.eikonal_from_normals(out4["normals"], out4["ray_real"])
    np.testing.assert_allclose(np.asarray(eik2), np.asarray(eik4),
                               rtol=2e-4, atol=2e-5)
    # padded rays are fully masked out of mask_bg
    assert not bool(out4["mask_bg"][2:].any())


def test_bundler_pads_camera_axis(tmp_path, monkeypatch):
    """A 2-camera BA padded to a 4-bucket runs, stays finite, and only
    writes back the real cameras."""
    from level_s2fm_tpu.config import build_options
    from level_s2fm_tpu.data import synthetic
    from level_s2fm_tpu.sfm.pipeline import LevelSfM

    monkeypatch.setattr(bundle, "cam_bucket", lambda n: 4)
    opt = build_options([
        "--yaml=configs/synthetic.yaml", "--optim.init.max_iter=20",
        "--optim.ba.max_iter=6", "--sfm_mode=fast",
        f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=2, H=64, W=64, n_points=256, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    m.initialize_two_views(0, 1, verbose=False)
    se3_before = {c: np.array(m.camera_set(c).se3) for c in (0, 1)}

    b = bundle.Bundler(opt, m.cfgs, m.camera_set, m.point_set,
                       cam_pick_ids=[0, 1], mode="sfm_refine")
    assert b.padded_ids == [0, 1, 0, 0] and b.C_real == 2
    assert b.batch["images"].shape[0] == 4
    assert np.asarray(b.batch["cam_mask"]).tolist() == [True, True, False,
                                                        False]
    params, reproj = b.run(m.params, jax.random.PRNGKey(0), verbose=False)
    assert np.isfinite(reproj)
    for leaf in jax.tree_util.tree_leaves(params):
        assert bool(jnp.isfinite(leaf).all())
    # BA moved the real poses (write-back hit the real prefix only)
    assert any(not np.allclose(se3_before[c], m.camera_set(c).se3)
               for c in (0, 1))
