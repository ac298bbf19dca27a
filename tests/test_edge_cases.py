"""Failure-path and edge-case tests for the incremental pipeline."""
import numpy as np
import pytest

import dataclasses
import jax
import jax.numpy as jnp

from level_s2fm_tpu.config import build_options
from level_s2fm_tpu.data import synthetic
from level_s2fm_tpu.sfm import entities
from level_s2fm_tpu.sfm.pipeline import LevelSfM
from level_s2fm_tpu.sfm.registration import Registration


def test_registration_fails_without_covisibility(tmp_path):
    """A view sharing no matches must be rejected cleanly
    (ref `Registration.py:97-99` -> `LevelS2fM.py:306-308`)."""
    opt = build_options(["--yaml=configs/synthetic.yaml",
                         "--optim.init.max_iter=15", "--sfm_mode=fast",
                         f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=3, H=64, W=64, n_points=128, seed=0)
    var = synthetic.scene_to_var(scene)
    # cut all matches between view 2 and the others
    for i in range(3):
        for rel in range(2):
            pair_other = [j for j in range(3) if j != i][rel]
            if 2 in (i, pair_other):
                var["masks"][i][rel] = np.zeros_like(var["masks"][i][rel])
    m = LevelSfM(opt, seed=0)
    m.load_data(var)
    m.initialize_two_views(0, 1, verbose=False)
    cam2 = m._make_camera(2)
    reg = Registration(opt, m.cfgs, m.camera_set)
    ok, ratio, num = reg.pnp(m.params, cam2, m.point_set, if_nbv=True)
    assert not ok


def test_adaptive_volsdf_sampling_concentrates_near_surface(rng):
    from tests.test_dual_field import build
    from level_s2fm_tpu.rendering import renderer as ren_mod
    params, sdf_cfg, rad_cfg, ren_cfg = build(dual=False)
    cfg = dataclasses.replace(ren_cfg, volsdf_sampling=True,
                              max_upsample_iter=2, sample_intvs=32,
                              final_sample_intvs=32, ray_chunk=None)
    center = jnp.asarray([[[0.0, 0.0, -2.0]]])
    ray = jnp.asarray([[[0.0, 0.0, 1.0]]])
    d = np.asarray(ren_mod.volsdf_sampling(params["sdf"], sdf_cfg, cfg,
                                           center, ray))[0, 0]
    # surface at depth 1.5 (init sphere r=0.5): adaptive samples should
    # concentrate there vs uniform
    frac_near = np.mean(np.abs(d - 1.5) < 0.25)
    uniform_frac = 0.5 / 2.0  # band width / AABB span
    assert frac_near > uniform_frac * 1.5


def test_pointset_growth_and_track_update():
    ps = entities.PointSet(capacity=4)
    idx1 = ps.add_points(np.ones((3, 3), np.float32), [[(0, 1)], [(0, 2)], [(1, 3)]])
    idx2 = ps.add_points(np.zeros((5, 3), np.float32), [[(1, i)] for i in range(5)])
    assert len(ps) == 8 and list(idx2) == [3, 4, 5, 6, 7]
    ps.update_feat_tracks([0, 4], [(2, 9), (2, 10)])
    assert ps.tracks[0][-1] == (2, 9)
    assert ps.tracks[4][-1] == (2, 10)
    ps.update_xyzs([1], np.asarray([[5.0, 5.0, 5.0]], np.float32))
    np.testing.assert_allclose(ps.get_xyzs([1])[0], [5, 5, 5])


def test_infer_sdf_host_bucketed():
    """Bucketed host eval must match the direct eval and reuse buckets."""
    import numpy as np
    import jax
    from level_s2fm_tpu.fields import sdf as sdf_mod
    from tests.test_fused_normal import small_sdf_cfg

    cfg = small_sdf_cfg()
    params = sdf_mod.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    # two sizes in the same bucket (256) and one in the next (384)
    assert sdf_mod._host_bucket(100) == sdf_mod._host_bucket(250) == 256
    assert sdf_mod._host_bucket(257) == 384
    for n in (1, 100, 250, 300):
        pts = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
        got = sdf_mod.infer_sdf_host(params, cfg, pts)
        want = np.asarray(sdf_mod.infer_sdf(params, cfg, pts))[:, 0]
        assert got.shape == (n,)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert sdf_mod.infer_sdf_host(params, cfg, np.zeros((0, 3))).shape == (0,)


def test_checkpoint_v1_format_restores(tmp_path):
    """The round-1 checkpoint format (pickled treedef + leaves) must keep
    restoring after refactors of the v2 path-based format."""
    import pickle
    import jax
    import numpy as np
    from level_s2fm_tpu.utils import checkpoint as ck

    params = {"sdf": {"table": np.ones((2, 4, 2), np.float32),
                      "beta": np.asarray([-3.0], np.float32)},
              "rad": [np.zeros((3, 3), np.float32)]}
    leaves, treedef = jax.tree_util.tree_flatten(params)
    payload = {"version": 1, "it": 3,
               "treedef": pickle.dumps(treedef),
               "leaves": [np.asarray(l) for l in leaves],
               "cam_info": {"cam_id": []}, "pts_info": {"xyzs": []}}
    path = tmp_path / "model.ckpt"
    with open(path, "wb") as f:
        pickle.dump(payload, f)

    restored, cam_info, pts_info, it = ck.restore_checkpoint_sfm(str(path))
    assert it == 3 and cam_info == {"cam_id": []}
    for a, b in zip(jax.tree_util.tree_leaves(restored), leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # v3 (npz) roundtrip of the same tree through the path-based format
    class _Cams:
        def get_parameters(self):
            return {"pose_para": np.zeros((1, 6), np.float32),
                    "cam_id": [7],
                    "idx2d_to_3ds": [np.asarray([-1, 0, 2])]}

    class _Pts:
        def get_parameters(self):
            return {"xyzs": np.zeros((2, 3), np.float32),
                    "feat_tracks": [[(0, 1)], [(0, 2), (1, 0)]]}
    ck.save_checkpoint_sfm(str(tmp_path / "v3.ckpt"), params, _Cams(), _Pts(),
                           it=9)
    r2, ci, pi, it2 = ck.restore_checkpoint_sfm(str(tmp_path / "v3.ckpt"))
    assert it2 == 9 and ci["cam_id"] == [7]
    np.testing.assert_array_equal(ci["idx2d_to_3ds"][0], [-1, 0, 2])
    assert pi["feat_tracks"] == [[(0, 1)], [(0, 2), (1, 0)]]
    assert isinstance(r2["rad"], list)  # sequence structure survives
    for a, b in zip(jax.tree_util.tree_leaves(r2), leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
