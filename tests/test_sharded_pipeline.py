"""Run real phase steps with an active 8-device mesh (sharded batches)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from level_s2fm_tpu.config import build_options
from level_s2fm_tpu.data import synthetic
from level_s2fm_tpu.parallel import mesh as pmesh
from level_s2fm_tpu.sfm.bundle import Bundler
from level_s2fm_tpu.sfm.pipeline import LevelSfM


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_bundler_with_active_mesh(tmp_path):
    opt = build_options([
        "--yaml=configs/synthetic.yaml", "--optim.init.max_iter=20",
        "--optim.ba.max_iter=10", "--sfm_mode=fast",
        f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=2, H=64, W=64, n_points=256, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    m.initialize_two_views(0, 1, verbose=False)

    mesh = pmesh.make_mesh(8)
    with pmesh.use_mesh(mesh):
        b = Bundler(opt, m.cfgs, m.camera_set, m.point_set,
                    cam_pick_ids=[0, 1], mode="sfm")
        params, reproj = b.run(m.params, jax.random.PRNGKey(0), verbose=False)
    assert np.isfinite(reproj)
    for leaf in jax.tree_util.tree_leaves(params):
        assert bool(jnp.isfinite(leaf).all())


# --------------------------------------------------------------------------
# Multi-device NUMERICAL EQUIVALENCE (round-3, VERDICT item 3).
#
# Measured divergence structure (CPU, deterministic): one sharded phase
# step differs from the unsharded step only by float reduction-order
# noise (~6e-7); a 20-iter scanned phase amplifies that to ~2e-4 through
# the chaotic joint optimization; a full 3-view pipeline amplifies it to
# ~1.8deg rotation / 4 points. The tests below pin each level at the
# tolerance the amplification allows — a genuine sharding bug (wrong
# psum, padded rows leaking into a loss) shows up orders of magnitude
# above these bounds at the single-phase level.
# --------------------------------------------------------------------------

def _snapshot(m):
    return ([c.se3.copy() for c in m.camera_set.cameras],
            np.asarray(m.point_set.all_xyzs()).copy())


def _restore(m, snap):
    for c, se3 in zip(m.camera_set.cameras, snap[0]):
        c.se3 = se3.copy()
    m.point_set.update_xyzs(np.arange(len(m.point_set)), snap[1])


def _max_param_diff(p1, p2):
    l1, l2 = jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    return max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - b.astype(jnp.float32))))
               for a, b in zip(l1, l2))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_bundler_sharded_equals_unsharded(tmp_path):
    """A full scanned BA run (both modes) on 8 devices matches the
    1-device run essentially bit-for-bit on identical batches."""
    opt = build_options([
        "--yaml=configs/synthetic.yaml", "--optim.init.max_iter=20",
        "--optim.ba.max_iter=10", "--sfm_mode=fast",
        f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=2, H=64, W=64, n_points=256, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    m.initialize_two_views(0, 1, verbose=False)
    key = jax.random.PRNGKey(42)
    snap = _snapshot(m)
    for mode in ("sfm", "sfm_refine"):
        _restore(m, snap)
        b1 = Bundler(opt, m.cfgs, m.camera_set, m.point_set,
                     cam_pick_ids=[0, 1], mode=mode)
        p1, r1 = b1.run(m.params, key, verbose=False)
        se3_1 = m.camera_set.all_se3().copy()
        _restore(m, snap)
        with pmesh.use_mesh(pmesh.make_mesh(8)):
            b2 = Bundler(opt, m.cfgs, m.camera_set, m.point_set,
                         cam_pick_ids=[0, 1], mode=mode)
            p2, r2 = b2.run(m.params, key, verbose=False)
        se3_2 = m.camera_set.all_se3().copy()
        assert abs(r1 - r2) < 1e-4, mode
        assert _max_param_diff(p1, p2) < 1e-5, mode
        assert np.abs(se3_1 - se3_2).max() < 1e-5, mode


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_init_phase_sharded_equivalence(tmp_path):
    """Two-view init on 8 devices matches 1 device to reduction-order
    noise (<1e-4 after 5 scanned iters) and triangulates the SAME points."""
    def build():
        opt = build_options([
            "--yaml=configs/synthetic.yaml", "--optim.init.max_iter=5",
            "--Renderer.rand_rays=480", "--sfm_mode=fast",
            f"--output_root={tmp_path}"])
        scene = synthetic.make_scene(n_views=3, H=64, W=64, n_points=256,
                                     seed=0)
        m = LevelSfM(opt, seed=0)
        m.load_data(synthetic.scene_to_var(scene))
        return m
    m1 = build()
    m1.initialize_two_views(0, 1, verbose=False)
    m2 = build()
    with pmesh.use_mesh(pmesh.make_mesh(8)):
        m2.initialize_two_views(0, 1, verbose=False)
    assert _max_param_diff(m1.params, m2.params) < 1e-4
    assert len(m1.point_set) == len(m2.point_set)
    np.testing.assert_allclose(np.asarray(m1.point_set.all_xyzs()),
                               np.asarray(m2.point_set.all_xyzs()), atol=1e-4)
    np.testing.assert_allclose(m1.camera_set.all_se3(),
                               m2.camera_set.all_se3(), atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_full_pipeline_1_vs_8_devices(tmp_path):
    """The same fast 3-view pipeline on 1 vs 8 devices: both register all
    views and final rot/t/reproj + point count agree within the bounds
    chaotic amplification allows (measured deterministic deltas: 1.8deg /
    5e-4 / 4e-3 px / 4 pts — asserted at ~2x margin)."""
    import train as train_mod

    def run(extra, tag):
        m = train_mod.main([
            "--yaml=configs/synthetic.yaml", "--sfm_mode=fast",
            "--max_views=3", "--Renderer.rand_rays=480",
            "--optim.init.max_iter=20", "--optim.geoinit.max_iter=4",
            "--optim.ba.max_iter=10",
            f"--output_root={tmp_path / tag}"] + extra)
        assert len(m.camera_set) == 3
        r, t, ate = m.camera_set.eval_poses(verbose=False)
        reproj = [h["reproj_px"] for h in m.metrics.history
                  if "reproj_px" in h][-1]
        return ((float(r), float(t), float(ate), float(reproj),
                 len(m.point_set)),
                m.camera_set.all_se3().copy(),
                np.asarray(m.point_set.all_xyzs()).copy())

    (r1, t1, a1, e1, n1), se3_1, pts1 = run([], "d1")
    (r8, t8, a8, e8, n8), se3_8, pts8 = run(["--parallel.data_devices=8"],
                                            "d8")
    assert abs(r1 - r8) < 4.0          # deg (measured 1.8)
    assert abs(t1 - t8) < 5e-3         # (measured 5e-4)
    assert abs(a1 - a8) < 5e-3
    assert abs(e1 - e8) < 5e-2         # px (measured 4e-3)
    assert abs(n1 - n8) <= max(8, 0.15 * n1)   # (measured 4)

    # END-STATE equivalence (VERDICT r3 item 9): the two runs share the
    # same gauge (same init pair + essential-matrix bootstrap), so poses
    # and points are directly comparable. Bounds are ~3x the measured
    # chaotic amplification of reduction-order noise (se3 3.5e-2,
    # mean-NN 2e-3); a real sharding bug (wrong psum, padded rows in a
    # loss) lands orders of magnitude above.
    assert np.abs(se3_1 - se3_8).max() < 1e-1, \
        f"pose drift {np.abs(se3_1 - se3_8).max():.4f}"
    # point sets can differ by a few triangulations; compare as clouds:
    # mean nearest-neighbor distance in BOTH directions
    d18 = np.sqrt(((pts1[:, None] - pts8[None]) ** 2).sum(-1))
    nn = 0.5 * (d18.min(1).mean() + d18.min(0).mean())
    assert nn < 1e-2, f"point-cloud NN distance {nn:.5f}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_cli_pipeline_with_data_mesh(tmp_path):
    """Full incremental pipeline through the train.py surface with
    --parallel.data_devices=8: every phase (init/geoinit/BA) compiles and
    runs with the ('data',) mesh active (configs/scannet_multiroom.yaml
    wiring; BASELINE config 5 single-host form)."""
    import train as train_mod
    m = train_mod.main([
        "--yaml=configs/synthetic.yaml", "--sfm_mode=fast", "--max_views=3",
        "--parallel.data_devices=8", "--optim.init.max_iter=20",
        "--optim.geoinit.max_iter=4", "--optim.ba.max_iter=10",
        f"--output_root={tmp_path}"])
    assert len(m.camera_set) == 3
    assert len(m.point_set) > 20
    r_deg, t_err, _ = m.camera_set.eval_poses(verbose=False)
    assert np.isfinite(r_deg) and np.isfinite(t_err)


def test_sfm_ba_freezes_radiance_exactly(tmp_path):
    """Round-5: mode="sfm" BA freezes the radiance params (zero grads ->
    Adam update is exactly 0 anyway; freezing drops the dead hash-table
    moment traffic). Pin the exactness claim: rad params come out
    BIT-IDENTICAL, while sdf/poses actually move."""
    opt = build_options([
        "--yaml=configs/synthetic.yaml", "--optim.init.max_iter=20",
        "--optim.ba.max_iter=10", "--sfm_mode=fast",
        f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=2, H=64, W=64, n_points=256, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    m.initialize_two_views(0, 1, verbose=False)

    se3_before = m.camera_set.all_se3().copy()
    b = Bundler(opt, m.cfgs, m.camera_set, m.point_set,
                cam_pick_ids=[0, 1], mode="sfm")
    params, reproj = b.run(m.params, jax.random.PRNGKey(0), verbose=False)
    for a, b_ in zip(jax.tree_util.tree_leaves(params["rad"]),
                     jax.tree_util.tree_leaves(m.params["rad"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    assert any(not np.array_equal(np.asarray(a), np.asarray(b_))
               for a, b_ in zip(jax.tree_util.tree_leaves(params["sdf"]),
                                jax.tree_util.tree_leaves(m.params["sdf"])))
    assert not np.array_equal(m.camera_set.all_se3(), se3_before)
