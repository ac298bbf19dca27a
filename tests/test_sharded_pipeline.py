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
