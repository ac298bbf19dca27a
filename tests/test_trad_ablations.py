"""tri_trad / ba_trad ablation pipeline tests (DLT + classic BA)."""
import numpy as np
import pytest

from level_s2fm_tpu.config import build_options
from level_s2fm_tpu.data import synthetic
from level_s2fm_tpu.sfm.pipeline import LevelSfM

ARGS = [
    "--yaml=configs/synthetic.yaml",
    "--optim.init.max_iter=20",
    "--optim.geoinit.max_iter=3",
    "--optim.ba.max_iter=60",
    "--sfm_mode=fast",
    "--Ablate_config.tri_trad",
    "--Ablate_config.ba_trad",
]


def test_trad_pipeline(tmp_path):
    opt = build_options(ARGS + [f"--output_root={tmp_path}"])
    assert opt.Ablate_config.tri_trad and opt.Ablate_config.ba_trad
    scene = synthetic.make_scene(n_views=3, H=64, W=64, n_points=256, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    ok = m.train(max_views=3, verbose=False)
    assert ok
    assert len(m.point_set) > 30
    # DLT from near-GT poses on noiseless data: points must sit on the sphere
    r = np.linalg.norm(m.point_set.all_xyzs(), axis=-1)
    assert np.median(np.abs(r - 0.5)) < 0.1
