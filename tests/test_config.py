"""Config system tests: parent chaining, CLI overrides, scene overrides."""
import os

import pytest

from level_s2fm_tpu import config as C

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parent_chain_and_override():
    opt = C.build_options(["--yaml=configs/synthetic.yaml"])
    # from base.yaml via chain
    assert opt.nbv_mode == "colmap"
    # from levels2fm.yaml
    assert opt.SDF.VolSDF.beta_init == 0.05
    # overridden by synthetic.yaml
    assert opt.SDF.VolSDF.iters_max_st == 10
    assert opt.data.dataset == "synthetic"


def test_cli_dotpath_and_flags():
    opt = C.build_options([
        "--yaml=configs/synthetic.yaml",
        "--optim.ba.max_iter=7",
        "--Ablate_config.tri_trad",
        "--Ablate_config.sdf_filter!",
        "--data.scene=other",
    ])
    assert opt.optim.ba.max_iter == 7
    assert opt.Ablate_config.tri_trad is True
    assert opt.Ablate_config.sdf_filter is False
    assert opt.data.scene == "other"


def test_scene_opt_lookup():
    opt = C.build_options(["--yaml=configs/synthetic.yaml"])
    assert C.scene_opt(opt, "rad_init", 0) == 2.0
    assert C.scene_opt(opt, "missing_key", 42) == 42


def test_image_size_to_HW():
    opt = C.build_options(["--yaml=configs/synthetic.yaml"])
    assert (opt.H, opt.W) == (64, 64)


def test_value_parsing_types():
    opt = C.build_options(["--yaml=configs/synthetic.yaml",
                           "--optim.init.lr_sdf=5e-4",
                           "--data.bound_max=[2,2,2]"])
    assert abs(opt.optim.init.lr_sdf - 5e-4) < 1e-12
    assert list(opt.data.bound_max) == [2, 2, 2]
