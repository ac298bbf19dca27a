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


def test_save_options_file_roundtrip(tmp_path, capsys):
    """Reference `utils/options.py:114-136`: the resolved options are
    persisted to {output_path}/options.yaml; an identical rerun is
    recognized, a changed rerun prints a diff (non-interactive runs
    override instead of prompting)."""
    opt = C.build_options(["--yaml=configs/synthetic.yaml",
                           f"--output_path={tmp_path}"])
    C.save_options_file(opt)
    assert (tmp_path / "options.yaml").is_file()
    capsys.readouterr()
    C.save_options_file(opt)
    assert "identical" in capsys.readouterr().out
    opt2 = opt.deepcopy()
    opt2.max_views = 99
    C.save_options_file(opt2)
    out = capsys.readouterr().out
    assert "different" in out and "max_views" in out
    # the file now records the new options
    import yaml as _yaml
    saved = _yaml.safe_load((tmp_path / "options.yaml").read_text())
    assert saved["max_views"] == 99
