"""Post-completion pose polish: global TRAD bundle adjustment.

The neural-BA cycles at reference resolution converge to the hash-SDF's
representational floor (~3 px) and are rolled back by the ba-guard
(results/ba_divergence_diag.md), so far-side poses keep raw-PnP quality.
The trad-BA ablation path (free 3D points, pure reprojection — ref
`BA_Trad.py`, ours `sfm/trad.py::TradBundler`) has no surface coupling
and can polish the final pose graph. This script loads a completed run's
checkpoint, runs N global trad-BA cycles (+ optional observation
pruning), evaluates pose errors before/after, and writes the polished
state to <run>/model_polished.ckpt (the original checkpoint is not
touched).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/polish_trad_ba.py \
      output/synthref24 --yaml=configs/synthref24.yaml [--cpu] \
      [--cycles=3] [--iters=2000]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    run_dir = sys.argv[1]
    extra = [a for a in sys.argv[2:]]
    cycles = 3
    iters = None
    keep = []
    for a in extra:
        if a.startswith("--cycles="):
            cycles = int(a.split("=")[1])
        elif a.startswith("--iters="):
            iters = int(a.split("=")[1])
        else:
            keep.append(a)
    from level_s2fm_tpu.config import build_options
    opt = build_options(keep + [f"--output_path={run_dir}"])
    if opt.get("cpu", False):
        import jax
        jax.config.update("jax_platforms", "cpu")
    if iters:
        opt.optim.ba.max_iter = iters
    import numpy as np
    import train as train_mod
    from level_s2fm_tpu.sfm.pipeline import LevelSfM
    from level_s2fm_tpu.sfm.trad import TradBundler
    from level_s2fm_tpu.sfm import entities
    from level_s2fm_tpu.utils import checkpoint as ck

    model = LevelSfM(opt, seed=int(opt.get("seed", 0)))
    model.load_data(train_mod.build_var(opt))
    model.restore_checkpoint()
    model._reload_scene()
    r0, t0, a0 = model.camera_set.eval_poses(verbose=False)
    e0 = entities.mean_reprojection_px(model.camera_set, model.point_set, None)
    print(f"[polish] before: rot {r0:.4f} deg  t {t0:.5f}  ate {a0:.5f}  "
          f"reproj {e0:.3f} px  ({len(model.camera_set)} cams, "
          f"{len(model.point_set)} pts)")
    for c in range(cycles):
        b = TradBundler(opt, model.cfgs, model.camera_set, model.point_set)
        model.params, reproj = b.run(model.params, model.next_key(),
                                     verbose=False)
        r, t, a = model.camera_set.eval_poses(verbose=False)
        e = entities.mean_reprojection_px(model.camera_set, model.point_set,
                                          None)
        print(f"[polish] cycle {c + 1}: rot {r:.4f} deg  t {t:.5f}  "
              f"ate {a:.5f}  reproj {e:.3f} px")
    ck.save_checkpoint_sfm(os.path.join(run_dir, "model_polished.ckpt"),
                           model.params, model.camera_set, model.point_set,
                           it=model.it)
    print("[polish] wrote", os.path.join(run_dir, "model_polished.ckpt"))

if __name__ == "__main__":
    main()
