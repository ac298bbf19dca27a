"""A/B: adaptive VolSDF error-bound sampling vs the default paths
(VERDICT r2 item 7 — adopt or document-and-drop).

Protocol: fit SDF+radiance from scratch to the synthetic textured-sphere
scene (3 train views, 1 held-out view) for --steps optimization steps at
the SAME rays/step under three sampling configs:

  uniform128+occ32  the production default (occupancy compaction)
  uniform128        reference-equivalent full evaluation
  adaptive          error-bound up-sampling (renderer.volsdf_sampling=True
                    — the WORKING re-design of the reference's dead path,
                    models/Renderer.py:186-360)

Report per arm: train rays/s (fwd+bwd), held-out PSNR (non-background
rays, rendered under one COMMON eval protocol: uniform-128 full) — i.e.
quality per ray budget AND per wall-clock second.

Run on the TPU:  python scripts/ab_adaptive_sampler.py --steps 300
Quick CPU check: python scripts/ab_adaptive_sampler.py --cpu --steps 20
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--out", default="results/ab_adaptive_sampler.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from level_s2fm_tpu.config import Opt
    from level_s2fm_tpu.data import synthetic
    from level_s2fm_tpu.fields import radiance as radf, sdf as sdf_mod
    from level_s2fm_tpu.geometry import transforms as T
    from level_s2fm_tpu.rendering import raymarch as rm, renderer as ren_mod

    H = W = args.hw
    scene = synthetic.make_scene(n_views=4, H=H, W=W, n_points=64, seed=0,
                                 detail=0.35)

    def build(mode):
        opt = Opt({
            "Res": 100,
            "Ablate_config": {"dual_field": False},
            "SDF": {"arch": {"layers": [None, 64, 16], "skip": []},
                    "NN_Init": {"scale_mlp": 1, "bias": 0.5, "tf_init": True},
                    "VolSDF": {"sample_intvs": 128, "final_sample_intvs": 32,
                               "volsdf_sampling": mode == "adaptive",
                               "max_upsample_iter": 2, "iters_max_st": 10,
                               "eps": 0.1, "beta_init": 0.05, "rescale": 1.0,
                               "beta_speed": 1.0, "sdf_threshold": 1e-3},
                    "Hash_config": {"compute_dtype": "bfloat16"}},
            "RadF": {"arch": {"layers": [None, 64, 64, 3], "skip": []}},
            "data": {"bound_min": [-1, -1, -1], "bound_max": [1, 1, 1],
                     "inside": True, "bg_sdf": None, "bg_rad": 2.0,
                     "scene": "ab", "bgcolor": [0, 0, 0],
                     "image_size": [H, W]},
            "Renderer": {"rand_rays": args.rays},
        })
        sdf_cfg = sdf_mod.config_from_opt(opt)
        rad_cfg = radf.config_from_opt(opt)
        ren_cfg = ren_mod.config_from_opt(opt)
        if mode == "uniform128+occ32":
            ren_cfg = dataclasses.replace(ren_cfg, compact_samples=32)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {"sdf": sdf_mod.init_params(k1, sdf_cfg),
                  "rad": radf.init_params(k2, rad_cfg)}
        return params, sdf_cfg, rad_cfg, ren_cfg

    # train rays: random pixels of views 0..2; eval: full view 3
    grid = np.asarray(T.mesh_grid(H, W))

    def rays_for(view, pix_idx):
        import jax.numpy as jnp
        from level_s2fm_tpu.utils.hostdev import on_host_cpu
        with on_host_cpu():
            c, r = T.get_center_and_ray(
                jnp.asarray(scene.poses_gt[view])[None],
                jnp.asarray(scene.intrs[view]), jnp.asarray(grid[pix_idx]))
        return np.asarray(c[0]), np.asarray(r[0])

    rng = np.random.default_rng(0)
    results = {}
    for mode in ("uniform128+occ32", "uniform128", "adaptive"):
        params, sdf_cfg, rad_cfg, ren_cfg = build(mode)
        occ = None
        if ren_cfg.compact_samples is not None:
            occ = rm.build_occupancy_grid(
                lambda p: sdf_mod.infer_sdf(params["sdf"], sdf_cfg, p),
                jnp.zeros(3), jnp.ones(3), resolution=64, threshold=0.25,
                one_sided=True)
        opt_x = optax.adam(1e-3)

        def loss_fn(p, center, ray, rgb_gt):
            out = ren_mod.render(p["sdf"], sdf_cfg, p["rad"], rad_cfg,
                                 ren_cfg, center, ray, occ_grid=occ)
            n = jnp.linalg.norm(out["normals"], axis=-1)
            return (jnp.mean(jnp.abs(out["rgb"] - rgb_gt))
                    + 0.01 * jnp.mean(jnp.abs(n - 1.0)))

        @jax.jit
        def step(p, st, center, ray, rgb_gt):
            l, g = jax.value_and_grad(loss_fn)(p, center, ray, rgb_gt)
            up, st = opt_x.update(g, st)
            return optax.apply_updates(p, up), st, l

        # pre-draw all batches (host) so the loop is pure device time
        batches = []
        for s in range(args.steps):
            view = int(rng.integers(0, 3))
            pix = rng.integers(0, H * W, size=args.rays)
            c, r = rays_for(view, pix)
            gt = scene.images[view].reshape(-1, 3)[pix]
            batches.append((jnp.asarray(c)[None], jnp.asarray(r)[None],
                            jnp.asarray(gt)[None]))
        st = opt_x.init(params)
        # warmup/compile
        p2, st2, l = step(params, st, *batches[0])
        jax.block_until_ready(l)
        t0 = time.perf_counter()
        p, s_ = params, st
        for b in batches:
            p, s_, l = step(p, s_, *b)
        jax.block_until_ready(l)
        dt = time.perf_counter() - t0
        rays_per_s = args.rays * args.steps / dt

        # COMMON eval protocol: uniform-128 full render of held-out view 3
        _, _, _, eval_cfg = build("uniform128")
        c, r = rays_for(3, np.arange(H * W))
        out = ren_mod.render(p["sdf"], sdf_cfg, p["rad"], rad_cfg, eval_cfg,
                             jnp.asarray(c)[None], jnp.asarray(r)[None])
        est = np.asarray(out["rgb"][0]).reshape(H, W, 3)
        gt_img = scene.images[3]
        fg = np.any(gt_img > 0.02, axis=-1)
        mse = float(np.mean((est[fg] - gt_img[fg]) ** 2))
        psnr = -10 * np.log10(mse)
        results[mode] = {"rays_per_s": round(rays_per_s, 1),
                         "psnr_heldout_fg": round(psnr, 3),
                         "train_s": round(dt, 2)}
        print(mode, results[mode], flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"steps": args.steps, "rays": args.rays, "hw": args.hw,
                   "backend": "cpu" if args.cpu else "tpu",
                   "results": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
