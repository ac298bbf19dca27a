"""Occupancy-guided sample compaction: fidelity vs the full render."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from level_s2fm_tpu.fields import sdf as sdf_mod
from level_s2fm_tpu.rendering import raymarch as rm, renderer as ren_mod
from tests.test_dual_field import build


def test_compacted_render_close_to_full(rng):
    params, sdf_cfg, rad_cfg, ren_cfg = build(dual=False)
    # at init the SDF is the sphere r=0.5 (geometric init) — a good stand-in
    # for a converged field
    occ = rm.build_occupancy_grid(
        lambda p: sdf_mod.infer_sdf(params["sdf"], sdf_cfg, p),
        jnp.zeros(3), jnp.ones(3), resolution=48, threshold=0.25,
        one_sided=True)
    center = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -2.0]), (1, 128, 3))
    ray = jnp.asarray(np.concatenate(
        [rng.normal(size=(1, 128, 2)) * 0.12, np.ones((1, 128, 1))], -1),
        jnp.float32)
    cfg_full = dataclasses.replace(ren_cfg, sample_intvs=64, ray_chunk=None)
    cfg_fast = dataclasses.replace(cfg_full, compact_samples=24)
    out_f = ren_mod.render(params["sdf"], sdf_cfg, params["rad"], rad_cfg,
                           cfg_full, center, ray)
    out_c = ren_mod.render(params["sdf"], sdf_cfg, params["rad"], rad_cfg,
                           cfg_fast, center, ray, occ_grid=occ)
    # opacity and rgb must closely match (empty bins carry sigma~0)
    do = float(jnp.abs(out_f["opacity"] - out_c["opacity"]).max())
    drgb = float(jnp.abs(out_f["rgb"] - out_c["rgb"]).max())
    assert do < 0.06, do
    assert drgb < 0.06, drgb
    # surface depth agrees where rays hit
    hit = np.asarray(out_f["opacity"][..., 0]) > 0.5
    dd = np.abs(np.asarray(out_f["depth_mlp"] - out_c["depth_mlp"]))[..., 0]
    assert np.median(dd[hit]) < 0.05


def test_compaction_grad_flows(rng):
    params, sdf_cfg, rad_cfg, ren_cfg = build(dual=False)
    occ = rm.build_occupancy_grid(
        lambda p: sdf_mod.infer_sdf(params["sdf"], sdf_cfg, p),
        jnp.zeros(3), jnp.ones(3), resolution=32, threshold=0.15)
    center = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -2.0]), (1, 16, 3))
    ray = jnp.asarray(np.concatenate(
        [rng.normal(size=(1, 16, 2)) * 0.1, np.ones((1, 16, 1))], -1),
        jnp.float32)
    cfg_fast = dataclasses.replace(ren_cfg, sample_intvs=32, ray_chunk=None,
                                   compact_samples=8)

    def loss(sp):
        o = ren_mod.render(sp, sdf_cfg, params["rad"], rad_cfg, cfg_fast,
                           center, ray, occ_grid=occ)
        return jnp.mean(jnp.abs(o["rgb"] - 0.5))

    g = jax.grad(loss)(params["sdf"])
    assert all(bool(jnp.isfinite(l).all())
               for l in jax.tree_util.tree_leaves(g))
    assert float(jnp.abs(g["table"]).sum()) >= 0  # finite; flows through gather
