"""dual_field ablation: second hash+geometry encoder for radiance."""
import jax
import jax.numpy as jnp
import numpy as np

from level_s2fm_tpu.config import build_options
from level_s2fm_tpu.fields import radiance as radf, sdf as sdf_mod
from level_s2fm_tpu.rendering import renderer as ren_mod


def build(dual):
    args = ["--yaml=configs/synthetic.yaml"]
    if dual:
        args.append("--Ablate_config.dual_field")
    opt = build_options(args)
    sdf_cfg = sdf_mod.config_from_opt(opt)
    rad_cfg = radf.config_from_opt(opt)
    ren_cfg = ren_mod.config_from_opt(opt)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"sdf": sdf_mod.init_params(k1, sdf_cfg),
              "rad": radf.init_params(k2, rad_cfg)}
    return params, sdf_cfg, rad_cfg, ren_cfg


def test_dual_field_params_and_render(rng):
    params, sdf_cfg, rad_cfg, ren_cfg = build(dual=True)
    assert rad_cfg.dual_field
    assert "table" in params["rad"] and "geo_mlp" in params["rad"]
    assert rad_cfg.input_enc_dim == build(dual=False)[2].input_enc_dim + 16

    center = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -2.0]), (1, 32, 3))
    ray = jnp.asarray(np.concatenate(
        [rng.normal(size=(1, 32, 2)) * 0.1, np.ones((1, 32, 1))], -1),
        jnp.float32)
    out = ren_mod.render(params["sdf"], sdf_cfg, params["rad"], rad_cfg,
                         ren_cfg, center, ray)
    assert bool(jnp.isfinite(out["rgb"]).all())

    def loss(rp):
        o = ren_mod.render(params["sdf"], sdf_cfg, rp, rad_cfg, ren_cfg,
                           center, ray)
        return jnp.mean(o["rgb"])

    # the geometric init zeroes the first-layer weights on hash features,
    # which makes the table gradient legitimately zero at init — perturb
    # them so gradient flow to the dual table is observable
    rad_p = jax.tree.map(lambda x: x, params["rad"])
    W0 = rad_p["geo_mlp"]["layers"][0]["V"]
    rad_p["geo_mlp"]["layers"][0]["V"] = W0 + 0.01 * jax.random.normal(
        jax.random.PRNGKey(3), W0.shape)
    g = jax.grad(loss)(rad_p)
    assert float(jnp.abs(g["table"]).sum()) > 0
