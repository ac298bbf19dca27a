"""Radiance (appearance) field, functional JAX.

Equivalent of the reference `RadF` (`models/RadF.py`): a decoder MLP over
[xyz, sdf-normal, Fourier-embedded view dir, SDF geometry feature]; the
``dual_field`` ablation adds a second hash+geometry encoder whose feature
is concatenated (`models/RadF.py:31-58`).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import embedder, hashgrid, mlp


@dataclasses.dataclass(frozen=True)
class RadFConfig:
    layers: Tuple[Optional[int], ...] = (None, 64, 64, 3)
    geo_feat_dim: int = 16           # last layer width of the SDF arch
    dual_field: bool = False
    fourier: embedder.FourierConfig = embedder.FourierConfig()
    rescale: float = 1.0
    activation: str = "none"         # reference's dead inner ReLU (see mlp.py)
    # dual-field geometry encoder (mirrors the SDF's)
    grid: Optional[hashgrid.HashGridConfig] = None
    geo_layers: Tuple[Optional[int], ...] = (None, 64, 16)
    geo_skip: Tuple[int, ...] = ()
    sphere_bias: float = 1.0
    tf_init: bool = True
    bound_min: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    bound_max: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    @property
    def input_enc_dim(self) -> int:
        # 3 point + view_emb + 3 normal + geo_feat (ref `RadF.py:54-58`)
        d = 3 + self.fourier.out_dim + 3 + self.geo_feat_dim
        if self.dual_field:
            d += self.geo_feat_dim
        return d


def config_from_opt(opt) -> RadFConfig:
    geo_feat_dim = int(opt.SDF.arch.layers[-1])
    grid = hashgrid.config_from_opt(opt) if opt.Ablate_config.dual_field else None
    return RadFConfig(
        layers=tuple(opt.RadF.arch.layers),
        geo_feat_dim=geo_feat_dim,
        dual_field=bool(opt.Ablate_config.dual_field),
        rescale=float(opt.SDF.VolSDF.rescale),
        activation=str(opt.RadF.get("activation", "none")),
        grid=grid,
        geo_layers=tuple(opt.SDF.arch.layers),
        geo_skip=tuple(opt.SDF.arch.get("skip", ())),
        sphere_bias=float(opt.SDF.NN_Init.bias),
        tf_init=bool(opt.SDF.NN_Init.get("tf_init", True)),
        bound_min=tuple(opt.data.bound_min),
        bound_max=tuple(opt.data.bound_max),
    )


def init_params(key, cfg: RadFConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"rad_mlp": mlp.init_radiance_mlp(
        k1, cfg.input_enc_dim, cfg.layers, tf_init=cfg.tf_init)}
    if cfg.dual_field:
        params["table"] = hashgrid.init_table(k2, cfg.grid)
        params["geo_mlp"] = mlp.init_geometry_mlp(
            k3, cfg.grid.out_dim, cfg.geo_layers, cfg.geo_skip,
            sphere_bias=cfg.sphere_bias, tf_init=cfg.tf_init)
    return params


def geometry_feat(params, cfg: RadFConfig, xyz: jnp.ndarray) -> jnp.ndarray:
    """Dual-field geometry feature (ref `RadF.py:66-76`)."""
    enc = hashgrid.embed(params["table"], xyz, cfg.grid,
                         cfg.bound_min, cfg.bound_max, rescale=cfg.rescale)
    return mlp.apply_geometry_mlp(params["geo_mlp"], enc, skip=cfg.geo_skip)


def embed_view(cfg: RadFConfig, view_dir: jnp.ndarray) -> jnp.ndarray:
    return embedder.fourier_embed(view_dir, cfg.fourier)


def infer_app(params, cfg: RadFConfig, all_enc: jnp.ndarray) -> jnp.ndarray:
    """[...,input_enc_dim] -> rgb [...,3] in (0,1)."""
    return mlp.apply_radiance_mlp(params["rad_mlp"], all_enc, activation=cfg.activation)
