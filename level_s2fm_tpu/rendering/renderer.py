"""VolSDF volumetric renderer (functional JAX).

Re-design of the reference `models/Renderer.py`. The live path (default
config `options/LevelS2fM.yaml:26` sets `volsdf_sampling: false`) is:
uniform mid-bin depth sampling between ray–AABB hits, SDF+feature eval,
Laplace-CDF density, quadrature compositing with background blending
(`models/Renderer.py:33-127`). The adaptive VolSDF error-bound up-sampling
(`models/Renderer.py:169-360` — dead code upstream with latent bugs) is
implemented here as a *working* fixed-iteration variant, gated by
``volsdf_sampling=True``.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..fields import radiance as radf
from ..fields import sdf as sdf_mod
from . import aabb as aabb_mod


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    sample_intvs: int = 128
    final_sample_intvs: int = 64
    volsdf_sampling: bool = False
    max_upsample_iter: int = 6
    eps: float = 0.1
    bgcolor: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # process rays in chunks of this size (lax.map + rematerialization):
    # bounds peak HBM for big batches (8192 rays x 128 samples overflows a
    # 16 GB chip otherwise). None = single pass.
    ray_chunk: Optional[int] = 2048
    # occupancy-guided sample compaction: keep only the first
    # `compact_samples` depth samples whose cells intersect the occupancy
    # band (TPU-native fixed-K replacement for vren's variable-length
    # compaction). None = evaluate all samples (reference behavior).
    compact_samples: Optional[int] = None
    # fused Pallas Laplace-sigma+composite kernel on the compacted path
    # (rendering/pallas_composite.py). None = auto (Pallas on TPU, jnp
    # reference elsewhere); True/False forces.
    fused_composite: Optional[bool] = None


def config_from_opt(opt) -> RendererConfig:
    from ..config import scene_opt
    bg = scene_opt(opt, "bgcolor", None) or opt.data.get("bgcolor") or (0.0, 0.0, 0.0)
    return RendererConfig(
        sample_intvs=int(opt.SDF.VolSDF.sample_intvs),
        final_sample_intvs=int(opt.SDF.VolSDF.final_sample_intvs),
        volsdf_sampling=bool(opt.SDF.VolSDF.volsdf_sampling),
        max_upsample_iter=int(opt.SDF.VolSDF.max_upsample_iter),
        eps=float(opt.SDF.VolSDF.eps),
        bgcolor=tuple(bg),
        ray_chunk=opt.get("Renderer", {}).get("ray_chunk", 2048),
        compact_samples=opt.get("Renderer", {}).get("compact_samples", None),
        fused_composite=opt.get("Renderer", {}).get("fused_composite", None),
    )


def sample_depth(min_d, max_d, n: int):
    """Deterministic mid-bin uniform depths (ref `Renderer.py:118-127`).

    min_d/max_d: [B,HW,1] -> [B,HW,n,1].
    """
    rand = 0.5 + jnp.arange(n, dtype=min_d.dtype)[None, None, :, None]
    return rand / n * (max_d[..., None, :] - min_d[..., None, :]) + min_d[..., None, :]


def composite(ray, rgb_samples, density_samples, depth_samples):
    """Quadrature compositing (ref `Renderer.py:33-49`).

    ray [B,HW,3]; rgb_samples [B,HW,N,3]; density [B,HW,N];
    depth_samples [B,HW,N,1]. Returns (rgb [B,HW,3], prob [B,HW,N-1,1]).
    """
    ray_length = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    depth_intv = depth_samples[..., 1:, 0] - depth_samples[..., :-1, 0]
    dist = depth_intv * ray_length
    sigma_delta = density_samples[..., :-1] * dist
    alpha = 1 - jnp.exp(-sigma_delta)
    zeros = jnp.zeros_like(sigma_delta[..., :1])
    T = jnp.exp(-jnp.cumsum(jnp.concatenate([zeros, sigma_delta], axis=2), axis=2))[..., :-1]
    prob = (T * alpha)[..., None]
    rgb = jnp.sum(rgb_samples[..., :-1, :] * prob, axis=2)
    return rgb, prob


def composite_explicit(ray, rgb_samples, density_samples, deltas):
    """Quadrature compositing with per-sample bin widths.

    Used by the compacted path: each selected sample keeps its ORIGINAL
    uniform bin width, so dropped (sigma~0) bins between selections
    contribute transmittance factor 1 exactly.
    rgb_samples [B,HW,K,3]; density [B,HW,K]; deltas [B,HW,K].
    """
    ray_length = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    sigma_delta = density_samples * deltas * ray_length
    alpha = 1 - jnp.exp(-sigma_delta)
    zeros = jnp.zeros_like(sigma_delta[..., :1])
    T = jnp.exp(-jnp.cumsum(jnp.concatenate([zeros, sigma_delta], axis=2),
                            axis=2))[..., :-1]
    prob = (T * alpha)[..., None]
    rgb = jnp.sum(rgb_samples * prob, axis=2)
    return rgb, prob


def sdf_to_sigma(sdf, alpha, beta):
    e = 0.5 * jnp.exp(-jnp.abs(sdf) / beta)
    return alpha * jnp.where(sdf >= 0, e, 1 - e)


def error_bound(d_vals, sdf, alpha, beta):
    """VolSDF opacity-approximation error bound (ref `Renderer.py:330-360`)."""
    sigma = sdf_to_sigma(sdf, alpha, beta)
    sdf_abs = jnp.abs(sdf)
    delta = d_vals[..., 1:] - d_vals[..., :-1]
    zeros = jnp.zeros_like(sdf[..., :1])
    R_t = jnp.concatenate([zeros, jnp.cumsum(sigma[..., :-1] * delta, axis=-1)], axis=-1)[..., :-1]
    d_star = jnp.clip(0.5 * (sdf_abs[..., :-1] + sdf_abs[..., 1:] - delta), 0.0, None)
    errors = alpha / (4 * beta) * delta ** 2 * jnp.exp(-d_star / beta)
    errors_t = jnp.cumsum(errors, axis=-1)
    bounds = jnp.exp(-R_t) * (jnp.exp(errors_t) - 1.0)
    return jnp.nan_to_num(bounds, nan=jnp.inf)


def _searchsorted(a, v):
    """Batched searchsorted (side='left') over the last axis.

    Comparison-sum formulation: O(N*M) elementwise ops, fully vectorized —
    maps to the VPU instead of a sequential search.
    """
    return jnp.sum(a[..., None, :] < v[..., :, None], axis=-1)


def sample_pdf(bins, weights, n_importance: int, eps: float = 1e-5):
    """Deterministic inverse-CDF sampling (ref `Renderer.py:362-399`, det)."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
    u = jnp.linspace(0.0, 1.0, n_importance)
    u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_importance))
    inds = _searchsorted(cdf, u)
    below = jnp.clip(inds - 1, 0, None)
    above = jnp.clip(inds, None, cdf.shape[-1] - 1)
    cdf_g0 = jnp.take_along_axis(cdf, below, -1)
    cdf_g1 = jnp.take_along_axis(cdf, above, -1)
    bins_g0 = jnp.take_along_axis(bins, jnp.clip(below, None, bins.shape[-1] - 1), -1)
    bins_g1 = jnp.take_along_axis(bins, jnp.clip(above, None, bins.shape[-1] - 1), -1)
    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def opacity_to_sample(d_vals, sdf, alpha, beta, n_final: int):
    """Sample final depths from the approximate opacity CDF
    (ref `Renderer.py:129-162`)."""
    sigma = sdf_to_sigma(sdf, alpha, beta)
    delta = d_vals[..., 1:] - d_vals[..., :-1]
    zeros = jnp.zeros_like(sdf[..., :1])
    R_t = jnp.concatenate([zeros, jnp.cumsum(sigma[..., :-1] * delta, axis=-1)], axis=-1)[..., :-1]
    opacity_approx = 1 - jnp.exp(-R_t)
    opacity_approx = jnp.concatenate([jnp.zeros_like(opacity_approx[..., :1]), opacity_approx], -1)
    grid = jnp.linspace(0, 1, n_final + 1)
    unif = 0.5 * (grid[:-1] + grid[1:])
    unif = jnp.broadcast_to(unif, (*opacity_approx.shape[:-1], n_final))
    idx = _searchsorted(opacity_approx, unif)
    lo = jnp.clip(idx - 1, 0, None)
    hi = jnp.clip(idx, None, opacity_approx.shape[-1] - 1)
    d_lo = jnp.take_along_axis(d_vals, jnp.clip(lo, None, d_vals.shape[-1] - 1), -1)
    d_hi = jnp.take_along_axis(d_vals, jnp.clip(hi, None, d_vals.shape[-1] - 1), -1)
    c_lo = jnp.take_along_axis(opacity_approx, lo, -1)
    c_hi = jnp.take_along_axis(opacity_approx, hi, -1)
    t = (unif - c_lo) / (c_hi - c_lo + 1e-8)
    return d_lo + t * (d_hi - d_lo)


def volsdf_sampling(sdf_params, sdf_cfg: sdf_mod.SDFConfig, cfg: RendererConfig,
                    center, ray):
    """Depth sampling. Returns depths [B,HW,Nd].

    Uniform path by default; when ``cfg.volsdf_sampling`` a fixed-iteration
    error-bound up-sampling refines the samples (working re-design of the
    reference's dead adaptive path).
    """
    B, HW = center.shape[0], center.shape[1]
    t_near, t_far, valid = aabb_mod.ray_aabb_intersect(
        center.reshape(-1, 3), ray.reshape(-1, 3),
        jnp.asarray(sdf_cfg.center, jnp.float32), jnp.asarray(sdf_cfg.half_size, jnp.float32))
    min_d = t_near.reshape(B, HW, 1)
    max_d = t_far.reshape(B, HW, 1)
    depth_coarse = sample_depth(min_d, max_d, cfg.sample_intvs)[..., 0]  # [B,HW,N]
    if not cfg.volsdf_sampling:
        return depth_coarse

    # fixed-iteration adaptive refinement (static shapes; python-unrolled)
    alpha_g, beta_g = sdf_mod.forward_ab(sdf_params, sdf_cfg)
    d_vals = depth_coarse
    pts = center[..., None, :] + ray[..., None, :] * d_vals[..., None]
    with sdf_mod.hashgrid.trace_site("adaptive_sampling"):
        sdf = jax.lax.stop_gradient(
            sdf_mod.infer_sdf(sdf_params, sdf_cfg, pts))[..., 0]
    for _ in range(cfg.max_upsample_iter):
        bounds = error_bound(d_vals, sdf, alpha_g, beta_g)
        new_d = sample_pdf(0.5 * (d_vals[..., 1:] + d_vals[..., :-1]), bounds,
                           cfg.sample_intvs + 2)[..., 1:-1]
        new_pts = center[..., None, :] + ray[..., None, :] * new_d[..., None]
        new_sdf = jax.lax.stop_gradient(sdf_mod.infer_sdf(sdf_params, sdf_cfg, new_pts))[..., 0]
        d_vals = jnp.concatenate([d_vals, new_d], axis=-1)
        sdf = jnp.concatenate([sdf, new_sdf], axis=-1)
        order = jnp.argsort(d_vals, axis=-1)
        d_vals = jnp.take_along_axis(d_vals, order, -1)
        sdf = jnp.take_along_axis(sdf, order, -1)
    fine = opacity_to_sample(d_vals, sdf, alpha_g, beta_g, cfg.final_sample_intvs)
    out = jnp.concatenate([fine, depth_coarse], axis=-1)
    return jnp.sort(out, axis=-1)


def render(sdf_params, sdf_cfg: sdf_mod.SDFConfig,
           rad_params, rad_cfg: radf.RadFConfig,
           cfg: RendererConfig, center, ray,
           occ_grid=None) -> Dict[str, jnp.ndarray]:
    """Full forward render of a ray batch (ref `Renderer.py:51-116`).

    center/ray: [B,HW,3]. Returns dict with rgb, sdfs_volume, normals,
    depth_mlp, normal_mlp, opacity. Large batches are processed in
    rematerialized chunks (see RendererConfig.ray_chunk). Pass an
    `occ_grid` (rendering.raymarch.OccupancyGrid) with
    cfg.compact_samples set to evaluate the fields only on the K samples
    inside the occupancy band.
    """
    HW = center.shape[1]
    chunk = cfg.ray_chunk
    if chunk is not None and HW > chunk:
        B = center.shape[0]
        # pad the ray axis up to a chunk multiple (an odd full-image size
        # must not silently fall through to the unchunked path and OOM
        # the chip); padded rays repeat the last ray and are sliced off
        pad = (-HW) % chunk
        if pad:
            center = jnp.concatenate(
                [center, jnp.repeat(center[:, -1:], pad, axis=1)], axis=1)
            ray = jnp.concatenate(
                [ray, jnp.repeat(ray[:, -1:], pad, axis=1)], axis=1)
        K = (HW + pad) // chunk
        c2 = jnp.swapaxes(center.reshape(B, K, chunk, 3), 0, 1)
        r2 = jnp.swapaxes(ray.reshape(B, K, chunk, 3), 0, 1)

        def one(cr):
            return _render_impl(sdf_params, sdf_cfg, rad_params, rad_cfg,
                                cfg, cr[0], cr[1], occ_grid=occ_grid)

        outs = jax.lax.map(jax.checkpoint(one), (c2, r2))
        return {k: jnp.swapaxes(v, 0, 1).reshape(B, HW + pad, *v.shape[3:])[:, :HW]
                for k, v in outs.items()}
    return _render_impl(sdf_params, sdf_cfg, rad_params, rad_cfg, cfg,
                        center, ray, occ_grid=occ_grid)


def compact_by_occupancy(depths, center, ray, occ_grid, K: int):
    """Keep the K nearest samples inside the occupancy band, depth-ordered.

    depths [B,HW,S], ASCENDING along the sample axis (uniform mid-bin
    sampling and the sorted adaptive path both guarantee this). Dropped
    (empty-space) bins contribute sigma=0 to the quadrature anyway (up to
    the grid threshold), so compositing over the selected bins with their
    own widths is faithful. Returns (depths_sel [B,HW,K], valid_sel
    [B,HW,K]).

    Because the input is already depth-ordered, the K nearest in-band
    samples are simply the first K valid entries — selected here with a
    cumsum + vectorized searchsorted instead of sorting the sample axis
    (XLA sorts are a hot spot on TPU; this path runs every render step).
    """
    pts = center[..., None, :] + ray[..., None, :] * depths[..., None]
    rel = (pts - occ_grid.center) / (2 * occ_grid.half_size) + 0.5
    res = occ_grid.resolution
    cell = jnp.clip((rel * res).astype(jnp.int32), 0, res - 1)
    valid = occ_grid.occ[cell[..., 0], cell[..., 1], cell[..., 2]]
    # index of the k-th valid sample = #\{s : cumsum(valid)[s] < k+1\}
    cum = jnp.cumsum(valid.astype(jnp.int32), axis=-1)          # [B,HW,S]
    ks = jnp.arange(1, K + 1, dtype=jnp.int32)                  # [K]
    idx = jnp.sum((cum[..., None, :] < ks[:, None]).astype(jnp.int32),
                  axis=-1)                                      # [B,HW,K]
    v_sel = ks <= cum[..., -1:]                                 # [B,HW,K]
    idx = jnp.minimum(idx, depths.shape[-1] - 1)
    d_sel = jnp.take_along_axis(depths, idx, -1)
    return d_sel, v_sel


def _render_impl(sdf_params, sdf_cfg: sdf_mod.SDFConfig,
                 rad_params, rad_cfg: radf.RadFConfig,
                 cfg: RendererConfig, center, ray,
                 occ_grid=None) -> Dict[str, jnp.ndarray]:
    depth_all = volsdf_sampling(sdf_params, sdf_cfg, cfg, center, ray)  # [B,HW,S]
    sample_valid = None
    bin_w = None
    if occ_grid is not None and cfg.compact_samples is not None:
        bin_w = depth_all[..., 1] - depth_all[..., 0]     # uniform bin width
        d, sample_valid = compact_by_occupancy(
            depth_all, center, ray, occ_grid, cfg.compact_samples)
        depth_samples = d[..., None]
    else:
        depth_samples = depth_all[..., None]
    p3d = center[..., None, :] + ray[..., None, :] * depth_samples  # [B,HW,N,3]

    alpha_r, beta_r = sdf_mod.forward_ab(sdf_params, sdf_cfg)
    # fused eval: sdf + geometry feature + analytic normal in one gather pass
    with sdf_mod.hashgrid.trace_site("render_eval"):
        sdfs, feats, normals = sdf_mod.infer_all_with_normal(
            sdf_params, sdf_cfg, p3d)

    view = jnp.broadcast_to(ray[..., None, :], p3d.shape)
    ray_enc = radf.embed_view(rad_cfg, view)
    geo_enc = feats[..., 1:]
    if rad_cfg.dual_field:
        geo_enc = jnp.concatenate([geo_enc, radf.geometry_feat(rad_params, rad_cfg, p3d)[..., 1:]],
                                  axis=-1)
    all_enc = jnp.concatenate([p3d, normals, ray_enc, geo_enc], axis=-1)
    rgbs = radf.infer_app(rad_params, rad_cfg, all_enc)

    if sample_valid is not None:
        deltas = jnp.broadcast_to(bin_w[..., None], sdfs[..., 0].shape)
        fused = cfg.fused_composite
        if fused is None:
            fused = jax.default_backend() != "cpu"
        from . import pallas_composite as pc
        rgb_s, depth_mlp, normal_mlp, opacity = pc.composite_fused(
            ray, rgbs, sdfs[..., 0], sample_valid, deltas,
            depth_samples[..., 0], normals, alpha_r[0], beta_r[0],
            use_pallas=bool(fused))
        bg = jnp.asarray(cfg.bgcolor, rgb_s.dtype)
        rgb = rgb_s + (1 - opacity) * bg
        depth_mlp = depth_mlp + (1 - opacity) * depth_samples[..., -1, :]
        normal_mlp = normal_mlp + (1 - opacity) * normals[..., -1, :]
        return {"rgb": rgb, "sdfs_volume": sdfs, "normals": normals,
                "depth_mlp": depth_mlp, "normal_mlp": normal_mlp,
                "opacity": opacity}

    densities = sdf_to_sigma(sdfs, alpha_r, beta_r)
    rgb, prob = composite(ray, rgbs, densities[..., 0], depth_samples)
    w_depth = depth_samples[..., :-1, :]
    w_normal = normals[..., :-1, :]
    opacity = jnp.sum(prob, axis=2)  # [B,HW,1]

    bg = jnp.asarray(cfg.bgcolor, rgb.dtype)
    rgb = rgb + (1 - opacity) * bg

    depth_mlp = jnp.sum(w_depth * prob, axis=2)
    depth_mlp = depth_mlp + (1 - opacity) * depth_samples[..., -1, :]
    normal_mlp = jnp.sum(w_normal * prob, axis=2)
    normal_mlp = normal_mlp + (1 - opacity) * normals[..., -1, :]

    return {"rgb": rgb, "sdfs_volume": sdfs, "normals": normals,
            "depth_mlp": depth_mlp, "normal_mlp": normal_mlp, "opacity": opacity}
