"""Pallas-TPU fused Laplace-sigma + quadrature composite (fwd + bwd).

Replaces the XLA chain `sdf_to_sigma` -> `composite_explicit` -> weighted
depth/normal sums on the default (occupancy-compacted) render path
(ref `models/SDF.py:84-87` + `models/Renderer.py:33-49,84-107`): one
kernel reads sdf/rgb/depth/normal samples once from VMEM-resident tiles
and produces the per-ray reductions, instead of ~15 separate [R,K]
intermediates round-tripping through HBM.

Math (per ray, K samples, already masked/compacted):
  sigma_k = alpha * psi_beta(sdf_k) * valid_k          (Laplace CDF)
  s_k     = sigma_k * delta_k                          (delta = bin * |ray|)
  T_k     = exp(-sum_{j<k} s_j)                        (strict prefix: tri matmul)
  w_k     = T_k * (1 - exp(-s_k))
  out     = (sum_k w_k rgb_k, sum_k w_k d_k, sum_k w_k n_k, sum_k w_k)
Background blending / last-sample terms stay in XLA (cheap [R,3] math,
autodiffed there).

The backward pass is hand-derived and also a Pallas kernel:
  G_k       = g_rgb . rgb_k + g_d d_k + g_n . n_k + g_op
  dL/ds_k   = G_k T_k e^{-s_k} - sum_{j>k} G_j w_j    (strict suffix: tri matmul)
  dL/dsigma = dL/ds * delta ;  dL/ddelta = dL/ds * sigma
  dpsi/dsdf = -(1/(2 beta)) e^{-|sdf|/beta}
  dpsi/dbeta = (sdf / (2 beta^2)) e^{-|sdf|/beta}
Both the prefix and suffix sums ride the MXU as [Rt,K]x[K,K] triangular
matmuls (K = 32 compacted / 128 full: tiny, fully resident).

Use `laplace_composite(...)` — a jax.custom_vjp op; `use_pallas=False`
(or a non-TPU backend) falls back to the identical jnp implementation,
which is also the allclose oracle in tests/test_pallas_composite.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE_R = 256

# set True to run the kernels through the Pallas interpreter (CPU tests)
INTERPRET = False


def _tri_strict_lower(K: int, dtype=jnp.float32):
    # U[j,k] = 1 if j < k : right-multiplying computes strict prefix sums
    return jnp.asarray(np.triu(np.ones((K, K), np.float32), 1), dtype)


def _tri_strict_upper(K: int, dtype=jnp.float32):
    # L[j,k] = 1 if j > k : right-multiplying computes strict suffix sums
    return jnp.asarray(np.tril(np.ones((K, K), np.float32), -1), dtype)


def _sigma(sdf, valid, alpha, beta):
    e = 0.5 * jnp.exp(-jnp.abs(sdf) / beta)
    psi = jnp.where(sdf >= 0, e, 1.0 - e)
    return alpha * psi * valid


# ---------------------------------------------------------------------------
# jnp reference (CPU fallback + oracle)
# ---------------------------------------------------------------------------

def _forward_jnp(sdf, valid, delta, rgb, depth, normal, alpha, beta):
    """sdf/valid/delta/depth [R,K]; rgb/normal [3,R,K]; alpha/beta [].
    Returns (rgb_sum [3,R], depth_sum [R], normal_sum [3,R], opacity [R]).
    """
    s = _sigma(sdf, valid, alpha, beta) * delta
    prefix = jnp.cumsum(s, axis=-1) - s                 # strict prefix
    T = jnp.exp(-prefix)
    w = T * (1.0 - jnp.exp(-s))                         # [R,K]
    rgb_sum = jnp.einsum("rk,crk->cr", w, rgb)
    depth_sum = jnp.sum(w * depth, axis=-1)
    normal_sum = jnp.einsum("rk,crk->cr", w, normal)
    opacity = jnp.sum(w, axis=-1)
    return rgb_sum, depth_sum, normal_sum, opacity


def _backward_jnp(res, g):
    sdf, valid, delta, rgb, depth, normal, alpha, beta = res
    g_rgb, g_depth, g_normal, g_op = g
    sigma = _sigma(sdf, valid, alpha, beta)
    s = sigma * delta
    prefix = jnp.cumsum(s, axis=-1) - s
    T = jnp.exp(-prefix)
    w = T * (1.0 - jnp.exp(-s))

    G = (jnp.einsum("cr,crk->rk", g_rgb, rgb)
         + g_depth[:, None] * depth
         + jnp.einsum("cr,crk->rk", g_normal, normal)
         + g_op[:, None])
    Gw = G * w
    suffix = jnp.cumsum(Gw[..., ::-1], axis=-1)[..., ::-1] - Gw  # strict suffix
    dL_ds = G * T * jnp.exp(-s) - suffix

    d_delta = dL_ds * sigma
    dL_dsigma = dL_ds * delta
    expabs = jnp.exp(-jnp.abs(sdf) / beta)
    d_sdf = dL_dsigma * valid * alpha * (-(0.5 / beta)) * expabs
    psi = jnp.where(sdf >= 0, 0.5 * expabs, 1.0 - 0.5 * expabs)
    d_alpha = jnp.sum(dL_dsigma * valid * psi)
    d_beta = jnp.sum(dL_dsigma * valid * alpha
                     * (0.5 * sdf / beta ** 2) * expabs)
    d_rgb = jnp.einsum("cr,rk->crk", g_rgb, w)
    d_depth = g_depth[:, None] * w
    d_normal = jnp.einsum("cr,rk->crk", g_normal, w)
    return (d_sdf, jnp.zeros_like(valid), d_delta, d_rgb, d_depth, d_normal,
            d_alpha, d_beta)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(ab_ref, sdf_ref, valid_ref, delta_ref, rgb_ref, depth_ref,
                normal_ref, triU_ref,
                rgb_out, depth_out, normal_out, op_out):
    alpha = ab_ref[0, 0]
    beta = ab_ref[0, 1]
    sdf = sdf_ref[:]                                    # [Rt,K]
    s = _sigma(sdf, valid_ref[:], alpha, beta) * delta_ref[:]
    prefix = jnp.dot(s, triU_ref[:], preferred_element_type=jnp.float32)
    w = jnp.exp(-prefix) * (1.0 - jnp.exp(-s))          # [Rt,K]
    rgb = rgb_ref[:]                                    # [3,Rt,K]
    normal = normal_ref[:]
    rgb_out[:] = jnp.sum(rgb * w[None], axis=-1)        # [3,Rt]
    normal_out[:] = jnp.sum(normal * w[None], axis=-1)
    depth_out[:] = jnp.sum(depth_ref[:] * w, axis=-1, keepdims=True).T  # [1,Rt]
    op_out[:] = jnp.sum(w, axis=-1, keepdims=True).T


def _bwd_kernel(ab_ref, sdf_ref, valid_ref, delta_ref, rgb_ref, depth_ref,
                normal_ref, triU_ref, triL_ref,
                grgb_ref, gdepth_ref, gnormal_ref, gop_ref,
                dsdf_out, ddelta_out, drgb_out, ddepth_out, dnormal_out,
                dab_out):
    alpha = ab_ref[0, 0]
    beta = ab_ref[0, 1]
    sdf = sdf_ref[:]
    valid = valid_ref[:]
    delta = delta_ref[:]
    sigma = _sigma(sdf, valid, alpha, beta)
    s = sigma * delta
    prefix = jnp.dot(s, triU_ref[:], preferred_element_type=jnp.float32)
    T = jnp.exp(-prefix)
    w = T * (1.0 - jnp.exp(-s))

    g_rgb = grgb_ref[:]                                  # [3,Rt]
    g_normal = gnormal_ref[:]
    g_depth = gdepth_ref[:]                              # [Rt,1]
    g_op = gop_ref[:]
    rgb = rgb_ref[:]
    normal = normal_ref[:]
    depth = depth_ref[:]

    G = (jnp.sum(rgb * g_rgb[..., None], axis=0)
         + depth * g_depth
         + jnp.sum(normal * g_normal[..., None], axis=0)
         + g_op)                                         # [Rt,K]
    suffix = jnp.dot(G * w, triL_ref[:], preferred_element_type=jnp.float32)
    dL_ds = G * T * jnp.exp(-s) - suffix

    ddelta_out[:] = dL_ds * sigma
    dL_dsigma = dL_ds * delta
    expabs = jnp.exp(-jnp.abs(sdf) / beta)
    dsdf_out[:] = dL_dsigma * valid * alpha * (-(0.5 / beta)) * expabs
    psi = jnp.where(sdf >= 0, 0.5 * expabs, 1.0 - 0.5 * expabs)
    d_alpha = jnp.sum(dL_dsigma * valid * psi)
    d_beta = jnp.sum(dL_dsigma * valid * alpha
                     * (0.5 * sdf / beta ** 2) * expabs)
    # per-tile (alpha, beta) partials in a lane-aligned (8,128) block:
    # d_alpha at [0,0], d_beta at [0,1], zero elsewhere (summed in XLA)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    dab_out[:] = jnp.where((row == 0) & (col == 0), d_alpha, 0.0) \
        + jnp.where((row == 0) & (col == 1), d_beta, 0.0)
    drgb_out[:] = g_rgb[..., None] * w[None]
    ddepth_out[:] = g_depth * w
    dnormal_out[:] = g_normal[..., None] * w[None]


def _pad_r(x, R_pad, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, R_pad - x.shape[axis])
    return jnp.pad(x, pad)


def _forward_pallas(sdf, valid, delta, rgb, depth, normal, alpha, beta):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, K = sdf.shape
    R_pad = -(-R // TILE_R) * TILE_R
    if R_pad != R:
        sdf = _pad_r(sdf, R_pad, 0)
        valid = _pad_r(valid, R_pad, 0)
        delta = _pad_r(delta, R_pad, 0)
        depth = _pad_r(depth, R_pad, 0)
        rgb = _pad_r(rgb, R_pad, 1)
        normal = _pad_r(normal, R_pad, 1)
    grid = (R_pad // TILE_R,)
    ab = jnp.stack([alpha, beta]).reshape(1, 2).astype(jnp.float32)
    triU = _tri_strict_lower(K)

    vs = lambda blk, idx: pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            vs((TILE_R, K), lambda i: (i, 0)),
            vs((TILE_R, K), lambda i: (i, 0)),
            vs((TILE_R, K), lambda i: (i, 0)),
            vs((3, TILE_R, K), lambda i: (0, i, 0)),
            vs((TILE_R, K), lambda i: (i, 0)),
            vs((3, TILE_R, K), lambda i: (0, i, 0)),
            vs((K, K), lambda i: (0, 0)),
        ],
        out_specs=[
            vs((3, TILE_R), lambda i: (0, i)),
            vs((1, TILE_R), lambda i: (0, i)),
            vs((3, TILE_R), lambda i: (0, i)),
            vs((1, TILE_R), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, R_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, R_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, R_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, R_pad), jnp.float32),
        ],
        interpret=INTERPRET,
    )(ab, sdf, valid, delta, rgb, depth, normal, triU)
    rgb_sum, depth_sum, normal_sum, opacity = out
    return (rgb_sum[:, :R], depth_sum[0, :R], normal_sum[:, :R],
            opacity[0, :R])


def _backward_pallas(res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sdf, valid, delta, rgb, depth, normal, alpha, beta = res
    g_rgb, g_depth, g_normal, g_op = g
    R, K = sdf.shape
    R_pad = -(-R // TILE_R) * TILE_R
    if R_pad != R:
        sdf = _pad_r(sdf, R_pad, 0)
        valid = _pad_r(valid, R_pad, 0)
        delta = _pad_r(delta, R_pad, 0)
        depth = _pad_r(depth, R_pad, 0)
        rgb = _pad_r(rgb, R_pad, 1)
        normal = _pad_r(normal, R_pad, 1)
        g_rgb = _pad_r(g_rgb, R_pad, 1)
        g_normal = _pad_r(g_normal, R_pad, 1)
        g_depth = _pad_r(g_depth, R_pad, 0)
        g_op = _pad_r(g_op, R_pad, 0)
    grid = (R_pad // TILE_R,)
    n_tiles = grid[0]
    ab = jnp.stack([alpha, beta]).reshape(1, 2).astype(jnp.float32)
    triU = _tri_strict_lower(K)
    triL = _tri_strict_upper(K)

    vs = lambda blk, idx: pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            vs((TILE_R, K), lambda i: (i, 0)),
            vs((TILE_R, K), lambda i: (i, 0)),
            vs((TILE_R, K), lambda i: (i, 0)),
            vs((3, TILE_R, K), lambda i: (0, i, 0)),
            vs((TILE_R, K), lambda i: (i, 0)),
            vs((3, TILE_R, K), lambda i: (0, i, 0)),
            vs((K, K), lambda i: (0, 0)),
            vs((K, K), lambda i: (0, 0)),
            vs((3, TILE_R), lambda i: (0, i)),
            vs((TILE_R, 1), lambda i: (i, 0)),
            vs((3, TILE_R), lambda i: (0, i)),
            vs((TILE_R, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            vs((TILE_R, K), lambda i: (i, 0)),
            vs((TILE_R, K), lambda i: (i, 0)),
            vs((3, TILE_R, K), lambda i: (0, i, 0)),
            vs((TILE_R, K), lambda i: (i, 0)),
            vs((3, TILE_R, K), lambda i: (0, i, 0)),
            # per-tile (alpha, beta) partials, reduced in XLA below
            vs((8, 128), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, K), jnp.float32),
            jax.ShapeDtypeStruct((R_pad, K), jnp.float32),
            jax.ShapeDtypeStruct((3, R_pad, K), jnp.float32),
            jax.ShapeDtypeStruct((R_pad, K), jnp.float32),
            jax.ShapeDtypeStruct((3, R_pad, K), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32),
        ],
        interpret=INTERPRET,
    )(ab, sdf, valid, delta, rgb, depth, normal, triU, triL,
      g_rgb, g_depth.reshape(-1, 1), g_normal, g_op.reshape(-1, 1))
    d_sdf, d_delta, d_rgb, d_depth, d_normal, d_ab = out
    d_ab = d_ab.reshape(n_tiles, 8, 128)
    return (d_sdf[:R], jnp.zeros((R, K), sdf.dtype), d_delta[:R],
            d_rgb[:, :R], d_depth[:R], d_normal[:, :R],
            jnp.sum(d_ab[:, 0, 0]), jnp.sum(d_ab[:, 0, 1]))


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def laplace_composite(sdf, valid, delta, rgb, depth, normal, alpha, beta,
                      use_pallas: bool = True):
    """Fused Laplace-sigma + composite. See module docstring for shapes."""
    if use_pallas:
        return _forward_pallas(sdf, valid, delta, rgb, depth, normal,
                               alpha, beta)
    return _forward_jnp(sdf, valid, delta, rgb, depth, normal, alpha, beta)


def _lc_fwd(sdf, valid, delta, rgb, depth, normal, alpha, beta, use_pallas):
    out = laplace_composite(sdf, valid, delta, rgb, depth, normal, alpha,
                            beta, use_pallas)
    return out, (sdf, valid, delta, rgb, depth, normal, alpha, beta)


def _lc_bwd(use_pallas, res, g):
    if use_pallas:
        return _backward_pallas(res, g)
    return _backward_jnp(res, g)


laplace_composite.defvjp(_lc_fwd, _lc_bwd)


def composite_fused(ray, rgb_samples, sdf_samples, valid, deltas,
                    depth_samples, normals, alpha, beta,
                    use_pallas: bool = True):
    """Adapter with the renderer's [B,HW,K,*] shapes.

    Returns (rgb [B,HW,3], depth [B,HW,1], normal [B,HW,3],
    opacity [B,HW,1]). Background/last-sample blending stays with the
    caller (ref `models/Renderer.py:89-107`).
    """
    B, HW, K = sdf_samples.shape
    R = B * HW
    ray_len = jnp.linalg.norm(ray, axis=-1).reshape(R)            # [R]
    sdf = sdf_samples.reshape(R, K)
    val = valid.reshape(R, K).astype(sdf.dtype)
    dl = deltas.reshape(R, K) * ray_len[:, None]
    rgb = jnp.moveaxis(rgb_samples.reshape(R, K, 3), -1, 0)       # [3,R,K]
    dep = depth_samples.reshape(R, K)
    nrm = jnp.moveaxis(normals.reshape(R, K, 3), -1, 0)
    a = jnp.asarray(alpha, jnp.float32).reshape(())
    b = jnp.asarray(beta, jnp.float32).reshape(())
    rgb_sum, depth_sum, normal_sum, opacity = laplace_composite(
        sdf, val, dl, rgb, dep, nrm, a, b, use_pallas)
    return (jnp.moveaxis(rgb_sum, 0, 1).reshape(B, HW, 3),
            depth_sum.reshape(B, HW, 1),
            jnp.moveaxis(normal_sum, 0, 1).reshape(B, HW, 3),
            opacity.reshape(B, HW, 1))
