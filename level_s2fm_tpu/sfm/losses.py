"""Shared loss utilities for the optimization phases.

The reference weighs losses as 10**w with per-phase log10 weight tables
(`options/LevelS2fM.yaml:100-125`, `summarize_loss` in each pipeline file);
`None` disables a term. Masked means use sum/count so padded batches with
validity masks stay static-shape (SURVEY.md §7.3).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def l1(x, y=None):
    if y is None:
        return jnp.mean(jnp.abs(x))
    return jnp.mean(jnp.abs(x - y))


def masked_mean(x, mask, eps=1e-8):
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / (jnp.sum(mask) + eps)


def safe_norm(x, axis=-1, eps=1e-12, keepdims=False):
    """L2 norm with a finite gradient at the origin.

    ``jnp.linalg.norm``'s VJP is ``ct * x/|x|`` = 0/0 = NaN at x == 0, and
    a zero cotangent does NOT save you (0 * NaN = NaN): one residual that
    converges to EXACTLY zero in float32 — order-1 probable over the
    ~1e7 near-converged observation-steps of a long BA phase — poisons
    the whole gradient and NaNs the fields irreversibly (observed: the
    32-view flagship run died in global BA at view 13; the reference
    carries a pdb trap for the same family, `pipelines/BA.py:142-145`).
    sqrt(sum(x^2) + eps) floors the value at 1e-6 (negligible at pixel /
    scene scale) and bounds the gradient by 1.
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def smooth_l1(x, y):
    """Huber with beta=1 (torch smooth_l1_loss default), elementwise."""
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def psnr(rgb, rgb_gt, mask=None):
    if mask is None:
        mse = jnp.mean((rgb - rgb_gt) ** 2)
    else:
        mse = masked_mean(jnp.mean((rgb - rgb_gt) ** 2, axis=-1),
                          mask)
    return -10.0 * jnp.log10(mse + 1e-12)


def weighted_total(loss: Dict[str, jnp.ndarray], weights: Dict[str, Optional[float]]):
    """total = sum 10**w_k * loss_k over keys with non-None weights.

    Weights may be jnp scalars (for the BA dynamic reproj flip)."""
    total = 0.0
    for k, v in loss.items():
        w = weights.get(k, None)
        if w is None:
            continue
        total = total + 10.0 ** w * v
    return total
