"""Geometry and Radiance MLPs (functional) with SAL-style geometric init.

Replaces the reference's `Geometry` / `Radiance` modules
(`models/base.py:164-261`). Parameters are plain pytrees. Layers are
weight-normalized: W = g * V / ||V||_row, with g initialized to ||V||_row
(torch `nn.utils.weight_norm` semantics).

Reference quirks consciously replicated (SURVEY.md §7.3 "numerical parity"):
  * Geometry MLP activation: softplus(beta=100) on all but the last layer.
  * Geometric init: last layer weight ~ N(sqrt(pi)/sqrt(fan_in), 1e-4),
    bias = -sphere_bias; first layer zeros the weights for the hash-feature
    part of the input (only raw xyz drives the initial SDF sphere).
  * Radiance MLP: the reference's inner ReLU is dead code
    (`models/base.py:255-258` tests an empty ModuleList), so hidden layers
    have NO activation; only the final sigmoid applies. We replicate this
    by default and expose ``activation='relu'`` as a documented deviation.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def get_layer_dims(layers: Sequence[Optional[int]]):
    """[null,64,16] -> [(null,64),(64,16)] (ref `utils/util.py:273-275`)."""
    return list(zip(layers[:-1], layers[1:]))


def _weight_norm_params(W: np.ndarray, b: np.ndarray):
    """Split a dense weight into weight-norm (V, g) + bias pytree."""
    g = np.linalg.norm(W, axis=1, keepdims=True)  # [out,1]
    return {"V": jnp.asarray(W), "g": jnp.asarray(g), "b": jnp.asarray(b)}


def _apply_weight_norm_layer(p, x):
    V, g, b = p["V"], p["g"], p["b"]
    norm = jnp.linalg.norm(V, axis=1, keepdims=True)
    W = g * V / norm
    return x @ W.T + b


def init_geometry_mlp(key, input_dim: int, layers: Sequence[Optional[int]],
                      skip: Sequence[int] = (), sphere_bias: float = 1.0,
                      tf_init: bool = True):
    """Init the SDF MLP. layers like [null,64,16]; last out_dim gets +1 for
    the sdf channel (ref `models/base.py:179-201`)."""
    dims = get_layer_dims(layers)
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key)).sum() % (2 ** 31))
    params = []
    for li, (k_in, k_out) in enumerate(dims):
        if li == 0:
            k_in = input_dim
        if li in skip:
            k_in += input_dim
        if li == len(dims) - 1:
            k_out += 1  # +1 sdf channel in front of the feature vector
        if tf_init:
            if li == len(dims) - 1:
                W = rng.normal(np.sqrt(np.pi) / np.sqrt(dims[li][0]), 1e-4, size=(k_out, k_in))
                b = np.full((k_out,), -sphere_bias)
            elif li == 0:
                W = np.zeros((k_out, k_in))
                W[:, :3] = rng.normal(0.0, np.sqrt(2) / np.sqrt(k_out), size=(k_out, 3))
                b = np.zeros((k_out,))
            elif li in skip:
                W = rng.normal(0.0, np.sqrt(2) / np.sqrt(k_out), size=(k_out, k_in))
                W[:, -(input_dim - 3):] = 0.0
                b = np.zeros((k_out,))
            else:
                W = rng.normal(0.0, np.sqrt(2) / np.sqrt(k_out), size=(k_out, k_in))
                b = np.zeros((k_out,))
        else:
            bound = 1.0 / np.sqrt(k_in)
            W = rng.uniform(-bound, bound, size=(k_out, k_in))
            b = rng.uniform(-bound, bound, size=(k_out,))
        params.append(_weight_norm_params(W.astype(np.float32), b.astype(np.float32)))
    return {"layers": params}


def apply_geometry_mlp(params, points_enc: jnp.ndarray,
                       skip: Sequence[int] = ()) -> jnp.ndarray:
    """Softplus(beta=100) hidden activations (ref `models/base.py:206-217`).

    ``skip`` is static config (not part of the params pytree — pytrees must
    hold only array leaves so jax.grad can traverse them).
    """
    feat = points_enc
    n = len(params["layers"])
    for li, p in enumerate(params["layers"]):
        if li in skip:
            feat = jnp.concatenate([feat, points_enc], axis=-1) / jnp.sqrt(2.0)
        feat = _apply_weight_norm_layer(p, feat)
        if li <= n - 2:
            feat = jax.nn.softplus(100.0 * feat) / 100.0
    return feat


def init_radiance_mlp(key, input_dim: int, layers: Sequence[Optional[int]],
                      tf_init: bool = True):
    """Init the radiance decoder MLP (ref `models/base.py:221-246`)."""
    dims = get_layer_dims(layers)
    rng = np.random.default_rng((np.asarray(jax.random.key_data(key)).sum() + 1) % (2 ** 31))
    params = []
    for li, (k_in, k_out) in enumerate(dims):
        if li == 0:
            k_in = input_dim
        bound = 1.0 / np.sqrt(k_in)
        W = rng.uniform(-bound, bound, size=(k_out, k_in)).astype(np.float32)
        b = rng.uniform(-bound, bound, size=(k_out,)).astype(np.float32)
        params.append(_weight_norm_params(W, b))
    return {"layers": params}


def apply_radiance_mlp(params, x: jnp.ndarray, activation: str = "none") -> jnp.ndarray:
    feat = x
    n = len(params["layers"])
    for li, p in enumerate(params["layers"]):
        feat = _apply_weight_norm_layer(p, feat)
        if activation == "relu" and li <= n - 2:
            feat = jax.nn.relu(feat)
        # default ('none'): replicate the reference's dead inner ReLU
    return jax.nn.sigmoid(feat)
