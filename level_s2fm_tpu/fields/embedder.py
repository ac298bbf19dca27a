"""Fourier (positional) embedding, functional JAX version.

Equivalent of the reference's `Embedder_Fourier` (`models/base.py:43-97`):
4 log-spaced frequency bands, sin/cos, raw input included (divided by
``rescale``). Used for view directions in the radiance field.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FourierConfig:
    input_dim: int = 3
    max_freq_log2: float = 3.0  # 4 - 1
    n_freqs: int = 4
    log_sampling: bool = True
    include_input: bool = True

    @property
    def out_dim(self) -> int:
        d = self.input_dim * self.n_freqs * 2
        if self.include_input:
            d += self.input_dim
        return d

    def freq_bands(self) -> np.ndarray:
        if self.log_sampling:
            return 2.0 ** np.linspace(0.0, self.max_freq_log2, self.n_freqs)
        return np.linspace(2.0 ** 0.0, 2.0 ** self.max_freq_log2, self.n_freqs)


def fourier_embed(x: jnp.ndarray, cfg: FourierConfig = FourierConfig(),
                  rescale: float = 1.0) -> jnp.ndarray:
    out = []
    if cfg.include_input:
        out.append(x / rescale)
    for freq in cfg.freq_bands():
        out.append(jnp.sin(x * freq))
        out.append(jnp.cos(x * freq))
    return jnp.concatenate(out, axis=-1)


def sh_embed(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical-harmonics basis up to `degree` (default 4 -> 16 dims).

    Parity with the reference's SH encoding branch
    (`models/base.py:153-158`, config `options/config_hash_rad.json` —
    dead at runtime there, available here as `RadF.view_encoding: sh`).
    Standard hardcoded real-SH polynomials (as in tcnn/NGP).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [-0.48860251190291987 * y,
                0.48860251190291987 * z,
                -0.48860251190291987 * x]
    if degree >= 3:
        out += [1.0925484305920792 * xy,
                -1.0925484305920792 * yz,
                0.94617469575755997 * zz - 0.31539156525251999,
                -1.0925484305920792 * xz,
                0.54627421529603959 * (xx - yy)]
    if degree >= 4:
        out += [0.59004358992664352 * y * (-3.0 * xx + yy),
                2.8906114426405538 * xy * z,
                0.45704579946446572 * y * (1.0 - 5.0 * zz),
                0.3731763325901154 * z * (5.0 * zz - 3.0),
                0.45704579946446572 * x * (1.0 - 5.0 * zz),
                1.4453057213202769 * z * (xx - yy),
                0.59004358992664352 * x * (-xx + 3.0 * yy)]
    return jnp.stack(out, axis=-1)
