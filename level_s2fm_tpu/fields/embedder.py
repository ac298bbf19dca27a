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
