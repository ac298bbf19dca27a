"""Per-phase optimizers: Adam groups with a shared exponential-decay schedule.

The reference builds one torch Adam with per-group lrs and a single
ExponentialLR whose gamma = (lr_sdf_end/lr_sdf)**(1/max_iter) multiplies
every group each iteration (`Initialization.py:117-128`, `BA.py:45-88`,
`rendering_refine.py:37-49`). Here: optax.multi_transform with one adam
per label, each on schedule base_lr * gamma**t.
"""
from __future__ import annotations

from typing import Dict

import jax
import optax


def make_phase_optimizer(params, label_of_key: Dict[str, str],
                         label_lrs: Dict[str, float], gamma: float):
    """Build an optax optimizer for a params dict.

    params: top-level dict pytree (e.g. {"sdf":..., "rad":..., "se3_r":...}).
    label_of_key: maps top-level key -> label ('sdf','color','pose_r',...,
    or 'frozen' to zero out updates).
    label_lrs: label -> base lr.
    """
    def tx_for(label):
        if label == "frozen":
            return optax.set_to_zero()
        lr = label_lrs[label]
        return optax.adam(learning_rate=lambda t, lr=lr: lr * gamma ** t)

    labels = {k: jax.tree.map(lambda _: label_of_key[k], v)
              for k, v in params.items()}
    all_labels = set(label_of_key.values())
    tx = optax.multi_transform({lab: tx_for(lab) for lab in all_labels}, labels)
    return tx


def decay_gamma(lr: float, lr_end: float, max_iter: int) -> float:
    return (lr_end / lr) ** (1.0 / max_iter)
