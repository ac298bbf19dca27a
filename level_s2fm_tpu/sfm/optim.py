"""Per-phase optimizers: Adam groups with a shared exponential-decay schedule.

The reference builds one torch Adam with per-group lrs and a single
ExponentialLR whose gamma = (lr_sdf_end/lr_sdf)**(1/max_iter) multiplies
every group each iteration (`Initialization.py:117-128`, `BA.py:45-88`,
`rendering_refine.py:37-49`). Here: optax.multi_transform with one adam
per label, each on schedule base_lr * gamma**t.

The adam here is ``adam_stacked`` — numerically identical to
``optax.adam`` but with both moments stored in ONE ``[2, *leaf.shape]``
array per leaf instead of two separate buffers. This is a remote-TPU
compiler workaround, not a style choice: with the lane-packed hash-table
gradient (``fields/hashgrid._table_gather``), a ``lax.scan`` training
loop that carries TWO table-sized (2^19-row) moment buffers fed from the
flat scatter-add crashes the TPU compile helper deterministically
(bisected: two separate carries crash even when only one consumes the
gradient; one stacked carry compiles and runs; small 2^15 tables are
fine either way). Stacking the moments keeps Adam semantics bit-for-bit
(see tests/test_optim.py) while halving the number of big loop carries.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


class StackedAdamState(NamedTuple):
    count: jnp.ndarray   # int32 scalar, shared across leaves
    moments: optax.Params  # per-leaf [2, *shape]: [0]=mu, [1]=nu


def scale_by_adam_stacked(b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with mu/nu stacked into one array per leaf."""

    def init_fn(params):
        moments = jax.tree.map(
            lambda p: jnp.zeros((2,) + jnp.shape(p), jnp.asarray(p).dtype),
            params)
        return StackedAdamState(jnp.zeros([], jnp.int32), moments)

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)

        def upd(m, g):
            decay = jnp.asarray([b1, b2], m.dtype).reshape((2,) + (1,) * g.ndim)
            return m * decay + jnp.stack([(1 - b1) * g, (1 - b2) * g * g])

        moments = jax.tree.map(upd, state.moments, updates)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def out(m):
            return (m[0] / bc1.astype(m.dtype)) / (
                jnp.sqrt(m[1] / bc2.astype(m.dtype)) + eps)

        return jax.tree.map(out, moments), StackedAdamState(count, moments)

    return optax.GradientTransformation(init_fn, update_fn)


def adam_stacked(learning_rate) -> optax.GradientTransformation:
    """Drop-in for ``optax.adam(learning_rate)`` (callable schedules ok)."""
    if callable(learning_rate):
        lr_step = optax.scale_by_schedule(lambda t: -learning_rate(t))
    else:
        lr_step = optax.scale(-learning_rate)
    return optax.chain(scale_by_adam_stacked(), lr_step)


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
        return adam_stacked(learning_rate=lambda t, lr=lr: lr * gamma ** t)

    labels = {k: jax.tree.map(lambda _: label_of_key[k], v)
              for k, v in params.items()}
    all_labels = set(label_of_key.values())
    tx = optax.multi_transform({lab: tx_for(lab) for lab in all_labels}, labels)
    return tx


def decay_gamma(lr: float, lr_end: float, max_iter: int) -> float:
    return (lr_end / lr) ** (1.0 / max_iter)
