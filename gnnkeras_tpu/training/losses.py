"""Loss functions with Keras-compatible semantics.

The reference delegates to ``tf.keras.losses`` via ``compiled_loss``
(GNN/Models/GNN.py:286); starter.py:46 uses ``categorical_crossentropy``.
Per-row losses here reproduce the Keras math (probability renormalization and
epsilon clipping included); masked weighted reduction lives in the trainer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7  # keras.backend.epsilon()


def categorical_crossentropy(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    p = y_pred / jnp.maximum(jnp.sum(y_pred, axis=-1, keepdims=True), _EPS)
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    return -jnp.sum(y_true * jnp.log(p), axis=-1)


def categorical_crossentropy_from_logits(y_true: jax.Array, logits: jax.Array) -> jax.Array:
    return -jnp.sum(y_true * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def binary_crossentropy(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    p = jnp.clip(y_pred, _EPS, 1.0 - _EPS)
    per_elem = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log(1.0 - p))
    return jnp.mean(per_elem, axis=-1)


def mean_squared_error(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(y_true - y_pred), axis=-1)


def mean_absolute_error(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(y_true - y_pred), axis=-1)


def hinge(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    y = 2.0 * y_true - 1.0
    return jnp.mean(jnp.maximum(0.0, 1.0 - y * y_pred), axis=-1)


_LOSSES = {
    "categorical_crossentropy": categorical_crossentropy,
    "categorical_crossentropy_from_logits": categorical_crossentropy_from_logits,
    "binary_crossentropy": binary_crossentropy,
    "mse": mean_squared_error,
    "mean_squared_error": mean_squared_error,
    "mae": mean_absolute_error,
    "mean_absolute_error": mean_absolute_error,
    "hinge": hinge,
}


def get_loss(spec):
    """Resolve a loss by name or pass a callable ``fn(y, p) -> per-row loss``."""
    if spec is None:
        raise ValueError("a loss must be provided to compile()")
    if callable(spec):
        return spec
    try:
        return _LOSSES[str(spec)]
    except KeyError:
        raise ValueError(f"Unknown loss {spec!r}; known: {sorted(_LOSSES)}")


def masked_mean(per_row: jax.Array, mask: jax.Array, sample_weight: jax.Array) -> jax.Array:
    """Keras-style reduction over real rows: Σ(loss·sw·mask)/|mask| — padded
    and unsupervised rows contribute nothing."""
    m = mask.astype(per_row.dtype)
    count = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(per_row * sample_weight * m) / count
