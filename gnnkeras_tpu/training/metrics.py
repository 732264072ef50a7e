"""Metrics with Keras-compatible resolution ('accuracy' → categorical accuracy
for one-hot targets).  Each metric returns (weighted_sum, weight_count) so the
trainer can accumulate running means across batches the way Keras metric
objects do (reference relies on ``compiled_metrics``, GNN/Models/GNN.py:298)."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _weighted(values: jax.Array, mask: jax.Array, sw: jax.Array) -> Tuple[jax.Array, jax.Array]:
    w = mask.astype(values.dtype) * sw
    return jnp.sum(values * w), jnp.sum(w)


def categorical_accuracy(y, p, mask, sw):
    hit = (jnp.argmax(y, axis=-1) == jnp.argmax(p, axis=-1)).astype(jnp.float32)
    return _weighted(hit, mask, sw)


def binary_accuracy(y, p, mask, sw):
    hit = jnp.mean((y > 0.5) == (p > 0.5), axis=-1).astype(jnp.float32)
    return _weighted(hit, mask, sw)


def mse_metric(y, p, mask, sw):
    return _weighted(jnp.mean(jnp.square(y - p), axis=-1), mask, sw)


def mae_metric(y, p, mask, sw):
    return _weighted(jnp.mean(jnp.abs(y - p), axis=-1), mask, sw)


_METRICS = {
    "accuracy": categorical_accuracy,
    "categorical_accuracy": categorical_accuracy,
    "binary_accuracy": binary_accuracy,
    "mse": mse_metric,
    "mae": mae_metric,
}


def get_metric(spec) -> Tuple[str, Callable]:
    if callable(spec):
        return getattr(spec, "__name__", "metric"), spec
    name = str(spec)
    try:
        return name, _METRICS[name]
    except KeyError:
        raise ValueError(f"Unknown metric {spec!r}; known: {sorted(_METRICS)}")
