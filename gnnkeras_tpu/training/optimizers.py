"""Optimizer resolution: optax transformations, with Keras-default
hyperparameters for the names the reference's starters use
(starter.py:47 — ``tf.optimizers.Adam(learning_rate=0.01)``)."""

from __future__ import annotations

import optax


def adam(learning_rate: float = 0.001):
    # Keras Adam default epsilon is 1e-7 (optax default is 1e-8).
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-7)


def sgd(learning_rate: float = 0.01):
    return optax.sgd(learning_rate)


def rmsprop(learning_rate: float = 0.001):
    return optax.rmsprop(learning_rate, decay=0.9, eps=1e-7)


def adamw(learning_rate: float = 0.001, weight_decay: float = 0.004):
    return optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-7, weight_decay=weight_decay)


_NAMED = {"adam": adam, "sgd": sgd, "rmsprop": rmsprop, "adamw": adamw}


def get_optimizer(spec):
    """optax transformation passthrough, or a name ('adam', 'adam:0.01')."""
    if spec is None:
        return adam()
    if isinstance(spec, str):
        if ":" in spec:
            name, lr = spec.split(":", 1)
            return _NAMED[name](float(lr))
        return _NAMED[spec]()
    return spec  # assume optax GradientTransformation
