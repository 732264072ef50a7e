"""Optimizer resolution: optax transformations, with Keras-default
hyperparameters for the names the reference's starters use
(starter.py:47 — ``tf.optimizers.Adam(learning_rate=0.01)``)."""

from __future__ import annotations

import optax


def _adam(learning_rate: float = 0.001):
    # Keras Adam default epsilon is 1e-7 (optax default is 1e-8).
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-7)


def _sgd(learning_rate: float = 0.01):
    return optax.sgd(learning_rate)


def _rmsprop(learning_rate: float = 0.001):
    return optax.rmsprop(learning_rate, decay=0.9, eps=1e-7)


def _adamw(learning_rate: float = 0.001, weight_decay: float = 0.004):
    return optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-7, weight_decay=weight_decay)


_NAMED = {"adam": _adam, "sgd": _sgd, "rmsprop": _rmsprop, "adamw": _adamw}


def _named(name: str, learning_rate=None):
    """Named optimizers go through ``optax.inject_hyperparams`` so the
    learning rate lives in the optimizer STATE (``opt_state.hyperparams``)
    where schedules/callbacks (ReduceLROnPlateau) can change it mid-training
    without re-initializing the moments."""
    fn = optax.inject_hyperparams(_NAMED[name])
    import inspect

    default_lr = inspect.signature(_NAMED[name]).parameters["learning_rate"].default
    return fn(learning_rate=default_lr if learning_rate is None else learning_rate)


def adam(learning_rate: float = 0.001):
    return _named("adam", learning_rate)


def sgd(learning_rate: float = 0.01):
    return _named("sgd", learning_rate)


def rmsprop(learning_rate: float = 0.001):
    return _named("rmsprop", learning_rate)


def adamw(learning_rate: float = 0.001, weight_decay: float = 0.004):
    return optax.inject_hyperparams(_adamw)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )


def get_optimizer(spec):
    """optax transformation passthrough, or a name ('adam', 'adam:0.01')."""
    if spec is None:
        return _named("adam")
    if isinstance(spec, str):
        if ":" in spec:
            name, lr = spec.split(":", 1)
            return _named(name, float(lr))
        return _named(spec)
    return spec  # assume optax GradientTransformation


def current_learning_rate(opt_state):
    """The live learning rate, if the optimizer state carries one."""
    hp = getattr(opt_state, "hyperparams", None)
    if hp and "learning_rate" in hp:
        return float(hp["learning_rate"])
    return None


def set_learning_rate(opt_state, learning_rate: float) -> bool:
    """Write a new learning rate into a hyperparams-carrying optimizer state
    (in place — the state structure is unchanged, so compiled steps replay).
    Returns False when the state carries no tunable learning rate."""
    import jax.numpy as jnp

    hp = getattr(opt_state, "hyperparams", None)
    if hp is None or "learning_rate" not in hp:
        return False
    hp["learning_rate"] = jnp.asarray(learning_rate, dtype=jnp.asarray(hp["learning_rate"]).dtype)
    return True
