"""Model shell shared by GNN/CompositeGNN/LGNN.

The compute path is purely functional (see gnnkeras_tpu.models.gnn); this base
class provides the user-facing imperative surface the reference exposes as
``tf.keras.Model`` subclasses — compile / fit / evaluate / predict /
save / load / copy — re-implemented over optax + jitted train steps
(the reference forces eager mode instead, GNN/Models/GNN.py:148-162).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np


class GraphModel:
    """Common plumbing: holds ``variables`` (params + batch-norm state pytree),
    an optax optimizer and loss/metric specs after ``compile``."""

    def __init__(self) -> None:
        self.variables: Optional[dict] = None
        self.optimizer = None
        self.loss = None
        self.metrics = ()
        self.average_st_grads = False
        self._opt_state = None
        self._rng = jax.random.PRNGKey(0)

    # -- parameter lifecycle -------------------------------------------------
    def init(self, rng: Optional[jax.Array] = None) -> dict:
        raise NotImplementedError

    def build(self, seed: int = 0) -> None:
        """Initialize variables if not already initialized."""
        if self.variables is None:
            self._rng = jax.random.PRNGKey(seed)
            self._rng, sub = jax.random.split(self._rng)
            self.variables = self.init(sub)

    def next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- compile / fit / evaluate (delegated to the trainer) ------------------
    def compile(self, optimizer=None, loss=None, metrics=None, average_st_grads: bool = False, **kwargs):
        """Configure for learning.  ``optimizer`` is an optax transformation
        (or a string like 'adam'); ``loss`` a name or fn(y, p) -> per-row loss.
        ``average_st_grads`` divides state-net grads by the iteration count, as
        the reference does (GNN/Models/GNN.py:295)."""
        from gnnkeras_tpu.training import losses as L
        from gnnkeras_tpu.training import optimizers as O

        self.optimizer = O.get_optimizer(optimizer)
        self.loss = L.get_loss(loss)
        self.metrics = tuple(metrics or ())
        self.average_st_grads = bool(average_st_grads)
        self._opt_state = None
        self._compiled_cache = {}

    def fit(self, *args, **kwargs):
        from gnnkeras_tpu.training.trainer import fit

        return fit(self, *args, **kwargs)

    def evaluate(self, *args, **kwargs):
        from gnnkeras_tpu.training.trainer import evaluate

        return evaluate(self, *args, **kwargs)

    def predict(self, *args, **kwargs):
        from gnnkeras_tpu.training.trainer import predict

        return predict(self, *args, **kwargs)

    # -- persistence ----------------------------------------------------------
    def get_config(self) -> dict:
        raise NotImplementedError

    def _save_extra(self, path: str) -> None:
        pass

    def save(self, path: str) -> None:
        """Persist config (json) + parameter pytree (npz), mirroring the
        reference's folder layout in spirit (GNN/Models/GNN.py:94-114)."""
        if path[-1] != "/":
            path += "/"
        os.makedirs(path, exist_ok=True)
        with open(f"{path}config.json", "w") as f:
            json.dump(self._json_config(), f)
        flat, treedef = jax.tree_util.tree_flatten(self.variables)
        np.savez(
            f"{path}variables.npz",
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
        )
        self._save_extra(path)

    def _json_config(self) -> dict:
        raise NotImplementedError

    def _load_variables(self, path: str) -> None:
        if path[-1] != "/":
            path += "/"
        archive = np.load(f"{path}variables.npz")
        self.build()
        flat, treedef = jax.tree_util.tree_flatten(self.variables)
        loaded = [archive[f"leaf_{i}"] for i in range(len(flat))]
        self.variables = jax.tree_util.tree_unflatten(treedef, [jax.numpy.asarray(x) for x in loaded])

    # -- misc ------------------------------------------------------------------
    def count_params(self) -> int:
        self.build()
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(self.variables))
