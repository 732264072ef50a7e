"""Interop with the reference's Keras model persistence.

The reference persists models as per-MLP Keras models plus a ``config.json``
of scalars (GNN/Models/GNN.py:94-137: ``<path>/net_state/``,
``<path>/net_output/``, ``config.json``; LGNN nests per-layer ``GNN{i}/``
folders, LGNN.py:83-130; CompositeGNN saves ``net_state_{i}/`` per type,
CompositeGNN.py:87-133).  This module imports such models into this
framework:

- ``weights_from_keras(keras_model, mlp_spec)``: Keras layer weights → our
  MLP variable pytree (the inverse of the transplant the parity harness
  does, scripts/parity_mutag.py).
- ``load_reference_gnn(path)``: read a reference-saved model directory into
  the matching ``GNN{node,arc,graph}Based``.

Note: under the Keras 3 installed here, ``tf.keras.models.save_model`` to a
directory is no longer supported (the reference's own ``save`` raises), so
directories are probed for both the legacy SavedModel layout and the modern
``.keras`` archives a current-TF user would produce (``net_state.keras``
next to ``config.json``)."""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

from gnnkeras_tpu.models.mlp import MLP


def weights_from_keras(keras_model, mlp: MLP) -> dict:
    """Extract Dense/BatchNorm weights from a Keras model, aligned with our
    ``MLP`` program order.  Returns ``{'params': [...], 'state': [...]}``."""
    k_layers = [l for l in keras_model.layers if l.get_weights()]
    params: List[dict] = []
    state: List[dict] = []
    ki = 0
    for layer in mlp.program:
        if layer[0] == "dense":
            while len(k_layers[ki].get_weights()) != 2:
                ki += 1
            kernel, bias = k_layers[ki].get_weights()
            params.append({"kernel": np.asarray(kernel), "bias": np.asarray(bias)})
            state.append({})
            ki += 1
        elif layer[0] == "batch_norm":
            while len(k_layers[ki].get_weights()) != 4:
                ki += 1
            gamma, beta, mean, var = k_layers[ki].get_weights()
            params.append({"gamma": np.asarray(gamma), "beta": np.asarray(beta)})
            state.append({"moving_mean": np.asarray(mean), "moving_var": np.asarray(var)})
            ki += 1
        else:  # dropout
            params.append({})
            state.append({})
    return {"params": params, "state": state}


def mlp_spec_from_keras(keras_model, batch_normalization=None) -> MLP:
    """Build an ``MLP`` spec mirroring a Keras Sequential's Dense stack
    (units + activations, leading BatchNorm detection)."""
    units, acts = [], []
    has_bn = False
    input_dim = None
    for l in keras_model.layers:
        cls = type(l).__name__
        if cls == "Dense":
            if input_dim is None:
                input_dim = int(l.get_weights()[0].shape[0])
            units.append(int(l.units))
            act = getattr(l.activation, "__name__", "linear")
            acts.append(act if act != "linear" else "linear")
        elif "BatchNormalization" in cls:
            has_bn = True
            if input_dim is None:
                input_dim = int(l.get_weights()[0].shape[0])
    if batch_normalization is None:
        batch_normalization = has_bn
    return MLP(input_dim=(input_dim,), layers=units, activations=acts,
               batch_normalization=batch_normalization)


def _load_keras_model(base: str, name: str):
    import tensorflow as tf

    for candidate in (f"{base}{name}.keras", os.path.join(base, name)):
        if os.path.exists(candidate):
            return tf.keras.models.load_model(candidate, compile=False)
    raise FileNotFoundError(f"no Keras model at {base}{name}(.keras)")


def load_reference_gnn(path: str, focus: str = "n"):
    """Load a reference-format GNN directory (config.json + net_state/
    net_output Keras models) into the matching GNN class with transplanted
    weights.  As in the reference, the model class is the caller's choice —
    its ``load`` is a classmethod (GNN/Models/GNN.py:117-137) — so ``focus``
    picks node/arc/graph."""
    from gnnkeras_tpu.models.gnn import GNNarcBased, GNNgraphBased, GNNnodeBased

    if path[-1] != "/":
        path += "/"
    with open(os.path.join(path, "config.json")) as f:
        config = json.load(f)

    net_state_k = _load_keras_model(path, "net_state")
    net_output_k = _load_keras_model(path, "net_output")
    net_state = mlp_spec_from_keras(net_state_k)
    net_output = mlp_spec_from_keras(net_output_k)

    cls = {"n": GNNnodeBased, "a": GNNarcBased, "g": GNNgraphBased}[focus]
    # the reference's config.json stores the constructor scalars
    # (GNN.get_config, GNN.py:64-78)
    kwargs = dict(
        state_vect_dim=int(config.get("state_vect_dim", 0)),
        max_iteration=int(config.get("max_iteration", 10)),
        state_threshold=float(config.get("state_threshold", 0.01)),
    )
    model = cls(net_state, net_output, **kwargs)

    vs = weights_from_keras(net_state_k, net_state)
    vo = weights_from_keras(net_output_k, net_output)
    import jax.numpy as jnp

    as_jnp = lambda tree: [
        {k: jnp.asarray(v) for k, v in d.items()} for d in tree
    ]
    model.variables = {
        "params": {"net_state": as_jnp(vs["params"]), "net_output": as_jnp(vo["params"])},
        "state": {"net_state": as_jnp(vs["state"]), "net_output": as_jnp(vo["state"])},
    }
    return model
