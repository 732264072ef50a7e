"""Layered GNN (LGNN) and its composite variant.

Re-implements the reference's ``LGNN``/``CompositeLGNN``
(GNN/Models/LGNN.py, GNN/Models/CompositeLGNN.py): a stack of same-type GNNs
where each layer re-reads the *original* (t=0) graph augmented with the
previous layer's converged state and/or output (``update_graph``,
LGNN.py:175-214).  Three training modes (LGNN.py:133-151):

- ``parallel``: one jitted step; loss = mean of per-layer losses (LGNN.py:262),
- ``residual``: one jitted step; loss = loss of the mean of layer outputs
  (LGNN.py:263 — the code uses mean, not the README's "sum"; we follow code),
- ``serial``: outer orchestration — each layer is fitted standalone, then its
  state/output are baked into a rebuilt dataset for the next layer
  (LGNN.py:290-359).

Intermediate layers always run the *node-level* processing function (the
graph-level readout applies only to the recorded per-layer outputs and the
final layer), exactly as the reference dispatches via unbound ``Loop`` calls
(LGNN.py:225,235-246).

Known reference quirk NOT reproduced by default: for arc-focused stacks the
reference prepends the propagated output to the *full* arc matrix, i.e. ahead
of the [src, dst] index columns (LGNN.py:211), so the next layer's label slice
``arcs[:, 2:]`` ends up containing raw node indices and dropping part of the
output.  We concatenate the output to the arc *labels* (after src/dst), which
is what the shape algebra (MLP.py:109-115) intends.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from gnnkeras_tpu.graph.batch import GraphBatch
from gnnkeras_tpu.models.base import GraphModel
from gnnkeras_tpu.models.composite import (
    CompositeGNNarcBased,
    CompositeGNNgraphBased,
    CompositeGNNnodeBased,
)
from gnnkeras_tpu.models.gnn import GNNarcBased, GNNgraphBased, GNNnodeBased


class LGNN(GraphModel):
    """Layered GNN over homogeneous graphs (reference LGNN.py:11-362)."""

    _CLASS_NAMES = {GNNnodeBased: "node", GNNarcBased: "arc", GNNgraphBased: "graph"}
    _CLASS_LOADER = {"node": GNNnodeBased, "arc": GNNarcBased, "graph": GNNgraphBased}

    def __init__(
        self,
        gnns: Union[List[GNNnodeBased], List[GNNarcBased], List[GNNgraphBased]],
        get_state: bool,
        get_output: bool,
    ) -> None:
        assert get_state or get_output
        assert len({type(g) for g in gnns}) == 1
        super().__init__()
        self.GNN_CLASS = type(gnns[0])
        self.gnns = list(gnns)
        self.LAYERS = len(gnns)
        self.get_state = bool(get_state)
        self.get_output = bool(get_output)
        self.training_mode: Optional[str] = None

    @property
    def _is_arc(self) -> bool:
        return self.gnns[0].name == "arc"

    @property
    def _is_graph(self) -> bool:
        return self.gnns[0].name == "graph"

    # -- parameters -----------------------------------------------------------
    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, self.LAYERS)
        vs = [gnn.init(k) for gnn, k in zip(self.gnns, keys)]
        return {
            "params": {"gnns": [v["params"] for v in vs]},
            "state": {"gnns": [v["state"] for v in vs]},
        }

    def scale_state_grads(self, grads: dict, ks) -> dict:
        """Per-layer grads/k_i division (reference LGNN.py:272)."""
        scaled = []
        for gnn, g, k in zip(self.gnns, grads["gnns"], ks):
            scaled.append(gnn.scale_state_grads(g, k))
        return {"gnns": scaled}

    def regularization_loss(self, params: dict) -> jax.Array:
        total = self.gnns[0].regularization_loss(params["gnns"][0])
        for gnn, p in zip(self.gnns[1:], params["gnns"][1:]):
            total = total + gnn.regularization_loss(p)
        return total

    # -- graph feature propagation ---------------------------------------------
    def update_graph(
        self,
        batch0: GraphBatch,
        state: jax.Array,
        out: jax.Array,
        out_row_mask: jax.Array,
    ) -> GraphBatch:
        """Concatenate the layer's converged state and/or masked-scattered
        output onto the t=0 node/arc features (reference LGNN.py:175-214).
        State and output are *prepended* ahead of the original labels, and the
        per-type label dims grow accordingly (LGNN.py:210-213)."""
        nodeplus = []
        arcplus = []
        if self.get_state:
            nodeplus.append(state)
        if self.get_output:
            scattered = jnp.where(out_row_mask[:, None], out, 0.0)
            if self._is_arc:
                arcplus.append(scattered)
            else:
                nodeplus.append(scattered)

        nodes = batch0.nodes
        arc_label = batch0.arc_label
        grow = 0
        if nodeplus:
            grow = sum(p.shape[1] for p in nodeplus)
            nodes = jnp.concatenate(nodeplus + [nodes], axis=1)
        if arcplus:
            arc_label = jnp.concatenate(arcplus + [arc_label], axis=1)
        dims = tuple(int(d) + grow for d in batch0.dim_node_label)
        # features changed → the batch-constant precomputed neighbor sums are
        # stale; drop them so the next layer recomputes on device
        return batch0.replace(
            nodes=nodes, arc_label=arc_label, dim_node_label=dims,
            agg_arc_labels=None if arcplus else batch0.agg_arc_labels,
            agg_node_labels=None,
            agg_component=None,
        )

    # -- forward ---------------------------------------------------------------
    def forward(
        self,
        variables: dict,
        batch: GraphBatch,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
    ) -> Tuple[list, list, list, jax.Array, dict]:
        """Run all layers (reference LGNN.Loop, LGNN.py:217-249).

        Returns (ks, states, outs, out_mask, new_model_state); ``outs`` holds
        one output per layer (graph-level for graph focus), ``out_mask`` the
        loss row mask shared by all layers.  ``axis_name`` threads into every
        layer's unfold/output nets (BatchNorm moments psum'd, convergence
        predicate pmax'd) so a device-sharded batch behaves exactly like the
        merged single-chip batch (parallel/packed.py)."""
        batch0 = batch
        cur = batch
        ks, states, outs, new_states = [], [], [], []
        out_mask = None
        for idx, gnn in enumerate(self.gnns):
            vars_i = {"params": variables["params"]["gnns"][idx], "state": variables["state"]["gnns"][idx]}
            if rng is not None:
                rng, rng_loop, rng_out = jax.random.split(rng, 3)
            else:
                rng_loop = rng_out = None
            last = idx == self.LAYERS - 1
            if last:
                k, state, out, out_mask, st_new = gnn.forward(
                    vars_i, cur, training=training, rng=rng_loop, axis_name=axis_name
                )
                outs.append(out)
            else:
                k, state, bn_state = gnn.unfold(
                    vars_i, cur, training=training, rng=rng_loop, axis_name=axis_name
                )
                out, row_mask, bn_out = gnn.node_level_output(
                    vars_i, state, cur, training=training, rng=rng_out, axis_name=axis_name
                )
                st_new = {"net_state": bn_state, "net_output": bn_out}
                if self._is_graph:
                    outs.append(cur.readout(out))
                else:
                    outs.append(out)
                cur = self.update_graph(batch0, state, out, row_mask)
            ks.append(k)
            states.append(state)
            new_states.append(st_new)
        if self._is_graph:
            out_mask = batch.graph_mask
        return ks, states, outs, out_mask, {"gnns": new_states}

    # -- compile ---------------------------------------------------------------
    def compile(
        self,
        optimizer=None,
        loss=None,
        metrics=None,
        average_st_grads: bool = False,
        training_mode: str = "parallel",
        **kwargs,
    ):
        """training_mode ∈ {'serial','parallel','residual'} (reference
        LGNN.py:133-151); sub-GNNs are compiled too, for serial mode."""
        assert training_mode in ("serial", "parallel", "residual")
        super().compile(optimizer=optimizer, loss=loss, metrics=metrics, average_st_grads=average_st_grads)
        for gnn in self.gnns:
            gnn.compile(optimizer=optimizer, loss=loss, metrics=metrics, average_st_grads=average_st_grads)
        self.training_mode = training_mode

    # -- fit (serial mode needs its own orchestration) --------------------------
    def fit(self, sequencer, *args, **kwargs):
        if self.training_mode == "serial":
            from gnnkeras_tpu.training.serial import fit_serial

            return fit_serial(self, sequencer, *args, **kwargs)
        return super().fit(sequencer, *args, **kwargs)

    # -- config / io -------------------------------------------------------------
    def get_config(self) -> dict:
        return {"gnns": self.gnns, "get_state": self.get_state, "get_output": self.get_output}

    @classmethod
    def from_config(cls, config: dict, **kwargs):
        return cls(**config)

    def _json_config(self) -> dict:
        return {
            "model_class": type(self).__name__,
            "gnn_class": self._CLASS_NAMES[self.GNN_CLASS],
            "gnns": [g._json_config() for g in self.gnns],
            "get_state": self.get_state,
            "get_output": self.get_output,
        }

    @classmethod
    def load(cls, path: str):
        import json
        import os

        from gnnkeras_tpu.models.mlp import MLP

        if path[-1] != "/":
            path += "/"
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        cfg.pop("model_class", None)
        gnn_cls = cls._CLASS_LOADER[cfg.pop("gnn_class")]
        gnns = []
        for sub in cfg.pop("gnns"):
            sub.pop("model_class", None)
            if issubclass(gnn_cls, CompositeGNNnodeBased):
                net_state = [MLP.from_config(c) for c in sub.pop("net_state")]
            else:
                net_state = MLP.from_config(sub.pop("net_state"))
            gnns.append(gnn_cls(net_state=net_state, net_output=MLP.from_config(sub.pop("net_output")), **sub))
        model = cls(gnns=gnns, **cfg)
        model._load_variables(path)
        return model

    def copy(self, copy_weights: bool = True):
        clone = type(self)(
            gnns=[g.copy(copy_weights=copy_weights) for g in self.gnns],
            get_state=self.get_state,
            get_output=self.get_output,
        )
        if copy_weights and self.variables is not None:
            clone.variables = jax.tree_util.tree_map(lambda x: x, self.variables)
        return clone

    def __repr__(self):
        return (
            f"LGNN(type={self._CLASS_NAMES.get(self.GNN_CLASS, '?')}, layers={self.LAYERS}, "
            f"get_state={self.get_state}, get_output={self.get_output}, "
            f"mode={self.training_mode}, avg={self.average_st_grads})"
        )

    __str__ = __repr__

    def summary(self) -> None:
        print(repr(self))
        for gnn in self.gnns:
            gnn.summary()

    # -- weight sync with sub-gnns (serial mode) ---------------------------------
    def pull_layer_variables(self, idx: int) -> None:
        """Copy layer ``idx``'s slice of our variables into ``self.gnns[idx]``."""
        self.build()
        self.gnns[idx].variables = {
            "params": self.variables["params"]["gnns"][idx],
            "state": self.variables["state"]["gnns"][idx],
        }

    def push_layer_variables(self, idx: int) -> None:
        """Adopt ``self.gnns[idx].variables`` into our stacked tree."""
        self.build()
        sub = self.gnns[idx].variables
        params = dict(self.variables["params"])
        state = dict(self.variables["state"])
        params["gnns"] = list(params["gnns"])
        state["gnns"] = list(state["gnns"])
        params["gnns"][idx] = sub["params"]
        state["gnns"][idx] = sub["state"]
        self.variables = {"params": params, "state": state}


class CompositeLGNN(LGNN):
    """Layered composite GNN (reference CompositeLGNN.py:12-57)."""

    _CLASS_NAMES = {
        CompositeGNNnodeBased: "node",
        CompositeGNNarcBased: "arc",
        CompositeGNNgraphBased: "graph",
    }
    _CLASS_LOADER = {
        "node": CompositeGNNnodeBased,
        "arc": CompositeGNNarcBased,
        "graph": CompositeGNNgraphBased,
    }

    def __repr__(self):
        return f"Composite{super().__repr__()}"

    __str__ = __repr__
