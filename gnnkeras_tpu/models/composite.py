"""Composite (heterogeneous) GNN models: one state-transition MLP per node
type, one shared output MLP.

Re-implements the reference's ``CompositeGNN*`` (GNN/Models/CompositeGNN.py)
with a TPU-friendly type dispatch: instead of ``boolean_mask`` + ``scatter_nd``
per type (CompositeGNN.py:222-232, dynamic shapes), every type's MLP runs over
*all* (padded) node rows — with BatchNorm statistics restricted to that type's
real rows — and the per-type results are combined through the type one-hot.
The per-type CompositeAdjacencies (composite_graph_class.py:57-70) are never
materialized: the shared edge weights are gated by the source node's type on
the fly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from gnnkeras_tpu.graph.batch import GraphBatch
from gnnkeras_tpu.models.gnn import GNNnodeBased, STATE_INIT_STDDEV
from gnnkeras_tpu.models.mlp import MLP
from gnnkeras_tpu.ops.segment import aggregate_edges, segment_sum
from gnnkeras_tpu.utils.dtypes import floatx


class CompositeGNNnodeBased(GNNnodeBased):
    """Node-focused composite GNN (reference CompositeGNN.py:8-304).

    ``net_state`` is a list of MLPs, one per node type, each applied to
    ``[nodes[:, :d_t] | state | Σ_neigh state | aggregated_component]``
    (exact concat order of CompositeGNN.py:224) where ``aggregated_component``
    stacks per-type neighbor-label aggregations and the incoming-arc-label
    aggregation (CompositeGNN.py:251-253)."""

    name = "node"

    def __init__(
        self,
        net_state: List[MLP],
        net_output: MLP,
        state_vect_dim: int,
        max_iteration: int,
        state_threshold: float,
        *,
        per_iteration_bn: bool = False,
    ) -> None:
        assert max_iteration > 0  # reference CompositeGNN.py:27
        super().__init__(
            net_state=None,  # type: ignore[arg-type]
            net_output=net_output,
            state_vect_dim=state_vect_dim,
            max_iteration=max_iteration,
            state_threshold=state_threshold,
            per_iteration_bn=per_iteration_bn,
        )
        self.net_state: List[MLP] = list(net_state)

    # -- parameters -----------------------------------------------------------
    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, len(self.net_state) + 1)
        vs = [net.init(k) for net, k in zip(self.net_state, keys[:-1])]
        vo = self.net_output.init(keys[-1])
        state_trees = [v["state"] for v in vs]
        if self.per_iteration_bn:
            k_iters = max(self.max_iteration, 1)
            state_trees = jax.tree_util.tree_map(
                lambda x: jnp.stack([x] * k_iters), state_trees
            )
        return {
            "params": {"net_state": [v["params"] for v in vs], "net_output": vo["params"]},
            "state": {"net_state": state_trees, "net_output": vo["state"]},
        }

    # -- forward --------------------------------------------------------------
    def _aggregated_component(self, batch: GraphBatch) -> jax.Array:
        """concat of per-type ``CompAdjᵀ·nodes[:, :d_t]`` and ``ArcNodeᵀ·arcs``
        (CompositeGNN.py:251-253); type gating replaces the per-type matrices.
        Batch-constant → precomputed host-side when the batch carries it."""
        if batch.agg_component is not None:
            return batch.agg_component
        n = batch.num_nodes
        src_type = batch.type_mask[batch.arc_src]  # (A, T) bool
        parts = []
        for t, d_t in enumerate(batch.dim_node_label):
            w_t = batch.arcnode_weight * src_type[:, t].astype(floatx())
            msg = batch.nodes[batch.arc_src, :d_t] * w_t[:, None]
            parts.append(segment_sum(msg, batch.arc_dst, n))
        if batch.agg_arc_labels is not None:  # batch-constant, precomputed host-side
            parts.append(batch.agg_arc_labels)
        else:
            parts.append(aggregate_edges(batch.arc_label, batch.arc_dst, batch.arcnode_weight, n))
        return jnp.concatenate(parts, axis=1)

    def unfold(
        self,
        variables: dict,
        batch: GraphBatch,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array, list]:
        if batch.type_mask is None:
            raise ValueError("CompositeGNN requires a composite batch (type_mask set)")
        if batch.num_types != len(self.net_state):
            # zip() below would silently truncate, freezing extra-type nodes
            # at zero state
            raise ValueError(
                f"batch has {batch.num_types} node types but the model has "
                f"{len(self.net_state)} per-type state nets"
            )
        if self._use_transposed(batch):
            return self._unfold_transposed(
                variables, batch, training=training, rng=rng, axis_name=axis_name
            )
        n = batch.num_nodes
        n_types = len(self.net_state)
        aggregated_component = self._aggregated_component(batch)

        if self.state_vect_dim > 0:
            if rng is None:
                raise ValueError("state_vect_dim > 0 requires an rng for the random state init")
            state0 = STATE_INIT_STDDEV * jax.random.normal(rng, (n, self.state_vect_dim), dtype=floatx())
        else:
            state0 = batch.nodes
        state_old0 = jnp.ones_like(state0)

        net_state_params = variables["params"]["net_state"]
        bn0 = variables["state"]["net_state"]

        n_steps = max(self.max_iteration, 1)
        key_shape = jax.random.PRNGKey(0).shape
        if rng is not None:
            step_rngs = jax.random.split(rng, n_steps * n_types).reshape((n_steps, n_types) + key_shape)
        else:
            step_rngs = jnp.zeros((n_steps, n_types) + key_shape, dtype=jax.random.PRNGKey(0).dtype)

        type_cols = [batch.type_mask[:, t] for t in range(n_types)]
        state_width = self.state_vect_dim or batch.nodes.shape[1]

        def transition(state, bn_states, rngs_t, aggregated_states=None):
            # aggregated_states uses the plain (un-gated) adjacency weights,
            # exactly as the reference does (CompositeGNN.py:219) — the BCSR
            # MXU path applies here too.
            if aggregated_states is None:
                aggregated_states = batch.aggregate(state)
            new_state = jnp.zeros((n, state_width), dtype=floatx())
            new_bns = []
            for t, (net, d_t) in enumerate(zip(self.net_state, batch.dim_node_label)):
                inp = jnp.concatenate(
                    [batch.nodes[:, :d_t], state, aggregated_states, aggregated_component], axis=1
                )
                mask_t = jnp.logical_and(type_cols[t], batch.node_mask)
                out_t, bn_t = net.apply(
                    {"params": net_state_params[t], "state": bn_states[t]},
                    inp,
                    training=training,
                    mask=mask_t,
                    rng=rngs_t[t] if rng is not None else None,
                    axis_name=axis_name,
                )
                new_state = new_state + jnp.where(mask_t[:, None], out_t, 0.0)
                new_bns.append(bn_t)
            return new_state, new_bns

        from gnnkeras_tpu.models.gnn import _mesh_predicate, run_unfold_loops

        # iteration-0 peel: at dim_state==0 the first (un-gated) neighbor-
        # state sum IS the precomputed label sum, exactly as in models/gnn.py
        peel_agg = (
            batch.agg_node_labels
            if self.state_vect_dim == 0 and batch.agg_node_labels is not None
            else None
        )
        return run_unfold_loops(
            self, batch, state0, state_old0, bn0, step_rngs, training, transition,
            peel_agg=peel_agg, predicate=_mesh_predicate(axis_name),
        )

    def _unfold_transposed(
        self,
        variables: dict,
        batch: GraphBatch,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        axis_name: Optional[str] = None,
    ) -> Tuple[jax.Array, jax.Array, list]:
        """The composite unfolding with state carried feature-major (sd_pad, N):
        the per-type transition MLPs run via ``apply_t`` (type rows = lanes,
        BatchNorm statistics still restricted per type) over inputs stacked on
        the sublane axis in the reference's concat order
        ([nodes[:, :d_t] | state | Σstate | component], CompositeGNN.py:224),
        and the shared un-gated aggregation (CompositeGNN.py:219) runs through
        the Pallas strip / feature-major BCSR operator with no relayout.  Same
        semantics as the row-major ``unfold`` up to f32 reduction order; at
        dim_state>0 the random init is drawn in row order and transposed so
        both engines consume identical randomness."""
        from gnnkeras_tpu.models.gnn import _mesh_predicate, aggregate_t, run_unfold_loops

        n = batch.num_nodes
        d = batch.nodes.shape[1]
        ds = self.state_vect_dim
        sd = ds if ds > 0 else d
        sd_pad = -(-sd // 8) * 8
        n_types = len(self.net_state)
        comp_t = self._aggregated_component(batch).T  # batch-constant
        labels_t = batch.nodes.T

        if ds > 0:
            if rng is None:
                raise ValueError("state_vect_dim > 0 requires an rng for the random state init")
            state0_rm = STATE_INIT_STDDEV * jax.random.normal(rng, (n, ds), dtype=floatx())
            state0 = jnp.pad(state0_rm.T, ((0, sd_pad - ds), (0, 0)))
        else:
            state0 = jnp.pad(labels_t, ((0, sd_pad - d), (0, 0)))
        # pad rows of old-state are ZERO so threshold>0 norms see exactly the
        # row-major engine's sums
        state_old0 = jnp.pad(jnp.ones((sd, n), floatx()), ((0, sd_pad - sd), (0, 0)))

        net_state_params = variables["params"]["net_state"]
        bn0 = variables["state"]["net_state"]
        n_steps = max(self.max_iteration, 1)
        key_shape = jax.random.PRNGKey(0).shape
        if rng is not None:
            step_rngs = jax.random.split(rng, n_steps * n_types).reshape(
                (n_steps, n_types) + key_shape
            )
        else:
            step_rngs = jnp.zeros((n_steps, n_types) + key_shape, dtype=jax.random.PRNGKey(0).dtype)

        type_cols = [batch.type_mask[:, t] for t in range(n_types)]

        def transition(state_t, bn_states, rngs_t, aggregated_states=None):
            if aggregated_states is None:
                aggregated_states = aggregate_t(state_t, batch, sd)
            new_state = jnp.zeros((sd, n), dtype=floatx())
            new_bns = []
            for t, (net, d_t) in enumerate(zip(self.net_state, batch.dim_node_label)):
                inp = jnp.concatenate(
                    [labels_t[:d_t], state_t[:sd], aggregated_states, comp_t], axis=0
                )
                mask_t = jnp.logical_and(type_cols[t], batch.node_mask)
                out_t, bn_t = net.apply_t(
                    {"params": net_state_params[t], "state": bn_states[t]},
                    inp,
                    training=training,
                    mask=mask_t,
                    rng=rngs_t[t] if rng is not None else None,
                    axis_name=axis_name,
                )
                new_state = new_state + jnp.where(mask_t[None, :], out_t, 0.0)
                new_bns.append(bn_t)
            if sd_pad != sd:
                new_state = jnp.pad(new_state, ((0, sd_pad - sd), (0, 0)))
            return new_state, new_bns

        peel_agg = (
            batch.agg_node_labels.T
            if ds == 0 and batch.agg_node_labels is not None
            else None
        )
        k, state_t, bn_final = run_unfold_loops(
            self, batch, state0, state_old0, bn0, step_rngs, training, transition,
            peel_agg=peel_agg, feature_axis=0, predicate=_mesh_predicate(axis_name),
        )
        return k, state_t[:sd].T, bn_final

    def fold_transition(self, variables: dict):
        """Composite state nets are per-type MLP lists — the single-Dense
        whole-unfold fusion (models/gnn.py fold_transition) does not apply."""
        return None

    def readout_input(self, state: jax.Array, batch: GraphBatch) -> Tuple[jax.Array, jax.Array]:
        """Composite node readout: converged state only — the reference's
        composite apply_filters ignores node labels even when dim_state==0
        (CompositeGNN.py:237-239), unlike the homogeneous version; we follow
        the code per-model."""
        return state, batch.output_row_mask

    def regularization_loss(self, params: dict) -> jax.Array:
        dummy = lambda p: {"params": p, "state": None}
        total = self.net_output.regularization_loss(dummy(params["net_output"]))
        for net, p in zip(self.net_state, params["net_state"]):
            total = total + net.regularization_loss(dummy(p))
        return total

    # -- config / io ------------------------------------------------------------
    def _json_config(self) -> dict:
        return {
            "model_class": type(self).__name__,
            "net_state": [net.get_config() for net in self.net_state],
            "net_output": self.net_output.get_config(),
            "state_vect_dim": self.state_vect_dim,
            "max_iteration": self.max_iteration,
            "state_threshold": self.state_threshold,
            "per_iteration_bn": self.per_iteration_bn,
        }

    @classmethod
    def load(cls, path: str):
        import json
        import os

        if path[-1] != "/":
            path += "/"
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        cfg.pop("model_class", None)
        model = cls(
            net_state=[MLP.from_config(c) for c in cfg.pop("net_state")],
            net_output=MLP.from_config(cfg.pop("net_output")),
            **cfg,
        )
        model._load_variables(path)
        return model

    def copy(self, copy_weights: bool = True):
        clone = type(self)(
            net_state=[MLP.from_config(net.get_config()) for net in self.net_state],
            net_output=MLP.from_config(self.net_output.get_config()),
            state_vect_dim=self.state_vect_dim,
            max_iteration=self.max_iteration,
            state_threshold=self.state_threshold,
            per_iteration_bn=self.per_iteration_bn,
        )
        if copy_weights and self.variables is not None:
            clone.variables = jax.tree_util.tree_map(lambda x: x, self.variables)
        return clone

    def __repr__(self):
        return f"Composite{super().__repr__()}"

    __str__ = __repr__

    def summary(self) -> None:
        print(repr(self))
        for net in self.net_state:
            net.summary(None)
        self.net_output.summary(None)


class CompositeGNNarcBased(CompositeGNNnodeBased):
    """Arc-focused composite GNN (reference CompositeGNN.py:310-327)."""

    name = "arc"

    def readout_input(self, state: jax.Array, batch: GraphBatch) -> Tuple[jax.Array, jax.Array]:
        if batch.arc_inc is not None and state.dtype == jnp.float32:
            # scatter-free backward via the one-hot incidence pairs
            # (ops/incidence.py; f32 only — see GNNarcBased.readout_input)
            from gnnkeras_tpu.ops.incidence import incidence_gather

            s_rows, d_rows = incidence_gather(
                state, batch.arc_src, batch.arc_dst, batch.arc_inc,
            )
        else:
            s_rows, d_rows = state[batch.arc_src], state[batch.arc_dst]
        arc_rows = jnp.concatenate([s_rows, d_rows, batch.arc_label], axis=1)
        return arc_rows, batch.output_row_mask


class CompositeGNNgraphBased(CompositeGNNnodeBased):
    """Graph-focused composite GNN (reference CompositeGNN.py:333-343)."""

    name = "graph"

    def apply_output(self, variables, state, batch, *, training, rng, axis_name=None):
        out_nodes, _, new_bn = self.node_level_output(
            variables, state, batch, training=training, rng=rng, axis_name=axis_name
        )
        out_graph = batch.readout(out_nodes)
        return out_graph, batch.graph_mask, new_bn
