"""Edge-wise aggregation primitives.

The reference materializes three scipy/TF sparse operators per graph —
``ArcNode (A×N)``, ``Adjacency (N×N)`` and ``NodeGraph (N×G)`` — and computes
incoming messages with ``tf.sparse.sparse_dense_matmul(op, X, adjoint_a=True)``
(reference: GNN/Models/GNN.py:228,254,258,345).  On TPU we never materialize
the matrices: every one of those products is an edge-/node-wise gather followed
by a segment-sum with precomputed per-edge aggregation weights, which XLA
lowers to fused scatter-adds with static shapes.  The Pallas block-sparse SpMM
kernel tier (gnnkeras_tpu.ops.strip) plugs in behind the same API.

Semantics reproduced exactly (see tests/test_graph.py for oracle checks):

- ``ArcNodeᵀ·L``   == segment_sum(w[e]·arc_label[e]  → dst[e])
- ``Adjacencyᵀ·S`` == segment_sum(w[e]·state[src[e]] → dst[e])
- ``NodeGraphᵀ·O`` == segment_sum(out[n]/N_g         → graph_of_node[n])

where ``w`` is the per-edge weight determined by the aggregation mode
(reference: GNN/graph_class.py:91-124, composite_graph_class.py:73-103).
"""

from __future__ import annotations

import jax


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Static-shape segment sum. ``num_segments`` must be a Python int."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def aggregate_neighbors(
    state: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    weight: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """Incoming-message aggregation: ``out[d] = Σ_{e: dst[e]=d} w[e]·state[src[e]]``.

    Equivalent to the reference's ``Adjacencyᵀ·state``
    (GNN/Models/GNN.py:228).  Padded edges must carry ``weight == 0`` so they
    contribute nothing regardless of their (src, dst) filler indices.
    """
    messages = state[src] * weight[:, None]
    return segment_sum(messages, dst, num_nodes)


def aggregate_edges(
    arc_label: jax.Array,
    dst: jax.Array,
    weight: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """Incoming arc-label aggregation: the reference's ``ArcNodeᵀ·arcs[:, 2:]``
    (GNN/Models/GNN.py:254)."""
    return segment_sum(arc_label * weight[:, None], dst, num_nodes)


def graph_readout(
    node_out: jax.Array,
    graph_of_node: jax.Array,
    node_weight: jax.Array,
    num_graphs: int,
) -> jax.Array:
    """Per-graph readout: the reference's ``NodeGraphᵀ·out`` with NodeGraph
    data ``1/N_g`` (GNN/graph_class.py:136, GNN/Models/GNN.py:345).

    ``node_weight`` carries the ``1/N_g`` factor (0 on padded nodes).
    """
    return segment_sum(node_out * node_weight[:, None], graph_of_node, num_graphs)
