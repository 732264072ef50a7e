"""Device-side graph batch: an immutable pytree with static padded shapes.

This replaces the reference's ``GraphTensor`` + the flat positional tuple
protocol of its sequencers (GNN/graph_class.py:433-560,
GNN/Sequencers/GraphSequencers.py:104-120).  Design differences, all mandated
by XLA/TPU:

- **Static shapes**: nodes/arcs/graphs are padded to caller-chosen bucket
  sizes so every batch compiles once.  Padded arcs carry weight 0 and padded
  nodes are masked everywhere, so they are bit-inert in aggregation, batch
  normalization, convergence checks and losses.
- **No sparse tensors**: the ArcNode/Adjacency/NodeGraph operators travel as
  (src, dst, weight) / (graph_of_node, weight) arrays; matvecs are
  gather + segment-sum (gnnkeras_tpu.ops.segment).
- **Targets are row-aligned** with their focus entity (node/arc/graph) and
  gated by ``target_mask``, instead of being boolean-masked to a dynamic-length
  tensor as the reference does (GraphSequencers.py:112-116).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnnkeras_tpu.graph.graph import CompositeGraphObject, GraphObject
from gnnkeras_tpu.utils.dtypes import floatx


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["sel", "span_tile_sel", "span_group", "span_rows"],
    meta_fields=["n_span_pad"],
)
@dataclasses.dataclass(frozen=True)
class CompactReadout:
    """Tile-wise graph readout for tile-packed batches.

    The NodeGraph operator as (T, Gmax, 128) per-tile selection weights: with
    whole graphs packed per 128-node tile, the readout is one batched
    (Gmax×128)@(128×c) einsum and the graph rows ARE the slot rows
    ``tile·Gmax + rank`` — no scatter and ~10x fewer bytes than 128×128
    NodeGraph blocks.  Graphs spanning multiple tiles (exclusive aligned
    runs) land in slot 0 of each of their tiles; their partials are combined
    by a tiny per-tile segment-sum and written to their first-tile row."""

    sel: jax.Array  # (T, Gmax, 128) readout weights
    span_tile_sel: jax.Array  # (T,) 1.0 where the tile belongs to a spanning graph
    span_group: jax.Array  # (T,) i32 spanning-graph segment id (dummy = n_span_pad-1)
    span_rows: jax.Array  # (n_span_pad,) i32 slot row of each spanning graph
    n_span_pad: int

    def apply(self, node_out: jax.Array) -> jax.Array:
        from gnnkeras_tpu.ops.segment import segment_sum

        t, g_max, tile = self.sel.shape
        tiles = node_out.reshape(t, tile, node_out.shape[1])
        slots = jnp.einsum("tgn,tnc->tgc", self.sel, tiles, preferred_element_type=jnp.float32)
        flat = slots.reshape(t * g_max, node_out.shape[1]).astype(node_out.dtype)
        if self.n_span_pad > 1:  # slot-0 partials of spanning tiles → first-tile row
            tile0 = slots[:, 0, :] * self.span_tile_sel[:, None]
            totals = segment_sum(tile0, self.span_group, self.n_span_pad).astype(node_out.dtype)
            flat = flat.at[self.span_rows].set(totals, mode="drop")
        return flat


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "nodes",
        "arc_src",
        "arc_dst",
        "arc_label",
        "arcnode_weight",
        "node_mask",
        "arc_mask",
        "set_mask",
        "output_mask",
        "graph_of_node",
        "nodegraph_weight",
        "graph_mask",
        "targets",
        "target_mask",
        "sample_weight",
        "type_mask",
        "bcsr",
        "strip",
        "nodegraph_bcsr",
        "compact_readout",
        "agg_arc_labels",
        "agg_node_labels",
        "agg_component",
        "arc_inc",
    ],
    meta_fields=["focus", "dim_node_label"],
)
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """One padded (possibly merged / disjoint-union) graph batch.

    Shapes (N = padded nodes, A = padded arcs, G = padded graphs,
    M = N or A depending on focus, R = M or G for targets):
      nodes (N, dn) · arc_src/arc_dst (A,) i32 · arc_label (A, da)
      arcnode_weight (A,) · node_mask (N,) · arc_mask (A,)
      set_mask/output_mask (M,) · graph_of_node (N,) i32
      nodegraph_weight (N,) · graph_mask (G,) · targets (R, T)
      target_mask (R,) · sample_weight (R,) · type_mask (N, T_types) or None

    Instances built by ``from_graph_object`` additionally carry a host-only
    ``host_pred_rows`` numpy attribute (row indices of supervised entities in
    the caller's order; dropped by pytree transforms) — see trainer.predict.
    """

    nodes: jax.Array
    arc_src: jax.Array
    arc_dst: jax.Array
    arc_label: jax.Array
    arcnode_weight: jax.Array
    node_mask: jax.Array
    arc_mask: jax.Array
    set_mask: jax.Array
    output_mask: jax.Array
    graph_of_node: jax.Array
    nodegraph_weight: jax.Array
    graph_mask: jax.Array
    targets: jax.Array
    target_mask: jax.Array
    sample_weight: jax.Array
    type_mask: Optional[jax.Array]
    bcsr: Optional[object]  # BcsrMatrix when block-sparse aggregation applies
    strip: Optional[object]  # StripOperator (slot-packed batches): the
    # transposed unfold engine's aggregation operator (ops/strip.py)
    nodegraph_bcsr: Optional[object]  # BcsrMatrix (N x G) for graph readout
    compact_readout: Optional[CompactReadout]  # tile-packed per-tile readout
    # batch-constant neighbor sums, precomputed host-side in f64 so the
    # convergence loop never re-runs the (slow on TPU) edge scatter:
    # ``ArcNodeᵀ·arc_labels`` (reference GNN.py:254) and ``Adjᵀ·node_labels``
    agg_arc_labels: Optional[jax.Array]  # (N, da)
    agg_node_labels: Optional[jax.Array]  # (N, dn)
    # composite: concat of per-type ``CompAdjᵀ·nodes[:, :d_t]`` and the arc
    # sum (reference CompositeGNN.py:251-253) — also batch-constant
    agg_component: Optional[jax.Array]  # (N, Σd_t + da)
    # arc focus only: the union one-hot incidence pairs (arc row → src/dst
    # endpoint node) for the readout backward's scatter-free cotangent
    # reduction (ops/incidence.py — the gather VJP's scatter was ~85% of
    # the arc train step); None elsewhere or when the structure declined
    arc_inc: Optional[object] = None  # IncidencePairs
    focus: str = "n"
    dim_node_label: Tuple[int, ...] = ()

    # -- static sizes --------------------------------------------------------
    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def num_arcs(self) -> int:
        return self.arc_src.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def num_types(self) -> int:
        return 1 if self.type_mask is None else self.type_mask.shape[1]

    @property
    def dim_arc_label(self) -> int:
        return self.arc_label.shape[1]

    @property
    def dim_target(self) -> int:
        return self.targets.shape[1]

    @property
    def output_row_mask(self) -> jax.Array:
        """set ∧ output (∧ valid): rows whose state feeds net_output
        (reference GNN.py:269-270)."""
        valid = self.arc_mask if self.focus == "a" else self.node_mask
        return jnp.logical_and(jnp.logical_and(self.set_mask, self.output_mask), valid)

    def replace(self, **kwargs) -> "GraphBatch":
        return dataclasses.replace(self, **kwargs)

    def aggregate(self, state: jax.Array) -> jax.Array:
        """``Adjacencyᵀ·state`` (incoming-message aggregation) — the hot op of
        the convergence loop.  Uses the MXU block-sparse einsum when the
        batch carries a BCSR operator, the edge-list segment-sum otherwise."""
        if self.bcsr is not None:
            from gnnkeras_tpu.ops.banded import BandedOperator, banded_aggregate
            from gnnkeras_tpu.ops.bcsr import QuantBcsr, bcsr_aggregate, qbcsr_aggregate

            if isinstance(self.bcsr, BandedOperator):
                return banded_aggregate(state, self.bcsr)
            if isinstance(self.bcsr, QuantBcsr):
                return qbcsr_aggregate(state, self.bcsr)
            return bcsr_aggregate(state, self.bcsr)
        from gnnkeras_tpu.ops.segment import aggregate_neighbors

        return aggregate_neighbors(state, self.arc_src, self.arc_dst, self.arcnode_weight, self.num_nodes)

    def readout(self, node_out: jax.Array) -> jax.Array:
        """``NodeGraphᵀ·out`` per-graph readout (reference GNN.py:345), via
        the compact tile-wise path (tile-packed batches), the rectangular
        BCSR operator, or the segment fallback."""
        if self.compact_readout is not None:
            return self.compact_readout.apply(node_out)
        if self.nodegraph_bcsr is not None:
            from gnnkeras_tpu.ops.bcsr import bcsr_aggregate

            return bcsr_aggregate(node_out, self.nodegraph_bcsr)[: self.num_graphs]
        from gnnkeras_tpu.ops.segment import graph_readout

        return graph_readout(node_out, self.graph_of_node, self.nodegraph_weight, self.num_graphs)


def _scatter_targets(
    g: GraphObject,
    focus: str,
    n_rows: int,
    n_graphs_pad: int,
    pos: Optional[np.ndarray] = None,
    graph_rows: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Row-align targets/sample_weight with their focus entity.

    The reference's sequencer emits targets already boolean-masked
    (GraphSequencers.py:112-116): one row per output_mask-true entity, further
    filtered to the batch's set.  Here targets live at their entity's row and
    ``target_mask`` encodes the same set∧output filter.  ``graph_rows``
    (compact tile-packed readout) places graph g's target at its slot row
    instead of row g."""
    t_dim = g.DIM_TARGET
    dtype = floatx()
    if focus == "g":
        rows = n_graphs_pad
        targets = np.zeros((rows, t_dim), dtype=dtype)
        sw = np.zeros(rows, dtype=dtype)
        mask = np.zeros(rows, dtype=bool)
        n_real = g.targets.shape[0]
        where = graph_rows if graph_rows is not None else np.arange(n_real)
        targets[where] = g.targets
        sw[where] = g.sample_weight
        mask[where] = True
        return targets, mask, sw

    # node/arc focus: reference targets rows correspond, in order, to
    # output_mask-true entities; scatter them back to entity rows (through the
    # node-position map when the batch is tile-packed).
    targets = np.zeros((n_rows, t_dim), dtype=dtype)
    sw = np.zeros(n_rows, dtype=dtype)
    out_idx = np.flatnonzero(g.output_mask)
    if len(out_idx) != g.targets.shape[0]:
        raise ValueError(
            f"targets rows ({g.targets.shape[0]}) must match output_mask-true entities ({len(out_idx)})"
        )
    rows = out_idx if (focus == "a" or pos is None) else pos[out_idx]
    targets[rows] = g.targets
    sw[rows] = g.sample_weight
    mask = np.zeros(n_rows, dtype=bool)
    mask[rows] = g.set_mask[out_idx]
    return targets, mask, sw


def from_graph_object(
    g: GraphObject,
    pad_nodes: Optional[int] = None,
    pad_arcs: Optional[int] = None,
    pad_graphs: Optional[int] = None,
    set_mask_override: Optional[np.ndarray] = None,
    dense_blocks: bool = True,
    agg_dtype: Optional[str] = None,
    tile_pack: bool = False,
    slot_pack: Optional[int] = None,
    strip_dtype: str = "float32",
    compact_gmax: Optional[int] = None,
    compact_nspan: Optional[int] = None,
) -> GraphBatch:
    """Convert a (possibly merged) host graph into a padded device batch.

    ``set_mask_override`` supports single-graph mini-batching, where each batch
    is a boolean mask over the one graph's supervised nodes
    (reference GraphSequencers.py:162-166,194-196).

    ``tile_pack`` re-positions whole graphs into 128-node tiles (no graph
    straddles a tile boundary), shrinking the BCSR block count — node rows are
    then permuted with gaps; all consumers are mask-driven so semantics are
    unchanged, but per-node output row ORDER differs from the reference's.

    ``slot_pack`` (32/64/128) packs at slot granularity instead and
    additionally builds the compact-strip operator (ops/strip.py) in
    ``strip_dtype``, enabling the transposed unfold engine; ``slot_pack=128``
    positions identically to ``tile_pack`` (dense diagonal-block strips)."""
    n, a = g.nodes.shape[0], g.arcs.shape[0]
    n_graphs = max(g.num_graphs, 1)

    # node position map: identity, or the packed permutation-with-gaps
    pack_width = slot_pack if slot_pack is not None else (128 if tile_pack else None)
    n_strip_tiles = None
    # n_graphs == 1 included: packed positions degenerate to the identity,
    # but the batch must still carry the compact readout / strip operator so
    # a trailing 1-graph batch keeps the sequencer's pytree structure
    if pack_width is not None and dense_blocks and n_graphs >= 1 and n > 0:
        from gnnkeras_tpu.graph.packing import (
            order_tiles_by_format,
            pack_slots,
            positions_from_starts,
        )

        pack_sizes = np.bincount(g.graph_of_node.astype(np.int64), minlength=n_graphs)
        pack_starts, n_rows_needed = pack_slots(pack_sizes, slot=pack_width, tile=128)
        if slot_pack is not None and slot_pack < 128:
            # mixed-format layout: slot-pure tiles first (compact strips),
            # tiles holding >slot graphs after (full diagonal blocks)
            from gnnkeras_tpu.ops.strip import K_TILES

            pack_starts, n_strip_tiles, n_rows_needed = order_tiles_by_format(
                pack_starts, pack_sizes, slot_pack, 128, align=K_TILES
            )
        pos = positions_from_starts(g.graph_of_node, pack_starts)
    else:
        pack_width = None  # packing disabled (single graph / no dense blocks)
        pos = np.arange(n, dtype=np.int64)
        n_rows_needed = n

    # 128-aligned node padding enables the BCSR/MXU aggregation path.
    N = pad_nodes if pad_nodes is not None else _round_up(max(n_rows_needed, 1), 128 if dense_blocks else 8)
    A = pad_arcs if pad_arcs is not None else _round_up(max(a, 1), 8)

    # compact tile-wise readout: graph rows become packing slots tile·Gmax+rank
    compact_info = None
    if (
        pack_width is not None and g.focus == "g" and n_graphs >= 1 and n > 0
        and pad_graphs is None and N % 128 == 0
    ):
        from gnnkeras_tpu.graph.packing import graph_slots_from_starts

        sizes = pack_sizes
        tile0, rank, _, g_max, spanning = graph_slots_from_starts(pack_starts, sizes, 128)
        if compact_gmax is not None:  # sequencer-uniform slot width
            g_max = max(g_max, int(compact_gmax))
        T_n = N // 128
        graph_rows = tile0 * g_max + rank
        compact_info = (tile0, rank, g_max, spanning, T_n, graph_rows)
        G = T_n * g_max
    else:
        graph_rows = None
        G = pad_graphs if pad_graphs is not None else _round_up(n_graphs, 8)
    G_blocks = _round_up(G, 128)  # padded column space for the readout BCSR
    if N < n_rows_needed or A < a or G < n_graphs:
        raise ValueError(f"padding ({N},{A},{G}) smaller than graph ({n_rows_needed},{a},{n_graphs})")

    dtype = floatx()
    nodes = np.zeros((N, g.nodes.shape[1]), dtype=dtype)
    nodes[pos] = g.nodes
    src = np.zeros(A, dtype=np.int32)
    dst = np.zeros(A, dtype=np.int32)
    src[:a] = pos[g.arcs[:, 0].astype(np.int64)].astype(np.int32)
    dst[:a] = pos[g.arcs[:, 1].astype(np.int64)].astype(np.int32)
    arc_label = np.zeros((A, g.DIM_ARC_LABEL), dtype=dtype)
    arc_label[:a] = g.arcs[:, 2:]
    w = np.zeros(A, dtype=dtype)
    w[:a] = g.arcnode_weight

    node_mask = np.zeros(N, dtype=bool)
    node_mask[pos] = True
    arc_mask = np.zeros(A, dtype=bool)
    arc_mask[:a] = True

    sm = g.set_mask if set_mask_override is None else np.asarray(set_mask_override, dtype=bool)
    if g.focus == "a":
        set_mask = np.zeros(A, dtype=bool)
        output_mask = np.zeros(A, dtype=bool)
        set_mask[: len(sm)] = sm
        output_mask[: len(g.output_mask)] = g.output_mask
    else:
        set_mask = np.zeros(N, dtype=bool)
        output_mask = np.zeros(N, dtype=bool)
        set_mask[pos] = sm
        output_mask[pos] = g.output_mask
    m_rows = A if g.focus == "a" else N

    graph_of_node = np.zeros(N, dtype=np.int32)
    ngw = np.zeros(N, dtype=dtype)
    ngw[pos] = g.nodegraph_weight
    graph_mask = np.zeros(G, dtype=bool)
    if compact_info is not None:
        # graph ids follow the slot layout so the segment fallback and the
        # partitioned engine stay consistent with the compact rows
        graph_of_node[pos] = compact_info[5][g.graph_of_node.astype(np.int64)].astype(np.int32)
        graph_mask[compact_info[5]] = True
    else:
        graph_of_node[pos] = g.graph_of_node.astype(np.int32)
        graph_mask[:n_graphs] = True

    r_rows = G if g.focus == "g" else m_rows
    targets, target_mask, sample_weight = _scatter_targets(g, g.focus, r_rows, G, pos, graph_rows)
    if g.focus != "g" and set_mask_override is not None:
        full = np.zeros(r_rows, dtype=bool)
        idx = np.flatnonzero(g.output_mask)
        if g.focus == "a":
            full[idx] = sm[idx]
        else:
            full[pos[idx]] = sm[idx]
        target_mask = full

    # host-only caller-order view (dropped by pytree transforms): row indices
    # of the supervised entities in the caller's (graph, entity) order — lets
    # trainer.predict / serving.Predictor undo the tile-pack permutation,
    # preserving the reference's prediction row order (GNN.py:176-177).
    if g.focus == "g":
        pred_rows = np.asarray(
            graph_rows if graph_rows is not None else np.arange(g.targets.shape[0]),
            dtype=np.int64,
        )
    else:
        idx = np.flatnonzero(g.output_mask)
        rows_entity = idx if g.focus == "a" else pos[idx]
        pred_rows = rows_entity[sm[idx].astype(bool)]

    type_mask = None
    dims: Tuple[int, ...] = tuple(int(d) for d in g.DIM_NODE_LABEL)
    if isinstance(g, CompositeGraphObject):
        type_mask = np.zeros((N, g.num_types), dtype=bool)
        type_mask[pos] = g.type_mask

    bcsr = None
    strip_op = None
    nodegraph_bcsr = None
    compact_readout = None
    if dense_blocks:
        from gnnkeras_tpu.ops.bcsr import TILE, build_bcsr

        if N % TILE == 0:
            bcsr = build_bcsr(src[:a], dst[:a], w[:a], N)
            if slot_pack is not None and pack_width is not None:
                from gnnkeras_tpu.ops.strip import StripFactorError, build_strip_operator

                try:
                    strip_op = build_strip_operator(
                        src[:a], dst[:a], w[:a], N, slot=slot_pack,
                        dtype=jnp.dtype(strip_dtype), n_strip_tiles=n_strip_tiles,
                    )
                except StripFactorError as err:
                    # int8 mask+scale needs one weight per destination column
                    # (sum/normalized/average over deduplicated arcs) — fall
                    # back to direct bf16 weight storage when it doesn't hold
                    # (composite_average, parallel arcs).  Warn so an explicit
                    # strip_dtype='int8' request is observably downgraded
                    # (warnings dedups per call site → once per process).
                    import warnings

                    warnings.warn(
                        "int8 mask+scale strip storage (the default "
                        "strip_dtype) does not apply to this batch: the "
                        f"operator weights are not column-factorable ({err}); "
                        "storing the strip as dense bfloat16 instead",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    strip_op = build_strip_operator(
                        src[:a], dst[:a], w[:a], N, slot=slot_pack,
                        dtype=jnp.dtype("bfloat16"), n_strip_tiles=n_strip_tiles,
                    )
            if compact_info is not None:
                tile0, rank, g_max, spanning, T_n, graph_rows_np = compact_info
                sel = np.zeros((T_n, g_max, 128), dtype=dtype)
                g_of_n = g.graph_of_node.astype(np.int64)
                sel[pos // 128, rank[g_of_n], pos % 128] = g.nodegraph_weight
                span_ids = np.flatnonzero(spanning)
                # sequencer/endpoint-uniform span slots: the spanning-graph
                # count is STATIC metadata, so it must not vary per batch or
                # every composition recompiles (and stack_batches rejects
                # mixed treedefs)
                n_span_pad = max(len(span_ids) + 1, int(compact_nspan or 0))
                span_tile_sel = np.zeros(T_n, dtype=dtype)
                span_group = np.full(T_n, n_span_pad - 1, np.int32)
                span_rows = np.full(n_span_pad, G, np.int32)  # dummy → dropped
                sizes = np.bincount(g_of_n, minlength=n_graphs)
                for s_idx, g_id in enumerate(span_ids):
                    run = -(-int(sizes[g_id]) // 128)
                    t_start = int(tile0[g_id])
                    span_tile_sel[t_start : t_start + run] = 1.0
                    span_group[t_start : t_start + run] = s_idx
                    span_rows[s_idx] = graph_rows_np[g_id]
                compact_readout = CompactReadout(
                    sel=jnp.asarray(sel),
                    span_tile_sel=jnp.asarray(span_tile_sel),
                    span_group=jnp.asarray(span_group),
                    span_rows=jnp.asarray(span_rows),
                    n_span_pad=n_span_pad,
                )
            elif g.focus == "g" and n > 0:
                nodegraph_bcsr = build_bcsr(
                    pos, g.graph_of_node, g.nodegraph_weight, N, G_blocks
                )
            if agg_dtype in ("int8", "auto"):
                # quantized aggregation operator, best available form: banded
                # graphs decompose into per-offset dense-diagonal int8 strips
                # (ops/banded.py — measured 3.1x the f32 einsum on the 500k
                # banded workload, BASELINE.md round 4); non-banded block
                # structures fall back to quantized BCSR (mask+scale blocks,
                # in-VMEM upcast).  The readout operator stays float (read
                # once per forward, not per iteration).
                #
                # ``'auto'`` is the semantics-preserving variant: take the
                # banded int8 form ONLY when the mask+scale factorization is
                # exact (sum/normalized/average over deduplicated arcs) and
                # keep the plain float operator otherwise — never the bf16
                # degrade, never the QuantBcsr fallback (measured a marginal
                # 1.05x, not worth the engine flip on non-banded batches).
                from gnnkeras_tpu.ops.banded import build_banded_operator
                from gnnkeras_tpu.ops.bcsr import quantize_bcsr

                bop = build_banded_operator(
                    src[:a], dst[:a], w[:a], N, dtype=jnp.int8,
                    strict_int8=agg_dtype == "auto",
                )
                if bop is not None:
                    bcsr = bop
                elif agg_dtype == "int8":
                    bcsr = quantize_bcsr(bcsr, "int8")
            elif agg_dtype is not None:
                from gnnkeras_tpu.ops.bcsr import cast_bcsr

                bcsr = cast_bcsr(bcsr, jnp.dtype(agg_dtype))
                nodegraph_bcsr = cast_bcsr(nodegraph_bcsr, jnp.dtype(agg_dtype))

    # batch-constant neighbor-label sums (f64 host accumulation; single-pass
    # C++ when the native tier is available, bit-identical np.add.at fallback)
    from gnnkeras_tpu import native

    agg_arc, agg_node = native.agg_label_sums(
        src[:a], dst[:a], w[:a], arc_label[:a], nodes, N
    )
    agg_component = None
    if type_mask is not None:
        # per-type neighbor-label sums gated by the SOURCE node's type,
        # concat + the arc sum (reference CompositeGNN.py:251-253)
        per_type = native.agg_component_sums(
            src[:a], dst[:a], w[:a], nodes, type_mask, [int(d) for d in dims], N
        )
        agg_component = np.concatenate([per_type, agg_arc], axis=1)

    arc_inc = None
    if g.focus == "a" and dense_blocks:
        from gnnkeras_tpu.ops.incidence import build_incidence_pairs

        arc_inc = build_incidence_pairs(src, dst, N)

    batch = GraphBatch(
        nodes=jnp.asarray(nodes),
        arc_src=jnp.asarray(src),
        arc_dst=jnp.asarray(dst),
        arc_label=jnp.asarray(arc_label),
        arcnode_weight=jnp.asarray(w),
        node_mask=jnp.asarray(node_mask),
        arc_mask=jnp.asarray(arc_mask),
        set_mask=jnp.asarray(set_mask),
        output_mask=jnp.asarray(output_mask),
        graph_of_node=jnp.asarray(graph_of_node),
        nodegraph_weight=jnp.asarray(ngw),
        graph_mask=jnp.asarray(graph_mask),
        targets=jnp.asarray(targets),
        target_mask=jnp.asarray(target_mask),
        sample_weight=jnp.asarray(sample_weight),
        type_mask=None if type_mask is None else jnp.asarray(type_mask),
        bcsr=bcsr,
        strip=strip_op,
        nodegraph_bcsr=nodegraph_bcsr,
        compact_readout=compact_readout,
        agg_arc_labels=jnp.asarray(agg_arc.astype(dtype)),
        agg_node_labels=jnp.asarray(agg_node.astype(dtype)),
        agg_component=None if agg_component is None else jnp.asarray(agg_component.astype(dtype)),
        arc_inc=arc_inc,
        focus=g.focus,
        dim_node_label=dims,
    )
    object.__setattr__(batch, "host_pred_rows", pred_rows)
    return batch


def pad_operators_to_cap(batch: GraphBatch) -> GraphBatch:
    """Pad the batch's data-dependent BCSR block counts to their static caps
    (``_MAX_BAND_FACTOR × tiles`` — the acceptance bound of ``build_bcsr``),
    so programs compiled for one batch replay for every same-padded batch
    regardless of its topology.  Used by the serving endpoint and the serial
    bake loop; sequencers instead pad to their observed maximum (cheaper)."""
    from gnnkeras_tpu.ops.bcsr import _MAX_BAND_FACTOR, pad_bcsr
    from gnnkeras_tpu.ops.incidence import _MAX_PAIRS_PER_ARC_TILE, pad_incidence_pairs

    kwargs = {}
    for name in ("bcsr", "nodegraph_bcsr"):
        m = getattr(batch, name)
        if m is not None:
            kwargs[name] = pad_bcsr(m, _MAX_BAND_FACTOR * max(m.n_src_tiles, m.n_dst_tiles))
    if batch.arc_inc is not None:
        kwargs["arc_inc"] = pad_incidence_pairs(
            batch.arc_inc, _MAX_PAIRS_PER_ARC_TILE * batch.arc_inc.n_arc_tiles
        )
    if not kwargs:
        return batch
    rows = getattr(batch, "host_pred_rows", None)
    batch = batch.replace(**kwargs)
    if rows is not None:
        object.__setattr__(batch, "host_pred_rows", rows)
    return batch


def graphs_to_batch(
    graphs: Sequence[GraphObject],
    focus: str,
    aggregation_mode: str,
    pad_nodes: Optional[int] = None,
    pad_arcs: Optional[int] = None,
    pad_graphs: Optional[int] = None,
    *,
    dense_blocks: bool = True,
    agg_dtype: Optional[str] = None,
    tile_pack: bool = False,
    slot_pack: Optional[int] = None,
    strip_dtype: str = "float32",
) -> GraphBatch:
    """Merge a list of host graphs (disjoint union) and pad to a device batch.
    The fast-path knobs (``tile_pack``, ``slot_pack``, ``agg_dtype``) pass
    through to ``from_graph_object``."""
    cls = CompositeGraphObject if isinstance(graphs[0], CompositeGraphObject) else GraphObject
    merged = cls.merge(list(graphs), focus=focus, aggregation_mode=aggregation_mode)
    return from_graph_object(
        merged, pad_nodes, pad_arcs, pad_graphs,
        dense_blocks=dense_blocks, agg_dtype=agg_dtype, tile_pack=tile_pack,
        slot_pack=slot_pack, strip_dtype=strip_dtype,
    )


def single_graph_batch(
    g: GraphObject,
    batch_set_mask: Optional[np.ndarray] = None,
    pad_nodes: Optional[int] = None,
    pad_arcs: Optional[int] = None,
) -> GraphBatch:
    """Batch view over one large graph: the full topology with a per-batch
    set-mask (reference SingleGraphSequencer, GraphSequencers.py:133-208)."""
    return from_graph_object(g, pad_nodes, pad_arcs, pad_graphs=None, set_mask_override=batch_set_mask)
