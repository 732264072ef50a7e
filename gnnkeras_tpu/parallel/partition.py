"""Edge-partitioned training of one large graph — the sequence/context-
parallel analog for the convergence loop (SURVEY §5 "long-context").

One big graph's node-state rows are sharded into contiguous ranges over the
``graph`` mesh axis; every edge lives on the device that owns its destination
node, so aggregation is a local segment-sum after the boundary/source states
arrive.  v1 transport is an ``all_gather`` of the sharded state each unfolding
iteration (rides ICI; bandwidth = N·d per step); the Pallas ring/halo overlap
path slots in behind the same interface.  BatchNorm statistics and the
convergence predicate are mesh-global (psum/pmax), so the partitioned run is
numerically equivalent to the single-device run — the determinism check that
stands in for race detection on TPU (SURVEY §5).

No reference counterpart: the reference computes the same graph on one eager
device (GNN/Models/GNN.py:245-274) and its scalability ceiling is that
device's memory.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNnodeBased, STATE_INIT_STDDEV
from gnnkeras_tpu.ops.segment import segment_sum
from gnnkeras_tpu.utils.dtypes import floatx


def _round_up(x: int, m: int) -> int:
    return max(((x + m - 1) // m) * m, m)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "nodes",
        "node_mask",
        "arc_src_global",
        "arc_dst_local",
        "arc_weight",
        "arc_label",
        "arc_mask",
        "set_mask",
        "output_mask",
        "targets",
        "target_mask",
        "sample_weight",
        "publish_local",
        "publish_mask",
        "arc_src_halo",
        "type_mask",
        "arc_src_type",
        "graph_of_node",
        "nodegraph_weight",
        "local_bcsr",
        "halo_bcsr",
        "agg_arc_labels",
        "agg_node_labels",
        "agg_component",
    ],
    meta_fields=["focus", "dim_node_label", "n_parts", "nodes_per_part", "n_graphs"],
)
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """One large graph split into ``n_parts`` equal padded node ranges.

    All arrays carry a leading part axis (D).  ``arc_src_global`` indexes the
    concatenated global state (D·nodes_per_part rows); ``arc_dst_local``
    indexes the owning part's rows.  Padded slots carry zero weight/masks.
    """

    nodes: jax.Array  # (D, Np, dn)
    node_mask: jax.Array  # (D, Np)
    arc_src_global: jax.Array  # (D, Ap)
    arc_dst_local: jax.Array  # (D, Ap)
    arc_weight: jax.Array  # (D, Ap)
    arc_label: jax.Array  # (D, Ap, da)
    arc_mask: jax.Array  # (D, Ap)
    set_mask: jax.Array  # (D, R)  R = Np ('n') or Ap ('a')
    output_mask: jax.Array  # (D, R)
    targets: jax.Array  # (D, R, T)
    target_mask: jax.Array  # (D, R)
    sample_weight: jax.Array  # (D, R)
    # halo exchange (None → full all_gather transport):
    publish_local: Optional[jax.Array]  # (D, H) local rows each device publishes
    publish_mask: Optional[jax.Array]  # (D, H)
    arc_src_halo: Optional[jax.Array]  # (D, Ap) index into [local | gathered published]
    # composite graphs:
    type_mask: Optional[jax.Array]  # (D, Np, T) local node types
    arc_src_type: Optional[jax.Array]  # (D, Ap, T) type one-hot of each edge's SOURCE
    # graph focus ('g'): per-graph readout over GLOBAL graph ids (reference
    # NodeGraph, graph_class.py:127-138); targets rows are replicated graphs.
    graph_of_node: Optional[jax.Array]  # (D, Np) i32 global graph id of each local node
    nodegraph_weight: Optional[jax.Array]  # (D, Np) NodeGraph readout weight (1/N_g)
    # BCSR/MXU aggregation (dense_blocks=True): per-device block operators for
    # local-source edges (Np x Np) and remote-source edges (rows = the
    # exchanged buffer).  The exchange is issued before the local block-SpMM,
    # so XLA's latency-hiding scheduler overlaps transfer with local compute.
    local_bcsr: Optional[object]  # stacked BcsrMatrix, leading D axis
    halo_bcsr: Optional[object]  # stacked BcsrMatrix, leading D axis
    # batch-constant neighbor-label sums per partition, precomputed host-side
    # (the TPU edge scatter is ~100x off roofline; see graph/batch.py)
    agg_arc_labels: Optional[jax.Array]  # (D, Np, da)
    agg_node_labels: Optional[jax.Array]  # (D, Np, dn)
    agg_component: Optional[jax.Array]  # (D, Np, Σd_t + da), composite only
    focus: str
    dim_node_label: Tuple[int, ...]
    n_parts: int
    nodes_per_part: int
    n_graphs: int  # padded graph rows (0 unless focus == 'g')


def _stack_bcsr(mats):
    """Stack per-part BcsrMatrix operators along a new device axis, zero-block
    padded to the largest block count (zero blocks add nothing)."""
    from gnnkeras_tpu.ops.bcsr import BcsrMatrix

    b_max = max(m.blocks.shape[0] for m in mats)

    def pad(m):
        b = m.blocks.shape[0]
        blocks = np.asarray(m.blocks)
        st = np.asarray(m.src_tile)
        dt = np.asarray(m.dst_tile)
        if b < b_max:
            blocks = np.concatenate([blocks, np.zeros((b_max - b,) + blocks.shape[1:], blocks.dtype)])
            st = np.concatenate([st, np.zeros(b_max - b, st.dtype)])
            dt = np.concatenate([dt, np.zeros(b_max - b, dt.dtype)])
        return blocks, st, dt

    padded = [pad(m) for m in mats]
    return BcsrMatrix(
        blocks=jnp.asarray(np.stack([p[0] for p in padded])),
        src_tile=jnp.asarray(np.stack([p[1] for p in padded])),
        dst_tile=jnp.asarray(np.stack([p[2] for p in padded])),
        n_src_tiles=mats[0].n_src_tiles,
        n_dst_tiles=mats[0].n_dst_tiles,
        tile=mats[0].tile,
    )


def locality_order(g: GraphObject) -> np.ndarray:
    """Bandwidth-reducing node permutation (reverse Cuthill–McKee over the
    symmetrized adjacency): position i holds old node ``perm[i]``.  Node-range
    partitioning after this ordering keeps neighbors on the same device, so
    the per-iteration halo shrinks for any graph whose labeling hides its
    locality (partition-method co-design; PAPERS.md [4])."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = g.nodes.shape[0]
    src = g.arcs[:, 0].astype(np.int64)
    dst = g.arcs[:, 1].astype(np.int64)
    a = coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    return np.asarray(reverse_cuthill_mckee((a + a.T).tocsr(), symmetric_mode=True), dtype=np.int64)


def permute_graph_nodes(g: GraphObject, perm: np.ndarray) -> GraphObject:
    """Copy of ``g`` with node rows re-ordered by ``perm`` (arc rows keep
    their order; endpoints are relabeled).  Losses/metrics are permutation-
    invariant; per-node output ROW order follows the new labeling.  Node- and
    graph-focused only (arc-focused masks are arc-indexed and unaffected by
    a node relabel, but target-row bookkeeping under the constructor's arc
    re-sort is not worth the complexity here)."""
    if g.focus == "a":
        raise ValueError("permute_graph_nodes supports focus 'n'/'g' only")
    from gnnkeras_tpu.graph.graph import CompositeGraphObject

    n = g.nodes.shape[0]
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    g2 = g.copy()
    g2.nodes = np.ascontiguousarray(g.nodes[perm])
    arcs = g.arcs.copy()
    arcs[:, 0] = inv[g.arcs[:, 0].astype(np.int64)]
    arcs[:, 1] = inv[g.arcs[:, 1].astype(np.int64)]
    g2.arcs = arcs  # same rows, relabeled endpoints — arcnode_weight aligned
    g2.set_mask = g.set_mask[perm]
    g2.output_mask = g.output_mask[perm]
    if g.focus == "n":
        # target row j belongs to the j-th output-true node; re-sort rows to
        # the new positions of those nodes
        out_idx = np.flatnonzero(g.output_mask)
        order = np.argsort(inv[out_idx], kind="stable")
        g2.targets = g.targets[order]
        g2.sample_weight = g.sample_weight[order]
    g2.graph_of_node = g.graph_of_node[perm]
    g2.nodegraph_weight = g.nodegraph_weight[perm]
    if isinstance(g, CompositeGraphObject):
        g2.type_mask = g.type_mask[perm]
    return g2


def partition_graph(
    g: GraphObject, n_parts: int, pad_multiple: int = 8, halo: bool = True,
    dense_blocks: bool = False, reorder: str = "none",
    agg_dtype: Optional[str] = None,
) -> PartitionedGraph:
    """Contiguous node-range partition; edges assigned to the destination's
    part (incoming aggregation is local).

    With ``halo=True`` each device publishes only the node rows some other
    device actually reads (its halo/boundary set); the per-iteration exchange
    then moves H·d instead of N·d values.  Falls back to the full all_gather
    when the halo would not be smaller.

    Graph focus ('g') partitions a *merged batch* (the flagship MUTAG shape):
    node rows are range-sharded exactly as for 'n' (a graph may straddle
    devices), each device computes a partial NodeGraph readout over global
    graph ids, and the psum of partials reproduces the reference's
    ``NodeGraphᵀ·out`` (GNN/Models/GNN.py:341-346).  Graph-level target rows
    are replicated on every device.

    ``dense_blocks=True`` builds per-partition BCSR/MXU operators (local-edge
    block + halo-edge block) so the sharded convergence loop aggregates on
    the same block-sparse einsum path as the single-chip engine instead of
    the ~20x-slower TPU scatter; the halo exchange is issued ahead of the
    local block-SpMM so XLA overlaps transfer with compute.

    ``reorder='rcm'`` relabels nodes by ``locality_order`` first, shrinking
    the halo for graphs whose labeling hides locality (losses/metrics are
    permutation-invariant; node-row outputs follow the new order).

    ``agg_dtype='int8'`` (with ``dense_blocks``) stores each device's LOCAL
    operator quantized — the banded block-diagonal decomposition when the
    shard-local edges are banded (a range shard of a banded graph is banded
    in local coordinates; offsets forced to the cross-device union so the
    stacked pytree is uniform), quantized BCSR otherwise (ops/banded.py,
    ops/bcsr.py; measured 2.6x on the single-chip banded unfold,
    BASELINE.md round 4).  Halo operators stay float (small).
    ``agg_dtype='auto'`` takes the banded int8 form only when EVERY shard's
    mask+scale factorization is exact and keeps the plain float operators
    otherwise — semantics-preserving quantization (the GNNConfig default
    for single-graph workloads)."""
    if reorder not in ("none", "rcm"):
        raise ValueError(f"unknown reorder {reorder!r} (none | rcm)")
    if agg_dtype is not None and not dense_blocks:
        # the quantized/cast storages are properties of the dense block
        # operators; without them the scatter path would silently ignore
        # the request
        raise ValueError(
            f"agg_dtype={agg_dtype!r} requires dense_blocks=True (the "
            "operator storage it selects only exists on the block path)"
        )
    if reorder == "rcm":
        g = permute_graph_nodes(g, locality_order(g))
    if dense_blocks:
        pad_multiple = max(pad_multiple, 128)  # BCSR tiles are 128-aligned
    n = g.nodes.shape[0]
    chunk = -(-n // n_parts)
    np_pad = _round_up(chunk, pad_multiple)

    src = g.arcs[:, 0].astype(np.int64)
    dst = g.arcs[:, 1].astype(np.int64)
    part_of = np.minimum(dst // chunk, n_parts - 1)
    src_part = np.minimum(src // chunk, n_parts - 1)
    src_global_new = src_part * np_pad + (src - src_part * chunk)

    edges_per_part = [np.flatnonzero(part_of == p) for p in range(n_parts)]
    ap_pad = _round_up(max((len(e) for e in edges_per_part), default=1), pad_multiple)

    dtype = floatx()
    dn, da, t_dim = g.nodes.shape[1], g.DIM_ARC_LABEL, g.DIM_TARGET

    from gnnkeras_tpu.graph.graph import CompositeGraphObject

    composite = isinstance(g, CompositeGraphObject)
    n_types = g.num_types if composite else 0
    type_mask = np.zeros((n_parts, np_pad, n_types), bool) if composite else None
    # NOTE: the edge-source type one-hot is NOT shipped to devices — the
    # composite per-type sums are always host-precomputed (agg_comp_pre)
    arc_src_type = None

    nodes = np.zeros((n_parts, np_pad, dn), dtype)
    node_mask = np.zeros((n_parts, np_pad), bool)
    a_srcg = np.zeros((n_parts, ap_pad), np.int32)
    a_dstl = np.zeros((n_parts, ap_pad), np.int32)
    a_w = np.zeros((n_parts, ap_pad), dtype)
    a_lab = np.zeros((n_parts, ap_pad, da), dtype)
    a_mask = np.zeros((n_parts, ap_pad), bool)

    # mask rows follow the focus entity ('a' → arcs, else nodes); target rows
    # additionally switch to replicated graph rows for 'g'.
    m_rows = ap_pad if g.focus == "a" else np_pad
    n_graphs = max(g.num_graphs, 1) if g.focus == "g" else 0
    g_pad = _round_up(n_graphs, pad_multiple) if g.focus == "g" else 0
    r_rows = g_pad if g.focus == "g" else m_rows
    set_mask = np.zeros((n_parts, m_rows), bool)
    output_mask = np.zeros((n_parts, m_rows), bool)
    targets = np.zeros((n_parts, r_rows, t_dim), dtype)
    target_mask = np.zeros((n_parts, r_rows), bool)
    sample_weight = np.zeros((n_parts, r_rows), dtype)
    graph_of_node = np.zeros((n_parts, np_pad), np.int32) if g.focus == "g" else None
    nodegraph_weight = np.zeros((n_parts, np_pad), dtype) if g.focus == "g" else None

    # targets row-aligned with output-true entities, reference protocol
    if g.focus == "g":
        full_targets = full_sw = None
        targets[:, :n_graphs] = g.targets
        target_mask[:, :n_graphs] = True
        sample_weight[:, :n_graphs] = g.sample_weight
    else:
        full_targets = np.zeros((len(g.output_mask), t_dim), dtype)
        full_sw = np.zeros(len(g.output_mask), dtype)
        out_idx = np.flatnonzero(g.output_mask)
        full_targets[out_idx] = g.targets
        full_sw[out_idx] = g.sample_weight

    for p in range(n_parts):
        lo, hi = p * chunk, min((p + 1) * chunk, n)
        size = hi - lo
        nodes[p, :size] = g.nodes[lo:hi]
        node_mask[p, :size] = True
        e = edges_per_part[p]
        if composite:
            type_mask[p, :size] = g.type_mask[lo:hi]
        a_srcg[p, : len(e)] = src_global_new[e]
        a_dstl[p, : len(e)] = dst[e] - lo
        a_w[p, : len(e)] = g.arcnode_weight[e]
        a_lab[p, : len(e)] = g.arcs[e, 2:]
        a_mask[p, : len(e)] = True
        if g.focus == "g":
            set_mask[p, :size] = g.set_mask[lo:hi]
            output_mask[p, :size] = g.output_mask[lo:hi]
            graph_of_node[p, :size] = g.graph_of_node[lo:hi]
            nodegraph_weight[p, :size] = g.nodegraph_weight[lo:hi]
        elif g.focus == "n":
            set_mask[p, :size] = g.set_mask[lo:hi]
            output_mask[p, :size] = g.output_mask[lo:hi]
            targets[p, :size] = full_targets[lo:hi]
            sample_weight[p, :size] = full_sw[lo:hi]
            target_mask[p, :size] = np.logical_and(g.set_mask[lo:hi], g.output_mask[lo:hi])
        else:  # arc focus: rows follow the per-part edge layout
            set_mask[p, : len(e)] = g.set_mask[e]
            output_mask[p, : len(e)] = g.output_mask[e]
            targets[p, : len(e)] = full_targets[e]
            sample_weight[p, : len(e)] = full_sw[e]
            target_mask[p, : len(e)] = np.logical_and(g.set_mask[e], g.output_mask[e])

    publish_local = publish_mask = arc_src_halo = None
    slot_map = None
    if halo:
        # per-owner q: the union of q-owned src rows read by OTHER parts.
        needed_by_owner = [set() for _ in range(n_parts)]
        for p in range(n_parts):
            e = edges_per_part[p]
            remote = e[src_part[e] != p]
            for s_orig in np.unique(src[remote]):
                needed_by_owner[int(np.minimum(s_orig // chunk, n_parts - 1))].add(int(s_orig))
        h = max((len(x) for x in needed_by_owner), default=0)
        h_pad = _round_up(max(h, 1), pad_multiple)
        if h_pad < np_pad:  # otherwise the full all_gather is cheaper
            publish_local = np.zeros((n_parts, h_pad), np.int32)
            publish_mask = np.zeros((n_parts, h_pad), bool)
            global_to_slot = {}
            for q in range(n_parts):
                rows = sorted(needed_by_owner[q])
                for j, s_orig in enumerate(rows):
                    publish_local[q, j] = s_orig - q * chunk
                    publish_mask[q, j] = True
                    global_to_slot[s_orig] = q * h_pad + j
            arc_src_halo = np.zeros((n_parts, ap_pad), np.int32)
            for p in range(n_parts):
                e = edges_per_part[p]
                local = src_part[e] == p
                idx = np.zeros(len(e), np.int64)
                idx[local] = src[e][local] - p * chunk
                idx[~local] = np_pad + np.array(
                    [global_to_slot[int(x)] for x in src[e][~local]], dtype=np.int64
                )
                arc_src_halo[p, : len(e)] = idx
            slot_map = global_to_slot

    # batch-constant per-partition neighbor-label sums (f64 host accumulation)
    agg_arc_pre = np.zeros((n_parts, np_pad, da), np.float64)
    agg_node_pre = np.zeros((n_parts, np_pad, dn), np.float64)
    for p in range(n_parts):
        e = edges_per_part[p]
        d_local = dst[e] - p * chunk
        w64 = g.arcnode_weight[e].astype(np.float64)
        np.add.at(agg_arc_pre[p], d_local, g.arcs[e, 2:].astype(np.float64) * w64[:, None])
        np.add.at(agg_node_pre[p], d_local, g.nodes[src[e]].astype(np.float64) * w64[:, None])
    agg_comp_pre = None
    if composite:
        dims_list = [int(d) for d in g.DIM_NODE_LABEL]
        agg_comp_pre = np.zeros((n_parts, np_pad, sum(dims_list) + da), np.float64)
        for p in range(n_parts):
            e = edges_per_part[p]
            d_local = dst[e] - p * chunk
            w64 = g.arcnode_weight[e].astype(np.float64)
            off = 0
            for t, d_t in enumerate(dims_list):
                gate = g.type_mask[src[e], t].astype(np.float64)
                np.add.at(
                    agg_comp_pre[p][:, off : off + d_t], d_local,
                    g.nodes[src[e], :d_t].astype(np.float64) * (w64 * gate)[:, None],
                )
                off += d_t
            agg_comp_pre[p][:, off:] = agg_arc_pre[p]

    local_bcsr = halo_bcsr = None
    if dense_blocks:
        from gnnkeras_tpu.ops.bcsr import build_bcsr

        h_rows = publish_local.shape[1] if publish_local is not None else np_pad
        gathered_rows = n_parts * h_rows
        halos_, local_edges = [], []
        for p in range(n_parts):
            e = edges_per_part[p]
            local_sel = src_part[e] == p
            el, er = e[local_sel], e[~local_sel]
            local_edges.append(
                (src[el] - p * chunk, dst[el] - p * chunk, g.arcnode_weight[el])
            )
            if slot_map is not None:
                remote_rows = np.array([slot_map[int(x)] for x in src[er]], dtype=np.int64)
            else:
                remote_rows = src_global_new[er]
            halos_.append(
                build_bcsr(remote_rows, dst[er] - p * chunk,
                           g.arcnode_weight[er], gathered_rows, np_pad, max_band_factor=10**9)
            )
        if agg_dtype in ("int8", "auto"):
            from gnnkeras_tpu.ops.banded import (
                build_banded_operator,
                dense_offsets,
                uniformize_residuals,
            )
            from gnnkeras_tpu.ops.bcsr import quantize_bcsr

            # 'auto': exact-only quantization — banded int8 when every
            # shard's factorization holds, otherwise the plain float
            # operator (no bf16 degrade, no QuantBcsr fallback); the same
            # rule as from_graph_object's auto mode
            strict = agg_dtype == "auto"
            union = sorted(
                set().union(*(dense_offsets(s, d, wl, np_pad) for s, d, wl in local_edges))
            )
            bops = None
            if union and len(union) <= 6:
                def _build_all(dt):
                    return [
                        build_banded_operator(s, d, wl, np_pad, dtype=dt,
                                              force_offsets=tuple(union),
                                              strict_int8=strict)
                        for s, d, wl in local_edges
                    ]

                bops = _build_all(np.int8)
                if any(b is None for b in bops):  # residual bound declined
                    bops = None
                else:
                    # factorability can differ per shard (a parallel arc on
                    # one shard only); stacking needs ONE structure —
                    # degrade collectively to bf16 diagonals.  Only reachable
                    # in explicit-int8 mode: under 'auto' (strict) any
                    # non-factorable shard already nulled bops above, so auto
                    # NEVER degrades — it quantizes exactly or stays float
                    scales = [d.scale is None for b in bops for d in b.diags]
                    if not strict and any(scales) and not all(scales):
                        bops = _build_all(jnp.bfloat16)
                    bops = uniformize_residuals(bops)
                    local_bcsr = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *bops
                    )
            if bops is None and strict:
                # auto: no exact banded structure across every shard — keep
                # the plain float local operators
                locals_ = [
                    build_bcsr(s, d, wl, np_pad, np_pad, max_band_factor=10**9)
                    for s, d, wl in local_edges
                ]
                local_bcsr = _stack_bcsr(locals_)
            elif bops is None:
                def _quant_all(dt):
                    return [
                        quantize_bcsr(
                            build_bcsr(s, d, wl, np_pad, np_pad, max_band_factor=10**9),
                            dt,
                        )
                        for s, d, wl in local_edges
                    ]

                qs = _quant_all("int8")
                # same cross-shard structure rule for the mask+scale split
                if any(q.scale is None for q in qs) and not all(q.scale is None for q in qs):
                    qs = _quant_all("bfloat16")
                # uniform static block counts before stacking
                from gnnkeras_tpu.ops.bcsr import pad_qbcsr

                need = max(int(q.mask.shape[0]) for q in qs)
                qs = [pad_qbcsr(q, need) for q in qs]
                local_bcsr = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qs)
        else:
            locals_ = [
                build_bcsr(s, d, wl, np_pad, np_pad, max_band_factor=10**9)
                for s, d, wl in local_edges
            ]
            local_bcsr = _stack_bcsr(locals_)
            if agg_dtype is not None:
                # explicit cast storage (bfloat16/float32), matching the
                # single-graph route's cast_bcsr behavior — previously these
                # values were silently ignored here
                from gnnkeras_tpu.ops.bcsr import cast_bcsr

                local_bcsr = cast_bcsr(local_bcsr, jnp.dtype(agg_dtype))
        halo_bcsr = _stack_bcsr(halos_)

    return PartitionedGraph(
        nodes=jnp.asarray(nodes),
        node_mask=jnp.asarray(node_mask),
        arc_src_global=jnp.asarray(a_srcg),
        arc_dst_local=jnp.asarray(a_dstl),
        arc_weight=jnp.asarray(a_w),
        arc_label=jnp.asarray(a_lab),
        arc_mask=jnp.asarray(a_mask),
        set_mask=jnp.asarray(set_mask),
        output_mask=jnp.asarray(output_mask),
        targets=jnp.asarray(targets),
        target_mask=jnp.asarray(target_mask),
        sample_weight=jnp.asarray(sample_weight),
        publish_local=None if publish_local is None else jnp.asarray(publish_local),
        publish_mask=None if publish_mask is None else jnp.asarray(publish_mask),
        arc_src_halo=None if arc_src_halo is None else jnp.asarray(arc_src_halo),
        type_mask=None if type_mask is None else jnp.asarray(type_mask),
        arc_src_type=None if arc_src_type is None else jnp.asarray(arc_src_type),
        graph_of_node=None if graph_of_node is None else jnp.asarray(graph_of_node),
        nodegraph_weight=None if nodegraph_weight is None else jnp.asarray(nodegraph_weight),
        local_bcsr=local_bcsr,
        halo_bcsr=halo_bcsr,
        agg_arc_labels=jnp.asarray(agg_arc_pre.astype(dtype)),
        agg_node_labels=jnp.asarray(agg_node_pre.astype(dtype)),
        agg_component=None if agg_comp_pre is None else jnp.asarray(agg_comp_pre.astype(dtype)),
        focus=g.focus,
        dim_node_label=tuple(int(d) for d in g.DIM_NODE_LABEL),
        n_parts=n_parts,
        nodes_per_part=np_pad,
        n_graphs=g_pad,
    )


class PartitionedGNN:
    """Sharded unfolding engine around a homogeneous ``GNNnodeBased`` /
    ``GNNarcBased`` model.  State rows live sharded; each iteration
    all-gathers the state over ICI and aggregates locally."""

    def __init__(
        self,
        gnn: GNNnodeBased,
        mesh: Optional[Mesh] = None,
        axis: str = "graph",
        transport: str = "collective",
        tp_shards: int = 1,
        model_axis: str = "model",
    ):
        """``transport``: 'collective' uses XLA all_gather; 'pallas_ring' moves
        halo buffers around the ICI ring with the Pallas RDMA kernel
        (gnnkeras_tpu/ops/ring.py) — requires the halo publish sets.

        ``tp_shards > 1`` additionally shards the state MLP's features over
        ``model_axis`` (tensor parallelism composed with graph partitioning —
        the mesh must carry both axes)."""
        from gnnkeras_tpu.parallel.mesh import make_mesh

        from gnnkeras_tpu.models.composite import CompositeGNNnodeBased

        self.composite = isinstance(gnn, CompositeGNNnodeBased)
        assert transport in ("collective", "pallas_ring")
        self.gnn = gnn
        self.axis = axis
        self.transport = transport
        self.mesh = mesh if mesh is not None else make_mesh((axis,))
        self.n_devices = self.mesh.shape[axis]
        self.tp_state = None
        self.model_axis = model_axis
        if tp_shards > 1:
            if self.composite:
                raise NotImplementedError("TP composes with homogeneous models (EP covers composite)")
            from gnnkeras_tpu.parallel.tensor_parallel import TensorParallelMLP

            self.tp_state = TensorParallelMLP(gnn.net_state, tp_shards, model_axis)
        self._cache = {}

    # -- device-local compute (runs inside shard_map) -------------------------
    def _local_forward(self, params, mstate, pg: PartitionedGraph, rng, training: bool, strip_axes: int = 1):
        gnn, axis = self.gnn, self.axis
        for _ in range(strip_axes):
            pg = jax.tree_util.tree_map(lambda x: x[0], pg)
        np_local = pg.nodes.shape[0]
        use_halo = pg.publish_local is not None
        use_bcsr = pg.local_bcsr is not None

        def gather_remote(x):
            """The exchanged buffer: halo-published boundary rows when
            available (H·d per device over ICI), the full tiled state
            otherwise (N·d), moved through XLA's all_gather or the Pallas
            RDMA ring kernel."""
            if use_halo:
                published = x[pg.publish_local] * pg.publish_mask[:, None].astype(x.dtype)
                if self.transport == "pallas_ring":
                    from gnnkeras_tpu.ops.ring import ring_all_gather

                    return ring_all_gather(
                        published, axis, self.n_devices,
                        # full mesh shape: each row of a hybrid mesh runs its
                        # own ring; neighbor LOGICAL ids need every axis
                        mesh_axes=tuple(
                            (n, self.mesh.shape[n]) for n in self.mesh.axis_names
                        ),
                    )
                return jax.lax.all_gather(published, axis, tiled=True)
            return jax.lax.all_gather(x, axis, tiled=True)

        def exchange(x):
            """Local rows extended with the exchanged remote rows (the
            edge-list path's row space; arc_src_halo indexes it)."""
            if use_halo:
                return jnp.concatenate([x, gather_remote(x)], axis=0)
            return gather_remote(x)

        src_ext = pg.arc_src_halo if use_halo else pg.arc_src_global

        def aggregate(x):
            """``Adjᵀ·x`` restricted to this device's destination rows.
            BCSR mode: the remote gather is ISSUED first and the local block
            einsum computed while it is in flight (XLA's latency-hiding
            scheduler overlaps the independent collective), then the halo
            blocks consume the gathered buffer — the overlapped exchange the
            BASELINE north star calls for.  Fallback: gather + edge-list
            segment-sum."""
            if use_bcsr:
                from gnnkeras_tpu.ops.banded import BandedOperator, banded_aggregate
                from gnnkeras_tpu.ops.bcsr import QuantBcsr, bcsr_aggregate, qbcsr_aggregate

                remote = gather_remote(x)
                if isinstance(pg.local_bcsr, BandedOperator):
                    agg = banded_aggregate(x, pg.local_bcsr)
                elif isinstance(pg.local_bcsr, QuantBcsr):
                    agg = qbcsr_aggregate(x, pg.local_bcsr)
                else:
                    agg = bcsr_aggregate(x, pg.local_bcsr)
                return agg + bcsr_aggregate(remote, pg.halo_bcsr)
            ext = exchange(x)
            return segment_sum(ext[src_ext] * pg.arc_weight[:, None], pg.arc_dst_local, np_local)

        if pg.agg_arc_labels is not None:
            agg_arcs = pg.agg_arc_labels
        else:
            agg_arcs = segment_sum(pg.arc_label * pg.arc_weight[:, None], pg.arc_dst_local, np_local)

        agg_component = None
        if self.composite:
            # batch-constant, always host-precomputed by partition_graph
            # (the per-type gated sums, CompositeGNN.py:251-253)
            agg_component = pg.agg_component

        if gnn.state_vect_dim > 0:
            my = jax.lax.axis_index(axis)
            state0 = STATE_INIT_STDDEV * jax.random.normal(
                jax.random.fold_in(rng, my), (np_local, gnn.state_vect_dim), dtype=floatx()
            )
            if not self.composite:
                agg_nodes = pg.agg_node_labels if pg.agg_node_labels is not None else aggregate(pg.nodes)
            else:
                agg_nodes = None
        else:
            state0 = pg.nodes
            agg_nodes = None if self.composite else jnp.zeros((np_local, 0), dtype=floatx())

        state_old0 = jnp.ones_like(state0)
        bn0 = mstate["net_state"]
        n_steps = max(gnn.max_iteration, 1)
        # loop/readout keys are independent, as in the single-chip forward
        # (models/gnn.py forward splits rng into loop/output halves) — the
        # readout dropout mask must not reuse the final iteration's key
        rng_loop, rng_out = jax.random.split(rng)
        step_rngs = jax.random.split(rng_loop, n_steps)

        def mesh_unconverged(state, state_old, node_mask, threshold, feature_axis=1):
            """The shared engine's predicate lifted to the mesh: every device
            sees the pmax'd flag, so the whole mesh agrees on the trip count
            (one straggler partition keeps everyone iterating, as the single
            chip would)."""
            from gnnkeras_tpu.models.gnn import unconverged

            local_any = unconverged(state, state_old, node_mask, threshold, feature_axis)
            return jax.lax.pmax(local_any.astype(jnp.int32), axis) > 0

        def transition(state, bn_state, step_rng, agg_states=None):
            if agg_states is None:
                agg_states = aggregate(state)
            if self.composite:
                # per-type expert MLPs on local rows (CompositeGNN.py:215-234)
                state_width = gnn.state_vect_dim or pg.nodes.shape[1]
                new_state = jnp.zeros((np_local, state_width), dtype=floatx())
                new_bns = []
                rngs_t = (
                    jax.random.split(step_rng, len(gnn.net_state)) if training else [None] * len(gnn.net_state)
                )
                for t, (net, d_t) in enumerate(zip(gnn.net_state, pg.dim_node_label)):
                    inp = jnp.concatenate(
                        [pg.nodes[:, :d_t], state, agg_states, agg_component], axis=1
                    )
                    mask_t = jnp.logical_and(pg.type_mask[:, t], pg.node_mask)
                    out_t, bn_t = net.apply(
                        {"params": params["net_state"][t], "state": bn_state[t]},
                        inp,
                        training=training,
                        mask=mask_t,
                        rng=rngs_t[t],
                        axis_name=axis,
                    )
                    new_state = new_state + jnp.where(mask_t[:, None], out_t, 0.0)
                    new_bns.append(bn_t)
                return new_state, new_bns
            components = [state]
            if gnn.state_vect_dim > 0:
                components.append(pg.nodes)
            inp = jnp.concatenate(components + [agg_states, agg_nodes, agg_arcs], axis=1)
            if self.tp_state is not None:
                # model-sharded state MLP; BN row stats still span 'graph'
                return self.tp_state.apply(
                    {"params": params["net_state"], "state": bn_state},
                    inp,
                    training=training,
                    mask=pg.node_mask,
                    rng=step_rng if training else None,
                    bn_axis_name=axis,
                )
            return gnn.net_state.apply(
                {"params": params["net_state"], "state": bn_state},
                inp,
                training=training,
                mask=pg.node_mask,
                rng=step_rng if training else None,
                axis_name=axis,
            )

        # iteration-0 peel (same as the single-chip engine, models/gnn.py): at
        # dim_state==0 state₀ IS the node labels, so the first neighbor-state
        # sum equals the host-precomputed per-partition label sum — one fewer
        # exchange + aggregation per unfold.
        peel = gnn.state_vect_dim == 0 and pg.agg_node_labels is not None and gnn.max_iteration >= 1

        # the SHARED loop driver (models/gnn.py run_unfold_loops) with the
        # mesh-global predicate: training scan / inference while_loop /
        # per-iteration-BN stacks / remat policy all behave exactly as on the
        # single chip — this replaced a drifted local copy of the loop, and
        # is what makes per_iteration_bn compose with partitioning.
        from gnnkeras_tpu.models.gnn import run_unfold_loops

        k, state, bn_final = run_unfold_loops(
            gnn, pg, state0, state_old0, bn0, step_rngs, training, transition,
            peel_agg=pg.agg_node_labels if peel else None,
            predicate=mesh_unconverged,
        )

        # readout
        row_mask = jnp.logical_and(
            jnp.logical_and(pg.set_mask, pg.output_mask),
            pg.arc_mask if pg.focus == "a" else pg.node_mask,
        )  # for 'g' this is the node-level BN mask (reference GNN.py:269-270)
        if pg.focus == "a":
            # composite arc readout takes the state only (CompositeGNN.py:315-327)
            state_c = (
                jnp.concatenate([state, pg.nodes], axis=1)
                if (gnn.state_vect_dim and not self.composite)
                else state
            )
            ext_state_c = exchange(state_c)
            x = jnp.concatenate(
                [ext_state_c[src_ext], state_c[pg.arc_dst_local], pg.arc_label], axis=1
            )
        else:
            # composite node readout = converged state only (CompositeGNN.py:237-239)
            x = (
                jnp.concatenate([state, pg.nodes], axis=1)
                if (gnn.state_vect_dim and not self.composite)
                else state
            )
        out, bn_out = gnn.net_output.apply(
            {"params": params["net_output"], "state": mstate["net_output"]},
            x,
            training=training,
            mask=row_mask,
            rng=rng_out if training else None,
            axis_name=axis,
        )
        if pg.focus == "g":
            # partial NodeGraph readout over GLOBAL graph ids; the psum of
            # partials equals the single-device NodeGraphᵀ·out (GNN.py:345).
            partial = segment_sum(
                out * pg.nodegraph_weight[:, None], pg.graph_of_node, pg.n_graphs
            )
            out = jax.lax.psum(partial, axis)
        new_mstate = {"net_state": bn_final, "net_output": bn_out}
        return k, state, out, pg, new_mstate

    def _local_loss(self, params, mstate, pg, rng, loss_fn, training, strip_axes: int = 1):
        axis = self.axis
        k, state, out, pg_l, new_mstate = self._local_forward(params, mstate, pg, rng, training, strip_axes)
        per_row = loss_fn(pg_l.targets, out)
        m = pg_l.target_mask.astype(per_row.dtype)
        if pg_l.focus == "g":
            # the psum'd readout made out/targets replicated: the local masked
            # mean IS the global loss, and keeping it local keeps the engine's
            # psum(grads) exact (psum transposes to identity per device).
            loss_sum = jnp.sum(per_row * pg_l.sample_weight * m)
            count = jnp.sum(m)
        else:
            loss_sum = jax.lax.psum(jnp.sum(per_row * pg_l.sample_weight * m), axis)
            count = jax.lax.psum(jnp.sum(m), axis)
        loss = loss_sum / jnp.maximum(count, 1.0) + self.gnn.regularization_loss(params)
        return loss, (k, out, new_mstate, count)

    # -- TP variable resharding ------------------------------------------------
    def shard_tp_variables(self, variables: dict) -> dict:
        """Stack the state MLP's variables over the model axis (net_output
        stays replicated)."""
        assert self.tp_state is not None
        sv = self.tp_state.shard_variables(
            {"params": variables["params"]["net_state"], "state": variables["state"]["net_state"]}
        )
        return {
            "params": {"net_state": sv["params"], "net_output": variables["params"]["net_output"]},
            "state": {"net_state": sv["state"], "net_output": variables["state"]["net_output"]},
        }

    def gather_tp_variables(self, stacked: dict) -> dict:
        assert self.tp_state is not None
        g = self.tp_state.gather_variables(
            {"params": stacked["params"]["net_state"], "state": stacked["state"]["net_state"]}
        )
        return {
            "params": {"net_state": g["params"], "net_output": stacked["params"]["net_output"]},
            "state": {"net_state": g["state"], "net_output": stacked["state"]["net_output"]},
        }

    # -- public jitted entry points -------------------------------------------
    def _require_plain_params(self) -> None:
        """The fit/forward/train-step entry points replicate params (P());
        a tensor-parallel configuration needs the hybrid step, which shards
        them over the 'model' axis — fail early with direction instead of a
        trace-time psum error on an unbound axis."""
        if self.tp_state is not None:
            raise ValueError(
                "tp_shards > 1 requires the hybrid entry point "
                "(parallel.hybrid.make_hybrid_train_step with shard_tp_variables); "
                "fit/forward/make_train_step replicate parameters"
            )

    def _make_sharded_step(self):
        """The un-jitted shard_map train step (shared by the single-step and
        the scanned multi-step entry points)."""
        self._require_plain_params()
        if "sharded_train" in self._cache:
            return self._cache["sharded_train"]
        gnn, axis = self.gnn, self.axis
        loss_fn = gnn.loss
        if loss_fn is None:
            raise RuntimeError("call gnn.compile() before building the partitioned train step")

        def device_step(params, mstate, opt_state, pg, rng):
            (loss, (k, out, new_mstate, count)), grads = jax.value_and_grad(
                lambda p: self._local_loss(p, mstate, pg, rng, loss_fn, True), has_aux=True
            )(params)
            # grad-inside-shard_map differentiates the SUM of the per-device
            # losses (psum transposes to psum).  All per-device losses equal
            # the global loss L and params are tied, so pmean — not psum —
            # recovers the exact single-device gradient:
            # pmean_q Σ_p ∂loss_p/∂θ_q = (1/D)·Σ_p ∂L/∂θ = ∂L/∂θ.
            grads = jax.lax.pmean(grads, axis)
            if gnn.average_st_grads:
                grads = gnn.scale_state_grads(grads, k)
            updates, opt_state = gnn.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            logs = {"loss": loss, "k": k}
            return params, new_mstate, opt_state, logs

        sharded = shard_map(
            device_step,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P(axis), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        self._cache["sharded_train"] = sharded
        return sharded

    def make_train_step(self):
        if "train" in self._cache:
            return self._cache["train"]
        step = jax.jit(self._make_sharded_step(), donate_argnums=(0, 1, 2))
        self._cache["train"] = step
        return step

    def make_multi_step(self):
        """K train steps in ONE launch: ``lax.scan`` of the sharded step over
        a (K, 2) rng stack.  Full-batch partitioned training runs one step
        per epoch, so ``fit(steps_per_launch=K)`` turns K epochs into one
        dispatch + one host sync (~30 ms each through a tunneled runtime)."""
        if "train_multi" in self._cache:
            return self._cache["train_multi"]
        sharded = self._make_sharded_step()

        def multi(params, mstate, opt_state, pg, rngs):
            def body(carry, rng):
                p, m, o = carry
                p, m, o, logs = sharded(p, m, o, pg, rng)
                return (p, m, o), logs

            (params, mstate, opt_state), logs = jax.lax.scan(
                body, (params, mstate, opt_state), rngs
            )
            return params, mstate, opt_state, logs

        step = jax.jit(multi, donate_argnums=(0, 1, 2))
        self._cache["train_multi"] = step
        return step

    def make_forward(self, training: bool = False):
        self._require_plain_params()
        key = f"fwd_{training}"
        if key in self._cache:
            return self._cache[key]
        axis = self.axis

        def device_fwd(params, mstate, pg, rng):
            k, state, out, _, new_mstate = self._local_forward(params, mstate, pg, rng, training)
            return k, state[None], out[None], new_mstate

        sharded = shard_map(
            device_fwd,
            mesh=self.mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P(axis), P(axis), P()),
            check_vma=False,
        )
        fn = jax.jit(sharded)
        self._cache[key] = fn
        return fn

    def forward(self, pg: PartitionedGraph, training: bool = False, rng=None):
        """(k, state (D,Np,d), out (D,R,T), new_mstate) — rows follow the
        partition layout; unpad with pg.node_mask / target rows."""
        self.gnn.build()
        if rng is None:
            rng = self.gnn.next_rng()
        fwd = self.make_forward(training)
        k, state, out, new_mstate = fwd(
            self.gnn.variables["params"], self.gnn.variables["state"], pg, rng
        )
        return k, state, out, new_mstate

    def evaluate(self, pg: PartitionedGraph, verbose: int = 0):
        """Loss + metrics over the partitioned graph (inference mode) —
        mirrors trainer.evaluate's logs."""
        gnn = self.gnn
        if gnn.loss is None:
            raise RuntimeError("call compile() before evaluate()")
        gnn.build()
        from gnnkeras_tpu.training.metrics import get_metric

        _, _, out, _ = self.forward(pg, training=False)
        out = np.asarray(out)
        if pg.focus == "g":
            y_pred = out[0]  # replicated per-graph rows
            y = np.asarray(pg.targets[0])
            mask = np.asarray(pg.target_mask[0])
            sw = np.asarray(pg.sample_weight[0])
        else:
            y_pred = out.reshape(-1, out.shape[-1])
            y = np.asarray(pg.targets).reshape(-1, pg.targets.shape[-1])
            mask = np.asarray(pg.target_mask).reshape(-1)
            sw = np.asarray(pg.sample_weight).reshape(-1)
        import jax.numpy as jnp

        per = np.asarray(gnn.loss(jnp.asarray(y), jnp.asarray(y_pred)))
        logs = {"loss": float((per * sw * mask).sum() / max(mask.sum(), 1.0))}
        for spec in gnn.metrics:
            name, fn = get_metric(spec)
            s, c = fn(jnp.asarray(y), jnp.asarray(y_pred), jnp.asarray(mask), jnp.asarray(sw))
            logs[name] = float(s) / max(float(c), 1.0)
        if verbose:
            print(" - ".join(f"{k}: {v:.4f}" for k, v in logs.items()))
        return logs

    def fit(
        self,
        pg: PartitionedGraph,
        epochs: int = 1,
        verbose: int = 1,
        seed: int = 0,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 1,
        resume: bool = False,
        steps_per_launch: int = 1,
        validation_data=None,
        callbacks: Optional[list] = None,
        class_weight: Optional[dict] = None,
        validation_freq: int = 1,
    ):
        """Full-batch training of the partitioned graph with the full
        single-device fit surface (one shared driver, training/fit_loop.py):
        validation (a PartitionedGraph scored by ``self.evaluate`` or a plain
        sequencer scored single-device on the synced weights), callbacks
        (History/EarlyStopping/...), resumable Orbax checkpoints (params +
        BN state + optimizer state + PRNG) and ``class_weight``.  Returns a
        History (dict-style ``h["loss"]`` supported).

        ``steps_per_launch > 1`` scans that many epochs inside one compiled
        launch (exact same trajectory; per-epoch losses still recorded) —
        checkpoints then land at launch-chunk crossings; requesting
        validation or callbacks forces it back to 1 (per-epoch weights only
        exist at launch boundaries)."""
        from gnnkeras_tpu.training.fit_loop import run_fit_loop

        gnn = self.gnn
        if gnn.optimizer is None:
            raise RuntimeError("call compile() before fit()")
        gnn.build(seed=seed)
        if gnn._opt_state is None:
            gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])

        if class_weight:
            import dataclasses as _dc

            from gnnkeras_tpu.training.trainer import _class_weight_vector

            cw_vec = _class_weight_vector(class_weight)
            cls = jnp.clip(jnp.argmax(pg.targets, axis=-1), 0, cw_vec.shape[0] - 1)
            pg = _dc.replace(pg, sample_weight=pg.sample_weight * cw_vec[cls])

        step = self.make_train_step()
        multi = self.make_multi_step() if steps_per_launch > 1 else None
        # the step wants mesh-replicated trees; checkpoint restores and
        # callback mutations come back committed to one device — re-replicate
        # whenever the model view is picked up (no-op when already replicated)
        from jax.sharding import NamedSharding

        rep = NamedSharding(self.mesh, P())
        to_rep = lambda t: jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), t)

        def run_chunk(epoch, n):
            params, mstate, opt_state = to_rep((
                gnn.variables["params"], gnn.variables["state"], gnn._opt_state,
            ))
            if multi is not None and n > 1:
                rngs = jnp.stack([gnn.next_rng() for _ in range(n)])
                params, mstate, opt_state, logs = multi(params, mstate, opt_state, pg, rngs)
                losses = np.asarray(logs["loss"]).tolist()
                ks = np.asarray(logs["k"]).tolist()
            else:
                params, mstate, opt_state, logs = step(params, mstate, opt_state, pg, gnn.next_rng())
                losses = [float(logs["loss"])]
                ks = [float(logs["k"])]
            gnn.variables = {"params": params, "state": mstate}
            gnn._opt_state = opt_state
            return [{"loss": float(l), "k": float(k)} for l, k in zip(losses, ks)]

        validate = None
        if validation_data is not None:
            if isinstance(validation_data, PartitionedGraph):
                validate = lambda: {
                    f"val_{k}": v for k, v in self.evaluate(validation_data).items()
                }
            else:
                from gnnkeras_tpu.training.trainer import evaluate as seq_evaluate

                validate = lambda: seq_evaluate(gnn, validation_data, verbose=0, prefix="val_")

        return run_fit_loop(
            gnn, epochs=epochs, run_chunk=run_chunk, chunk_size=steps_per_launch,
            validate=validate, callbacks=callbacks, verbose=verbose,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
            resume=resume, validation_freq=validation_freq,
        )
