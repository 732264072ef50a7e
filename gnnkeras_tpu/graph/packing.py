"""Tile-aligned graph packing.

The BCSR aggregation's cost is the number of nonzero 128x128 blocks.  A plain
disjoint-union merge lets graphs straddle tile boundaries: every straddling
graph turns 1 diagonal block into up to 4.  Packing whole graphs into
128-node bins (first-fit decreasing; graphs larger than a tile get an aligned
run of tiles) eliminates straddling entirely, cutting block count — and hence
HBM traffic per transition iteration — roughly in half to two-thirds on
molecule-scale datasets.

The packed layout is just a node permutation with gaps: semantics are
untouched because every consumer (aggregation, BatchNorm, losses, readout)
is mask-driven.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def pack_tiles(graph_sizes: np.ndarray, tile: int = 128) -> Tuple[np.ndarray, int]:
    """First-fit-decreasing packing of per-graph node counts into
    ``tile``-node bins.

    Returns (start_offset_per_graph, total_padded_nodes).  Graphs larger than
    one tile start at a fresh tile boundary and occupy an EXCLUSIVE aligned
    run (their partial last tile is not reused: the compact tile-wise readout
    needs spanning tiles to belong to exactly one graph; the waste is bounded
    by one tile per oversize graph)."""
    n_graphs = len(graph_sizes)
    order = np.argsort(-np.asarray(graph_sizes), kind="stable")
    starts = np.zeros(n_graphs, dtype=np.int64)
    bins = []  # (capacity_left, next_offset)
    n_tiles = 0
    for g in order:
        size = int(graph_sizes[g])
        if size >= tile:
            full_tiles = size // tile
            rem = size % tile
            starts[g] = n_tiles * tile
            n_tiles += full_tiles + (1 if rem else 0)
            continue
        placed = False
        for b in bins:
            if b[0] >= size:
                starts[g] = b[1]
                b[1] += size
                b[0] -= size
                placed = True
                break
        if not placed:
            starts[g] = n_tiles * tile
            bins.append([tile - size, n_tiles * tile + size])
            n_tiles += 1
    return starts, n_tiles * tile


def packed_node_positions(graph_of_node: np.ndarray, tile: int = 128) -> Tuple[np.ndarray, int]:
    """New node positions under tile packing: node i of graph g lands at
    ``start[g] + rank_of_i_within_g`` (original relative order preserved)."""
    graph_of_node = np.asarray(graph_of_node, dtype=np.int64)
    n_graphs = int(graph_of_node.max()) + 1 if len(graph_of_node) else 0
    sizes = np.bincount(graph_of_node, minlength=n_graphs)
    starts, n_padded = pack_tiles(sizes, tile)
    # rank within graph (original relative order).  Merge keeps each graph's
    # nodes contiguous and sorted by graph id, so rank = position - first
    # occurrence; fall back to a stable grouped cumcount otherwise.
    if np.all(np.diff(graph_of_node) >= 0):
        first = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        ranks = np.arange(len(graph_of_node)) - first[graph_of_node]
    else:
        order = np.argsort(graph_of_node, kind="stable")
        grouped_ranks = np.arange(len(order)) - np.concatenate([[0], np.cumsum(sizes)[:-1]])[
            graph_of_node[order]
        ]
        ranks = np.empty(len(order), dtype=np.int64)
        ranks[order] = grouped_ranks
    return starts[graph_of_node] + ranks, n_padded


def pack_slots(graph_sizes: np.ndarray, slot: int = 32, tile: int = 128) -> Tuple[np.ndarray, int]:
    """Two-level first-fit-decreasing packing for the compact-strip kernel
    (ops/strip.py): graphs ≤ ``slot`` nodes share slot bins (their edges are
    all within-slot → captured by the strip), graphs of 2..tile/slot slots
    take a contiguous slot run within ONE tile (their cross-slot edges go to
    the strip operator's BCSR residual), and graphs > ``tile`` nodes take
    exclusive aligned tile runs (as ``pack_tiles``) so the compact tile-wise
    readout still applies.

    Returns (start_offset_per_graph, total_padded_nodes).  ``slot == tile``
    degenerates to ``pack_tiles`` (pure diagonal-block layout)."""
    if tile % slot:
        raise ValueError(f"tile {tile} must be a multiple of slot {slot}")
    sizes = np.asarray(graph_sizes, dtype=np.int64)
    order = np.argsort(-sizes, kind="stable")
    starts = np.zeros(len(sizes), dtype=np.int64)
    slots_per_tile = tile // slot
    tiles: list = []  # [free_slot_count, next_free_slot, tile_index]
    slot_bins: list = []  # [capacity_left, next_offset]
    n_tiles = 0
    for g in order:
        size = int(sizes[g])
        if size > tile:
            starts[g] = n_tiles * tile
            n_tiles += -(-size // tile)
            continue
        k = -(-max(size, 1) // slot)
        if k > 1:
            for t in tiles:
                if t[0] >= k:
                    starts[g] = t[2] * tile + t[1] * slot
                    t[1] += k
                    t[0] -= k
                    break
            else:
                starts[g] = n_tiles * tile
                tiles.append([slots_per_tile - k, k, n_tiles])
                n_tiles += 1
            continue
        for b in slot_bins:
            if b[0] >= size:
                starts[g] = b[1]
                b[1] += size
                b[0] -= size
                break
        else:  # open a fresh slot in the first tile with one free
            for t in tiles:
                if t[0] >= 1:
                    host = t
                    break
            else:
                host = [slots_per_tile, 0, n_tiles]
                tiles.append(host)
                n_tiles += 1
            off = host[2] * tile + host[1] * slot
            host[1] += 1
            host[0] -= 1
            starts[g] = off
            slot_bins.append([slot - size, off + size])
    return starts, n_tiles * tile


def order_tiles_by_format(
    starts: np.ndarray, graph_sizes: np.ndarray, slot: int, tile: int = 128, align: int = 1
) -> Tuple[np.ndarray, int, int]:
    """Permute tiles so slot-pure tiles (every resident graph ≤ ``slot``)
    precede tiles holding any larger graph — the mixed-format strip operator
    (ops/strip.py) stores the former as compact strips and the latter as full
    diagonal blocks, with no BCSR residual for within-tile edges.

    The strip region is padded with empty tiles to a multiple of ``align``
    (the kernel's K_TILES grid blocking) so both regions stay grid-aligned.
    Spanning (> tile) runs remain contiguous (stable partition).  Returns
    (new_starts, n_strip_tiles, total_padded_nodes)."""
    starts = np.asarray(starts, dtype=np.int64)
    sizes = np.asarray(graph_sizes, dtype=np.int64)
    if len(starts) == 0:
        return starts, 0, 0
    tile0 = starts // tile
    end_tile = (starts + np.maximum(sizes, 1) - 1) // tile
    n_tiles = int(end_tile.max()) + 1
    is_block = np.zeros(n_tiles, bool)
    for g in np.flatnonzero(sizes > slot):
        is_block[tile0[g] : end_tile[g] + 1] = True
    ns_raw = int((~is_block).sum())
    ns = -(-ns_raw // align) * align
    order = np.argsort(is_block, kind="stable")
    new_of_old = np.empty(n_tiles, np.int64)
    new_of_old[order[:ns_raw]] = np.arange(ns_raw)
    new_of_old[order[ns_raw:]] = ns + np.arange(n_tiles - ns_raw)
    new_starts = new_of_old[tile0] * tile + starts % tile
    n_total_tiles = ns + (n_tiles - ns_raw)
    return new_starts, ns, n_total_tiles * tile


def positions_from_starts(graph_of_node: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Node positions for a given per-graph start layout: node i of graph g
    lands at ``starts[g] + rank_of_i_within_g`` (original relative order)."""
    graph_of_node = np.asarray(graph_of_node, dtype=np.int64)
    n_graphs = int(graph_of_node.max()) + 1 if len(graph_of_node) else 0
    sizes = np.bincount(graph_of_node, minlength=n_graphs)
    if np.all(np.diff(graph_of_node) >= 0):
        first = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        ranks = np.arange(len(graph_of_node)) - first[graph_of_node]
    else:
        order = np.argsort(graph_of_node, kind="stable")
        grouped_ranks = np.arange(len(order)) - np.concatenate([[0], np.cumsum(sizes)[:-1]])[
            graph_of_node[order]
        ]
        ranks = np.empty(len(order), dtype=np.int64)
        ranks[order] = grouped_ranks
    return starts[graph_of_node] + ranks


def graph_slots_from_starts(starts: np.ndarray, graph_sizes: np.ndarray, tile: int = 128):
    """Per-graph readout-slot assignment for ANY packing in which each graph
    lies within one tile or (if larger than a tile) owns an exclusive aligned
    tile run — both ``pack_tiles`` and ``pack_slots`` layouts qualify.

    Returns ``(tile0, rank, n_tiles, g_max, spanning)`` with the same meaning
    as ``packed_graph_slots``."""
    starts = np.asarray(starts, dtype=np.int64)
    sizes = np.asarray(graph_sizes, dtype=np.int64)
    tile0 = starts // tile
    spanning = sizes > tile
    n_tiles = int(np.max((starts + np.maximum(sizes, 1) - 1) // tile)) + 1 if len(starts) else 0
    order = np.argsort(starts, kind="stable")
    rank = np.zeros(len(starts), np.int64)
    last_tile, next_rank = -1, 0
    for g in order:
        t = int(tile0[g])
        if t != last_tile:
            last_tile, next_rank = t, 0
        rank[g] = next_rank
        next_rank += 1
    g_max = int(rank.max()) + 1 if len(rank) else 1
    return tile0, rank, n_tiles, g_max, spanning


def packed_graph_slots(graph_sizes: np.ndarray, tile: int = 128):
    """Per-graph readout-slot assignment under ``pack_tiles``.

    Returns ``(tile0, rank, n_tiles, g_max, spanning)``: each graph's first
    tile, its rank among the graphs packed into that tile (spanning graphs
    own their run exclusively → rank 0), the tile count, the maximum
    graphs-per-tile, and the spanning mask (> one tile)."""
    sizes = np.asarray(graph_sizes, dtype=np.int64)
    starts, n_padded = pack_tiles(sizes, tile)
    tile0 = starts // tile
    spanning = sizes > tile
    n_tiles = n_padded // tile

    order = np.argsort(starts, kind="stable")
    rank = np.zeros(len(starts), np.int64)
    last_tile, next_rank = -1, 0
    for g in order:
        t = int(tile0[g])
        if t != last_tile:
            last_tile, next_rank = t, 0
        rank[g] = next_rank
        next_rank += 1
    g_max = int(rank.max()) + 1 if len(rank) else 1
    return tile0, rank, n_tiles, g_max, spanning
