"""Block-sparse (BCSR) neighbor aggregation — the MXU path for the hot SpMM.

TPU scatter-adds serialize: the edge-list segment-sum runs ~100x off the HBM
roofline (measured 4.6 ms / 267k-edge iteration on v5e).  Because merged
batches are block-diagonal (disjoint-union merge keeps each graph's nodes
contiguous, GraphObject.merge), the aggregation matrix tiles into a thin band
of dense TxT blocks.  Aggregation then becomes a batched dense einsum on the
MXU plus one tiny per-block segment-sum (measured ~0.6 ms for the same
workload — ~7x):

    state.reshape(n_tiles, T, d)
    gathered = state_tiles[src_tile]            # tile-granular gather (fast)
    prod     = einsum('bij,bid->bjd', blocks, gathered)
    agg      = segment_sum(prod, dst_tile, n_tiles)   # B segments, not A

``blocks[b][i, j] = w(edge src_tile[b]*T+i -> dst_tile[b]*T+j)``, so the
einsum computes exactly ``Adjacencyᵀ·state`` restricted to the block
(reference semantics: GNN/Models/GNN.py:228).  Multi-edges accumulate into
the same block cell, matching coo/tf.sparse duplicate summation.

The representation is only built when the block structure is thin (near the
diagonal); for block-dense graphs the edge-list path stays in force.  The
Pallas kernel tier (gnnkeras_tpu.ops.strip) consumes this same structure.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnnkeras_tpu.ops.segment import segment_sum
from gnnkeras_tpu.utils.dtypes import floatx

TILE = 128

# enable BCSR only when nonzero blocks stay within this multiple of the
# diagonal (band-ness); beyond it the dense blocks outweigh the scatter.
_MAX_BAND_FACTOR = 8


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "src_tile", "dst_tile"],
    meta_fields=["n_src_tiles", "n_dst_tiles", "tile"],
)
@dataclasses.dataclass(frozen=True)
class BcsrMatrix:
    """Static block-sparse operator: dense TxT blocks plus (src,dst) tile ids,
    sorted by dst tile for a sorted segment-sum.  Rectangular in general —
    rows index the source axis (nodes or arcs), columns the destination axis
    (nodes or graphs)."""

    blocks: jax.Array  # (B, T, T)
    src_tile: jax.Array  # (B,) int32
    dst_tile: jax.Array  # (B,) int32
    n_src_tiles: int
    n_dst_tiles: int
    tile: int


def build_bcsr(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    n_src_padded: int,
    n_dst_padded: Optional[int] = None,
    tile: int = TILE,
    max_band_factor: int = _MAX_BAND_FACTOR,
) -> Optional[BcsrMatrix]:
    """Host-side construction.  Returns None when the block structure is too
    dense to pay off (falls back to the edge-list scatter path)."""
    if n_dst_padded is None:
        n_dst_padded = n_src_padded
    if n_src_padded % tile != 0 or n_dst_padded % tile != 0:
        raise ValueError(f"padded sizes ({n_src_padded},{n_dst_padded}) must be multiples of tile {tile}")
    n_src_tiles = n_src_padded // tile
    n_dst_tiles = n_dst_padded // tile
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float64)

    live = weight != 0.0
    src_l, dst_l, w_l = src[live], dst[live], weight[live]
    bi, bj = src_l // tile, dst_l // tile
    block_key = bi * n_dst_tiles + bj
    uniq, inverse = np.unique(block_key, return_inverse=True)
    n_blocks = len(uniq)
    if n_blocks > max_band_factor * max(n_src_tiles, n_dst_tiles):
        return None

    order = np.argsort(uniq % n_dst_tiles, kind="stable")  # sort blocks by dst tile
    rank = np.empty_like(order)
    rank[order] = np.arange(n_blocks)

    blocks = np.zeros((max(n_blocks, 1), tile, tile), dtype=floatx())
    np.add.at(blocks, (rank[inverse], src_l % tile, dst_l % tile), w_l)

    uniq_sorted = uniq[order]
    src_tile = (uniq_sorted // n_dst_tiles).astype(np.int32)
    dst_tile = (uniq_sorted % n_dst_tiles).astype(np.int32)
    if n_blocks == 0:
        src_tile = np.zeros(1, np.int32)
        dst_tile = np.zeros(1, np.int32)

    return BcsrMatrix(
        blocks=jnp.asarray(blocks),
        src_tile=jnp.asarray(src_tile),
        dst_tile=jnp.asarray(dst_tile),
        n_src_tiles=n_src_tiles,
        n_dst_tiles=n_dst_tiles,
        tile=tile,
    )


def _aggregate_impl(state: jax.Array, m: BcsrMatrix) -> jax.Array:
    d = state.shape[1]
    out_dtype = state.dtype
    operand = state.astype(m.blocks.dtype) if m.blocks.dtype != state.dtype else state
    tiles = operand.reshape(m.n_src_tiles, m.tile, d)
    gathered = tiles[m.src_tile]  # (B, T, d)
    prod = jnp.einsum("bij,bid->bjd", m.blocks, gathered, preferred_element_type=jnp.float32)
    agg = segment_sum(prod, m.dst_tile, m.n_dst_tiles)
    return agg.reshape(m.n_dst_tiles * m.tile, d).astype(out_dtype)


def bcsr_aggregate_t(state_t: jax.Array, m: BcsrMatrix) -> jax.Array:
    """``Mᵀ·state`` on feature-major state: (d, n_src_tiles·T) →
    (d, n_dst_tiles·T).  Same block einsum as ``bcsr_aggregate`` with the
    feature axis leading, for the transposed unfold engine — the state never
    changes layout at the operator boundary."""
    d = state_t.shape[0]
    out_dtype = state_t.dtype
    operand = state_t.astype(m.blocks.dtype) if m.blocks.dtype != state_t.dtype else state_t
    tiles = operand.reshape(d, m.n_src_tiles, m.tile)
    gathered = tiles[:, m.src_tile]  # (d, B, T)
    prod = jnp.einsum("dbi,bij->bdj", gathered, m.blocks, preferred_element_type=jnp.float32)
    agg = segment_sum(prod, m.dst_tile, m.n_dst_tiles)  # (n_dst, d, T)
    return agg.transpose(1, 0, 2).reshape(d, m.n_dst_tiles * m.tile).astype(out_dtype)


def bcsr_aggregate(state: jax.Array, m: BcsrMatrix) -> jax.Array:
    """``Mᵀ·state`` through dense blocks.  state: (n_src_tiles*T, d) →
    (n_dst_tiles*T, d).

    With bf16 blocks (the production setting — measured 6x faster than f32 on
    v5e: 0.84 vs 5.5 ms/iter on merged Mutagenicity) the state is cast to
    bf16 for the MXU pass and accumulated in f32."""
    return _aggregate_impl(state, m)


@jax.custom_vjp
def bcsr_aggregate_cvjp(state: jax.Array, m: BcsrMatrix) -> jax.Array:
    """``bcsr_aggregate`` with an explicit transpose-operator backward.

    Autodiff of the forward turns the tile gather into a tile scatter-add in
    reverse; here the state cotangent is instead ``M·ct`` evaluated as one
    more forward pass through ``transpose_bcsr(m)`` — the same
    gather → einsum → sorted-segment-sum formulation as the forward.  The
    operator itself is treated as a constant (cotangent None), matching the
    reference where Adjacency/ArcNode are data, not parameters
    (GNN/Models/GNN.py:228)."""
    return _aggregate_impl(state, m)


def _bcsr_cvjp_fwd(state, m):
    return _aggregate_impl(state, m), (m,)


def _bcsr_cvjp_bwd(res, ct):
    (m,) = res
    return _aggregate_impl(ct, transpose_bcsr(m)), None


bcsr_aggregate_cvjp.defvjp(_bcsr_cvjp_fwd, _bcsr_cvjp_bwd)


def cast_bcsr(m: Optional[BcsrMatrix], dtype) -> Optional[BcsrMatrix]:
    if m is None:
        return None
    return dataclasses.replace(m, blocks=m.blocks.astype(dtype))


def transpose_bcsr(m: BcsrMatrix) -> BcsrMatrix:
    """Swap src/dst tiles and transpose each block: the operator for
    ``Adjacency·x`` (outgoing aggregation), used by custom VJPs."""
    order = jnp.argsort(m.src_tile, stable=True)
    return BcsrMatrix(
        blocks=jnp.transpose(m.blocks, (0, 2, 1))[order],
        src_tile=m.dst_tile[order],
        dst_tile=m.src_tile[order],
        n_src_tiles=m.n_dst_tiles,
        n_dst_tiles=m.n_src_tiles,
        tile=m.tile,
    )


def pad_bcsr(m: Optional[BcsrMatrix], n_blocks: int) -> Optional[BcsrMatrix]:
    """Zero-pad the block list to a uniform static count.

    Exact: all-zero blocks contribute nothing to the einsum + segment-sum.
    The block count is data-dependent STATIC shape, so batches of one
    sequencer must share it or stacking (data parallelism) and compile-once
    break; padding targets the last destination tile to preserve the
    sorted-by-dst layout."""
    if m is None:
        return None
    B = int(m.blocks.shape[0])
    if B >= n_blocks:
        return m
    extra = n_blocks - B
    return dataclasses.replace(
        m,
        blocks=jnp.concatenate(
            [m.blocks, jnp.zeros((extra,) + m.blocks.shape[1:], m.blocks.dtype)]
        ),
        src_tile=jnp.concatenate([m.src_tile, jnp.zeros(extra, m.src_tile.dtype)]),
        dst_tile=jnp.concatenate(
            [m.dst_tile, jnp.full(extra, m.n_dst_tiles - 1, m.dst_tile.dtype)]
        ),
    )


def empty_bcsr(
    n_src_tiles: int, n_dst_tiles: int, n_blocks: int, tile: int = TILE, dtype=None
) -> BcsrMatrix:
    """An all-zero operator with a uniform static block count — the identity
    element of block aggregation.  Used to give every batch of a sequencer the
    SAME pytree structure when only some merges produce cross-tile residual
    edges (a strip residual that is absent on one batch and present on another
    would otherwise flip the batch treedef and retrace the compiled step)."""
    if dtype is None:
        from gnnkeras_tpu.utils.dtypes import floatx

        dtype = floatx()
    n_blocks = max(int(n_blocks), 1)
    return BcsrMatrix(
        blocks=jnp.zeros((n_blocks, tile, tile), dtype),
        src_tile=jnp.zeros(n_blocks, jnp.int32),
        dst_tile=jnp.full(n_blocks, max(n_dst_tiles - 1, 0), jnp.int32),
        n_src_tiles=int(n_src_tiles),
        n_dst_tiles=int(n_dst_tiles),
        tile=tile,
    )
