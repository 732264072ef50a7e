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

    from gnnkeras_tpu import native

    live = weight != 0.0
    src_l, dst_l, w_l = src[live], dst[live], weight[live]
    bi, bj = src_l // tile, dst_l // tile
    block_key = bi * n_dst_tiles + bj
    uniq, inverse = native.unique_i64(block_key, return_inverse=True)
    n_blocks = len(uniq)
    if n_blocks > max_band_factor * max(n_src_tiles, n_dst_tiles):
        return None

    order = np.argsort(uniq % n_dst_tiles, kind="stable")  # sort blocks by dst tile
    rank = np.empty_like(order)
    rank[order] = np.arange(n_blocks)

    blocks = np.zeros((max(n_blocks, 1), tile, tile), dtype=floatx())
    # scatter_add_3d takes the C++ path for f32 blocks and is np.add.at
    # itself otherwise (floatx='float64' configurations)
    native.scatter_add_3d(blocks, rank[inverse], src_l % tile, dst_l % tile, w_l)

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


# -- quantized blocks: int8 mask + per-column scale / bf16 direct ------------
#
# The banded large-graph workload is OPERATOR-byte-bound: its ~12k f32
# 128x128 blocks read ~733 MB per aggregation — ~87% of the whole unfold's
# time at the HBM roofline (BASELINE.md round 4).  Casting the blocks to
# bf16 through the XLA einsum does NOT recover the bytes (XLA materializes
# the f32 upcast: measured 5%).  The Pallas path below reads the blocks at
# int8 (the reference's aggregation modes give every destination node ONE
# weight — graph_class.py:105-121 — so each block column is constant and the
# operator factors exactly into a 0/1 int8 mask times a per-column f32
# scale, as ops/strip.py does for slot-packed batches) or bf16, upcasts in
# VMEM, and runs the same per-block MXU matmul — quartering/halving the
# dominant HBM traffic.

_QB_KB = 16  # blocks per grid step (amortizes per-step overhead, K_TILES-style)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["mask", "scale", "src_tile", "dst_tile",
                 "mask_t", "scale_t", "src_tile_t", "dst_tile_t"],
    meta_fields=["n_src_tiles", "n_dst_tiles", "tile"],
)
@dataclasses.dataclass(frozen=True)
class QuantBcsr:
    """Quantized block operator + its precomputed transpose (for the VJP).

    ``mask`` is int8 0/1 with ``scale`` the per-(block, dst-column) f32
    factor, or direct bf16 weights with ``scale=None``.  The transposed
    fields hold the same operator as ``transpose_bcsr`` would produce,
    quantized, sorted by the ORIGINAL src tile; its scale sits on the
    CONTRACTION axis (applied to the input columns, ops/strip.py's
    ``scale_in`` convention)."""

    mask: jax.Array  # (B, T, T) int8 or bf16
    scale: Optional[jax.Array]  # (B, T) f32 or None
    src_tile: jax.Array  # (B,) i32
    dst_tile: jax.Array
    mask_t: jax.Array  # (B, T, T)
    scale_t: Optional[jax.Array]  # (B, T) — forward scale rows, reordered
    src_tile_t: jax.Array
    dst_tile_t: jax.Array
    n_src_tiles: int
    n_dst_tiles: int
    tile: int


def quantize_bcsr(m: Optional[BcsrMatrix], dtype="int8") -> Optional["QuantBcsr"]:
    """Host-side quantization of a built operator.  ``int8`` requires the
    column-constant factorization (sum/normalized/average over deduplicated
    arcs) and falls back to bf16 direct storage when it does not hold.
    Blocks are pre-padded to a ``_QB_KB`` multiple (zero mask blocks are the
    identity of aggregation) so the runtime path is a pure pallas_call."""
    if m is None:
        return None
    blocks = np.asarray(m.blocks, np.float64)
    src_tile = np.asarray(m.src_tile)
    dst_tile = np.asarray(m.dst_tile)
    t = m.tile

    scale = None
    if np.dtype(dtype) == np.int8:
        from gnnkeras_tpu.ops.strip import _factor_mask_scale

        fac = _factor_mask_scale(blocks)
        if fac is not None:
            mask, scale = fac
        else:
            import warnings

            warnings.warn(
                "int8 mask+scale BCSR storage does not apply: the operator "
                "weights are not column-factorable (parallel arcs, or "
                "per-arc weights); storing the blocks as bfloat16 instead",
                RuntimeWarning,
                stacklevel=2,
            )
    if scale is None:  # bf16 direct storage (requested, or not factorable)
        mask = blocks
    # transposed operator, sorted by original src tile (its dst)
    order = np.argsort(src_tile, kind="stable")
    mask_t = np.transpose(mask, (0, 2, 1))[order]
    scale_t = None if scale is None else scale[order]

    def _pad(blocks_a, scale_a, src_a, dst_a, last_dst):
        """Pad the block list to a _QB_KB multiple: all-zero mask blocks
        contribute nothing; padded dst ids take the LAST tile (preserving the
        sorted-by-dst layout the segment-sum relies on), src ids take 0."""
        b = blocks_a.shape[0]
        b_pad = -(-max(b, 1) // _QB_KB) * _QB_KB
        if b == b_pad:
            return blocks_a, scale_a, src_a, dst_a
        e = b_pad - b
        blocks_a = np.concatenate([blocks_a, np.zeros((e,) + blocks_a.shape[1:], blocks_a.dtype)])
        if scale_a is not None:
            scale_a = np.concatenate([scale_a, np.zeros((e, scale_a.shape[1]), scale_a.dtype)])
        src_a = np.concatenate([src_a, np.zeros(e, src_a.dtype)])
        dst_a = np.concatenate([dst_a, np.full(e, last_dst, dst_a.dtype)])
        return blocks_a, scale_a, src_a, dst_a

    mask, scale, src_tile_p, dst_tile_p = _pad(
        mask, scale, src_tile, dst_tile, m.n_dst_tiles - 1
    )
    mask_t, scale_t, src_t_p, dst_t_p = _pad(
        mask_t, scale_t, dst_tile[order], src_tile[order], m.n_src_tiles - 1
    )

    store = jnp.int8 if scale is not None else jnp.bfloat16
    return QuantBcsr(
        mask=jnp.asarray(np.asarray(mask).astype(np.int8 if scale is not None else np.float32)).astype(store),
        scale=None if scale is None else jnp.asarray(scale.astype(np.float32)),
        src_tile=jnp.asarray(src_tile_p.astype(np.int32)),
        dst_tile=jnp.asarray(dst_tile_p.astype(np.int32)),
        mask_t=jnp.asarray(np.asarray(mask_t).astype(np.int8 if scale_t is not None else np.float32)).astype(store),
        scale_t=None if scale_t is None else jnp.asarray(scale_t.astype(np.float32)),
        src_tile_t=jnp.asarray(src_t_p.astype(np.int32)),
        dst_tile_t=jnp.asarray(dst_t_p.astype(np.int32)),
        n_src_tiles=m.n_src_tiles,
        n_dst_tiles=m.n_dst_tiles,
        tile=t,
    )


def _qblock_kernel(kb: int, scaled: bool, scale_in: bool):
    def kernel(*refs):
        if scaled:
            blocks_ref, scale_ref, g_ref, out_ref = refs
        else:
            blocks_ref, g_ref, out_ref = refs
        for k in range(kb):
            a = blocks_ref[k]
            if a.dtype != jnp.float32:
                a = a.astype(jnp.float32)  # upcast in VMEM — HBM moved int8/bf16
            x = g_ref[:, k, :]
            if scaled and scale_in:
                x = x * scale_ref[k : k + 1, :].astype(x.dtype)
            out = jnp.dot(x, a, preferred_element_type=jnp.float32)
            if scaled and not scale_in:
                out = out * scale_ref[k : k + 1, :]
            out_ref[:, k, :] = out.astype(out_ref.dtype)

    return kernel


def _qbcsr_impl(state_t, mask, scale, src_tile, dst_tile, n_src, n_dst, tile, scale_in):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = state_t.shape[0]
    d_pad = -(-d // 8) * 8
    if d_pad != d:
        state_t = jnp.pad(state_t, ((0, d_pad - d), (0, 0)))
    B = mask.shape[0]
    kb = min(_QB_KB, B)
    tiles = state_t.reshape(d_pad, n_src, tile)
    gathered = tiles[:, src_tile]  # (d_pad, B, T) — tile-granular gather
    in_specs = [pl.BlockSpec((kb, tile, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    operands = [mask]
    if scale is not None:
        in_specs.append(pl.BlockSpec((kb, tile), lambda i: (i, 0), memory_space=pltpu.VMEM))
        operands.append(scale)
    in_specs.append(pl.BlockSpec((d_pad, kb, tile), lambda i: (0, i, 0), memory_space=pltpu.VMEM))
    operands.append(gathered.astype(jnp.float32))
    prod = pl.pallas_call(
        _qblock_kernel(kb, scale is not None, scale_in),
        out_shape=jax.ShapeDtypeStruct((d_pad, B, tile), jnp.float32),
        grid=(B // kb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((d_pad, kb, tile), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(*operands)
    agg = segment_sum(prod.transpose(1, 0, 2), dst_tile, n_dst)  # (n_dst, d_pad, T)
    out = agg.transpose(1, 0, 2).reshape(d_pad, n_dst * tile)
    return out[:d].astype(state_t.dtype)


@jax.custom_vjp
def qbcsr_aggregate_t(state_t: jax.Array, qm: QuantBcsr) -> jax.Array:
    """``Mᵀ·state`` on feature-major state through the quantized blocks.
    The backward runs the SAME kernel on the precomputed transposed operator
    (scale on the contraction axis), so the operator is read at storage
    width in both passes — the point of the representation."""
    return _qbcsr_impl(
        state_t, qm.mask, qm.scale, qm.src_tile, qm.dst_tile,
        qm.n_src_tiles, qm.n_dst_tiles, qm.tile, scale_in=False,
    )


def _qbcsr_fwd(state_t, qm):
    return qbcsr_aggregate_t(state_t, qm), (qm,)


def _qbcsr_bwd(res, ct):
    (qm,) = res
    ct_state = _qbcsr_impl(
        ct, qm.mask_t, qm.scale_t, qm.src_tile_t, qm.dst_tile_t,
        qm.n_dst_tiles, qm.n_src_tiles, qm.tile, scale_in=True,
    )
    return ct_state, None


qbcsr_aggregate_t.defvjp(_qbcsr_fwd, _qbcsr_bwd)


def qbcsr_aggregate(state: jax.Array, qm: QuantBcsr) -> jax.Array:
    """Row-major interface over the quantized operator (transpose sandwich —
    the transposed engine is the intended consumer; this keeps the row-major
    fallback correct)."""
    return qbcsr_aggregate_t(state.T, qm).T


def pad_qbcsr(qm: Optional["QuantBcsr"], n_blocks: int) -> Optional["QuantBcsr"]:
    """``pad_bcsr`` for quantized operators: zero mask blocks at the last
    destination tile (sorted-by-dst preserved; padding must land on a
    _QB_KB multiple — the kernel grid requires it)."""
    if qm is None:
        return None
    n_blocks = -(-max(int(n_blocks), 1) // _QB_KB) * _QB_KB
    B = int(qm.mask.shape[0])
    if B >= n_blocks:
        return qm
    e = n_blocks - B
    zpad = lambda a: jnp.concatenate([a, jnp.zeros((e,) + a.shape[1:], a.dtype)])
    return dataclasses.replace(
        qm,
        mask=zpad(qm.mask),
        scale=None if qm.scale is None else zpad(qm.scale),
        src_tile=jnp.concatenate([qm.src_tile, jnp.zeros(e, qm.src_tile.dtype)]),
        dst_tile=jnp.concatenate([qm.dst_tile, jnp.full(e, qm.n_dst_tiles - 1, qm.dst_tile.dtype)]),
        mask_t=zpad(qm.mask_t),
        scale_t=None if qm.scale_t is None else zpad(qm.scale_t),
        src_tile_t=jnp.concatenate([qm.src_tile_t, jnp.zeros(e, qm.src_tile_t.dtype)]),
        dst_tile_t=jnp.concatenate([qm.dst_tile_t, jnp.full(e, qm.n_src_tiles - 1, qm.dst_tile_t.dtype)]),
    )
