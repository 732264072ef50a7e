"""Pallas TPU kernel for the BCSR neighbor aggregation.

Fuses what the XLA path (gnnkeras_tpu.ops.bcsr.bcsr_aggregate) does in three
ops — tile gather, batched block einsum, per-block segment-sum — into one
kernel: blocks stream through VMEM in dst-tile order with their source state
tiles scalar-prefetch-indexed, partial products accumulate in a VMEM scratch
across consecutive blocks of the same destination tile, and each output tile
is written exactly once.  No (B, T, d) intermediate ever touches HBM.

Layout contract (produced by ``prepare_pallas_bcsr``):
- blocks sorted by destination tile (build_bcsr already does this),
- every destination tile has ≥1 block (zero-blocks are appended for empty
  tiles so every output tile gets initialized),
- the feature dimension is padded to the 128-lane width.

The kernel is wrapped in a ``jax.custom_vjp``: the backward pass w.r.t. the
state is the same kernel run with the transposed operator (d/state = A·ḡ),
so training uses MXU block matmuls in both directions.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnkeras_tpu.ops.bcsr import BcsrMatrix

LANES = 128


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "src_tile", "dst_tile", "blocks_t", "src_tile_t", "dst_tile_t"],
    meta_fields=["n_src_tiles", "n_dst_tiles", "tile"],
)
@dataclasses.dataclass(frozen=True)
class PallasBcsr:
    """BCSR operator plus its transpose, both in kernel layout."""

    blocks: jax.Array  # (B, T, T) forward, dst-sorted, all dst tiles covered
    src_tile: jax.Array  # (B,) int32
    dst_tile: jax.Array  # (B,) int32
    blocks_t: jax.Array  # (Bt, T, T) transposed operator, dst-sorted
    src_tile_t: jax.Array
    dst_tile_t: jax.Array
    n_src_tiles: int
    n_dst_tiles: int
    tile: int


def _cover_all_dst(blocks, src_t, dst_t, n_dst_tiles, tile, dtype):
    """Append zero blocks for destination tiles with no incoming block and
    re-sort by dst tile, so the kernel initializes every output tile."""
    present = np.zeros(n_dst_tiles, dtype=bool)
    present[dst_t] = True
    missing = np.flatnonzero(~present).astype(np.int32)
    if len(missing):
        blocks = np.concatenate([blocks, np.zeros((len(missing), tile, tile), dtype=blocks.dtype)])
        src_t = np.concatenate([src_t, missing])  # self-tile, value 0
        dst_t = np.concatenate([dst_t, missing])
    order = np.argsort(dst_t, kind="stable")
    return blocks[order], src_t[order].astype(np.int32), dst_t[order].astype(np.int32)


def prepare_pallas_bcsr(m: BcsrMatrix) -> PallasBcsr:
    """Host-side: forward + transposed operator in kernel layout."""
    blocks = np.asarray(m.blocks)
    src_t = np.asarray(m.src_tile)
    dst_t = np.asarray(m.dst_tile)
    fb, fs, fd = _cover_all_dst(blocks, src_t, dst_t, m.n_dst_tiles, m.tile, blocks.dtype)

    tb = np.transpose(blocks, (0, 2, 1))
    tsrc, tdst = dst_t.copy(), src_t.copy()
    tb, ts, td = _cover_all_dst(tb, tsrc, tdst, m.n_src_tiles, m.tile, blocks.dtype)

    return PallasBcsr(
        blocks=jnp.asarray(fb),
        src_tile=jnp.asarray(fs),
        dst_tile=jnp.asarray(fd),
        blocks_t=jnp.asarray(tb),
        src_tile_t=jnp.asarray(ts),
        dst_tile_t=jnp.asarray(td),
        n_src_tiles=m.n_src_tiles,
        n_dst_tiles=m.n_dst_tiles,
        tile=m.tile,
    )


def _spmm_kernel(src_t_ref, dst_t_ref, block_ref, state_ref, out_ref, acc_ref):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    dst_here = dst_t_ref[i]
    prev = jnp.where(i > 0, dst_t_ref[jnp.maximum(i - 1, 0)], -1)
    nxt = jnp.where(i + 1 < n, dst_t_ref[jnp.minimum(i + 1, n - 1)], -1)

    @pl.when(dst_here != prev)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # out[j, d] += Σ_i block[i, j] · state[i, d]  (the Adjacencyᵀ·state block)
    acc_ref[...] += jax.lax.dot_general(
        block_ref[0],
        state_ref[0].astype(block_ref.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(dst_here != nxt)
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _run_kernel(state_padded, blocks, src_tile, dst_tile, n_src_tiles, n_dst_tiles, tile):
    b = blocks.shape[0]
    d_pad = state_padded.shape[-1]
    state_tiles = state_padded.reshape(n_src_tiles, tile, d_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tile, tile), lambda i, src_t, dst_t: (i, 0, 0)),
            pl.BlockSpec((1, tile, d_pad), lambda i, src_t, dst_t: (src_t[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, d_pad), lambda i, src_t, dst_t: (dst_t[i], 0, 0)),
        scratch_shapes=[pltpu.VMEM((tile, d_pad), jnp.float32)],
    )
    out = pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
        out_shape=jax.ShapeDtypeStruct((n_dst_tiles, tile, d_pad), state_padded.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * tile * tile * d_pad,
            bytes_accessed=b * tile * (tile * blocks.dtype.itemsize + 2 * d_pad * 4),
            transcendentals=0,
        ),
    )(src_tile, dst_tile, blocks, state_tiles)
    return out.reshape(n_dst_tiles * tile, d_pad)


def _pad_features(x: jax.Array) -> Tuple[jax.Array, int]:
    d = x.shape[-1]
    d_pad = ((d + LANES - 1) // LANES) * LANES
    if d_pad != d:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))
    return x, d


@jax.custom_vjp
def pallas_bcsr_aggregate(state: jax.Array, m: PallasBcsr) -> jax.Array:
    """``Adjacencyᵀ·state`` via the fused Pallas kernel."""
    padded, d = _pad_features(state)
    out = _run_kernel(padded, m.blocks, m.src_tile, m.dst_tile, m.n_src_tiles, m.n_dst_tiles, m.tile)
    return out[:, :d]


def _fwd(state, m):
    return pallas_bcsr_aggregate(state, m), m


def _bwd(m, g):
    # d/dstate of Aᵀ·state is A·ḡ — the same kernel with the transposed
    # operator.  The operator itself is graph data, never differentiated;
    # its zero cotangent is DCE'd.
    padded, d = _pad_features(g)
    dstate = _run_kernel(
        padded, m.blocks_t, m.src_tile_t, m.dst_tile_t, m.n_dst_tiles, m.n_src_tiles, m.tile
    )
    dm = jax.tree_util.tree_map(jnp.zeros_like, m)
    return dstate[:, :d], dm


pallas_bcsr_aggregate.defvjp(_fwd, _bwd)
