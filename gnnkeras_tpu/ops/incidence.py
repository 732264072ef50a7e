"""Arc-row gathers as one-hot Pallas kernels, forward and backward.

The arc-focused readout reads ``state[arc_src]`` / ``state[arc_dst]``
(reference GNN.py:317-330).  The forward gathers are cheap on TPU, but
their autodiff transpose is a scatter-add of the (A, d) cotangent rows
into (N, d) node rows — measured 7.7 ms of the 10.5 ms arc-focused train
step on merged Mutagenicity (~85% of the whole step; the TPU scatter
serializes per index).

Round-5 history: the first scatter-free backward compressed the
TRANSPOSED incidence maps (arc row → endpoint node; batch-constant 0/1,
exactly one nonzero per arc row) into rectangular dense-block BCSR and
ran the cotangent reduction as MXU block einsums (10.49 → 4.06 ms).  But
a 128×128 dense block holding ≤128 ones is ~99% zeros: at merged-
Mutagenicity arc scale the two operators read 408 MB (f32) of blocks per
backward — the dominant term of the remaining step.  This module stores
the SPARSITY instead of the blocks: per (arc-tile, node-tile) pair, the
128 local endpoint columns as int32 (512 B vs 64 KB), and the kernel
rebuilds the 0/1 one-hot in VMEM with a broadcasted-iota compare before
the same MXU contraction — the operator's HBM traffic drops ~128x and
the src/dst operators merge into ONE union pair list (src and dst
endpoints of an arc usually share a node tile under tile packing).

The operators are constants (no cotangent), matching the reference where
the incidence structure is data.  Numerics: the FORWARD select is
bit-equal to ``state[arc_src]`` for every row (exact bf16x3 planes /
HIGHEST-precision dots against a 0/1 one-hot — and it beats the TPU row
gather, which runs ~2 rows/cycle regardless of row width); the BACKWARD
contraction sums each node's incident-arc contributions in a different
order than the serial scatter, so gradients agree to f32 rounding
(tested), not bit-for-bit.  f32 only — the model call sites keep the
plain gather for ``floatx('float64')`` states.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnkeras_tpu.ops.segment import segment_sum

TILE = 128

_PAIR_KB = 16  # pairs per grid step (K_TILES-style overhead amortization)

# acceptance bound: average UNION (src ∪ dst endpoint) node-tiles touched
# per arc tile.  Tile-packed merges sit near 2-4; beyond this the block
# form is too scattered to pay and the caller keeps the autodiff scatter.
_MAX_PAIRS_PER_ARC_TILE = 12


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "b_arc_tile", "b_node_tile", "b_cols_src", "b_cols_dst", "b_start",
        "f_arc_tile", "f_node_tile", "f_cols_src", "f_cols_dst", "f_start",
    ],
    meta_fields=["n_arc_tiles", "n_node_tiles", "tile"],
)
@dataclasses.dataclass(frozen=True)
class IncidencePairs:
    """Union incidence structure over (arc-tile, node-tile) pairs.

    ``cols_src[k, r]`` is the local column (node % TILE) of arc row
    ``arc_tile[k]*TILE + r``'s SOURCE endpoint when that endpoint lives in
    ``node_tile[k]``, else -1 (the iota compare then yields an all-zero
    one-hot row; -1 also marks rows past the true arc count — the tile
    roundup).  ``cols_dst`` likewise for the destination endpoint.  The ``b_*`` arrays are sorted by node tile (the
    backward's segment-sum axis), the ``f_*`` arrays by arc tile (the
    forward's); both orders carry the SAME pair set."""

    b_arc_tile: jax.Array  # (B,) i32
    b_node_tile: jax.Array  # (B,) i32
    b_cols_src: jax.Array  # (B, T) i32, -1 = no contribution
    b_cols_dst: jax.Array  # (B, T) i32
    b_start: jax.Array  # (n_node_tiles+1,) i32: run offsets per node tile
    f_arc_tile: jax.Array  # (B,) i32
    f_node_tile: jax.Array  # (B,) i32
    f_cols_src: jax.Array  # (B, T) i32
    f_cols_dst: jax.Array  # (B, T) i32
    f_start: jax.Array  # (n_arc_tiles+1,) i32: run offsets per arc tile
    n_arc_tiles: int
    n_node_tiles: int
    tile: int

    @property
    def n_pairs(self) -> int:
        return int(self.b_arc_tile.shape[0])


def build_incidence_pairs(
    arc_src: np.ndarray,
    arc_dst: np.ndarray,
    n_nodes_padded: int,
) -> Optional[IncidencePairs]:
    """Host-side construction.  Returns None when ``n_nodes_padded`` is not
    128-aligned or the union pair count exceeds ``_MAX_PAIRS_PER_ARC_TILE``
    per arc tile (callers fall back to the autodiff scatter).  The arc-row
    space rounds up to the tile internally; the backward zero-pads its
    cotangent rows and the forward slices its output rows to match.

    EVERY arc row participates, dead/padding ones included: the operator
    then selects exactly what ``state[arc_src]`` selects (padding rows read
    their filler index's row, typically node 0), so the one-hot forward is
    the gather bit-for-bit and the backward is its true transpose — dead
    rows' cotangents are exactly zero under the masked loss/BN anyway."""
    a = len(arc_src)
    if a == 0 or n_nodes_padded % TILE:
        return None
    n_arc_tiles = -(-a // TILE)
    n_node_tiles = n_nodes_padded // TILE
    rows = np.arange(a, dtype=np.int64)
    srcn = np.asarray(arc_src).astype(np.int64)
    dstn = np.asarray(arc_dst).astype(np.int64)
    if srcn.min() < 0 or srcn.max() >= n_nodes_padded or \
            dstn.min() < 0 or dstn.max() >= n_nodes_padded:
        return None
    at = rows // TILE

    from gnnkeras_tpu import native

    key_s = at * n_node_tiles + srcn // TILE
    key_d = at * n_node_tiles + dstn // TILE
    uniq, inverse = native.unique_i64(
        np.concatenate([key_s, key_d]), return_inverse=True
    )
    B = len(uniq)
    if B > _MAX_PAIRS_PER_ARC_TILE * n_arc_tiles:
        return None

    # uniq ascends by key = arc-tile-major: the FORWARD order
    f_arc_tile = (uniq // n_node_tiles).astype(np.int32)
    f_node_tile = (uniq % n_node_tiles).astype(np.int32)
    f_cols_src = np.full((B, TILE), -1, np.int32)
    f_cols_dst = np.full((B, TILE), -1, np.int32)
    r_local = (rows % TILE).astype(np.int64)
    f_cols_src[inverse[: len(rows)], r_local] = srcn % TILE
    f_cols_dst[inverse[len(rows):], r_local] = dstn % TILE

    order = np.argsort(f_node_tile, kind="stable")  # the BACKWARD order

    def _pad(arr, fill):
        b_pad = -(-B // _PAIR_KB) * _PAIR_KB
        if b_pad == B:
            return arr
        pad = np.full((b_pad - B,) + arr.shape[1:], fill, arr.dtype)
        return np.concatenate([arr, pad])

    b_node_tile = _pad(f_node_tile[order], n_node_tiles - 1)
    f_arc_padded = _pad(f_arc_tile, n_arc_tiles - 1)
    return IncidencePairs(
        # inert padding keeps each order sorted: max tile id on the segment
        # axis, 0 on the gather axis, cols all -1 (zero one-hot)
        b_arc_tile=jnp.asarray(_pad(f_arc_tile[order], 0)),
        b_node_tile=jnp.asarray(b_node_tile),
        b_cols_src=jnp.asarray(_pad(f_cols_src[order], -1)),
        b_cols_dst=jnp.asarray(_pad(f_cols_dst[order], -1)),
        b_start=jnp.asarray(np.searchsorted(
            b_node_tile, np.arange(n_node_tiles + 1)).astype(np.int32)),
        f_arc_tile=jnp.asarray(f_arc_padded),
        f_node_tile=jnp.asarray(_pad(f_node_tile, 0)),
        f_cols_src=jnp.asarray(_pad(f_cols_src, -1)),
        f_cols_dst=jnp.asarray(_pad(f_cols_dst, -1)),
        f_start=jnp.asarray(np.searchsorted(
            f_arc_padded, np.arange(n_arc_tiles + 1)).astype(np.int32)),
        n_arc_tiles=n_arc_tiles,
        n_node_tiles=n_node_tiles,
        tile=TILE,
    )


def pad_incidence_pairs(
    inc: Optional[IncidencePairs], n_pairs: int
) -> Optional[IncidencePairs]:
    """Pad the pair list to a uniform static count (rounded up to the
    ``_PAIR_KB`` grid multiple).  Inert pairs carry all-(-1) cols — a zero
    one-hot contributes nothing — and sit at the tail of both sort orders
    (max tile id on each segment axis)."""
    if inc is None:
        return None
    n_pairs = -(-max(int(n_pairs), 1) // _PAIR_KB) * _PAIR_KB
    B = inc.n_pairs
    if B >= n_pairs:
        return inc
    e = n_pairs - B

    def cat(a, fill):
        return jnp.concatenate([a, jnp.full((e,) + a.shape[1:], fill, a.dtype)])

    # inert pairs land on the LAST tile of each sort order: only the final
    # run boundary moves
    return dataclasses.replace(
        inc,
        b_arc_tile=cat(inc.b_arc_tile, 0),
        b_node_tile=cat(inc.b_node_tile, inc.n_node_tiles - 1),
        b_cols_src=cat(inc.b_cols_src, -1),
        b_cols_dst=cat(inc.b_cols_dst, -1),
        b_start=inc.b_start.at[-1].add(e),
        f_arc_tile=cat(inc.f_arc_tile, inc.n_arc_tiles - 1),
        f_node_tile=cat(inc.f_node_tile, 0),
        f_cols_src=cat(inc.f_cols_src, -1),
        f_cols_dst=cat(inc.f_cols_dst, -1),
        f_start=inc.f_start.at[-1].add(e),
    )


def _bwd_kernel(kb: int, d_pad: int):
    """Per pair k: rebuild the two one-hots from the cols rows and contract
    the (d_pad, T) src/dst cotangent tiles into (d_pad, T) node columns.
    The pair axis LEADS every block (clean (·, T) tiles per k — a mid-axis
    pair index would force Mosaic relayouts).  The dot runs one-pass bf16
    operands with f32 accumulation — the same numerics the previous
    dense-bf16-block path shipped (its einsum bf16-cast the cotangent)."""

    def kernel(cols_s_ref, cols_d_ref, g_ref, out_ref):
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        for k in range(kb):
            # oh[r, c] = (cols[r] == c): contracting over arc rows r sends
            # cotangent row r into node column c
            oh_s = (cols_s_ref[k, :].reshape(TILE, 1) == iota_c)
            oh_d = (cols_d_ref[k, :].reshape(TILE, 1) == iota_c)
            g = g_ref[k]  # (2·d_pad, T): [src feats; dst feats] lane-major
            out_ref[k] = jnp.dot(
                g[:d_pad], oh_s.astype(g.dtype), preferred_element_type=jnp.float32
            ) + jnp.dot(
                g[d_pad:], oh_d.astype(g.dtype), preferred_element_type=jnp.float32
            )

    return kernel


def _pad_cts(ct_src, ct_dst, inc):
    t = inc.tile
    a_pad = inc.n_arc_tiles * t
    if ct_src.shape[0] != a_pad:
        pad = ((0, a_pad - ct_src.shape[0]), (0, 0))
        ct_src = jnp.pad(ct_src, pad)
        ct_dst = jnp.pad(ct_dst, pad)
    return ct_src, ct_dst


def incidence_scatter_xla(
    ct_src: jax.Array, ct_dst: jax.Array, inc: IncidencePairs
) -> jax.Array:
    """``Inc_srcᵀ·ct_src + Inc_dstᵀ·ct_dst`` — the scatter-free cotangent
    reduction: (A, d) × 2 → (N, d), XLA-assisted variant (gather and
    segment-sum outside a pairwise one-hot kernel).  One union pass: each
    pair contracts both endpoint one-hots against its arc tile's stacked
    cotangents."""
    t = inc.tile
    ct_src, ct_dst = _pad_cts(ct_src, ct_dst, inc)
    d = ct_src.shape[1]
    d_pad = -(-d // 8) * 8
    fpad = ((0, 0), (0, d_pad - d))
    # One relayout is unavoidable (the producer is row-major, the kernel
    # wants features on sublanes and arcs on lanes), so make it ONE batched
    # post-gather transpose: row-major tile split + concat + gather are all
    # (near-)free, then (B, T, 2·d_pad) → (B, 2·d_pad, T) in a single pass.
    # The v2 pre-gather chain (two (A,16)ᵀ + one (32,T_a,128) relayout)
    # measured ~0.5 ms of the 1.37 ms total; the v3 all-row-major attempt
    # (lane dim 16 everywhere) was 3x slower still — lane-128 blocks win.
    # bf16 operands on TPU: the default-precision MXU dot bf16-casts them
    # anyway, so pre-casting halves the relayout/gather traffic without
    # changing numerics; the CPU interpreter's dot is true f32 — keep it so
    op_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    ct2 = jnp.concatenate(
        [jnp.pad(ct_src, fpad), jnp.pad(ct_dst, fpad)], axis=1
    ).astype(op_dtype)  # (A_pad, 2·d_pad) row-major
    tiles = ct2.reshape(inc.n_arc_tiles, t, 2 * d_pad)
    gathered = tiles[inc.b_arc_tile].transpose(0, 2, 1)  # (B, 2·d_pad, T)
    B = inc.n_pairs
    kb = min(_PAIR_KB, B)
    prod = pl.pallas_call(
        _bwd_kernel(kb, d_pad),
        out_shape=jax.ShapeDtypeStruct((B, d_pad, t), jnp.float32),
        grid=(B // kb,),
        in_specs=[
            pl.BlockSpec((kb, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, 2 * d_pad, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb, d_pad, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(inc.b_cols_src, inc.b_cols_dst, gathered)
    agg = segment_sum(prod, inc.b_node_tile, inc.n_node_tiles)  # (n_nt, d_pad, T)
    out_t = agg.transpose(1, 0, 2).reshape(d_pad, inc.n_node_tiles * t)
    return out_t[:d].T.astype(ct_src.dtype)


def _fwd_kernel(kb: int, d_pad: int, precision):
    """Per pair k: transposed one-hots select this node tile's state columns
    into arc rows: (d_pad, T_cols)·(T_cols, T_arcs).  ``precision`` must make
    the selection EXACT (bf16x3 reconstructs f32 exactly against a 0/1
    one-hot); exactness is pinned by tests on the real backend."""

    def kernel(cols_s_ref, cols_d_ref, g_ref, out_ref):
        # transposed one-hot on the RHS: oh_t[c, r] = (cols[r] == c) selects
        # the node tile's state COLUMN c into arc lane r
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        for k in range(kb):
            oh_s_t = (cols_s_ref[k, :].reshape(1, TILE) == iota_r)
            oh_d_t = (cols_d_ref[k, :].reshape(1, TILE) == iota_r)
            g = g_ref[k]  # (d_pad, T) feature-major node states
            out_ref[k, :d_pad, :] = jnp.dot(
                g, oh_s_t.astype(g.dtype),
                preferred_element_type=jnp.float32, precision=precision,
            )
            out_ref[k, d_pad:, :] = jnp.dot(
                g, oh_d_t.astype(g.dtype),
                preferred_element_type=jnp.float32, precision=precision,
            )

    return kernel


def incidence_select_xla(state: jax.Array, inc: IncidencePairs, precision="highest"):
    """(state[arc_src], state[arc_dst]) through the one-hot pairs: (N, d) →
    two arrays of A_pad rows (callers slice to their arc count).  BIT-equal
    to the gather at ``precision='highest'`` for every row, dead/padding
    arcs included (pinned on TPU by tests); rows past ``len(arc_src)``
    (the internal tile roundup) come back zero and are sliced off."""
    t = inc.tile
    d = state.shape[1]
    d_pad = -(-d // 8) * 8
    # the pre-gather relayout runs on the SMALL (N, d_pad) state — ~6x
    # fewer bytes than relayouting the gathered pair blocks (forward needs
    # f32 operands for exactness, so post-gather transposes would be f32)
    state_t = jnp.pad(state, ((0, 0), (0, d_pad - d))).T.astype(jnp.float32)
    tiles = state_t.reshape(d_pad, inc.n_node_tiles, t).transpose(1, 0, 2)
    gathered = tiles[inc.f_node_tile]  # (B, d_pad, T)
    B = inc.n_pairs
    kb = min(_PAIR_KB, B)
    prod = pl.pallas_call(
        _fwd_kernel(kb, d_pad, precision),
        out_shape=jax.ShapeDtypeStruct((B, 2 * d_pad, t), jnp.float32),
        grid=(B // kb,),
        in_specs=[
            pl.BlockSpec((kb, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, d_pad, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb, 2 * d_pad, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(inc.f_cols_src, inc.f_cols_dst, gathered)
    agg = segment_sum(prod, inc.f_arc_tile, inc.n_arc_tiles)  # (n_at, 2·d_pad, T)
    y = agg.transpose(1, 0, 2).reshape(2 * d_pad, inc.n_arc_tiles * t)
    y_src = y[:d].T.astype(state.dtype)
    y_dst = y[d_pad : d_pad + d].T.astype(state.dtype)
    return y_src, y_dst


# --------------------------------------------------------------------------
# Fused variants: grid over OUTPUT tiles, scalar-prefetched run offsets,
# double-buffered in-kernel DMA of the input tiles, VMEM accumulation.
# Eliminates the XLA-materialized gather, the (B, ·, T) product tensor AND
# the segment-sum — the only HBM traffic left is one tile read per pair
# plus one write per output tile.
# --------------------------------------------------------------------------

# cols arrays are held fully VMEM-resident by the fused kernels
# (2 × B × T × 4 bytes); beyond this pair budget fall back to the
# XLA-assisted path rather than blow VMEM
_FUSED_MAX_PAIRS = 10_240

_N_BUF = 4  # DMA prefetch window (slots) in the fused kernels


def _fused_kernel(d_pad: int, t: int, op_dtype, bwd: bool, precision=None):
    """Shared fused body.  ``bwd``: accumulate one-hotᵀ contractions of
    cotangent tiles into a node tile.  ``fwd``: accumulate state-column
    selections into an arc tile (two outputs stacked on sublanes)."""

    def kernel(start_ref, idx_ref, cols_s_ref, cols_d_ref, src_ref, out_ref,
               scratch, sems):
        j = pl.program_id(0)
        s = start_ref[j]
        n = start_ref[j + 1] - s
        # oh_t[c, r] = (cols[r] == c), built by pure lane-broadcast compare
        # (no in-loop relayout) and used in BOTH directions: the forward
        # contracts it on dim 0 (plain dot), the backward on dim 1
        # (dot_general — a Bᵀ matmul the MXU runs natively)
        iota0 = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)

        def dma(slot, p):
            return pltpu.make_async_copy(
                src_ref.at[idx_ref[p]], scratch.at[slot], sems.at[slot]
            )

        # _N_BUF-deep prefetch window (up to _N_BUF-1 copies in flight;
        # plain double buffering measured within session noise of this —
        # kept for the deeper latency hiding at zero cost)
        for k in range(_N_BUF - 1):
            @pl.when(k < n)
            def _(k=k):
                dma(k, s + k).start()

        out_rows = d_pad if bwd else 2 * d_pad
        dn_t = (((1,), (1,)), ((), ()))  # contract both operands' dim 1

        def body(i, acc):
            p = s + i
            slot = jax.lax.rem(i, _N_BUF)

            @pl.when(i + _N_BUF - 1 < n)
            def _():
                dma(jax.lax.rem(i + _N_BUF - 1, _N_BUF), p + _N_BUF - 1).start()

            dma(slot, p).wait()
            g = scratch[slot]
            oh_s_t = (cols_s_ref[pl.ds(p, 1), :] == iota0).astype(g.dtype)
            oh_d_t = (cols_d_ref[pl.ds(p, 1), :] == iota0).astype(g.dtype)
            if bwd:
                # (d_pad, arcs) × oh_tᵀ → (d_pad, node cols)
                return (
                    acc
                    + jax.lax.dot_general(g[:d_pad], oh_s_t, dn_t,
                                          preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(g[d_pad:], oh_d_t, dn_t,
                                          preferred_element_type=jnp.float32)
                )
            # (d_pad, node cols) × oh_t → (d_pad, arc lanes)
            if precision == "bf16x3":
                # exact selection from 3 one-pass bf16 planes: hi/mid/lo
                # reconstruct the f32 exactly (Sterbenz-exact residuals) and
                # each plane·one-hot product is exact — fewer MXU passes
                # than the HIGHEST f32 dot
                hi = g.astype(jnp.bfloat16)
                r1 = g - hi.astype(jnp.float32)
                mid = r1.astype(jnp.bfloat16)
                lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                oh_s_b = oh_s_t.astype(jnp.bfloat16)
                oh_d_b = oh_d_t.astype(jnp.bfloat16)
                ys = jnp.zeros((d_pad, t), jnp.float32)
                yd = jnp.zeros((d_pad, t), jnp.float32)
                for plane in (hi, mid, lo):
                    ys = ys + jnp.dot(plane, oh_s_b, preferred_element_type=jnp.float32)
                    yd = yd + jnp.dot(plane, oh_d_b, preferred_element_type=jnp.float32)
                return acc + jnp.concatenate([ys, yd], axis=0)
            ys = jnp.dot(g, oh_s_t, preferred_element_type=jnp.float32,
                         precision=precision)
            yd = jnp.dot(g, oh_d_t, preferred_element_type=jnp.float32,
                         precision=precision)
            return acc + jnp.concatenate([ys, yd], axis=0)

        acc = jax.lax.fori_loop(
            0, n, body, jnp.zeros((out_rows, t), jnp.float32)
        )
        out_ref[0] = acc

    return kernel


def _fused_call(start, idx, cols_s, cols_d, tiles, n_out, d_pad, t, op_dtype,
                bwd, precision=None):
    n_rows = d_pad if bwd else 2 * d_pad
    in_rows = 2 * d_pad if bwd else d_pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_out,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cols_src (B, T)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cols_dst (B, T)
            pl.BlockSpec(memory_space=pl.ANY),  # input tiles stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, n_rows, t), lambda j, *_: (j, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, in_rows, t), op_dtype),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    return pl.pallas_call(
        _fused_kernel(d_pad, t, op_dtype, bwd, precision),
        out_shape=jax.ShapeDtypeStruct((n_out, n_rows, t), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(start, idx, cols_s, cols_d, tiles)


def incidence_scatter_fused(
    ct_src: jax.Array, ct_dst: jax.Array, inc: IncidencePairs
) -> jax.Array:
    """Fused ``Inc_srcᵀ·ct_src + Inc_dstᵀ·ct_dst``: one grid step per node
    tile walks its run of pairs, DMA-ing each pair's cotangent tile and
    accumulating the one-hot contractions in VMEM."""
    t = inc.tile
    ct_src, ct_dst = _pad_cts(ct_src, ct_dst, inc)
    d = ct_src.shape[1]
    d_pad = -(-d // 8) * 8
    fpad = ((0, 0), (0, d_pad - d))
    op_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    ct2 = jnp.concatenate(
        [jnp.pad(ct_src, fpad), jnp.pad(ct_dst, fpad)], axis=1
    ).astype(op_dtype)
    # the one relayout: (T_a, T, 2·d_pad) → (T_a, 2·d_pad, T) batched
    tiles = ct2.reshape(inc.n_arc_tiles, t, 2 * d_pad).transpose(0, 2, 1)
    agg = _fused_call(
        inc.b_start, inc.b_arc_tile, inc.b_cols_src, inc.b_cols_dst,
        tiles, inc.n_node_tiles, d_pad, t, op_dtype, bwd=True,
    )  # (n_nt, d_pad, T)
    out_t = agg.transpose(1, 0, 2).reshape(d_pad, inc.n_node_tiles * t)
    return out_t[:d].T.astype(ct_src.dtype)


def incidence_select_fused(state, inc: IncidencePairs, precision="highest"):
    """Fused (state[arc_src], state[arc_dst]): one grid step per arc tile
    walks its run of pairs, DMA-ing each pair's state tile and accumulating
    the exact one-hot selections in VMEM."""
    t = inc.tile
    d = state.shape[1]
    d_pad = -(-d // 8) * 8
    state_t = jnp.pad(state, ((0, 0), (0, d_pad - d))).T.astype(jnp.float32)
    tiles = state_t.reshape(d_pad, inc.n_node_tiles, t).transpose(1, 0, 2)
    y = _fused_call(
        inc.f_start, inc.f_node_tile, inc.f_cols_src, inc.f_cols_dst,
        tiles, inc.n_arc_tiles, d_pad, t, jnp.float32, bwd=False,
        precision=precision,
    )  # (n_at, 2·d_pad, T)
    y = y.transpose(1, 0, 2).reshape(2 * d_pad, inc.n_arc_tiles * t)
    y_src = y[:d].T.astype(state.dtype)
    y_dst = y[d_pad : d_pad + d].T.astype(state.dtype)
    return y_src, y_dst


def incidence_scatter(
    ct_src: jax.Array, ct_dst: jax.Array, inc: IncidencePairs
) -> jax.Array:
    """The scatter-free cotangent reduction — fused kernel when the cols
    arrays fit the VMEM budget, XLA-assisted otherwise."""
    if inc.n_pairs <= _FUSED_MAX_PAIRS:
        return incidence_scatter_fused(ct_src, ct_dst, inc)
    return incidence_scatter_xla(ct_src, ct_dst, inc)


def incidence_select(state, inc: IncidencePairs, precision=None):
    """(state[arc_src], state[arc_dst]) through the one-hot pairs, bit-equal
    to the gather.  Measured pick (merged Mutagenicity, v5e): the FUSED
    kernel with the manual ``bf16x3`` exact split (0.58-0.63 ms vs 0.80-0.83
    for its HIGHEST f32 dots, 0.63-0.71 for the XLA-assisted HIGHEST and
    1.10-1.29 for the two plain gathers); beyond the fused VMEM pair budget
    the XLA-assisted variant at HIGHEST takes over.  Pass ``precision``
    explicitly to override."""
    if inc.n_pairs <= _FUSED_MAX_PAIRS:
        return incidence_select_fused(state, inc, precision or "bf16x3")
    return incidence_select_xla(state, inc, precision or "highest")


def _select_rows(state, n_rows, inc):
    y_src, y_dst = incidence_select(state, inc)
    return y_src[:n_rows], y_dst[:n_rows]


@jax.custom_vjp
def incidence_gather(state, arc_src, arc_dst, inc):
    """(state[arc_src], state[arc_dst]) with the one-hot pair kernels on
    BOTH sides: the forward select is bit-equal to the gather (and faster —
    the TPU row gather runs ~2 rows/cycle), the backward replaces the
    gather VJP's serializing scatter with MXU contractions."""
    return _select_rows(state, arc_src.shape[0], inc)


def _ig_fwd(state, arc_src, arc_dst, inc):
    return _select_rows(state, arc_src.shape[0], inc), (inc,)


def _ig_bwd(res, cts):
    (inc,) = res
    ct_src, ct_dst = cts
    return incidence_scatter(ct_src, ct_dst, inc), None, None, None


incidence_gather.defvjp(_ig_fwd, _ig_bwd)
