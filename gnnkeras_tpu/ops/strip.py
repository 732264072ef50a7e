"""Compact-strip Pallas aggregation: the successor to the round-1 fused
kernel (which lost to the XLA einsum by 5x due to d=14→128 lane padding,
BASELINE.md round 1).

Layout: graphs packed into 32-node sub-slots of 128-node tiles make each
tile's within-slot adjacency block-diagonal with four 32×32 blocks, stored
COMPACT as a (T, 32, 128) strip — 4x fewer HBM bytes than the 128×128 block.
The kernel expands the strip to the (128,128) block-diagonal in VMEM with
four lane-masked sublane strips (pure VPU masking, no shifts) and runs one
full 128-contraction MXU matmul per tile against the TRANSPOSED state
(features in sublanes: nothing is lane-padded anywhere).

Edges crossing 32-slot boundaries (graphs larger than a slot) are carried by
the standard BCSR residual (ops/bcsr.py) and summed in.

The backward pass reuses the forward kernel with the transposed strip
(block-diagonal transpose = per-slot 32×32 transposes, precomputed host-side)
— the VJP of ``out_T = state_T·BD`` is ``ct_T·BDᵀ`` plus the residual's own
autodiff.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnkeras_tpu.ops.bcsr import BcsrMatrix, bcsr_aggregate, build_bcsr, transpose_bcsr

SLOT = 32
TILE = 128
D_SUB = 8  # sublane granularity for the transposed state


class StripFactorError(ValueError):
    """int8 mask+scale storage requested but the operator's weights are not
    column-factorable (duplicate arcs, or per-arc weights that differ within
    one destination column)."""


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["strip", "strip_t", "blocks", "blocks_t", "residual", "residual_t",
                 "scale", "blocks_scale"],
    meta_fields=["slot"],
)
@dataclasses.dataclass(frozen=True)
class StripOperator:
    """Within-slot compact strips (+ transposes for the VJP) and the
    cross-slot BCSR residual.  ``slot`` is the sub-slot width: 32/64 store
    the within-slot block diagonal compactly ((T, slot, TILE) strips, the
    kernel expands in VMEM); ``slot == TILE`` degenerates to plain dense
    diagonal blocks (no expansion, no compaction).

    MIXED format (``blocks`` is not None): the tile axis is partitioned —
    tiles [0, Ts) are slot-pure (compact strips), tiles [Ts, T) hold graphs
    larger than the slot and store FULL diagonal blocks covering all their
    within-tile edges, so no within-tile edge ever pays the BCSR residual.
    One fused kernel runs both regions (grid step switches format on the
    region boundary); the residual carries only cross-tile (spanning-graph)
    edges.  Layouts come from packing.order_tiles_by_format.

    INT8 mask+scale storage (``scale`` is not None): the reference's
    aggregation modes give every destination node ONE weight shared by all
    its incoming arcs (sum → 1, average → 1/indeg, normalized → 1/norm;
    graph_class.py:105-121), so each strip/block COLUMN is constant and the
    operator factors exactly into a 0/1 int8 mask times a per-column f32
    scale — half the HBM bytes of bf16 storage, the forward's dominant
    traffic.  The kernel applies the scale to the matmul's output columns
    (forward) or input columns (the transposed VJP pass, where the scale sits
    on the contraction axis)."""

    strip: jax.Array  # (Ts, slot, TILE)
    strip_t: jax.Array  # (Ts, slot, TILE): per-slot transposed blocks
    blocks: Optional[jax.Array]  # (Tb, TILE, TILE) mixed-format block tiles
    blocks_t: Optional[jax.Array]
    residual: Optional[BcsrMatrix]
    residual_t: Optional[BcsrMatrix]
    scale: Optional[jax.Array]  # (Ts, TILE) f32 per-column scales (int8 mode)
    blocks_scale: Optional[jax.Array]  # (Tb, TILE)
    slot: int


def _factor_mask_scale(arr: np.ndarray):
    """Factor ``arr == mask * scale[:, None, :]`` with a 0/1 mask: every
    column's nonzeros must share one value (the reference's per-destination
    aggregation weight, graph_class.py:105-121).  Returns (mask int8,
    scale f32) or None when not factorable (duplicate arcs accumulated, or
    per-arc weights).  Delegates to the native tier (single C++ pass; the
    NumPy fallback reconstructs and compares — same verdict either way)."""
    from gnnkeras_tpu import native

    return native.factor_mask_scale(arr)


def _finalize_strips(strip: np.ndarray, strip_t: np.ndarray, dtype):
    """Host f64 strips → storage arrays.  ``int8`` selects mask+scale
    factorization (StripFactorError when the weights don't factor); any float
    dtype stores the weights directly with no scale."""
    if np.dtype(dtype) == np.int8:
        fac = _factor_mask_scale(strip)
        if fac is None:
            raise StripFactorError(
                "strip weights are not column-constant; int8 mask+scale "
                "storage needs one weight per destination (sum/normalized/"
                "average aggregation over deduplicated arcs)"
            )
        mask, scale = fac
        mask_t = (strip_t != 0).astype(np.int8)
        return jnp.asarray(mask), jnp.asarray(mask_t), jnp.asarray(scale)
    return jnp.asarray(strip.astype(dtype)), jnp.asarray(strip_t.astype(dtype)), None


def strip_to_dense(op: "StripOperator", dtype=jnp.bfloat16) -> "StripOperator":
    """Convert an int8 mask+scale operator back to direct weight storage in
    ``dtype`` (used to keep sequencer batches on ONE pytree structure when a
    later merge turns out not to be factorable)."""
    if op.scale is None:
        return op
    slot = op.slot

    def _dense_pair(mask, mask_t, scale):
        m = np.asarray(mask, np.float32)
        mt = np.asarray(mask_t, np.float32)
        s = np.asarray(scale, np.float32)
        dense = m * s[:, None, :]
        # transposed entry (tile, r, c) holds the weight of edge s→d with
        # d%TILE == (c//slot)*slot + r — index the forward scale accordingly
        rows = np.arange(mt.shape[1])[:, None]
        cols = np.arange(TILE)[None, :]
        d_idx = (cols // slot) * slot + rows  # (rows, TILE)
        dense_t = mt * s[:, d_idx]
        return jnp.asarray(dense.astype(dtype)), jnp.asarray(dense_t.astype(dtype))

    strip, strip_t = _dense_pair(op.strip, op.strip_t, op.scale)
    blocks = blocks_t = None
    if op.blocks is not None:
        # full blocks: transposed entry (tile, d%TILE, s%TILE) scales by its
        # ROW index d, i.e. the forward scale broadcast over columns
        mb = np.asarray(op.blocks, np.float32)
        mbt = np.asarray(op.blocks_t, np.float32)
        sb = np.asarray(op.blocks_scale, np.float32)
        blocks = jnp.asarray((mb * sb[:, None, :]).astype(dtype))
        blocks_t = jnp.asarray((mbt * sb[:, :, None]).astype(dtype))
    return dataclasses.replace(
        op, strip=strip, strip_t=strip_t, blocks=blocks, blocks_t=blocks_t,
        scale=None, blocks_scale=None,
    )


def build_strip_operator(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    n_padded: int,
    slot: int = SLOT,
    dtype=np.float32,
    n_strip_tiles: Optional[int] = None,
) -> StripOperator:
    """Host-side construction over slot-packed node positions (every graph
    ≤ ``slot`` nodes lives inside one slot; larger graphs produce residual
    edges).  ``dtype`` (float32/bfloat16) is the strip storage type — the
    kernel accumulates in f32 either way, and on the MXU the default f32
    matmul precision is already one-pass bf16 operands (BASELINE.md).

    ``n_strip_tiles`` selects the MIXED format: tiles [0, n_strip_tiles)
    store compact strips, the rest full diagonal blocks; it must be a
    K_TILES multiple (packing.order_tiles_by_format aligns it)."""
    assert n_padded % TILE == 0
    if TILE % slot:
        raise ValueError(f"slot {slot} must divide TILE {TILE}")
    t = n_padded // TILE
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float64)
    # drop zero-weight (padding) rows up front: a padded slot-crossing row
    # would otherwise force a permanently-zero residual BCSR pass per call
    live = weight != 0
    src, dst, weight = src[live], dst[live], weight[live]

    in_slot = (src // slot) == (dst // slot)
    blocks = blocks_t = None
    if n_strip_tiles is not None:
        ns = int(n_strip_tiles)
        if ns % K_TILES and ns != t:
            raise ValueError(f"n_strip_tiles {ns} must be a K_TILES ({K_TILES}) multiple")
        if ns > t:
            raise ValueError(f"n_strip_tiles {ns} exceeds tile count {t}")
        boundary = ns * TILE
        within_tile = (src // TILE) == (dst // TILE)
        in_strip = in_slot & within_tile & (dst < boundary)
        in_block = within_tile & (dst >= boundary)
        s, d, w = src[in_strip], dst[in_strip], weight[in_strip]
        from gnnkeras_tpu import native

        strip = np.zeros((ns, slot, TILE), np.float32)
        native.scatter_add_3d(strip, d // TILE, s % slot, d % TILE, w)
        strip_t = np.zeros_like(strip)
        native.scatter_add_3d(strip_t, s // TILE, d % slot, s % TILE, w)
        # full blocks for the [ns, t) region, trailing-padded to a K multiple
        tb = t - ns
        tb_pad = -(-max(tb, 1) // K_TILES) * K_TILES
        sb, db, wb = src[in_block], dst[in_block], weight[in_block]
        blocks = np.zeros((tb_pad, TILE, TILE), np.float32)
        native.scatter_add_3d(blocks, db // TILE - ns, sb % TILE, db % TILE, wb)
        blocks_t = np.zeros_like(blocks)
        native.scatter_add_3d(blocks_t, sb // TILE - ns, db % TILE, sb % TILE, wb)
        rest = ~(in_strip | in_block)
        residual = residual_t = None
        if np.any(rest):
            residual = build_bcsr(src[rest], dst[rest], weight[rest], n_padded,
                                  max_band_factor=10**9)
            residual_t = transpose_bcsr(residual)
        s_arr, s_t_arr, s_scale = _finalize_strips(strip, strip_t, dtype)
        b_arr, b_t_arr, b_scale = _finalize_strips(blocks, blocks_t, dtype)
        return StripOperator(
            strip=s_arr,
            strip_t=s_t_arr,
            blocks=b_arr,
            blocks_t=b_t_arr,
            residual=residual,
            residual_t=residual_t,
            scale=s_scale,
            blocks_scale=b_scale,
            slot=slot,
        )

    s, d, w = src[in_slot], dst[in_slot], weight[in_slot]
    from gnnkeras_tpu import native

    strip = np.zeros((t, slot, TILE), np.float32)
    native.scatter_add_3d(strip, d // TILE, s % slot, d % TILE, w)
    # block-diagonal transpose: edge (s → d) lands at column s, row d%slot
    strip_t = np.zeros_like(strip)
    native.scatter_add_3d(strip_t, s // TILE, d % slot, s % TILE, w)

    residual = residual_t = None
    if np.any(~in_slot):
        sr, dr, wr = src[~in_slot], dst[~in_slot], weight[~in_slot]
        residual = build_bcsr(sr, dr, wr, n_padded, max_band_factor=10**9)
        residual_t = transpose_bcsr(residual)
    # Pre-pad the constant strips to a K_TILES multiple once at build time so
    # the runtime path is a pure pallas_call (no per-call HBM re-copy of the
    # operator).  The matmul slices the output back to the true N.
    if t > K_TILES and t % K_TILES:
        t_pad = -(-t // K_TILES) * K_TILES
        pad = np.zeros((t_pad - t, slot, TILE), np.float32)
        strip = np.concatenate([strip, pad], axis=0)
        strip_t = np.concatenate([strip_t, pad], axis=0)
    s_arr, s_t_arr, s_scale = _finalize_strips(strip, strip_t, dtype)
    return StripOperator(
        strip=s_arr,
        strip_t=s_t_arr,
        blocks=None,
        blocks_t=None,
        residual=residual,
        residual_t=residual_t,
        scale=s_scale,
        blocks_scale=None,
        slot=slot,
    )


K_TILES = 16  # tiles per grid step: amortizes the per-grid-step overhead that
# dominated the one-tile-per-step round-2 kernel (0.204 → 0.028-0.034 ms/iter
# on merged Mutagenicity; BASELINE.md round-2 table, scripts/bench_strip_blocked.py).
# K=16 and K=32 measure within noise of each other; 16 is shipped because it
# halves the per-step VMEM working set (strip block K·32·128·4B) and divides
# more tile counts evenly.


def _strip_kernel(k_tiles: int, slot: int, scaled: bool = False, scale_in: bool = False):
    """``scaled`` adds the int8 mask+scale path: the mask block converts
    int8→f32 in VMEM (the HBM transfer already happened at int8 width — the
    point of the representation) and the per-column scale multiplies the
    matmul OUTPUT columns (forward) or, with ``scale_in``, the INPUT columns
    (the transposed VJP pass, where the destination scale sits on the
    contraction axis: ``ct·diag(scale)·maskᵀ``)."""
    expand = TILE // slot

    def kernel(*refs):
        if scaled:
            strip_ref, scale_ref, state_ref, out_ref = refs
        else:
            strip_ref, state_ref, out_ref = refs
        if expand > 1:
            col_group = jax.lax.broadcasted_iota(jnp.int32, (slot, TILE), 1) // slot
        for k in range(k_tiles):
            a = strip_ref[k]  # (slot, TILE)
            # cast the OPERATOR up to the state dtype (VPU work on VMEM-resident
            # data) rather than the state down: bf16/int8 strips then halve/
            # quarter HBM operator bytes while the matmul runs the standard
            # f32 MXU pass (itself one-pass bf16 operands — numerically
            # identical)
            if a.dtype != state_ref.dtype:
                a = a.astype(state_ref.dtype)
            if expand > 1:
                parts = [a * (col_group == g_i).astype(a.dtype) for g_i in range(expand)]
                bd = jnp.concatenate(parts, axis=0)  # (TILE, TILE) block-diagonal
            else:  # slot == TILE: the strip IS the dense diagonal block
                bd = a
            x = state_ref[:, k * TILE : (k + 1) * TILE]
            if scaled and scale_in:
                x = x * scale_ref[k : k + 1, :].astype(x.dtype)
            out = jnp.dot(x, bd, preferred_element_type=jnp.float32)
            if scaled and not scale_in:
                out = out * scale_ref[k : k + 1, :].astype(jnp.float32)
            out_ref[:, k * TILE : (k + 1) * TILE] = out.astype(out_ref.dtype)

    return kernel


def _strip_matmul(
    state_t: jax.Array,
    strip: jax.Array,
    slot: int = SLOT,
    scale: Optional[jax.Array] = None,
    scale_in: bool = False,
) -> jax.Array:
    """(d_sub, N) × strips → (d_sub, N) of within-slot contributions.

    Processes ``K_TILES`` tiles per grid step.  ``build_strip_operator``
    pre-pads the constant strips to a K_TILES multiple, so for built
    operators the only runtime work besides the pallas_call is padding the
    (small) transposed state to the strip's tile count."""
    d_sub, n = state_t.shape
    t = strip.shape[0]
    k_tiles = min(K_TILES, t)
    if t % k_tiles:  # hand-built operator: pad the strip to the next multiple
        t_pad = -(-t // k_tiles) * k_tiles
        strip = jnp.concatenate(
            [strip, jnp.zeros((t_pad - t, slot, TILE), strip.dtype)], axis=0
        )
        if scale is not None:
            scale = jnp.concatenate(
                [scale, jnp.zeros((t_pad - t, TILE), scale.dtype)], axis=0
            )
        t = t_pad
    if t * TILE != n:
        state_t = jnp.pad(state_t, ((0, 0), (0, t * TILE - n)))
    in_specs = [
        pl.BlockSpec((k_tiles, slot, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [strip]
    if scale is not None:
        in_specs.append(
            pl.BlockSpec((k_tiles, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(scale)
    in_specs.append(
        pl.BlockSpec((d_sub, k_tiles * TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    )
    operands.append(state_t)
    out = pl.pallas_call(
        _strip_kernel(k_tiles, slot, scaled=scale is not None, scale_in=scale_in),
        out_shape=jax.ShapeDtypeStruct((d_sub, t * TILE), state_t.dtype),
        grid=(t // k_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((d_sub, k_tiles * TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(*operands)
    return out[:, :n]


@partial(jax.custom_vjp, nondiff_argnums=())
def strip_aggregate(state: jax.Array, op: StripOperator) -> jax.Array:
    """``Adjᵀ·state`` (incoming aggregation) through the compact strips +
    BCSR residual.  state (N, d) row-major at the interface; transposed
    internally."""
    return _strip_forward(state, op)


def _mixed_kernel(k_tiles: int, slot: int, ns: int, scaled: bool = False, scale_in: bool = False):
    """Region-switched kernel: grid steps [0, ns) expand compact strips,
    steps [ns, ·) run full diagonal blocks — one launch for both formats.
    ``scaled``/``scale_in`` as in ``_strip_kernel``."""
    expand = TILE // slot

    def kernel(*refs):
        if scaled:
            strip_ref, strip_scale_ref, blocks_ref, blocks_scale_ref, state_ref, out_ref = refs
        else:
            strip_ref, blocks_ref, state_ref, out_ref = refs
            strip_scale_ref = blocks_scale_ref = None
        i = pl.program_id(0)

        def body(op_ref, scale_ref, is_strip):
            if is_strip and expand > 1:
                col_group = jax.lax.broadcasted_iota(jnp.int32, (slot, TILE), 1) // slot
            for k in range(k_tiles):
                a = op_ref[k]
                if a.dtype != state_ref.dtype:
                    a = a.astype(state_ref.dtype)
                if is_strip and expand > 1:
                    parts = [a * (col_group == g_i).astype(a.dtype) for g_i in range(expand)]
                    bd = jnp.concatenate(parts, axis=0)
                else:
                    bd = a
                x = state_ref[:, k * TILE : (k + 1) * TILE]
                if scaled and scale_in:
                    x = x * scale_ref[k : k + 1, :].astype(x.dtype)
                out = jnp.dot(x, bd, preferred_element_type=jnp.float32)
                if scaled and not scale_in:
                    out = out * scale_ref[k : k + 1, :].astype(jnp.float32)
                out_ref[:, k * TILE : (k + 1) * TILE] = out.astype(out_ref.dtype)

        @pl.when(i < ns)
        def _():
            body(strip_ref, strip_scale_ref, True)

        @pl.when(i >= ns)
        def _():
            body(blocks_ref, blocks_scale_ref, False)

    return kernel


def _strip_matmul_mixed(
    state_t: jax.Array,
    strip: jax.Array,
    blocks: jax.Array,
    slot: int,
    scale: Optional[jax.Array] = None,
    blocks_scale: Optional[jax.Array] = None,
    scale_in: bool = False,
) -> jax.Array:
    """Mixed-format aggregation: strips over tiles [0, Ts), full diagonal
    blocks over [Ts, Ts+Tb).  Both region sizes are K_TILES multiples (the
    layout guarantees it); the per-region input index maps pin the *other*
    operand's block index so it is fetched once, not per step."""
    d_sub, n = state_t.shape
    ts, tb = strip.shape[0], blocks.shape[0]
    if ts == 0:
        out = _strip_matmul(state_t, blocks, TILE, scale=blocks_scale, scale_in=scale_in)
        return out
    k = min(K_TILES, ts)
    assert ts % k == 0 and tb % k == 0, (ts, tb, k)
    scaled = scale is not None
    t = ts + tb
    if t * TILE != n:
        state_t = jnp.pad(state_t, ((0, 0), (0, t * TILE - n)))
    ns = ts // k
    nb = tb // k
    in_specs = [
        pl.BlockSpec(
            (k, slot, TILE), lambda i: (jnp.minimum(i, ns - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [strip]
    if scaled:
        in_specs.append(
            pl.BlockSpec((k, TILE), lambda i: (jnp.minimum(i, ns - 1), 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(scale)
    in_specs.append(
        pl.BlockSpec(
            (k, TILE, TILE), lambda i: (jnp.maximum(i - ns, 0), 0, 0),
            memory_space=pltpu.VMEM,
        )
    )
    operands.append(blocks)
    if scaled:
        in_specs.append(
            pl.BlockSpec((k, TILE), lambda i: (jnp.maximum(i - ns, 0), 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(blocks_scale)
    in_specs.append(
        pl.BlockSpec((d_sub, k * TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    )
    operands.append(state_t)
    out = pl.pallas_call(
        _mixed_kernel(k, slot, ns, scaled=scaled, scale_in=scale_in),
        out_shape=jax.ShapeDtypeStruct((d_sub, t * TILE), state_t.dtype),
        grid=(ns + nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((d_sub, k * TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(*operands)
    return out[:, :n]


def _diag_matmul(state_t: jax.Array, op: StripOperator, transpose: bool) -> jax.Array:
    """The block-diagonal part of the operator (mixed or single-format).
    int8 mask+scale operators reuse the ONE forward scale in both directions:
    forward multiplies the output columns, the transpose multiplies the input
    columns (the destination scale moves to the contraction axis)."""
    strip = op.strip_t if transpose else op.strip
    if op.blocks is not None:
        blocks = op.blocks_t if transpose else op.blocks
        return _strip_matmul_mixed(
            state_t, strip, blocks, op.slot,
            scale=op.scale, blocks_scale=op.blocks_scale, scale_in=transpose,
        )
    return _strip_matmul(state_t, strip, op.slot, scale=op.scale, scale_in=transpose)


def _strip_forward(state: jax.Array, op: StripOperator) -> jax.Array:
    n, d = state.shape
    d_pad = -(-d // D_SUB) * D_SUB
    state_t = jnp.pad(state, ((0, 0), (0, d_pad - d))).T  # (d_pad, N)
    out_t = _diag_matmul(state_t, op, transpose=False)
    out = out_t.T[:, :d]
    if op.residual is not None:
        out = out + bcsr_aggregate(state, op.residual)
    return out


def _strip_fwd(state, op):
    return _strip_forward(state, op), (op,)


def _strip_bwd(res, ct):
    (op,) = res
    n, d = ct.shape
    d_pad = -(-d // D_SUB) * D_SUB
    ct_t = jnp.pad(ct, ((0, 0), (0, d_pad - d))).T
    dstate_t = _diag_matmul(ct_t, op, transpose=True)
    dstate = dstate_t.T[:, :d]
    if op.residual_t is not None:
        dstate = dstate + bcsr_aggregate(ct, op.residual_t)
    return dstate, None


strip_aggregate.defvjp(_strip_fwd, _strip_bwd)


# --------------------------------------------------------------------------
# Transposed-native interface: state stays (d_pad, N) — the layout the
# transposed unfold engine (models/gnn.py) carries through the whole
# convergence loop, so the Pallas boundary never relayouts (the round-2
# finding: the (N,14) row-major crossing was the bottleneck, BASELINE.md).
# --------------------------------------------------------------------------


def _strip_forward_t(state_t: jax.Array, op: StripOperator) -> jax.Array:
    out = _diag_matmul(state_t, op, transpose=False)
    if op.residual is not None:
        from gnnkeras_tpu.ops.bcsr import bcsr_aggregate_t

        out = out + bcsr_aggregate_t(state_t, op.residual)
    return out


@jax.custom_vjp
def strip_aggregate_t(state_t: jax.Array, op: StripOperator) -> jax.Array:
    """``Adjᵀ·state`` on feature-major state: (d_pad, N) → (d_pad, N) through
    the compact strips + the transposed BCSR residual.  ``d_pad`` must be a
    sublane multiple (8 for f32); the operator is a constant (no cotangent),
    matching the reference where Adjacency is data (GNN/Models/GNN.py:228)."""
    return _strip_forward_t(state_t, op)


def _strip_t_fwd(state_t, op):
    return _strip_forward_t(state_t, op), (op,)


def _strip_t_bwd(res, ct_t):
    (op,) = res
    dstate_t = _diag_matmul(ct_t, op, transpose=True)
    if op.residual_t is not None:
        from gnnkeras_tpu.ops.bcsr import bcsr_aggregate_t

        dstate_t = dstate_t + bcsr_aggregate_t(ct_t, op.residual_t)
    return dstate_t, None


strip_aggregate_t.defvjp(_strip_t_fwd, _strip_t_bwd)
