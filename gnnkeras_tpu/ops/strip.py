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


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["strip", "strip_t", "blocks", "blocks_t", "residual", "residual_t"],
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
    edges.  Layouts come from packing.order_tiles_by_format."""

    strip: jax.Array  # (Ts, slot, TILE)
    strip_t: jax.Array  # (Ts, slot, TILE): per-slot transposed blocks
    blocks: Optional[jax.Array]  # (Tb, TILE, TILE) mixed-format block tiles
    blocks_t: Optional[jax.Array]
    residual: Optional[BcsrMatrix]
    residual_t: Optional[BcsrMatrix]
    slot: int


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
        strip = np.zeros((ns, slot, TILE), np.float32)
        np.add.at(strip, (d // TILE, s % slot, d % TILE), w)
        strip_t = np.zeros_like(strip)
        np.add.at(strip_t, (s // TILE, d % slot, s % TILE), w)
        # full blocks for the [ns, t) region, trailing-padded to a K multiple
        tb = t - ns
        tb_pad = -(-max(tb, 1) // K_TILES) * K_TILES
        sb, db, wb = src[in_block], dst[in_block], weight[in_block]
        blocks = np.zeros((tb_pad, TILE, TILE), np.float32)
        np.add.at(blocks, (db // TILE - ns, sb % TILE, db % TILE), wb)
        blocks_t = np.zeros_like(blocks)
        np.add.at(blocks_t, (sb // TILE - ns, db % TILE, sb % TILE), wb)
        rest = ~(in_strip | in_block)
        residual = residual_t = None
        if np.any(rest):
            residual = build_bcsr(src[rest], dst[rest], weight[rest], n_padded,
                                  max_band_factor=10**9)
            residual_t = transpose_bcsr(residual)
        return StripOperator(
            strip=jnp.asarray(strip.astype(dtype)),
            strip_t=jnp.asarray(strip_t.astype(dtype)),
            blocks=jnp.asarray(blocks.astype(dtype)),
            blocks_t=jnp.asarray(blocks_t.astype(dtype)),
            residual=residual,
            residual_t=residual_t,
            slot=slot,
        )

    s, d, w = src[in_slot], dst[in_slot], weight[in_slot]
    strip = np.zeros((t, slot, TILE), np.float32)
    np.add.at(strip, (d // TILE, s % slot, d % TILE), w)
    # block-diagonal transpose: edge (s → d) lands at column s, row d%slot
    strip_t = np.zeros_like(strip)
    np.add.at(strip_t, (s // TILE, d % slot, s % TILE), w)

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
    return StripOperator(
        strip=jnp.asarray(strip.astype(dtype)),
        strip_t=jnp.asarray(strip_t.astype(dtype)),
        blocks=None,
        blocks_t=None,
        residual=residual,
        residual_t=residual_t,
        slot=slot,
    )


K_TILES = 16  # tiles per grid step: amortizes the per-grid-step overhead that
# dominated the one-tile-per-step round-2 kernel (0.204 → 0.028-0.034 ms/iter
# on merged Mutagenicity; BASELINE.md round-2 table, scripts/bench_strip_blocked.py).
# K=16 and K=32 measure within noise of each other; 16 is shipped because it
# halves the per-step VMEM working set (strip block K·32·128·4B) and divides
# more tile counts evenly.


def _strip_kernel(k_tiles: int, slot: int):
    expand = TILE // slot

    def kernel(strip_ref, state_ref, out_ref):
        if expand > 1:
            col_group = jax.lax.broadcasted_iota(jnp.int32, (slot, TILE), 1) // slot
        for k in range(k_tiles):
            a = strip_ref[k]  # (slot, TILE)
            if expand > 1:
                parts = [a * (col_group == g_i).astype(a.dtype) for g_i in range(expand)]
                bd = jnp.concatenate(parts, axis=0)  # (TILE, TILE) block-diagonal
            else:  # slot == TILE: the strip IS the dense diagonal block
                bd = a
            x = state_ref[:, k * TILE : (k + 1) * TILE]
            # cast the OPERATOR up to the state dtype (VPU work on VMEM-resident
            # data) rather than the state down: bf16 strips then halve HBM
            # operator bytes while the matmul runs the standard f32 MXU pass
            # (itself one-pass bf16 operands — numerically identical)
            if bd.dtype != x.dtype:
                bd = bd.astype(x.dtype)
            out_ref[:, k * TILE : (k + 1) * TILE] = jnp.dot(
                x, bd, preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)

    return kernel


def _strip_matmul(state_t: jax.Array, strip: jax.Array, slot: int = SLOT) -> jax.Array:
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
        t = t_pad
    if t * TILE != n:
        state_t = jnp.pad(state_t, ((0, 0), (0, t * TILE - n)))
    out = pl.pallas_call(
        _strip_kernel(k_tiles, slot),
        out_shape=jax.ShapeDtypeStruct((d_sub, t * TILE), state_t.dtype),
        grid=(t // k_tiles,),
        in_specs=[
            pl.BlockSpec((k_tiles, slot, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_sub, k_tiles * TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_sub, k_tiles * TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(strip, state_t)
    return out[:, :n]


@partial(jax.custom_vjp, nondiff_argnums=())
def strip_aggregate(state: jax.Array, op: StripOperator) -> jax.Array:
    """``Adjᵀ·state`` (incoming aggregation) through the compact strips +
    BCSR residual.  state (N, d) row-major at the interface; transposed
    internally."""
    return _strip_forward(state, op)


def _mixed_kernel(k_tiles: int, slot: int, ns: int):
    """Region-switched kernel: grid steps [0, ns) expand compact strips,
    steps [ns, ·) run full diagonal blocks — one launch for both formats."""
    expand = TILE // slot

    def kernel(strip_ref, blocks_ref, state_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i < ns)
        def _():
            col_group = jax.lax.broadcasted_iota(jnp.int32, (slot, TILE), 1) // slot
            for k in range(k_tiles):
                a = strip_ref[k]
                parts = [a * (col_group == g_i).astype(a.dtype) for g_i in range(expand)]
                bd = jnp.concatenate(parts, axis=0)
                x = state_ref[:, k * TILE : (k + 1) * TILE]
                if bd.dtype != x.dtype:
                    bd = bd.astype(x.dtype)
                out_ref[:, k * TILE : (k + 1) * TILE] = jnp.dot(
                    x, bd, preferred_element_type=jnp.float32
                ).astype(out_ref.dtype)

        @pl.when(i >= ns)
        def _():
            for k in range(k_tiles):
                bd = blocks_ref[k]
                x = state_ref[:, k * TILE : (k + 1) * TILE]
                if bd.dtype != x.dtype:
                    bd = bd.astype(x.dtype)
                out_ref[:, k * TILE : (k + 1) * TILE] = jnp.dot(
                    x, bd, preferred_element_type=jnp.float32
                ).astype(out_ref.dtype)

    return kernel


def _strip_matmul_mixed(
    state_t: jax.Array, strip: jax.Array, blocks: jax.Array, slot: int
) -> jax.Array:
    """Mixed-format aggregation: strips over tiles [0, Ts), full diagonal
    blocks over [Ts, Ts+Tb).  Both region sizes are K_TILES multiples (the
    layout guarantees it); the per-region input index maps pin the *other*
    operand's block index so it is fetched once, not per step."""
    d_sub, n = state_t.shape
    ts, tb = strip.shape[0], blocks.shape[0]
    if ts == 0:
        out = _strip_matmul(state_t, blocks, TILE)
        return out
    k = min(K_TILES, ts)
    assert ts % k == 0 and tb % k == 0, (ts, tb, k)
    t = ts + tb
    if t * TILE != n:
        state_t = jnp.pad(state_t, ((0, 0), (0, t * TILE - n)))
    ns = ts // k
    nb = tb // k
    out = pl.pallas_call(
        _mixed_kernel(k, slot, ns),
        out_shape=jax.ShapeDtypeStruct((d_sub, t * TILE), state_t.dtype),
        grid=(ns + nb,),
        in_specs=[
            pl.BlockSpec(
                (k, slot, TILE), lambda i: (jnp.minimum(i, ns - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, TILE, TILE), lambda i: (jnp.maximum(i - ns, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((d_sub, k * TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_sub, k * TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(strip, blocks, state_t)
    return out[:, :n]


def _diag_matmul(state_t: jax.Array, op: StripOperator, transpose: bool) -> jax.Array:
    """The block-diagonal part of the operator (mixed or single-format)."""
    strip = op.strip_t if transpose else op.strip
    if op.blocks is not None:
        blocks = op.blocks_t if transpose else op.blocks
        return _strip_matmul_mixed(state_t, strip, blocks, op.slot)
    return _strip_matmul(state_t, strip, op.slot)


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
