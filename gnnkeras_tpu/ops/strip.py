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
    data_fields=["strip", "strip_t", "residual", "residual_t"],
    meta_fields=["slot"],
)
@dataclasses.dataclass(frozen=True)
class StripOperator:
    """Within-slot compact strips (+ transposes for the VJP) and the
    cross-slot BCSR residual.  ``slot`` is the sub-slot width: 32/64 store
    the within-slot block diagonal compactly ((T, slot, TILE) strips, the
    kernel expands in VMEM); ``slot == TILE`` degenerates to plain dense
    diagonal blocks (no expansion, no compaction)."""

    strip: jax.Array  # (T, slot, TILE)
    strip_t: jax.Array  # (T, slot, TILE): per-slot transposed blocks
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
) -> StripOperator:
    """Host-side construction over slot-packed node positions (every graph
    ≤ ``slot`` nodes lives inside one slot; larger graphs produce residual
    edges).  ``dtype`` (float32/bfloat16) is the strip storage type — the
    kernel accumulates in f32 either way, and on the MXU the default f32
    matmul precision is already one-pass bf16 operands (BASELINE.md)."""
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
            out_ref[:, k * TILE : (k + 1) * TILE] = jnp.dot(
                x.astype(bd.dtype), bd, preferred_element_type=jnp.float32
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


def _strip_forward(state: jax.Array, op: StripOperator) -> jax.Array:
    n, d = state.shape
    d_pad = -(-d // D_SUB) * D_SUB
    state_t = jnp.pad(state, ((0, 0), (0, d_pad - d))).T  # (d_pad, N)
    out_t = _strip_matmul(state_t, op.strip, op.slot)
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
    dstate_t = _strip_matmul(ct_t, op.strip_t, op.slot)
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
    out = _strip_matmul(state_t, op.strip, op.slot)
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
    dstate_t = _strip_matmul(ct_t, op.strip_t, op.slot)
    if op.residual_t is not None:
        from gnnkeras_tpu.ops.bcsr import bcsr_aggregate_t

        dstate_t = dstate_t + bcsr_aggregate_t(ct_t, op.residual_t)
    return dstate_t, None


strip_aggregate_t.defvjp(_strip_t_fwd, _strip_t_bwd)
