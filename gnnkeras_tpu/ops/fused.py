"""Fused whole-unfold Pallas kernel for tile-packed (block-diagonal) batches.

Under tile packing (graph/packing.py) every graph lives inside one 128-node
tile (or an exclusive aligned run), and — for molecule-scale datasets like
Mutagenicity — every edge is intra-tile, so the aggregation operator is
purely block-diagonal.  Each tile's entire convergence unfolding is then
independent of every other tile, and the WHOLE ``max_iteration``-step loop
fuses into a single kernel launch:

    per tile t, per iteration:
        agg   = A_tᵀ · s                      (one MXU pass, bf16×bf16→f32)
        s     = act(s·W_s + agg·W_a + const)  (two small MXU passes)

vs. the XLA path which re-reads the adjacency blocks from HBM every
iteration (the dominant bytes) and round-trips the state through HBM between
the aggregation einsum and the transition MLP.  BatchNorm (inference moments)
folds into the Dense weights ahead of time; the batch-constant
``Σ_neigh arc_labels`` contribution folds into ``const`` (see
models/gnn.py ``fold_transition``).  The kernel runs the MXU in bfloat16
with float32 accumulation — the TPU-native precision for matmuls (the f32
variant exists for exactness tests and costs ~3x the MXU passes).

Applicability (checked by ``build_fused_diag`` / the caller):
- every edge intra-tile (returns None otherwise → XLA path),
- inference mode (BatchNorm uses moving statistics),
- fixed trip count (state_threshold == 0 → exactly max_iteration steps),
- single-Dense state net (the reference starter architecture,
  /root/reference/starter.py:71-77); deeper stacks stay on the XLA path.

Reference semantics fused here: the ``convergence`` body of
GNN/Models/GNN.py:217-236 iterated by the while_loop at GNN.py:265.
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

TILE = 128

# Mosaic-safe activations: jax.nn.selu/elu use expm1, which has no Pallas
# TPU lowering — spell it with exp (abs error ≤ ~1.2e-7 near 0, well inside
# the kernel's bf16 compute noise).
_SELU_SCALE = 1.0507009873554805
_SELU_ALPHA = 1.6732632423543772

_ACTIVATIONS = {
    "selu": lambda x: _SELU_SCALE * jnp.where(x > 0, x, _SELU_ALPHA * (jnp.exp(x) - 1.0)),
    "relu": lambda x: jnp.maximum(x, 0.0),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "linear": lambda x: x,
}


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks"],
    meta_fields=["tile"],
)
@dataclasses.dataclass(frozen=True)
class FusedDiagOperator:
    """Dense diagonal aggregation blocks: ``blocks[t][i, j] = w(edge
    t·T+i → t·T+j)`` — one block per tile, every edge intra-tile."""

    blocks: jax.Array  # (T, TILE, TILE)
    tile: int


def build_fused_diag(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    n_padded: int,
    dtype=jnp.bfloat16,
    tile: int = TILE,
) -> Optional[FusedDiagOperator]:
    """Host-side construction.  Returns None when any edge crosses a tile
    boundary (the whole-unfold fusion needs tile-local aggregation)."""
    if n_padded % tile != 0:
        return None
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float64)
    live = weight != 0.0
    src, dst, weight = src[live], dst[live], weight[live]
    if np.any(src // tile != dst // tile):
        return None
    t = n_padded // tile
    # stored TRANSPOSED (rows = destination, cols = source): the kernel's
    # aggregation is then a plain ``blocks[t] @ state`` with the standard
    # (dim1, dim0) contraction — no per-iteration relayout on the MXU.
    blocks = np.zeros((t, tile, tile), np.float32)
    from gnnkeras_tpu import native

    native.scatter_add_3d(blocks, dst // tile, dst % tile, src % tile, weight)
    return FusedDiagOperator(blocks=jnp.asarray(blocks, dtype=dtype), tile=tile)


def _unfold_kernel(n_iter: int, activation: str, compute_dtype, b: int, tile: int):
    act = _ACTIVATIONS[activation]

    def kernel(blocks_ref, state_ref, const_ref, ws_ref, wa_ref, out_ref):
        ws = ws_ref[...]  # (d, h), compute_dtype
        wa = wa_ref[...]
        c = const_ref[...].astype(jnp.float32)  # (b·tile, h)
        s = state_ref[...].astype(jnp.float32)  # (b·tile, d)
        for _ in range(n_iter):
            sc = s.astype(compute_dtype)
            # per-tile Aᵀ·s (the operator is block-diagonal; blocks stored
            # pre-transposed) — the only dot that must stay per-tile
            agg = jnp.concatenate(
                [
                    jnp.dot(
                        blocks_ref[j],
                        sc[j * tile : (j + 1) * tile, :],
                        preferred_element_type=jnp.float32,
                    )
                    for j in range(b)
                ],
                axis=0,
            )  # (b·tile, d)
            # the transition is row-wise: batch its two small dots and the
            # activation across ALL b tiles of the step — b×(2 dots + act)
            # fill-latency-bound MXU passes collapse to 2 streaming passes
            # (row-identical math, exactness preserved)
            z = (
                jnp.dot(sc, ws, preferred_element_type=jnp.float32)
                + jnp.dot(agg.astype(compute_dtype), wa, preferred_element_type=jnp.float32)
                + c
            )
            s = act(z)
        out_ref[...] = s

    return kernel


def fused_unfold(
    state0: jax.Array,
    const_contrib: jax.Array,
    w_state: jax.Array,
    w_agg: jax.Array,
    op: FusedDiagOperator,
    n_iter: int,
    activation: str = "selu",
    tiles_per_step: int = 8,
) -> jax.Array:
    """Run ``n_iter`` fused transition iterations.

    state0 (N, d) f32; const_contrib (N, h) f32 — the batch-constant part of
    the pre-activation (folded BN shift + aggregated-arc-label contribution +
    bias); w_state (d, h) / w_agg (d, h) — BN-folded Dense weight rows for
    the state and neighbor-sum slices.  Returns the converged state (N, h);
    requires d == h (the state width is invariant across iterations).
    """
    n, d = state0.shape
    h = const_contrib.shape[1]
    assert d == h, "state width must be invariant across iterations"
    t = op.blocks.shape[0]
    assert n == t * op.tile
    compute_dtype = op.blocks.dtype
    b = tiles_per_step
    while t % b:
        b -= 1
    grid = (t // b,)

    kernel = _unfold_kernel(int(n_iter), activation, compute_dtype, b, op.tile)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h), state0.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, op.tile, op.tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b * op.tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b * op.tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b * op.tile, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(op.blocks, state0, const_contrib, w_state.astype(compute_dtype), w_agg.astype(compute_dtype))


# -----------------------------------------------------------------------------
# Transposed whole-unfold kernel: the round-3 production variant.
#
# The row-major kernel above pays the d=14→128 lane-padding tax on every MXU
# pass (aggregation dots are (128,128)@(128,14): 8/9 of the lanes idle), which
# is why it inverted vs XLA above ~16 tiles (BASELINE.md round-2 serving
# table).  The transposed variant carries state feature-major (d_pad, N) —
# the same layout the flagship's transposed unfold engine and the compact
# strip kernels use (ops/strip.py) — so the per-tile aggregation is a
# lane-full (d_pad,128)@(128,128) dot and the transition two (d_pad,d_pad)
# dots over k·128 lanes.  Blocks are stored src-rows × dst-cols (aggᵀ = sᵀ·A),
# the orientation build_strip_operator(slot=TILE) already produces.
# -----------------------------------------------------------------------------

D_SUB = 8  # sublane granularity for the transposed state

K_TILES = 16  # tiles per grid step (same blocking as ops/strip.py: amortizes
# per-grid-step overhead; build pre-pads the constant blocks so the runtime
# path is a pure pallas_call)


def build_fused_diag_t(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    n_padded: int,
    dtype=jnp.bfloat16,
    tile: int = TILE,
) -> Optional[FusedDiagOperator]:
    """Blocks for the TRANSPOSED whole-unfold kernel: src-rows × dst-cols
    (``agg_tᵀ = state_tᵀ · A_t`` per tile), pre-padded to a K_TILES multiple.
    Returns None when any edge crosses a tile boundary."""
    if n_padded % tile != 0:
        return None
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float64)
    live = weight != 0.0
    src, dst, weight = src[live], dst[live], weight[live]
    if np.any(src // tile != dst // tile):
        return None
    t = n_padded // tile
    t_pad = -(-t // min(K_TILES, t)) * min(K_TILES, t) if t else 1
    blocks = np.zeros((t_pad, tile, tile), np.float32)
    from gnnkeras_tpu import native

    native.scatter_add_3d(blocks, dst // tile, src % tile, dst % tile, weight)
    return FusedDiagOperator(blocks=jnp.asarray(blocks, dtype=dtype), tile=tile)


def _unfold_kernel_t(n_iter: int, activation: str, k_tiles: int, tile: int):
    act = _ACTIVATIONS[activation]

    def kernel(blocks_ref, state_ref, const_ref, ws_ref, wa_ref, out_ref):
        ws = ws_ref[...].astype(jnp.float32)  # (d_pad, d_pad) = W_sᵀ
        wa = wa_ref[...].astype(jnp.float32)
        c = const_ref[...].astype(jnp.float32)  # (d_pad, k·tile)
        s = state_ref[...].astype(jnp.float32)
        for _ in range(n_iter):
            # per-tile sᵀ·A (blocks stored src-rows × dst-cols): lane-full
            # (d_pad, tile)@(tile, tile) MXU passes
            parts = []
            for j in range(k_tiles):
                a = blocks_ref[j]
                x = s[:, j * tile : (j + 1) * tile]
                if a.dtype != x.dtype:
                    a = a.astype(x.dtype)
                parts.append(jnp.dot(x, a, preferred_element_type=jnp.float32))
            agg = jnp.concatenate(parts, axis=1)
            # transition zᵀ = W_sᵀ·sᵀ + W_aᵀ·aggᵀ + cᵀ over all k·tile lanes
            s = act(
                jnp.dot(ws, s, preferred_element_type=jnp.float32)
                + jnp.dot(wa, agg, preferred_element_type=jnp.float32)
                + c
            )
        out_ref[...] = s.astype(out_ref.dtype)

    return kernel


def fused_unfold_t(
    state0_t: jax.Array,
    const_t: jax.Array,
    w_state: jax.Array,
    w_agg: jax.Array,
    op: FusedDiagOperator,
    n_iter: int,
    activation: str = "selu",
    k_tiles: int = K_TILES,
) -> jax.Array:
    """Transposed whole-unfold: state0_t / const_t are (d_pad, N)
    feature-major with zero pad rows; w_state / w_agg are the ROW-MAJOR
    (d, h) Dense weights (transposed + zero-padded to (d_pad, d_pad) here —
    the zero pad COLUMNS guarantee pad rows of the state never leak into real
    rows, whatever the activation maps 0 to).  Returns the converged
    (d_pad, N) state; the caller slices rows [:h] after transposing."""
    d_pad, n = state0_t.shape
    d, h = w_state.shape
    assert d == h, "state width must be invariant across iterations"
    assert d_pad % D_SUB == 0 and d_pad >= d
    t = op.blocks.shape[0]
    k = min(k_tiles, t)
    if t % k:  # hand-built operator; build_fused_diag_t pre-pads
        t_pad = -(-t // k) * k
        op = FusedDiagOperator(
            blocks=jnp.concatenate(
                [op.blocks, jnp.zeros((t_pad - t, op.tile, op.tile), op.blocks.dtype)]
            ),
            tile=op.tile,
        )
        t = t_pad
    if t * op.tile != n:
        pad = t * op.tile - n
        state0_t = jnp.pad(state0_t, ((0, 0), (0, pad)))
        const_t = jnp.pad(const_t, ((0, 0), (0, pad)))
    pad_w = lambda w: jnp.pad(w.T, ((0, d_pad - h), (0, d_pad - d)))
    out = pl.pallas_call(
        _unfold_kernel_t(int(n_iter), activation, k, op.tile),
        out_shape=jax.ShapeDtypeStruct((d_pad, t * op.tile), state0_t.dtype),
        grid=(t // k,),
        in_specs=[
            pl.BlockSpec((k, op.tile, op.tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, k * op.tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, k * op.tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_pad, k * op.tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(op.blocks, state0_t, const_t, pad_w(w_state), pad_w(w_agg))
    return out[:, :n]
