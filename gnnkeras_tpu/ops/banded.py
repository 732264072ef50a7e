"""Banded aggregation: block-diagonal decomposition of a banded operator.

Large banded graphs (road networks, meshes, sequence graphs — the
context-parallel-analog workload) have BCSR blocks at a FEW distinct tile
offsets ``src_tile - dst_tile`` (band ≤ 128 → offsets {-1, 0, 1} plus a few
wraparound blocks).  Each offset's blocks form one dense block-DIAGONAL
operator in destination-tile space, so the aggregation decomposes into a
handful of diagonal products applied to tile-SHIFTED state:

    out[:, j·T:(j+1)·T]  =  Σ_o  state[:, (j+o)·T:(j+o+1)·T] @ B[(j+o) → j]

Each diagonal product is exactly the compact-strip Pallas kernel's
``slot == TILE`` case (ops/strip.py: K-blocked grid, int8 mask + per-column
scale storage, custom VJP), and the tile shift is a free XLA slice+pad on
the feature-major state.  Offsets too sparse to justify a full diagonal
(< ``min_fill`` of tiles, e.g. the wraparound corner blocks) ride a plain
BCSR residual.  Zero new kernel code — the decomposition routes the banded
workload onto the operator representation whose HBM read is int8.

Why not quantized BCSR (ops/bcsr.py QuantBcsr)?  Measured (BASELINE.md
round 4): the gather + per-block-product + segment-sum phase structure keeps
the naive quantized path at ~1.05x of the f32 einsum despite 4x fewer
operator bytes — the aux traffic and phase boundaries dominate.  The
diagonal decomposition has NO gather and NO segment-sum: each component is
one grid-sequential Pallas stream over contiguous blocks.

Reference semantics: this computes the same ``Adjacencyᵀ·state`` as
GNN/Models/GNN.py:228 — pure representation change, exactness tested.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnnkeras_tpu.ops.bcsr import BcsrMatrix, bcsr_aggregate_t, build_bcsr, transpose_bcsr
from gnnkeras_tpu.ops.strip import (
    TILE,
    StripFactorError,
    StripOperator,
    _finalize_strips,
    strip_aggregate_t,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["diags", "residual", "residual_t"],
    meta_fields=["offsets", "n_tiles"],
)
@dataclasses.dataclass(frozen=True)
class BandedOperator:
    """A tuple of per-offset dense-diagonal StripOperators plus the sparse
    remainder as BCSR.  ``offsets[i]`` is the tile shift of ``diags[i]``."""

    diags: Tuple[StripOperator, ...]
    residual: Optional[BcsrMatrix]
    residual_t: Optional[BcsrMatrix]
    offsets: Tuple[int, ...]
    n_tiles: int


def _dense_offsets_from(off, dst, t: int, min_fill: float) -> Tuple[int, ...]:
    """Offsets whose distinct-destination-tile occupancy reaches
    ``min_fill * t`` — one pass over unique (offset, dst_tile) pairs instead
    of one full-edge scan per distinct offset."""
    if len(off) == 0:
        return ()
    base = int(off.min())
    from gnnkeras_tpu import native

    pair = (off - base) * np.int64(t) + dst // TILE
    uniq = native.unique_i64(pair)
    per_off = np.bincount((uniq // t).astype(np.int64))
    return tuple(int(i) + base for i in np.flatnonzero(per_off >= min_fill * t))


def build_banded_operator(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    n_padded: int,
    dtype=np.int8,
    max_diagonals: int = 6,
    min_fill: float = 0.1,
    force_offsets: Optional[Tuple[int, ...]] = None,
    strict_int8: bool = False,
) -> Optional[BandedOperator]:
    """Host-side construction.  Returns None when fewer than one offset
    reaches ``min_fill`` tile occupancy (no band structure — use BCSR).
    ``force_offsets`` builds diagonals for exactly the given offsets (zero
    diagonals where a shard has no such edges) — the partitioned engine
    uses it so every device's operator shares ONE pytree structure.
    ``strict_int8`` returns None instead of degrading to bfloat16 when the
    int8 mask+scale factorization does not hold (``agg_dtype='auto'``: only
    take the quantized form when it is numerically exact)."""
    assert n_padded % TILE == 0
    t = n_padded // TILE
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float64)
    live = weight != 0
    src, dst, weight = src[live], dst[live], weight[live]

    off = src // TILE - dst // TILE
    if force_offsets is not None:
        dense_offs = [int(o) for o in force_offsets]
    else:
        dense_offs = list(_dense_offsets_from(off, dst, t, min_fill))
        if not dense_offs or len(dense_offs) > max_diagonals:
            return None

    diags = []
    in_diag = np.zeros(len(src), dtype=bool)
    for o in dense_offs:
        sel = off == o
        in_diag |= sel
        s, d, w = src[sel], dst[sel], weight[sel]
        j = d // TILE  # destination tile = diagonal index
        # pre-pad to a K_TILES multiple ONCE at build time (the kernel grid
        # blocks K tiles per step; a runtime pad would re-copy the operator
        # every call — the build_strip_operator convention)
        from gnnkeras_tpu.ops.strip import K_TILES

        t_pad = -(-t // K_TILES) * K_TILES
        strip = np.zeros((t_pad, TILE, TILE), np.float32)
        from gnnkeras_tpu import native

        native.scatter_add_3d(strip, j, s % TILE, d % TILE, w)
        # transposed diagonal (for the strip VJP): entry (j', d%T, s%T) at
        # the SOURCE tile j' = j + o — strip_aggregate_t's backward applies
        # strip_t as the same-diagonal product on the cotangent, and
        # banded_aggregate_t's outer shift transposes to the opposite
        # offset through autodiff of the slice/pad
        strip_t = np.transpose(strip, (0, 2, 1))
        try:
            s_arr, s_t_arr, s_scale = _finalize_strips(strip, strip_t, dtype)
        except StripFactorError as err:
            if strict_int8:
                return None  # auto mode: exact factorization or nothing
            import warnings

            warnings.warn(
                "int8 mask+scale banded storage does not apply: "
                f"{err}; storing the diagonals as dense bfloat16 instead",
                RuntimeWarning,
                stacklevel=2,
            )
            dtype = jnp.bfloat16  # subsequent diagonals stay bf16 too
            s_arr, s_t_arr, s_scale = _finalize_strips(strip, strip_t, dtype)
        diags.append(StripOperator(
            strip=s_arr, strip_t=s_t_arr, blocks=None, blocks_t=None,
            residual=None, residual_t=None, scale=s_scale, blocks_scale=None,
            slot=TILE,
        ))

    residual = residual_t = None
    if np.any(~in_diag):
        from gnnkeras_tpu.ops.bcsr import _MAX_BAND_FACTOR

        sr, dr, wr = src[~in_diag], dst[~in_diag], weight[~in_diag]
        # the remainder must stay block-THIN — a dense band plus a large
        # scattered remainder would otherwise materialize an unbounded
        # dense-block residual (the guard build_bcsr enforces for the
        # non-quantized path); decline so the caller falls back
        from gnnkeras_tpu import native

        n_res_blocks = len(native.unique_i64(sr // TILE * t + dr // TILE))
        if n_res_blocks > _MAX_BAND_FACTOR * t:
            return None
        residual = build_bcsr(sr, dr, wr, n_padded, max_band_factor=10**9)
        residual_t = transpose_bcsr(residual)

    return BandedOperator(
        diags=tuple(diags),
        residual=residual,
        residual_t=residual_t,
        offsets=tuple(dense_offs),
        n_tiles=t,
    )


def uniformize_residuals(bops):
    """Give every operator of a to-be-stacked list the SAME residual
    structure (present, one padded block count): absent residuals become the
    all-zero operator.  Required before ``tree_map(stack)`` across devices."""
    from gnnkeras_tpu.ops.bcsr import empty_bcsr, pad_bcsr

    have = [b.residual for b in bops if b.residual is not None]
    if not have:
        return bops
    need = max(int(r.blocks.shape[0]) for r in have)
    out = []
    for b in bops:
        if b.residual is None:
            r = empty_bcsr(b.n_tiles, b.n_tiles, need)
            rt = empty_bcsr(b.n_tiles, b.n_tiles, need)
        else:
            r, rt = pad_bcsr(b.residual, need), pad_bcsr(b.residual_t, need)
        out.append(dataclasses.replace(b, residual=r, residual_t=rt))
    return out


def dense_offsets(
    src, dst, weight, n_padded: int, min_fill: float = 0.1
) -> Tuple[int, ...]:
    """The tile offsets that would become diagonals (the detection half of
    ``build_banded_operator``) — lets the partitioned engine take the UNION
    over shards before forcing one offset set on every device."""
    t = n_padded // TILE
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    weight = np.asarray(weight, dtype=np.float64)
    live = weight != 0
    src, dst = src[live], dst[live]
    off = src // TILE - dst // TILE
    return _dense_offsets_from(off, dst, t, min_fill)


def _shift_tiles(state_t: jax.Array, o: int) -> jax.Array:
    """state shifted LEFT by ``o`` tiles on the lane axis (zero fill): the
    slice x with x[:, j·T:] = state[:, (j+o)·T:].  Autodiff of slice+pad is
    the opposite shift, which is exactly the transposed operator's need."""
    if o == 0:
        return state_t
    n = state_t.shape[1]
    k = abs(o) * TILE
    if o > 0:
        return jnp.pad(state_t[:, k:], ((0, 0), (0, k)))
    return jnp.pad(state_t[:, :n - k], ((0, 0), (k, 0)))


def banded_aggregate_t(state_t: jax.Array, bop: BandedOperator) -> jax.Array:
    """``Mᵀ·state`` on feature-major state through the diagonal
    decomposition.  Each component runs the strip kernel's dense-diagonal
    case (with that operator's own custom VJP); the residual runs the BCSR
    einsum (plain autodiff)."""
    out = None
    for o, sop in zip(bop.offsets, bop.diags):
        contrib = strip_aggregate_t(_shift_tiles(state_t, o), sop)
        out = contrib if out is None else out + contrib
    if bop.residual is not None:
        r = _banded_residual(state_t, bop)
        out = r if out is None else out + r
    return out


@jax.custom_vjp
def _banded_residual(state_t: jax.Array, bop: BandedOperator) -> jax.Array:
    return bcsr_aggregate_t(state_t, bop.residual)


def _banded_residual_fwd(state_t, bop):
    return bcsr_aggregate_t(state_t, bop.residual), (bop,)


def _banded_residual_bwd(res, ct):
    (bop,) = res
    return bcsr_aggregate_t(ct, bop.residual_t), None


_banded_residual.defvjp(_banded_residual_fwd, _banded_residual_bwd)


def banded_aggregate(state: jax.Array, bop: BandedOperator) -> jax.Array:
    """Row-major interface (transpose sandwich; the transposed engine is the
    intended consumer).  The transposed state's leading dim must be a
    sublane multiple (strip_aggregate_t's precondition) — pad and slice."""
    d = state.shape[1]
    d_pad = -(-d // 8) * 8
    st = state.T
    if d_pad != d:
        st = jnp.pad(st, ((0, d_pad - d), (0, 0)))
    return banded_aggregate_t(st, bop)[:d].T
