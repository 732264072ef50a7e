"""Experiment: 64-slot compact strips, row-major state, K-blocked grid.

Design (follows bench_strip_blocked.py's K-blocking win, fixing its two
integration blockers):

- **Row-major state**: per tile, ``out_tile(128,d) = BD_T(128,128) @
  x_tile(128,d)`` — the compact strip stores the TRANSPOSED block-diagonal
  (cm[d%64, s%128] = w(s→d)), expanded in VMEM with 2 lane-masked groups.
  No state transposes anywhere; the MXU sees M=128 like the production
  einsum.
- **SLOT=64 packing**: graphs ≤64 nodes first-fit into 64-slots (2/tile);
  65..128-node graphs own one full aligned 128-tile (their edges go to the
  BCSR residual, as do >128-node spanning graphs).  Mutagenicity leaves only
  ~12% of arcs in the residual (vs 52% at SLOT=32).

Measures the strip kernel (K sweep, f32/bf16), the residual einsum, and the
production 128x128 einsum on the same workload.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts.bench_pallas_compact import timeit
from gnnkeras_tpu.data.mutag import load_mutag
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.ops.bcsr import bcsr_aggregate, build_bcsr

TILE = 128
SLOT = 64


def pack_slot64(sizes: np.ndarray):
    """starts per graph: ≤SLOT first-fit into SLOT bins; SLOT<s≤TILE own a
    full aligned tile; >TILE aligned exclusive runs."""
    order = np.argsort(-sizes, kind="stable")
    starts = np.zeros(len(sizes), np.int64)
    bins = []  # [free, next_off] per open 64-slot
    n_tiles = 0
    for g in order:
        s = int(sizes[g])
        if s > TILE:
            full = -(-s // TILE)
            starts[g] = n_tiles * TILE
            n_tiles += full
        elif s > SLOT:
            starts[g] = n_tiles * TILE
            n_tiles += 1
        else:
            placed = False
            for b in bins:
                if b[0] >= s:
                    starts[g] = b[1]
                    b[1] += s
                    b[0] -= s
                    placed = True
                    break
            if not placed:
                # open a new tile = two fresh slots
                base = n_tiles * TILE
                starts[g] = base
                bins.append([SLOT - s, base + s])
                bins.append([SLOT, base + SLOT])
                n_tiles += 1
    return starts, n_tiles * TILE


def _kernel(k_tiles: int, d: int):
    def kernel(strip_ref, state_ref, out_ref):
        col_group = jax.lax.broadcasted_iota(jnp.int32, (SLOT, TILE), 1) // SLOT
        for k in range(k_tiles):
            cm = strip_ref[k]  # (SLOT, TILE) transposed-compact
            bd_t = jnp.concatenate(
                [cm * (col_group == g).astype(cm.dtype) for g in range(TILE // SLOT)], axis=0
            )  # (TILE, TILE)
            x = state_ref[pl.ds(k * TILE, TILE), :]
            out_ref[pl.ds(k * TILE, TILE), :] = jnp.dot(
                bd_t, x.astype(bd_t.dtype), preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)

    return kernel


def strip64_aggregate(state: jax.Array, strip: jax.Array, k_tiles: int) -> jax.Array:
    n, d = state.shape
    t = strip.shape[0]
    assert n == t * TILE and t % k_tiles == 0, (n, t, k_tiles)
    return pl.pallas_call(
        _kernel(k_tiles, d),
        out_shape=jax.ShapeDtypeStruct((n, d), state.dtype),
        grid=(t // k_tiles,),
        in_specs=[
            pl.BlockSpec((k_tiles, SLOT, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tiles * TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_tiles * TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(strip, state)


def main():
    graphs = load_mutag()
    merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
    g_of_n = merged.graph_of_node.astype(np.int64)
    sizes = np.bincount(g_of_n)
    starts, n_pad = pack_slot64(sizes)
    # rank within graph
    first = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    pos = starts[g_of_n] + (np.arange(len(g_of_n)) - first[g_of_n])
    N = n_pad
    t = N // TILE
    src = pos[merged.arcs[:, 0].astype(np.int64)]
    dst = pos[merged.arcs[:, 1].astype(np.int64)]
    w = merged.arcnode_weight.astype(np.float64)

    in_slot = (src // SLOT) == (dst // SLOT)
    print(f"N={N} T={t} edges={len(src)} in-slot={in_slot.mean():.3f}")

    strip = np.zeros((t, SLOT, TILE), np.float32)
    s_, d_, w_ = src[in_slot], dst[in_slot], w[in_slot]
    np.add.at(strip, (d_ // TILE, d_ % SLOT, s_ % TILE), w_)

    sr, dr, wr = src[~in_slot], dst[~in_slot], w[~in_slot]
    residual = build_bcsr(sr, dr, wr, N, max_band_factor=10**9)
    print(f"residual blocks: {residual.blocks.shape[0]} ({residual.blocks.nbytes/1e6:.1f} MB)"
          f" vs full-block {t} tiles ({t*TILE*TILE*4/1e6:.1f} MB), strip {strip.nbytes/1e6:.1f} MB")

    d = 14
    rng = np.random.default_rng(0)
    state = rng.standard_normal((N, d)).astype(np.float32)
    n_edges = len(src)

    # correctness: strip + residual == full aggregation
    ref = np.zeros((N, d), np.float32)
    np.add.at(ref, dst, state[src] * w[:, None].astype(np.float32))
    t_c = ((t + 7) // 8) * 8
    sp_c = np.zeros((t_c, SLOT, TILE), np.float32)
    sp_c[:t] = strip
    st_c = np.zeros((t_c * TILE, d), np.float32)
    st_c[:N] = state
    got = np.asarray(strip64_aggregate(jnp.asarray(st_c), jnp.asarray(sp_c), 8))[:N]
    got = got + np.asarray(bcsr_aggregate(jnp.asarray(state), residual))
    print(f"strip64+residual correctness: max err {np.max(np.abs(got - ref)):.2e} "
          f"(scale {np.abs(ref).max():.2e})")

    # production einsum on the same packing (full diagonal blocks)
    full = build_bcsr(src, dst, w, N, max_band_factor=10**9)
    timeit(lambda st, m=full: bcsr_aggregate(st, m), (state,), n_edges, "prod einsum (all blocks)")
    timeit(lambda st, m=residual: bcsr_aggregate(st, m), (state,), n_edges, "residual einsum alone")

    for k in (4, 8, 16, 32):
        t_pad = ((t + k - 1) // k) * k
        sp = np.zeros((t_pad, SLOT, TILE), np.float32)
        sp[:t] = strip
        stp = np.zeros((t_pad * TILE, d), np.float32)
        stp[:N] = state
        timeit(lambda st, s, k=k: strip64_aggregate(st, s, k), (stp, sp), n_edges, f"strip64_f32 K={k}")
        timeit(lambda st, s, k=k: strip64_aggregate(st, s, k), (stp, sp.astype(jnp.bfloat16)),
               n_edges, f"strip64_bf16 K={k}")

    # combined: strip + residual in one jitted fn (the production shape)
    k = 16
    t_pad = ((t + k - 1) // k) * k
    sp = jnp.asarray(np.concatenate([strip, np.zeros((t_pad - t, SLOT, TILE), np.float32)]))
    stp = np.zeros((t_pad * TILE, d), np.float32)
    stp[:N] = state

    def combined(st, s=sp, m=residual):
        out = strip64_aggregate(st, s, k)
        return out.at[:N].add(bcsr_aggregate(st[:N], m))

    timeit(combined, (stp,), n_edges, f"strip64+residual K={k}")




# --- packed-lane variant: state rows pack 8 nodes x 16 features (dense lanes),
# un/re-packed by in-kernel reshapes (free XLA reshape at the boundary) -------

def _packed_kernel(k_tiles: int, d_pad: int):
    per_tile_rows = TILE * d_pad // 128  # rows of the packed layout per tile

    def kernel(strip_ref, state_ref, out_ref):
        col_group = jax.lax.broadcasted_iota(jnp.int32, (SLOT, TILE), 1) // SLOT
        for k in range(k_tiles):
            cm = strip_ref[k]
            bd_t = jnp.concatenate(
                [cm * (col_group == g).astype(cm.dtype) for g in range(TILE // SLOT)], axis=0
            )
            xp = state_ref[pl.ds(k * per_tile_rows, per_tile_rows), :]
            x = xp.reshape(TILE, d_pad)
            y = jnp.dot(bd_t, x.astype(bd_t.dtype), preferred_element_type=jnp.float32)
            out_ref[pl.ds(k * per_tile_rows, per_tile_rows), :] = (
                y.astype(out_ref.dtype).reshape(per_tile_rows, 128)
            )

    return kernel


def packed_aggregate(state_p: jax.Array, strip: jax.Array, k_tiles: int, d_pad: int) -> jax.Array:
    rows = state_p.shape[0]
    t = strip.shape[0]
    per_tile_rows = TILE * d_pad // 128
    assert rows == t * per_tile_rows and t % k_tiles == 0
    return pl.pallas_call(
        _packed_kernel(k_tiles, d_pad),
        out_shape=jax.ShapeDtypeStruct((rows, 128), state_p.dtype),
        grid=(t // k_tiles,),
        in_specs=[
            pl.BlockSpec((k_tiles, SLOT, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tiles * per_tile_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_tiles * per_tile_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(strip, state_p)


def main_packed():
    graphs = load_mutag()
    merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
    g_of_n = merged.graph_of_node.astype(np.int64)
    sizes = np.bincount(g_of_n)
    starts, n_pad = pack_slot64(sizes)
    first = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    pos = starts[g_of_n] + (np.arange(len(g_of_n)) - first[g_of_n])
    N = n_pad
    t = N // TILE
    src = pos[merged.arcs[:, 0].astype(np.int64)]
    dst = pos[merged.arcs[:, 1].astype(np.int64)]
    w = merged.arcnode_weight.astype(np.float64)
    in_slot = (src // SLOT) == (dst // SLOT)
    strip = np.zeros((t, SLOT, TILE), np.float32)
    s_, d_, w_ = src[in_slot], dst[in_slot], w[in_slot]
    np.add.at(strip, (d_ // TILE, d_ % SLOT, s_ % TILE), w_)

    d, d_pad = 14, 16
    rng = np.random.default_rng(0)
    state = rng.standard_normal((N, d)).astype(np.float32)
    n_edges = int(in_slot.sum())

    # correctness
    ref = np.zeros((N, d), np.float32)
    np.add.at(ref, d_, (state[s_] * w_[:, None]).astype(np.float32))
    k0 = 8
    t_c = ((t + k0 - 1) // k0) * k0
    sp = np.zeros((t_c, SLOT, TILE), np.float32)
    sp[:t] = strip
    stp = np.zeros((t_c * TILE, d_pad), np.float32)
    stp[:N, :d] = state
    state_packed = stp.reshape(-1, 128)
    got = np.asarray(packed_aggregate(jnp.asarray(state_packed), jnp.asarray(sp), k0, d_pad))
    got = got.reshape(-1, d_pad)[:N, :d]
    print(f"packed correctness: max err {np.max(np.abs(got - ref)):.2e}")

    for k in (8, 16, 32):
        t_p = ((t + k - 1) // k) * k
        sp = np.zeros((t_p, SLOT, TILE), np.float32)
        sp[:t] = strip
        stp = np.zeros((t_p * TILE, d_pad), np.float32)
        stp[:N, :d] = state
        spk = stp.reshape(-1, 128)
        timeit(lambda st, s, k=k: packed_aggregate(st, s, k, d_pad), (spk, sp), n_edges,
               f"packed_f32 K={k}")
        timeit(lambda st, s, k=k: packed_aggregate(st, s, k, d_pad), (spk, sp.astype(jnp.bfloat16)),
               n_edges, f"packed_bf16 K={k}")


if __name__ == "__main__":
    # single entry point: PACKED=1 runs the packed-lane variant instead of
    # (not in addition to) the row-major benchmark
    if os.environ.get("PACKED"):
        main_packed()
    else:
        main()
