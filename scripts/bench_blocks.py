"""Exploration bench: block-layout strategies for the convergence-loop SpMM.

Round-1 finding (BASELINE.md): the 128x128 BCSR einsum runs at the HBM
roofline, but on 30-node molecules only ~1.6% of block bytes are real edges.
Effective edges/s scales directly with occupancy, so this script measures the
aggregation op alone (Adjacency-transpose times state, the hot op of
GNN/Models/GNN.py:228's loop) under candidate layouts:

  bcsr128       round-1 production path (tile 128 packing + 128x128 blocks)
  bcsrT         square T x T blocks with T-node graph packing, T in {16,32,64}
  diagT         special case: packing guarantees src_tile == dst_tile ==
                arange(B) for molecule batches -> plain batched einsum,
                no gather, no segment-sum
  rect 8x128    sublane-aligned rectangular blocks (zero physical padding)

Each candidate is timed with K repetitions inside one jit (threaded data
dependence so XLA cannot hoist), one device sync, minus a measured sync
floor — the only honest recipe on the tunneled TPU runtime.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gnnkeras_tpu.data.mutag import load_mutag
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.graph.packing import packed_node_positions
from gnnkeras_tpu.ops.segment import segment_sum

REPEATS = 200


def build_edges(tile: int):
    """Merged Mutagenicity, nodes packed into `tile`-node bins."""
    graphs = load_mutag()
    merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
    pos, n_rows = packed_node_positions(merged.graph_of_node, tile=tile)
    N = ((max(n_rows, 1) + 127) // 128) * 128  # keep 128-alignment for any tile
    src = pos[merged.arcs[:, 0].astype(np.int64)]
    dst = pos[merged.arcs[:, 1].astype(np.int64)]
    w = merged.arcnode_weight.astype(np.float64)
    rng = np.random.default_rng(0)
    state = rng.standard_normal((N, 14)).astype(np.float32)
    return src, dst, w, N, state, merged.arcs.shape[0]


def build_blocks(src, dst, w, N, tr, tc):
    """Rectangular (tr x tc) blocks: rows = src within tile, cols = dst."""
    n_src_tiles, n_dst_tiles = N // tr, N // tc
    bi, bj = src // tr, dst // tc
    key = bi * n_dst_tiles + bj
    uniq, inv = np.unique(key, return_inverse=True)
    order = np.argsort(uniq % n_dst_tiles, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(uniq))
    blocks = np.zeros((len(uniq), tr, tc), dtype=np.float32)
    np.add.at(blocks, (rank[inv], src % tr, dst % tc), w)
    uniq = uniq[order]
    return (
        blocks,
        (uniq // n_dst_tiles).astype(np.int32),
        (uniq % n_dst_tiles).astype(np.int32),
        n_src_tiles,
        n_dst_tiles,
    )


def agg_bcsr(blocks, src_tile, dst_tile, n_src_tiles, n_dst_tiles, tr, tc):
    def f(state, blocks, src_tile, dst_tile):
        d = state.shape[1]
        tiles = state.astype(blocks.dtype).reshape(n_src_tiles, tr, d)
        gathered = tiles[src_tile]
        prod = jnp.einsum("bij,bid->bjd", blocks, gathered, preferred_element_type=jnp.float32)
        agg = segment_sum(prod, dst_tile, n_dst_tiles)
        return agg.reshape(n_dst_tiles * tc, d).astype(state.dtype)

    return f, (blocks, src_tile, dst_tile)


def agg_diag(blocks, n_tiles, t):
    """src_tile == dst_tile == arange: one batched einsum, nothing else."""

    def f(state, blocks):
        d = state.shape[1]
        tiles = state.astype(blocks.dtype).reshape(n_tiles, t, d)
        out = jnp.einsum("bij,bid->bjd", blocks, tiles, preferred_element_type=jnp.float32)
        return out.reshape(n_tiles * t, d).astype(state.dtype)

    return f, (blocks,)


def timeit(f, state, operands, n_arcs, label):
    operands = tuple(jnp.asarray(o) for o in operands)
    state = jnp.asarray(state)

    @jax.jit
    def rep(state, operands):
        def body(i, carry):
            acc, s = carry
            out = f(s + acc * 1e-30, *operands)
            return (acc + out[0, 0] * 1e-30, s)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), state))

    acc, _ = rep(state, operands)
    _ = float(acc)
    probe = jax.jit(lambda x: jnp.sum(x))
    _ = float(probe(state))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(probe(state))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc, _ = rep(state, operands)
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - floor, 1e-9) / REPEATS
    block_mb = sum(o.size * o.dtype.itemsize for o in operands) / 1e6
    print(
        f"{label:28s} {dt*1e3:8.3f} ms/iter  {n_arcs/dt/1e6:9.1f} M edges/s  "
        f"operands {block_mb:8.1f} MB  ({block_mb/dt/1e3:6.1f} GB/s on operands)"
    )
    return n_arcs / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    results = {}

    def run(label, fn):
        if args.only and args.only not in label:
            return
        results[label] = fn()

    # --- round-1 production path -------------------------------------------
    src, dst, w, N, state, n_arcs = build_edges(128)
    bl = build_blocks(src, dst, w, N, 128, 128)
    f, ops = agg_bcsr(*bl, 128, 128)
    run("bcsr128_f32", lambda f=f, ops=ops, s=state: timeit(f, s, ops, n_arcs, "bcsr128_f32"))

    # --- square small tiles -------------------------------------------------
    for t in (16, 32, 64):
        src, dst, w, N, state, n_arcs = build_edges(t)
        bl = build_blocks(src, dst, w, N, t, t)
        f, ops = agg_bcsr(*bl, t, t)
        run(f"bcsr{t}_f32", lambda f=f, ops=ops, s=state: timeit(f, s, ops, n_arcs, f"bcsr{t}_f32"))
        f16, ops16 = agg_bcsr(bl[0].astype(jnp.bfloat16), *bl[1:], t, t)
        run(f"bcsr{t}_bf16", lambda f=f16, ops=ops16, s=state: timeit(f, s, ops, n_arcs, f"bcsr{t}_bf16"))
        # diag special case: check if packing produced pure-diagonal blocks
        blocks, st, dt_, nst, ndt = bl
        if len(st) == nst and np.all(st == np.arange(nst)) and np.all(dt_ == np.arange(ndt)):
            fd, opsd = agg_diag(blocks, nst, t)
            run(f"diag{t}_f32", lambda f=fd, ops=opsd, s=state: timeit(f, s, ops, n_arcs, f"diag{t}_f32"))
            fd16, opsd16 = agg_diag(blocks.astype(jnp.bfloat16), nst, t)
            run(f"diag{t}_bf16", lambda f=fd16, ops=opsd16, s=state: timeit(f, s, ops, n_arcs, f"diag{t}_bf16"))
        else:
            print(f"tile {t}: not pure diagonal ({len(st)} blocks vs {nst} tiles)")

    # --- rectangular sublane-aligned ---------------------------------------
    for tr, tc in ((8, 128), (32, 128), (128, 32), (8, 32)):
        src, dst, w, N, state, n_arcs = build_edges(min(tr, tc) if min(tr, tc) >= 16 else max(tr, tc))
        bl = build_blocks(src, dst, w, N, tr, tc)
        f, ops = agg_bcsr(*bl, tr, tc)
        run(f"rect{tr}x{tc}_f32", lambda f=f, ops=ops, s=state: timeit(f, s, ops, n_arcs, f"rect{tr}x{tc}_f32"))

    best = max(results, key=results.get) if results else None
    if best:
        print(f"\nbest: {best} at {results[best]/1e6:.0f} M edges/s")


if __name__ == "__main__":
    main()


def bench_bf16_128():
    """Follow-up: bf16 128-blocks on the packed workload (is it bandwidth-bound?)."""
    src, dst, w, N, state, n_arcs = build_edges(128)
    bl = build_blocks(src, dst, w, N, 128, 128)
    f, ops = agg_bcsr(bl[0].astype(jnp.bfloat16), *bl[1:], 128, 128)
    timeit(f, state, ops, n_arcs, "bcsr128_bf16")
    # and with bf16 state end-to-end
    f2, ops2 = agg_bcsr(bl[0].astype(jnp.bfloat16), *bl[1:], 128, 128)
    timeit(f2, state.astype(jnp.bfloat16), ops2, n_arcs, "bcsr128_bf16_state")
