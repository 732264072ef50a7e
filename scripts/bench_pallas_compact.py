"""Experiment: compact-strip Pallas aggregation kernel.

Layout: graphs packed into 32-node sub-slots of 128-node tiles; within-slot
edges make each tile's adjacency block-diagonal with four 32x32 blocks,
stored COMPACT as a (T, 32, 128) strip (strip[t, i, j] = edge weight
32*(j//32)+i -> j).  The kernel expands the strip to the (128,128)
block-diagonal in VMEM with four lane-masked sublane strips (no shifts) and
runs one 128-contraction MXU matmul per tile against the TRANSPOSED state
(d in sublanes: no lane padding anywhere).

Measures f32 and bf16-strip variants against the production 128x128 einsum,
plus the storage cost of a (N, 14) f32 array (is HBM lane-padded?).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnnkeras_tpu.data.mutag import load_mutag
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.graph.packing import packed_node_positions
from gnnkeras_tpu.ops.segment import segment_sum

REPEATS = 200
SLOT = 32
TILE = 128


def _strip_kernel(d_sub: int):
    def kernel(strip_ref, state_ref, out_ref):
        a = strip_ref[0]  # (SLOT, TILE)
        col_group = jax.lax.broadcasted_iota(jnp.int32, (SLOT, TILE), 1) // SLOT
        parts = [a * (col_group == g_i).astype(a.dtype) for g_i in range(TILE // SLOT)]
        bd = jnp.concatenate(parts, axis=0)  # (TILE, TILE) block-diagonal
        x = state_ref[...]
        out_ref[...] = jnp.dot(
            x.astype(bd.dtype), bd, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)

    return kernel


def strip_aggregate(state_t: jax.Array, strip: jax.Array) -> jax.Array:
    """state_t (d_sub, N) x strip (T, SLOT, TILE) -> (d_sub, N)."""
    d_sub, n = state_t.shape
    t = strip.shape[0]
    assert n == t * TILE
    return pl.pallas_call(
        _strip_kernel(d_sub),
        out_shape=jax.ShapeDtypeStruct((d_sub, n), state_t.dtype),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, SLOT, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_sub, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_sub, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(strip, state_t)


def build():
    graphs = load_mutag()
    merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
    pos, n_rows = packed_node_positions(merged.graph_of_node, tile=SLOT)
    N = ((n_rows + TILE - 1) // TILE) * TILE
    src = pos[merged.arcs[:, 0].astype(np.int64)]
    dst = pos[merged.arcs[:, 1].astype(np.int64)]
    w = merged.arcnode_weight.astype(np.float64)

    in_slot = (src // SLOT) == (dst // SLOT)
    print(f"N={N} T={N // TILE} edges={len(src)} in-slot={in_slot.mean():.3f}")

    strip = np.zeros((N // TILE, SLOT, TILE), np.float32)
    s, d_, ww = src[in_slot], dst[in_slot], w[in_slot]
    np.add.at(strip, (d_ // TILE, s % SLOT, d_ % TILE), ww)
    return strip, N, src, dst, w, in_slot


def timeit(f, args, n_edges, label):
    args = tuple(jnp.asarray(a) for a in args)

    @jax.jit
    def rep(args):
        def body(i, carry):
            acc, a0 = carry
            out = f(a0 + acc * 1e-30, *args[1:])
            return (acc + out.ravel()[0] * 1e-30, a0)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), args[0]))

    acc, _ = rep(args)
    _ = float(acc)
    probe = jax.jit(lambda x: jnp.sum(x.ravel()[:8]))
    _ = float(probe(args[0]))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(probe(args[0]))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc, _ = rep(args)
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - floor, 1e-9) / REPEATS
    print(f"{label:24s} {dt*1e3:8.3f} ms/iter  {n_edges/dt/1e6:9.1f} M edges/s")
    return dt


def main():
    strip, N, src, dst, w, in_slot = build()
    d = 14
    d_sub = 16  # sublane-pad the feature dim
    rng = np.random.default_rng(0)
    state_t = rng.standard_normal((d_sub, N)).astype(np.float32)
    state_t[d:] = 0.0
    n_edges = int(in_slot.sum())

    # correctness vs dense reference (small slice)
    ref = np.zeros((d_sub, N), np.float32)
    s_, d2, w2 = src[in_slot], dst[in_slot], w[in_slot]
    np.add.at(ref.T, d2, (state_t[:, s_] * w2).T)
    got = np.asarray(strip_aggregate(jnp.asarray(state_t), jnp.asarray(strip)))
    err = np.max(np.abs(got - ref))
    print(f"kernel correctness: max err {err:.2e}")

    timeit(lambda st, sp: strip_aggregate(st, sp), (state_t, strip), n_edges, "strip_f32")
    timeit(
        lambda st, sp: strip_aggregate(st, sp),
        (state_t, strip.astype(jnp.bfloat16)),
        n_edges,
        "strip_bf16",
    )

    # elementwise storage probe: is (N, 14) f32 HBM-padded to 128 lanes?
    x_rm = rng.standard_normal((N, d)).astype(np.float32)
    timeit(lambda x: x * 2.0 + 1.0, (x_rm,), n_edges, "elemwise (N,14)")
    x_tm = rng.standard_normal((d_sub, N)).astype(np.float32)
    timeit(lambda x: x * 2.0 + 1.0, (x_tm,), n_edges, "elemwise (16,N)")


if __name__ == "__main__":
    main()
