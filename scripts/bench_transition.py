"""Ablation bench: where does the transition iteration's time go, and does a
feature-major (transposed) layout win?

The transition (reference GNN/Models/GNN.py:217-236) is
  inp = concat([state, agg_states, agg_arcs]);  BN;  @W+b;  selu
Row-major activations (N, d) with d=14/31 pay lane padding to 128 on every
pass; feature-major (d, N) puts N in lanes (no padding, d pads to 16
sublanes).  This script measures, on the packed Mutagenicity workload:

  agg_rm        row-major BCSR aggregation alone (production path)
  agg_tm        feature-major aggregation (einsum over transposed tiles)
  mlp_rm/tm     BN+dense+selu alone in each layout
  step_rm/tm    the full transition iteration in each layout
"""

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


def timeit(f, args, n_arcs, label):
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
    probe = jax.jit(lambda x: jnp.sum(x))
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
    print(f"{label:12s} {dt*1e3:8.3f} ms/iter   {n_arcs/dt/1e6:9.1f} M edges/s")
    return dt


def main():
    graphs = load_mutag()
    merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
    pos, n_rows = packed_node_positions(merged.graph_of_node, tile=128)
    N = ((n_rows + 127) // 128) * 128
    src = pos[merged.arcs[:, 0].astype(np.int64)]
    dst = pos[merged.arcs[:, 1].astype(np.int64)]
    w = merged.arcnode_weight.astype(np.float64)
    n_arcs = merged.arcs.shape[0]
    d = 14

    sys.path.insert(0, os.path.dirname(__file__))
    from bench_blocks import build_blocks

    blocks, src_t, dst_t, nst, ndt = build_blocks(src, dst, w, N, 128, 128)

    rng = np.random.default_rng(0)
    state = rng.standard_normal((N, d)).astype(np.float32)
    agg_arcs = rng.standard_normal((N, 3)).astype(np.float32)
    W = rng.standard_normal((2 * d + 3, d)).astype(np.float32) * 0.1
    b = np.zeros(d, np.float32)
    gamma = np.ones(2 * d + 3, np.float32)
    beta = np.zeros(2 * d + 3, np.float32)
    mask = np.ones(N, np.float32)

    # ---- row-major ---------------------------------------------------------
    def agg_rm(state, blocks, src_t, dst_t):
        tiles = state.reshape(nst, 128, d)
        prod = jnp.einsum("bij,bid->bjd", blocks, tiles[src_t], preferred_element_type=jnp.float32)
        return segment_sum(prod, dst_t, ndt).reshape(N, d)

    def mlp_rm(inp, W, b, gamma, beta, mask):
        m = mask[:, None]
        cnt = jnp.sum(mask)
        mean = jnp.sum(inp * m, 0) / cnt
        var = jnp.sum(jnp.square(inp - mean) * m, 0) / cnt
        x = (inp - mean) * jax.lax.rsqrt(var + 1e-3) * gamma + beta
        return jax.nn.selu(x @ W + b)

    def step_rm(state, blocks, src_t, dst_t, agg_arcs, W, b, gamma, beta, mask):
        aggs = agg_rm(state, blocks, src_t, dst_t)
        inp = jnp.concatenate([state, aggs, agg_arcs], axis=1)
        return mlp_rm(inp, W, b, gamma, beta, mask)

    # ---- feature-major -----------------------------------------------------
    state_T = np.ascontiguousarray(state.T)  # (d, N)
    agg_arcs_T = np.ascontiguousarray(agg_arcs.T)

    def agg_tm(state_T, blocks, src_t, dst_t):
        tiles = state_T.reshape(d, nst, 128).transpose(1, 0, 2)  # (B', d, 128)
        prod = jnp.einsum("bdi,bij->bdj", tiles[src_t], blocks, preferred_element_type=jnp.float32)
        agg = segment_sum(prod, dst_t, ndt)  # (ndt, d, 128)
        return agg.transpose(1, 0, 2).reshape(d, N)

    def mlp_tm(inp_T, W, b, gamma, beta, mask):
        cnt = jnp.sum(mask)
        mean = jnp.sum(inp_T * mask[None, :], 1, keepdims=True) / cnt
        var = jnp.sum(jnp.square(inp_T - mean) * mask[None, :], 1, keepdims=True) / cnt
        x = (inp_T - mean) * jax.lax.rsqrt(var + 1e-3) * gamma[:, None] + beta[:, None]
        return jax.nn.selu(W.T @ x + b[:, None])

    def step_tm(state_T, blocks, src_t, dst_t, agg_arcs_T, W, b, gamma, beta, mask):
        aggs = agg_tm(state_T, blocks, src_t, dst_t)
        inp = jnp.concatenate([state_T, aggs, agg_arcs_T], axis=0)
        return mlp_tm(inp, W, b, gamma, beta, mask)

    inp_rm = np.concatenate([state, state, agg_arcs], axis=1)
    inp_tm = np.ascontiguousarray(inp_rm.T)

    timeit(agg_rm, (state, blocks, src_t, dst_t), n_arcs, "agg_rm")
    timeit(agg_tm, (state_T, blocks, src_t, dst_t), n_arcs, "agg_tm")
    timeit(mlp_rm, (inp_rm, W, b, gamma, beta, mask), n_arcs, "mlp_rm")
    timeit(mlp_tm, (inp_tm, W, b, gamma, beta, mask), n_arcs, "mlp_tm")
    timeit(step_rm, (state, blocks, src_t, dst_t, agg_arcs, W, b, gamma, beta, mask), n_arcs, "step_rm")
    timeit(step_tm, (state_T, blocks, src_t, dst_t, agg_arcs_T, W, b, gamma, beta, mask), n_arcs, "step_tm")

    # numerical cross-check
    o1 = np.asarray(jax.jit(step_rm)(*[jnp.asarray(x) for x in (state, blocks, src_t, dst_t, agg_arcs, W, b, gamma, beta, mask)]))
    o2 = np.asarray(jax.jit(step_tm)(*[jnp.asarray(x) for x in (state_T, blocks, src_t, dst_t, agg_arcs_T, W, b, gamma, beta, mask)]))
    err = np.max(np.abs(o1 - o2.T))
    print(f"cross-check max|rm - tm.T| = {err:.3e}")


if __name__ == "__main__":
    main()
