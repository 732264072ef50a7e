"""A/B the arc-readout incidence paths on merged Mutagenicity (arc focus).

Measures, interleaved in ONE process (ratios survive host contention):

backward (cotangent reduction, the arc step's former #2 cost):
  - dense-block BCSR incidence (round-5 v1: two (A x N) operators, bf16
    128x128 blocks through the XLA einsum) — rebuilt inline here since the
    library now ships the pair kernel
  - one-hot pair kernel (ops/incidence.incidence_scatter)

forward (the gathers, the arc step's former #1 cost):
  - plain XLA gather state[arc_src] / state[arc_dst]
  - one-hot pair kernel at precision='highest' (exact) and 'default'
    (bf16-rounded, lower bound)

plus the full arc-focused train step with the shipped code.

Methodology as bench.py: REPEATS inside one jit with threaded data
dependence, sync-floor subtraction, median of 5.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gnnkeras_tpu.data.mutag import load_mutag
from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.ops.bcsr import bcsr_aggregate, build_bcsr, cast_bcsr
from gnnkeras_tpu.ops.incidence import (TILE, incidence_scatter_fused,
                                        incidence_scatter_xla,
                                        incidence_select_fused,
                                        incidence_select_xla)

REPEATS = int(os.environ.get("REPEATS", "50"))
T_CLS = 2


def _sync_floor(probe):
    sync_probe = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync_probe(probe))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(sync_probe(probe))
        floors.append(time.perf_counter() - t0)
    return float(np.median(floors))


def timed(fn, args, probe, label):
    jfn = jax.jit(fn)
    acc = jfn(*args)
    _ = float(acc)
    floor = _sync_floor(probe)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc = jfn(*args)
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - floor, 1e-9) / REPEATS
    print(f"  {label:44s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def build_bcsr_incidence(batch):
    """The round-5 v1 representation, rebuilt for the A/B."""
    src = np.asarray(batch.arc_src)
    dst = np.asarray(batch.arc_dst)
    mask = np.asarray(batch.arc_mask)
    n = int(batch.nodes.shape[0])
    a_pad = -(-len(src) // TILE) * TILE
    live = np.flatnonzero(mask)
    ops = []
    for endpoint in (src, dst):
        m = build_bcsr(live.astype(np.int64), endpoint[live].astype(np.int64),
                       np.ones(len(live)), a_pad, n, max_band_factor=10 ** 9)
        ops.append(cast_bcsr(m, jnp.bfloat16))
    return ops[0], ops[1]


def main():
    graphs = load_mutag()
    rng = np.random.default_rng(0)
    gs = []
    for g in graphs:
        t = np.eye(T_CLS, dtype=np.float32)[rng.integers(0, T_CLS, g.arcs.shape[0])]
        gs.append(GraphObject(nodes=g.nodes, arcs=g.arcs, targets=t, focus="a",
                              aggregation_mode="average", arcs_canonical=True))
    merged = GraphObject.merge(gs, focus="a", aggregation_mode="average")
    batch = from_graph_object(merged, slot_pack=128, strip_dtype="int8")
    inc = batch.arc_inc
    assert inc is not None
    A = int(batch.arc_src.shape[0])
    N = int(batch.nodes.shape[0])
    a_pad = inc.n_arc_tiles * inc.tile
    print(f"{N} nodes, {A} arcs, {inc.n_pairs} union pairs "
          f"({inc.n_pairs / inc.n_arc_tiles:.2f}/arc-tile)", flush=True)

    # the 408 MB v1 block upload intermittently wedges the tunnel — skip it
    # unless explicitly requested (v1 medians recorded: 1.03-1.12 ms)
    with_v1 = os.environ.get("WITH_V1", "0") == "1"
    inc_s = inc_d = None
    if with_v1:
        inc_s, inc_d = build_bcsr_incidence(batch)
        print(f"BCSR v1: {int(inc_s.blocks.shape[0])}+{int(inc_d.blocks.shape[0])} "
              f"bf16 blocks = "
              f"{(inc_s.blocks.size + inc_d.blocks.size) * 2 / 1e6:.0f} MB; "
              f"pairs cols = {4 * inc.b_cols_src.size * 4 / 1e6:.0f} MB", flush=True)

    key = jax.random.PRNGKey(0)
    ct_src = jax.random.normal(key, (a_pad, 14), jnp.float32)
    ct_dst = jax.random.normal(jax.random.fold_in(key, 1), (a_pad, 14), jnp.float32)
    state = jax.random.normal(jax.random.fold_in(key, 2), (N, 14), jnp.float32)
    probe = batch.node_mask

    if with_v1:
        # parity canary between the two backward paths
        o_bcsr = bcsr_aggregate(ct_src, inc_s) + bcsr_aggregate(ct_dst, inc_d)
        o_pair = incidence_scatter_xla(ct_src, ct_dst, inc)
        rel = float(jnp.linalg.norm(o_bcsr - o_pair) / jnp.linalg.norm(o_bcsr))
        print(f"  bwd parity (pair vs BCSR): rel {rel:.2e}", flush=True)

    # parity canary between the fused and XLA-assisted pair paths
    print("  canary: xla...", flush=True)
    o_xla = incidence_scatter_xla(ct_src, ct_dst, inc)
    o_xla.block_until_ready()
    print("  canary: fused...", flush=True)
    o_fused = incidence_scatter_fused(ct_src, ct_dst, inc)
    o_fused.block_until_ready()
    rel = float(jnp.linalg.norm(o_xla - o_fused) / jnp.linalg.norm(o_xla))
    print(f"  bwd parity (fused vs xla): rel {rel:.2e}", flush=True)

    def bwd_bcsr(cs, cd, ms, md):
        def body(i, acc):
            out = bcsr_aggregate(cs + acc * 1e-30, ms) + bcsr_aggregate(cd, md)
            return acc + jnp.sum(out)

        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros(()))

    def bwd_pair(fn):
        def run(cs, cd, op):
            def body(i, acc):
                out = fn(cs + acc * 1e-30, cd, op)
                return acc + jnp.sum(out)

            return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros(()))

        return run

    def fwd_gather(st, s_idx, d_idx):
        def body(i, acc):
            x = st + acc * 1e-30
            return acc + jnp.sum(x[s_idx]) + jnp.sum(x[d_idx])

        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros(()))

    def fwd_pair(fn, precision):
        def run(st, op):
            def body(i, acc):
                ys, yd = fn(st + acc * 1e-30, op, precision=precision)
                return acc + jnp.sum(ys) + jnp.sum(yd)

            return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros(()))

        return run

    for rep in range(3):
        print(f"round {rep}:", flush=True)
        if with_v1:
            timed(bwd_bcsr, (ct_src, ct_dst, inc_s, inc_d), probe, "bwd BCSR dense-block bf16 (v1)")
        timed(bwd_pair(incidence_scatter_xla), (ct_src, ct_dst, inc), probe,
              "bwd one-hot pairs (xla-assisted)")
        timed(bwd_pair(incidence_scatter_fused), (ct_src, ct_dst, inc), probe,
              "bwd one-hot pairs (fused DMA)")
        timed(fwd_gather, (state, batch.arc_src, batch.arc_dst), probe, "fwd XLA gather x2")
        timed(fwd_pair(incidence_select_xla, "highest"), (state, inc), probe,
              "fwd one-hot pairs xla (highest)")
        timed(fwd_pair(incidence_select_fused, "highest"), (state, inc), probe,
              "fwd one-hot pairs fused (highest)")

    # exactness of the select kernels on the REAL backend (every row)
    gs_ref = np.asarray(state)[np.asarray(batch.arc_src)]
    for name, fn in (("fused", incidence_select_fused), ("xla", incidence_select_xla)):
        ys, yd = fn(state, inc)
        exact = np.array_equal(np.asarray(ys)[:A], gs_ref)
        print(f"select {name}(highest) bitwise-exact vs gather: {exact}", flush=True)


if __name__ == "__main__":
    main()
