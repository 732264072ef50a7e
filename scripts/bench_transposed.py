"""Transposed-unfold engine benchmark: the full flagship forward (merged
Mutagenicity, starter architecture, 5 transition iterations) under

- the row-major production engine (tile-packed, BCSR einsum aggregation), and
- the transposed engine at slot widths 32/64/128 and strip dtypes
  f32/bf16/int8 (int8 = mask + per-column scale factorization).

Methodology as bench.py: repeats inside one jit with a threaded data
dependence, sync-floor subtraction (honest timing through the tunneled TPU,
see .claude/skills/verify).
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
from gnnkeras_tpu.models.gnn import GNNgraphBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

ITERS = 5
REPEATS = int(os.environ.get("REPEATS", "100"))


def build_model():
    inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", 0)
    inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", 0)
    net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = GNNgraphBased(net_st, net_out, 0, ITERS, 0.0)
    gnn.build(seed=0)
    return gnn


def timed_forward(gnn, batch, n_arcs, label):
    @jax.jit
    def forward_k(variables, batch):
        def body(i, carry):
            acc, _ = carry
            b = batch.replace(nodes=batch.nodes + acc * 1e-30)
            k, state, bn = gnn.unfold(variables, b, training=True)
            out, mask, _ = gnn.apply_output(variables, state, b, training=False, rng=None)
            return (acc + jnp.sum(out), k)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), jnp.zeros(())))

    acc, k = forward_k(gnn.variables, batch)
    _ = float(acc)
    sync_probe = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync_probe(batch.graph_mask))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(sync_probe(batch.graph_mask))
        floors.append(time.perf_counter() - t0)
    sync_floor = float(np.median(floors))

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc, k = forward_k(gnn.variables, batch)
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - sync_floor, 1e-9) / REPEATS
    edges = ITERS * n_arcs / dt
    print(f"{label:40s} {dt * 1e3:8.3f} ms/fwd  {edges / 1e9:6.2f} B edges/s")
    return dt, edges


def main():
    graphs = load_mutag()
    merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
    n_arcs = merged.arcs.shape[0]
    gnn = build_model()

    batch = from_graph_object(merged, tile_pack=True)
    gnn.transposed = False
    _, state_ref, _ = gnn.unfold(gnn.variables, batch, training=True)
    norm_ref = float(jnp.linalg.norm(jnp.sort(jnp.abs(state_ref[batch.node_mask]), axis=None)))
    timed_forward(gnn, batch, n_arcs, "row-major tile_pack (production)")
    del batch

    for slot in (128, 64, 32):
        for dtype in ("float32", "bfloat16", "int8"):
            b = from_graph_object(merged, slot_pack=slot, strip_dtype=dtype)
            gnn.transposed = True
            # correctness canary: masked state norm (order-independent)
            _, st, _ = gnn.unfold(gnn.variables, b, training=True)
            norm = float(jnp.linalg.norm(jnp.sort(jnp.abs(st[b.node_mask]), axis=None)))
            rel = abs(norm - norm_ref) / norm_ref
            tag = f"transposed slot={slot} {dtype}"
            if rel > 2e-2:
                print(f"{tag}: STATE MISMATCH rel={rel:.3e}")
            timed_forward(gnn, b, n_arcs, tag + (f" (rel {rel:.1e})"))
            del b


if __name__ == "__main__":
    main()
