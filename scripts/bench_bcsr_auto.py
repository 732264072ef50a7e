"""Transposed-vs-row-major engine on plain-BCSR batches across the
state:operator byte-ratio axis — the measurement behind the computed
auto-selection in models/gnn.py `_use_transposed` (VERDICT r3 next-step #5).

Each workload prints the per-iteration state bytes, operator bytes, their
ratio, and both engines' measured unfold time; the decision threshold
recorded in BASELINE.md comes from this table.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNgraphBased, GNNnodeBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

ITERS = 5
REPEATS = int(os.environ.get("REPEATS", "20"))


def banded(n_nodes, per_node, band, dn=8, seed=0):
    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(n_nodes), per_node)
    dst = (src + rng.integers(-band, band + 1, len(src))) % n_nodes
    # unique (src, dst): parallel arcs (same pair, different labels) would
    # accumulate in the operator and defeat the int8 mask+scale factorization
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    arcs = np.concatenate(
        [np.stack([src, dst], 1).astype(np.float32),
         rng.normal(size=(len(src), 2)).astype(np.float32)], axis=1)
    nodes = rng.normal(size=(n_nodes, dn)).astype(np.float32)
    return GraphObject(nodes=nodes, arcs=arcs,
                       targets=rng.normal(size=(n_nodes, 2)).astype(np.float32),
                       focus="n", aggregation_mode="average")


def molecules(n_graphs=4337, seed=0, dn=14, da=3):
    rng = np.random.default_rng(seed)
    graphs = []
    for i in range(n_graphs):
        n = int(rng.integers(20, 40))
        a = 2 * n
        pairs = np.unique(np.stack([rng.integers(0, n, a), rng.integers(0, n, a)], 1), axis=0)
        arcs = np.concatenate([pairs, np.eye(da)[rng.integers(0, da, len(pairs))]], axis=1)
        t = np.zeros((1, 2)); t[0, i % 2] = 1
        graphs.append(GraphObject(nodes=np.eye(dn)[rng.integers(0, dn, n)], arcs=arcs,
                                  targets=t, focus="g", aggregation_mode="average"))
    return GraphObject.merge(graphs, focus="g", aggregation_mode="average")


def build_gnn(dn, da, T, focus, ds):
    inp_s, ls = get_inout_dims("state", dn, da, T, focus, ds)
    inp_o, lo = get_inout_dims("output", dn, da, T, focus, ds)
    cls = GNNgraphBased if focus == "g" else GNNnodeBased
    gnn = cls(
        MLP(input_dim=inp_s[0], layers=ls, activations="selu",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=inp_o[0], layers=lo, activations="softmax",
            kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        ds, ITERS, 0.0,
    )
    gnn.build(seed=0)
    return gnn


def timed_unfold(gnn, batch):
    @jax.jit
    def forward_k(variables, batch):
        def body(i, carry):
            acc, _ = carry
            b = batch.replace(nodes=batch.nodes + acc * 1e-30)
            k, state, bn = gnn.unfold(variables, b, training=True,
                                      rng=jax.random.PRNGKey(0))
            return (acc + jnp.sum(state), k)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), jnp.zeros(())))

    acc, _ = forward_k(gnn.variables, batch)
    _ = float(acc)
    sync = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync(batch.node_mask))
    floors = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(sync(batch.node_mask))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc, _ = forward_k(gnn.variables, batch)
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    return (float(np.median(times)) - floor) / REPEATS


def run_case(label, g, gnn, ds, tile_pack=False):
    batch = from_graph_object(g, tile_pack=tile_pack)
    sd = ds if ds > 0 else batch.nodes.shape[1]
    sd_pad = -(-sd // 8) * 8
    state_bytes = batch.num_nodes * sd_pad * 4
    op = batch.bcsr
    op_bytes = int(np.prod(op.blocks.shape)) * op.blocks.dtype.itemsize
    gnn.transposed = False
    t_rm = timed_unfold(gnn, batch)
    gnn.transposed = True
    t_t = timed_unfold(gnn, batch)
    print(f"{label:34s} state {state_bytes/2**20:7.1f} MB  op {op_bytes/2**20:8.1f} MB  "
          f"ratio {state_bytes/op_bytes:7.3f}  row-major {t_rm*1e3:7.2f} ms  "
          f"transposed {t_t*1e3:7.2f} ms  speedup {t_rm/t_t:5.2f}x", flush=True)


def main():
    run_case("molecules 4337 tile_pack d=14", molecules(), build_gnn(14, 3, 2, "g", 0), 0,
             tile_pack=True)
    run_case("banded 500k pn=8 band=64 d=8", banded(500_000, 8, 64), build_gnn(8, 2, 2, "n", 0), 0)
    run_case("banded 500k pn=8 band=64 ds=32", banded(500_000, 8, 64), build_gnn(8, 2, 2, "n", 32), 32)
    # boundary pin (VERDICT r4 stretch #10): sd_pad 40/48 bracket the cliff
    # between the measured tie at 32 and the loss at 64
    run_case("banded 500k pn=8 band=64 ds=40", banded(500_000, 8, 64), build_gnn(8, 2, 2, "n", 40), 40)
    run_case("banded 500k pn=8 band=64 ds=48", banded(500_000, 8, 64), build_gnn(8, 2, 2, "n", 48), 48)
    run_case("banded 100k pn=4 band=8 d=8", banded(100_000, 4, 8), build_gnn(8, 2, 2, "n", 0), 0)
    run_case("banded 100k pn=4 band=8 ds=40", banded(100_000, 4, 8), build_gnn(8, 2, 2, "n", 40), 40)
    run_case("banded 100k pn=4 band=8 ds=48", banded(100_000, 4, 8), build_gnn(8, 2, 2, "n", 48), 48)
    run_case("banded 100k pn=4 band=8 ds=64", banded(100_000, 4, 8), build_gnn(8, 2, 2, "n", 64), 64)


if __name__ == "__main__":
    main()
