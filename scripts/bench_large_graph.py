"""Single-large-graph throughput: the context-parallel-analog workload.

One banded graph (locality like road networks / meshes / sequence graphs),
node-focused convergence loop on one chip.  The same graph is what the
edge-partitioned multi-chip path shards (gnnkeras_tpu/parallel/partition.py);
this records the single-chip baseline of the BASELINE.md scaling metric.
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
from gnnkeras_tpu.models.gnn import GNNnodeBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

N_NODES = 500_000
PER_NODE = 8  # ~4M directed edges
BAND = 64
ITERS = 5
REPEATS = 20


def build(agg_dtype=None):
    rng = np.random.default_rng(0)
    src = np.repeat(np.arange(N_NODES), PER_NODE)
    dst = (src + rng.integers(-BAND, BAND + 1, len(src))) % N_NODES
    # unique (src, dst): parallel arcs would defeat the int8 factorization
    # unique (src, dst) via one packed-key native sort (equal to the row
    # unique for nonnegative ids; np.unique fallback inside)
    from gnnkeras_tpu import native
    key = native.unique_i64(src.astype(np.int64) * N_NODES + dst.astype(np.int64))
    src, dst = key // N_NODES, key % N_NODES
    arcs = np.concatenate(
        [np.stack([src, dst], 1).astype(np.float32), rng.normal(size=(len(src), 2)).astype(np.float32)],
        axis=1,
    )
    nodes = rng.normal(size=(N_NODES, 8)).astype(np.float32)
    g_tmp = GraphObject(nodes=nodes, arcs=arcs, targets=np.ones((N_NODES, 2), np.float32), focus="n")
    g = GraphObject(nodes=nodes, arcs=g_tmp.arcs, targets=rng.normal(size=(N_NODES, 2)).astype(np.float32),
                    focus="n", aggregation_mode="average", arcs_canonical=True)
    n_arcs = g.arcs.shape[0]

    batch = from_graph_object(g, agg_dtype=agg_dtype)
    inp_s, layers_s = get_inout_dims("state", 8, 2, 2, "n", 0)
    inp_o, layers_o = get_inout_dims("output", 8, 2, 2, "n", 0)
    gnn = GNNnodeBased(
        MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
            kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        0, ITERS, 0.0,
    )
    gnn.build(seed=0)
    return gnn, batch, n_arcs


def main(transposed=None, agg_dtype=None):
    gnn, batch, n_arcs = build(agg_dtype=agg_dtype)
    gnn.transposed = transposed
    op = type(batch.bcsr).__name__ if batch.bcsr is not None else "edge-list"
    print(f"graph: {N_NODES} nodes, {n_arcs} arcs, operator={op} "
          f"engine={'transposed' if transposed else 'row-major'}", flush=True)

    @jax.jit
    def forward_k(variables, batch):
        def body(i, carry):
            acc, _ = carry
            b = batch.replace(nodes=batch.nodes + acc * 1e-30)
            k, state, bn = gnn.unfold(variables, b, training=True)
            return (acc + jnp.sum(state), k)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), jnp.zeros(())))

    acc, k = forward_k(gnn.variables, batch)
    _ = float(acc)
    sync = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync(batch.node_mask))
    t0 = time.perf_counter()
    _ = float(sync(batch.node_mask))
    floor = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc, k = forward_k(gnn.variables, batch)
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    dt = (float(np.median(times)) - floor) / REPEATS
    print(f"unfold ({ITERS} iters): {dt * 1e3:.2f} ms -> {ITERS * n_arcs / dt / 1e6:.0f}M edges/s/chip",
          flush=True)
    return dt


def partitioned(dense_blocks: bool, agg_dtype=None):
    """The partitioned engine on THIS chip (n_parts = #devices): with one
    device this measures the sharded machinery's per-chip overhead vs the
    plain engine — the 1-chip anchor of the BASELINE scaling metric."""
    from gnnkeras_tpu.parallel.mesh import make_mesh
    from gnnkeras_tpu.parallel.partition import PartitionedGNN, partition_graph

    rng = np.random.default_rng(0)
    src = np.repeat(np.arange(N_NODES), PER_NODE)
    dst = (src + rng.integers(-BAND, BAND + 1, len(src))) % N_NODES
    # unique (src, dst) via one packed-key native sort (equal to the row
    # unique for nonnegative ids; np.unique fallback inside)
    from gnnkeras_tpu import native
    key = native.unique_i64(src.astype(np.int64) * N_NODES + dst.astype(np.int64))
    src, dst = key // N_NODES, key % N_NODES
    arcs = np.concatenate(
        [np.stack([src, dst], 1).astype(np.float32), rng.normal(size=(len(src), 2)).astype(np.float32)],
        axis=1,
    )
    nodes = rng.normal(size=(N_NODES, 8)).astype(np.float32)
    g_tmp = GraphObject(nodes=nodes, arcs=arcs, targets=np.ones((N_NODES, 2), np.float32), focus="n")
    g = GraphObject(nodes=nodes, arcs=g_tmp.arcs, targets=rng.normal(size=(N_NODES, 2)).astype(np.float32),
                    focus="n", aggregation_mode="average", arcs_canonical=True)
    n_arcs = g.arcs.shape[0]

    n_dev = len(jax.devices())
    pg = partition_graph(g, n_dev, dense_blocks=dense_blocks, agg_dtype=agg_dtype)
    inp_s, layers_s = get_inout_dims("state", 8, 2, 2, "n", 0)
    inp_o, layers_o = get_inout_dims("output", 8, 2, 2, "n", 0)
    gnn = GNNnodeBased(
        MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
            kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        0, ITERS, 0.0,
    )
    gnn.build(seed=0)
    pgnn = PartitionedGNN(gnn, make_mesh(("graph",)))

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def device_rep(params, mstate, pg_l, rng_):
        def body(i, carry):
            acc, _ = carry
            import dataclasses
            pg2 = dataclasses.replace(pg_l, nodes=pg_l.nodes + acc * 1e-30)
            k, state, out, _, _ = pgnn._local_forward(params, mstate, pg2, rng_, True, strip_axes=1)
            return (acc + jnp.sum(state), k)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), jnp.zeros(())))

    sharded = shard_map(
        device_rep, mesh=pgnn.mesh,
        in_specs=(P(), P(), P("graph"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    fn = jax.jit(sharded)
    acc, k = fn(gnn.variables["params"], gnn.variables["state"], pg, jax.random.PRNGKey(0))
    _ = float(acc)
    sync = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync(pg.node_mask))
    t0 = time.perf_counter()
    _ = float(sync(pg.node_mask))
    floor = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc, k = fn(gnn.variables["params"], gnn.variables["state"], pg, jax.random.PRNGKey(0))
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    dt = (float(np.median(times)) - floor) / REPEATS
    label = ("int8" if agg_dtype == "int8" else "bcsr") if dense_blocks else "scatter"
    print(f"partitioned[{label}] x{n_dev}dev unfold: {dt * 1e3:.2f} ms -> "
          f"{ITERS * n_arcs / dt / 1e6:.0f}M edges/s/chip", flush=True)
    return dt


if __name__ == "__main__":
    import os as _os

    dt_plain = main()
    dt_t = main(transposed=True)
    print(f"transposed vs row-major: {dt_plain / dt_t:.2f}x faster")
    dt_q = main(transposed=True, agg_dtype="int8")
    print(f"int8 banded decomposition vs row-major f32: {dt_plain / dt_q:.2f}x faster")
    # 'auto' (the GNNConfig default): exact-only quantization — on this
    # factorable workload it must take the same banded int8 form, so the
    # two lines should agree within noise
    dt_a = main(agg_dtype="auto")
    print(f"agg_dtype='auto' vs explicit int8: {dt_q / dt_a:.2f}x")
    if _os.environ.get("PARTITIONED", "1") != "0":
        dt_part = partitioned(dense_blocks=True)
        print(f"partitioned-engine overhead vs plain: {dt_part / dt_plain:.2f}x")
        dt_part_q = partitioned(dense_blocks=True, agg_dtype="int8")
        print(f"partitioned int8-banded vs plain f32: {dt_plain / dt_part_q:.2f}x faster")
