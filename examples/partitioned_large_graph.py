"""Edge-partitioned training of one large graph — the context-parallel-analog
workload (SURVEY §5 "long-context analog"; no reference counterpart).

Builds a banded graph (mesh/road-network-like locality), shards its node
rows over every available device (`graph` mesh axis), and trains full-batch
with per-iteration boundary-state exchange on the BCSR/MXU block path.
`--steps-per-launch K` scans K epochs per device launch (3.5x faster epochs
through a high-latency host link, BASELINE.md).

Runs on any device count — including a single chip (n_parts=1) and the
virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
        python examples/partitioned_large_graph.py --nodes 100000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNnodeBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.parallel import PartitionedGNN, make_mesh, partition_graph


def build_graph(n_nodes: int, per_node: int = 8, band: int = 64, seed: int = 0) -> GraphObject:
    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(n_nodes), per_node)
    dst = (src + rng.integers(-band, band + 1, len(src))) % n_nodes
    arcs = np.concatenate(
        [np.stack([src, dst], 1).astype(np.float32),
         rng.normal(size=(len(src), 2)).astype(np.float32)],
        axis=1,
    )
    nodes = rng.normal(size=(n_nodes, 8)).astype(np.float32)
    canon = GraphObject(nodes=nodes, arcs=arcs, targets=np.ones((n_nodes, 2), np.float32), focus="n")
    return GraphObject(
        nodes=nodes, arcs=canon.arcs,
        targets=rng.normal(size=(n_nodes, 2)).astype(np.float32),
        focus="n", aggregation_mode="average",
        # canon already deduped+sorted the 4M arc rows — skip the second
        # O(A log A) pass (same fast path the serial bake uses)
        arcs_canonical=True,
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=500_000)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--steps-per-launch", type=int, default=10)
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()

    n_devices = len(jax.devices())
    print(f"devices: {n_devices} x {jax.devices()[0].platform}")
    g = build_graph(args.nodes)
    print(f"graph: {g.nodes.shape[0]:,} nodes / {g.arcs.shape[0]:,} arcs")

    inp_s, layers_s = get_inout_dims("state", 8, 2, 2, "n", 0)
    inp_o, layers_o = get_inout_dims("output", 8, 2, 2, "n", 0)
    gnn = GNNnodeBased(
        MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=inp_o[0], layers=layers_o, activations="linear",
            kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        0, 5, 0.0,
    )
    gnn.compile(optimizer="adam:0.001", loss="mse")

    pg = partition_graph(g, n_devices, dense_blocks=True)
    pgnn = PartitionedGNN(gnn, make_mesh(("graph",)))
    t0 = time.perf_counter()
    history = pgnn.fit(
        pg, epochs=args.epochs, verbose=1,
        steps_per_launch=args.steps_per_launch,
        checkpoint_dir=args.checkpoint_dir, resume=args.resume,
    )
    dt = time.perf_counter() - t0
    print(f"{args.epochs} epochs in {dt:.1f}s ({dt / args.epochs * 1000:.1f} ms/epoch, "
          f"loss {history['loss'][0]:.4f} -> {history['loss'][-1]:.4f})")


if __name__ == "__main__":
    main()
