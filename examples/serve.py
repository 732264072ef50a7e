"""Serving demo: train the starter GNN briefly, then stand up the two
serving tiers (gnnkeras_tpu/serving.py) on it.

    python examples/serve.py [--epochs N] [--requests K]

1. ``Predictor`` — an in-process fixed-shape endpoint: requests (lists of
   GraphObjects) are merged + padded to a compiled template; small requests
   route through the one-launch fused unfolding kernel (ops/fused.py).
2. ``export_forward`` / ``load_exported`` — a portable StableHLO artifact:
   the eval forward + trained parameters, reloadable in a process that never
   imports the model classes.

The reference has no serving story (inference is eager ``Model.predict``,
GNN/Models/GNN.py:165-177); this is the TPU deployment path.
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gnnkeras_tpu import (
    GNNgraphBased,
    MLP,
    MultiGraphSequencer,
    Predictor,
    export_forward,
    get_inout_dims,
    load_exported,
)
from gnnkeras_tpu.data.mutag import load_mutag, mutag_splits
from gnnkeras_tpu.graph.batch import graphs_to_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--requests", type=int, default=20)
    args = ap.parse_args()

    graphs = load_mutag()
    for g in graphs:
        g.setAggregation("average")
    gTr, gTe, _ = mutag_splits(graphs, seed=42)

    ins, ls = get_inout_dims("state", 14, 3, 2, "g", 0)
    ino, lo = get_inout_dims("output", 14, 3, 2, "g", 0)
    gnn = GNNgraphBased(
        MLP(input_dim=ins[0], layers=ls, activations="selu",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=ino[0], layers=lo, activations="softmax",
            kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        0, 5, 0.0)
    gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])
    gnn.fit(MultiGraphSequencer(gTr, "g", "average", batch_size=1000), epochs=args.epochs, verbose=1)

    # --- tier 1: in-process endpoint -------------------------------------
    p = Predictor.for_graphs(gnn, gTe, batch_size=8, fused="auto").warmup()
    print(f"\nPredictor template: {p.max_nodes} nodes / {p.max_arcs} arcs / "
          f"{p.max_graphs} graphs, fused={p.fused}")
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    n_correct = n_total = 0
    for _ in range(args.requests):
        take = rng.choice(len(gTe), size=int(rng.integers(1, 9)), replace=False)
        req = [gTe[i] for i in take]
        probs = p(req)  # (len(req), 2), rows in request order
        want = np.concatenate([g.targets for g in req]).argmax(1)
        n_correct += int((probs.argmax(1) == want).sum())
        n_total += len(req)
    dt = time.perf_counter() - t0
    print(f"{args.requests} requests in {dt*1e3:.1f} ms wall "
          f"({dt/args.requests*1e3:.2f} ms/request incl. host work); "
          f"accuracy {n_correct/n_total:.3f}")

    # --- tier 2: portable artifact ---------------------------------------
    template = graphs_to_batch(gTe[:8], "g", "average")
    with tempfile.TemporaryDirectory() as d:
        export_forward(gnn, template, d)
        size = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
        loaded = load_exported(d)
        out, mask = loaded.call(template)
        print(f"exported artifact: {sorted(os.listdir(d))} ({size/1024:.0f} KiB); "
              f"reloaded forward output {np.asarray(out).shape}")

    # --- tier 3: HTTP endpoint (JSON in, per-graph outputs back) ----------
    import json
    import urllib.request

    from gnnkeras_tpu.serving_http import GraphServer

    server = GraphServer(p, port=0).start()
    addr = server.address
    try:
        g0 = gTe[0]
        payload = {"graphs": [{"nodes": g0.nodes.tolist(), "arcs": g0.arcs.tolist()}]}
        req = urllib.request.Request(
            f"http://{addr[0]}:{addr[1]}/predict", data=json.dumps(payload).encode())
        resp = json.loads(urllib.request.urlopen(req, timeout=30).read())
        print(f"HTTP endpoint on {addr}: predict -> {np.round(resp['outputs'][0], 4).tolist()}")
    finally:
        server.close()


if __name__ == "__main__":
    main()
