"""Serving THROUGHPUT under concurrent load: MicroBatcher vs per-request
dispatch.

Complements the per-request latency table (scripts/bench_serving_latency.py):
here many client threads fire single-molecule requests at once, and the
coalescer serves them in merged launches.  Through the tunneled runtime each
launch pays a ~30 ms host round-trip, so the win is dominated by launch
amortization — the same effect (smaller constants) applies to a local TPU
host via per-program dispatch cost.
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_REQUESTS = 256
CLIENTS = 32


def main():
    from gnnkeras_tpu import MicroBatcher, Predictor
    from gnnkeras_tpu.data.mutag import load_mutag
    from gnnkeras_tpu.models.gnn import GNNgraphBased
    from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

    graphs = load_mutag()[:64]
    for g in graphs:
        g.setAggregation("average")
    ins, ls = get_inout_dims("state", 14, 3, 2, "g", 0)
    ino, lo = get_inout_dims("output", 14, 3, 2, "g", 0)
    gnn = GNNgraphBased(
        MLP(input_dim=ins[0], layers=ls, activations="selu",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=ino[0], layers=lo, activations="softmax",
            kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        0, 5, 0.0)
    gnn.build(seed=1)
    p = Predictor.for_graphs(gnn, graphs, batch_size=32).warmup()

    reqs = [graphs[i % len(graphs)] for i in range(N_REQUESTS)]

    # per-request dispatch (one launch each)
    _ = p([reqs[0]])
    t0 = time.perf_counter()
    for g in reqs:
        _ = p([g])
    t_serial = time.perf_counter() - t0

    # coalesced
    mb = MicroBatcher(p, max_delay_ms=5.0)
    done = threading.Semaphore(0)

    def client(chunk):
        for g in chunk:
            mb(g)
        done.release()

    t0 = time.perf_counter()
    per = N_REQUESTS // CLIENTS
    for c in range(CLIENTS):
        threading.Thread(target=client, args=(reqs[c * per:(c + 1) * per],), daemon=True).start()
    for _ in range(CLIENTS):
        done.acquire()
    t_mb = time.perf_counter() - t0
    launches = mb.launches
    mb.close()

    print(f"{N_REQUESTS} single-molecule requests, {CLIENTS} client threads:")
    print(f"  per-request dispatch: {t_serial:.2f} s  ({N_REQUESTS / t_serial:.0f} req/s)")
    print(f"  MicroBatcher:         {t_mb:.2f} s  ({N_REQUESTS / t_mb:.0f} req/s, "
          f"{launches} launches)  -> {t_serial / t_mb:.1f}x")


if __name__ == "__main__":
    main()
