"""Flagship benchmark: edges/s/chip in the transition iteration.

Workload: the full Mutagenicity dataset merged into one disjoint-union batch
(N=131,488 nodes, A=266,894 arcs — the reference's own dataset at
starter.py scale), graph-focused GNN with the starter.py architecture
(dim_state=0, 31→14 state MLP with BatchNorm, max_iter=5), threshold=0 so
every run executes exactly 5 transition iterations.

Metric: edges processed per second in the transition iteration (BASELINE.md
primary metric).  vs_baseline compares against the reference's forced-eager
TensorFlow execution of the same computation on this machine's CPU —
11,502,498 edges/s measured 2026-08-17 (see BASELINE.md §Measured).

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np

REFERENCE_EDGES_PER_S = 11_502_498.0  # reference eager TF, this host, 2026-08-17
ITERS = 5
TIMED_RUNS = int(os.environ.get("GNNK_BENCH_TIMED_RUNS", "5"))

# GNNK_BENCH_SCALE < 1 shrinks the workload (synthetic, skips the dataset) so
# the bench contract — one JSON line on stdout — is testable hermetically on
# CPU (tests/test_cli.py::TestBenchContract).  1.0 = the real flagship batch.
SCALE = float(os.environ.get("GNNK_BENCH_SCALE", "1.0"))


def build_workload():
    from gnnkeras_tpu.graph.batch import from_graph_object
    from gnnkeras_tpu.graph.graph import GraphObject
    from gnnkeras_tpu.models.gnn import GNNgraphBased
    from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

    try:
        if SCALE < 1.0:
            raise FileNotFoundError  # scaled runs use the synthetic workload
        from gnnkeras_tpu.data.mutag import load_mutag

        graphs = load_mutag()
        merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
    except FileNotFoundError:
        # MUTAG-shaped synthetic stand-in: G graphs of ~30 nodes each, arcs
        # kept within their graph, explicit NodeGraph membership (a raw
        # GraphObject defaults to a single graph, which cannot carry G
        # graph-focused targets).
        rng = np.random.default_rng(0)
        n, a = max(int(131_488 * SCALE), 64), max(int(266_894 * SCALE), 128)
        G = max(int(4337 * SCALE), 2)
        nodes = np.eye(14, dtype=np.float32)[rng.integers(0, 14, n)]
        graph_of_node = (np.arange(n, dtype=np.int64) * G) // n  # contiguous even split
        counts = np.bincount(graph_of_node, minlength=G)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        g_arc = rng.integers(0, G, a)
        src = starts[g_arc] + rng.integers(0, counts[g_arc])
        dst = starts[g_arc] + rng.integers(0, counts[g_arc])
        arcs = np.concatenate(
            [np.stack([src, dst], 1), np.eye(3, dtype=np.float32)[rng.integers(0, 3, a)]], axis=1
        )
        targets = np.eye(2, dtype=np.float32)[rng.integers(0, 2, G)]
        merged = GraphObject(
            nodes=nodes, arcs=arcs, targets=targets, focus="g", aggregation_mode="average",
            NodeGraph=(graph_of_node, (1.0 / counts[graph_of_node]).astype(np.float32)),
        )

    # Transposed unfold engine (round 3): slot-packed batch with dense
    # diagonal-block strips — state carried feature-major through the whole
    # convergence loop, so the Pallas aggregation kernel never relayouts.
    # int8 storage factors each block into a 0/1 mask + per-destination f32
    # scale (exact for sum/normalized/average aggregation): half the bf16
    # operator bytes AND no bf16 rounding of the 1/deg weights in the MXU.
    # Measured 4.03 vs 3.94B edges/s (bf16) vs 2.2B for the round-2
    # row-major einsum engine (scripts/bench_transposed.py).
    strip_dtype = os.environ.get("GNNK_BENCH_STRIP_DTYPE", "int8")
    batch = from_graph_object(merged, slot_pack=128, strip_dtype=strip_dtype)
    n_arcs = merged.arcs.shape[0]

    inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", 0)
    inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", 0)
    net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = GNNgraphBased(net_st, net_out, 0, ITERS, 0.0)  # threshold 0 → exactly ITERS iterations
    gnn.build(seed=0)
    return gnn, batch, n_arcs


REPEATS_IN_JIT = int(os.environ.get("GNNK_BENCH_REPEATS", "100"))
# amortizes host<->device sync latency (which dominates per-call timings on
# tunneled TPU runtimes) out of the metric


def main():
    import jax
    import jax.numpy as jnp

    gnn, batch, n_arcs = build_workload()

    @jax.jit
    def forward_k(variables, batch):
        # fixed-length scan unfolding (the training path) — static trip counts
        # keep remote compilation sane and measure the transition iteration
        # exactly ITERS times per forward.
        def body(i, carry):
            acc, _ = carry
            # thread acc into the inputs so XLA cannot hoist the (otherwise
            # loop-invariant) forward out of the repetition loop
            b = batch.replace(nodes=batch.nodes + acc * 1e-30)
            k, state, bn = gnn.unfold(variables, b, training=True)
            out, mask, _ = gnn.apply_output(variables, state, b, training=False, rng=None)
            return (acc + jnp.sum(out), k)

        return jax.lax.fori_loop(0, REPEATS_IN_JIT, body, (jnp.zeros(()), jnp.zeros(())))

    # warmup/compile — fully synced so the sync-floor probe below doesn't
    # queue behind pending work
    acc, k = forward_k(gnn.variables, batch)
    _ = float(acc)
    iters = float(k)
    sync_probe = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync_probe(batch.graph_mask))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(sync_probe(batch.graph_mask))
        floors.append(time.perf_counter() - t0)
    sync_floor = float(np.median(floors))

    times = []
    for _ in range(TIMED_RUNS):
        t0 = time.perf_counter()
        acc, k = forward_k(gnn.variables, batch)
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    dt = max(float(np.median(times)) - sync_floor, 1e-9) / REPEATS_IN_JIT
    edges_per_s = iters * n_arcs / dt

    print(
        json.dumps(
            {
                "metric": "transition_edges_per_s",
                "value": round(edges_per_s),
                "unit": "edges/s/chip",
                "vs_baseline": round(edges_per_s / REFERENCE_EDGES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    import signal

    def _watchdog(signum, frame):  # tunneled-TPU runs can wedge in remote compile
        raise TimeoutError("bench watchdog: device/compile did not respond in time")

    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(1500)
    try:
        main()
    except BaseException as exc:  # always emit the one JSON line the driver records
        print(json.dumps({
            "metric": "transition_edges_per_s",
            "value": 0,
            "unit": "edges/s/chip",
            "vs_baseline": 0.0,
            "error": f"{type(exc).__name__}: {exc}"[:300],
        }))
        raise
