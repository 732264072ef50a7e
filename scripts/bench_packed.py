"""Packed-partitioned flagship benchmark (VERDICT r2 next-step #3).

Times the FULL merged-Mutagenicity graph-focused forward through the
PackedPartitionedGNN shard_map program (parallel/packed.py) on however many
devices are visible (1 on the tunneled v5e — same protocol as the round-2
partitioned measurement: the sharded program's 1-device time vs the plain
engine's time; psums over a 1-device axis still compile in, so this prices
the partitioned program's overhead honestly), and compares against the plain
single-chip engine on the same batch.

Protocol: REPEATS forwards inside one jit, threaded data dependence,
sync-floor subtraction (BASELINE.md measurement notes).
"""

import os
import time

import numpy as np

REPEATS = int(os.environ.get("GNNK_BENCH_REPEATS", "100"))
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    from gnnkeras_tpu.data.mutag import load_mutag
    from gnnkeras_tpu.graph.batch import from_graph_object
    from gnnkeras_tpu.graph.graph import GraphObject
    from gnnkeras_tpu.models.gnn import GNNgraphBased
    from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
    from gnnkeras_tpu.parallel.mesh import make_mesh
    from gnnkeras_tpu.parallel.packed import PackedPartitionedGNN, partition_packed

    graphs = load_mutag()
    merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
    n_arcs = merged.arcs.shape[0]

    inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", 0)
    inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", 0)
    gnn = GNNgraphBased(
        MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
            kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        0, ITERS, 0.0,
    )
    gnn.build(seed=0)

    n_dev = len(jax.devices())
    mesh = make_mesh(("graph",))
    strip_dtype = os.environ.get("GNNK_BENCH_STRIP_DTYPE", "int8")
    print(f"strip_dtype={strip_dtype}", flush=True)
    stacked, meta = partition_packed(merged, n_dev, strip_dtype=strip_dtype)
    pgnn = PackedPartitionedGNN(gnn, mesh)

    batch1 = from_graph_object(merged, slot_pack=128, strip_dtype=strip_dtype)

    sync_probe = jax.jit(lambda x: jnp.sum(x))

    def floor():
        fs = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(sync_probe(jnp.ones(8)))
            fs.append(time.perf_counter() - t0)
        return float(np.median(fs))

    def timed(fn, *args):
        acc = fn(*args)
        _ = float(acc)
        f = floor()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return max(float(np.median(ts)) - f, 1e-9) / REPEATS

    key = jax.random.PRNGKey(0)

    # --- plain single-chip engine (bench.py's program) ---
    @jax.jit
    def plain_k(variables, b0):
        def body(i, carry):
            acc = carry
            b = b0.replace(nodes=b0.nodes + acc * 1e-30)
            k, state, bn = gnn.unfold(variables, b, training=True)
            out, mask, _ = gnn.apply_output(variables, state, b, training=False, rng=None)
            return acc + jnp.sum(out)

        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros(()))

    # --- packed partitioned program (shard_map per-device single-chip) ---
    fwd = pgnn.make_forward(training=True)  # builds/caches the shard_map fn

    @jax.jit
    def packed_k(params, mstate, b0):
        def body(i, carry):
            acc = carry
            b = b0.replace(nodes=b0.nodes + acc * 1e-30)
            k, state, out, om, ms = fwd(params, mstate, b, key)
            return acc + jnp.sum(out)

        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros(()))

    t_plain = timed(plain_k, gnn.variables, batch1)
    t_packed = timed(packed_k, gnn.variables["params"], gnn.variables["state"], stacked)
    e_plain = ITERS * n_arcs / t_plain
    e_packed = ITERS * n_arcs / t_packed
    print(
        f"devices={n_dev}  plain {t_plain*1e3:.3f} ms ({e_plain/1e9:.2f}B edges/s)   "
        f"packed-partitioned {t_packed*1e3:.3f} ms ({e_packed/1e9:.2f}B edges/s)   "
        f"ratio {t_packed/t_plain:.2f}x"
    )


if __name__ == "__main__":
    import signal

    def _w(s, f):
        raise TimeoutError("watchdog")

    signal.signal(signal.SIGALRM, _w)
    signal.alarm(3000)
    main()
