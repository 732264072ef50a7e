"""Time the fused whole-unfold Pallas kernel against the XLA unfold.

Full merged Mutagenicity, tile-packed, starter architecture, 5 iterations.
Protocol: K repetitions inside one jit with a threaded data dependence,
sync once, subtract the measured sync floor (see BASELINE.md measurement
notes — per-call timings through the tunnel carry ~30 ms of sync latency).
"""

import time

import numpy as np

REPEATS = 100


def main():
    import jax
    import jax.numpy as jnp

    from gnnkeras_tpu.data.mutag import load_mutag
    from gnnkeras_tpu.graph.batch import from_graph_object
    from gnnkeras_tpu.graph.graph import GraphObject
    from gnnkeras_tpu.models.gnn import GNNgraphBased
    from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
    from gnnkeras_tpu.ops.fused import build_fused_diag

    graphs = load_mutag()
    merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
    batch = from_graph_object(merged, tile_pack=True)
    n_arcs = merged.arcs.shape[0]

    ins, ls = get_inout_dims("state", 14, 3, 2, "g", 0)
    ino, lo = get_inout_dims("output", 14, 3, 2, "g", 0)
    net_st = MLP(input_dim=ins[0], layers=ls, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=ino[0], layers=lo, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = GNNgraphBased(net_st, net_out, 0, 5, 0.0)
    gnn.build(seed=0)

    src = np.asarray(batch.arc_src)[:n_arcs]
    dst = np.asarray(batch.arc_dst)[:n_arcs]
    w = np.asarray(batch.arcnode_weight)[:n_arcs]
    ops = {
        "bf16": build_fused_diag(src, dst, w, batch.num_nodes, dtype=jnp.bfloat16),
        "f32": build_fused_diag(src, dst, w, batch.num_nodes, dtype=jnp.float32),
    }

    sync_probe = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync_probe(batch.graph_mask))

    def floor():
        fs = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(sync_probe(batch.graph_mask))
            fs.append(time.perf_counter() - t0)
        return float(np.median(fs))

    def timed(fn, *args):
        acc = float(fn(*args))  # warmup + full sync
        f = floor()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return (max(float(np.median(ts)) - f, 1e-9)) / REPEATS

    variables = gnn.variables

    # XLA eval-mode unfold + readout (the current bench path but training=False)
    @jax.jit
    def xla_fwd(v, b):
        def body(i, carry):
            acc, _ = carry
            bb = b.replace(nodes=b.nodes + acc * 1e-30)
            k, state, _ = gnn.unfold(v, bb, training=False)
            out, _, _ = gnn.apply_output(v, state, bb, training=False, rng=None)
            return (acc + jnp.sum(out), k)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), jnp.zeros(())))[0]

    # XLA training-path unfold (what bench.py currently measures)
    @jax.jit
    def xla_train_fwd(v, b):
        def body(i, carry):
            acc, _ = carry
            bb = b.replace(nodes=b.nodes + acc * 1e-30)
            k, state, _ = gnn.unfold(v, bb, training=True)
            out, _, _ = gnn.apply_output(v, state, bb, training=False, rng=None)
            return (acc + jnp.sum(out), k)

        return jax.lax.fori_loop(0, REPEATS, body, (jnp.zeros(()), jnp.zeros(())))[0]

    def make_fused(op, tps):
        @jax.jit
        def fused_fwd(v, b, blocks):
            import dataclasses

            o = dataclasses.replace(op, blocks=blocks)

            def body(i, carry):
                acc = carry
                bb = b.replace(nodes=b.nodes + acc * 1e-30)
                from gnnkeras_tpu.ops.fused import fused_unfold

                folded = gnn.fold_transition(v)
                w_state, w_agg, w_arc, bias, act = folded
                const = bb.agg_arc_labels @ w_arc + bias
                state = fused_unfold(bb.nodes, const, w_state, w_agg, o, 5, act, tiles_per_step=tps)
                out, _, _ = gnn.apply_output(v, state, bb, training=False, rng=None)
                return acc + jnp.sum(out)

            return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros(()))

        return fused_fwd

    results = {}
    t = timed(xla_train_fwd, variables, batch)
    results["xla train-path fwd"] = t
    t = timed(xla_fwd, variables, batch)
    results["xla eval fwd"] = t
    for name, op in ops.items():
        for tps in (1, 4, 8):
            fn = make_fused(op, tps)
            t = timed(fn, variables, batch, op.blocks)
            results[f"fused {name} tps={tps}"] = t

    for k, v in results.items():
        print(f"{k:28s} {v*1e3:8.3f} ms/fwd   {5*n_arcs/v/1e9:7.2f} B edges/s")


if __name__ == "__main__":
    import signal

    def _watchdog(signum, frame):
        raise TimeoutError("bench watchdog")

    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(3000)
    main()
