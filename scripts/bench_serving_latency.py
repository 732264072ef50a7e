"""Small-request serving latency: XLA eval forward vs the fused whole-unfold
kernel (ops/fused.py), at request sizes of 1-32 molecule graphs.

The fused kernel collapses the 5-iteration unfolding (≈ 60 HLO programs:
einsums, BN, dense, predicate machinery) into ONE kernel launch — at small
shapes per-program dispatch dominates device time, which is exactly the
serving regime.  Protocol: K repetitions inside one jit, threaded data
dependence, sync-floor subtraction (BASELINE.md measurement notes).
"""

import time

import numpy as np

REPEATS = 3000


def main():
    import jax
    import jax.numpy as jnp

    from gnnkeras_tpu.data.mutag import load_mutag
    from gnnkeras_tpu.graph.batch import from_graph_object
    from gnnkeras_tpu.graph.graph import GraphObject
    from gnnkeras_tpu.models.gnn import GNNgraphBased
    from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
    from gnnkeras_tpu.ops.fused import (
        D_SUB,
        build_fused_diag,
        build_fused_diag_t,
        fused_unfold,
        fused_unfold_t,
    )

    graphs = load_mutag()
    ins, ls = get_inout_dims("state", 14, 3, 2, "g", 0)
    ino, lo = get_inout_dims("output", 14, 3, 2, "g", 0)
    net_st = MLP(input_dim=ins[0], layers=ls, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=ino[0], layers=lo, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = GNNgraphBased(net_st, net_out, 0, 5, 0.0)
    gnn.build(seed=0)
    v = gnn.variables

    sync_probe = jax.jit(lambda x: jnp.sum(x))
    _ = float(sync_probe(jnp.ones(8)))

    def floor():
        fs = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(sync_probe(jnp.ones(8)))
            fs.append(time.perf_counter() - t0)
        return float(np.median(fs))

    def timed(fn, *args):
        _ = float(fn(*args))
        f = floor()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return (max(float(np.median(ts)) - f, 1e-9)) / REPEATS

    for n_req in (1, 4, 16, 32, 128):
        merged = GraphObject.merge(
            [g.copy() for g in graphs[:n_req]], focus="g", aggregation_mode="average"
        ) if n_req > 1 else graphs[0]
        batch = from_graph_object(merged, tile_pack=(n_req > 1))
        a = merged.arcs.shape[0]
        op = build_fused_diag(
            np.asarray(batch.arc_src)[:a], np.asarray(batch.arc_dst)[:a],
            np.asarray(batch.arcnode_weight)[:a], batch.num_nodes, dtype=jnp.bfloat16,
        )

        @jax.jit
        def xla_fwd(v, b):
            def body(i, carry):
                acc = carry
                bb = b.replace(nodes=b.nodes + acc * 1e-30)
                _, state, _ = gnn.unfold(v, bb, training=False)
                out, _, _ = gnn.apply_output(v, state, bb, training=False, rng=None)
                return acc + jnp.sum(out)

            return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros(()))

        folded = gnn.fold_transition(v)
        w_state, w_agg, w_arc, bias, act = folded

        @jax.jit
        def fused_fwd(v, b, blocks):
            import dataclasses

            o = dataclasses.replace(op, blocks=blocks)

            def body(i, carry):
                acc = carry
                bb = b.replace(nodes=b.nodes + acc * 1e-30)
                const = bb.agg_arc_labels @ w_arc + bias
                state = fused_unfold(bb.nodes, const, w_state, w_agg, o, 5, act, tiles_per_step=1)
                out, _, _ = gnn.apply_output(v, state, bb, training=False, rng=None)
                return acc + jnp.sum(out)

            return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros(()))

        op_t = build_fused_diag_t(
            np.asarray(batch.arc_src)[:a], np.asarray(batch.arc_dst)[:a],
            np.asarray(batch.arcnode_weight)[:a], batch.num_nodes, dtype=jnp.bfloat16,
        )
        d = batch.nodes.shape[1]
        h = int(bias.shape[0])
        d_pad = -(-max(d, h) // D_SUB) * D_SUB
        nodes_t_host = np.zeros((d_pad, batch.num_nodes), np.float32)
        nodes_t_host[:d] = np.asarray(batch.nodes).T
        agg_arcs_t_host = np.ascontiguousarray(np.asarray(batch.agg_arc_labels).T)

        @jax.jit
        def fused_t_fwd(v, b, blocks_t, nodes_t, agg_arcs_t):
            import dataclasses

            o = dataclasses.replace(op_t, blocks=blocks_t)
            # serving.Predictor's in-jit prologue: pad the tiny folded
            # arc weight instead of the (N, h) const (host pre-transposes)
            w_arc_p = jnp.pad(w_arc, ((0, 0), (0, d_pad - h)))
            bias_p = jnp.pad(bias, (0, d_pad - h))

            def body(i, carry):
                acc = carry
                nt = nodes_t + acc * 1e-30
                bb = b.replace(nodes=b.nodes + acc * 1e-30)
                const_t = w_arc_p.T @ agg_arcs_t + bias_p[:, None]
                state_t = fused_unfold_t(nt, const_t, w_state, w_agg, o, 5, act)
                state = state_t.T[:, :h]
                out, _, _ = gnn.apply_output(v, state, bb, training=False, rng=None)
                return acc + jnp.sum(out)

            return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros(()))

        t_xla = timed(xla_fwd, v, batch)
        t_fused = timed(fused_fwd, v, batch, op.blocks)
        t_fused_t = timed(fused_t_fwd, v, batch, op_t.blocks, nodes_t_host, agg_arcs_t_host)
        tiles = batch.num_nodes // 128
        print(
            f"request={n_req:4d} graphs ({tiles:3d} tiles): "
            f"xla {t_xla*1e6:8.1f} us   fused {t_fused*1e6:8.1f} us   "
            f"fused_t {t_fused_t*1e6:8.1f} us   "
            f"speedup(t) {t_xla/t_fused_t:5.2f}x"
        )


if __name__ == "__main__":
    import signal

    def _w(s, f):
        raise TimeoutError("watchdog")

    signal.signal(signal.SIGALRM, _w)
    signal.alarm(3000)
    main()
