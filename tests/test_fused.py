"""Fused whole-unfold Pallas kernel (ops/fused.py) vs the XLA unfolding.

The fused path must reproduce the inference-mode unfold exactly (f32 blocks)
on tile-packed block-diagonal batches, and to bf16 tolerance with bf16
blocks; construction must refuse graphs with cross-tile edges.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNgraphBased, GNNnodeBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.ops.fused import build_fused_diag, fused_unfold


def _random_graphs(n_graphs=40, seed=0, dn=14, da=3, t_dim=2, focus="g"):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(5, 40))
        nodes = np.eye(dn, dtype=np.float32)[rng.integers(0, dn, n)]
        a = int(rng.integers(n, 3 * n))
        src = rng.integers(0, n, a)
        dst = rng.integers(0, n, a)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        if len(src) == 0:
            src, dst = np.array([0]), np.array([1 % n])
        arcs = np.concatenate(
            [np.stack([src, dst], 1), np.eye(da, dtype=np.float32)[rng.integers(0, da, len(src))]], 1
        )
        if focus == "g":
            targets = np.eye(t_dim, dtype=np.float32)[rng.integers(0, t_dim, 1)]
        else:
            targets = np.eye(t_dim, dtype=np.float32)[rng.integers(0, t_dim, n)]
        graphs.append(
            GraphObject(nodes=nodes, arcs=arcs, targets=targets, focus=focus, aggregation_mode="average")
        )
    return graphs


def _starter_gnn(cls=GNNgraphBased, focus="g", max_iter=5, seed=0):
    ins, ls = get_inout_dims("state", 14, 3, 2, focus, 0)
    ino, lo = get_inout_dims("output", 14, 3, 2, focus, 0)
    net_st = MLP(input_dim=ins[0], layers=ls, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=ino[0], layers=lo, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = cls(net_st, net_out, 0, max_iter, 0.0)
    gnn.build(seed=seed)
    # move the BN moving stats off their init so folding is actually exercised
    rng = np.random.default_rng(seed + 1)
    st = gnn.variables["state"]["net_state"][0]
    st["moving_mean"] = jnp.asarray(rng.normal(0, 0.3, 31).astype(np.float32))
    st["moving_var"] = jnp.asarray(rng.uniform(0.5, 2.0, 31).astype(np.float32))
    return gnn


def _packed_batch_and_op(graphs, dtype):
    merged = GraphObject.merge(graphs, focus=graphs[0].focus, aggregation_mode="average")
    batch = from_graph_object(merged, tile_pack=True)
    a = merged.arcs.shape[0]
    op = build_fused_diag(
        np.asarray(batch.arc_src)[:a], np.asarray(batch.arc_dst)[:a],
        np.asarray(batch.arcnode_weight)[:a], batch.num_nodes, dtype=dtype,
    )
    return batch, op


class TestFusedUnfold:
    def test_f32_matches_xla_eval_forward(self):
        graphs = _random_graphs()
        gnn = _starter_gnn()
        batch, op = _packed_batch_and_op(graphs, jnp.float32)
        assert op is not None
        k, state_ref, _ = gnn.unfold(gnn.variables, batch, training=False)
        out_ref, out_mask, _ = gnn.apply_output(gnn.variables, state_ref, batch, training=False, rng=None)
        state, out, om = gnn.forward_fused(gnn.variables, batch, op)
        m = np.asarray(batch.node_mask)
        np.testing.assert_allclose(np.asarray(state)[m], np.asarray(state_ref)[m], rtol=2e-5, atol=2e-6)
        gm = np.asarray(out_mask)
        np.testing.assert_allclose(np.asarray(out)[gm], np.asarray(out_ref)[gm], rtol=2e-5, atol=2e-6)

    def test_bf16_close_and_same_predictions(self):
        graphs = _random_graphs(seed=3)
        gnn = _starter_gnn(seed=3)
        batch, op = _packed_batch_and_op(graphs, jnp.bfloat16)
        k, state_ref, _ = gnn.unfold(gnn.variables, batch, training=False)
        out_ref, out_mask, _ = gnn.apply_output(gnn.variables, state_ref, batch, training=False, rng=None)
        state, out, _ = gnn.forward_fused(gnn.variables, batch, op)
        m = np.asarray(batch.node_mask)
        # bf16 mantissa ~8 bits compounded over 5 iterations
        err = np.abs(np.asarray(state)[m] - np.asarray(state_ref)[m])
        scale = np.abs(np.asarray(state_ref)[m]).mean()
        assert err.max() < 0.15 * max(scale, 1.0)
        gm = np.asarray(out_mask)
        agree = (np.asarray(out)[gm].argmax(1) == np.asarray(out_ref)[gm].argmax(1)).mean()
        assert agree > 0.98

    def test_tiles_per_step_variants_identical(self):
        graphs = _random_graphs(seed=5, n_graphs=20)
        gnn = _starter_gnn(seed=5)
        batch, op = _packed_batch_and_op(graphs, jnp.float32)
        folded = gnn.fold_transition(gnn.variables)
        w_state, w_agg, w_arc, bias, act = folded
        const = batch.agg_arc_labels @ w_arc + bias
        outs = [
            np.asarray(fused_unfold(batch.nodes, const, w_state, w_agg, op, 5, act, tiles_per_step=tps))
            for tps in (1, 3, 8)
        ]
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-6, atol=1e-7)

    def test_cross_tile_edges_refused(self):
        src = np.array([0, 130])
        dst = np.array([130, 0])
        w = np.ones(2)
        assert build_fused_diag(src, dst, w, 256) is None

    def test_fold_transition_rejects_deep_nets(self):
        net_st = MLP(input_dim=(31,), layers=[16, 14], activations="selu")
        net_out = MLP(input_dim=(14,), layers=[2], activations="softmax")
        gnn = GNNnodeBased(net_st, net_out, 0, 5, 0.0)
        gnn.build(seed=0)
        assert gnn.fold_transition(gnn.variables) is None

    def test_fold_transition_rejects_dim_state(self):
        ins, ls = get_inout_dims("state", 14, 3, 2, "n", 5)
        net_st = MLP(input_dim=ins[0], layers=ls, activations="selu")
        net_out = MLP(input_dim=(5 + 14,), layers=[2], activations="softmax")
        gnn = GNNnodeBased(net_st, net_out, 5, 5, 0.0)
        gnn.build(seed=0)
        assert gnn.fold_transition(gnn.variables) is None

    def test_node_focus_fused(self):
        graphs = _random_graphs(seed=7, n_graphs=15, focus="n")
        gnn = _starter_gnn(cls=GNNnodeBased, focus="n", seed=7)
        merged = GraphObject.merge(graphs, focus="n", aggregation_mode="average")
        batch = from_graph_object(merged, tile_pack=True)
        a = merged.arcs.shape[0]
        op = build_fused_diag(
            np.asarray(batch.arc_src)[:a], np.asarray(batch.arc_dst)[:a],
            np.asarray(batch.arcnode_weight)[:a], batch.num_nodes, dtype=jnp.float32,
        )
        # node-focused merges don't tile-pack (packing is a graph-focus
        # optimization) — identity layout still yields a diagonal operator
        # only if no graph straddles; skip if it does
        if op is None:
            pytest.skip("straddling graphs under identity layout")
        k, state_ref, _ = gnn.unfold(gnn.variables, batch, training=False)
        out_ref, out_mask, _ = gnn.apply_output(gnn.variables, state_ref, batch, training=False, rng=None)
        state, out, _ = gnn.forward_fused(gnn.variables, batch, op)
        m = np.asarray(batch.node_mask)
        np.testing.assert_allclose(np.asarray(state)[m], np.asarray(state_ref)[m], rtol=2e-5, atol=2e-6)


class TestFusedUnfoldTransposed:
    """The transposed whole-unfold kernel (round 3 production serving path):
    feature-major state, src-rows × dst-cols blocks, K_TILES grid blocking
    with build-time pre-padding."""

    @staticmethod
    def _op_t(batch, merged, dtype):
        from gnnkeras_tpu.ops.fused import build_fused_diag_t

        a = merged.arcs.shape[0]
        return build_fused_diag_t(
            np.asarray(batch.arc_src)[:a], np.asarray(batch.arc_dst)[:a],
            np.asarray(batch.arcnode_weight)[:a], batch.num_nodes, dtype=dtype,
        )

    def _run(self, gnn, batch, op):
        from gnnkeras_tpu.ops.fused import D_SUB, fused_unfold_t

        w_state, w_agg, w_arc, bias, act = gnn.fold_transition(gnn.variables)
        d, h = batch.nodes.shape[1], int(bias.shape[0])
        d_pad = -(-max(d, h) // D_SUB) * D_SUB
        nodes_t = np.zeros((d_pad, batch.num_nodes), np.float32)
        nodes_t[:d] = np.asarray(batch.nodes).T
        const = np.asarray(batch.agg_arc_labels @ w_arc + bias)
        const_t = np.zeros((d_pad, batch.num_nodes), np.float32)
        const_t[:h] = const.T
        out_t = fused_unfold_t(
            jnp.asarray(nodes_t), jnp.asarray(const_t), w_state, w_agg, op,
            gnn.max_iteration, act,
        )
        return np.asarray(out_t).T[:, :h]

    def test_f32_matches_xla_eval_forward(self):
        graphs = _random_graphs(seed=7)
        gnn = _starter_gnn(seed=7)
        merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
        batch = from_graph_object(merged, tile_pack=True)
        op = self._op_t(batch, merged, jnp.float32)
        assert op is not None
        _, state_ref, _ = gnn.unfold(gnn.variables, batch, training=False)
        state = self._run(gnn, batch, op)
        m = np.asarray(batch.node_mask)
        np.testing.assert_allclose(state[m], np.asarray(state_ref)[m], rtol=2e-5, atol=2e-6)

    def test_pre_padded_grid_many_tiles(self):
        """>K_TILES, non-multiple tile count: blocks pre-pad to the K_TILES
        multiple and the output slices back to the true N."""
        from gnnkeras_tpu.ops.fused import K_TILES

        graphs = _random_graphs(seed=11, n_graphs=130)
        gnn = _starter_gnn(seed=11, max_iter=2)
        merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
        batch = from_graph_object(merged, tile_pack=True)
        t = batch.num_nodes // 128
        assert t > K_TILES, f"workload too small ({t} tiles) to exercise the pad path"
        op = self._op_t(batch, merged, jnp.float32)
        assert op is not None and op.blocks.shape[0] % min(K_TILES, t) == 0
        assert op.blocks.shape[0] >= t
        _, state_ref, _ = gnn.unfold(gnn.variables, batch, training=False)
        state = self._run(gnn, batch, op)
        m = np.asarray(batch.node_mask)
        np.testing.assert_allclose(state[m], np.asarray(state_ref)[m], rtol=2e-5, atol=2e-6)

    def test_cross_tile_edges_refused(self):
        from gnnkeras_tpu.ops.fused import build_fused_diag_t

        assert build_fused_diag_t(
            np.array([0, 130]), np.array([130, 0]), np.ones(2), 256
        ) is None
