"""Transposed (feature-major) unfold engine vs the row-major engine.

The transposed engine (models/gnn.py _unfold_transposed) carries state as
(d_pad, N) through the whole convergence loop so the compact-strip Pallas
aggregation (ops/strip.py) never relayouts at the kernel boundary.  Its
semantics must match the row-major engine — same reference computation
(GNN/Models/GNN.py:217-236) — up to f32 reduction order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.data.mutag import load_mutag
from gnnkeras_tpu.graph.batch import graphs_to_batch
from gnnkeras_tpu.models.gnn import GNNgraphBased, GNNnodeBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims


def build_model(threshold=0.0, per_iteration_bn=False, cls=GNNgraphBased, seed=0):
    inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", 0)
    inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", 0)
    net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = cls(net_st, net_out, 0, 5, threshold, per_iteration_bn=per_iteration_bn)
    gnn.build(seed=seed)
    return gnn


@pytest.fixture(scope="module")
def slot_batch():
    graphs = load_mutag()[:300]
    return graphs_to_batch(graphs, "g", "average", slot_pack=32)


class TestEngineEquality:
    @pytest.mark.parametrize("training", [False, True])
    @pytest.mark.parametrize("threshold", [0.0, 0.01])
    def test_unfold_matches_row_major(self, slot_batch, training, threshold):
        gnn = build_model(threshold=threshold)
        gnn.transposed = False
        k1, s1, bn1 = gnn.unfold(gnn.variables, slot_batch, training=training)
        gnn.transposed = True
        k2, s2, bn2 = gnn.unfold(gnn.variables, slot_batch, training=training)
        assert float(k1) == float(k2)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(bn1), jax.tree_util.tree_leaves(bn2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_per_iteration_bn_matches(self, slot_batch):
        gnn = build_model(per_iteration_bn=True)
        gnn.transposed = False
        k1, s1, bn1 = gnn.unfold(gnn.variables, slot_batch, training=True)
        gnn.transposed = True
        k2, s2, bn2 = gnn.unfold(gnn.variables, slot_batch, training=True)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(bn1), jax.tree_util.tree_leaves(bn2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_gradients_match(self, slot_batch):
        gnn = build_model()

        def loss_fn(params, transposed):
            gnn.transposed = transposed
            variables = {"params": params, "state": gnn.variables["state"]}
            _, _, out, mask, _ = gnn.forward(variables, slot_batch, training=True)
            return jnp.sum(
                jnp.where(slot_batch.target_mask[:, None], (out - slot_batch.targets) ** 2, 0.0)
            )

        g1 = jax.grad(loss_fn)(gnn.variables["params"], False)
        g2 = jax.grad(loss_fn)(gnn.variables["params"], True)
        for l1, l2 in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            denom = float(jnp.abs(l1).max()) + 1e-12
            assert float(jnp.abs(l1 - l2).max()) / denom < 1e-3

    def test_bcsr_auto_follows_state_width(self):
        """Plain-BCSR auto-selection is COMPUTED from the measured decision
        variable — the padded state feature width (BASELINE.md round 4:
        transposed wins/ties through sd_pad 32, loses at 64) — not
        hardcoded; transposed=True/False force, and True raises only when
        the batch carries no block operator at all."""
        from gnnkeras_tpu.models.gnn import _TRANSPOSED_BCSR_MAX_STATE_DIM

        graphs = load_mutag()[:50]
        batch = graphs_to_batch(graphs, "g", "average", tile_pack=True)
        gnn = build_model()
        assert gnn._use_transposed(batch)  # d=14 → sd_pad 16 ≤ 32: engage
        gnn.transposed = True
        assert gnn._use_transposed(batch)  # explicit force → BCSR path
        gnn.transposed = False
        assert not gnn._use_transposed(batch)
        gnn.transposed = None
        # wide-state models stay row-major (measured 0.75x at ds=64)
        from gnnkeras_tpu.models.gnn import GNNnodeBased as _GNNn
        from gnnkeras_tpu.models.mlp import MLP as _MLP, get_inout_dims as _dims

        ds = _TRANSPOSED_BCSR_MAX_STATE_DIM + 32
        ins, ls = _dims("state", 14, 3, 2, "n", ds)
        ino, lo = _dims("output", 14, 3, 2, "n", ds)
        wide = _GNNn(_MLP(input_dim=ins[0], layers=ls, activations="selu"),
                     _MLP(input_dim=ino[0], layers=lo, activations="softmax"),
                     ds, 3, 0.01)
        wide.build(seed=0)
        assert not wide._use_transposed(batch)
        edge_batch = graphs_to_batch(graphs, "g", "average", dense_blocks=False)
        gnn.transposed = True
        with pytest.raises(ValueError):
            gnn.unfold(gnn.variables, edge_batch)

    def test_node_focus(self):
        from gnnkeras_tpu.graph.graph import GraphObject

        rng = np.random.default_rng(7)
        graphs = []
        for _ in range(40):
            n = int(rng.integers(5, 60))
            a = int(rng.integers(n, 3 * n))
            arcs = np.concatenate(
                [rng.integers(0, n, (a, 2)), rng.normal(size=(a, 3))], axis=1
            )
            graphs.append(
                GraphObject(
                    nodes=rng.normal(size=(n, 14)),
                    arcs=arcs,
                    targets=np.ones((n, 2)),
                    focus="n",
                    aggregation_mode="average",
                )
            )
        batch = graphs_to_batch(graphs, "n", "average", slot_pack=32)
        gnn = build_model(cls=GNNnodeBased)
        gnn.transposed = False
        _, s1, _ = gnn.unfold(gnn.variables, batch, training=False)
        gnn.transposed = True
        _, s2, _ = gnn.unfold(gnn.variables, batch, training=False)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)

    def test_arc_focus_readout_rows_parity(self):
        """Arc-focused slot-packed batches: tile packing permutes NODE rows
        but arc rows stay in canonical order (batch.py _scatter_targets:
        focus 'a' scatters by out_idx, not pos) — the transposed engine's
        full forward must match the row-major forward ROW-FOR-ROW on arc
        rows, and both must match the unpacked batch in caller order
        (VERDICT r4 next-step #1 arc parity condition)."""
        import jax

        from gnnkeras_tpu.graph.graph import GraphObject
        from gnnkeras_tpu.models.gnn import GNNarcBased

        rng = np.random.default_rng(11)
        graphs = []
        for _ in range(24):
            n = int(rng.integers(5, 40))
            a = int(rng.integers(n, 3 * n))
            pairs = np.unique(np.stack([rng.integers(0, n, a), rng.integers(0, n, a)], 1), axis=0)
            arcs = np.concatenate([pairs.astype(np.float64), rng.normal(size=(len(pairs), 3))], axis=1)
            g_tmp = GraphObject(nodes=rng.normal(size=(n, 14)), arcs=arcs,
                                targets=np.ones((1, 1)), focus="g")
            graphs.append(GraphObject(
                nodes=g_tmp.nodes, arcs=g_tmp.arcs,
                targets=rng.normal(size=(g_tmp.arcs.shape[0], 2)),
                focus="a", aggregation_mode="average", arcs_canonical=True,
            ))
        merged = GraphObject.merge(graphs, focus="a", aggregation_mode="average")
        inp_s, ls = get_inout_dims("state", 14, 3, 2, "a", 0)
        inp_o, lo = get_inout_dims("output", 14, 3, 2, "a", 0)
        gnn = GNNarcBased(
            MLP(input_dim=inp_s[0], layers=ls, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
            MLP(input_dim=inp_o[0], layers=lo, activations="softmax",
                kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
            0, 5, 0.0,
        )
        gnn.build(seed=0)

        packed = graphs_to_batch([merged], "a", "average", slot_pack=128, strip_dtype="int8")
        assert packed.strip is not None and packed.strip.scale is not None
        plain = graphs_to_batch([merged], "a", "average")

        rng_k = jax.random.PRNGKey(3)
        gnn.transposed = None
        assert gnn._use_transposed(packed)
        _, _, out_t, mask_t, _ = gnn.forward(gnn.variables, packed, training=False, rng=rng_k)
        gnn.transposed = False
        _, _, out_r, mask_r, _ = gnn.forward(gnn.variables, packed, training=False, rng=rng_k)
        np.testing.assert_array_equal(np.asarray(mask_t), np.asarray(mask_r))
        np.testing.assert_allclose(
            np.asarray(out_t)[np.asarray(mask_t)], np.asarray(out_r)[np.asarray(mask_r)],
            rtol=2e-5, atol=2e-6,
        )
        # caller-order parity vs the unpacked batch: arc rows are identical
        _, _, out_p, mask_p, _ = gnn.forward(gnn.variables, plain, training=False, rng=rng_k)
        a_rows = merged.arcs.shape[0]
        np.testing.assert_allclose(
            np.asarray(out_t)[:a_rows], np.asarray(out_p)[:a_rows], rtol=2e-4, atol=2e-5,
        )


class TestDimStateTransposed:
    """dim_state>0 through the transposed engine: random state init drawn in
    row order and transposed, the wider transition input ([state | labels |
    Σstate | Σlabels | Σarcs], GNN/Models/GNN.py:221-231) stacked
    feature-major — both engines consume identical randomness and must agree."""

    def build(self, ds=10, threshold=0.01, per_iteration_bn=False):
        inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", ds)
        inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", ds)
        net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                     kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                      kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        gnn = GNNgraphBased(net_st, net_out, ds, 5, threshold,
                            per_iteration_bn=per_iteration_bn)
        gnn.build(seed=3)
        return gnn

    @pytest.mark.parametrize("training", [False, True])
    @pytest.mark.parametrize("threshold", [0.0, 0.01])
    def test_unfold_matches_row_major(self, slot_batch, training, threshold):
        gnn = self.build(threshold=threshold)
        rng = jax.random.PRNGKey(42)
        gnn.transposed = False
        k1, s1, bn1 = gnn.unfold(gnn.variables, slot_batch, training=training, rng=rng)
        gnn.transposed = True
        k2, s2, bn2 = gnn.unfold(gnn.variables, slot_batch, training=training, rng=rng)
        assert float(k1) == float(k2)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(bn1), jax.tree_util.tree_leaves(bn2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_requires_rng(self, slot_batch):
        gnn = self.build()
        gnn.transposed = True
        with pytest.raises(ValueError, match="rng"):
            gnn.unfold(gnn.variables, slot_batch, training=False, rng=None)

    def test_gradients_match(self, slot_batch):
        gnn = self.build()
        rng = jax.random.PRNGKey(7)

        def loss_fn(params, transposed):
            gnn.transposed = transposed
            variables = {"params": params, "state": gnn.variables["state"]}
            _, _, out, mask, _ = gnn.forward(variables, slot_batch, training=True, rng=rng)
            return jnp.sum(
                jnp.where(slot_batch.target_mask[:, None], (out - slot_batch.targets) ** 2, 0.0)
            )

        g1 = jax.grad(loss_fn)(gnn.variables["params"], False)
        g2 = jax.grad(loss_fn)(gnn.variables["params"], True)
        for l1, l2 in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            denom = float(jnp.abs(l1).max()) + 1e-12
            assert float(jnp.abs(l1 - l2).max()) / denom < 2e-3


class TestCompositeTransposed:
    """Composite (per-type state nets) through the feature-major engine —
    both the plain-BCSR opt-in and the slot-packed strip auto path must match
    the row-major composite unfold (CompositeGNN.py:215-234 semantics)."""

    def _multi_type(self):
        from gnnkeras_tpu.graph.batch import from_graph_object
        from gnnkeras_tpu.graph.graph import CompositeGraphObject
        from gnnkeras_tpu.models.composite import CompositeGNNnodeBased

        rng = np.random.default_rng(5)
        n, a, n_types, ds = 80, 320, 3, 6
        dims = (4, 3, 5)
        nodes = rng.normal(size=(n, max(dims)))
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
        tm = np.zeros((n, n_types), dtype=bool)
        tm[np.arange(n), rng.integers(0, n_types, n)] = True
        g = CompositeGraphObject(
            nodes=nodes, arcs=arcs, targets=rng.normal(size=(n, 2)), type_mask=tm,
            dim_node_label=dims, focus="n", aggregation_mode="composite_average",
        )
        batch = from_graph_object(g)
        inp_s, layers_s = get_inout_dims(
            "state", dims, g.DIM_ARC_LABEL, g.DIM_TARGET, "n", ds
        )
        nets = [MLP(input_dim=shape, layers=layers_s, activations="selu",
                    kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
                for shape in inp_s]
        ot = MLP(input_dim=(ds,), layers=[2], activations="softmax",
                 kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        cgnn = CompositeGNNnodeBased(nets, ot, ds, 4, 0.01)
        cgnn.build(seed=11)
        return cgnn, batch

    @pytest.mark.parametrize("training", [False, True])
    def test_multi_type_bcsr_matches_row_major(self, training):
        cgnn, batch = self._multi_type()
        assert batch.bcsr is not None and batch.strip is None
        cgnn.transposed = False  # start from the row-major engine explicitly
        rng = jax.random.PRNGKey(9)
        k1, s1, bn1 = cgnn.unfold(cgnn.variables, batch, training=training, rng=rng)
        cgnn.transposed = True
        k2, s2, bn2 = cgnn.unfold(cgnn.variables, batch, training=training, rng=rng)
        cgnn.transposed = None
        assert float(k1) == float(k2)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(bn1), jax.tree_util.tree_leaves(bn2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)

    def test_multi_type_gradients_match(self):
        cgnn, batch = self._multi_type()
        rng = jax.random.PRNGKey(13)

        def loss_fn(params, transposed):
            cgnn.transposed = transposed
            k, s, _ = cgnn.unfold(
                {"params": params, "state": cgnn.variables["state"]},
                batch, training=True, rng=rng,
            )
            cgnn.transposed = None
            return jnp.sum(jnp.where(batch.node_mask[:, None], s, 0.0) ** 2)

        g1 = jax.grad(lambda p: loss_fn(p, False))(cgnn.variables["params"])
        g2 = jax.grad(lambda p: loss_fn(p, True))(cgnn.variables["params"])
        for l1, l2 in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            denom = float(jnp.abs(l1).max()) + 1e-12
            assert float(jnp.abs(l1 - l2).max()) / denom < 2e-3

    def test_mutag_composite_strip_auto(self):
        """Slot-packed composite MUTAG batch: AUTO engages the transposed
        engine (strip present) and matches the forced row-major result in the
        starter_composite config family (1 type, dim_state=10)."""
        from gnnkeras_tpu.data.mutag import load_mutag
        from gnnkeras_tpu.models.composite import CompositeGNNgraphBased

        graphs = load_mutag(composite=True)[:200]
        batch = graphs_to_batch(graphs, "g", "average", slot_pack=32)
        assert batch.strip is not None and batch.type_mask is not None
        ds = 10
        inp_s, layers_s = get_inout_dims("state", (14,), 3, 2, "g", ds)
        nets = [MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                    kernel_initializer="lecun_normal", bias_initializer="lecun_normal")]
        ot = MLP(input_dim=(ds,), layers=[2], activations="softmax",
                 kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        cgnn = CompositeGNNgraphBased(nets, ot, ds, 5, 0.01)
        cgnn.build(seed=2)
        assert cgnn._use_transposed(batch)
        rng = jax.random.PRNGKey(3)
        k2, s2, bn2 = cgnn.unfold(cgnn.variables, batch, training=True, rng=rng)
        cgnn.transposed = False
        k1, s1, bn1 = cgnn.unfold(cgnn.variables, batch, training=True, rng=rng)
        assert float(k1) == float(k2)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(bn1), jax.tree_util.tree_leaves(bn2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


class TestApplyT:
    """MLP.apply_t == MLP.apply with the axes swapped."""

    @pytest.mark.parametrize("training", [False, True])
    def test_matches_apply(self, training):
        mlp = MLP(input_dim=31, layers=[20, 14], activations=["selu", "softmax"],
                  kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        variables = mlp.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        x = rng.normal(size=(200, 31)).astype(np.float32)
        mask = rng.random(200) < 0.8
        y1, bn1 = mlp.apply(variables, jnp.asarray(x), training=training, mask=jnp.asarray(mask))
        y2, bn2 = mlp.apply_t(variables, jnp.asarray(x.T.copy()), training=training,
                              mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2).T, rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(bn1), jax.tree_util.tree_leaves(bn2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_softmax_normalizes_features(self):
        mlp = MLP(input_dim=5, layers=[4], activations="softmax",
                  batch_normalization=False)
        variables = mlp.init(jax.random.PRNGKey(1))
        x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 7)).astype(np.float32))
        y, _ = mlp.apply_t(variables, x)
        np.testing.assert_allclose(np.asarray(jnp.sum(y, axis=0)), np.ones(7), rtol=1e-5)


class TestTransposedOverBcsr:
    """transposed=True engages the feature-major engine over plain BCSR
    operators (no slot packing — single large graphs); auto stays strip-only."""

    def test_bcsr_transposed_matches_row_major(self):
        from gnnkeras_tpu.graph.batch import from_graph_object
        from gnnkeras_tpu.graph.graph import GraphObject
        from gnnkeras_tpu.models.gnn import GNNnodeBased
        from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

        rng = np.random.default_rng(0)
        n, a, dn, da, T = 300, 1400, 8, 2, 2
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, da))], axis=1)
        g = GraphObject(nodes=rng.normal(size=(n, dn)), arcs=arcs,
                        targets=rng.normal(size=(n, T)), focus="n", aggregation_mode="average")
        batch = from_graph_object(g)
        assert batch.strip is None and batch.bcsr is not None
        ins, ls = get_inout_dims("state", dn, da, T, "n", 0)
        ino, lo = get_inout_dims("output", dn, da, T, "n", 0)
        gnn = GNNnodeBased(MLP(input_dim=ins[0], layers=ls, activations="selu"),
                           MLP(input_dim=ino[0], layers=lo, activations="softmax"), 0, 5, 0.01)
        gnn.build(seed=0)
        for training in (False, True):
            gnn.transposed = False
            k1, s1, _ = gnn.unfold(gnn.variables, batch, training=training)
            gnn.transposed = True
            k2, s2, _ = gnn.unfold(gnn.variables, batch, training=training)
            gnn.transposed = None
            assert float(k1) == float(k2)
            np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=2e-4, atol=1e-5)

        # backward path (autodiff through bcsr_aggregate_t)
        def loss(p, transposed):
            gnn.transposed = transposed
            k, s, _ = gnn.unfold({"params": p, "state": gnn.variables["state"]}, batch, training=True)
            gnn.transposed = None
            return jnp.sum(s ** 2)

        g1 = jax.grad(lambda p: loss(p, False))(gnn.variables["params"])
        g2 = jax.grad(lambda p: loss(p, True))(gnn.variables["params"])
        for x, y in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=2e-3, atol=2e-3)


class TestSlotPackedSequencer:
    """MultiGraphSequencer(slot_pack=128): the standard fit surface builds
    strip-operator batches so training runs the transposed engine — with
    uniform pytrees across batches (residual padded to the identity operator
    where a merge produced no cross-tile edges)."""

    def _graphs(self, n_graphs=24, big_every=0, seed=11):
        from gnnkeras_tpu.graph.graph import GraphObject

        rng = np.random.default_rng(seed)
        graphs = []
        for i in range(n_graphs):
            n = 200 if (big_every and i % big_every == 0) else int(rng.integers(8, 40))
            a = int(rng.integers(n, 3 * n))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 3))], axis=1)
            t = np.zeros((1, 2)); t[0, i % 2] = 1
            graphs.append(GraphObject(nodes=rng.normal(size=(n, 14)), arcs=arcs,
                                      targets=t, focus="g", aggregation_mode="average"))
        return graphs

    def test_batches_carry_strip_uniformly(self):
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer

        # every 6th graph has 200 nodes → spans tiles → some merges carry a
        # cross-tile residual, others don't; structure must still be uniform
        seq = MultiGraphSequencer(self._graphs(24, big_every=6), "g", "average",
                                  batch_size=6, shuffle=False, slot_pack=128,
                                  strip_dtype="float32")
        tds = {jax.tree_util.tree_structure(b) for b in seq.batches}
        assert len(tds) == 1
        for b in seq.batches:
            assert b.strip is not None and b.compact_readout is not None
            assert b.strip.residual is not None  # padded-uniform (some real)

    def test_fit_matches_row_major(self):
        """One epoch through the slot-packed sequencer (transposed engine)
        reaches the same parameters as the forced row-major engine on the
        SAME batches — the engine swap is semantics-free end-to-end."""
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer

        graphs = self._graphs(18, big_every=5, seed=12)

        def run(force_row_major):
            gnn = build_model(threshold=0.01)
            gnn.compile(optimizer="sgd:0.1", loss="categorical_crossentropy")
            if force_row_major:
                gnn.transposed = False
            seq = MultiGraphSequencer(graphs, "g", "average", batch_size=6,
                                      shuffle=False, slot_pack=128,
                                      strip_dtype="float32")
            gnn.fit(seq, epochs=1, verbose=0, seed=5)
            return gnn.variables["params"]

        p_t = run(False)
        p_r = run(True)
        for a, b in zip(jax.tree_util.tree_leaves(p_t), jax.tree_util.tree_leaves(p_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)

    def test_node_focus_predict_order_matches_plain(self):
        """Round 5 made slot-packed strips the default for node focus: the
        tile-pack node-row permutation must stay invisible to users —
        ``predict`` through a strip sequencer returns the same rows in the
        same caller order as the plain (unpacked, no-tile-pack) sequencer."""
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
        from gnnkeras_tpu.graph.graph import GraphObject
        from gnnkeras_tpu.models.gnn import GNNnodeBased
        from gnnkeras_tpu.models.mlp import get_inout_dims as _dims

        rng = np.random.default_rng(23)
        graphs = []
        for _ in range(10):
            n = int(rng.integers(5, 30))
            a = int(rng.integers(n, 3 * n))
            pairs = np.unique(np.stack([rng.integers(0, n, a), rng.integers(0, n, a)], 1), axis=0)
            arcs = np.concatenate([pairs.astype(np.float64), rng.normal(size=(len(pairs), 3))], 1)
            graphs.append(GraphObject(nodes=rng.normal(size=(n, 14)), arcs=arcs,
                                      targets=rng.normal(size=(n, 2)), focus="n",
                                      aggregation_mode="average"))
        ins, ls = _dims("state", 14, 3, 2, "n", 0)
        ino, lo = _dims("output", 14, 3, 2, "n", 0)
        gnn = GNNnodeBased(
            MLP(input_dim=ins[0], layers=ls, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
            MLP(input_dim=ino[0], layers=lo, activations="softmax",
                kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
            0, 4, 0.0,
        )
        gnn.compile(optimizer="adam:0.01", loss="mse")
        gnn.build(seed=1)

        strip_seq = MultiGraphSequencer(graphs, "n", "average", batch_size=5,
                                        shuffle=False, slot_pack=128)
        plain_seq = MultiGraphSequencer(graphs, "n", "average", batch_size=5,
                                        shuffle=False, tile_pack=False)
        assert strip_seq[0].strip is not None
        p_strip = gnn.predict(strip_seq, seed=0)
        gnn.transposed = False
        p_plain = gnn.predict(plain_seq, seed=0)
        assert p_strip.shape == p_plain.shape
        np.testing.assert_allclose(p_strip, p_plain, rtol=2e-4, atol=2e-5)

    def test_rejects_sub128_slots(self):
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer

        with pytest.raises(ValueError, match="slot_pack=128"):
            MultiGraphSequencer(self._graphs(6), "g", "average", batch_size=3,
                                slot_pack=64)

    def test_epoch_rebuild_keeps_structure(self):
        """Shuffled epoch rebuilds keep all batches of ONE epoch on a single
        treedef, with the residual latched present — pads are monotonic, so
        a rebuild may grow the tile count (one recompile, the documented
        sequencer behavior) but never flips residual presence back."""
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer

        seq = MultiGraphSequencer(self._graphs(24, big_every=6), "g", "average",
                                  batch_size=6, shuffle=True, slot_pack=128,
                                  strip_dtype="float32")
        np.random.seed(0)
        for _ in range(3):
            seq.on_epoch_end()
            tds = {jax.tree_util.tree_structure(seq[i]) for i in range(len(seq))}
            assert len(tds) == 1
            for i in range(len(seq)):
                assert seq[i].strip.residual is not None
