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

    def test_row_major_batch_stays_row_major(self):
        """Without a strip operator AUTO must not engage; transposed=True is
        honored via the plain-BCSR feature-major path (TestTransposedOverBcsr)
        and raises only when the batch carries no block operator at all."""
        graphs = load_mutag()[:50]
        batch = graphs_to_batch(graphs, "g", "average", tile_pack=True)
        gnn = build_model()
        assert not gnn._use_transposed(batch)  # auto: strip-only
        gnn.transposed = True
        assert gnn._use_transposed(batch)  # explicit opt-in → BCSR path
        gnn.transposed = None
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
        assert not gnn._use_transposed(batch)  # auto: strip-only
        for training in (False, True):
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
