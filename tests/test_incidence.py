"""Arc-readout incidence operators (ops/incidence.py): the gather VJP's
scatter — measured ~85% of the arc-focused train step (BASELINE.md round 5)
— is replaced by rectangular-BCSR cotangent reductions.  Gradients must
match the scatter path to f32 rounding; forwards are identical."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNarcBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.training.trainer import _objective


def arc_graphs(seed=3, n_graphs=12, dn=14, da=3):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(5, 30))
        a = int(rng.integers(n, 3 * n))
        pairs = np.unique(np.stack([rng.integers(0, n, a), rng.integers(0, n, a)], 1), axis=0)
        arcs = np.concatenate([pairs.astype(np.float64), rng.normal(size=(len(pairs), da))], 1)
        g_tmp = GraphObject(nodes=rng.normal(size=(n, dn)), arcs=arcs,
                            targets=np.ones((1, 1)), focus="g")
        graphs.append(GraphObject(nodes=g_tmp.nodes, arcs=g_tmp.arcs,
                                  targets=rng.normal(size=(g_tmp.arcs.shape[0], 2)),
                                  focus="a", aggregation_mode="average",
                                  arcs_canonical=True))
    return graphs


def build_arc_gnn(dn=14, da=3, T=2, seed=1):
    ins, ls = get_inout_dims("state", dn, da, T, "a", 0)
    ino, lo = get_inout_dims("output", dn, da, T, "a", 0)
    gnn = GNNarcBased(
        MLP(input_dim=ins[0], layers=ls, activations="selu",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=ino[0], layers=lo, activations="softmax",
            kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        0, 4, 0.0,
    )
    gnn.compile(optimizer="adam:0.01", loss="mse")
    gnn.build(seed=seed)
    return gnn


class TestIncidenceOperators:
    def test_grad_matches_scatter_path(self):
        merged = GraphObject.merge(arc_graphs(), focus="a", aggregation_mode="average")
        batch = from_graph_object(merged)
        assert batch.arc_inc_src is not None and batch.arc_inc_dst is not None
        gnn = build_arc_gnn()
        params, mstate = gnn.variables["params"], gnn.variables["state"]
        rng_k = jax.random.PRNGKey(0)
        batch_scatter = batch.replace(arc_inc_src=None, arc_inc_dst=None)

        def loss(p, b):
            l, _ = _objective(gnn, p, mstate, b, rng_k, training=True)
            return l

        l1, g1 = jax.value_and_grad(loss)(params, batch)
        l2, g2 = jax.value_and_grad(loss)(params, batch_scatter)
        assert float(l1) == pytest.approx(float(l2), abs=1e-7)
        # tolerance: the operators store bf16 blocks (exact for 0/1 weights);
        # on CPU the f32 matmul casts the cotangent operand to bf16, so
        # gradients round at bf16 here — on v5e the f32 matmul is one-pass
        # bf16 operands anyway and the outputs measured BIT-identical to the
        # f32-block path (BASELINE.md round 5 storage sweep)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=5e-5)

    def test_forward_identical(self):
        merged = GraphObject.merge(arc_graphs(seed=5), focus="a", aggregation_mode="average")
        batch = from_graph_object(merged)
        gnn = build_arc_gnn(seed=2)
        rng_k = jax.random.PRNGKey(3)
        _, _, o1, m1, _ = gnn.forward(gnn.variables, batch, training=False, rng=rng_k)
        _, _, o2, m2, _ = gnn.forward(
            gnn.variables, batch.replace(arc_inc_src=None, arc_inc_dst=None),
            training=False, rng=rng_k,
        )
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))

    def test_non_arc_focus_has_no_operators(self):
        rng = np.random.default_rng(0)
        n = 20
        arcs = np.concatenate([rng.integers(0, n, (40, 2)), rng.normal(size=(40, 2))], 1)
        g = GraphObject(nodes=rng.normal(size=(n, 3)), arcs=arcs,
                        targets=rng.normal(size=(n, 2)), focus="n",
                        aggregation_mode="average")
        b = from_graph_object(g)
        assert b.arc_inc_src is None and b.arc_inc_dst is None

    def test_sequencer_fit_with_rebuilds(self):
        """Arc-focused sequencer batches carry uniform incidence block
        counts across shuffled epoch rebuilds (one pytree, no retrace)."""
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer

        graphs = arc_graphs(seed=9, n_graphs=16)
        np.random.seed(4)
        seq = MultiGraphSequencer(graphs, "a", "average", batch_size=4,
                                  shuffle=True, slot_pack=128)
        for i in range(len(seq)):
            assert seq[i].arc_inc_src is not None
        counts = {int(seq[i].arc_inc_src.blocks.shape[0]) for i in range(len(seq))}
        assert len(counts) == 1  # uniform static shape
        gnn = build_arc_gnn(seed=7)
        h = gnn.fit(seq, epochs=3, verbose=0)
        assert all(np.isfinite(v) for v in h.history["loss"])

    def test_unaligned_rows_roundup(self):
        """Arc row counts that are not 128 multiples round up internally;
        the backward pads the cotangent (guarded by grad parity above on a
        400-arc batch — here just pin the operator's row space)."""
        merged = GraphObject.merge(arc_graphs(seed=11, n_graphs=5),
                                   focus="a", aggregation_mode="average")
        batch = from_graph_object(merged)
        if batch.arc_inc_src is None:
            pytest.skip("structure declined")
        a_rows = batch.arc_inc_src.n_src_tiles * batch.arc_inc_src.tile
        assert a_rows >= batch.arc_src.shape[0]
        assert a_rows % 128 == 0
