"""Graph construction invariants: aggregation weights vs hand-computed scipy
oracles (reference math at graph_class.py:91-138, composite_graph_class.py:
73-103), merge index offsetting (graph_class.py:385-413), persistence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.graph.graph import GraphObject, CompositeGraphObject, arcnode_weights


def small_graph(aggregation_mode="sum", focus="n"):
    # 4 nodes; arcs [src, dst, label(2)]
    nodes = np.arange(8, dtype=float).reshape(4, 2)
    arcs = np.array(
        [
            [0, 1, 1.0, 0.0],
            [0, 2, 0.5, 1.0],
            [1, 2, 2.0, 0.0],
            [2, 3, 0.0, 1.0],
            [3, 0, 1.0, 1.0],
            [1, 3, 0.0, 0.5],
        ]
    )
    targets = np.eye(4)[:, :2] if focus == "n" else np.array([[1.0, 0.0]])
    return GraphObject(nodes=nodes, arcs=arcs, targets=targets, focus=focus, aggregation_mode=aggregation_mode)


class TestArcNodeWeights:
    def test_sum(self):
        g = small_graph("sum")
        assert np.all(g.arcnode_weight == 1.0)

    def test_normalized_divides_by_arc_count(self):
        # the reference divides by the number of ARCS (graph_class.py:114),
        # not nodes as its docstring claims.
        g = small_graph("normalized")
        np.testing.assert_allclose(g.arcnode_weight, np.full(6, 1 / 6), rtol=1e-6)

    def test_average_divides_by_indegree(self):
        g = small_graph("average")
        dst = g.arcs[:, 1].astype(int)
        indeg = np.bincount(dst, minlength=4)
        np.testing.assert_allclose(g.arcnode_weight, 1.0 / indeg[dst], rtol=1e-6)
        # column sums of ArcNode == 1 for nodes with incoming arcs
        an = g.ArcNode_coo().toarray()
        for col in range(4):
            if indeg[col]:
                np.testing.assert_allclose(an[:, col].sum(), 1.0, rtol=1e-6)

    def test_adjacency_shares_arcnode_values(self):
        # reference graph_class.py:86-87: Adjacency data IS ArcNode data.
        g = small_graph("average")
        adj = g.Adjacency_coo()
        an = g.ArcNode_coo()
        np.testing.assert_allclose(adj.data, an.data)

    def test_arcs_are_deduped_and_sorted(self):
        arcs = np.array([[1, 0, 1.0], [0, 1, 1.0], [1, 0, 1.0]])
        g = GraphObject(nodes=np.ones((2, 2)), arcs=arcs, targets=np.ones((2, 1)))
        assert g.arcs.shape[0] == 2
        np.testing.assert_array_equal(g.arcs[:, 0], [0, 1])

    def test_spmm_against_scipy(self):
        g = small_graph("average")
        state = np.random.default_rng(0).normal(size=(4, 3))
        oracle = g.Adjacency_coo().T @ state
        from gnnkeras_tpu.ops.segment import aggregate_neighbors
        import jax.numpy as jnp

        ours = aggregate_neighbors(
            jnp.asarray(state.astype(np.float32)),
            jnp.asarray(g.arcs[:, 0].astype(np.int32)),
            jnp.asarray(g.arcs[:, 1].astype(np.int32)),
            jnp.asarray(g.arcnode_weight),
            4,
        )
        np.testing.assert_allclose(np.asarray(ours), oracle, rtol=1e-5)


class TestNodeGraph:
    def test_single_graph_weights(self):
        g = small_graph(focus="g")
        np.testing.assert_allclose(g.nodegraph_weight, np.full(4, 0.25))
        assert g.num_graphs == 1

    def test_merge_block_diag(self):
        g1, g2 = small_graph(focus="g"), small_graph(focus="g")
        m = GraphObject.merge([g1, g2], focus="g", aggregation_mode="sum")
        assert m.num_graphs == 2
        np.testing.assert_array_equal(m.graph_of_node, [0] * 4 + [1] * 4)
        np.testing.assert_allclose(m.nodegraph_weight, np.full(8, 0.25))
        ng = m.NodeGraph_coo().toarray()
        assert ng.shape == (8, 2)
        np.testing.assert_allclose(ng[:4, 0], 0.25)
        np.testing.assert_allclose(ng[4:, 1], 0.25)
        np.testing.assert_allclose(ng[:4, 1], 0.0)


class TestMerge:
    def test_arc_offsets(self):
        g1, g2 = small_graph(), small_graph()
        m = GraphObject.merge([g1, g2], focus="n", aggregation_mode="sum")
        assert m.nodes.shape == (8, 2)
        assert m.arcs.shape == (12, 4)
        # second graph's arcs offset by 4
        assert m.arcs[:, :2].max() == 7
        np.testing.assert_array_equal(np.sort(m.arcs[:, 0]), np.sort(np.concatenate([g1.arcs[:, 0], g2.arcs[:, 0] + 4])))

    def test_merged_normalized_uses_total_arcs(self):
        g1, g2 = small_graph("normalized"), small_graph("normalized")
        m = GraphObject.merge([g1, g2], focus="n", aggregation_mode="normalized")
        np.testing.assert_allclose(m.arcnode_weight, np.full(12, 1 / 12), rtol=1e-6)

    def test_merge_preserves_masks_and_weights(self):
        g1 = small_graph()
        g1.set_mask[:2] = False
        g1.sample_weight[:] = 2.0
        g2 = small_graph()
        m = GraphObject.merge([g1, g2], focus="n", aggregation_mode="sum")
        np.testing.assert_array_equal(m.set_mask, np.concatenate([g1.set_mask, g2.set_mask]))
        np.testing.assert_allclose(m.sample_weight[:4], 2.0)


class TestCompositeWeights:
    def make_composite(self, mode):
        nodes = np.arange(10, dtype=float).reshape(5, 2)
        arcs = np.array(
            [[0, 2, 1.0], [1, 2, 0.0], [3, 2, 1.0], [4, 2, 0.0], [0, 1, 1.0], [3, 4, 0.5]]
        )
        # types: nodes 0,1 type0; 2,3,4 type1
        tm = np.zeros((5, 2), dtype=bool)
        tm[:2, 0] = True
        tm[2:, 1] = True
        return CompositeGraphObject(
            nodes=nodes,
            arcs=arcs,
            targets=np.ones((5, 1)),
            type_mask=tm,
            dim_node_label=(2, 2),
            focus="n",
            aggregation_mode=mode,
        )

    def test_composite_average(self):
        g = self.make_composite("composite_average")
        # node 2 receives: from type0 {0,1} → each weight 1/2;
        # from type1 {3,4} → each 1/2.  arc (0,1): sole type0→1 → 1.
        # arc (3,4): sole type1→4 → 1.
        arcs = g.arcs
        w = g.arcnode_weight
        for i, (s, d) in enumerate(arcs[:, :2].astype(int)):
            if d == 2:
                assert w[i] == pytest.approx(0.5)
            else:
                assert w[i] == pytest.approx(1.0)

    def test_plain_modes_still_work(self):
        g = self.make_composite("average")
        indeg = np.bincount(g.arcs[:, 1].astype(int), minlength=5)
        dst = g.arcs[:, 1].astype(int)
        np.testing.assert_allclose(g.arcnode_weight, 1.0 / indeg[dst])

    def test_composite_merge(self):
        g1, g2 = self.make_composite("sum"), self.make_composite("sum")
        m = CompositeGraphObject.merge([g1, g2], focus="n", aggregation_mode="composite_average")
        assert m.type_mask.shape == (10, 2)
        assert tuple(m.DIM_NODE_LABEL) == (2, 2)
        # per-graph weights identical to single-graph composite_average
        single = self.make_composite("composite_average")
        np.testing.assert_allclose(m.arcnode_weight[:6], single.arcnode_weight)


class TestPersistence(object):
    def test_npz_roundtrip(self, tmp_path):
        g = small_graph("average", focus="n")
        g.set_mask[0] = False
        g.save(str(tmp_path / "g"))
        g2 = GraphObject.load(str(tmp_path / "g"), focus="n", aggregation_mode="average")
        np.testing.assert_allclose(g.nodes, g2.nodes)
        np.testing.assert_allclose(g.arcs, g2.arcs)
        np.testing.assert_array_equal(g.set_mask, g2.set_mask)
        np.testing.assert_allclose(g.arcnode_weight, g2.arcnode_weight)

    def test_txt_roundtrip(self, tmp_path):
        g = small_graph("sum", focus="n")
        g.savetxt(str(tmp_path / "gdir"))
        g2 = GraphObject.load_txt(str(tmp_path / "gdir"), focus="n", aggregation_mode="sum")
        np.testing.assert_allclose(g.nodes, g2.nodes)
        np.testing.assert_allclose(g.arcs, g2.arcs)

    def test_dataset_roundtrip(self, tmp_path):
        gs = [small_graph(), small_graph()]
        GraphObject.save_dataset(str(tmp_path / "ds"), gs)
        loaded = GraphObject.load_dataset(str(tmp_path / "ds"), focus="n", aggregation_mode="sum")
        assert len(loaded) == 2
        np.testing.assert_allclose(loaded[0].nodes, gs[0].nodes)

    def test_merged_nodegraph_roundtrip(self, tmp_path):
        m = GraphObject.merge([small_graph(focus="g"), small_graph(focus="g")], "g", "sum")
        m.save(str(tmp_path / "m"))
        m2 = GraphObject.load(str(tmp_path / "m"), focus="g", aggregation_mode="sum")
        assert m2.num_graphs == 2
        np.testing.assert_allclose(m2.nodegraph_weight, m.nodegraph_weight)


class TestSetAggregation:
    def test_switch_modes(self):
        g = small_graph("sum")
        w_sum = g.arcnode_weight.copy()
        g.setAggregation("average")
        assert g.aggregation_mode == "average"
        assert not np.allclose(w_sum, g.arcnode_weight)
        g.setAggregation("sum")
        np.testing.assert_allclose(g.arcnode_weight, w_sum)


class TestDegenerateGraphs:
    def test_graph_with_no_arcs(self):
        g = GraphObject(nodes=np.ones((3, 2)), arcs=np.zeros((0, 4)), targets=np.ones((3, 1)),
                        focus="n", aggregation_mode="sum")
        assert g.arcs.shape[0] == 0
        assert g.arcnode_weight.shape == (0,)

        from gnnkeras_tpu.graph.batch import from_graph_object

        b = from_graph_object(g, pad_nodes=128, pad_arcs=8)
        import jax.numpy as jnp

        agg = b.aggregate(jnp.ones((128, 2)))
        np.testing.assert_allclose(np.asarray(agg), 0.0)

    def test_single_node_graph(self):
        g = GraphObject(nodes=np.ones((1, 2)), arcs=np.array([[0, 0, 1.0]]), targets=np.ones((1, 1)),
                        focus="n", aggregation_mode="average")
        assert g.arcnode_weight[0] == 1.0

    def test_isolated_nodes_receive_nothing(self):
        # node 2 has no incoming arcs
        g = GraphObject(nodes=np.ones((3, 2)), arcs=np.array([[0, 1, 1.0]]), targets=np.ones((3, 1)),
                        focus="n", aggregation_mode="average")
        from gnnkeras_tpu.graph.batch import from_graph_object
        import jax.numpy as jnp

        b = from_graph_object(g, pad_nodes=128, pad_arcs=8)
        agg = np.asarray(b.aggregate(jnp.ones((128, 2))))
        np.testing.assert_allclose(agg[2], 0.0)
        np.testing.assert_allclose(agg[1], 1.0)

    def test_forward_on_arcless_graph(self):
        from gnnkeras_tpu.graph.batch import from_graph_object
        from gnnkeras_tpu.models.gnn import GNNnodeBased
        from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

        g = GraphObject(nodes=np.random.default_rng(0).normal(size=(4, 3)), arcs=np.zeros((0, 4)),
                        targets=np.ones((4, 2)), focus="n", aggregation_mode="sum")
        inp_s, layers_s = get_inout_dims("state", 3, 2, 2, "n", 0)
        inp_o, layers_o = get_inout_dims("output", 3, 2, 2, "n", 0)
        gnn = GNNnodeBased(
            MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
            MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
            0, 3, 0.01,
        )
        gnn.build(seed=0)
        b = from_graph_object(g, pad_nodes=128, pad_arcs=8)
        k, state, out, mask, _ = gnn.forward(gnn.variables, b, training=True)
        assert np.all(np.isfinite(np.asarray(out)))


class TestGraphTensorIO:
    """Device-form (GraphTensor) npz persistence — reference key layout
    (graph_class.py:503-535, composite_graph_class.py:218-253)."""

    def _graph(self, focus="g", seed=0):
        rng = np.random.default_rng(seed)
        n, a = 12, 30
        nodes = rng.normal(size=(n, 3))
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
        rows = {"g": 1, "n": n}[focus]
        targets = rng.normal(size=(rows, 2))
        return GraphObject(nodes=nodes, arcs=arcs, targets=targets, focus=focus,
                           aggregation_mode="average")

    def test_roundtrip_homogeneous(self, tmp_path):
        from gnnkeras_tpu.graph.tensor_io import load_graph_tensor, save_graph_tensor

        for focus in ("g", "n"):
            g = self._graph(focus=focus, seed=focus == "g")
            path = str(tmp_path / f"gt_{focus}.npz")
            save_graph_tensor(path, g)
            back = load_graph_tensor(path, focus=focus)
            np.testing.assert_allclose(back.nodes, g.nodes)
            np.testing.assert_allclose(back.arcs, g.arcs)
            np.testing.assert_allclose(back.targets, g.targets)
            np.testing.assert_allclose(back.arcnode_weight, g.arcnode_weight)
            assert back.aggregation_mode == g.aggregation_mode
            if focus == "g":
                np.testing.assert_allclose(back.nodegraph_weight, g.nodegraph_weight)

    def test_reference_key_layout(self, tmp_path):
        """The archive carries exactly the keys the reference loader reads
        (GraphTensor.load, graph_class.py:524-535)."""
        from gnnkeras_tpu.graph.tensor_io import save_graph_tensor

        g = self._graph("g")
        path = str(tmp_path / "gt.npz")
        save_graph_tensor(path, g)
        data = dict(np.load(path))
        for key in ("dim_node_label", "nodes", "arcs", "targets", "sample_weight",
                    "set_mask", "output_mask", "aggregation_mode",
                    "Adjacency", "Adjacency_shape", "ArcNode", "ArcNode_shape",
                    "NodeGraph", "NodeGraph_shape"):
            assert key in data, key
        # triples are [value,row,col] rows in tf.sparse.reorder (row-major) order
        adj = data["Adjacency"]
        assert adj.shape[1] == 3
        order = np.lexsort((adj[:, 2], adj[:, 1]))
        np.testing.assert_array_equal(order, np.arange(len(adj)))

    def test_roundtrip_composite(self, tmp_path):
        from gnnkeras_tpu.graph.tensor_io import load_graph_tensor, save_graph_tensor

        rng = np.random.default_rng(5)
        n, a, n_types = 14, 40, 3
        dims = (2, 3, 2)
        nodes = rng.normal(size=(n, max(dims)))
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
        tm = np.zeros((n, n_types), bool)
        tm[np.arange(n), rng.integers(0, n_types, n)] = True
        g = CompositeGraphObject(nodes=nodes, arcs=arcs, targets=rng.normal(size=(n, 2)),
                                 type_mask=tm, dim_node_label=dims, focus="n",
                                 aggregation_mode="composite_average")
        path = str(tmp_path / "cgt.npz")
        save_graph_tensor(path, g)
        data = dict(np.load(path))
        assert "type_mask" in data and "CompositeAdjacencies_0" in data
        assert data["type_mask"].shape == (n_types, n)  # stored transposed, as the reference does

        back = load_graph_tensor(path, focus="n")
        assert isinstance(back, CompositeGraphObject)
        np.testing.assert_array_equal(back.type_mask, g.type_mask)
        np.testing.assert_allclose(back.arcnode_weight, g.arcnode_weight)
        assert tuple(back.DIM_NODE_LABEL) == dims

    def test_verify_catches_mode_mismatch(self, tmp_path):
        from gnnkeras_tpu.graph.tensor_io import load_graph_tensor, save_graph_tensor

        g = self._graph("n")
        path = str(tmp_path / "gt_bad.npz")
        save_graph_tensor(path, g)
        data = dict(np.load(path))
        data["aggregation_mode"] = np.array("sum")  # lie about the mode
        np.savez(path, **data)
        with pytest.raises(ValueError):
            load_graph_tensor(path, focus="n")


class TestCompactReadout:
    """Tile-packed compact readout == unpacked NodeGraph readout, including
    graphs larger than one tile (exclusive aligned runs)."""

    def _graphs(self, seed=0, n_graphs=30, with_big=True):
        rng = np.random.default_rng(seed)
        graphs = []
        for i in range(n_graphs):
            n = int(rng.integers(4, 40))
            if with_big and i in (3, 11):
                n = int(rng.integers(150, 300))  # spans >1 tile
            a = max(2 * n, 4)
            nodes = rng.normal(size=(n, 5))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
            t = rng.normal(size=(1, 3))
            graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=t, focus="g",
                                      aggregation_mode="average"))
        return graphs

    @pytest.mark.parametrize("with_big", [False, True])
    def test_matches_unpacked_readout(self, with_big):
        from gnnkeras_tpu.graph.batch import from_graph_object

        graphs = self._graphs(with_big=with_big)
        merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")

        plain = from_graph_object(merged)  # row g = graph g
        packed = from_graph_object(merged, tile_pack=True)
        assert packed.compact_readout is not None

        rng = np.random.default_rng(1)
        out_plain = rng.normal(size=(plain.num_nodes, 3)).astype(np.float32)
        # map node rows: packed node positions permute the rows
        out_packed = np.zeros((packed.num_nodes, 3), dtype=np.float32)
        mask_plain = np.asarray(plain.node_mask)
        mask_packed = np.asarray(packed.node_mask)
        out_packed[mask_packed] = out_plain[mask_plain]  # both orders are merge order? no —
        # rebuild via the position maps instead: real rows of `plain` are the
        # first n rows in merge order; packed rows permute them by pos.
        n_real = merged.nodes.shape[0]
        from gnnkeras_tpu.graph.packing import packed_node_positions

        pos, _ = packed_node_positions(merged.graph_of_node)
        out_packed = np.zeros((packed.num_nodes, 3), dtype=np.float32)
        out_packed[pos] = out_plain[:n_real]

        r_plain = np.asarray(plain.readout(jnp.asarray(out_plain)))
        r_packed = np.asarray(packed.readout(jnp.asarray(out_packed)))

        # per-graph comparison through each layout's target rows
        m_plain = np.asarray(plain.target_mask)
        m_packed = np.asarray(packed.target_mask)
        t_plain = np.asarray(plain.targets)[m_plain]
        t_packed = np.asarray(packed.targets)[m_packed]
        # targets identify the graphs: sort both by target bytes to align rows
        order_p = np.lexsort(t_plain.T)
        order_q = np.lexsort(t_packed.T)
        np.testing.assert_allclose(t_plain[order_p], t_packed[order_q], rtol=0, atol=0)
        np.testing.assert_allclose(
            r_plain[m_plain][order_p], r_packed[m_packed][order_q], rtol=1e-5, atol=1e-6
        )

    def test_training_with_tile_pack_learns(self):
        from gnnkeras_tpu.graph.batch import from_graph_object
        from gnnkeras_tpu.models.gnn import GNNgraphBased
        from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
        from gnnkeras_tpu.training.trainer import _get_train_step

        graphs = self._graphs(seed=3, n_graphs=20, with_big=True)
        rng = np.random.default_rng(4)
        for g in graphs:  # classification targets
            t = np.zeros((1, 3))
            t[0, rng.integers(3)] = 1
            g.targets = t
        merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
        batch = from_graph_object(merged, tile_pack=True)

        inp_s, layers_s = get_inout_dims("state", 5, 2, 3, "g", 0)
        inp_o, layers_o = get_inout_dims("output", 5, 2, 3, "g", 0)
        st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        ot = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                 kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        gnn = GNNgraphBased(st, ot, 0, 3, 0.01)
        gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy")
        gnn.build(seed=2)
        gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])
        step = _get_train_step(gnn)
        params, mstate, opt = gnn.variables["params"], gnn.variables["state"], gnn._opt_state
        losses = []
        for i in range(8):
            params, mstate, opt, logs = step(params, mstate, opt, batch, jax.random.PRNGKey(i))
            losses.append(float(logs["loss_sum"]) / float(logs["count"]))
        assert losses[-1] < losses[0]


class TestTULoader:
    """The TU-format loader's O(E log G) membership/remap must equal the
    reference's O(G·E) range-scan procedure (load_MUTAG.py:29-38) exactly."""

    def test_searchsorted_membership_matches_reference_scan(self, tmp_path):
        rng = np.random.default_rng(7)
        sizes = rng.integers(2, 9, size=12)
        bounds = np.concatenate([[0], np.cumsum(sizes)])
        n_total = int(bounds[-1])
        edges = []
        for k in range(len(sizes)):  # intra-graph edges, 1-based global ids
            lo, hi = bounds[k] + 1, bounds[k + 1]
            for _ in range(int(sizes[k]) * 2):
                s, d = rng.integers(lo, hi + 1, size=2)
                if s != d:
                    edges.append((s, d))
        # a few CROSS-graph rows: the reference's per-range AND assigns them
        # to no graph (dropped); the fast path must agree
        for k in range(3):
            edges.append((int(bounds[k]) + 1, int(bounds[k + 1]) + 1))
        # TU dumps carry no duplicate edge rows (the global np.unique at
        # load_MUTAG.py:29 only re-sorts); keep the synthetic data that way
        # or the label rows would desynchronize from the sorted edge rows.
        edges = np.unique(np.array(edges), axis=0)
        rng.shuffle(edges)
        graph_of_node = np.repeat(np.arange(1, len(sizes) + 1), sizes)

        p = tmp_path / "TU"
        p.mkdir()
        np.savetxt(p / "Mutagenicity_edges.txt", edges, fmt="%d", delimiter=", ")
        np.savetxt(p / "Mutagenicity_edge_labels.txt", rng.integers(0, 3, size=len(edges)), fmt="%d")
        np.savetxt(p / "Mutagenicity_node_labels.txt", rng.integers(0, 5, size=n_total), fmt="%d")
        np.savetxt(p / "Mutagenicity_graph_indicator.txt", graph_of_node, fmt="%d")
        np.savetxt(p / "Mutagenicity_graph_labels.txt", rng.integers(0, 2, size=len(sizes)), fmt="%d")

        from gnnkeras_tpu.data.mutag import load_mutag, _one_hot

        graphs = load_mutag(str(p))

        # reference procedure (load_MUTAG.py:29-38), brute force
        edges_ids = np.unique(np.loadtxt(p / "Mutagenicity_edges.txt", dtype=int, delimiter=","), axis=0)
        edge_oh = _one_hot(np.loadtxt(p / "Mutagenicity_edge_labels.txt", dtype=int))
        for k, g in enumerate(graphs):
            i, j = bounds[k], bounds[k + 1]
            sel = (edges_ids[:, 0] > i) & (edges_ids[:, 0] <= j) & (edges_ids[:, 1] > i) & (edges_ids[:, 1] <= j)
            ids = edges_ids[sel]
            unique = np.unique(ids)
            remap = {int(v): r for r, v in enumerate(unique)}
            ids = np.vectorize(remap.get)(ids) if ids.size else ids.reshape(0, 2)
            expected = np.unique(np.concatenate([ids, edge_oh[sel]], axis=1).astype(g.dtype), axis=0)
            assert np.array_equal(expected, g.arcs), k

    def test_generic_tu_dataset(self, tmp_path):
        """load_tu_dataset: optional edge labels, signed/1-based alphabets."""
        from gnnkeras_tpu.data.mutag import load_tu_dataset

        p = tmp_path / "TU2"
        p.mkdir()
        np.savetxt(p / "Toy_edges.txt", np.array([[1, 2], [2, 1], [3, 4], [4, 3]]), fmt="%d", delimiter=", ")
        np.savetxt(p / "Toy_node_labels.txt", np.array([1, 2, 1, 3]), fmt="%d")
        np.savetxt(p / "Toy_graph_indicator.txt", np.array([1, 1, 2, 2]), fmt="%d")
        np.savetxt(p / "Toy_graph_labels.txt", np.array([-1, 1]), fmt="%d")
        graphs = load_tu_dataset(str(p), "Toy")
        assert len(graphs) == 2
        assert graphs[0].nodes.shape == (2, 3)   # 3 distinct node labels
        assert graphs[0].DIM_ARC_LABEL == 1      # constant edge feature
        assert graphs[0].DIM_TARGET == 2         # {-1, 1}
        np.testing.assert_array_equal(graphs[1].targets, [[0, 1]])


class TestCompactStaticShapes:
    """Compact-readout metadata (slot width, span-slot count) is STATIC
    pytree structure — it must be uniform across a sequencer's batches or
    stacking/compile-once breaks (round-2 review finding)."""

    def _graphs(self, sizes, seed=0):
        rng = np.random.default_rng(seed)
        out = []
        for n in sizes:
            arcs = np.stack([np.arange(n - 1), np.arange(1, n)], 1).astype(float)
            arcs = np.concatenate([arcs, rng.normal(size=(n - 1, 2))], axis=1)
            t = np.zeros((1, 2)); t[0, 0] = 1
            out.append(GraphObject(nodes=rng.normal(size=(n, 3)), arcs=arcs, targets=t,
                                   focus="g", aggregation_mode="average"))
        return out

    def test_mixed_span_batches_stack(self):
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
        from gnnkeras_tpu.parallel.data_parallel import stack_batches

        # batch 0 holds a 200-node (tile-spanning) graph, batch 1 only small
        graphs = self._graphs([200, 10, 12, 9])
        seq = MultiGraphSequencer(graphs, "g", "average", batch_size=2, shuffle=False)
        assert len(seq) == 2
        b0, b1 = seq[0], seq[1]
        stacked = stack_batches([b0, b1])  # raises on mismatched treedefs
        assert stacked.nodes.shape[0] == 2
        if b0.compact_readout is not None:
            assert b0.compact_readout.n_span_pad == b1.compact_readout.n_span_pad

    def test_single_graph_batch_compact(self):
        """A trailing 1-graph batch must keep the same batch structure."""
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
        from gnnkeras_tpu.parallel.data_parallel import stack_batches

        graphs = self._graphs([11, 9, 13])
        seq = MultiGraphSequencer(graphs, "g", "average", batch_size=2, shuffle=False)
        assert len(seq) == 2  # batches of 2 and 1 graphs
        stack_batches([seq[0], seq[1]])

    def test_non_128_pad_multiple_keeps_uniform_graph_pad(self):
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer

        graphs = self._graphs([8, 9, 10, 11, 12])
        seq = MultiGraphSequencer(graphs, "g", "average", batch_size=4,
                                  shuffle=False, pad_multiple=16)
        b0, b1 = seq[0], seq[1]  # 4 graphs and 1 graph
        assert b0.targets.shape == b1.targets.shape


class TestTUNodeAttributes:
    def test_node_attributes(self, tmp_path):
        """Continuous node features ({prefix}_node_attributes.txt) concat
        after the label one-hot; attributes-only datasets work too."""
        from gnnkeras_tpu.data.mutag import load_tu_dataset

        p = tmp_path / "TU3"
        p.mkdir()
        np.savetxt(p / "Toy_edges.txt", np.array([[1, 2], [2, 1], [3, 4], [4, 3]]), fmt="%d", delimiter=", ")
        np.savetxt(p / "Toy_graph_indicator.txt", np.array([1, 1, 2, 2]), fmt="%d")
        np.savetxt(p / "Toy_graph_labels.txt", np.array([0, 1]), fmt="%d")
        attrs = np.array([[0.5, -1.0], [1.5, 2.0], [0.0, 3.25], [4.0, -0.5]])
        np.savetxt(p / "Toy_node_attributes.txt", attrs, fmt="%.6g", delimiter=", ")

        # attributes only (no node_labels file)
        graphs = load_tu_dataset(str(p), "Toy")
        assert graphs[0].nodes.shape[1] == 2
        np.testing.assert_allclose(graphs[0].nodes, attrs[:2], rtol=1e-6)

        # labels + attributes: one-hot first, then the float columns
        np.savetxt(p / "Toy_node_labels.txt", np.array([0, 1, 1, 0]), fmt="%d")
        graphs = load_tu_dataset(str(p), "Toy")
        assert graphs[0].nodes.shape[1] == 4
        np.testing.assert_allclose(graphs[1].nodes[:, 2:], attrs[2:], rtol=1e-6)
        np.testing.assert_array_equal(graphs[0].nodes[:, :2], [[1, 0], [0, 1]])
