"""Block-sparse aggregation must equal the edge-list segment-sum path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.ops.bcsr import BcsrMatrix, bcsr_aggregate, build_bcsr, transpose_bcsr
from gnnkeras_tpu.ops.segment import aggregate_neighbors


def merged_batchlike(seed=0, n_graphs=20, mode="average"):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(5, 40))
        a = int(rng.integers(10, 80))
        nodes = rng.normal(size=(n, 6))
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
        graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=np.ones((n, 2)), focus="n", aggregation_mode=mode))
    return GraphObject.merge(graphs, focus="n", aggregation_mode=mode)


class TestBcsr:
    @pytest.mark.parametrize("mode", ["sum", "average", "normalized"])
    def test_matches_edge_path(self, mode):
        g = merged_batchlike(seed=1, mode=mode)
        n_pad = ((g.nodes.shape[0] + 127) // 128) * 128
        a_pad = ((g.arcs.shape[0] + 127) // 128) * 128
        batch = from_graph_object(g, pad_nodes=n_pad, pad_arcs=a_pad)
        assert batch.bcsr is not None, "merged batch should be block-thin"

        rng = np.random.default_rng(0)
        state = jnp.asarray(rng.normal(size=(n_pad, 6)).astype(np.float32))
        ours = batch.aggregate(state)
        ref = aggregate_neighbors(state, batch.arc_src, batch.arc_dst, batch.arcnode_weight, n_pad)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_multi_edges_accumulate(self):
        # two arcs with same (src, dst) but different labels must both count
        nodes = np.ones((4, 2))
        arcs = np.array([[0, 1, 1.0], [0, 1, 2.0], [2, 1, 0.5]])
        g = GraphObject(nodes=nodes, arcs=arcs, targets=np.ones((4, 1)), focus="n", aggregation_mode="sum")
        m = build_bcsr(g.arcs[:, 0].astype(int), g.arcs[:, 1].astype(int), g.arcnode_weight, 128)
        state = jnp.asarray(np.eye(128, 3, dtype=np.float32))
        agg = bcsr_aggregate(state, m)
        # node 1 receives 2 units from node 0 and 1 from node 2
        np.testing.assert_allclose(np.asarray(agg)[1], [2.0, 0.0, 1.0])

    def test_band_factor_rejects_dense(self):
        # a random dense graph over many tiles should be rejected
        rng = np.random.default_rng(2)
        n = 128 * 40
        a = 200_000
        src = rng.integers(0, n, a)
        dst = rng.integers(0, n, a)
        w = np.ones(a, dtype=np.float32)
        assert build_bcsr(src, dst, w, n) is None

    def test_transpose_roundtrip(self):
        g = merged_batchlike(seed=3)
        n_pad = ((g.nodes.shape[0] + 127) // 128) * 128
        m = build_bcsr(g.arcs[:, 0].astype(int), g.arcs[:, 1].astype(int), g.arcnode_weight, n_pad)
        mt = transpose_bcsr(m)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(n_pad, 4)).astype(np.float32))
        # (A^T)^T x == A^T x via double transpose
        mtt = transpose_bcsr(mt)
        np.testing.assert_allclose(
            np.asarray(bcsr_aggregate(x, m)), np.asarray(bcsr_aggregate(x, mtt)), rtol=1e-5
        )

    def test_gnn_forward_same_with_and_without_blocks(self):
        from gnnkeras_tpu.models.gnn import GNNnodeBased
        from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

        g = merged_batchlike(seed=4)
        n_pad = ((g.nodes.shape[0] + 127) // 128) * 128
        a_pad = ((g.arcs.shape[0] + 127) // 128) * 128
        b_blocks = from_graph_object(g, n_pad, a_pad, dense_blocks=True)
        b_edges = from_graph_object(g, n_pad, a_pad, dense_blocks=False)
        assert b_blocks.bcsr is not None and b_edges.bcsr is None

        inp_s, layers_s = get_inout_dims("state", 6, 2, 2, "n", 0)
        inp_o, layers_o = get_inout_dims("output", 6, 2, 2, "n", 0)
        gnn = GNNnodeBased(
            MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
            MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
            0, 6, 0.01,
        )
        gnn.build(seed=0)
        k1, s1, o1, _, _ = gnn.forward(gnn.variables, b_blocks, training=True)
        k2, s2, o2, _, _ = gnn.forward(gnn.variables, b_edges, training=True)
        assert float(k1) == float(k2)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-4, atol=1e-5)


class TestTilePacking:
    def test_packing_shrinks_blocks_and_preserves_results(self):
        from gnnkeras_tpu.graph.packing import packed_node_positions
        from gnnkeras_tpu.models.gnn import GNNgraphBased
        from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

        rng = np.random.default_rng(7)
        graphs = []
        for _ in range(60):
            n = int(rng.integers(10, 50))
            a = int(rng.integers(20, 100))
            nodes = rng.normal(size=(n, 4))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 1))], axis=1)
            t = np.zeros((1, 2)); t[0, rng.integers(2)] = 1
            graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=t, focus="g", aggregation_mode="average"))
        merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")

        b_plain = from_graph_object(merged, tile_pack=False)
        b_packed = from_graph_object(merged, tile_pack=True)
        assert b_packed.bcsr.blocks.shape[0] < b_plain.bcsr.blocks.shape[0]

        inp_s, layers_s = get_inout_dims("state", 4, 1, 2, "g", 0)
        inp_o, layers_o = get_inout_dims("output", 4, 1, 2, "g", 0)
        gnn = GNNgraphBased(
            MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
            MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
            0, 5, 0.01,
        )
        gnn.build(seed=0)
        k1, s1, o1, _, _ = gnn.forward(gnn.variables, b_plain, training=True)
        k2, s2, o2, _, _ = gnn.forward(gnn.variables, b_packed, training=True)
        assert float(k1) == float(k2)
        # graph rows under tile packing live at the compact-readout slot
        # (tile·Gmax + rank); map through packed_graph_slots
        from gnnkeras_tpu.graph.packing import packed_graph_slots

        sizes = np.bincount(merged.graph_of_node.astype(int), minlength=60)
        tile0, rank, _, g_max, _ = packed_graph_slots(sizes)
        rows = tile0 * g_max + rank
        np.testing.assert_allclose(np.asarray(o2)[rows], np.asarray(o1)[:60], rtol=2e-4, atol=1e-5)
        # node states equal up to the packing permutation
        pos, _ = packed_node_positions(merged.graph_of_node)
        np.testing.assert_allclose(
            np.asarray(s2)[pos], np.asarray(s1)[: merged.nodes.shape[0]], rtol=2e-4, atol=1e-5
        )

    def test_pack_tiles_no_straddle(self):
        from gnnkeras_tpu.graph.packing import pack_tiles

        sizes = np.array([100, 50, 30, 200, 128, 7, 7, 7])
        starts, total = pack_tiles(sizes)
        assert total % 128 == 0
        for s, size in zip(starts, sizes):
            if size <= 128:
                assert s // 128 == (s + size - 1) // 128, "small graph must not straddle tiles"
            else:
                assert s % 128 == 0, "large graph must start tile-aligned"


class TestCustomVjp:
    """bcsr_aggregate_cvjp: the transpose-operator backward must equal the
    autodiff backward of the plain forward."""

    def test_grad_matches_autodiff(self):
        import jax
        import jax.numpy as jnp
        from gnnkeras_tpu.ops.bcsr import bcsr_aggregate, bcsr_aggregate_cvjp, build_bcsr

        rng = np.random.default_rng(7)
        n_src, n_dst, a = 512, 256, 4000
        src = rng.integers(0, 500, a)
        dst = rng.integers(0, 250, a)
        w = rng.normal(size=a)
        w[::11] = 0.0
        m = build_bcsr(src, dst, w, n_src, n_dst, max_band_factor=64)
        assert m is not None
        state = jnp.asarray(rng.normal(size=(n_src, 14)).astype(np.float32))
        ct_seed = jnp.asarray(rng.normal(size=(n_dst, 14)).astype(np.float32))

        def loss_plain(s):
            return jnp.sum(bcsr_aggregate(s, m) * ct_seed)

        def loss_cvjp(s):
            return jnp.sum(bcsr_aggregate_cvjp(s, m) * ct_seed)

        out1 = bcsr_aggregate(state, m)
        out2 = bcsr_aggregate_cvjp(state, m)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        g1 = jax.grad(loss_plain)(state)
        g2 = jax.grad(loss_cvjp)(state)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)

    def test_second_application_rectangular(self):
        # transpose of a rectangular operator: shapes and values round-trip
        import jax.numpy as jnp
        from gnnkeras_tpu.ops.bcsr import bcsr_aggregate, build_bcsr, transpose_bcsr

        rng = np.random.default_rng(8)
        src = rng.integers(0, 384, 900)
        dst = rng.integers(0, 128, 900)
        w = rng.normal(size=900)
        m = build_bcsr(src, dst, w, 384, 128, max_band_factor=64)
        x = jnp.asarray(rng.normal(size=(128, 6)).astype(np.float32))
        got = bcsr_aggregate(x, transpose_bcsr(m))  # M·x: (384, 6)
        import scipy.sparse as sp

        dense = sp.coo_matrix((w, (src, dst)), shape=(384, 128)).toarray()
        np.testing.assert_allclose(np.asarray(got), dense @ np.asarray(x), rtol=1e-4, atol=1e-4)


class TestPackSlots:
    """pack_slots: two-level slot/tile packing for the compact-strip layout."""

    def _check_layout(self, sizes, slot, tile=128):
        from gnnkeras_tpu.graph.packing import pack_slots

        starts, n_padded = pack_slots(sizes, slot=slot, tile=tile)
        assert n_padded % tile == 0
        # no overlap: occupied intervals are disjoint
        intervals = sorted((int(s), int(s) + int(z)) for s, z in zip(starts, sizes) if z)
        for (a0, a1), (b0, b1) in zip(intervals, intervals[1:]):
            assert a1 <= b0, "graphs overlap"
        assert intervals[-1][1] <= n_padded
        for s, z in zip(starts, sizes):
            s, z = int(s), int(z)
            if z <= slot:
                # fully inside one slot
                assert s // slot == (s + z - 1) // slot
            elif z <= tile:
                # contiguous slot run inside ONE tile, slot-aligned
                assert s % slot == 0
                assert s // tile == (s + z - 1) // tile
            else:
                # exclusive aligned tile run
                assert s % tile == 0
        return starts, n_padded

    def test_small_graphs_share_slots(self):
        import numpy as np

        sizes = np.array([10, 10, 10, 30, 20, 5])
        starts, n_padded = self._check_layout(sizes, slot=32)
        assert n_padded == 128  # 85 nodes fit four 32-slots of one tile

    def test_mid_graphs_stay_within_tile(self):
        import numpy as np

        sizes = np.array([100, 60, 40, 33, 12, 12, 12])
        self._check_layout(sizes, slot=32)

    def test_oversize_graphs_take_aligned_runs(self):
        import numpy as np

        sizes = np.array([300, 20, 150, 8])
        starts, _ = self._check_layout(sizes, slot=32)

    def test_slot_equals_tile_degenerates_to_pack_tiles(self):
        import numpy as np
        from gnnkeras_tpu.graph.packing import pack_slots, pack_tiles

        sizes = np.array([100, 60, 40, 33, 12, 12, 12, 300, 128])
        s1, n1 = pack_slots(sizes, slot=128, tile=128)
        s2, n2 = pack_tiles(sizes, tile=128)
        assert n1 == n2 and (s1 == s2).all()

    def test_graph_slots_from_starts_matches_packed_graph_slots(self):
        import numpy as np
        from gnnkeras_tpu.graph.packing import (
            graph_slots_from_starts,
            pack_tiles,
            packed_graph_slots,
        )

        rng = np.random.default_rng(0)
        sizes = rng.integers(1, 200, 80)
        starts, _ = pack_tiles(sizes)
        got = graph_slots_from_starts(starts, sizes)
        want = packed_graph_slots(sizes)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_positions_from_starts_matches_packed_node_positions(self):
        import numpy as np
        from gnnkeras_tpu.graph.packing import (
            pack_tiles,
            packed_node_positions,
            positions_from_starts,
        )

        rng = np.random.default_rng(1)
        g_of_n = np.sort(rng.integers(0, 40, 500))
        sizes = np.bincount(g_of_n, minlength=41)
        starts, _ = pack_tiles(sizes)
        got = positions_from_starts(g_of_n, starts)
        want, _ = packed_node_positions(g_of_n)
        np.testing.assert_array_equal(got, want)

    def test_mutag_slot_pack_stats(self):
        """Real dataset: every ≤slot graph is slot-internal (its edges all
        land in the strip); padding overhead stays bounded."""
        import numpy as np
        from gnnkeras_tpu.data.mutag import load_mutag
        from gnnkeras_tpu.graph.graph import GraphObject
        from gnnkeras_tpu.graph.packing import pack_slots, positions_from_starts

        graphs = load_mutag()[:500]
        merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
        g_of_n = merged.graph_of_node.astype(np.int64)
        sizes = np.bincount(g_of_n)
        starts, n_padded = pack_slots(sizes, slot=32)
        pos = positions_from_starts(g_of_n, starts)
        assert len(np.unique(pos)) == len(pos)
        src = pos[merged.arcs[:, 0].astype(np.int64)]
        dst = pos[merged.arcs[:, 1].astype(np.int64)]
        small = sizes[g_of_n[merged.arcs[:, 0].astype(np.int64)]] <= 32
        # all edges of ≤32-node graphs are within-slot by construction
        assert ((src // 32) == (dst // 32))[small].all()
        assert n_padded <= 2 * len(g_of_n)


class TestQuantBcsr:
    """int8 mask+scale / bf16 quantized BCSR blocks (ops/bcsr.py QuantBcsr):
    the Pallas in-VMEM-upcast path for operator-byte-bound workloads."""

    def _banded(self, n_tiles=6, per_node=4, band=40, seed=0, average=True):
        rng = np.random.default_rng(seed)
        n = n_tiles * 128
        src = np.repeat(np.arange(n), per_node)
        dst = (src + rng.integers(-band, band + 1, len(src))) % n
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        src, dst = pairs[:, 0], pairs[:, 1]
        if average:
            indeg = np.bincount(dst, minlength=n).astype(np.float64)
            w = 1.0 / indeg[dst]
        else:
            w = rng.normal(size=len(src))  # per-arc weights: not factorable
        return src, dst, w, n

    def _dense_oracle(self, src, dst, w, n, state):
        adj = np.zeros((n, n), np.float32)
        np.add.at(adj, (src, dst), w.astype(np.float32))
        return state @ adj

    @pytest.mark.parametrize("average", [True, False])
    def test_forward_matches_dense(self, average):
        from gnnkeras_tpu.ops.bcsr import build_bcsr, quantize_bcsr, qbcsr_aggregate_t

        src, dst, w, n = self._banded(average=average)
        m = build_bcsr(src, dst, w, n)
        qm = quantize_bcsr(m, "int8")
        if average:
            assert qm.scale is not None and qm.mask.dtype == jnp.int8
        else:
            assert qm.scale is None and qm.mask.dtype == jnp.bfloat16
        state_t = np.random.default_rng(1).normal(size=(8, n)).astype(np.float32)
        got = np.asarray(qbcsr_aggregate_t(jnp.asarray(state_t), qm))
        want = self._dense_oracle(src, dst, w, n, state_t)
        tol = 1e-4 if average else 2e-2  # bf16 storage rounds the weights
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

    def test_backward_matches_dense_autodiff(self):
        from gnnkeras_tpu.ops.bcsr import build_bcsr, quantize_bcsr, qbcsr_aggregate_t

        src, dst, w, n = self._banded(seed=3)
        qm = quantize_bcsr(build_bcsr(src, dst, w, n), "int8")
        rng = np.random.default_rng(4)
        state_t = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
        g_got = jax.grad(lambda s: jnp.sum(qbcsr_aggregate_t(s, qm) * ct))(state_t)
        adj = np.zeros((n, n), np.float32)
        np.add.at(adj, (src, dst), w.astype(np.float32))
        adj_j = jnp.asarray(adj)
        g_want = jax.grad(lambda s: jnp.sum((s @ adj_j) * ct))(state_t)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-4, atol=1e-4)

    def test_row_major_sandwich_and_nonmultiple_blocks(self):
        from gnnkeras_tpu.ops.bcsr import build_bcsr, quantize_bcsr, qbcsr_aggregate

        # small block count (not a _QB_KB multiple): exercises the pad path
        src, dst, w, n = self._banded(n_tiles=2, per_node=2, band=10, seed=5)
        m = build_bcsr(src, dst, w, n)
        qm = quantize_bcsr(m, "int8")
        assert qm.mask.shape[0] % 16 == 0
        state = np.random.default_rng(6).normal(size=(n, 5)).astype(np.float32)
        got = np.asarray(qbcsr_aggregate(jnp.asarray(state), qm))
        want = self._dense_oracle(src, dst, w, n, state.T).T
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_rectangular_operator(self):
        """Readout-shaped (N x G) rectangular quantized operator."""
        from gnnkeras_tpu.ops.bcsr import build_bcsr, quantize_bcsr, qbcsr_aggregate_t

        rng = np.random.default_rng(7)
        n, g_rows = 512, 128
        src = np.arange(n)
        dst = rng.integers(0, 100, n)
        counts = np.bincount(dst, minlength=g_rows).astype(np.float64)
        w = 1.0 / counts[dst]
        m = build_bcsr(src, dst, w, n, g_rows)
        qm = quantize_bcsr(m, "int8")
        state_t = rng.normal(size=(8, n)).astype(np.float32)
        got = np.asarray(qbcsr_aggregate_t(jnp.asarray(state_t), qm))
        adj = np.zeros((n, g_rows), np.float32)
        np.add.at(adj, (src, dst), w.astype(np.float32))
        np.testing.assert_allclose(got, state_t @ adj, rtol=1e-4, atol=1e-4)


class TestQuantBcsrEngine:
    """agg_dtype='int8' batches run the quantized Pallas aggregation through
    the transposed unfold engine with row-major-equal activations."""

    def test_unfold_matches_float_engine(self):
        from gnnkeras_tpu.models.gnn import GNNnodeBased
        from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
        from gnnkeras_tpu.ops.bcsr import QuantBcsr

        rng = np.random.default_rng(9)
        # SCATTERED tile offsets (each a single tile) so the banded
        # decomposition declines and agg_dtype='int8' takes the QuantBcsr
        # fallback — one block per dst tile, source tile pseudo-random
        n_tiles = 20
        n = n_tiles * 128
        dst = np.arange(n)
        # offset (2j % 20) - j is distinct for every dst tile j, so no
        # offset reaches min_fill occupancy and banded declines
        src_tile = (dst // 128 * 2) % n_tiles
        src = src_tile * 128 + rng.integers(0, 128, n)
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        arcs = np.concatenate([pairs.astype(np.float64), rng.normal(size=(len(pairs), 2))], 1)
        g = GraphObject(nodes=rng.normal(size=(n, 6)), arcs=arcs,
                        targets=rng.normal(size=(n, 2)), focus="n",
                        aggregation_mode="average")
        bq = from_graph_object(g, agg_dtype="int8")
        assert isinstance(bq.bcsr, QuantBcsr) and bq.bcsr.scale is not None
        bf = from_graph_object(g)

        ins, ls = get_inout_dims("state", 6, 2, 2, "n", 0)
        ino, lo = get_inout_dims("output", 6, 2, 2, "n", 0)
        gnn = GNNnodeBased(MLP(input_dim=ins[0], layers=ls, activations="selu"),
                           MLP(input_dim=ino[0], layers=lo, activations="softmax"), 0, 4, 0.01)
        gnn.build(seed=0)
        for training in (False, True):
            kq, sq, _ = gnn.unfold(gnn.variables, bq, training=training)
            kf, sf, _ = gnn.unfold(gnn.variables, bf, training=training)
            assert float(kq) == float(kf)
            np.testing.assert_allclose(np.asarray(sq), np.asarray(sf), rtol=2e-4, atol=1e-5)
        # backward through the quantized VJP
        def loss(p, b):
            k, s, _ = gnn.unfold({"params": p, "state": gnn.variables["state"]}, b, training=True)
            return jnp.sum(s ** 2)
        gq = jax.grad(lambda p: loss(p, bq))(gnn.variables["params"])
        gf = jax.grad(lambda p: loss(p, bf))(gnn.variables["params"])
        for a, b in zip(jax.tree_util.tree_leaves(gq), jax.tree_util.tree_leaves(gf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


class TestBandedOperator:
    """Block-diagonal decomposition of banded operators (ops/banded.py):
    per-offset dense-diagonal strip kernels + BCSR residual for the
    wraparound blocks — exactness vs the dense oracle, fwd and bwd."""

    def _graph(self, n_tiles=6, per_node=4, band=40, seed=11):
        rng = np.random.default_rng(seed)
        n = n_tiles * 128
        src = np.repeat(np.arange(n), per_node)
        dst = (src + rng.integers(-band, band + 1, len(src))) % n  # wraps
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        src, dst = pairs[:, 0], pairs[:, 1]
        indeg = np.bincount(dst, minlength=n).astype(np.float64)
        return src, dst, 1.0 / indeg[dst], n

    def test_forward_backward_match_dense(self):
        from gnnkeras_tpu.ops.banded import banded_aggregate_t, build_banded_operator

        src, dst, w, n = self._graph()
        # min_fill=0.5: at 6 tiles the wraparound offsets (single-tile
        # occupancy) must ride the residual, not become full diagonals
        bop = build_banded_operator(src, dst, w, n, dtype=np.int8, min_fill=0.5)
        assert bop is not None
        assert set(bop.offsets) == {-1, 0, 1}
        assert bop.residual is not None  # the %n wraparound corner blocks
        assert all(d.scale is not None for d in bop.diags)  # int8 factored

        rng = np.random.default_rng(12)
        state_t = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(8, n)).astype(np.float32))
        adj = np.zeros((n, n), np.float32)
        np.add.at(adj, (src, dst), w.astype(np.float32))
        adj_j = jnp.asarray(adj)

        got = np.asarray(banded_aggregate_t(state_t, bop))
        np.testing.assert_allclose(got, np.asarray(state_t) @ adj, rtol=1e-4, atol=1e-4)

        g_got = jax.grad(lambda s: jnp.sum(banded_aggregate_t(s, bop) * ct))(state_t)
        g_want = jax.grad(lambda s: jnp.sum((s @ adj_j) * ct))(state_t)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-4, atol=1e-4)

    def test_no_band_structure_returns_none(self):
        from gnnkeras_tpu.ops.banded import build_banded_operator

        rng = np.random.default_rng(13)
        n = 8 * 128
        src = rng.integers(0, n, 2000)
        dst = rng.integers(0, n, 2000)  # offsets spread over all tiles
        bop = build_banded_operator(src, dst, np.ones(2000), n, dtype=np.int8)
        assert bop is None

    def test_bf16_fallback_per_arc_weights(self):
        from gnnkeras_tpu.ops.banded import banded_aggregate_t, build_banded_operator

        src, dst, _, n = self._graph(seed=14)
        w = np.random.default_rng(15).normal(size=len(src))  # not factorable
        with pytest.warns(RuntimeWarning):
            bop = build_banded_operator(src, dst, w, n, dtype=np.int8)
        assert bop is not None and all(d.scale is None for d in bop.diags)
        state_t = jnp.asarray(np.random.default_rng(16).normal(size=(8, n)).astype(np.float32))
        adj = np.zeros((n, n), np.float32)
        np.add.at(adj, (src, dst), w.astype(np.float32))
        got = np.asarray(banded_aggregate_t(state_t, bop))
        np.testing.assert_allclose(got, np.asarray(state_t) @ adj, rtol=2e-2, atol=2e-2)


class TestBandedEngine:
    """agg_dtype='int8' on a banded graph routes the diagonal decomposition
    through the transposed unfold engine, row-major-equal."""

    def test_unfold_matches_float_engine(self):
        from gnnkeras_tpu.models.gnn import GNNnodeBased
        from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
        from gnnkeras_tpu.ops.banded import BandedOperator

        rng = np.random.default_rng(21)
        n = 6 * 128
        src = np.repeat(np.arange(n), 3)
        dst = (src + rng.integers(-30, 31, len(src))) % n
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        arcs = np.concatenate([pairs.astype(np.float64), rng.normal(size=(len(pairs), 2))], 1)
        g = GraphObject(nodes=rng.normal(size=(n, 6)), arcs=arcs,
                        targets=rng.normal(size=(n, 2)), focus="n",
                        aggregation_mode="average")
        bq = from_graph_object(g, agg_dtype="int8")
        assert isinstance(bq.bcsr, BandedOperator)
        bf = from_graph_object(g)

        ins, ls = get_inout_dims("state", 6, 2, 2, "n", 0)
        ino, lo = get_inout_dims("output", 6, 2, 2, "n", 0)
        gnn = GNNnodeBased(MLP(input_dim=ins[0], layers=ls, activations="selu"),
                           MLP(input_dim=ino[0], layers=lo, activations="softmax"), 0, 4, 0.01)
        gnn.build(seed=0)
        assert gnn._use_transposed(bq)
        for training in (False, True):
            kq, sq, _ = gnn.unfold(gnn.variables, bq, training=training)
            kf, sf, _ = gnn.unfold(gnn.variables, bf, training=training)
            assert float(kq) == float(kf)
            np.testing.assert_allclose(np.asarray(sq), np.asarray(sf), rtol=2e-4, atol=1e-5)
        # one SGD-grad equality through the banded VJPs
        def loss(p, b):
            k, s, _ = gnn.unfold({"params": p, "state": gnn.variables["state"]}, b, training=True)
            return jnp.sum(s ** 2)
        gq = jax.grad(lambda p: loss(p, bq))(gnn.variables["params"])
        gf = jax.grad(lambda p: loss(p, bf))(gnn.variables["params"])
        for a, b in zip(jax.tree_util.tree_leaves(gq), jax.tree_util.tree_leaves(gf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)

    def test_row_major_engine_on_banded_batch(self):
        """transposed=False still computes correctly via the sandwich."""
        from gnnkeras_tpu.ops.banded import BandedOperator

        rng = np.random.default_rng(23)
        n = 4 * 128
        src = np.repeat(np.arange(n), 2)
        dst = (src + rng.integers(-10, 11, len(src))) % n
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        arcs = np.concatenate([pairs.astype(np.float64), np.ones((len(pairs), 1))], 1)
        g = GraphObject(nodes=rng.normal(size=(n, 4)), arcs=arcs,
                        targets=rng.normal(size=(n, 2)), focus="n",
                        aggregation_mode="average")
        bq = from_graph_object(g, agg_dtype="int8")
        assert isinstance(bq.bcsr, BandedOperator)
        bf = from_graph_object(g)
        state = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(bq.aggregate(state)), np.asarray(bf.aggregate(state)),
            rtol=1e-4, atol=1e-4,
        )


class TestQuantizedSequencerDegrade:
    """agg_dtype='int8' on a MULTI-graph sequencer rebuilds float block
    operators (the MXU path) instead of silently dropping to the scatter
    engine (round-4 review finding), latched across epoch rebuilds."""

    def test_multi_sequencer_rebuilds_float_blocks(self):
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
        from gnnkeras_tpu.ops.bcsr import BcsrMatrix

        rng = np.random.default_rng(31)
        graphs = []
        for i in range(8):
            nn = int(rng.integers(6, 14))
            pairs = np.unique(np.stack([rng.integers(0, nn, 20), rng.integers(0, nn, 20)], 1), axis=0)
            arcs = np.concatenate([pairs.astype(np.float64), np.ones((len(pairs), 1))], 1)
            graphs.append(GraphObject(nodes=rng.normal(size=(nn, 3)), arcs=arcs,
                                      targets=rng.normal(size=(nn, 2)), focus="n",
                                      aggregation_mode="average"))
        with pytest.warns(RuntimeWarning, match="per-merge shaped"):
            seq = MultiGraphSequencer(graphs, "n", "average", batch_size=4,
                                      shuffle=False, agg_dtype="int8")
        assert seq.agg_dtype is None  # latched off
        for i in range(len(seq)):
            assert isinstance(seq[i].bcsr, BcsrMatrix)  # float MXU path kept
        seq.on_epoch_end()  # rebuild does not reintroduce quantized ops
        for i in range(len(seq)):
            assert isinstance(seq[i].bcsr, BcsrMatrix)


class TestQuantizedAutoEngine:
    def test_quantized_operators_force_transposed_auto(self):
        from gnnkeras_tpu.models.gnn import GNNnodeBased
        from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
        from gnnkeras_tpu.ops.banded import BandedOperator

        rng = np.random.default_rng(33)
        n = 4 * 128
        src = np.repeat(np.arange(n), 2)
        dst = (src + rng.integers(-10, 11, len(src))) % n
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        arcs = np.concatenate([pairs.astype(np.float64), np.ones((len(pairs), 1))], 1)
        g = GraphObject(nodes=rng.normal(size=(n, 4)), arcs=arcs,
                        targets=rng.normal(size=(n, 2)), focus="n",
                        aggregation_mode="average")
        bq = from_graph_object(g, agg_dtype="int8")
        assert isinstance(bq.bcsr, BandedOperator)
        # wide state (sd_pad > 32): the f32-BCSR rule would pick row-major,
        # but quantized operators always run the transposed engine in auto
        ds = 64
        ins, ls = get_inout_dims("state", 4, 1, 2, "n", ds)
        ino, lo = get_inout_dims("output", 4, 1, 2, "n", ds)
        wide = GNNnodeBased(MLP(input_dim=ins[0], layers=ls, activations="selu"),
                            MLP(input_dim=ino[0], layers=lo, activations="softmax"),
                            ds, 3, 0.01)
        wide.build(seed=0)
        assert wide._use_transposed(bq)
        assert not wide._use_transposed(from_graph_object(g))  # plain BCSR rule


class TestAutoAggDtype:
    """agg_dtype='auto' (graph/batch.py, partition.py, GNNConfig default):
    exact-only quantization — the banded int8 mask+scale decomposition when
    the factorization is numerically exact, the PLAIN float operator
    otherwise.  Never the bf16 degrade, never the QuantBcsr fallback, so
    'auto' is always semantics-preserving and safe as the config default."""

    def _banded_graph(self, seed=41, n=6 * 128, per_node=3, band=30, parallel_arc=False):
        rng = np.random.default_rng(seed)
        src = np.repeat(np.arange(n), per_node)
        dst = (src + rng.integers(-band, band + 1, len(src))) % n
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        arcs = np.concatenate([pairs.astype(np.float64), rng.normal(size=(len(pairs), 2))], 1)
        if parallel_arc:
            # duplicate an existing pair with a DIFFERENT label: survives
            # GraphObject's row dedup -> parallel arc -> weights sum on the
            # (src, dst) entry -> mask+scale factorization cannot hold
            dup = arcs[:1].copy()
            dup[0, 2:] += 1.0
            arcs = np.concatenate([arcs, dup])
        return GraphObject(nodes=rng.normal(size=(n, 6)), arcs=arcs,
                           targets=rng.normal(size=(n, 2)), focus="n",
                           aggregation_mode="average")

    def test_banded_factorable_takes_int8(self):
        from gnnkeras_tpu.ops.banded import BandedOperator, banded_aggregate_t

        g = self._banded_graph()
        b = from_graph_object(g, agg_dtype="auto")
        assert isinstance(b.bcsr, BandedOperator)
        assert all(d.scale is not None for d in b.bcsr.diags)  # int8 engaged
        # exactness of the auto operator vs the dense adjacency
        n = g.nodes.shape[0]
        src, dst = g.arcs[:, 0].astype(int), g.arcs[:, 1].astype(int)
        adj = np.zeros((b.num_nodes, b.num_nodes), np.float32)
        np.add.at(adj, (src, dst), np.asarray(g.arcnode_weight, np.float32))
        state_t = jnp.asarray(
            np.random.default_rng(42).normal(size=(8, b.num_nodes)).astype(np.float32)
        )
        got = np.asarray(banded_aggregate_t(state_t, b.bcsr))
        np.testing.assert_allclose(got, np.asarray(state_t) @ adj, rtol=1e-4, atol=1e-4)

    def test_nonfactorable_keeps_plain_float_silently(self):
        import warnings

        g = self._banded_graph(parallel_arc=True)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # the int8 degrade path warns; auto must not
            b = from_graph_object(g, agg_dtype="auto")
        assert isinstance(b.bcsr, BcsrMatrix)
        ref = from_graph_object(g)  # agg_dtype=None
        np.testing.assert_array_equal(np.asarray(b.bcsr.blocks), np.asarray(ref.bcsr.blocks))

    def test_scattered_keeps_plain_float(self):
        from gnnkeras_tpu.ops.bcsr import QuantBcsr

        rng = np.random.default_rng(43)
        n = 8 * 128
        # scattered offsets: no band structure -> 'auto' keeps plain blocks
        # where 'int8' would take the QuantBcsr fallback
        src = rng.integers(0, n, 3000)
        dst = rng.integers(0, n, 3000)
        arcs = np.concatenate([np.stack([src, dst], 1).astype(np.float64),
                               rng.normal(size=(3000, 1))], 1)
        g = GraphObject(nodes=rng.normal(size=(n, 4)), arcs=arcs,
                        targets=rng.normal(size=(n, 2)), focus="n",
                        aggregation_mode="average")
        b = from_graph_object(g, agg_dtype="auto")
        assert isinstance(b.bcsr, BcsrMatrix)
        assert isinstance(from_graph_object(g, agg_dtype="int8").bcsr, QuantBcsr)

    def test_config_default_routes_single_graph_auto(self):
        from gnnkeras_tpu.config import GNNConfig
        from gnnkeras_tpu.ops.banded import BandedOperator

        g = self._banded_graph()
        cfg = GNNConfig(focus="n", batch_size=256)
        assert cfg.agg_dtype == "auto"  # the documented default
        seq = cfg.build_sequencer(g)
        assert isinstance(seq.batches[0].bcsr, BandedOperator)
        # and the opt-out still reaches the sequencer
        seq_off = GNNConfig(focus="n", batch_size=256, agg_dtype=None).build_sequencer(g)
        assert isinstance(seq_off.batches[0].bcsr, BcsrMatrix)
        with pytest.raises(ValueError):
            GNNConfig(agg_dtype="int4")
