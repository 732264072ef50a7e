"""Compact-strip Pallas aggregation (ops/strip.py) vs a dense oracle —
forward and custom-VJP backward, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.ops.strip import (
    SLOT,
    TILE,
    StripFactorError,
    build_strip_operator,
    strip_aggregate,
    strip_aggregate_t,
    strip_to_dense,
)


def random_slot_graph(seed=0, n_tiles=3, cross_slot=True):
    """Edges over n_tiles*128 nodes, mostly within 32-slots plus (optionally)
    cross-slot residual edges."""
    rng = np.random.default_rng(seed)
    n = n_tiles * TILE
    # within-slot edges
    base = rng.integers(0, n, 600)
    off = rng.integers(0, SLOT, 600)
    src_in = (base // SLOT) * SLOT + off
    dst_in = base
    src, dst = [src_in], [dst_in]
    if cross_slot:
        src_x = rng.integers(0, n, 120)
        dst_x = rng.integers(0, n, 120)
        src.append(src_x)
        dst.append(dst_x)
    src = np.concatenate(src)
    dst = np.concatenate(dst)
    w = rng.normal(size=len(src))
    return src, dst, w, n


def dense_oracle(src, dst, w, n, state):
    adj = np.zeros((n, n), np.float64)
    np.add.at(adj, (src, dst), w)
    return (adj.T @ state.astype(np.float64)).astype(np.float32)


class TestStripBuild:
    def test_zero_weight_crossing_rows_build_no_residual(self):
        """Padding rows (weight 0) that cross slot boundaries must not force
        a permanently-zero residual BCSR pass on every aggregation call."""
        src = np.array([0, 1, 5])   # 5 -> 40 crosses the 32-slot boundary...
        dst = np.array([1, 0, 40])
        w = np.array([1.0, 1.0, 0.0])  # ...but carries weight 0 (padding)
        op = build_strip_operator(src, dst, w, TILE)
        assert op.residual is None and op.residual_t is None
        # a LIVE crossing row still builds it
        op2 = build_strip_operator(src, dst, np.array([1.0, 1.0, 2.0]), TILE)
        assert op2.residual is not None


class TestStripAggregate:
    @pytest.mark.parametrize("cross_slot", [False, True])
    @pytest.mark.parametrize("d", [14, 8, 3])
    def test_forward_matches_dense(self, cross_slot, d):
        src, dst, w, n = random_slot_graph(cross_slot=cross_slot)
        op = build_strip_operator(src, dst, w, n)
        assert (op.residual is not None) == cross_slot
        state = np.random.default_rng(1).normal(size=(n, d)).astype(np.float32)
        got = np.asarray(strip_aggregate(jnp.asarray(state), op))
        want = dense_oracle(src, dst, w, n, state)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_backward_matches_autodiff_oracle(self):
        src, dst, w, n = random_slot_graph(seed=3)
        op = build_strip_operator(src, dst, w, n)
        d = 5
        state = jnp.asarray(np.random.default_rng(2).normal(size=(n, d)).astype(np.float32))
        ct_seed = jnp.asarray(np.random.default_rng(3).normal(size=(n, d)).astype(np.float32))

        g_got = jax.grad(lambda s: jnp.sum(strip_aggregate(s, op) * ct_seed))(state)

        adj = np.zeros((n, n), np.float32)
        np.add.at(adj, (src, dst), w.astype(np.float32))
        adj_j = jnp.asarray(adj)
        g_want = jax.grad(lambda s: jnp.sum((adj_j.T @ s) * ct_seed))(state)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-4, atol=1e-4)

    def test_mutag_packed_exactness(self):
        """Real Mutagenicity packed at 32-slot granularity: strips + residual
        reproduce the full aggregation."""
        from gnnkeras_tpu.data.mutag import load_mutag
        from gnnkeras_tpu.graph.graph import GraphObject
        from gnnkeras_tpu.graph.packing import packed_node_positions
        from gnnkeras_tpu.ops.segment import aggregate_neighbors

        graphs = load_mutag()[:300]
        merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
        pos, n_rows = packed_node_positions(merged.graph_of_node, tile=SLOT)
        n_pad = -(-n_rows // TILE) * TILE
        src = pos[merged.arcs[:, 0].astype(np.int64)]
        dst = pos[merged.arcs[:, 1].astype(np.int64)]
        w = merged.arcnode_weight

        op = build_strip_operator(src, dst, w, n_pad)
        state = np.random.default_rng(5).normal(size=(n_pad, 14)).astype(np.float32)
        got = np.asarray(strip_aggregate(jnp.asarray(state), op))
        want = np.asarray(
            aggregate_neighbors(jnp.asarray(state), jnp.asarray(src.astype(np.int32)),
                                jnp.asarray(dst.astype(np.int32)),
                                jnp.asarray(w.astype(np.float32)), n_pad)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)

    @pytest.mark.parametrize("n_tiles", [16, 20, 33])
    def test_blocked_grid_pad_path(self, n_tiles):
        """Tile counts above K_TILES that are not a multiple of it exercise
        the internal zero-padding of the K-blocked grid (ops/strip.py
        _strip_matmul) — padding must be inert and the output sliced back."""
        src, dst, w, n = random_slot_graph(seed=7, n_tiles=n_tiles)
        op = build_strip_operator(src, dst, w, n)
        state = np.random.default_rng(8).normal(size=(n, 6)).astype(np.float32)
        got = np.asarray(strip_aggregate(jnp.asarray(state), op))
        want = dense_oracle(src, dst, w, n, state)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestSlotGeneralization:
    """slot=64 compacts two 64x64 blocks per tile; slot=128 degenerates to
    plain dense diagonal blocks (no expansion)."""

    @pytest.mark.parametrize("slot", [32, 64, 128])
    @pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
    def test_forward_matches_dense(self, slot, dtype):
        src, dst, w, n = random_slot_graph(seed=11, cross_slot=True)
        op = build_strip_operator(src, dst, w, n, slot=slot, dtype=jnp.dtype(dtype))
        assert op.strip.shape[1] == slot and op.slot == slot
        state = np.random.default_rng(12).normal(size=(n, 14)).astype(np.float32)
        got = np.asarray(strip_aggregate(jnp.asarray(state), op))
        want = dense_oracle(src, dst, w, n, state)
        tol = 2e-2 if dtype == "bfloat16" else 1e-4
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

    def test_slot128_has_no_within_tile_residual(self):
        """At slot=TILE every within-tile edge lives in the (diagonal-block)
        strip; only cross-tile edges go to the residual."""
        rng = np.random.default_rng(13)
        n = 4 * TILE
        src = rng.integers(0, TILE, 500)  # tile-0 internal, incl. all slots
        dst = rng.integers(0, TILE, 500)
        w = rng.normal(size=500)
        op = build_strip_operator(src, dst, w, n, slot=TILE)
        assert op.residual is None
        op32 = build_strip_operator(src, dst, w, n, slot=32)
        assert op32.residual is not None  # 32-slot crossings exist


def average_mode_graph(seed=0, n_tiles=4, cross_slot=True):
    """Deduplicated edges with per-destination weights 1/indeg — the
    reference's 'average' aggregation (graph_class.py:105-121), the shape
    int8 mask+scale storage factorizes."""
    src, dst, _, n = random_slot_graph(seed=seed, n_tiles=n_tiles, cross_slot=cross_slot)
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    indeg = np.bincount(dst, minlength=n).astype(np.float64)
    w = 1.0 / indeg[dst]
    return src, dst, w, n


class TestInt8MaskScale:
    """int8 mask + per-column f32 scale storage: exact factorization of the
    per-destination aggregation weights, half the bf16 operator bytes."""

    @pytest.mark.parametrize("slot", [32, 64, 128])
    def test_forward_matches_dense(self, slot):
        src, dst, w, n = average_mode_graph(seed=31)
        op = build_strip_operator(src, dst, w, n, slot=slot, dtype=np.int8)
        assert op.scale is not None and op.strip.dtype == jnp.int8
        assert op.scale.shape == (op.strip.shape[0], TILE)
        state = np.random.default_rng(32).normal(size=(n, 14)).astype(np.float32)
        got = np.asarray(strip_aggregate(jnp.asarray(state), op))
        want = dense_oracle(src, dst, w, n, state)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_transposed_forward_and_backward(self):
        src, dst, w, n = average_mode_graph(seed=33)
        op = build_strip_operator(src, dst, w, n, dtype=np.int8)
        d_pad = 16
        state_t = jnp.asarray(
            np.random.default_rng(34).normal(size=(d_pad, n)).astype(np.float32)
        )
        ct = jnp.asarray(np.random.default_rng(35).normal(size=(d_pad, n)).astype(np.float32))
        got = np.asarray(strip_aggregate_t(state_t, op))
        want = dense_oracle(src, dst, w, n, np.asarray(state_t).T).T
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

        # the VJP applies the SAME forward scale on the contraction axis
        g_got = jax.grad(lambda s: jnp.sum(strip_aggregate_t(s, op) * ct))(state_t)
        adj = np.zeros((n, n), np.float32)
        np.add.at(adj, (src, dst), w.astype(np.float32))
        adj_j = jnp.asarray(adj)
        g_want = jax.grad(lambda s: jnp.sum((s @ adj_j) * ct))(state_t)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-3, atol=1e-3)

    def test_mixed_format_int8(self):
        """Mixed strip/block regions both factor (n_strip_tiles path)."""
        from gnnkeras_tpu.ops.strip import K_TILES

        src, dst, w, n = average_mode_graph(seed=36, n_tiles=2 * K_TILES + 4)
        op = build_strip_operator(src, dst, w, n, slot=32, dtype=np.int8,
                                  n_strip_tiles=K_TILES)
        assert op.scale is not None and op.blocks_scale is not None
        assert op.blocks.dtype == jnp.int8
        state = np.random.default_rng(37).normal(size=(n, 6)).astype(np.float32)
        got = np.asarray(strip_aggregate(jnp.asarray(state), op))
        want = dense_oracle(src, dst, w, n, state)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_not_factorable_raises(self):
        """Per-arc weights (or duplicate arcs) cannot factor into mask+scale."""
        src, dst, w, n = random_slot_graph(seed=38)  # w ~ N(0,1) per arc
        with pytest.raises(StripFactorError):
            build_strip_operator(src, dst, w, n, dtype=np.int8)
        # duplicate arcs accumulate to 2/indeg in one column entry
        s2, d2, w2, n2 = average_mode_graph(seed=39)
        s2 = np.concatenate([s2, s2[:1]])
        d2 = np.concatenate([d2, d2[:1]])
        w2 = np.concatenate([w2, w2[:1]])
        with pytest.raises(StripFactorError):
            build_strip_operator(s2, d2, w2, n2, dtype=np.int8)

    def test_strip_to_dense_roundtrip(self):
        """Dense reconstruction (sequencer downgrade path) reproduces the
        directly-built dense operator's aggregation, strips and transposes."""
        for slot in (32, 128):
            src, dst, w, n = average_mode_graph(seed=40)
            op8 = build_strip_operator(src, dst, w, n, slot=slot, dtype=np.int8)
            opd = strip_to_dense(op8, dtype=jnp.float32)
            assert opd.scale is None and opd.blocks_scale is None
            opf = build_strip_operator(src, dst, w, n, slot=slot, dtype=np.float32)
            np.testing.assert_allclose(
                np.asarray(opd.strip, np.float32), np.asarray(opf.strip), rtol=1e-6, atol=1e-7
            )
            np.testing.assert_allclose(
                np.asarray(opd.strip_t, np.float32), np.asarray(opf.strip_t),
                rtol=1e-6, atol=1e-7,
            )

    def test_strip_to_dense_roundtrip_mixed_blocks(self):
        """The blocks/blocks_t reconstruction branch (mixed-format operators,
        the sequencer/partition_packed downgrade path) reproduces the
        directly-built float operator, including the transposed blocks."""
        from gnnkeras_tpu.ops.strip import K_TILES

        src, dst, w, n = average_mode_graph(seed=43, n_tiles=2 * K_TILES + 4)
        op8 = build_strip_operator(src, dst, w, n, slot=32, dtype=np.int8,
                                   n_strip_tiles=K_TILES)
        assert op8.blocks is not None and op8.blocks_scale is not None
        opd = strip_to_dense(op8, dtype=jnp.float32)
        assert opd.scale is None and opd.blocks_scale is None
        opf = build_strip_operator(src, dst, w, n, slot=32, dtype=np.float32,
                                   n_strip_tiles=K_TILES)
        for name in ("strip", "strip_t", "blocks", "blocks_t"):
            np.testing.assert_allclose(
                np.asarray(getattr(opd, name), np.float32),
                np.asarray(getattr(opf, name)),
                rtol=1e-6, atol=1e-7, err_msg=name,
            )
        # and the aggregation itself agrees end-to-end
        state = np.random.default_rng(44).normal(size=(n, 6)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(strip_aggregate(jnp.asarray(state), opd)),
            np.asarray(strip_aggregate(jnp.asarray(state), opf)),
            rtol=1e-5, atol=1e-5,
        )

    def test_from_graph_object_int8_and_fallback(self):
        """strip_dtype='int8' engages on average-mode merges and falls back
        to bf16 dense storage (with a RuntimeWarning) when the weights don't
        factor."""
        from gnnkeras_tpu.graph.batch import from_graph_object
        from gnnkeras_tpu.graph.graph import GraphObject

        rng = np.random.default_rng(41)
        graphs = []
        for i in range(6):
            nn = int(rng.integers(8, 20))
            nodes = np.eye(5, dtype=np.float32)[rng.integers(0, 5, nn)]
            na = 2 * nn
            pairs = np.unique(
                np.stack([rng.integers(0, nn, na), rng.integers(0, nn, na)], 1), axis=0
            )
            arcs = np.concatenate(
                [pairs.astype(np.float64), np.ones((len(pairs), 1))], axis=1
            )
            graphs.append(GraphObject(nodes=nodes, arcs=arcs,
                                      targets=np.eye(2, dtype=np.float32)[[i % 2]],
                                      focus="g", aggregation_mode="average"))
        merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
        b = from_graph_object(merged, slot_pack=128, strip_dtype="int8")
        assert b.strip.scale is not None and b.strip.strip.dtype == jnp.int8

        state = rng.normal(size=(b.nodes.shape[0], 5)).astype(np.float32)
        got = np.asarray(strip_aggregate(jnp.asarray(state), b.strip))
        bf = from_graph_object(merged, slot_pack=128, strip_dtype="float32")
        want = np.asarray(strip_aggregate(jnp.asarray(state), bf.strip))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

        # composite_average gives one destination TWO weights (one per source
        # type) — not column-factorable, so int8 silently downgrades to bf16
        from gnnkeras_tpu.graph.graph import CompositeGraphObject

        nodes = np.arange(10, dtype=float).reshape(5, 2)
        arcs = np.array(  # node 2: two type-0 in-arcs (w=1/2), one type-1 (w=1)
            [[0, 2, 1.0], [1, 2, 0.0], [3, 2, 1.0], [0, 1, 1.0], [3, 4, 0.5]]
        )
        tm = np.zeros((5, 2), dtype=bool)
        tm[:2, 0] = True
        tm[2:, 1] = True
        cg = CompositeGraphObject(
            nodes=nodes, arcs=arcs, targets=np.ones((5, 1)), type_mask=tm,
            dim_node_label=(2, 2), focus="n", aggregation_mode="composite_average",
        )
        with pytest.warns(RuntimeWarning, match="not column-factorable"):
            cb = from_graph_object(cg, slot_pack=128, strip_dtype="int8")
        assert cb.strip is not None
        assert cb.strip.scale is None and cb.strip.strip.dtype == jnp.bfloat16


class TestTransposedInterface:
    @pytest.mark.parametrize("slot", [32, 128])
    def test_forward_matches_row_major(self, slot):
        src, dst, w, n = random_slot_graph(seed=21, cross_slot=True)
        op = build_strip_operator(src, dst, w, n, slot=slot)
        d, d_pad = 14, 16
        state = np.random.default_rng(22).normal(size=(n, d)).astype(np.float32)
        state_t = np.zeros((d_pad, n), np.float32)
        state_t[:d] = state.T
        got_t = np.asarray(strip_aggregate_t(jnp.asarray(state_t), op))
        want = np.asarray(strip_aggregate(jnp.asarray(state), op))
        np.testing.assert_allclose(got_t[:d].T, want, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got_t[d:], 0.0, atol=1e-6)  # pad rows stay zero

    def test_backward_matches_autodiff_oracle(self):
        src, dst, w, n = random_slot_graph(seed=23, cross_slot=True)
        op = build_strip_operator(src, dst, w, n)
        d_pad = 8
        state_t = jnp.asarray(np.random.default_rng(24).normal(size=(d_pad, n)).astype(np.float32))
        ct = jnp.asarray(np.random.default_rng(25).normal(size=(d_pad, n)).astype(np.float32))

        g_got = jax.grad(lambda s: jnp.sum(strip_aggregate_t(s, op) * ct))(state_t)

        adj = np.zeros((n, n), np.float32)
        np.add.at(adj, (src, dst), w.astype(np.float32))
        adj_j = jnp.asarray(adj)
        g_want = jax.grad(lambda s: jnp.sum((s @ adj_j) * ct))(state_t)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-4, atol=1e-4)

    def test_bcsr_aggregate_t_matches_row_major(self):
        from gnnkeras_tpu.ops.bcsr import bcsr_aggregate, bcsr_aggregate_t, build_bcsr

        rng = np.random.default_rng(26)
        n_src, n_dst = 3 * TILE, 2 * TILE
        src = rng.integers(0, n_src, 400)
        dst = rng.integers(0, n_dst, 400)
        w = rng.normal(size=400)
        m = build_bcsr(src, dst, w, n_src, n_dst)
        state = rng.normal(size=(n_src, 10)).astype(np.float32)
        got = np.asarray(bcsr_aggregate_t(jnp.asarray(state.T.copy()), m))
        want = np.asarray(bcsr_aggregate(jnp.asarray(state), m))
        np.testing.assert_allclose(got.T, want, rtol=1e-4, atol=1e-4)
