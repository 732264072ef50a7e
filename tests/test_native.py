"""Native host tier (gnnkeras_tpu.native): the C++ kernels must be
bit-identical to their NumPy fallbacks, and the TU parser must reproduce
np.loadtxt exactly on the reference dataset files."""

import os

import numpy as np
import pytest

from gnnkeras_tpu import native


def _force_fallback(monkeypatch):
    monkeypatch.setenv("GNNKERAS_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)


@pytest.fixture
def reset_native():
    yield
    native._lib = None
    native._tried = False


class TestNativeTier:
    def test_library_builds(self):
        assert native.available(), "native host tier failed to compile"

    def test_agg_label_sums_matches_numpy(self, monkeypatch, reset_native):
        rng = np.random.default_rng(1)
        n, a = 700, 3000
        src = rng.integers(0, n, a).astype(np.int32)
        dst = rng.integers(0, n, a).astype(np.int32)
        w = rng.random(a).astype(np.float32)
        w[::13] = 0.0  # padded-arc rows
        arc_label = rng.normal(size=(a, 3)).astype(np.float32)
        nodes = rng.normal(size=(n, 14)).astype(np.float32)
        got = native.agg_label_sums(src, dst, w, arc_label, nodes, n)
        _force_fallback(monkeypatch)
        want = native.agg_label_sums(src, dst, w, arc_label, nodes, n)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])

    def test_agg_component_sums_matches_numpy(self, monkeypatch, reset_native):
        rng = np.random.default_rng(2)
        n, a = 500, 2500
        src = rng.integers(0, n, a).astype(np.int32)
        dst = rng.integers(0, n, a).astype(np.int32)
        w = rng.random(a).astype(np.float32)
        nodes = rng.normal(size=(n, 14)).astype(np.float32)
        type_mask = np.zeros((n, 3), bool)
        type_mask[np.arange(n), rng.integers(0, 3, n)] = True
        type_mask[::29] = False  # untyped padded rows contribute nothing
        got = native.agg_component_sums(src, dst, w, nodes, type_mask, [14, 9, 5], n)
        _force_fallback(monkeypatch)
        want = native.agg_component_sums(src, dst, w, nodes, type_mask, [14, 9, 5], n)
        np.testing.assert_array_equal(got, want)

    def test_multi_hot_type_mask_uses_general_path(self):
        # a node flagged with two types contributes under both, as the
        # reference's per-type boolean_mask loop would
        src = np.array([0], np.int32)
        dst = np.array([1], np.int32)
        w = np.ones(1, np.float32)
        nodes = np.arange(4, dtype=np.float32).reshape(2, 2)
        type_mask = np.array([[True, True], [True, False]])
        acc = native.agg_component_sums(src, dst, w, nodes, type_mask, [2, 2], 2)
        np.testing.assert_array_equal(acc[1], [0.0, 1.0, 0.0, 1.0])

    def test_parse_ints_matches_loadtxt(self, tmp_path):
        if not native.available():
            pytest.skip("native tier unavailable")
        p = tmp_path / "vals.txt"
        p.write_text("1, 2\n-3, 44\n+5, 600\n\n7, -8\n")
        got = native.load_ints(str(p))
        np.testing.assert_array_equal(got, [1, 2, -3, 44, 5, 600, 7, -8])

    def test_parse_reference_file(self):
        if not native.available():
            pytest.skip("native tier unavailable")
        path = "/root/reference/MUTAG_raw/Mutagenicity_graph_labels.txt"
        if not os.path.exists(path):
            pytest.skip("reference dataset not present")
        got = native.load_ints(path)
        want = np.loadtxt(path, dtype=int)
        np.testing.assert_array_equal(got, want)

    def test_malformed_file_raises(self, tmp_path):
        if not native.available():
            pytest.skip("native tier unavailable")
        p = tmp_path / "bad.txt"
        p.write_text("1, 2\nxyz\n")
        with pytest.raises(ValueError):
            native.load_ints(str(p))

    def test_batch_build_uses_native(self):
        # end to end: from_graph_object's precomputed sums are identical with
        # and without the native tier (exercised via the real MUTAG subset in
        # other suites; here a toy graph keeps it hermetic)
        from gnnkeras_tpu.graph.batch import from_graph_object
        from gnnkeras_tpu.graph.graph import GraphObject

        rng = np.random.default_rng(3)
        nodes = rng.normal(size=(9, 4))
        arcs = np.concatenate([rng.integers(0, 9, (20, 2)), rng.normal(size=(20, 2))], axis=1)
        g = GraphObject(nodes=nodes, arcs=arcs, targets=np.eye(1, 2), focus="g",
                        aggregation_mode="average")
        b = from_graph_object(g)
        agg = np.asarray(b.agg_arc_labels)
        # oracle: dense ArcNode^T @ arc_labels
        an = g.ArcNode_coo().toarray()
        want = an.T @ np.asarray(g.arcs[:, 2:], np.float64)
        np.testing.assert_allclose(agg[: want.shape[0]], want, rtol=1e-6)

    def test_f64_inputs_not_downcast(self):
        # under floatx='float64' the wrapper must not squeeze inputs through
        # f32 — values below f32 resolution must survive
        rng = np.random.default_rng(5)
        n, a = 50, 200
        src = rng.integers(0, n, a).astype(np.int32)
        dst = rng.integers(0, n, a).astype(np.int32)
        w = (1.0 + rng.random(a) * 1e-9).astype(np.float64)  # f32 would round
        arc_label = rng.normal(size=(a, 2)).astype(np.float64)
        nodes = rng.normal(size=(n, 3)).astype(np.float64)
        got_arc, got_node = native.agg_label_sums(src, dst, w, arc_label, nodes, n)
        want_arc = np.zeros((n, 2))
        np.add.at(want_arc, dst, arc_label * w[:, None])
        want_node = np.zeros((n, 3))
        np.add.at(want_node, dst, nodes[src] * w[:, None])
        np.testing.assert_array_equal(got_arc, want_arc)
        np.testing.assert_array_equal(got_node, want_node)

    def test_zero_weight_nan_label_propagates(self):
        # 0*NaN must produce NaN exactly as np.add.at does (no zero skip)
        src = np.array([0], np.int32)
        dst = np.array([1], np.int32)
        w = np.zeros(1, np.float32)
        arc_label = np.full((1, 1), np.nan, np.float32)
        nodes = np.ones((2, 1), np.float32)
        acc_arc, _ = native.agg_label_sums(src, dst, w, arc_label, nodes, 2)
        assert np.isnan(acc_arc[1, 0])


class TestScatterAdd3d:
    def _case(self, seed, dims=(7, 32, 128), n=5000, wdtype=np.float64):
        rng = np.random.default_rng(seed)
        out = np.zeros(dims, np.float32)
        i0 = rng.integers(0, dims[0], n)
        i1 = rng.integers(0, dims[1], n)
        i2 = rng.integers(0, dims[2], n)
        w = rng.normal(size=n).astype(wdtype)
        # heavy duplicates: many edges land on the same cell so accumulation
        # ORDER and per-element rounding are both exercised
        i0[:: 3] = 0
        i1[:: 3] = 0
        i2[:: 3] = 0
        return out, i0, i1, i2, w

    @pytest.mark.parametrize("wdtype", [np.float32, np.float64])
    def test_matches_np_add_at(self, monkeypatch, reset_native, wdtype):
        out, i0, i1, i2, w = self._case(2, wdtype=wdtype)
        got = native.scatter_add_3d(out.copy(), i0, i1, i2, w)
        want = out.copy()
        np.add.at(want, (i0, i1, i2), w)
        np.testing.assert_array_equal(got, want)
        _force_fallback(monkeypatch)
        fb = native.scatter_add_3d(out.copy(), i0, i1, i2, w)
        np.testing.assert_array_equal(fb, want)

    def test_extreme_magnitudes_bit_identical(self):
        # f32 cancellation/rounding cases: big + tiny, sign flips, exact zeros
        rng = np.random.default_rng(3)
        out = np.zeros((2, 8, 8), np.float32)
        n = 4000
        i0 = rng.integers(0, 2, n); i1 = rng.integers(0, 8, n); i2 = rng.integers(0, 8, n)
        w = (rng.normal(size=n) * 10.0 ** rng.integers(-20, 20, n))
        w[::7] = 0.0
        got = native.scatter_add_3d(out.copy(), i0, i1, i2, w)
        want = out.copy(); np.add.at(want, (i0, i1, i2), w)
        np.testing.assert_array_equal(got, want)

    def test_empty(self):
        out = np.zeros((1, 4, 4), np.float32)
        e = np.zeros(0, np.int64)
        got = native.scatter_add_3d(out.copy(), e, e, e, np.zeros(0))
        np.testing.assert_array_equal(got, out)


class TestFactorMaskScaleNative:
    def _factorable(self, seed=4, B=3, R=32, C=128, dtype=np.float64):
        rng = np.random.default_rng(seed)
        scale = np.where(rng.random((B, C)) < 0.8, rng.random((B, C)), 0.0)
        mask = (rng.random((B, R, C)) < 0.3) & (scale[:, None, :] != 0)
        return (mask * scale[:, None, :]).astype(dtype)

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_factorable_matches_fallback(self, monkeypatch, reset_native, dtype):
        arr = self._factorable(dtype=dtype)
        got = native.factor_mask_scale(arr)
        assert got is not None
        _force_fallback(monkeypatch)
        want = native.factor_mask_scale(arr)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
        assert got[0].dtype == np.int8 and got[1].dtype == np.float32

    def test_nonfactorable_and_nan(self, monkeypatch, reset_native):
        arr = self._factorable(seed=5)
        bad = arr.copy()
        bad[0, 0, 0] = 1.25; bad[0, 1, 0] = 2.5  # two different nonzeros, one column
        assert native.factor_mask_scale(bad) is None
        nan = arr.copy(); nan[(nan != 0)] = np.nan  # NaN columns: both paths refuse
        assert native.factor_mask_scale(nan) is None
        _force_fallback(monkeypatch)
        assert native.factor_mask_scale(bad) is None
        assert native.factor_mask_scale(nan) is None

    def test_single_nan_column_refused_both_paths(self, monkeypatch, reset_native):
        arr = np.zeros((1, 4, 8), np.float64)
        arr[0, 2, 3] = np.nan  # sole nonzero of its column
        assert native.factor_mask_scale(arr) is None
        _force_fallback(monkeypatch)
        assert native.factor_mask_scale(arr) is None


class TestScatterAddIndexSemantics:
    def test_out_of_range_raises_like_numpy(self):
        out = np.zeros((2, 4, 4), np.float32)
        with pytest.raises(IndexError):
            native.scatter_add_3d(out, np.array([2]), np.array([0]), np.array([0]), np.array([1.0]))
        with pytest.raises(IndexError):
            native.scatter_add_3d(out, np.array([0]), np.array([-5]), np.array([0]), np.array([1.0]))

    def test_negative_indices_wrap_like_numpy(self):
        out = np.zeros((2, 4, 4), np.float32)
        got = native.scatter_add_3d(out.copy(), np.array([-1, 0]), np.array([-2, 1]),
                                    np.array([-4, 3]), np.array([2.0, 3.0]))
        want = out.copy()
        np.add.at(want, (np.array([-1, 0]), np.array([-2, 1]), np.array([-4, 3])),
                  np.array([2.0, 3.0]))
        np.testing.assert_array_equal(got, want)


class TestCanonicalArcs:
    """native.canonical_arcs == np.unique(arcs, axis=0) bit-for-bit on
    eligible input (the GraphObject ctor hotspot — 7.2x measured at the
    500k-node/4M-arc shape), with the general-semantics cases refused."""

    def _arcs(self, dtype, n=20000, nodes=200, seed=0):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, nodes, n)
        dst = rng.integers(0, nodes, n)
        labels = rng.normal(size=(n, 2)).round(1)
        labels[labels == 0] = 0.25  # -0.0 is (correctly) refused
        arcs = np.concatenate([np.stack([src, dst], 1), labels], 1).astype(dtype)
        # exact duplicates AND parallel arcs (same pair, different label)
        return np.concatenate([arcs, arcs[:500]])

    @pytest.mark.parametrize("dtype", [np.float64, np.float32])
    def test_matches_np_unique(self, dtype):
        arcs = self._arcs(dtype)
        got = native.canonical_arcs(arcs)
        if got is None:
            pytest.skip("native tier unavailable")
        ref = np.unique(arcs, axis=0)
        assert got.dtype == ref.dtype
        np.testing.assert_array_equal(got, ref)

    def test_ineligible_inputs_refused(self):
        if not native.available():
            pytest.skip("native tier unavailable")
        cases = [
            np.array([[0.0, 1.0, np.nan]]),       # NaN label
            np.array([[np.nan, 1.0, 1.0]]),       # NaN endpoint
            np.array([[-0.0, 1.0, 1.0]]),         # -0.0 endpoint
            np.array([[0.0, 1.0, -0.0]]),         # -0.0 label
            np.array([[-1.0, 1.0, 1.0]]),         # negative id
            np.array([[0.5, 1.0, 1.0]]),          # non-integral id
            np.array([[2.0 ** 33, 1.0, 1.0]]),    # id >= 2^32
            np.array([[1, 2, 3]], dtype=np.int64),  # non-float dtype
        ]
        for bad in cases:
            assert native.canonical_arcs(bad) is None, bad

    def test_empty(self):
        got = native.canonical_arcs(np.zeros((0, 4)))
        if got is None:
            pytest.skip("native tier unavailable")
        assert got.shape == (0, 4)

    def test_graph_ctor_uses_it_and_falls_back(self):
        """The ctor's canonical arcs equal the NumPy path's on a graph whose
        labels include a NaN (forced fallback) and on a clean graph."""
        from gnnkeras_tpu.graph.graph import GraphObject

        rng = np.random.default_rng(3)
        n = 50
        arcs = np.concatenate(
            [rng.integers(0, n, (200, 2)).astype(float), rng.normal(size=(200, 1))], 1
        )
        g1 = GraphObject(nodes=rng.normal(size=(n, 3)), arcs=arcs.copy(),
                         targets=rng.normal(size=(n, 2)), focus="n")
        np.testing.assert_array_equal(
            np.asarray(g1.arcs), np.unique(arcs, axis=0).astype(g1.arcs.dtype)
        )
        arcs_nan = arcs.copy()
        arcs_nan[0, 2] = np.nan
        g2 = GraphObject(nodes=rng.normal(size=(n, 3)), arcs=arcs_nan,
                         targets=rng.normal(size=(n, 2)), focus="n")
        assert g2.arcs.shape[1] == 3  # NumPy fallback path ran


class TestUniqueI64:
    @pytest.mark.parametrize("return_inverse", [False, True])
    def test_matches_np_unique(self, return_inverse):
        rng = np.random.default_rng(9)
        keys = rng.integers(-1000, 1000, 40000).astype(np.int64)
        got = native.unique_i64(keys, return_inverse=return_inverse)
        want = np.unique(keys, return_inverse=return_inverse)
        if return_inverse:
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])
        else:
            np.testing.assert_array_equal(got, want)

    def test_empty_and_single(self):
        np.testing.assert_array_equal(
            native.unique_i64(np.array([], np.int64)), np.array([], np.int64))
        u, inv = native.unique_i64(np.array([7], np.int64), return_inverse=True)
        np.testing.assert_array_equal(u, [7])
        np.testing.assert_array_equal(inv, [0])

    def test_non_i64_falls_back(self):
        got = native.unique_i64(np.array([3.0, 1.0, 3.0]))
        np.testing.assert_array_equal(got, [1.0, 3.0])


class TestWholeBatchBitIdentity:
    def test_banded_auto_batch_native_equals_numpy(self, monkeypatch, reset_native):
        """End-to-end: the agg_dtype='auto' banded batch (ctor dedup +
        unique_i64 block keys + fused scatter + factorization) is
        bit-identical with and without the native tier (round-5 kernels:
        canonical_arcs, unique_i64, scatter_add_f32_idx3)."""
        import jax

        from gnnkeras_tpu.graph.batch import from_graph_object
        from gnnkeras_tpu.graph.graph import GraphObject

        rng = np.random.default_rng(7)
        n = 1024
        src = np.repeat(np.arange(n), 4)
        dst = (src + rng.integers(-24, 25, len(src))) % n
        arcs = np.concatenate(
            [np.stack([src, dst], 1).astype(np.float32),
             rng.normal(size=(len(src), 2)).astype(np.float32)], axis=1)
        nodes = rng.normal(size=(n, 5)).astype(np.float32)
        targets = rng.normal(size=(n, 2)).astype(np.float32)

        def build():
            g = GraphObject(nodes=nodes, arcs=arcs.copy(), targets=targets,
                            focus="n", aggregation_mode="average")
            return from_graph_object(g, agg_dtype="auto")

        b_native = build()
        _force_fallback(monkeypatch)
        b_numpy = build()
        for a, b in zip(jax.tree_util.tree_leaves(b_native),
                        jax.tree_util.tree_leaves(b_numpy)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
