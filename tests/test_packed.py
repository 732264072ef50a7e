"""Molecule-granular packed partitioning (parallel/packed.py): per-device
single-chip engine + psum'd BN/predicate/loss must equal the single-chip
merged-batch engine exactly (up to f32 reduction order)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNgraphBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.parallel.mesh import make_mesh
from gnnkeras_tpu.parallel.packed import (
    PackedPartitionedGNN,
    balance_graphs,
    partition_packed,
    split_merged_by_graph,
)

DN, DA, T = 6, 2, 2


def molecule_batch(n_graphs=40, seed=0):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(8, 30))
        a = int(rng.integers(12, 50))
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, DA))], axis=1)
        t = np.zeros((1, T))
        t[0, rng.integers(T)] = 1
        graphs.append(GraphObject(nodes=rng.normal(size=(n, DN)), arcs=arcs, targets=t,
                                  focus="g", aggregation_mode="average"))
    return GraphObject.merge(graphs, focus="g", aggregation_mode="average")


def build_gnn(per_iteration_bn=False, strip=True):
    ins, ls = get_inout_dims("state", DN, DA, T, "g", 0)
    ino, lo = get_inout_dims("output", DN, DA, T, "g", 0)
    gnn = GNNgraphBased(
        MLP(input_dim=ins[0], layers=ls, activations="selu",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=ino[0], layers=lo, activations="softmax",
            kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        0, 5, 0.01, per_iteration_bn=per_iteration_bn,
    )
    gnn.build(seed=0)
    return gnn


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8
    return make_mesh(("graph",))


class TestSplitInvariants:
    def test_balance_covers_all_graphs(self):
        sizes = np.random.default_rng(0).integers(5, 50, 37)
        groups = balance_graphs(sizes, 8)
        got = np.sort(np.concatenate(groups))
        np.testing.assert_array_equal(got, np.arange(37))
        loads = [int(sizes[g].sum()) for g in groups]
        assert max(loads) - min(loads) <= max(sizes)

    def test_split_preserves_structure(self):
        merged = molecule_batch(12, seed=3)
        ids = np.array([1, 4, 7])
        sub = split_merged_by_graph(merged, ids)
        assert sub.num_graphs == 3
        sizes = np.bincount(merged.graph_of_node.astype(np.int64))
        assert sub.nodes.shape[0] == int(sizes[ids].sum())
        np.testing.assert_allclose(sub.targets, merged.targets[ids])
        # arcnode weights are within-graph functions: identical after relabel
        counts = np.bincount(merged.graph_of_node[merged.arcs[:, 1].astype(np.int64)].astype(np.int64))
        assert sub.arcs.shape[0] == int(counts[ids].sum())


class TestPackedPartitionedEqualsSingle:
    @pytest.mark.parametrize("per_iter_bn", [False, True])
    @pytest.mark.parametrize("training", [False, True])
    def test_forward_parity(self, mesh8, training, per_iter_bn):
        merged = molecule_batch(40, seed=0)
        gnn = build_gnn(per_iteration_bn=per_iter_bn)
        # f32 strips so the comparison is reduction-order-only
        batch1 = from_graph_object(merged, slot_pack=128, strip_dtype="float32")
        rng = jax.random.PRNGKey(0)
        k1, s1, out1, m1, ms1 = gnn.forward(gnn.variables, batch1, training=training, rng=rng)

        stacked, meta = partition_packed(merged, 8, strip_dtype="float32")
        pgnn = PackedPartitionedGNN(gnn, mesh8)
        k, state, out, om, new_mstate = pgnn.forward(stacked, training=training, rng=rng)

        assert float(k) == float(k1)
        ref = np.asarray(out1)[np.asarray(batch1.host_pred_rows)]
        got = np.zeros_like(ref)
        out = np.asarray(out)
        for p in range(8):
            got[meta.groups[p]] = out[p][meta.pred_rows[p]]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)
        if training:
            for a, b in zip(jax.tree_util.tree_leaves(new_mstate),
                            jax.tree_util.tree_leaves(ms1)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)

    def test_one_sgd_step_parity(self, mesh8):
        """One packed train step == one single-chip full-batch step: pins the
        pmean gradient scaling (a psum-vs-pmean factor-D error would move
        every parameter by 8x the right amount)."""
        from gnnkeras_tpu.training.losses import get_loss

        merged = molecule_batch(40, seed=1)
        gnn = build_gnn()
        gnn.compile(optimizer="sgd:0.1", loss="categorical_crossentropy")
        loss_fn = gnn.loss
        batch1 = from_graph_object(merged, slot_pack=128, strip_dtype="float32")
        params0 = jax.tree_util.tree_map(lambda x: x, gnn.variables["params"])
        mstate0 = gnn.variables["state"]
        rng = jax.random.PRNGKey(5)

        def single_loss(p):
            k, s, out, om, ms = gnn.forward(
                {"params": p, "state": mstate0}, batch1, training=True, rng=rng
            )
            per = loss_fn(batch1.targets, out)
            m = batch1.target_mask.astype(per.dtype)
            return (
                jnp.sum(per * batch1.sample_weight * m) / jnp.maximum(jnp.sum(m), 1.0)
                + gnn.regularization_loss(p)
            )

        grads1 = jax.grad(single_loss)(params0)
        expected = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, params0, grads1)

        stacked, _ = partition_packed(merged, 8, strip_dtype="float32")
        pgnn = PackedPartitionedGNN(gnn, mesh8)
        gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])
        pgnn.fit(stacked, epochs=1)

        for a, b in zip(jax.tree_util.tree_leaves(gnn.variables["params"]),
                        jax.tree_util.tree_leaves(expected)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)

    def test_training_reduces_loss(self, mesh8):
        merged = molecule_batch(32, seed=2)
        gnn = build_gnn()
        gnn.compile(optimizer="adam:0.02", loss="categorical_crossentropy", metrics=["accuracy"])
        stacked, _ = partition_packed(merged, 8)
        pgnn = PackedPartitionedGNN(gnn, mesh8)
        h = pgnn.fit(stacked, epochs=8, steps_per_launch=4)
        # training loss must fall; EVAL loss may not (the known shared-BN
        # train/eval moments mismatch, BASELINE.md — per_iteration_bn fixes it
        # and composes with this engine, see test_forward_parity)
        assert h["loss"][-1] < h["loss"][0]
        assert np.isfinite(pgnn.evaluate(stacked)["loss"])

    def test_rejects_lgnn(self, mesh8):
        from gnnkeras_tpu.models.lgnn import LGNN

        g0, g1 = build_gnn(), build_gnn()
        with pytest.raises(ValueError, match="single GNN"):
            PackedPartitionedGNN(LGNN([g0, g1], True, True), mesh8)


def build_lgnn(layers=2, get_state=True, get_output=True, seed=4):
    from gnnkeras_tpu.models.lgnn import LGNN

    gnns = []
    for i in range(layers):
        ins, ls = get_inout_dims("state", DN, DA, T, "g", 0, layer=i,
                                 get_state=get_state, get_output=get_output)
        ino, lo = get_inout_dims("output", DN, DA, T, "g", 0, layer=i,
                                 get_state=get_state, get_output=get_output)
        gnns.append(GNNgraphBased(
            MLP(input_dim=ins[0], layers=ls, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
            MLP(input_dim=ino[0], layers=lo, activations="softmax",
                kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
            0, 3, 0.01,
        ))
    lgnn = LGNN(gnns, get_state, get_output)
    lgnn.build(seed=seed)
    return lgnn


class TestPackedLGNN:
    """PackedPartitionedLGNN == single-chip layered forward/step: the
    update_graph feature propagation is node-local, so whole-molecule shards
    reproduce the merged batch exactly (up to f32 reduction order)."""

    @pytest.mark.parametrize("training", [False, True])
    def test_forward_parity(self, mesh8, training):
        from gnnkeras_tpu.parallel.packed import PackedPartitionedLGNN

        merged = molecule_batch(40, seed=6)
        lgnn = build_lgnn()
        batch1 = from_graph_object(merged, slot_pack=128, strip_dtype="float32")
        rng = jax.random.PRNGKey(2)
        ks1, _, outs1, m1, ms1 = lgnn.forward(lgnn.variables, batch1, training=training, rng=rng)

        stacked, meta = partition_packed(merged, 8, strip_dtype="float32")
        plgnn = PackedPartitionedLGNN(lgnn, mesh8)
        ks, state, out, om, new_mstate = plgnn.forward(stacked, training=training, rng=rng)

        np.testing.assert_array_equal(
            np.asarray(ks), np.asarray([float(k) for k in ks1])
        )
        ref = np.asarray(outs1[-1])[np.asarray(batch1.host_pred_rows)]
        got = np.zeros_like(ref)
        out = np.asarray(out)
        for p in range(8):
            got[meta.groups[p]] = out[p][meta.pred_rows[p]]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)
        if training:
            for a, b in zip(jax.tree_util.tree_leaves(new_mstate),
                            jax.tree_util.tree_leaves(ms1)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize("mode", ["parallel", "residual"])
    def test_one_sgd_step_parity(self, mesh8, mode):
        """One packed LGNN step == one single-chip step under the reference's
        layered objective (parallel: mean of per-layer losses, LGNN.py:262;
        residual: loss of the mean output, LGNN.py:263)."""
        from gnnkeras_tpu.parallel.packed import PackedPartitionedLGNN

        merged = molecule_batch(40, seed=7)
        lgnn = build_lgnn()
        lgnn.compile(optimizer="sgd:0.1", loss="categorical_crossentropy",
                     training_mode=mode)
        loss_fn = lgnn.loss
        batch1 = from_graph_object(merged, slot_pack=128, strip_dtype="float32")
        params0 = jax.tree_util.tree_map(lambda x: x, lgnn.variables["params"])
        mstate0 = lgnn.variables["state"]
        rng = jax.random.PRNGKey(8)

        def single_loss(p):
            ks, _, outs, om, ms = lgnn.forward(
                {"params": p, "state": mstate0}, batch1, training=True, rng=rng
            )
            m = batch1.target_mask.astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)

            def masked(out):
                return jnp.sum(loss_fn(batch1.targets, out) * batch1.sample_weight * m) / cnt

            if mode == "parallel":
                data = sum(masked(o) for o in outs) / len(outs)
            else:
                data = masked(sum(outs) / len(outs))
            return data + lgnn.regularization_loss(p)

        grads1 = jax.grad(single_loss)(params0)
        expected = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, params0, grads1)

        stacked, _ = partition_packed(merged, 8, strip_dtype="float32")
        plgnn = PackedPartitionedLGNN(lgnn, mesh8)
        lgnn._opt_state = lgnn.optimizer.init(lgnn.variables["params"])
        h = plgnn.fit(stacked, epochs=1)
        assert np.isfinite(h["loss"][0])

        for a, b in zip(jax.tree_util.tree_leaves(lgnn.variables["params"]),
                        jax.tree_util.tree_leaves(expected)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)

    def test_serial_rejected_with_direction(self, mesh8):
        from gnnkeras_tpu.parallel.packed import PackedPartitionedLGNN

        merged = molecule_batch(16, seed=9)
        lgnn = build_lgnn()
        lgnn.compile(optimizer="sgd:0.1", loss="categorical_crossentropy",
                     training_mode="serial")
        stacked, _ = partition_packed(merged, 8)
        plgnn = PackedPartitionedLGNN(lgnn, mesh8)
        with pytest.raises(ValueError, match="fit_serial"):
            plgnn.fit(stacked, epochs=1)

    def test_rejects_single_gnn(self, mesh8):
        from gnnkeras_tpu.parallel.packed import PackedPartitionedLGNN

        with pytest.raises(ValueError, match="LGNN"):
            PackedPartitionedLGNN(build_gnn(), mesh8)

    def test_composite_split_keeps_types(self):
        """split_merged_by_graph preserves composite type structure, so the
        packed engine's 'homogeneous or composite' claim holds end-to-end."""
        from gnnkeras_tpu.graph.graph import CompositeGraphObject

        rng = np.random.default_rng(3)
        graphs = []
        for _ in range(10):
            n = int(rng.integers(6, 20))
            a = int(rng.integers(8, 30))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, DA))], axis=1)
            tm = np.zeros((n, 2), dtype=bool)
            tm[np.arange(n), rng.integers(0, 2, n)] = True
            t = np.zeros((1, T)); t[0, rng.integers(T)] = 1
            graphs.append(CompositeGraphObject(
                nodes=rng.normal(size=(n, DN)), arcs=arcs, targets=t, type_mask=tm,
                dim_node_label=(DN, DN), focus="g", aggregation_mode="average"))
        merged = CompositeGraphObject.merge(graphs, focus="g", aggregation_mode="average")
        ids = np.array([0, 3, 7])
        sub = split_merged_by_graph(merged, ids)
        assert getattr(sub, "type_mask", None) is not None
        assert sub.type_mask.shape[1] == 2
        sizes = np.bincount(merged.graph_of_node.astype(np.int64))
        assert sub.type_mask.shape[0] == int(sizes[ids].sum())
        # rows travel with their nodes
        node_sel = np.isin(merged.graph_of_node, ids)
        np.testing.assert_array_equal(sub.type_mask, merged.type_mask[node_sel])


class TestPackedFitSurface:
    """The packed engine's fit carries the full single-device surface:
    validation, callbacks/EarlyStopping, resumable checkpoints, class_weight
    (VERDICT r3 next-step #3)."""

    def _fresh(self):
        gnn = build_gnn()
        gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy",
                    metrics=["accuracy"])
        return gnn

    def test_validation_metrics_and_early_stopping(self, mesh8, tmp_path):
        from gnnkeras_tpu.training.callbacks import EarlyStopping

        stacked, _ = partition_packed(molecule_batch(40, seed=0), 8)
        stacked_va, _ = partition_packed(molecule_batch(16, seed=9), 8)
        gnn = self._fresh()
        p = PackedPartitionedGNN(gnn, mesh8)
        h = p.fit(stacked, epochs=3, verbose=0, validation_data=stacked_va,
                  callbacks=[EarlyStopping(monitor="val_loss", patience=5)])
        for key in ("loss", "accuracy", "val_loss", "val_accuracy", "k"):
            assert key in h.history, key
        assert len(h.history["loss"]) == 3
        assert all(np.isfinite(v) for v in h.history["val_loss"])
        # patience-0 early stopping actually stops (monitor an always-"worse"
        # metric by construction: k is constant, mode max with min_delta)
        gnn2 = self._fresh()
        p2 = PackedPartitionedGNN(gnn2, mesh8)
        h2 = p2.fit(stacked, epochs=6, verbose=0, validation_data=stacked_va,
                    callbacks=[EarlyStopping(monitor="val_loss", patience=0,
                                             min_delta=1e9)])
        assert len(h2.history["loss"]) < 6

    def test_checkpoint_resume_equality(self, mesh8, tmp_path):
        """3 epochs + resumed 1 == straight 4 epochs, exactly (params, BN
        moments, optimizer state and host PRNG all restored)."""
        stacked, _ = partition_packed(molecule_batch(40, seed=0), 8)
        ckpt = str(tmp_path / "packed_ckpt")

        gnn1 = self._fresh()
        p1 = PackedPartitionedGNN(gnn1, mesh8)
        h1 = p1.fit(stacked, epochs=3, verbose=0, checkpoint_dir=ckpt)
        assert len(h1.history["loss"]) == 3

        gnn2 = self._fresh()
        p2 = PackedPartitionedGNN(gnn2, mesh8)
        h2 = p2.fit(stacked, epochs=4, verbose=0, checkpoint_dir=ckpt, resume=True)
        assert len(h2.history["loss"]) == 1  # epochs 0-2 restored, epoch 3 runs

        gnn3 = self._fresh()
        p3 = PackedPartitionedGNN(gnn3, mesh8)
        p3.fit(stacked, epochs=4, verbose=0)
        jax.tree_util.tree_map(
            lambda v2, v3: np.testing.assert_allclose(
                np.asarray(v2), np.asarray(v3), rtol=1e-6, atol=1e-7
            ),
            gnn2.variables["params"], gnn3.variables["params"],
        )

    def test_class_weight_changes_loss(self, mesh8):
        stacked, _ = partition_packed(molecule_batch(24, seed=2), 8)
        gnn = self._fresh()
        h = PackedPartitionedGNN(gnn, mesh8).fit(stacked, epochs=1, verbose=0)
        gnn_w = self._fresh()
        hw = PackedPartitionedGNN(gnn_w, mesh8).fit(
            stacked, epochs=1, verbose=0, class_weight={0: 3.0}
        )
        assert np.isfinite(hw.history["loss"][0])
        assert abs(hw.history["loss"][0] - h.history["loss"][0]) > 1e-6
