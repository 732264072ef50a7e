"""Training runtime: masked Keras-style losses, metrics, callbacks,
checkpoint/resume, and the typed config factory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.config import GNNConfig
from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNgraphBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.training import losses
from gnnkeras_tpu.training.callbacks import EarlyStopping
from gnnkeras_tpu.training.checkpoint import CheckpointCallback, CheckpointManager


def toy_graphs(n_graphs=12, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_graphs):
        n, a = int(rng.integers(5, 10)), int(rng.integers(8, 16))
        nodes = rng.normal(size=(n, 3))
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
        t = np.zeros((1, 2))
        t[0, rng.integers(2)] = 1
        out.append(GraphObject(nodes=nodes, arcs=arcs, targets=t, focus="g", aggregation_mode="average"))
    return out


def toy_model(max_iter=3):
    inp_s, layers_s = get_inout_dims("state", 3, 2, 2, "g", 0)
    inp_o, layers_o = get_inout_dims("output", 3, 2, 2, "g", 0)
    gnn = GNNgraphBased(
        MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
            kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        0, max_iter, 0.01,
    )
    gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])
    return gnn


class TestLosses:
    def test_categorical_crossentropy_matches_keras_formula(self):
        y = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        p = jnp.asarray([[0.7, 0.3], [0.2, 0.8]])
        got = losses.categorical_crossentropy(y, p)
        np.testing.assert_allclose(np.asarray(got), [-np.log(0.7), -np.log(0.8)], rtol=1e-6)

    def test_masked_mean_ignores_padding(self):
        per_row = jnp.asarray([1.0, 2.0, 99.0])
        mask = jnp.asarray([True, True, False])
        sw = jnp.ones(3)
        got = losses.masked_mean(per_row, mask, sw)
        assert float(got) == pytest.approx(1.5)

    def test_sample_weight_scales(self):
        per_row = jnp.asarray([1.0, 2.0])
        mask = jnp.asarray([True, True])
        sw = jnp.asarray([2.0, 0.0])
        got = losses.masked_mean(per_row, mask, sw)
        assert float(got) == pytest.approx(1.0)  # (1*2 + 2*0) / 2 rows


class TestCallbacks:
    def test_early_stopping_stops(self):
        gnn = toy_model()
        seq = MultiGraphSequencer(toy_graphs(), "g", "average", batch_size=6, shuffle=False, pad_multiple=16)
        es = EarlyStopping(monitor="loss", patience=0, min_delta=10.0)  # impossible improvement
        h = gnn.fit(seq, epochs=10, callbacks=[es], verbose=0)
        assert len(h.history["loss"]) < 10

    def test_restore_best_weights(self):
        gnn = toy_model()
        seq = MultiGraphSequencer(toy_graphs(), "g", "average", batch_size=6, shuffle=False, pad_multiple=16)
        es = EarlyStopping(monitor="loss", patience=1, min_delta=10.0, restore_best_weights=True)
        gnn.fit(seq, epochs=5, callbacks=[es], verbose=0)
        assert es._best_vars is not None


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        gnn = toy_model()
        seq = MultiGraphSequencer(toy_graphs(), "g", "average", batch_size=6, shuffle=False, pad_multiple=16)
        gnn.fit(seq, epochs=2, verbose=0)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(1, gnn, extra={"epoch": 1})

        gnn2 = toy_model()
        gnn2.build()
        extra = mgr.restore(gnn2)
        assert extra["epoch"] == 1
        for a, b in zip(
            jax.tree_util.tree_leaves(gnn.variables), jax.tree_util.tree_leaves(gnn2.variables)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # optimizer state restored too → next steps identical
        e1 = gnn.evaluate(seq)
        e2 = gnn2.evaluate(seq)
        assert e1["loss"] == pytest.approx(e2["loss"], rel=1e-6)
        mgr.close()

    def test_checkpoint_callback(self, tmp_path):
        gnn = toy_model()
        seq = MultiGraphSequencer(toy_graphs(), "g", "average", batch_size=6, shuffle=False, pad_multiple=16)
        cb = CheckpointCallback(str(tmp_path / "ckpt"), every_epochs=1)
        gnn.fit(seq, epochs=2, callbacks=[cb], verbose=0)
        assert cb.manager.latest_step() == 1
        cb.manager.close()


class TestConfig:
    def test_json_roundtrip(self):
        cfg = GNNConfig(layers=3, training_mode="serial", dim_state=4)
        cfg2 = GNNConfig.from_json(cfg.to_json())
        assert cfg2 == cfg

    def test_validation_raises_valueerror(self):
        # ValueError (not assert) so validation survives ``python -O``
        with pytest.raises(ValueError, match="focus"):
            GNNConfig(focus="x")
        with pytest.raises(ValueError, match="training_mode"):
            GNNConfig(training_mode="typo")
        with pytest.raises(ValueError, match="layers"):
            GNNConfig(layers=0)

    def test_transductive_rejects_composite_graphs(self):
        from gnnkeras_tpu.graph.graph import CompositeGraphObject

        g = toy_graphs(1)[0]
        cg = CompositeGraphObject(
            nodes=g.nodes, arcs=g.arcs, targets=g.targets,
            type_mask=np.ones((g.nodes.shape[0], 1), dtype=bool),
            dim_node_label=(g.nodes.shape[1],), focus="g",
            aggregation_mode="average",
        )
        cfg = GNNConfig(focus="g")
        with pytest.raises(ValueError, match="homogeneous"):
            cfg.build_sequencer([cg], transductive_rate=0.5)

    def test_builds_single_gnn(self):
        cfg = GNNConfig(layers=1, focus="g", epochs=1, batch_size=6)
        model = cfg.build_model(3, 2, 2)
        assert isinstance(model, GNNgraphBased)
        seq = cfg.build_sequencer(toy_graphs())
        h = model.fit(seq, epochs=1, verbose=0)
        assert "loss" in h.history

    def test_builds_lgnn(self):
        from gnnkeras_tpu.models.lgnn import LGNN

        cfg = GNNConfig(layers=2, focus="g", training_mode="residual")
        model = cfg.build_model(3, 2, 2)
        assert isinstance(model, LGNN)
        assert model.LAYERS == 2

    def test_builds_composite(self):
        from gnnkeras_tpu.models.composite import CompositeGNNgraphBased

        cfg = GNNConfig(layers=1, focus="g", dim_state=5)
        model = cfg.build_model((3, 4), 2, 2)
        assert isinstance(model, CompositeGNNgraphBased)
        assert len(model.net_state) == 2

    def test_rejects_bad_focus(self):
        # ValueError (not assert) so validation survives ``python -O``
        with pytest.raises(ValueError):
            GNNConfig(focus="x")


class TestFitResume:
    def test_fit_checkpoints_and_resumes(self, tmp_path):
        d = str(tmp_path / "ck")
        gnn = toy_model()
        seq = MultiGraphSequencer(toy_graphs(), "g", "average", batch_size=6, shuffle=False, pad_multiple=16)
        gnn.fit(seq, epochs=3, checkpoint_dir=d, verbose=0)

        # interrupted run: fresh model resumes from epoch 3 and only runs 2 more
        gnn2 = toy_model()
        h = gnn2.fit(seq, epochs=5, checkpoint_dir=d, resume=True, verbose=0)
        assert len(h.history["loss"]) == 2

        # already-finished run resumes into a no-op
        gnn3 = toy_model()
        h3 = gnn3.fit(seq, epochs=5, checkpoint_dir=d, resume=True, verbose=0)
        assert len(h3.history.get("loss", [])) == 0


class TestArcFocusTraining:
    def test_arc_focused_end_to_end(self):
        rng = np.random.default_rng(31)
        graphs = []
        for _ in range(8):
            n, a = int(rng.integers(6, 12)), int(rng.integers(10, 20))
            nodes = rng.normal(size=(n, 3))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
            g_tmp = GraphObject(nodes=nodes, arcs=arcs, targets=np.ones((1, 1)), focus="g")
            targets = rng.normal(size=(g_tmp.arcs.shape[0], 2))
            graphs.append(GraphObject(nodes=nodes, arcs=g_tmp.arcs, targets=targets, focus="a",
                                      aggregation_mode="average"))
        from gnnkeras_tpu.models.gnn import GNNarcBased

        inp_s, layers_s = get_inout_dims("state", 3, 2, 2, "a", 0)
        inp_o, layers_o = get_inout_dims("output", 3, 2, 2, "a", 0)
        gnn = GNNarcBased(
            MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
            MLP(input_dim=inp_o[0], layers=layers_o, activations="linear",
                kernel_initializer="glorot_normal", bias_initializer="zeros"),
            0, 3, 0.01,
        )
        gnn.compile(optimizer="adam:0.01", loss="mse")
        seq = MultiGraphSequencer(graphs, "a", "average", batch_size=4, shuffle=False, pad_multiple=16)
        h = gnn.fit(seq, epochs=4, verbose=0)
        assert h.history["loss"][-1] < h.history["loss"][0]
        preds = gnn.predict(seq)
        assert preds.shape == (sum(g.arcs.shape[0] for g in graphs), 2)


class TestRegularization:
    def test_l2_regularizer_contributes_to_loss(self):
        inp_s, layers_s = get_inout_dims("state", 3, 2, 2, "g", 0)
        inp_o, layers_o = get_inout_dims("output", 3, 2, 2, "g", 0)
        def build(reg):
            gnn = GNNgraphBased(
                MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                    kernel_initializer="lecun_normal", bias_initializer="lecun_normal",
                    kernel_regularizer=reg),
                MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                    kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
                0, 2, 0.01,
            )
            gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy")
            gnn.build(seed=4)
            return gnn

        seq = MultiGraphSequencer(toy_graphs(), "g", "average", batch_size=6, shuffle=False, pad_multiple=16)
        plain, reg = build(None), build("l2")
        # identical seeds → same params; the regularized loss must be larger
        e_plain = plain.evaluate(seq)
        e_reg = reg.evaluate(seq)
        assert e_reg["loss"] > e_plain["loss"]


class TestPredictRowOrder:
    def test_predict_caller_order_under_tile_packing(self):
        """trainer.predict must return rows in the caller's graph order even
        when the sequencer routes the batch through the tile-packed compact
        readout (which permutes graph rows to packing slots) — regression for
        the host_pred_rows mechanism in graph/batch.py."""
        from gnnkeras_tpu.training.trainer import predict

        rng = np.random.default_rng(17)
        graphs = []
        for _ in range(30):
            n = int(rng.integers(5, 40))
            nodes = np.eye(6, dtype=np.float32)[rng.integers(0, 6, n)]
            a = max(int(rng.integers(n, 2 * n)), 1)
            src, dst = rng.integers(0, n, a), rng.integers(0, n, a)
            keep = src != dst
            src, dst = src[keep], dst[keep]
            if len(src) == 0:
                src, dst = np.array([0]), np.array([min(1, n - 1)])
            arcs = np.concatenate(
                [np.stack([src, dst], 1),
                 np.eye(2, dtype=np.float32)[rng.integers(0, 2, len(src))]], 1)
            targets = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 1)]
            graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=targets,
                                      focus="g", aggregation_mode="average"))

        inp_s, layers_s = get_inout_dims("state", 6, 2, 2, "g", 0)
        inp_o, layers_o = get_inout_dims("output", 6, 2, 2, "g", 0)
        gnn = GNNgraphBased(
            MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
            MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
            0, 3, 0.0,
        )
        gnn.build(seed=11)

        seq = MultiGraphSequencer([g.copy() for g in graphs], "g", "average",
                                  batch_size=len(graphs), shuffle=False)
        batch = seq[0]
        assert batch.compact_readout is not None  # packing actually engaged
        got = predict(gnn, seq)

        # oracle: each graph forwarded alone (no packing, no permutation)
        for i in (0, 7, 19, 29):
            seq1 = MultiGraphSequencer([graphs[i].copy()], "g", "average",
                                       batch_size=1, shuffle=False)
            want = predict(gnn, seq1)
            np.testing.assert_allclose(got[i], want[0], rtol=1e-5, atol=1e-6)


class TestNewCallbacks:
    def test_inject_hyperparams_update_matches_plain(self):
        """The hyperparams-carrying named optimizers must apply the exact
        same updates as the plain optax transformations."""
        import optax
        from gnnkeras_tpu.training.optimizers import get_optimizer

        params = {"w": jnp.asarray([1.0, -2.0, 3.0])}
        grads = {"w": jnp.asarray([0.5, 0.1, -0.3])}
        for spec, plain in [("sgd:0.1", optax.sgd(0.1)),
                            ("adam:0.01", optax.adam(0.01, b1=0.9, b2=0.999, eps=1e-7))]:
            opt = get_optimizer(spec)
            s1, s2 = opt.init(params), plain.init(params)
            u1, _ = opt.update(grads, s1, params)
            u2, _ = plain.update(grads, s2, params)
            np.testing.assert_allclose(np.asarray(u1["w"]), np.asarray(u2["w"]), rtol=1e-7)

    def test_reduce_lr_on_plateau(self):
        from gnnkeras_tpu.training.callbacks import ReduceLROnPlateau
        from gnnkeras_tpu.training.optimizers import current_learning_rate

        gnn = toy_model()
        seq = MultiGraphSequencer(toy_graphs(), "g", "average", batch_size=6, shuffle=False, pad_multiple=16)
        rl = ReduceLROnPlateau(monitor="loss", factor=0.5, patience=0, min_delta=10.0)
        gnn.fit(seq, epochs=4, callbacks=[rl], verbose=0)
        # impossible improvement -> halved every epoch after the first
        lr = current_learning_rate(gnn._opt_state)
        assert lr == pytest.approx(0.01 * 0.5 ** 3, rel=1e-6)

    def test_terminate_on_nan(self):
        from gnnkeras_tpu.training.callbacks import TerminateOnNaN

        cb = TerminateOnNaN()
        cb.on_epoch_end(0, {"loss": 1.0})
        assert not cb.stop_training
        cb.on_epoch_end(1, {"loss": float("nan")})
        assert cb.stop_training

    def test_csv_logger(self, tmp_path):
        from gnnkeras_tpu.training.callbacks import CSVLogger

        gnn = toy_model()
        seq = MultiGraphSequencer(toy_graphs(), "g", "average", batch_size=6, shuffle=False, pad_multiple=16)
        path = tmp_path / "log.csv"
        gnn.fit(seq, epochs=3, callbacks=[CSVLogger(str(path))], verbose=0)
        lines = path.read_text().strip().splitlines()
        assert lines[0].startswith("epoch,")
        assert len(lines) == 4  # header + 3 epochs


class TestPrefetch:
    def test_prefetched_training_is_identical(self):
        from gnnkeras_tpu.data.prefetch import PrefetchSequencer

        def run(wrap):
            gnn = toy_model()
            seq = MultiGraphSequencer(toy_graphs(), "g", "average",
                                      batch_size=6, shuffle=False, pad_multiple=16)
            if wrap:
                seq = PrefetchSequencer(seq, lookahead=2)
            h = gnn.fit(seq, epochs=3, verbose=0, seed=5)
            return h.history["loss"]

        np.testing.assert_allclose(run(False), run(True), rtol=0, atol=0)

    def test_cache_cleared_on_epoch_end(self):
        from gnnkeras_tpu.data.prefetch import PrefetchSequencer

        seq = MultiGraphSequencer(toy_graphs(), "g", "average",
                                  batch_size=3, shuffle=True, pad_multiple=16)
        p = PrefetchSequencer(seq, lookahead=4)
        _ = p[0]
        assert len(p._cache) > 0
        p.on_epoch_end()
        assert len(p._cache) == 0

    def test_cache_cleared_on_inner_mutation(self):
        """Regression: set_batch_size passes through to the inner sequencer
        and rebuilds its batches — prefetched device batches from the OLD
        batching must not be served afterwards."""
        from gnnkeras_tpu.data.prefetch import PrefetchSequencer

        seq = MultiGraphSequencer(toy_graphs(), "g", "average",
                                  batch_size=3, shuffle=False, pad_multiple=16)
        p = PrefetchSequencer(seq, lookahead=4)
        _ = p[0]
        assert len(p._cache) > 0
        p.set_batch_size(6)
        assert len(p._cache) == 0
        assert len(p) == len(seq) == 2
        np.testing.assert_allclose(np.asarray(p[0].nodes), np.asarray(seq[0].nodes))

    def test_with_graphs_keeps_wrapper(self):
        from gnnkeras_tpu.data.prefetch import PrefetchSequencer

        p = PrefetchSequencer(MultiGraphSequencer(
            toy_graphs(), "g", "average", batch_size=3, shuffle=False, pad_multiple=16))
        q = p.with_graphs(toy_graphs(6, seed=1))
        assert isinstance(q, PrefetchSequencer)
        assert len(q.inner.data) == 6


class TestSequencerBcsrLatch:
    def test_bcsr_degrade_latches_across_rebuilds(self):
        """Once any epoch's batches degrade the BCSR operator to None (mixed
        present/absent → consistent scatter path), later rebuilds whose
        merges would all pass build_bcsr must NOT flip the batch pytree back
        (bcsr None → present would retrace the compiled step mid-training)."""
        seq = MultiGraphSequencer(toy_graphs(), "g", "average",
                                  batch_size=6, shuffle=False, pad_multiple=128,
                                  tile_pack=False)
        assert all(b.bcsr is not None for b in seq.batches)
        seq.batches[0] = seq.batches[0].replace(bcsr=None)  # simulate a band-factor fallback
        seq._uniform_block_counts()
        assert all(b.bcsr is None for b in seq.batches)
        seq.build_batches()  # a fresh rebuild would naturally restore the operator...
        assert all(b.bcsr is None for b in seq.batches)  # ...but the degrade is latched


class TestScanBatches:
    """Epoch-in-one-launch path: lax.scan over the stacked sequencer batches
    must reproduce the per-step dispatch loop exactly (same rng sequence,
    same optimizer trajectory)."""

    def _run(self, scan):
        from gnnkeras_tpu.training import trainer

        np.random.seed(3)
        model = toy_model()
        model.compile(optimizer="sgd:0.05", loss="categorical_crossentropy", metrics=["accuracy"])
        seq = MultiGraphSequencer(toy_graphs(12), "g", "average", batch_size=4, shuffle=False)
        hist = trainer.fit(model, seq, epochs=2, verbose=0, seed=11, scan_batches=scan)
        ev = trainer.evaluate(model, seq, scan_batches=scan)
        return hist.history, ev, model.variables

    def test_scan_equals_per_step(self):
        h_ref, ev_ref, v_ref = self._run(False)
        h_scan, ev_scan, v_scan = self._run(True)
        for key in h_ref:
            np.testing.assert_allclose(h_scan[key], h_ref[key], rtol=0, atol=0)
        for key in ev_ref:
            assert ev_scan[key] == ev_ref[key]
        for a, b in zip(jax.tree_util.tree_leaves(v_ref), jax.tree_util.tree_leaves(v_scan)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_single_batch_falls_back(self):
        from gnnkeras_tpu.training import trainer

        np.random.seed(3)
        model = toy_model()
        seq = MultiGraphSequencer(toy_graphs(6), "g", "average", batch_size=6, shuffle=False)
        hist = trainer.fit(model, seq, epochs=1, verbose=0, scan_batches=True)
        assert len(hist.history["loss"]) == 1


class TestRecalibrateBatchnorm:
    """Stats-only finalization pass: weights untouched, moving statistics
    converge, eval loss drops toward the train-mode loss."""

    def test_weights_untouched_and_loss_improves(self):
        from gnnkeras_tpu.training import trainer
        from gnnkeras_tpu.training.calibrate import recalibrate_batchnorm

        np.random.seed(5)
        model = toy_model()
        seq = MultiGraphSequencer(toy_graphs(16), "g", "average", batch_size=8, shuffle=False)
        trainer.fit(model, seq, epochs=5, verbose=0, seed=3)
        before_eval = trainer.evaluate(model, seq)
        params_before = jax.tree_util.tree_map(np.asarray, model.variables["params"])
        state_before = jax.tree_util.tree_map(np.asarray, model.variables["state"])

        recalibrate_batchnorm(model, seq, passes=80)

        for a, b in zip(jax.tree_util.tree_leaves(params_before),
                        jax.tree_util.tree_leaves(model.variables["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(state_before),
                            jax.tree_util.tree_leaves(model.variables["state"]))
        )
        assert moved, "moving statistics should have been updated"
        after_eval = trainer.evaluate(model, seq)
        assert after_eval["loss"] < before_eval["loss"]


class TestPerIterationBN:
    """Opt-in Recurrent-BatchNorm variant: per-unfolding-iteration moving
    statistics (models/gnn.py per_iteration_bn)."""

    def _model(self, **kw):
        inp_s, layers_s = get_inout_dims("state", 3, 2, 2, "g", 0)
        inp_o, layers_o = get_inout_dims("output", 3, 2, 2, "g", 0)
        gnn = GNNgraphBased(
            MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
            MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
            0, 4, 0.0, **kw,
        )
        gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])
        return gnn

    def test_stats_have_iteration_axis_and_diverge(self):
        from gnnkeras_tpu.training import trainer

        np.random.seed(2)
        model = self._model(per_iteration_bn=True)
        seq = MultiGraphSequencer(toy_graphs(12), "g", "average", batch_size=6, shuffle=False)
        trainer.fit(model, seq, epochs=4, verbose=0, seed=5)
        bn = model.variables["state"]["net_state"]
        means = [np.asarray(s["moving_mean"]) for s in jax.tree_util.tree_leaves(
            bn, is_leaf=lambda x: isinstance(x, dict)) if "moving_mean" in s]
        assert means and all(m.shape[0] == 4 for m in means)  # K leading axis
        # iteration distributions differ, so the per-iteration stats must too
        assert not np.allclose(means[0][0], means[0][-1])
        ev = trainer.evaluate(model, seq)
        assert np.isfinite(ev["loss"])

    def test_eval_uses_per_iteration_stats(self):
        # oracle: manual unrolled eval with the slice-i statistics must match
        # the while_loop forward
        from gnnkeras_tpu.graph.batch import graphs_to_batch
        from gnnkeras_tpu.training import trainer

        np.random.seed(3)
        model = self._model(per_iteration_bn=True)
        graphs = toy_graphs(6)
        seq = MultiGraphSequencer(graphs, "g", "average", batch_size=6, shuffle=False)
        trainer.fit(model, seq, epochs=2, verbose=0, seed=9)
        batch = seq[0]
        k, state, out, mask, _ = model.forward(model.variables, batch, training=False)

        # manual unroll with indexed statistics
        import jax.numpy as jnp

        take = lambda tree, i: jax.tree_util.tree_map(lambda x: x[i], tree)
        params = model.variables["params"]
        bn = model.variables["state"]["net_state"]
        s = batch.nodes
        agg_arcs = batch.agg_arc_labels
        for i in range(int(k)):
            agg_state = batch.agg_node_labels if i == 0 else batch.aggregate(s)
            inp = jnp.concatenate([s, agg_state, jnp.zeros((s.shape[0], 0)), agg_arcs], axis=1)
            s, _ = model.net_state.apply(
                {"params": params["net_state"], "state": take(bn, i)},
                inp, training=False, mask=batch.node_mask)
        np.testing.assert_allclose(np.asarray(state), np.asarray(s), rtol=1e-5, atol=1e-6)

    def test_save_load_roundtrip(self, tmp_path):
        from gnnkeras_tpu.training import trainer

        np.random.seed(4)
        model = self._model(per_iteration_bn=True)
        seq = MultiGraphSequencer(toy_graphs(8), "g", "average", batch_size=4, shuffle=False)
        trainer.fit(model, seq, epochs=1, verbose=0)
        want = trainer.evaluate(model, seq)
        model.save(str(tmp_path / "m"))
        loaded = GNNgraphBased.load(str(tmp_path / "m"))
        assert loaded.per_iteration_bn
        loaded.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])
        got = trainer.evaluate(loaded, seq)
        assert got["loss"] == pytest.approx(want["loss"], rel=1e-6)

    def test_default_off_matches_previous_behavior(self):
        from gnnkeras_tpu.training import trainer

        np.random.seed(5)
        model = self._model()
        assert not model.per_iteration_bn
        seq = MultiGraphSequencer(toy_graphs(8), "g", "average", batch_size=4, shuffle=False)
        trainer.fit(model, seq, epochs=1, verbose=0)
        bn = model.variables["state"]["net_state"]
        means = [np.asarray(s["moving_mean"]) for s in jax.tree_util.tree_leaves(
            bn, is_leaf=lambda x: isinstance(x, dict)) if "moving_mean" in s]
        assert means and all(m.ndim == 1 for m in means)  # no K axis

    def test_composite_per_iteration_bn(self):
        from gnnkeras_tpu.data.sequencers import CompositeMultiGraphSequencer
        from gnnkeras_tpu.graph.graph import CompositeGraphObject
        from gnnkeras_tpu.models.composite import CompositeGNNgraphBased
        from gnnkeras_tpu.training import trainer

        rng = np.random.default_rng(6)
        graphs = []
        for _ in range(8):
            n, a = int(rng.integers(5, 9)), int(rng.integers(8, 14))
            nodes = rng.normal(size=(n, 3))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
            t = np.eye(2)[rng.integers(2)][None]
            tm = np.ones((n, 1), dtype=bool)
            graphs.append(CompositeGraphObject(nodes=nodes, arcs=arcs, targets=t, focus="g",
                                               type_mask=tm, dim_node_label=(3,),
                                               aggregation_mode="average"))
        ds = 4
        from gnnkeras_tpu.models.mlp import MLP as OurMLP, get_inout_dims as dims

        inp_s, ls = dims("state", (3,), 2, 2, "g", ds)
        nets = [OurMLP(input_dim=inp_s[0], layers=ls, activations="selu")]
        out_net = OurMLP(input_dim=(ds,), layers=[2], activations="softmax")
        cgnn = CompositeGNNgraphBased(nets, out_net, ds, 3, 0.0, per_iteration_bn=True)
        cgnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])
        seq = CompositeMultiGraphSequencer(graphs, "g", "average", batch_size=4, shuffle=False)
        h = trainer.fit(cgnn, seq, epochs=2, verbose=0, seed=3)
        assert np.isfinite(h.history["loss"][-1])
        bn = cgnn.variables["state"]["net_state"][0]
        means = [np.asarray(s["moving_mean"]) for s in jax.tree_util.tree_leaves(
            bn, is_leaf=lambda x: isinstance(x, dict)) if "moving_mean" in s]
        assert means and all(m.shape[0] == 3 for m in means)
        ev = trainer.evaluate(cgnn, seq)
        assert np.isfinite(ev["loss"])

    def test_parallel_wrapper_support_matrix_per_iteration_bn(self):
        """TP still rejects per_iteration_bn; PartitionedGNN supports it
        since round 3 (shared run_unfold_loops driver — equality test in
        tests/test_parallel.py::test_per_iteration_bn_parity)."""
        from gnnkeras_tpu.parallel.mesh import make_mesh
        from gnnkeras_tpu.parallel.partition import PartitionedGNN
        from gnnkeras_tpu.parallel.tensor_parallel import TensorParallelGNN

        model = self._model(per_iteration_bn=True)
        mesh = make_mesh(("model",))
        with pytest.raises(ValueError, match="per_iteration_bn"):
            TensorParallelGNN(model, mesh)
        assert PartitionedGNN(model, make_mesh(("graph",))).gnn is model

    def test_copy_preserves_flag(self):
        model = self._model(per_iteration_bn=True)
        model.build(seed=1)
        clone = model.copy()
        assert clone.per_iteration_bn
        ks = [np.asarray(s["moving_mean"]).shape for s in jax.tree_util.tree_leaves(
            clone.variables["state"]["net_state"], is_leaf=lambda x: isinstance(x, dict))
            if "moving_mean" in s]
        assert all(k[0] == 4 for k in ks)

    def test_predictor_serves_per_iteration_bn_model(self):
        from gnnkeras_tpu.serving import Predictor
        from gnnkeras_tpu.training import trainer

        np.random.seed(8)
        model = self._model(per_iteration_bn=True)
        graphs = toy_graphs(6)
        seq = MultiGraphSequencer(graphs, "g", "average", batch_size=6, shuffle=False)
        trainer.fit(model, seq, epochs=1, verbose=0)
        p = Predictor.for_graphs(model, graphs, batch_size=3, fused="auto").warmup()
        out = p(graphs[:2])
        assert out.shape == (2, 2) and np.all(np.isfinite(out))
        assert not p.fused  # fold_transition rejects per-iteration stats


class TestDegenerateGraphs:
    """Arc-less and single-node graphs must flow through fit/eval/predict
    (padding + masked aggregation make them inert, never invalid)."""

    def test_zero_arc_and_single_node_graphs_train(self):
        from gnnkeras_tpu.training import trainer

        rng = np.random.default_rng(0)
        graphs = [
            GraphObject(nodes=rng.normal(size=(1, 3)), arcs=np.zeros((0, 4)),
                        targets=np.eye(1, 2), focus="g", aggregation_mode="average"),
            GraphObject(nodes=rng.normal(size=(4, 3)), arcs=np.zeros((0, 4)),
                        targets=np.eye(1, 2), focus="g", aggregation_mode="average"),
        ]
        for _ in range(4):
            n, a = 6, 12
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
            graphs.append(GraphObject(nodes=rng.normal(size=(n, 3)), arcs=arcs,
                                      targets=np.eye(1, 2), focus="g", aggregation_mode="average"))
        model = toy_model()
        seq = MultiGraphSequencer(graphs, "g", "average", batch_size=3, shuffle=False)
        h = trainer.fit(model, seq, epochs=2, verbose=0)
        assert all(np.isfinite(v) for v in h.history["loss"])
        assert trainer.predict(model, seq).shape == (6, 2)


class TestClassWeight:
    def test_class_weight_equals_explicit_sample_weights(self):
        """fit(class_weight={c: w}) must equal fit() on graphs whose
        sample_weight was set to w for class-c targets — the stock Keras
        semantics the reference inherits (VERDICT r2 missing #2)."""
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
        from gnnkeras_tpu.graph.graph import GraphObject
        from gnnkeras_tpu.models.gnn import GNNgraphBased
        from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

        rng = np.random.default_rng(0)
        dn, da, T = 4, 2, 2
        cw = {0: 2.5, 1: 0.5}

        def graphs(weighted):
            out = []
            for i in range(10):
                n, a = int(rng.integers(6, 12)), int(rng.integers(10, 20))
                arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, da))], axis=1)
                t = np.zeros((1, T)); t[0, i % 2] = 1
                sw = cw[i % 2] if weighted else 1.0
                out.append(GraphObject(nodes=rng.normal(size=(n, dn)), arcs=arcs, targets=t,
                                       focus="g", aggregation_mode="average", sample_weight=sw))
            return out

        rng = np.random.default_rng(0)
        g_plain = graphs(weighted=False)
        rng = np.random.default_rng(0)
        g_weighted = graphs(weighted=True)

        def build():
            ins, ls = get_inout_dims("state", dn, da, T, "g", 0)
            ino, lo = get_inout_dims("output", dn, da, T, "g", 0)
            m = GNNgraphBased(MLP(input_dim=ins[0], layers=ls, activations="selu"),
                              MLP(input_dim=ino[0], layers=lo, activations="softmax"), 0, 3, 0.01)
            m.compile(optimizer="sgd:0.1", loss="categorical_crossentropy")
            m.build(seed=7)
            return m

        m1, m2 = build(), build()
        m1.fit(MultiGraphSequencer(g_plain, "g", "average", batch_size=5, shuffle=False),
               epochs=1, verbose=0, class_weight=cw)
        m2.fit(MultiGraphSequencer(g_weighted, "g", "average", batch_size=5, shuffle=False),
               epochs=1, verbose=0)
        for a, b in zip(jax.tree_util.tree_leaves(m1.variables["params"]),
                        jax.tree_util.tree_leaves(m2.variables["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


class TestValidationFreq:
    def test_validation_every_n_epochs(self):
        """fit(validation_freq=N) validates on epochs N, 2N, ... (1-based,
        Keras semantics); other epochs carry no val_* logs."""
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
        from gnnkeras_tpu.graph.graph import GraphObject
        from gnnkeras_tpu.models.gnn import GNNgraphBased
        from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
        from gnnkeras_tpu.training.callbacks import Callback

        rng = np.random.default_rng(1)
        dn, da, T = 4, 2, 2
        graphs = []
        for i in range(8):
            n, a = int(rng.integers(6, 12)), int(rng.integers(10, 20))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, da))], axis=1)
            t = np.zeros((1, T)); t[0, i % 2] = 1
            graphs.append(GraphObject(nodes=rng.normal(size=(n, dn)), arcs=arcs, targets=t,
                                      focus="g", aggregation_mode="average"))
        ins, ls = get_inout_dims("state", dn, da, T, "g", 0)
        ino, lo = get_inout_dims("output", dn, da, T, "g", 0)
        m = GNNgraphBased(MLP(input_dim=ins[0], layers=ls, activations="selu"),
                          MLP(input_dim=ino[0], layers=lo, activations="softmax"), 0, 3, 0.01)
        m.compile(optimizer="sgd:0.1", loss="categorical_crossentropy")

        seen = []

        class Spy(Callback):
            def on_epoch_end(self, epoch, logs=None):
                seen.append("val_loss" in (logs or {}))

        seq = MultiGraphSequencer(graphs, "g", "average", batch_size=4, shuffle=False)
        val = MultiGraphSequencer(graphs, "g", "average", batch_size=4, shuffle=False)
        m.fit(seq, epochs=6, validation_data=val, validation_freq=3, verbose=0,
              callbacks=[Spy()])
        assert seen == [False, False, True, False, False, True]
