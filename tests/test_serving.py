"""Serving endpoints (gnnkeras_tpu/serving.py): fixed-shape Predictor
(XLA and fused paths, order restoration under tile packing) and the
jax.export StableHLO artifact roundtrip."""

import numpy as np
import pytest

import jax.numpy as jnp

from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNgraphBased, GNNnodeBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.serving import Predictor, export_forward, load_exported
from gnnkeras_tpu.training.trainer import predict


def _random_graphs(n_graphs=25, seed=0, dn=14, da=3, t_dim=2, focus="g"):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(5, 40))
        nodes = np.eye(dn, dtype=np.float32)[rng.integers(0, dn, n)]
        a = int(rng.integers(n, 3 * n))
        src, dst = rng.integers(0, n, a), rng.integers(0, n, a)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        if len(src) == 0:
            src, dst = np.array([0]), np.array([1 % n])
        arcs = np.concatenate(
            [np.stack([src, dst], 1), np.eye(da, dtype=np.float32)[rng.integers(0, da, len(src))]], 1
        )
        targets = (
            np.eye(t_dim, dtype=np.float32)[rng.integers(0, t_dim, 1)]
            if focus == "g"
            else np.eye(t_dim, dtype=np.float32)[rng.integers(0, t_dim, n)]
        )
        graphs.append(
            GraphObject(nodes=nodes, arcs=arcs, targets=targets, focus=focus, aggregation_mode="average")
        )
    return graphs


def _gnn(cls=GNNgraphBased, focus="g", seed=0, threshold=0.0):
    ins, ls = get_inout_dims("state", 14, 3, 2, focus, 0)
    ino, lo = get_inout_dims("output", 14, 3, 2, focus, 0)
    net_st = MLP(input_dim=ins[0], layers=ls, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=ino[0], layers=lo, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = cls(net_st, net_out, 0, 5, threshold)
    gnn.build(seed=seed)
    return gnn


class TestPredictor:
    def test_matches_trainer_predict(self):
        graphs = _random_graphs()
        gnn = _gnn()
        seq = MultiGraphSequencer([g.copy() for g in graphs], "g", "average",
                                  batch_size=len(graphs), shuffle=False)
        want = predict(gnn, seq)
        # fused=False: the XLA path must match trainer.predict tightly
        p = Predictor.for_graphs(gnn, graphs, batch_size=len(graphs), fused=False)
        np.testing.assert_allclose(p(graphs), want, rtol=1e-5, atol=1e-6)
        # default ('auto'): the fusable model serves through the whole-unfold
        # kernel — bf16 compute, so parity is loose but argmax-stable
        p_auto = Predictor.for_graphs(gnn, graphs, batch_size=len(graphs))
        assert p_auto.fused
        got = p_auto(graphs)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)
        np.testing.assert_array_equal(np.argmax(got, 1), np.argmax(want, 1))

    def test_single_graph_request(self):
        graphs = _random_graphs(n_graphs=3, seed=2)
        gnn = _gnn(seed=2)
        p = Predictor.for_graphs(gnn, graphs, batch_size=3)
        one = p(graphs[0])
        all3 = p(graphs)
        np.testing.assert_allclose(one[0], all3[0], rtol=1e-5, atol=1e-6)

    def test_overflow_raises(self):
        graphs = _random_graphs(n_graphs=6, seed=3)
        gnn = _gnn(seed=3)
        p = Predictor.for_graphs(gnn, graphs[:2], batch_size=2)
        with pytest.raises(ValueError):
            p(graphs)

    def test_fused_matches_xla_order(self):
        graphs = _random_graphs(seed=4)
        gnn = _gnn(seed=4)
        p_x = Predictor.for_graphs(gnn, graphs, batch_size=len(graphs))
        p_f = Predictor.for_graphs(gnn, graphs, batch_size=len(graphs), fused=True)
        assert p_f.fused
        got_x, got_f = p_x(graphs), p_f(graphs)
        assert got_x.shape == got_f.shape
        # bf16 kernel: same ranking, close probabilities
        assert (got_x.argmax(1) == got_f.argmax(1)).mean() > 0.95
        assert np.abs(got_x - got_f).max() < 0.05

    def test_fused_node_focus_order(self):
        graphs = _random_graphs(seed=5, focus="n", n_graphs=10)
        gnn = _gnn(cls=GNNnodeBased, focus="n", seed=5)
        p_x = Predictor.for_graphs(gnn, graphs, batch_size=len(graphs))
        p_f = Predictor.for_graphs(gnn, graphs, batch_size=len(graphs), fused=True)
        got_x, got_f = p_x(graphs), p_f(graphs)
        assert got_x.shape == got_f.shape
        assert np.abs(got_x - got_f).max() < 0.05

    def test_fused_true_raises_on_unfusable_model(self):
        gnn = _gnn(threshold=0.01)  # dynamic trip count → not fusable
        with pytest.raises(ValueError):
            Predictor(gnn, 256, 256, 4, fused=True)

    def test_warmup(self):
        graphs = _random_graphs(n_graphs=4, seed=6)
        gnn = _gnn(seed=6)
        p = Predictor.for_graphs(gnn, graphs, batch_size=4).warmup()
        out = p(graphs[:2])
        assert out.shape == (2, 2)


class TestExport:
    def test_stablehlo_roundtrip(self, tmp_path):
        graphs = _random_graphs(n_graphs=8, seed=7)
        gnn = _gnn(seed=7)
        merged = GraphObject.merge([g.copy() for g in graphs], focus="g", aggregation_mode="average")
        batch = from_graph_object(merged)
        _, _, out_ref, out_mask, _ = gnn.forward(gnn.variables, batch, training=False, rng=None)

        path = str(tmp_path / "artifact")
        export_forward(gnn, batch, path)
        loaded = load_exported(path)
        out, mask = loaded.call(batch)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-5, atol=1e-6)
        assert loaded.meta["model_class"] == "GNNgraphBased"

    def test_exported_runs_on_new_batch(self, tmp_path):
        graphs = _random_graphs(n_graphs=8, seed=8)
        gnn = _gnn(seed=8)
        merged = GraphObject.merge([g.copy() for g in graphs], focus="g", aggregation_mode="average")
        batch = from_graph_object(merged, pad_nodes=512, pad_arcs=1024, pad_graphs=8)
        path = str(tmp_path / "artifact")
        export_forward(gnn, batch, path)
        loaded = load_exported(path)

        graphs2 = _random_graphs(n_graphs=8, seed=9)
        merged2 = GraphObject.merge([g.copy() for g in graphs2], focus="g", aggregation_mode="average")
        batch2 = from_graph_object(
            merged2, pad_nodes=batch.num_nodes, pad_arcs=batch.num_arcs, pad_graphs=batch.num_graphs
        )
        _, _, want, _, _ = gnn.forward(gnn.variables, batch2, training=False, rng=None)
        got, _ = loaded.call(batch2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


class TestPredictorLGNN:
    def test_lgnn_matches_trainer_predict(self):
        from gnnkeras_tpu.models.lgnn import LGNN

        graphs = _random_graphs(n_graphs=12, seed=10)
        gnns = []
        for layer in range(2):
            ins, ls = get_inout_dims("state", 14, 3, 2, "g", 0, layer=layer,
                                     get_state=True, get_output=True)
            ino, lo = get_inout_dims("output", 14, 3, 2, "g", 0, layer=layer,
                                     get_state=True, get_output=True)
            st = MLP(input_dim=ins[0], layers=ls, activations="selu",
                     kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
            ot = MLP(input_dim=ino[0], layers=lo, activations="softmax",
                     kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
            gnns.append(GNNgraphBased(st, ot, 0, 3, 0.0))
        lgnn = LGNN(gnns, True, True)
        lgnn.build(seed=10)

        p = Predictor.for_graphs(lgnn, graphs, batch_size=len(graphs))
        assert p.focus == "g"
        got = p(graphs)
        seq = MultiGraphSequencer([g.copy() for g in graphs], "g", "average",
                                  batch_size=len(graphs), shuffle=False)
        want = predict(lgnn, seq)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestPredictorComposite:
    def test_composite_matches_trainer_predict(self):
        from gnnkeras_tpu.data.sequencers import CompositeMultiGraphSequencer
        from gnnkeras_tpu.graph.graph import CompositeGraphObject
        from gnnkeras_tpu.models.composite import CompositeGNNgraphBased

        rng = np.random.default_rng(4)
        DS = 5
        graphs = []
        for _ in range(10):
            n = int(rng.integers(5, 20))
            nodes = np.eye(6, dtype=np.float32)[rng.integers(0, 6, n)]
            a = max(int(rng.integers(n, 2 * n)), 1)
            src, dst = rng.integers(0, n, a), rng.integers(0, n, a)
            keep = src != dst
            if not np.any(keep):
                src, dst, keep = np.array([0]), np.array([1 % n]), np.array([True])
            arcs = np.concatenate(
                [np.stack([src[keep], dst[keep]], 1),
                 np.eye(2, dtype=np.float32)[rng.integers(0, 2, int(keep.sum()))]], 1)
            tm = np.zeros((n, 2), dtype=bool)
            tm[np.arange(n), rng.integers(0, 2, n)] = True
            graphs.append(CompositeGraphObject(
                nodes=nodes, arcs=arcs, targets=np.eye(2, dtype=np.float32)[rng.integers(0, 2, 1)],
                type_mask=tm, dim_node_label=(6, 6), focus="g", aggregation_mode="average"))

        state_mlps = []
        for _ in range(2):
            inp = 6 + DS + DS + (6 + 6 + 2)  # labels_t | state | agg_state | agg_component
            state_mlps.append(MLP(input_dim=(inp,), layers=[DS], activations="tanh",
                                  kernel_initializer="lecun_normal", bias_initializer="lecun_normal"))
        out_mlp = MLP(input_dim=(DS,), layers=[2], activations="softmax",
                      kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        cgnn = CompositeGNNgraphBased(state_mlps, out_mlp, DS, 3, 0.0)
        cgnn.build(seed=3)

        import jax as _jax

        p = Predictor.for_graphs(cgnn, graphs, batch_size=len(graphs)).warmup()
        # dim_state>0 draws the random state init from the model's rng chain;
        # pin it and reproduce the endpoint's exact batch + key to verify the
        # contract (padding changes the draw, so a sequencer path would see
        # different random init values)
        key = _jax.random.PRNGKey(77)
        cgnn._rng = key
        expected_key = _jax.random.split(key)[1]  # next_rng's sub-key
        got = p(graphs)

        merged = CompositeGraphObject.merge(
            [g.copy() for g in graphs], focus="g", aggregation_mode="average")
        batch = from_graph_object(
            merged, pad_nodes=p.max_nodes, pad_arcs=p.max_arcs, pad_graphs=p.max_graphs)
        _, _, out, _, _ = cgnn.forward(cgnn.variables, batch, training=False, rng=expected_key)
        want = np.asarray(out)[batch.host_pred_rows]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_composite_fused_auto_falls_back(self):
        """fused='auto' on a composite model must silently use the XLA path
        (fold_transition returns None), not crash."""
        from gnnkeras_tpu.graph.graph import CompositeGraphObject
        from gnnkeras_tpu.models.composite import CompositeGNNgraphBased

        DS = 4
        st = [MLP(input_dim=(3 + DS + DS + (3 + 1),), layers=[DS], activations="tanh",
                  kernel_initializer="lecun_normal", bias_initializer="lecun_normal")]
        ot = MLP(input_dim=(DS,), layers=[2], activations="softmax",
                 kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        cgnn = CompositeGNNgraphBased(st, ot, DS, 2, 0.0)
        cgnn.build(seed=1)
        nodes = np.eye(3, dtype=np.float32)[[0, 1, 2, 0]]
        arcs = np.array([[0, 1, 1.0], [1, 2, 1.0], [2, 3, 1.0]], dtype=np.float32)
        g = CompositeGraphObject(nodes=nodes, arcs=arcs, targets=np.array([[1.0, 0.0]]),
                                 type_mask=np.ones((4, 1), dtype=bool), dim_node_label=(3,),
                                 focus="g", aggregation_mode="average")
        p = Predictor.for_graphs(cgnn, [g], batch_size=1, fused="auto")
        assert not p.fused
        out = p([g])
        assert out.shape == (1, 2)


class TestMicroBatcher:
    def _predictor(self, graphs):
        gnn = _gnn()
        gnn.build(seed=3)
        return Predictor.for_graphs(gnn, graphs, batch_size=len(graphs)), gnn

    def test_coalesced_results_match_individual(self):
        from gnnkeras_tpu.serving import MicroBatcher

        graphs = _random_graphs(n_graphs=12, seed=21)
        p, _ = self._predictor(graphs)
        want = [p([g]) for g in graphs]

        mb = MicroBatcher(p, max_delay_ms=100.0)
        futs = [mb.submit(g) for g in graphs]
        got = [f.result(timeout=60) for f in futs]
        mb.close()
        for w, g in zip(want, got):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
        # requests were coalesced into far fewer launches than requests
        assert mb.launches < len(graphs)

    def test_oversized_request_fails_alone(self):
        from gnnkeras_tpu.serving import MicroBatcher

        graphs = _random_graphs(n_graphs=6, seed=22)
        p, _ = self._predictor(graphs[:3])  # small template
        mb = MicroBatcher(p, max_delay_ms=50.0)
        ok = mb.submit(graphs[0])
        too_big = mb.submit(graphs)  # 6 graphs > template 3
        ok2 = mb.submit(graphs[1])
        r1 = ok.result(timeout=60)
        r2 = ok2.result(timeout=60)
        with pytest.raises(Exception):
            too_big.result(timeout=60)
        mb.close()
        np.testing.assert_allclose(r1, p([graphs[0]]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(r2, p([graphs[1]]), rtol=1e-5, atol=1e-6)


class TestHttpServer:
    """HTTP endpoint (serving_http.GraphServer): JSON protocol, concurrent
    clients through the MicroBatcher, outputs equal the in-process Predictor."""

    def _server(self, focus="g"):
        from gnnkeras_tpu.serving_http import GraphServer

        cls = GNNgraphBased if focus == "g" else GNNnodeBased
        graphs = _random_graphs(8, seed=3, focus=focus)
        gnn = _gnn(cls, focus)
        p = Predictor.for_graphs(gnn, graphs, batch_size=len(graphs)).warmup()
        server = GraphServer(p, port=0).start()  # ephemeral port
        return server, p, graphs

    @staticmethod
    def _post(addr, payload):
        import json as _json
        import urllib.request

        req = urllib.request.Request(
            f"http://{addr[0]}:{addr[1]}/predict",
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return _json.loads(resp.read())

    def test_predict_matches_inprocess(self):
        server, p, graphs = self._server()
        try:
            payload = {"graphs": [
                {"nodes": g.nodes.tolist(), "arcs": g.arcs.tolist()} for g in graphs[:3]
            ]}
            got = self._post(server.address, payload)["outputs"]
            want = p(graphs[:3])
            flat = np.concatenate([np.asarray(o) for o in got], axis=0)
            np.testing.assert_allclose(flat, want, rtol=1e-5, atol=1e-6)
            assert len(got) == 3 and all(len(o) == 1 for o in got)  # one row per graph
        finally:
            server.close()

    def test_health_metadata_and_errors(self):
        import json as _json
        import urllib.error
        import urllib.request

        server, p, graphs = self._server()
        try:
            addr = server.address
            with urllib.request.urlopen(f"http://{addr[0]}:{addr[1]}/healthz", timeout=10) as r:
                assert _json.loads(r.read())["status"] == "ok"
            with urllib.request.urlopen(f"http://{addr[0]}:{addr[1]}/metadata", timeout=10) as r:
                meta = _json.loads(r.read())
            assert meta["focus"] == "g" and meta["max_graphs"] == 8
            with pytest.raises(urllib.error.HTTPError) as e:
                self._post(addr, {"grphs": []})
            assert e.value.code == 400
        finally:
            server.close()

    def test_concurrent_clients_coalesce(self):
        from concurrent.futures import ThreadPoolExecutor

        server, p, graphs = self._server()
        try:
            payloads = [
                {"graphs": [{"nodes": g.nodes.tolist(), "arcs": g.arcs.tolist()}]}
                for g in graphs
            ]
            with ThreadPoolExecutor(8) as pool:
                results = list(pool.map(lambda pl: self._post(server.address, pl), payloads))
            for g, res in zip(graphs, results):
                want = p([g])
                np.testing.assert_allclose(np.asarray(res["outputs"][0]), want, rtol=1e-5, atol=1e-6)
        finally:
            server.close()

    def test_overflow_request_returns_413(self):
        import json as _json
        import urllib.error

        server, p, graphs = self._server()
        try:
            # more graphs than the template allows
            payload = {"graphs": [
                {"nodes": g.nodes.tolist(), "arcs": g.arcs.tolist()} for g in graphs * 2
            ]}
            with pytest.raises(urllib.error.HTTPError) as e:
                self._post(server.address, payload)
            assert e.value.code == 413
        finally:
            server.close()


class TestServingCompileOnce:
    """Requests with different topologies/graph counts must replay ONE
    compiled program (template-uniform pads + BCSR block caps)."""

    def test_xla_step_compiles_once(self):
        rng = np.random.default_rng(4)
        graphs = _random_graphs(10, seed=9)
        gnn = _gnn()
        p = Predictor.for_graphs(gnn, graphs, batch_size=6, fused=False).warmup()
        for req in ([graphs[0]], graphs[1:4], graphs[4:10:2], [graphs[7], graphs[2]]):
            p(req)
        assert p._xla_step._cache_size() == 1, p._xla_step._cache_size()

    def test_fused_paths_compile_once(self):
        graphs = _random_graphs(10, seed=10)
        gnn = _gnn(threshold=0.0)
        p = Predictor.for_graphs(gnn, graphs, batch_size=6, fused=True).warmup()
        for req in ([graphs[0]], graphs[1:4], graphs[4:7]):
            p(req)
        if p._fused_step is not None:
            assert p._fused_step._cache_size() <= 1
        assert p._xla_step is not None  # warmup compiled the fallback too
        assert p._xla_step._cache_size() == 1

    def test_warmup_compiles_fused_despite_ineligible_warmup_graph(self):
        """Regression: when the warmup graph itself is fused-INELIGIBLE (a
        tile-crossing arc), warmup must still compile the fused kernel (with
        a synthetic tile-local graph) so no production request pays it."""
        rng = np.random.default_rng(13)
        n = 130  # spans two 128-node tiles → the arc below crosses tiles
        nodes = np.eye(14, dtype=np.float32)[rng.integers(0, 14, n)]
        arcs = np.array([[0, 129, 1, 0, 0], [129, 0, 0, 1, 0]], dtype=np.float32)
        big = GraphObject(nodes=nodes, arcs=arcs, targets=np.eye(2, dtype=np.float32)[:1],
                          focus="g", aggregation_mode="average")
        small = _random_graphs(3, seed=14)
        gnn = _gnn(threshold=0.0)
        p = Predictor.for_graphs(gnn, [big] + small, batch_size=2, fused=True).warmup()
        assert p.fused and p._fused_step is not None
        assert p._fused_step._cache_size() == 1
        out = p([small[0]])  # fused-eligible request replays the warmed kernel
        assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))
        assert p._fused_step._cache_size() == 1


class TestMicroBatcherRobustness:
    def test_cancelled_future_does_not_kill_worker(self):
        from gnnkeras_tpu.serving import MicroBatcher

        graphs = _random_graphs(6, seed=11)
        gnn = _gnn()
        p = Predictor.for_graphs(gnn, graphs, batch_size=4).warmup()
        mb = MicroBatcher(p, max_delay_ms=20.0)
        try:
            f1 = mb.submit([graphs[0]])
            f1.cancel()  # may or may not win the race with the worker
            out = mb([graphs[1]])  # must still be served either way
            assert np.all(np.isfinite(out))
        finally:
            mb.close()

    def test_close_resolves_stragglers(self):
        from gnnkeras_tpu.serving import MicroBatcher

        graphs = _random_graphs(4, seed=12)
        gnn = _gnn()
        p = Predictor.for_graphs(gnn, graphs, batch_size=4).warmup()
        mb = MicroBatcher(p, max_delay_ms=1.0)
        f = mb.submit([graphs[0]])
        _ = f.result(timeout=30)
        mb.close()
        with pytest.raises(RuntimeError):
            mb.submit([graphs[1]])
