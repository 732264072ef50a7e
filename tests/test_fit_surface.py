"""The unified fit surface (training/fit_loop.py): every distributed engine —
partitioned, expert, pipeline (dp and packed already had it) — carries
validation / callbacks / resumable checkpoints / class_weight, with
resume-equality: an interrupted-and-resumed run reproduces the
uninterrupted run's weights exactly (the checkpoint stores params + BN
state + optimizer state + PRNG).  VERDICT r4 next-step #2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.graph.batch import from_graph_object, graphs_to_batch
from gnnkeras_tpu.graph.graph import CompositeGraphObject, GraphObject
from gnnkeras_tpu.models.composite import CompositeGNNnodeBased
from gnnkeras_tpu.models.gnn import GNNgraphBased, GNNnodeBased
from gnnkeras_tpu.models.lgnn import LGNN
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.parallel.mesh import make_mesh
from gnnkeras_tpu.training.callbacks import EarlyStopping


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(("graph",))


def _params_equal(a, b, atol=0.0):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0, atol=atol)


def _node_graph(seed=0, n=512, a=1500):
    rng = np.random.default_rng(seed)
    nodes = rng.normal(size=(n, 3))
    arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
    return GraphObject(nodes=nodes, arcs=arcs, targets=rng.normal(size=(n, 2)),
                       focus="n", aggregation_mode="average")


def _build_gnn(cls=GNNnodeBased, focus="n", seed=5):
    inp_s, layers_s = get_inout_dims("state", 3, 2, 2, focus, 0)
    inp_o, layers_o = get_inout_dims("output", 3, 2, 2, focus, 0)
    net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = cls(net_st, net_out, 0, 4, 0.01)
    gnn.compile(optimizer="adam:0.01", loss="mse", metrics=["mae"])
    gnn.build(seed=seed)
    gnn._rng = jax.random.PRNGKey(77)
    return gnn


class TestPartitionedFullSurface:
    def test_resume_equality(self, mesh8, tmp_path):
        """3 epochs + resume-to-5 == straight 5 epochs, weights exact."""
        from gnnkeras_tpu.parallel.partition import PartitionedGNN, partition_graph

        g = _node_graph(seed=1)
        pg = partition_graph(g, 8)

        gnn_a = _build_gnn()
        PartitionedGNN(gnn_a, mesh8).fit(pg, epochs=5, verbose=0)

        ck = str(tmp_path / "ck")
        gnn_b = _build_gnn()
        h1 = PartitionedGNN(gnn_b, mesh8).fit(pg, epochs=3, verbose=0, checkpoint_dir=ck)
        assert len(h1["loss"]) == 3
        gnn_c = _build_gnn()
        h2 = PartitionedGNN(gnn_c, mesh8).fit(pg, epochs=5, verbose=0,
                                              checkpoint_dir=ck, resume=True)
        assert len(h2["loss"]) == 2
        _params_equal(gnn_a.variables["params"], gnn_c.variables["params"])
        _params_equal(gnn_a.variables["state"], gnn_c.variables["state"], atol=1e-6)

    def test_validation_callbacks_class_weight(self, mesh8):
        from gnnkeras_tpu.data.sequencers import SingleGraphSequencer
        from gnnkeras_tpu.parallel.partition import PartitionedGNN, partition_graph

        g = _node_graph(seed=2)
        pg = partition_graph(g, 8)
        val = SingleGraphSequencer(_node_graph(seed=3), "n", batch_size=512, shuffle=False)

        gnn = _build_gnn()
        # min_delta so large nothing ever "improves": stop after 1+patience
        # further epochs — proves EarlyStopping actually gates the loop
        es = EarlyStopping(monitor="val_loss", min_delta=1e9, patience=1)
        h = PartitionedGNN(gnn, mesh8).fit(
            pg, epochs=10, verbose=0, validation_data=val, callbacks=[es],
            class_weight={0: 2.0, 1: 1.0},
        )
        assert "val_loss" in h.history and "val_mae" in h.history
        assert len(h["loss"]) == 3  # stopped early (best@1, wait 2, stop 3)

    def test_class_weight_changes_trajectory(self, mesh8):
        from gnnkeras_tpu.parallel.partition import PartitionedGNN, partition_graph

        g = _node_graph(seed=4)
        pg = partition_graph(g, 8)
        runs = []
        # NB the weights must DIFFER per class: a single-class dict yields a
        # uniform scale, which adam normalizes away
        for cw in (None, {0: 5.0, 1: 1.0}):
            gnn = _build_gnn()
            PartitionedGNN(gnn, mesh8).fit(pg, epochs=2, verbose=0, class_weight=cw)
            runs.append(jax.tree_util.tree_leaves(gnn.variables["params"])[0])
        assert not np.allclose(np.asarray(runs[0]), np.asarray(runs[1]))


def _composite_seq(seed=13, n_graphs=8):
    from gnnkeras_tpu.data.sequencers import CompositeMultiGraphSequencer

    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n, a, n_types = int(rng.integers(12, 24)), int(rng.integers(30, 60)), 4
        dims = (2, 3, 4, 3)
        nodes = rng.normal(size=(n, max(dims)))
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
        tm = np.zeros((n, n_types), dtype=bool)
        tm[np.arange(n), rng.integers(0, n_types, n)] = True
        graphs.append(CompositeGraphObject(
            nodes=nodes, arcs=arcs, targets=rng.normal(size=(n, 2)), type_mask=tm,
            dim_node_label=dims, focus="n", aggregation_mode="composite_average"))
    return CompositeMultiGraphSequencer(graphs, "n", "composite_average",
                                        batch_size=4, shuffle=False, pad_multiple=16)


def _build_composite(seed=11):
    inp_s, layers_s = get_inout_dims("state", (2, 3, 4, 3), 2, 2, "n", 5)
    nets = [MLP(input_dim=shape, layers=layers_s, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
            for shape in inp_s]
    ot = MLP(input_dim=(5,), layers=[2], activations="softmax",
             kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    cgnn = CompositeGNNnodeBased(nets, ot, 5, 3, 0.01)
    cgnn.compile(optimizer="adam:0.01", loss="mse", metrics=["mae"])
    cgnn.build(seed=seed)
    cgnn._rng = jax.random.PRNGKey(21)
    return cgnn


class TestExpertFullSurface:
    @pytest.fixture(scope="class")
    def mesh4(self):
        return make_mesh(("expert",), devices=jax.devices()[:4])

    def test_resume_equality(self, mesh4, tmp_path):
        from gnnkeras_tpu.parallel.expert import ExpertParallelCompositeGNN

        seq = _composite_seq()
        cg_a = _build_composite()
        ExpertParallelCompositeGNN(cg_a, mesh4).fit(seq, epochs=4, verbose=0)

        ck = str(tmp_path / "ck")
        cg_b = _build_composite()
        h1 = ExpertParallelCompositeGNN(cg_b, mesh4).fit(
            seq, epochs=2, verbose=0, checkpoint_dir=ck)
        assert len(h1["loss"]) == 2
        cg_c = _build_composite()
        h2 = ExpertParallelCompositeGNN(cg_c, mesh4).fit(
            seq, epochs=4, verbose=0, checkpoint_dir=ck, resume=True)
        assert len(h2["loss"]) == 2
        _params_equal(cg_a.variables["params"], cg_c.variables["params"], atol=1e-7)

    def test_validation_and_early_stopping(self, mesh4):
        from gnnkeras_tpu.parallel.expert import ExpertParallelCompositeGNN

        seq = _composite_seq(seed=17)
        val = _composite_seq(seed=19, n_graphs=4)
        cg = _build_composite()
        es = EarlyStopping(monitor="val_loss", min_delta=1e9, patience=0)
        h = ExpertParallelCompositeGNN(cg, mesh4).fit(
            seq, epochs=8, verbose=0, validation_data=val, callbacks=[es],
            class_weight={0: 2.0},
        )
        assert "val_loss" in h.history and "val_mae" in h.history
        assert len(h["loss"]) == 2  # best@1, stop@2


def _build_lgnn(seed=7, layers=4):
    DS = 4
    gnns = []
    for i in range(layers):
        inp_s, layers_s = get_inout_dims("state", 3, 2, 2, "g", DS, layer=i,
                                         get_state=True, get_output=True)
        inp_o, layers_o = get_inout_dims("output", 3, 2, 2, "g", DS, layer=i,
                                         get_state=True, get_output=True)
        net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                     kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                      kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        gnns.append(GNNgraphBased(net_st, net_out, DS, 3, 0.01))
    lgnn = LGNN(gnns, True, True)
    lgnn.compile(optimizer="sgd:0.1", loss="categorical_crossentropy",
                 training_mode="parallel")
    lgnn.build(seed=seed)
    lgnn._rng = jax.random.PRNGKey(33)
    return lgnn


def _pipeline_batch(seed=0, n_graphs=12):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n, a = int(rng.integers(6, 12)), int(rng.integers(10, 20))
        nodes = rng.normal(size=(n, 3))
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
        t = np.zeros((1, 2))
        t[0, rng.integers(2)] = 1
        graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=t,
                                  focus="g", aggregation_mode="average"))
    merged = GraphObject.merge(graphs, focus="g", aggregation_mode="average")
    return from_graph_object(merged, pad_nodes=256, pad_arcs=512, pad_graphs=16)


class TestPipelineFullSurface:
    @pytest.fixture(scope="class")
    def mesh4(self):
        return make_mesh(("stage",), devices=jax.devices()[:4])

    def test_resume_equality(self, mesh4, tmp_path):
        from gnnkeras_tpu.parallel.pipeline import PipelineLGNN

        mbs = [_pipeline_batch(seed=30), _pipeline_batch(seed=31)]

        lg_a = _build_lgnn()
        PipelineLGNN(lg_a, mesh4).fit([mbs], epochs=4, verbose=0)

        ck = str(tmp_path / "ck")
        lg_b = _build_lgnn()
        h1 = PipelineLGNN(lg_b, mesh4).fit([mbs], epochs=2, verbose=0, checkpoint_dir=ck)
        assert len(h1["loss"]) == 2
        lg_c = _build_lgnn()
        h2 = PipelineLGNN(lg_c, mesh4).fit([mbs], epochs=4, verbose=0,
                                           checkpoint_dir=ck, resume=True)
        assert len(h2["loss"]) == 2
        _params_equal(lg_a.variables["params"], lg_c.variables["params"], atol=1e-7)

    def test_validation_and_early_stopping(self, mesh4):
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
        from gnnkeras_tpu.parallel.pipeline import PipelineLGNN

        rng = np.random.default_rng(40)
        val_graphs = []
        for _ in range(6):
            n, a = int(rng.integers(6, 12)), int(rng.integers(10, 20))
            nodes = rng.normal(size=(n, 3))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
            t = np.zeros((1, 2))
            t[0, rng.integers(2)] = 1
            val_graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=t,
                                          focus="g", aggregation_mode="average"))
        val = MultiGraphSequencer(val_graphs, "g", "average", batch_size=6,
                                  shuffle=False, pad_multiple=16)

        lgnn = _build_lgnn()
        mbs = [_pipeline_batch(seed=41), _pipeline_batch(seed=42)]
        es = EarlyStopping(monitor="val_loss", min_delta=1e9, patience=0)
        h = PipelineLGNN(lgnn, mesh4).fit(
            [mbs], epochs=8, verbose=0, validation_data=val, callbacks=[es],
            class_weight={0: 3.0},
        )
        assert "val_loss" in h.history
        assert len(h["loss"]) == 2  # best@1, stop@2
