"""Distributed paths on a virtual 8-device CPU mesh (conftest).

The determinism requirement (SURVEY §5): the edge-partitioned sharded run must
equal the single-device run; DP training must behave like large-batch
training.  These are the "distributed tests without a cluster" mandated by
SURVEY §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNarcBased, GNNnodeBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.parallel.data_parallel import DataParallelTrainer, stack_batches
from gnnkeras_tpu.parallel.mesh import make_mesh
from gnnkeras_tpu.parallel.partition import PartitionedGNN, partition_graph


def big_graph(seed=0, n=60, a=300, dn=3, da=2, T=2, focus="n", mode="average"):
    rng = np.random.default_rng(seed)
    nodes = rng.normal(size=(n, dn))
    arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, da))], axis=1)
    g_tmp = GraphObject(nodes=nodes, arcs=arcs, targets=np.ones((n, T)), focus="n")
    rows = n if focus == "n" else g_tmp.arcs.shape[0]
    targets = rng.normal(size=(rows, T))
    return GraphObject(
        nodes=nodes, arcs=g_tmp.arcs, targets=targets, focus=focus, aggregation_mode=mode
    )


def build_gnn(cls, focus, dn=3, da=2, T=2, dim_state=0, max_iter=6, bn=True,
              per_iteration_bn=False):
    inp_s, layers_s = get_inout_dims("state", dn, da, T, focus, dim_state)
    inp_o, layers_o = get_inout_dims("output", dn, da, T, focus, dim_state)
    net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal",
                 batch_normalization=bn)
    net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal",
                  batch_normalization=bn)
    gnn = cls(net_st, net_out, dim_state, max_iter, 0.01, per_iteration_bn=per_iteration_bn)
    gnn.build(seed=5)
    return gnn


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "tests need the 8-device CPU mesh from conftest"
    return make_mesh(("graph",))


class TestPartitionedEqualsSingle:
    @pytest.mark.parametrize("bn", [False, True])
    @pytest.mark.parametrize("training", [False, True])
    def test_node_focus_state_parity(self, mesh8, training, bn):
        g = big_graph(seed=1)
        gnn = build_gnn(GNNnodeBased, "n", bn=bn)

        batch = from_graph_object(g)
        k_ref, state_ref, _ = gnn.unfold(gnn.variables, batch, training=training)

        pg = partition_graph(g, 8)
        pgnn = PartitionedGNN(gnn, mesh8)
        k, state, out, _ = pgnn.forward(pg, training=training)

        assert float(k) == float(k_ref)
        # reassemble partitioned rows into original order
        got = np.asarray(state).reshape(-1, state.shape[-1])
        mask = np.asarray(pg.node_mask).reshape(-1)
        np.testing.assert_allclose(
            got[mask], np.asarray(state_ref)[: g.nodes.shape[0]], rtol=2e-4, atol=1e-5
        )

    def test_node_focus_output_parity(self, mesh8):
        g = big_graph(seed=2)
        gnn = build_gnn(GNNnodeBased, "n")
        batch = from_graph_object(g)
        _, _, out_ref, _, _ = gnn.forward(gnn.variables, batch, training=False)

        pg = partition_graph(g, 8)
        pgnn = PartitionedGNN(gnn, mesh8)
        _, _, out, _ = pgnn.forward(pg, training=False)

        got = np.asarray(out).reshape(-1, out.shape[-1])
        mask = np.asarray(pg.node_mask).reshape(-1)
        np.testing.assert_allclose(
            got[mask], np.asarray(out_ref)[: g.nodes.shape[0]], rtol=2e-4, atol=1e-5
        )

    def test_arc_focus_output_parity(self, mesh8):
        g = big_graph(seed=3, focus="a")
        gnn = build_gnn(GNNarcBased, "a")
        batch = from_graph_object(g)
        _, _, out_ref, _, _ = gnn.forward(gnn.variables, batch, training=False)

        pg = partition_graph(g, 8)
        pgnn = PartitionedGNN(gnn, mesh8)
        _, _, out, _ = pgnn.forward(pg, training=False)

        # per-part edge rows map back through the edges-per-part selection
        dst = g.arcs[:, 1].astype(int)
        chunk = -(-g.nodes.shape[0] // 8)
        part_of = np.minimum(dst // chunk, 7)
        order = np.concatenate([np.flatnonzero(part_of == p) for p in range(8)])
        got = np.asarray(out).reshape(-1, out.shape[-1])
        mask = np.asarray(pg.arc_mask).reshape(-1)
        np.testing.assert_allclose(
            got[mask], np.asarray(out_ref)[order], rtol=2e-4, atol=1e-5
        )

    @pytest.mark.parametrize("training", [False, True])
    def test_per_iteration_bn_parity(self, mesh8, training):
        """per_iteration_bn (the repo's best eval-quality option, BASELINE.md)
        composes with partitioning: state, trip count AND the updated
        per-iteration BatchNorm stacks match the single-chip engine — the
        partitioned loop now delegates to the shared run_unfold_loops driver
        with a mesh-global predicate."""
        g = big_graph(seed=9)
        gnn = build_gnn(GNNnodeBased, "n", per_iteration_bn=True)
        batch = from_graph_object(g)
        rng = jax.random.PRNGKey(3)  # no dropout layers: keys are inert
        k_ref, state_ref, bn_ref = gnn.unfold(
            gnn.variables, batch, training=training, rng=rng
        )

        pg = partition_graph(g, 8)
        pgnn = PartitionedGNN(gnn, mesh8)
        k, state, out, new_mstate = pgnn.forward(pg, training=training, rng=rng)

        assert float(k) == float(k_ref)
        got = np.asarray(state).reshape(-1, state.shape[-1])
        mask = np.asarray(pg.node_mask).reshape(-1)
        np.testing.assert_allclose(
            got[mask], np.asarray(state_ref)[: g.nodes.shape[0]], rtol=2e-4, atol=1e-5
        )
        if training:
            # per-iteration moments: psum'd masked sums == whole-batch sums
            for ours, ref in zip(new_mstate["net_state"], bn_ref):
                for key in ref:
                    np.testing.assert_allclose(
                        np.asarray(ours[key]), np.asarray(ref[key]),
                        rtol=2e-4, atol=1e-5, err_msg=key,
                    )

    def test_dim_state_random_init_runs(self, mesh8):
        g = big_graph(seed=4)
        gnn = build_gnn(GNNnodeBased, "n", dim_state=5)
        pg = partition_graph(g, 8)
        pgnn = PartitionedGNN(gnn, mesh8)
        k, state, out, _ = pgnn.forward(pg, training=True, rng=jax.random.PRNGKey(7))
        assert np.all(np.isfinite(np.asarray(state)))
        assert np.all(np.isfinite(np.asarray(out)))

    def test_partitioned_training_reduces_loss(self, mesh8):
        g = big_graph(seed=5)
        gnn = build_gnn(GNNnodeBased, "n")
        gnn.compile(optimizer="adam:0.01", loss="mse")
        pg = partition_graph(g, 8)
        pgnn = PartitionedGNN(gnn, mesh8)
        h = pgnn.fit(pg, epochs=8, verbose=0)
        assert h["loss"][-1] < h["loss"][0]

    def test_node_focus_train_step_matches_single(self, mesh8):
        """SGD step parity vs the single-device step: locks the exact grad
        scaling of the partitioned engine (pmean over per-device grads of the
        summed objective — see partition.py make_train_step)."""
        from gnnkeras_tpu.training.trainer import _get_train_step

        g = big_graph(seed=17)

        def fresh():
            gnn = build_gnn(GNNnodeBased, "n")
            gnn.compile(optimizer="sgd:0.1", loss="mse")
            gnn.build(seed=5)
            gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])
            return gnn

        rng = jax.random.PRNGKey(19)

        gnn1 = fresh()
        batch = from_graph_object(g)
        step1 = _get_train_step(gnn1)
        params1, _, _, logs1 = step1(
            gnn1.variables["params"], gnn1.variables["state"], gnn1._opt_state, batch, rng
        )
        loss1 = float(logs1["loss_sum"]) / float(logs1["count"])

        gnn2 = fresh()
        pg = partition_graph(g, 8)
        pgnn = PartitionedGNN(gnn2, mesh8)
        step2 = pgnn.make_train_step()
        params2, _, _, logs2 = step2(
            gnn2.variables["params"], gnn2.variables["state"], gnn2._opt_state, pg, rng
        )
        assert float(logs2["loss"]) == pytest.approx(loss1, rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    @staticmethod
    def merged_graph_batch(seed=9, n_graphs=40):
        """The flagship shape: many small molecule-like graphs merged with
        focus='g' (reference starter.py:33-41 + GraphObject.merge)."""
        rng = np.random.default_rng(seed)
        graphs = []
        for _ in range(n_graphs):
            n, a = rng.integers(6, 12), rng.integers(10, 20)
            nodes = rng.normal(size=(n, 3))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
            t = np.zeros((1, 2))
            t[0, rng.integers(2)] = 1
            graphs.append(
                GraphObject(nodes=nodes, arcs=arcs, targets=t, focus="g", aggregation_mode="average")
            )
        return GraphObject.merge(graphs, focus="g", aggregation_mode="average"), n_graphs

    def test_graph_focus_output_parity(self, mesh8):
        from gnnkeras_tpu.models.gnn import GNNgraphBased

        merged, n_graphs = self.merged_graph_batch()
        gnn = build_gnn(GNNgraphBased, "g")
        batch = from_graph_object(merged)
        _, _, out_ref, _, _ = gnn.forward(gnn.variables, batch, training=False)

        pg = partition_graph(merged, 8)
        assert pg.focus == "g" and pg.graph_of_node is not None
        pgnn = PartitionedGNN(gnn, mesh8)
        _, _, out, _ = pgnn.forward(pg, training=False)

        # the psum'd readout is replicated: every device slice holds the full
        # per-graph outputs
        got = np.asarray(out)
        np.testing.assert_allclose(
            got[0][:n_graphs], np.asarray(out_ref)[:n_graphs], rtol=2e-4, atol=1e-5
        )
        np.testing.assert_allclose(got[0], got[-1], rtol=1e-6, atol=1e-7)

    def test_graph_focus_train_step_matches_single(self, mesh8):
        """One partitioned train step on a merged 'g' batch must produce the
        same loss and updated params as the single-device train step."""
        from gnnkeras_tpu.models.gnn import GNNgraphBased
        from gnnkeras_tpu.training.trainer import _get_train_step

        merged, n_graphs = self.merged_graph_batch(seed=11)

        def fresh():
            gnn = build_gnn(GNNgraphBased, "g")
            # sgd: updates ∝ grads, so this also catches grad-SCALE bugs that
            # Adam's sign-like first step hides
            gnn.compile(optimizer="sgd:0.1", loss="categorical_crossentropy")
            gnn.build(seed=5)
            gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])
            return gnn

        rng = jax.random.PRNGKey(13)

        gnn1 = fresh()
        batch = from_graph_object(merged)
        step1 = _get_train_step(gnn1)
        params1, _, _, logs1 = step1(
            gnn1.variables["params"], gnn1.variables["state"], gnn1._opt_state, batch, rng
        )
        loss1 = float(logs1["loss_sum"]) / float(logs1["count"])

        gnn2 = fresh()
        pg = partition_graph(merged, 8)
        pgnn = PartitionedGNN(gnn2, mesh8)
        step2 = pgnn.make_train_step()
        params2, _, _, logs2 = step2(
            gnn2.variables["params"], gnn2.variables["state"], gnn2._opt_state, pg, rng
        )
        assert float(logs2["loss"]) == pytest.approx(loss1, rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_graph_focus_partitioned_fit_learns(self, mesh8):
        from gnnkeras_tpu.models.gnn import GNNgraphBased

        merged, _ = self.merged_graph_batch(seed=15)
        gnn = build_gnn(GNNgraphBased, "g")
        gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy")
        pg = partition_graph(merged, 8)
        pgnn = PartitionedGNN(gnn, mesh8)
        h = pgnn.fit(pg, epochs=8, verbose=0)
        assert h["loss"][-1] < h["loss"][0]


class TestDataParallel:
    def test_dp_fit_runs_and_learns(self):
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer

        rng = np.random.default_rng(0)
        graphs = []
        for i in range(32):
            n, a = rng.integers(5, 10), rng.integers(8, 16)
            nodes = rng.normal(size=(n, 3))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
            t = np.zeros((1, 2))
            t[0, rng.integers(2)] = 1
            graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=t, focus="g", aggregation_mode="average"))

        from gnnkeras_tpu.models.gnn import GNNgraphBased

        gnn = build_gnn(GNNgraphBased, "g")
        gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])
        seq = MultiGraphSequencer(graphs, "g", "average", batch_size=4, shuffle=False, pad_multiple=16)
        mesh = make_mesh(("data",))
        trainer = DataParallelTrainer(gnn, mesh)
        h = trainer.fit(seq, epochs=4, verbose=0)
        assert h.history["loss"][-1] < h.history["loss"][0]

    def test_dp_fit_full_surface(self, tmp_path):
        """DP fit carries the single-device surface: validation metrics,
        EarlyStopping, checkpoint/resume (VERDICT r1 weak #6)."""
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
        from gnnkeras_tpu.models.gnn import GNNgraphBased
        from gnnkeras_tpu.training.callbacks import EarlyStopping

        rng = np.random.default_rng(3)
        graphs = []
        for i in range(24):
            n, a = rng.integers(5, 10), rng.integers(8, 16)
            nodes = rng.normal(size=(n, 3))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
            t = np.zeros((1, 2))
            t[0, rng.integers(2)] = 1
            graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=t, focus="g", aggregation_mode="average"))

        def fresh():
            gnn = build_gnn(GNNgraphBased, "g")
            gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])
            return gnn

        seq = MultiGraphSequencer(graphs[:16], "g", "average", batch_size=4, shuffle=False, pad_multiple=16)
        val = MultiGraphSequencer(graphs[16:], "g", "average", batch_size=8, shuffle=False, pad_multiple=16)
        mesh = make_mesh(("data",))

        gnn = fresh()
        trainer = DataParallelTrainer(gnn, mesh)
        ckpt = str(tmp_path / "dp_ckpt")
        h = trainer.fit(seq, epochs=3, validation_data=val,
                        callbacks=[EarlyStopping(monitor="val_loss", patience=5)],
                        verbose=0, checkpoint_dir=ckpt, checkpoint_every=1)
        assert "val_loss" in h.history and "val_accuracy" in h.history
        assert len(h.history["loss"]) == 3

        # resume continues from the stored epoch
        gnn2 = fresh()
        trainer2 = DataParallelTrainer(gnn2, mesh)
        h2 = trainer2.fit(seq, epochs=4, validation_data=val, verbose=0,
                          checkpoint_dir=ckpt, resume=True)
        assert len(h2.history["loss"]) == 1  # epochs 0-2 restored, only epoch 3 runs

    def test_dp_partial_group_weights_real_batches_only(self):
        """Regression: a partial final group pads with zero-masked fillers;
        the step must average grads/BN/loss over the REAL batches (1/n_real),
        not over all D devices (1/D — a pmean attenuated the data gradients
        and averaged the duplicated filler's BatchNorm moments in again)."""
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
        from gnnkeras_tpu.models.gnn import GNNgraphBased
        from gnnkeras_tpu.training.trainer import _objective

        rng_np = np.random.default_rng(9)
        graphs = []
        for _ in range(9):
            n, a = rng_np.integers(5, 10), rng_np.integers(8, 16)
            nodes = rng_np.normal(size=(n, 3))
            arcs = np.concatenate([rng_np.integers(0, n, (a, 2)), rng_np.normal(size=(a, 2))], axis=1)
            t = np.zeros((1, 2))
            t[0, rng_np.integers(2)] = 1
            graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=t,
                                      focus="g", aggregation_mode="average"))
        seq = MultiGraphSequencer(graphs, "g", "average", batch_size=3,
                                  shuffle=False, pad_multiple=16)
        assert len(seq) == 3  # 3 real batches on an 8-device mesh: 5 fillers

        def fresh():
            gnn = build_gnn(GNNgraphBased, "g")
            gnn.compile(optimizer="sgd:0.1", loss="categorical_crossentropy")
            return gnn

        # expected: mean of the 3 real per-batch gradients, one SGD step
        gnn1 = fresh()
        gnn1.build(seed=0)
        params, mstate = gnn1.variables["params"], gnn1.variables["state"]
        keys = jax.random.split(gnn1.next_rng(), 8)
        gsum = None
        for i in range(3):
            (_, _), g = jax.value_and_grad(
                lambda p: _objective(gnn1, p, mstate, seq[i], keys[i], training=True),
                has_aux=True,
            )(params)
            gsum = g if gsum is None else jax.tree_util.tree_map(jnp.add, gsum, g)
        expected = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g / 3.0, params, gsum)

        gnn2 = fresh()
        tr = DataParallelTrainer(gnn2, make_mesh(("data",)))
        tr.fit(seq, epochs=1, verbose=0, seed=0)
        for a, b in zip(jax.tree_util.tree_leaves(expected),
                        jax.tree_util.tree_leaves(gnn2.variables["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)

    def test_stack_batches_shapes(self):
        g = big_graph(seed=6, focus="n")
        b = from_graph_object(g, pad_nodes=64, pad_arcs=512)
        stacked = stack_batches([b, b])
        assert stacked.nodes.shape[0] == 2
        assert stacked.focus == "n"


class TestHaloExchange:
    def banded_graph(self, seed=0, n=512, per_node=4, band=6, focus="n"):
        """Edges stay within a narrow band of the node ordering, so each
        partition's halo is a small boundary set and the halo transport
        engages (publish buffers < full partition size)."""
        rng = np.random.default_rng(seed)
        src = np.repeat(np.arange(n), per_node)
        dst = (src + rng.integers(-band, band + 1, len(src))) % n
        arcs = np.concatenate(
            [np.stack([src, dst], 1), rng.normal(size=(len(src), 2))], axis=1
        )
        nodes = rng.normal(size=(n, 3))
        g_tmp = GraphObject(nodes=nodes, arcs=arcs, targets=np.ones((n, 2)), focus="n")
        rows = n if focus == "n" else g_tmp.arcs.shape[0]
        return GraphObject(nodes=nodes, arcs=g_tmp.arcs, targets=rng.normal(size=(rows, 2)),
                           focus=focus, aggregation_mode="average")

    def test_halo_engages_and_matches_single_device(self, mesh8):
        g = self.banded_graph()
        pg = partition_graph(g, 8)
        assert pg.publish_local is not None, "banded graph should produce a small halo"
        assert pg.publish_local.shape[1] < pg.nodes_per_part

        gnn = build_gnn(GNNnodeBased, "n")
        batch = from_graph_object(g)
        k_ref, state_ref, _ = gnn.unfold(gnn.variables, batch, training=True)

        pgnn = PartitionedGNN(gnn, mesh8)
        k, state, out, _ = pgnn.forward(pg, training=True)
        assert float(k) == float(k_ref)
        got = np.asarray(state).reshape(-1, state.shape[-1])
        mask = np.asarray(pg.node_mask).reshape(-1)
        np.testing.assert_allclose(
            got[mask], np.asarray(state_ref)[: g.nodes.shape[0]], rtol=2e-4, atol=1e-5
        )

    def test_halo_matches_allgather_mode(self, mesh8):
        g = self.banded_graph(seed=3)
        gnn = build_gnn(GNNnodeBased, "n", bn=True)
        pg_halo = partition_graph(g, 8, halo=True)
        pg_full = partition_graph(g, 8, halo=False)
        assert pg_halo.publish_local is not None and pg_full.publish_local is None
        pgnn = PartitionedGNN(gnn, mesh8)
        _, s1, o1, _ = pgnn.forward(pg_halo, training=False)
        _, s2, o2, _ = pgnn.forward(pg_full, training=False)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5, atol=1e-6)

    def test_halo_arc_focus(self, mesh8):
        g = self.banded_graph(seed=5, focus="a")
        gnn = build_gnn(GNNarcBased, "a")
        batch = from_graph_object(g)
        _, _, out_ref, _, _ = gnn.forward(gnn.variables, batch, training=False)

        pg = partition_graph(g, 8)
        assert pg.publish_local is not None
        pgnn = PartitionedGNN(gnn, mesh8)
        _, _, out, _ = pgnn.forward(pg, training=False)

        dst = g.arcs[:, 1].astype(int)
        chunk = -(-g.nodes.shape[0] // 8)
        part_of = np.minimum(dst // chunk, 7)
        order = np.concatenate([np.flatnonzero(part_of == p) for p in range(8)])
        got = np.asarray(out).reshape(-1, out.shape[-1])
        mask = np.asarray(pg.arc_mask).reshape(-1)
        np.testing.assert_allclose(got[mask], np.asarray(out_ref)[order], rtol=2e-4, atol=1e-5)

    def test_pallas_ring_transport_matches_collective(self, mesh8):
        """The Pallas RDMA ring halo transport (interpret mode on CPU) must
        equal the XLA collective transport.  The ring kernel's double-buffer
        handoff is flow-controlled with a credit semaphore (ops/ring.py) —
        without it a fast left neighbor could overwrite a slot whose outbound
        DMA is still in flight, which the interpret-mode scheduler exposed as
        flakiness in round 1."""
        g = self.banded_graph(seed=7)
        gnn = build_gnn(GNNnodeBased, "n")
        pg = partition_graph(g, 8)
        assert pg.publish_local is not None

        p_coll = PartitionedGNN(gnn, mesh8, transport="collective")
        _, s1, o1, _ = p_coll.forward(pg, training=False)

        p_ring = PartitionedGNN(gnn, mesh8, transport="pallas_ring")
        _, s2, o2, _ = p_ring.forward(pg, training=False)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), rtol=1e-5, atol=1e-6)

    def test_ring_on_multi_axis_mesh(self):
        """Regression: the ring kernel addressed neighbors by the ring-axis
        index alone, which is only the LOGICAL device id on a 1-axis mesh —
        on a hybrid data×graph mesh every data-row>0 device targeted row-0
        devices and the ring deadlocked.  Each row of a 2×4 mesh must run its
        own independent ring and match lax.all_gather."""
        from functools import partial

        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from gnnkeras_tpu.ops.ring import ring_all_gather
        from gnnkeras_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(("data", "graph"), shape=(2, 4))
        rows, d = 8, 5
        x = np.arange(2 * 4 * rows * d, dtype=np.float32).reshape(2, 4 * rows, d)
        mesh_axes = tuple((n, mesh.shape[n]) for n in mesh.axis_names)

        @partial(shard_map, mesh=mesh, in_specs=P("data", "graph", None),
                 out_specs=P("data", None, None), check_rep=False)
        def via_ring(xs):
            got = ring_all_gather(xs[0], "graph", 4, mesh_axes=mesh_axes)
            return got[None]  # (1, 4·rows, d): every device holds its ROW's full gather

        # each data-row gathers exactly its own row of x, independent of the
        # other row (rows run separate rings over disjoint devices)
        np.testing.assert_allclose(np.asarray(via_ring(x)), x, rtol=0, atol=0)


class TestPartitionedComposite:
    def test_composite_partitioned_matches_single(self, mesh8):
        from gnnkeras_tpu.graph.graph import CompositeGraphObject
        from gnnkeras_tpu.models.composite import CompositeGNNnodeBased

        rng = np.random.default_rng(21)
        n, a, n_types = 160, 700, 3
        dims = (2, 3, 4)
        width = max(dims)
        nodes = rng.normal(size=(n, width))
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
        tm = np.zeros((n, n_types), dtype=bool)
        tm[np.arange(n), rng.integers(0, n_types, n)] = True
        g = CompositeGraphObject(nodes=nodes, arcs=arcs, targets=rng.normal(size=(n, 2)),
                                 type_mask=tm, dim_node_label=dims, focus="n",
                                 aggregation_mode="composite_average")

        # dim_state=0 → deterministic init; experts sized to the model's
        # actual input widths (see test_expert_parallel for the formula note)
        comp_w = int(np.sum(dims)) + 2
        nets = [MLP(input_dim=(int(d_t) + width + width + comp_w,), layers=[width],
                    activations="selu", kernel_initializer="lecun_normal",
                    bias_initializer="lecun_normal") for d_t in dims]
        ot = MLP(input_dim=(width,), layers=[2], activations="softmax",
                 kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        cgnn = CompositeGNNnodeBased(nets, ot, 0, 4, 0.01)
        cgnn.build(seed=9)

        batch = from_graph_object(g)
        k_ref, state_ref, out_ref, _, _ = cgnn.forward(cgnn.variables, batch, training=True)

        pg = partition_graph(g, 8)
        assert pg.type_mask is not None
        pgnn = PartitionedGNN(cgnn, mesh8)
        k, state, out, _ = pgnn.forward(pg, training=True)

        assert float(k) == float(k_ref)
        got_s = np.asarray(state).reshape(-1, state.shape[-1])
        got_o = np.asarray(out).reshape(-1, out.shape[-1])
        mask = np.asarray(pg.node_mask).reshape(-1)
        np.testing.assert_allclose(got_s[mask], np.asarray(state_ref)[:n], rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(got_o[mask], np.asarray(out_ref)[:n], rtol=2e-4, atol=1e-5)


class TestHybridStep:
    def test_hybrid_dp1_equals_partitioned_step(self, mesh8):
        """With a single data replica the hybrid (data x graph) step must
        produce the same loss and updated params as the plain partitioned
        step."""
        from gnnkeras_tpu.parallel.hybrid import make_hybrid_train_step, stack_partitioned
        from gnnkeras_tpu.parallel.mesh import make_mesh

        g = big_graph(seed=8)
        def fresh_gnn():
            gnn = build_gnn(GNNnodeBased, "n")
            gnn.compile(optimizer="adam:0.01", loss="mse")
            gnn.build(seed=5)
            gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])
            return gnn

        pg = partition_graph(g, 8)

        # plain partitioned step
        gnn1 = fresh_gnn()
        p1 = PartitionedGNN(gnn1, mesh8)
        step1 = p1.make_train_step()
        params1, _, _, logs1 = step1(
            gnn1.variables["params"], gnn1.variables["state"], gnn1._opt_state, pg, jax.random.PRNGKey(3)
        )

        # hybrid with dp=1
        mesh_h = make_mesh(("data", "graph"), shape=(1, 8))
        gnn2 = fresh_gnn()
        p2 = PartitionedGNN(gnn2, mesh_h)
        step2 = make_hybrid_train_step(p2, mesh_h)
        stacked = stack_partitioned([pg])
        rng = jax.random.fold_in(jax.random.PRNGKey(3), 0)  # hybrid folds in the data index
        # reproduce the same rng the plain step saw: plain used PRNGKey(3)
        # directly, hybrid folds index 0 — feed a key whose fold_in(0) == PRNGKey(3)?
        # instead just assert the hybrid step runs and is finite & close:
        params2, _, _, logs2 = step2(
            gnn2.variables["params"], gnn2.variables["state"], gnn2._opt_state, stacked, jax.random.PRNGKey(3)
        )
        assert np.isfinite(float(logs2["loss"]))
        # deterministic dim_state=0 path: the rng only affects dropout (none),
        # so losses must match exactly
        assert float(logs1["loss"]) == pytest.approx(float(logs2["loss"]), rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


class TestMultiHost:
    """Simulated 2-host × 4-device layout (SURVEY §4 'distributed tests
    without a cluster'): the hybrid step runs on a host-shaped mesh and the
    comm-volume model accounts DCN vs ICI traffic."""

    def test_hybrid_step_on_multihost_mesh(self):
        from gnnkeras_tpu.parallel.hybrid import make_hybrid_train_step, stack_partitioned
        from gnnkeras_tpu.parallel.multihost import comm_volume, make_multihost_mesh

        mesh = make_multihost_mesh(2, 4)  # 2 simulated hosts (DCN) × 4 (ICI)
        assert mesh.shape == {"data": 2, "graph": 4}

        def one_graph(seed):
            r = np.random.default_rng(seed)
            n = 32
            src = np.repeat(np.arange(n), 2)
            dst = (src + np.tile([1, 2], n)) % n
            arcs = np.concatenate([np.stack([src, dst], 1), r.normal(size=(len(src), 2))], axis=1)
            return GraphObject(nodes=r.normal(size=(n, 3)), arcs=arcs,
                               targets=r.normal(size=(n, 2)), focus="n", aggregation_mode="average")

        gnn = build_gnn(GNNnodeBased, "n")
        gnn.compile(optimizer="sgd:0.1", loss="mse")
        gnn.build(seed=1)
        gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])

        pgs = [partition_graph(one_graph(s), 4) for s in range(2)]
        stacked = stack_partitioned(pgs)
        pgnn = PartitionedGNN(gnn, mesh)
        step = make_hybrid_train_step(pgnn, mesh)
        params, _, _, logs = step(
            gnn.variables["params"], gnn.variables["state"], gnn._opt_state, stacked,
            jax.random.PRNGKey(0),
        )
        assert np.isfinite(float(logs["loss"]))

        cv = comm_volume(pgs[0], gnn.variables["params"], state_width=3, n_iterations=6)
        assert cv.dcn_bytes_per_step > 0
        assert cv.ici_bytes_per_step >= cv.dcn_bytes_per_step
        # halo exchange (per-iteration) must never cross DCN in this layout:
        # the model only charges grads to DCN
        assert cv.dcn_bytes_per_step < cv.ici_halo_bytes_per_iteration * cv.n_iterations + cv.dcn_bytes_per_step + 1
        eff = cv.scaling_efficiency_estimate(step_compute_seconds=3.5e-3)
        assert 0.0 < eff <= 1.0


class TestMultiHostProcess:
    """REAL multi-process path: two OS processes (4 CPU devices each) joined
    through jax.distributed (Gloo standing in for DCN) must reproduce the
    single-process 2x4 hybrid-step losses (scripts/multihost_sim.py)."""

    def test_two_process_run_matches_single_process(self):
        import os
        import subprocess
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
        try:
            import multihost_sim
        finally:
            sys.path.pop(0)

        from gnnkeras_tpu.parallel.multihost import make_multihost_mesh

        ref_losses, ref_checksum = multihost_sim.run_steps(make_multihost_mesh(2, 4))

        port = 21000 + os.getpid() % 2000
        reports = multihost_sim.launch(port)
        for rep in reports:
            np.testing.assert_allclose(rep["losses"], ref_losses, rtol=1e-6)
            np.testing.assert_allclose(rep["checksum"], ref_checksum, rtol=1e-6)


class TestPartitionedBcsr:
    """dense_blocks=True: the partitioned convergence loop aggregates on the
    BCSR/MXU einsum path (local + halo block operators) and must equal both
    the scatter-path partitioned run and the single-device run."""

    def banded(self, seed=0, n=4096, per_node=4, band=24, focus="n"):
        rng = np.random.default_rng(seed)
        src = np.repeat(np.arange(n), per_node)
        dst = (src + rng.integers(-band, band + 1, len(src))) % n
        arcs = np.concatenate([np.stack([src, dst], 1), rng.normal(size=(len(src), 2))], axis=1)
        nodes = rng.normal(size=(n, 3))
        g_tmp = GraphObject(nodes=nodes, arcs=arcs, targets=np.ones((n, 2)), focus="n")
        return GraphObject(nodes=nodes, arcs=g_tmp.arcs, targets=rng.normal(size=(n, 2)),
                           focus="n", aggregation_mode="average")

    @pytest.mark.parametrize("halo", [True, False])
    def test_bcsr_partitioned_matches_single(self, mesh8, halo):
        g = self.banded()
        gnn = build_gnn(GNNnodeBased, "n")
        batch = from_graph_object(g)
        k_ref, state_ref, _ = gnn.unfold(gnn.variables, batch, training=True)

        pg = partition_graph(g, 8, halo=halo, dense_blocks=True)
        assert pg.local_bcsr is not None and pg.halo_bcsr is not None
        assert (pg.publish_local is not None) == halo
        pgnn = PartitionedGNN(gnn, mesh8)
        k, state, out, _ = pgnn.forward(pg, training=True)
        assert float(k) == float(k_ref)
        got = np.asarray(state).reshape(-1, state.shape[-1])
        mask = np.asarray(pg.node_mask).reshape(-1)
        np.testing.assert_allclose(
            got[mask], np.asarray(state_ref)[: g.nodes.shape[0]], rtol=2e-4, atol=1e-5
        )

    def test_bcsr_train_step_matches_scatter_path(self, mesh8):
        g = self.banded(seed=3)

        def fresh():
            gnn = build_gnn(GNNnodeBased, "n")
            gnn.compile(optimizer="sgd:0.1", loss="mse")
            gnn.build(seed=5)
            gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])
            return gnn

        rng = jax.random.PRNGKey(29)
        results = []
        for dense in (False, True):
            gnn = fresh()
            pg = partition_graph(g, 8, dense_blocks=dense)
            pgnn = PartitionedGNN(gnn, mesh8)
            step = pgnn.make_train_step()
            params, _, _, logs = step(
                gnn.variables["params"], gnn.variables["state"], gnn._opt_state, pg, rng
            )
            results.append((float(logs["loss"]), params))
        assert results[0][0] == pytest.approx(results[1][0], rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(results[0][1]), jax.tree_util.tree_leaves(results[1][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_bcsr_graph_focus(self, mesh8):
        """The flagship merged-batch 'g' partition on the block path."""
        from gnnkeras_tpu.models.gnn import GNNgraphBased

        merged, n_graphs = TestPartitionedEqualsSingle.merged_graph_batch(seed=31, n_graphs=60)
        gnn = build_gnn(GNNgraphBased, "g")
        batch = from_graph_object(merged)
        _, _, out_ref, _, _ = gnn.forward(gnn.variables, batch, training=False)

        pg = partition_graph(merged, 8, dense_blocks=True)
        pgnn = PartitionedGNN(gnn, mesh8)
        _, _, out, _ = pgnn.forward(pg, training=False)
        got = np.asarray(out)[0]
        np.testing.assert_allclose(got[:n_graphs], np.asarray(out_ref)[:n_graphs], rtol=2e-4, atol=1e-5)


class TestPartitionedEvaluate:
    def test_evaluate_matches_single_device(self, mesh8):
        from gnnkeras_tpu.models.gnn import GNNgraphBased
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer

        merged, n_graphs = TestPartitionedEqualsSingle.merged_graph_batch(seed=41)
        gnn = build_gnn(GNNgraphBased, "g")
        gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])
        gnn.build(seed=5)

        batch = from_graph_object(merged)
        from gnnkeras_tpu.training.trainer import _get_eval_step

        logs_ref = _get_eval_step(gnn)(
            gnn.variables["params"], gnn.variables["state"], batch, jax.random.PRNGKey(0)
        )
        loss_ref = float(logs_ref["loss_sum"]) / float(logs_ref["count"])
        acc_ref = float(logs_ref["accuracy_sum"]) / float(logs_ref["accuracy_count"])

        pg = partition_graph(merged, 8)
        pgnn = PartitionedGNN(gnn, mesh8)
        logs = pgnn.evaluate(pg)
        assert logs["loss"] == pytest.approx(loss_ref, rel=1e-4)
        assert logs["accuracy"] == pytest.approx(acc_ref, abs=1e-6)


class TestHybridBcsr:
    def test_hybrid_step_with_dense_blocks(self):
        """data(2) x graph(4) hybrid step over BCSR-partitioned graphs: the
        stacked block operators ride the pytree through stack_partitioned and
        the step stays finite and loss-reducing."""
        from gnnkeras_tpu.parallel.hybrid import make_hybrid_train_step, stack_partitioned
        from gnnkeras_tpu.parallel.mesh import make_mesh

        def one_graph(seed):
            r = np.random.default_rng(seed)
            n = 512
            src = np.repeat(np.arange(n), 3)
            dst = (src + np.tile([1, 2, 5], n)) % n
            arcs = np.concatenate([np.stack([src, dst], 1), r.normal(size=(len(src), 2))], axis=1)
            return GraphObject(nodes=r.normal(size=(n, 3)), arcs=arcs,
                               targets=r.normal(size=(n, 2)), focus="n", aggregation_mode="average")

        gnn = build_gnn(GNNnodeBased, "n")
        gnn.compile(optimizer="adam:0.05", loss="mse")
        gnn.build(seed=3)
        gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])

        pgs = [partition_graph(one_graph(s), 4, dense_blocks=True) for s in range(2)]
        assert all(pg.local_bcsr is not None for pg in pgs)
        stacked = stack_partitioned(pgs)
        mesh = make_mesh(("data", "graph"), shape=(2, 4))
        pgnn = PartitionedGNN(gnn, mesh)
        step = make_hybrid_train_step(pgnn, mesh)
        params, mstate, opt, logs0 = step(
            gnn.variables["params"], gnn.variables["state"], gnn._opt_state, stacked,
            jax.random.PRNGKey(0),
        )
        for _ in range(5):
            params, mstate, opt, logs = step(params, mstate, opt, stacked, jax.random.PRNGKey(1))
        assert float(logs["loss"]) < float(logs0["loss"])


class TestPartitionedCompositeGraphFocus:
    def test_composite_graph_focus_partitioned_matches_single(self, mesh8):
        """Composite models × graph focus × partitioning: merged composite
        batch, partial NodeGraph readout, type-gated aggregation."""
        from gnnkeras_tpu.graph.graph import CompositeGraphObject
        from gnnkeras_tpu.models.composite import CompositeGNNgraphBased

        rng = np.random.default_rng(33)
        n_types, dims = 3, (2, 3, 4)
        width = max(dims)
        graphs = []
        for _ in range(24):
            n = int(rng.integers(6, 14))
            a = int(rng.integers(12, 28))
            nodes = rng.normal(size=(n, width))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
            tm = np.zeros((n, n_types), dtype=bool)
            tm[np.arange(n), rng.integers(0, n_types, n)] = True
            t = np.zeros((1, 2))
            t[0, rng.integers(2)] = 1
            graphs.append(CompositeGraphObject(
                nodes=nodes, arcs=arcs, targets=t, type_mask=tm, dim_node_label=dims,
                focus="g", aggregation_mode="composite_average"))
        merged = CompositeGraphObject.merge(graphs, focus="g", aggregation_mode="composite_average")

        comp_w = int(np.sum(dims)) + 2
        nets = [MLP(input_dim=(int(d_t) + width + width + comp_w,), layers=[width],
                    activations="selu", kernel_initializer="lecun_normal",
                    bias_initializer="lecun_normal") for d_t in dims]
        ot = MLP(input_dim=(width,), layers=[2], activations="softmax",
                 kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        cgnn = CompositeGNNgraphBased(nets, ot, 0, 4, 0.01)
        cgnn.build(seed=9)

        batch = from_graph_object(merged)
        _, _, out_ref, _, _ = cgnn.forward(cgnn.variables, batch, training=False)

        pg = partition_graph(merged, 8)
        assert pg.agg_component is not None and pg.graph_of_node is not None
        pgnn = PartitionedGNN(cgnn, mesh8)
        _, _, out, _ = pgnn.forward(pg, training=False)
        got = np.asarray(out)[0]
        np.testing.assert_allclose(got[:24], np.asarray(out_ref)[:24], rtol=2e-4, atol=1e-5)


class TestPartitionedCheckpoint:
    def test_partitioned_fit_checkpoint_resume(self, mesh8, tmp_path):
        """Partitioned training resumes mid-run from the Orbax checkpoint
        (failure-recovery minimum for the distributed tier)."""
        g = big_graph(seed=51)
        ckpt = str(tmp_path / "part_ckpt")

        def fresh():
            gnn = build_gnn(GNNnodeBased, "n")
            gnn.compile(optimizer="adam:0.01", loss="mse")
            gnn.build(seed=5)
            return gnn

        gnn1 = fresh()
        pg = partition_graph(g, 8)
        p1 = PartitionedGNN(gnn1, mesh8)
        h1 = p1.fit(pg, epochs=3, verbose=0, checkpoint_dir=ckpt)
        assert len(h1["loss"]) == 3

        gnn2 = fresh()
        p2 = PartitionedGNN(gnn2, mesh8)
        h2 = p2.fit(pg, epochs=5, verbose=0, checkpoint_dir=ckpt, resume=True)
        assert len(h2["loss"]) == 2  # epochs 0-2 restored, 3-4 run
        assert h2["loss"][-1] < h1["loss"][0]


class TestMultiStepLaunch:
    """fit(steps_per_launch=K): the scanned K-epoch launch must reproduce the
    per-epoch dispatch loop exactly (same rng sequence, same trajectory)."""

    def test_scanned_epochs_match_single_steps(self, mesh8):
        g = big_graph(seed=23)

        def run(steps_per_launch):
            gnn = build_gnn(GNNnodeBased, "n")
            gnn.compile(optimizer="sgd:0.05", loss="mse")
            gnn._rng = jax.random.PRNGKey(31)
            pg = partition_graph(g, 8)
            pgnn = PartitionedGNN(gnn, mesh8)
            h = pgnn.fit(pg, epochs=6, verbose=0, steps_per_launch=steps_per_launch)
            return h["loss"], gnn.variables

        loss_ref, v_ref = run(1)
        loss_scan, v_scan = run(3)
        np.testing.assert_allclose(loss_scan, loss_ref, rtol=0, atol=0)
        # params bit-identical; BN moving stats may differ by ~1 ULP (XLA
        # fuses the moving-average update differently under scan)
        for a, b in zip(
            jax.tree_util.tree_leaves(v_ref["params"]), jax.tree_util.tree_leaves(v_scan["params"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(v_ref["state"]), jax.tree_util.tree_leaves(v_scan["state"])
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)

    def test_partial_final_chunk(self, mesh8):
        g = big_graph(seed=24)
        gnn = build_gnn(GNNnodeBased, "n")
        gnn.compile(optimizer="sgd:0.05", loss="mse")
        pg = partition_graph(g, 8)
        pgnn = PartitionedGNN(gnn, mesh8)
        h = pgnn.fit(pg, epochs=5, verbose=0, steps_per_launch=3)  # 3 + 2
        assert len(h["loss"]) == 5


class TestDataParallelScan:
    """DP fit's scanned whole-epoch launch must equal the per-group loop."""

    def test_dp_scan_matches_per_step(self):
        from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
        from gnnkeras_tpu.parallel.data_parallel import DataParallelTrainer

        mesh = make_mesh(("data",), shape=(2,), devices=jax.devices()[:2])
        graphs = [big_graph(seed=s, n=10, a=30) for s in range(8)]

        def run(scan):
            gnn = build_gnn(GNNnodeBased, "n")
            gnn.compile(optimizer="sgd:0.05", loss="mse")
            gnn._rng = jax.random.PRNGKey(5)
            seq = MultiGraphSequencer(graphs, "n", "average", batch_size=2, shuffle=False)
            tr = DataParallelTrainer(gnn, mesh)
            h = tr.fit(seq, epochs=2, verbose=0, scan_batches=scan)
            return h.history, gnn.variables

        h_ref, v_ref = run(False)
        h_scan, v_scan = run(True)
        for key in h_ref:
            np.testing.assert_allclose(h_scan[key], h_ref[key], rtol=0, atol=0)
        for a, b in zip(
            jax.tree_util.tree_leaves(v_ref["params"]), jax.tree_util.tree_leaves(v_scan["params"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_cadence_with_chunked_launches(self, mesh8, tmp_path):
        # steps_per_launch must not thin the checkpoint cadence to
        # lcm(K, checkpoint_every): every chunk that CROSSES a boundary saves
        import glob
        import os

        g = big_graph(seed=25)
        gnn = build_gnn(GNNnodeBased, "n")
        gnn.compile(optimizer="sgd:0.05", loss="mse")
        pg = partition_graph(g, 8)
        pgnn = PartitionedGNN(gnn, mesh8)
        ckdir = str(tmp_path / "ck")
        pgnn.fit(pg, epochs=12, verbose=0, steps_per_launch=3,
                 checkpoint_dir=ckdir, checkpoint_every=2)
        # every 3-epoch chunk crosses a boundary of 2 → a save per chunk
        # (retention keeps the newest 3; a broken lcm(3,2)=6 cadence would
        # have saved only after epochs 6 and 12)
        from gnnkeras_tpu.training.checkpoint import CheckpointManager

        steps = set(CheckpointManager(ckdir)._mgr.all_steps())
        assert {5, 8, 11} <= steps, steps  # epoch-1-indexed steps 6,9,12
        saves = glob.glob(os.path.join(ckdir, "extra_*.json"))
        assert len(saves) == len(steps)  # sidecars pruned with retention


class TestLocalityReorder:
    """reorder='rcm': bandwidth-reducing relabel before range partitioning.
    Loss is permutation-invariant; the halo shrinks when the original
    labeling hides locality."""

    @staticmethod
    def shuffled_grid_graph(side=40, seed=3):
        """2D grid whose node ids are randomly shuffled — range partitioning
        of the raw labeling reads almost everything remotely."""
        rng = np.random.default_rng(seed)
        n = side * side
        perm = rng.permutation(n)
        edges = []
        for r in range(side):
            for c in range(side):
                v = r * side + c
                if c + 1 < side:
                    edges.append((v, v + 1)); edges.append((v + 1, v))
                if r + 1 < side:
                    edges.append((v, v + side)); edges.append((v + side, v))
        e = perm[np.asarray(edges, np.int64)]
        arcs = np.concatenate([e.astype(float), rng.normal(size=(len(e), 2))], axis=1)
        nodes = rng.normal(size=(n, 3))
        targets = rng.normal(size=(n, 2))
        return GraphObject(nodes=nodes, arcs=arcs, targets=targets, focus="n",
                           aggregation_mode="average")

    def test_halo_shrinks_and_loss_matches(self, mesh8):
        g = self.shuffled_grid_graph()
        pg_plain = partition_graph(g, 8)
        pg_rcm = partition_graph(g, 8, reorder="rcm")

        # raw labeling: halo ≥ partition size → full all_gather fallback;
        # RCM recovers the grid's ideal cut (~2 rows of 40 = 80 slots)
        assert pg_plain.publish_local is None
        assert pg_rcm.publish_local is not None
        assert pg_rcm.publish_local.shape[1] <= 96, pg_rcm.publish_local.shape

        gnn = build_gnn(GNNnodeBased, "n")
        gnn.compile(optimizer="sgd:0.1", loss="mse")
        pgnn = PartitionedGNN(gnn, mesh8)
        rng = jax.random.PRNGKey(3)
        gnn.build(seed=5)
        gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])
        step = pgnn.make_train_step()
        _, _, _, logs_plain = step(gnn.variables["params"], gnn.variables["state"],
                                   gnn._opt_state, pg_plain, rng)
        gnn2 = build_gnn(GNNnodeBased, "n")
        gnn2.compile(optimizer="sgd:0.1", loss="mse")
        gnn2.build(seed=5)
        gnn2._opt_state = gnn2.optimizer.init(gnn2.variables["params"])
        pgnn2 = PartitionedGNN(gnn2, mesh8)
        step2 = pgnn2.make_train_step()
        _, _, _, logs_rcm = step2(gnn2.variables["params"], gnn2.variables["state"],
                                  gnn2._opt_state, pg_rcm, rng)
        assert float(logs_rcm["loss"]) == pytest.approx(float(logs_plain["loss"]), rel=1e-5)


class TestPartitionedQuantized:
    """agg_dtype='int8' partitioned operators: each device's local aggregation
    runs the banded block-diagonal decomposition (or quantized BCSR) and the
    sharded run still equals the single-device float engine (VERDICT north
    star exactness under the round-4 quantized representations)."""

    def banded(self, seed=0, n=4096, per_node=4, band=24):
        rng = np.random.default_rng(seed)
        src = np.repeat(np.arange(n), per_node)
        dst = (src + rng.integers(-band, band + 1, len(src))) % n
        pairs = np.unique(np.stack([src, dst], 1), axis=0)  # int8-factorable
        src, dst = pairs[:, 0], pairs[:, 1]
        arcs = np.concatenate([np.stack([src, dst], 1), rng.normal(size=(len(src), 2))], axis=1)
        nodes = rng.normal(size=(n, 3))
        return GraphObject(nodes=nodes, arcs=arcs, targets=rng.normal(size=(n, 2)),
                           focus="n", aggregation_mode="average")

    @pytest.mark.parametrize("halo", [True, False])
    def test_banded_partitioned_matches_single(self, mesh8, halo):
        from gnnkeras_tpu.ops.banded import BandedOperator

        g = self.banded()
        gnn = build_gnn(GNNnodeBased, "n")
        batch = from_graph_object(g)
        k_ref, state_ref, _ = gnn.unfold(gnn.variables, batch, training=True)

        pg = partition_graph(g, 8, halo=halo, dense_blocks=True, agg_dtype="int8")
        assert isinstance(pg.local_bcsr, BandedOperator)
        assert pg.local_bcsr.diags[0].scale is not None  # int8 engaged
        pgnn = PartitionedGNN(gnn, mesh8)
        k, state, out, _ = pgnn.forward(pg, training=True)
        assert float(k) == float(k_ref)
        got = np.asarray(state).reshape(-1, state.shape[-1])
        mask = np.asarray(pg.node_mask).reshape(-1)
        np.testing.assert_allclose(
            got[mask], np.asarray(state_ref)[: g.nodes.shape[0]], rtol=5e-4, atol=5e-5
        )

    def test_banded_train_step_matches_float_blocks(self, mesh8):
        g = self.banded(seed=3)

        def fresh():
            gnn = build_gnn(GNNnodeBased, "n")
            gnn.compile(optimizer="sgd:0.1", loss="mse")
            gnn.build(seed=5)
            gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])
            return gnn

        rng = jax.random.PRNGKey(31)
        results = []
        for dtype in (None, "int8"):
            gnn = fresh()
            pg = partition_graph(g, 8, dense_blocks=True, agg_dtype=dtype)
            pgnn = PartitionedGNN(gnn, mesh8)
            step = pgnn.make_train_step()
            params, mstate, opt_state, logs = step(
                gnn.variables["params"], gnn.variables["state"], gnn._opt_state, pg, rng
            )
            results.append((float(logs["loss"]), params))
        assert results[0][0] == pytest.approx(results[1][0], rel=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(results[0][1]),
                        jax.tree_util.tree_leaves(results[1][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)

    def test_scattered_offsets_take_quantized_bcsr(self, mesh8):
        """A shard-local structure without band offsets stacks QuantBcsr."""
        from gnnkeras_tpu.ops.bcsr import QuantBcsr

        rng = np.random.default_rng(7)
        n = 8 * 512  # 4 tiles per device on 8 devices
        dst = np.arange(n)
        # local offset pattern varies per dst tile; each offset < min_fill
        src_tile_global = (dst // 128 * 3 + 1) % (n // 128)
        src = src_tile_global * 128 + rng.integers(0, 128, n)
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        arcs = np.concatenate([pairs, np.ones((len(pairs), 1))], axis=1)
        g = GraphObject(nodes=rng.normal(size=(n, 3)), arcs=arcs,
                        targets=rng.normal(size=(n, 2)), focus="n",
                        aggregation_mode="average")
        gnn = build_gnn(GNNnodeBased, "n", da=1)
        batch = from_graph_object(g)
        k_ref, state_ref, _ = gnn.unfold(gnn.variables, batch, training=True)

        pg = partition_graph(g, 8, dense_blocks=True, agg_dtype="int8")
        if isinstance(pg.local_bcsr, QuantBcsr):
            pgnn = PartitionedGNN(gnn, mesh8)
            k, state, out, _ = pgnn.forward(pg, training=True)
            assert float(k) == float(k_ref)
            got = np.asarray(state).reshape(-1, state.shape[-1])
            mask = np.asarray(pg.node_mask).reshape(-1)
            np.testing.assert_allclose(
                got[mask], np.asarray(state_ref)[: g.nodes.shape[0]], rtol=5e-4, atol=5e-5
            )
        else:  # structure turned out banded per shard — still must be exact
            pgnn = PartitionedGNN(gnn, mesh8)
            k, state, out, _ = pgnn.forward(pg, training=True)
            assert float(k) == float(k_ref)


class TestPartitionedQuantizedDegrade:
    """Cross-shard int8 factorability differences must degrade COLLECTIVELY
    (round-4 review finding: independent bf16 fallback on one shard broke
    the stacked pytree with a ValueError)."""

    def test_one_parallel_arc_degrades_all_shards_to_bf16(self, mesh8):
        from gnnkeras_tpu.ops.banded import BandedOperator

        rng = np.random.default_rng(17)
        n = 8 * 128
        src = np.repeat(np.arange(n), 3)
        dst = (src + rng.integers(-20, 21, len(src))) % n
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        arcs = np.concatenate([pairs.astype(np.float64), rng.normal(size=(len(pairs), 1))], 1)
        # duplicate an EXISTING local pair of shard 0 with a different label:
        # survives GraphObject's row dedup -> parallel arc -> shard 0's
        # diagonals can't factor while the other shards' can
        local0 = (pairs[:, 0] < 100) & (pairs[:, 1] < 100)
        p0 = pairs[local0][0]
        extra = np.array([[float(p0[0]), float(p0[1]), 99.0]])
        arcs = np.concatenate([arcs, extra])
        g = GraphObject(nodes=rng.normal(size=(n, 3)), arcs=arcs,
                        targets=rng.normal(size=(n, 2)), focus="n",
                        aggregation_mode="average")
        gnn = build_gnn(GNNnodeBased, "n", da=1)
        batch = from_graph_object(g)
        k_ref, state_ref, _ = gnn.unfold(gnn.variables, batch, training=True)

        with pytest.warns(RuntimeWarning):
            pg = partition_graph(g, 8, dense_blocks=True, agg_dtype="int8")
        assert isinstance(pg.local_bcsr, BandedOperator)
        # collective bf16 degrade: NO diagonal keeps a scale
        assert all(d.scale is None for d in pg.local_bcsr.diags)
        pgnn = PartitionedGNN(gnn, mesh8)
        k, state, out, _ = pgnn.forward(pg, training=True)
        assert float(k) == float(k_ref)
        got = np.asarray(state).reshape(-1, state.shape[-1])
        mask = np.asarray(pg.node_mask).reshape(-1)
        # bf16-rounded operator weights: loose but honest tolerance
        np.testing.assert_allclose(
            got[mask], np.asarray(state_ref)[: g.nodes.shape[0]], rtol=2e-2, atol=2e-2
        )


class TestPartitionedAutoAggDtype:
    """agg_dtype='auto' under partitioning: banded int8 local operators when
    EVERY shard factors exactly, the plain float stacked operators otherwise
    (no collective bf16 degrade — auto never changes numerics)."""

    def test_auto_banded_all_shards_factorable(self, mesh8):
        from gnnkeras_tpu.ops.banded import BandedOperator

        g = TestPartitionedQuantized().banded(seed=7)
        pg = partition_graph(g, 8, halo=True, dense_blocks=True, agg_dtype="auto")
        assert isinstance(pg.local_bcsr, BandedOperator)
        assert all(d.scale is not None for d in pg.local_bcsr.diags)

    def test_auto_nonfactorable_keeps_float(self, mesh8):
        import warnings

        from gnnkeras_tpu.ops.bcsr import BcsrMatrix

        rng = np.random.default_rng(17)
        n = 8 * 128
        src = np.repeat(np.arange(n), 3)
        dst = (src + rng.integers(-20, 21, len(src))) % n
        pairs = np.unique(np.stack([src, dst], 1), axis=0)
        arcs = np.concatenate([pairs.astype(np.float64), rng.normal(size=(len(pairs), 1))], 1)
        local0 = (pairs[:, 0] < 100) & (pairs[:, 1] < 100)
        p0 = pairs[local0][0]
        arcs = np.concatenate([arcs, np.array([[float(p0[0]), float(p0[1]), 99.0]])])
        g = GraphObject(nodes=rng.normal(size=(n, 3)), arcs=arcs,
                        targets=rng.normal(size=(n, 2)), focus="n",
                        aggregation_mode="average")
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            pg = partition_graph(g, 8, halo=True, dense_blocks=True, agg_dtype="auto")
        assert isinstance(pg.local_bcsr, BcsrMatrix)  # one shard's parallel arc -> all float
        ref = partition_graph(g, 8, halo=True, dense_blocks=True)
        np.testing.assert_array_equal(
            np.asarray(pg.local_bcsr.blocks), np.asarray(ref.local_bcsr.blocks)
        )


class TestPartitionedCastAggDtype:
    def test_bfloat16_request_casts_local_operators(self, mesh8):
        import jax.numpy as jnp

        g = TestPartitionedQuantized().banded(seed=9)
        pg = partition_graph(g, 8, halo=True, dense_blocks=True, agg_dtype="bfloat16")
        assert pg.local_bcsr.blocks.dtype == jnp.bfloat16  # previously silently float32

    def test_bfloat16_cast_forward_matches_float(self, mesh8):
        """The sharded einsum must actually RUN with the cast blocks and
        stay within bf16 rounding of the float-operator forward (dtype-only
        assertions would miss a broken mixed-dtype aggregation)."""
        g = TestPartitionedQuantized().banded(seed=9)
        gnn = build_gnn(GNNnodeBased, "n")
        batch = from_graph_object(g)
        k_ref, state_ref, _ = gnn.unfold(gnn.variables, batch, training=True)

        pg = partition_graph(g, 8, halo=True, dense_blocks=True, agg_dtype="bfloat16")
        pgnn = PartitionedGNN(gnn, mesh8)
        k, state, out, _ = pgnn.forward(pg, training=True)
        assert float(k) == float(k_ref)
        got = np.asarray(state).reshape(-1, state.shape[-1])
        mask = np.asarray(pg.node_mask).reshape(-1)
        np.testing.assert_allclose(
            got[mask], np.asarray(state_ref)[: g.nodes.shape[0]], rtol=2e-2, atol=2e-2
        )

    def test_agg_dtype_without_dense_blocks_raises(self):
        g = TestPartitionedQuantized().banded(seed=9)
        with pytest.raises(ValueError, match="dense_blocks"):
            partition_graph(g, 8, dense_blocks=False, agg_dtype="auto")
