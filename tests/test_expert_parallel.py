"""Expert-parallel composite GNN == single-device composite GNN."""

import jax
import numpy as np
import pytest

from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import CompositeGraphObject
from gnnkeras_tpu.models.composite import CompositeGNNnodeBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.parallel.expert import ExpertParallelCompositeGNN, stack_expert_params
from gnnkeras_tpu.parallel.mesh import make_mesh


def composite_graph(seed=0, n=40, a=150, n_types=4):
    rng = np.random.default_rng(seed)
    dims = tuple(int(d) for d in rng.integers(2, 6, n_types))
    width = max(dims)
    nodes = rng.normal(size=(n, width))
    arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
    tm = np.zeros((n, n_types), dtype=bool)
    tm[np.arange(n), rng.integers(0, n_types, n)] = True
    return CompositeGraphObject(
        nodes=nodes, arcs=arcs, targets=rng.normal(size=(n, 2)), type_mask=tm,
        dim_node_label=dims, focus="n", aggregation_mode="composite_average",
    )


def build_composite(g, dim_state=6, max_iter=4):
    inp_s, layers_s = get_inout_dims(
        "state", tuple(g.DIM_NODE_LABEL), g.DIM_ARC_LABEL, g.DIM_TARGET, "n", dim_state
    )
    nets = [MLP(input_dim=shape, layers=layers_s, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
            for shape in inp_s]
    ot = MLP(input_dim=(dim_state,), layers=[2], activations="softmax",
             kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    cgnn = CompositeGNNnodeBased(nets, ot, dim_state, max_iter, 0.01)
    cgnn.build(seed=11)
    return cgnn


@pytest.fixture(scope="module")
def mesh4():
    return make_mesh(("expert",), devices=jax.devices()[:4])


class TestExpertParallel:
    def test_stacking_preserves_outputs(self):
        g = composite_graph()
        cgnn = build_composite(g)
        sp, ss, w_max = stack_expert_params(
            cgnn.net_state,
            cgnn.variables["params"]["net_state"],
            cgnn.variables["state"]["net_state"],
            4,
        )
        # padded stacked expert t applied to padded input == original MLP
        rng = np.random.default_rng(0)
        import jax.numpy as jnp

        for t, net in enumerate(cgnn.net_state):
            w_t = net.input_dim[0]
            x = jnp.asarray(rng.normal(size=(10, w_t)).astype(np.float32))
            x_pad = jnp.pad(x, ((0, 0), (0, w_max - w_t)))
            ref, _ = net.apply(
                {"params": cgnn.variables["params"]["net_state"][t],
                 "state": cgnn.variables["state"]["net_state"][t]}, x, training=False)
            p_t = jax.tree_util.tree_map(lambda v: v[t], sp)
            s_t = jax.tree_util.tree_map(lambda v: v[t], ss)
            got, _ = net.apply({"params": p_t, "state": s_t}, x_pad, training=False)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_forward_matches_single_device(self, mesh4):
        g = composite_graph(seed=2)
        cgnn = build_composite(g)
        batch = from_graph_object(g)

        rng = jax.random.PRNGKey(3)
        k_ref, state_ref, out_ref, _, _ = cgnn.forward(cgnn.variables, batch, training=True, rng=rng)

        ep = ExpertParallelCompositeGNN(cgnn, mesh4)
        k, state, out, _ = ep.forward(batch, training=True, rng=rng)
        # dim_state>0 uses rng-dependent state init whose split paths differ
        # between the two engines; this test exercises the path for shape/
        # finiteness, the ds0 test below checks exact numerical equality.
        assert np.all(np.isfinite(np.asarray(state)))
        assert np.all(np.isfinite(np.asarray(out)))

    def test_forward_matches_single_device_ds0(self, mesh4):
        g = composite_graph(seed=4)
        # dim_state=0 → deterministic state init (the full node matrix), so
        # the expert and single-device paths are exactly comparable.  NB the
        # reference's get_inout_dims formula does not match its own composite
        # model for dim_state==0 (the model concats the full-width state and
        # aggregated state, CompositeGNN.py:224); build with the model's true
        # input widths.
        width = g.nodes.shape[1]
        comp_w = int(np.sum(g.DIM_NODE_LABEL)) + g.DIM_ARC_LABEL
        nets = [MLP(input_dim=(int(d_t) + width + width + comp_w,), layers=[width],
                    activations="selu", kernel_initializer="lecun_normal",
                    bias_initializer="lecun_normal")
                for d_t in g.DIM_NODE_LABEL]
        ot = MLP(input_dim=(width,), layers=[2], activations="softmax",
                 kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        cgnn = CompositeGNNnodeBased(nets, ot, 0, 4, 0.01)
        cgnn.build(seed=5)
        batch = from_graph_object(g)

        k_ref, state_ref, out_ref, _, _ = cgnn.forward(cgnn.variables, batch, training=True)

        ep = ExpertParallelCompositeGNN(cgnn, mesh4)
        k, state, out, _ = ep.forward(batch, training=True, rng=jax.random.PRNGKey(0))

        assert float(k) == float(k_ref)
        np.testing.assert_allclose(np.asarray(state), np.asarray(state_ref), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=2e-4, atol=1e-5)


class TestExpertParallelTraining:
    def test_ep_training_reduces_loss(self, mesh4):
        from gnnkeras_tpu.data.sequencers import CompositeMultiGraphSequencer

        rng = np.random.default_rng(13)
        graphs = []
        for _ in range(8):
            n, a, n_types = int(rng.integers(12, 24)), int(rng.integers(30, 60)), 4
            dims = (2, 3, 4, 3)
            width = max(dims)
            nodes = rng.normal(size=(n, width))
            arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1)
            tm = np.zeros((n, n_types), dtype=bool)
            tm[np.arange(n), rng.integers(0, n_types, n)] = True
            graphs.append(CompositeGraphObject(
                nodes=nodes, arcs=arcs, targets=rng.normal(size=(n, 2)), type_mask=tm,
                dim_node_label=dims, focus="n", aggregation_mode="composite_average"))

        cgnn = build_composite(graphs[0], dim_state=5, max_iter=3)
        cgnn.compile(optimizer="adam:0.01", loss="mse", metrics=["mae"])
        ep = ExpertParallelCompositeGNN(cgnn, mesh4)
        seq = CompositeMultiGraphSequencer(graphs, "n", "composite_average", batch_size=4,
                                           shuffle=False, pad_multiple=16)
        h = ep.fit(seq, epochs=6, verbose=0)
        assert h["loss"][-1] < h["loss"][0]
        assert "mae" in h and len(h["mae"]) == 6
        logs = ep.evaluate(seq)
        assert np.isfinite(logs["loss"]) and "mae" in logs

    def _ds0_model(self, g, reg=None):
        width = g.nodes.shape[1]
        comp_w = int(np.sum(g.DIM_NODE_LABEL)) + g.DIM_ARC_LABEL
        nets = [MLP(input_dim=(int(d_t) + width + width + comp_w,), layers=[width],
                    activations="selu", kernel_initializer="lecun_normal",
                    bias_initializer="lecun_normal", kernel_regularizer=reg)
                for d_t in g.DIM_NODE_LABEL]
        ot = MLP(input_dim=(width,), layers=[2], activations="softmax",
                 kernel_initializer="glorot_normal", bias_initializer="glorot_normal",
                 kernel_regularizer=reg)
        cgnn = CompositeGNNnodeBased(nets, ot, 0, 4, 0.01)
        cgnn.build(seed=5)
        return cgnn

    def test_ep_step_matches_single_device_with_regularizers(self, mesh4):
        """One EP SGD step == one single-device SGD step, loss INCLUDING the
        L2 regularizers (VERDICT r1: EP silently dropped regularization).
        SGD makes the comparison sensitive to grad scaling."""
        from gnnkeras_tpu.training.trainer import _get_train_step

        g = composite_graph(seed=7)
        batch = from_graph_object(g)
        rng = jax.random.PRNGKey(21)

        cg1 = self._ds0_model(g, reg="l2")
        cg1.compile(optimizer="sgd:0.1", loss="mse")
        cg1._opt_state = cg1.optimizer.init(cg1.variables["params"])
        bn_state_snapshot = jax.tree_util.tree_map(np.asarray, cg1.variables["state"]["net_state"])
        step1 = _get_train_step(cg1)
        params1, _, _, logs1 = step1(
            cg1.variables["params"], cg1.variables["state"], cg1._opt_state, batch, rng
        )
        loss1 = float(logs1["loss_sum"]) / float(logs1["count"])

        cg2 = self._ds0_model(g, reg="l2")
        cg2.compile(optimizer="sgd:0.1", loss="mse")
        ep = ExpertParallelCompositeGNN(cg2, mesh4)
        ep._ensure_stacked(batch)
        import optax

        opt_e = cg2.optimizer.init(ep.stacked_params)
        out_p = cg2.variables["params"]["net_output"]
        out_s = cg2.variables["state"]["net_output"]
        opt_o = cg2.optimizer.init(out_p)
        step2 = ep.make_train_step(opt_e, opt_o)
        sparams, bn_e, out_p2, bn_o, _, _, logs2 = step2(
            ep.stacked_params, ep.stacked_state, out_p, out_s, opt_e, opt_o,
            ep._nodes_by_type(batch), ep._type_masks(batch), batch, rng
        )
        # trainer logs loss_sum = (data+reg)·count; EP logs the same total loss
        assert float(logs2["loss"]) == pytest.approx(loss1, rel=1e-5)

        # updated params match: experts (unstack, unpad) + output head
        for a, b in zip(
            jax.tree_util.tree_leaves(params1["net_output"]),
            jax.tree_util.tree_leaves(out_p2),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
        restacked, _, _ = stack_expert_params(
            cg1.net_state, params1["net_state"],
            bn_state_snapshot, ep.types_pad,
            label_widths=[int(d) for d in batch.dim_node_label],
        )
        for a, b in zip(jax.tree_util.tree_leaves(restacked), jax.tree_util.tree_leaves(sparams)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


class TestExpertDropoutParity:
    def test_dropout_masks_match_wrapped_model(self):
        """Training-mode forward with ACTIVE dropout must equal the wrapped
        composite model bit-for-bit: the EP engine reproduces the composite's
        exact rng chain (state init, per-step per-type keys, output head)."""
        from gnnkeras_tpu.graph.batch import from_graph_object
        from gnnkeras_tpu.graph.graph import CompositeGraphObject
        from gnnkeras_tpu.models.composite import CompositeGNNnodeBased
        from gnnkeras_tpu.models.mlp import MLP
        from gnnkeras_tpu.parallel.expert import ExpertParallelCompositeGNN
        from gnnkeras_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(3)
        n, T, DS = 24, 2, 4
        nodes = rng.normal(size=(n, 5)).astype(np.float32)
        src, dst = rng.integers(0, n, 40), rng.integers(0, n, 40)
        keep = src != dst
        arcs = np.concatenate(
            [np.stack([src[keep], dst[keep]], 1), rng.normal(size=(int(keep.sum()), 2))], 1)
        tm = np.zeros((n, T), bool)
        tm[np.arange(n), rng.integers(0, T, n)] = True
        g = CompositeGraphObject(
            nodes=nodes, arcs=arcs, targets=rng.normal(size=(n, 2)).astype(np.float32),
            type_mask=tm, dim_node_label=(5, 5), focus="n", aggregation_mode="average")
        batch = from_graph_object(g)

        sts = [MLP(input_dim=(5 + DS + DS + (5 + 5 + 2),), layers=[DS], activations="tanh",
                   kernel_initializer="lecun_normal", bias_initializer="lecun_normal",
                   dropout_rate=0.3, dropout_pos=1) for _ in range(T)]
        ot = MLP(input_dim=(DS,), layers=[2], activations="linear",
                 kernel_initializer="glorot_normal", bias_initializer="zeros")
        cgnn = CompositeGNNnodeBased(sts, ot, DS, 3, 0.0)
        cgnn.build(seed=2)
        # dropout MASK DRAWS are layout-dependent (the transposed engine
        # draws in feature-major order), so the oracle for the expert
        # engine's row-major per-type compute is the row-major engine —
        # force it here (the r4 byte-width auto rule would pick transposed)
        cgnn.transposed = False
        k = jax.random.PRNGKey(9)
        _, _, out_ref, _, _ = cgnn.forward(cgnn.variables, batch, training=True, rng=k)

        ep = ExpertParallelCompositeGNN(cgnn, make_mesh(("expert",), devices=jax.devices()[:2]))
        out_ep = ep.forward(batch, training=True, rng=k)[2]
        np.testing.assert_allclose(np.asarray(out_ep), np.asarray(out_ref), rtol=1e-5, atol=1e-6)


class TestExpertWriteback:
    def _model(self, g, average_st_grads=False):
        width = g.nodes.shape[1]
        comp_w = int(np.sum(g.DIM_NODE_LABEL)) + g.DIM_ARC_LABEL
        nets = [MLP(input_dim=(int(d_t) + width + width + comp_w,), layers=[width],
                    activations="selu", kernel_initializer="lecun_normal",
                    bias_initializer="lecun_normal")
                for d_t in g.DIM_NODE_LABEL]
        ot = MLP(input_dim=(width,), layers=[2], activations="softmax",
                 kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        cgnn = CompositeGNNnodeBased(nets, ot, 0, 4, 0.01)
        cgnn.build(seed=5)
        cgnn.compile(optimizer="sgd:0.1", loss="mse", average_st_grads=average_st_grads)
        return cgnn

    def test_unstack_roundtrips_stack(self):
        from gnnkeras_tpu.parallel.expert import unstack_expert_params

        g = composite_graph(seed=9)
        batch = from_graph_object(g)
        cg = self._model(g)
        lw = [int(d) for d in batch.dim_node_label]
        sp, ss, _ = stack_expert_params(
            cg.net_state, cg.variables["params"]["net_state"],
            cg.variables["state"]["net_state"], 8, label_widths=lw,
        )
        p_back, s_back = unstack_expert_params(cg.net_state, sp, ss, label_widths=lw)
        for a, b in zip(jax.tree_util.tree_leaves(cg.variables["params"]["net_state"]),
                        jax.tree_util.tree_leaves(p_back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
        for a, b in zip(jax.tree_util.tree_leaves(cg.variables["state"]["net_state"]),
                        jax.tree_util.tree_leaves(s_back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)

    def test_fit_syncs_experts_into_wrapped_model(self, mesh4):
        """Regression: fit() wrote back only the output head — the wrapped
        model kept its INITIAL expert weights, so cgnn.save()/predict() after
        EP training served an untrained state net."""
        from gnnkeras_tpu.data.sequencers import CompositeMultiGraphSequencer
        from gnnkeras_tpu.graph.graph import CompositeGraphObject

        # same per-type label dims across graphs (merge requires it): jitter
        # one base graph's node features per copy
        base = composite_graph(seed=11)
        graphs = []
        for s in range(4):
            g = base.copy()
            g.nodes = g.nodes + 0.1 * np.random.default_rng(s).normal(size=g.nodes.shape)
            graphs.append(g)
        cg = self._model(graphs[0])
        before = jax.tree_util.tree_map(np.asarray, cg.variables["params"]["net_state"])
        ep = ExpertParallelCompositeGNN(cg, mesh4)
        seq = CompositeMultiGraphSequencer(graphs, "n", "average", batch_size=2,
                                           shuffle=False, pad_multiple=16)
        ep.fit(seq, epochs=1, verbose=0)
        after = cg.variables["params"]["net_state"]
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after))
        )
        assert changed, "trained expert weights must reach the wrapped model"
        # and the wrapped model's own forward now agrees with the wrapper's
        batch = seq[0]
        _, _, out_w, _ = ep.forward(batch, training=False)
        _, _, out_m, _, _ = cg.forward(cg.variables, batch, training=False)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_w), rtol=1e-5, atol=1e-6)

    def test_ep_step_matches_single_device_average_st_grads(self, mesh4):
        """average_st_grads (reference GNN.py:295: state grads / k) must be
        honored by the EP step; SGD makes the scaling observable."""
        from gnnkeras_tpu.training.trainer import _get_train_step

        g = composite_graph(seed=17)
        batch = from_graph_object(g)
        rng = jax.random.PRNGKey(33)

        cg1 = self._model(g, average_st_grads=True)
        cg1._opt_state = cg1.optimizer.init(cg1.variables["params"])
        # the step donates its inputs — snapshot what we restack with later
        bn_state_snapshot = jax.tree_util.tree_map(np.asarray, cg1.variables["state"]["net_state"])
        step1 = _get_train_step(cg1)
        params1, _, _, logs1 = step1(
            cg1.variables["params"], cg1.variables["state"], cg1._opt_state, batch, rng
        )

        cg2 = self._model(g, average_st_grads=True)
        ep = ExpertParallelCompositeGNN(cg2, mesh4)
        ep._ensure_stacked(batch)
        opt_e = cg2.optimizer.init(ep.stacked_params)
        out_p = cg2.variables["params"]["net_output"]
        out_s = cg2.variables["state"]["net_output"]
        opt_o = cg2.optimizer.init(out_p)
        step2 = ep.make_train_step(opt_e, opt_o)
        sparams, _, out_p2, _, _, _, logs2 = step2(
            ep.stacked_params, ep.stacked_state, out_p, out_s, opt_e, opt_o,
            ep._nodes_by_type(batch), ep._type_masks(batch), batch, rng
        )
        assert float(logs2["k"]) > 1.0  # scaling actually in play
        restacked, _, _ = stack_expert_params(
            cg1.net_state, params1["net_state"],
            bn_state_snapshot, ep.types_pad,
            label_widths=[int(d) for d in batch.dim_node_label],
        )
        for a, b in zip(jax.tree_util.tree_leaves(restacked), jax.tree_util.tree_leaves(sparams)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(params1["net_output"]),
                        jax.tree_util.tree_leaves(out_p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
