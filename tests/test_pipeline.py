"""Pipeline parallelism (GPipe over LGNN layers) on the virtual 8-device CPU
mesh: the pipelined step must reproduce the single-device parallel-mode LGNN
train step exactly (SURVEY §2 parallelism mapping; no reference
counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNgraphBased, GNNnodeBased
from gnnkeras_tpu.models.lgnn import LGNN
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.parallel.mesh import make_mesh
from gnnkeras_tpu.parallel.pipeline import PipelineLGNN

DS = 4  # dim_state > 0: the homogeneous-stage requirement


def graphs_batch(seed=0, n_graphs=12, dn=3, da=2, T=2, focus="g", dense_blocks=False):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n, a = int(rng.integers(6, 12)), int(rng.integers(10, 20))
        nodes = rng.normal(size=(n, dn))
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, da))], axis=1)
        if focus == "g":
            t = np.zeros((1, T))
            t[0, rng.integers(T)] = 1
        elif focus == "a":
            g_tmp = GraphObject(nodes=nodes, arcs=arcs, targets=np.ones((1, 1)), focus="g")
            arcs = g_tmp.arcs
            t = rng.normal(size=(arcs.shape[0], T))
        else:
            t = rng.normal(size=(n, T))
        graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=t, focus=focus, aggregation_mode="average"))
    merged = GraphObject.merge(graphs, focus=focus, aggregation_mode="average")
    return from_graph_object(merged, pad_nodes=256, pad_arcs=512, pad_graphs=16,
                             dense_blocks=dense_blocks)


def build_lgnn(layers=4, dn=3, da=2, T=2, focus="g", bn=True, get_state=True, get_output=True,
               per_iteration_bn=False):
    from gnnkeras_tpu.models.gnn import GNNarcBased

    cls = {"g": GNNgraphBased, "n": GNNnodeBased, "a": GNNarcBased}[focus]
    gnns = []
    for i in range(layers):
        inp_s, layers_s = get_inout_dims("state", dn, da, T, focus, DS,
                                         layer=i, get_state=get_state, get_output=get_output)
        inp_o, layers_o = get_inout_dims("output", dn, da, T, focus, DS,
                                         layer=i, get_state=get_state, get_output=get_output)
        net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                     kernel_initializer="lecun_normal", bias_initializer="lecun_normal",
                     batch_normalization=bn)
        net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                      kernel_initializer="glorot_normal", bias_initializer="glorot_normal",
                      batch_normalization=bn)
        gnns.append(cls(net_st, net_out, DS, 3, 0.01, per_iteration_bn=per_iteration_bn))
    lgnn = LGNN(gnns, get_state, get_output)
    lgnn.compile(optimizer="sgd:0.1", loss="categorical_crossentropy", training_mode="parallel")
    lgnn.build(seed=7)
    return lgnn


@pytest.fixture(scope="module")
def mesh4():
    return make_mesh(("stage",), devices=jax.devices()[:4])


class TestPipelineStackUnstack:
    def test_roundtrip(self, mesh4):
        lgnn = build_lgnn(layers=4)
        pp = PipelineLGNN(lgnn, mesh4)
        stacked = pp.stack_variables()
        back = pp.unstack_variables(stacked)
        for a, b in zip(jax.tree_util.tree_leaves(lgnn.variables), jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_padded_layer0_is_inert(self, mesh4):
        """Layer-0 compute through the padded params on a zero-prop-augmented
        batch equals the original layer-0 compute."""
        lgnn = build_lgnn(layers=4)
        pp = PipelineLGNN(lgnn, mesh4)
        batch = graphs_batch()
        stacked = pp.stack_variables()
        vars0_pad = jax.tree_util.tree_map(lambda v: v[0], stacked)

        rng = jax.random.PRNGKey(5)
        rng_, rng_loop, rng_out = jax.random.split(rng, 3)
        k_ref, state_ref, _ = lgnn.gnns[0].unfold(
            {"params": lgnn.variables["params"]["gnns"][0],
             "state": lgnn.variables["state"]["gnns"][0]},
            batch, training=True, rng=rng_loop)

        prop0 = {
            "node": jnp.zeros((batch.num_nodes, pp.prop_node)),
            "arc": jnp.zeros((batch.arc_label.shape[0], pp.prop_arc)),
        }
        cur = pp._augment(batch, prop0, True)
        k, state, _ = pp.proto.unfold(vars0_pad, cur, training=True, rng=rng_loop)
        assert float(k) == float(k_ref)
        np.testing.assert_allclose(np.asarray(state), np.asarray(state_ref), rtol=1e-5, atol=1e-6)


class TestPipelineStep:
    def test_m1_matches_single_device_step(self, mesh4):
        """One pipeline step with a single microbatch == the single-device
        parallel-mode LGNN train step (loss and updated params, SGD)."""
        from gnnkeras_tpu.training.trainer import _get_train_step

        batch = graphs_batch(seed=3)
        rng = jax.random.PRNGKey(11)

        lgnn1 = build_lgnn(layers=4)
        lgnn1._opt_state = lgnn1.optimizer.init(lgnn1.variables["params"])
        step1 = _get_train_step(lgnn1)
        params1, _, _, logs1 = step1(
            lgnn1.variables["params"], lgnn1.variables["state"], lgnn1._opt_state, batch, rng
        )
        loss1 = float(logs1["loss_sum"]) / float(logs1["count"])

        lgnn2 = build_lgnn(layers=4)
        pp = PipelineLGNN(lgnn2, mesh4)
        stacked = pp.stack_variables()
        svp, svs = stacked["params"], stacked["state"]
        opt_state = jax.vmap(lgnn2.optimizer.init)(svp)
        svp, svs, opt_state, logs2 = pp.train_step(svp, svs, opt_state, [batch], rng)
        assert float(logs2["loss"]) == pytest.approx(loss1, rel=1e-5)

        full2 = pp.unstack_variables({"params": svp, "state": svs})
        for a, b in zip(
            jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(full2["params"])
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_m3_matches_grad_average(self, mesh4):
        """Three microbatches through the pipeline == SGD on the averaged
        per-microbatch gradients (BN off so batch statistics don't couple the
        comparison)."""
        rng = jax.random.PRNGKey(13)
        batches = [graphs_batch(seed=20 + i) for i in range(3)]

        lgnn1 = build_lgnn(layers=4, bn=False)
        from gnnkeras_tpu.training.losses import masked_mean

        def objective(params, batch, r):
            variables = {"params": params, "state": lgnn1.variables["state"]}
            ks, _, outs, _, _ = lgnn1.forward(variables, batch, training=True, rng=r)
            return sum(
                masked_mean(lgnn1.loss(batch.targets, out), batch.target_mask, batch.sample_weight)
                for out in outs
            ) / len(outs) + lgnn1.regularization_loss(params)

        keys = jax.random.split(rng, 3)
        grads = [
            jax.grad(objective)(lgnn1.variables["params"], b, k) for b, k in zip(batches, keys)
        ]
        mean_grads = jax.tree_util.tree_map(lambda *g: sum(g) / len(g), *grads)
        params_ref = jax.tree_util.tree_map(
            lambda p, g: p - 0.1 * g, lgnn1.variables["params"], mean_grads
        )

        lgnn2 = build_lgnn(layers=4, bn=False)
        pp = PipelineLGNN(lgnn2, mesh4)
        stacked = pp.stack_variables()
        svp, svs = stacked["params"], stacked["state"]
        opt_state = jax.vmap(lgnn2.optimizer.init)(svp)
        svp, svs, _, logs = pp.train_step(svp, svs, opt_state, batches, rng)
        full2 = pp.unstack_variables({"params": svp, "state": svs})
        for a, b in zip(
            jax.tree_util.tree_leaves(params_ref), jax.tree_util.tree_leaves(full2["params"])
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_pipeline_fit_learns(self, mesh4):
        lgnn = build_lgnn(layers=4)
        pp = PipelineLGNN(lgnn, mesh4)
        mbs = [graphs_batch(seed=30 + i) for i in range(2)]
        h = pp.fit([mbs], epochs=6, verbose=0)
        assert h["loss"][-1] < h["loss"][0]

    def test_node_focus_pipeline(self, mesh4):
        from gnnkeras_tpu.training.trainer import _get_train_step

        batch = graphs_batch(seed=5, focus="n")
        rng = jax.random.PRNGKey(17)

        lgnn1 = build_lgnn(layers=4, focus="n")
        lgnn1.compile(optimizer="sgd:0.1", loss="mse", training_mode="parallel")
        lgnn1._opt_state = lgnn1.optimizer.init(lgnn1.variables["params"])
        step1 = _get_train_step(lgnn1)
        _, _, _, logs1 = step1(
            lgnn1.variables["params"], lgnn1.variables["state"], lgnn1._opt_state, batch, rng
        )
        loss1 = float(logs1["loss_sum"]) / float(logs1["count"])

        lgnn2 = build_lgnn(layers=4, focus="n")
        lgnn2.compile(optimizer="sgd:0.1", loss="mse", training_mode="parallel")
        lgnn2.build(seed=7)
        pp = PipelineLGNN(lgnn2, mesh4)
        stacked = pp.stack_variables()
        svp, svs = stacked["params"], stacked["state"]
        opt_state = jax.vmap(lgnn2.optimizer.init)(svp)
        _, _, _, logs2 = pp.train_step(svp, svs, opt_state, [batch], rng)
        assert float(logs2["loss"]) == pytest.approx(loss1, rel=1e-5)

    def test_arc_focus_pipeline(self, mesh4):
        """Arc-focused stacks: the propagated output rides the ARC labels
        (update_graph, LGNN.py:211) — exact M=1 step parity incl. params."""
        from gnnkeras_tpu.training.trainer import _get_train_step

        batch = graphs_batch(seed=9, focus="a")
        rng = jax.random.PRNGKey(23)

        def fresh():
            lgnn = build_lgnn(layers=4, focus="a")
            lgnn.compile(optimizer="sgd:0.1", loss="mse", training_mode="parallel")
            lgnn.build(seed=7)
            return lgnn

        lgnn1 = fresh()
        lgnn1._opt_state = lgnn1.optimizer.init(lgnn1.variables["params"])
        step1 = _get_train_step(lgnn1)
        params1, _, _, logs1 = step1(
            lgnn1.variables["params"], lgnn1.variables["state"], lgnn1._opt_state, batch, rng
        )
        loss1 = float(logs1["loss_sum"]) / float(logs1["count"])

        lgnn2 = fresh()
        pp = PipelineLGNN(lgnn2, mesh4, node_label_dim=3)
        stacked = pp.stack_variables()
        svp, svs = stacked["params"], stacked["state"]
        opt_state = jax.vmap(lgnn2.optimizer.init)(svp)
        svp, svs, _, logs2 = pp.train_step(svp, svs, opt_state, [batch], rng)
        assert float(logs2["loss"]) == pytest.approx(loss1, rel=1e-5)
        full2 = pp.unstack_variables({"params": svp, "state": svs})
        for a, b in zip(
            jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(full2["params"])
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


class TestPipelineAvgStGrads:
    def test_m1_avg_st_grads_matches_single(self, mesh4):
        """average_st_grads (reference starter LGNN config): exact step
        parity at M=1 (per-layer k is exact; M>1 uses the stage mean-k)."""
        from gnnkeras_tpu.training.trainer import _get_train_step

        batch = graphs_batch(seed=7)
        rng = jax.random.PRNGKey(31)

        def fresh():
            lgnn = build_lgnn(layers=4)
            lgnn.compile(optimizer="sgd:0.1", loss="categorical_crossentropy",
                         training_mode="parallel", average_st_grads=True)
            lgnn.build(seed=7)
            return lgnn

        lgnn1 = fresh()
        lgnn1._opt_state = lgnn1.optimizer.init(lgnn1.variables["params"])
        step1 = _get_train_step(lgnn1)
        params1, _, _, logs1 = step1(
            lgnn1.variables["params"], lgnn1.variables["state"], lgnn1._opt_state, batch, rng
        )

        lgnn2 = fresh()
        pp = PipelineLGNN(lgnn2, mesh4)
        stacked = pp.stack_variables()
        svp, svs = stacked["params"], stacked["state"]
        opt_state = jax.vmap(lgnn2.optimizer.init)(svp)
        svp, svs, _, logs2 = pp.train_step(svp, svs, opt_state, [batch], rng)
        full2 = pp.unstack_variables({"params": svp, "state": svs})
        for a, b in zip(
            jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(full2["params"])
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


class TestUnequalMicrobatches:
    def test_objective_is_full_batch_mean(self, mesh4):
        """Microbatches with unequal supervised-row counts: the pipeline
        objective must weight rows equally (masked SUMS combined across
        microbatches), not average per-microbatch means."""
        from gnnkeras_tpu.training.losses import get_loss

        rng = jax.random.PRNGKey(23)
        mbs = [graphs_batch(seed=40, n_graphs=12), graphs_batch(seed=41, n_graphs=4)]
        # NON-UNIT sample weights: with sw==1 the masked_mean denominator Σm
        # and the (wrong) Σ(sw·m) coincide and the test cannot tell them apart
        mbs[1] = mbs[1].replace(sample_weight=mbs[1].sample_weight * 2.0)

        lgnn1 = build_lgnn(layers=4, bn=False)
        loss_fn = lgnn1.loss
        keys = jax.random.split(rng, 2)
        mstate = lgnn1.variables["state"]

        def obj(params):
            # the single-device masked_mean convention (losses.py):
            # Σ(per·sw·mask) / Σmask, combined across microbatches
            L = len(lgnn1.gnns)
            num = [0.0] * L
            den = [0.0] * L
            for m, batch in enumerate(mbs):
                _, _, outs, _, _ = lgnn1.forward(
                    {"params": params, "state": mstate}, batch, training=True, rng=keys[m]
                )
                msk = batch.target_mask.astype(batch.sample_weight.dtype)
                w = batch.sample_weight * msk
                for i, out in enumerate(outs):
                    num[i] = num[i] + jnp.sum(loss_fn(batch.targets, out) * w)
                    den[i] = den[i] + jnp.sum(msk)
            return sum(n / d for n, d in zip(num, den)) / L

        grads_ref = jax.grad(obj)(lgnn1.variables["params"])
        params_ref = jax.tree_util.tree_map(
            lambda p, g: p - 0.1 * g, lgnn1.variables["params"], grads_ref
        )

        lgnn2 = build_lgnn(layers=4, bn=False)
        pp = PipelineLGNN(lgnn2, mesh4)
        stacked = pp.stack_variables()
        svp, svs = stacked["params"], stacked["state"]
        opt_state = jax.vmap(lgnn2.optimizer.init)(svp)
        svp, svs, _, logs = pp.train_step(svp, svs, opt_state, mbs, rng)
        got = pp.unstack_variables({"params": svp, "state": svs})["params"]
        for a, b in zip(jax.tree_util.tree_leaves(params_ref), jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


class TestPipelinePerIterationBN:
    """per_iteration_bn × pipeline (VERDICT r3 stretch): the width padding is
    axis-aware, so per-iteration BN state ((K, f) leaves) stacks and pads
    cleanly and the pipeline step equals the single-device step."""

    def test_m1_matches_single_device_step(self, mesh4):
        from gnnkeras_tpu.training.trainer import _get_train_step

        batch = graphs_batch(seed=9)
        rng = jax.random.PRNGKey(13)

        lgnn1 = build_lgnn(layers=4, per_iteration_bn=True)
        lgnn1._opt_state = lgnn1.optimizer.init(lgnn1.variables["params"])
        step1 = _get_train_step(lgnn1)
        params1, state1, _, logs1 = step1(
            lgnn1.variables["params"], lgnn1.variables["state"], lgnn1._opt_state, batch, rng
        )
        loss1 = float(logs1["loss_sum"]) / float(logs1["count"])

        lgnn2 = build_lgnn(layers=4, per_iteration_bn=True)
        pp = PipelineLGNN(lgnn2, mesh4)
        stacked = pp.stack_variables()
        # roundtrip sanity: per-iteration BN leaves survive stack/unstack
        back = pp.unstack_variables(stacked)
        for a, b in zip(jax.tree_util.tree_leaves(lgnn2.variables),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        svp, svs = stacked["params"], stacked["state"]
        opt_state = jax.vmap(lgnn2.optimizer.init)(svp)
        svp, svs, opt_state, logs2 = pp.train_step(svp, svs, opt_state, [batch], rng)
        assert float(logs2["loss"]) == pytest.approx(loss1, rel=1e-5)

        full2 = pp.unstack_variables({"params": svp, "state": svs})
        for a, b in zip(
            jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(full2["params"])
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
        # the trained per-iteration BN moments match too
        for a, b in zip(
            jax.tree_util.tree_leaves(state1), jax.tree_util.tree_leaves(full2["state"])
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
