"""Tensor parallelism (model-axis feature sharding) on the virtual 8-device
CPU mesh: the sharded state-MLP must reproduce the single-device MLP and the
TP train step must match the single-device train step (SURVEY §2 parallelism
mapping; no reference counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNnodeBased, GNNgraphBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
from gnnkeras_tpu.parallel.mesh import make_mesh
from gnnkeras_tpu.parallel.tensor_parallel import TensorParallelGNN, TensorParallelMLP

from jax import shard_map
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8
    return make_mesh(("model",))


def big_graph(seed=0, n=60, a=300, dn=3, da=2, T=2):
    rng = np.random.default_rng(seed)
    nodes = rng.normal(size=(n, dn))
    arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, da))], axis=1)
    return GraphObject(
        nodes=nodes, arcs=arcs, targets=rng.normal(size=(n, T)), focus="n", aggregation_mode="average"
    )


def build_gnn(cls=GNNnodeBased, focus="n", dn=3, da=2, T=2, hidden=None, max_iter=4):
    inp_s, layers_s = get_inout_dims("state", dn, da, T, focus, 0, hidden_units=hidden)
    inp_o, layers_o = get_inout_dims("output", dn, da, T, focus, 0)
    net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    gnn = cls(net_st, net_out, 0, max_iter, 0.01)
    gnn.build(seed=3)
    return gnn


class TestTPMLP:
    @pytest.mark.parametrize("hidden", [None, [16], [16, 24]])
    @pytest.mark.parametrize("training", [False, True])
    def test_sharded_mlp_matches_full(self, mesh8, hidden, training):
        """Column/row-split apply inside shard_map == plain apply, both for
        a single Dense (gathered output) and multi-layer stacks."""
        layers = (hidden or []) + [14]
        mlp = MLP(input_dim=(11,), layers=layers, activations="selu",
                  kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        variables = mlp.init(jax.random.PRNGKey(0))
        x = np.random.default_rng(1).normal(size=(40, 11)).astype(np.float32)
        mask = np.ones(40, bool)

        ref, ref_state = mlp.apply(variables, jnp.asarray(x), training=training, mask=jnp.asarray(mask))

        tp = TensorParallelMLP(mlp, 8, "model")
        stacked = tp.shard_variables(variables)

        def device_fn(stacked_local, x, mask):
            local = jax.tree_util.tree_map(lambda v: v[0], stacked_local)
            out, _ = tp.apply(local, x, training=training, mask=mask)
            return out

        fn = shard_map(device_fn, mesh=mesh8, in_specs=(P("model"), P(), P()),
                       out_specs=P(), check_vma=False)
        out = jax.jit(fn)(stacked, jnp.asarray(x), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_roundtrip_shard_gather(self):
        mlp = MLP(input_dim=(9,), layers=[13, 7], activations="relu")
        variables = mlp.init(jax.random.PRNGKey(4))
        tp = TensorParallelMLP(mlp, 8)
        back = tp.gather_variables(tp.shard_variables(variables))
        for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


class TestTPGNN:
    def test_tp_forward_matches_single(self, mesh8):
        g = big_graph(seed=2)
        gnn = build_gnn(hidden=[16])
        batch = from_graph_object(g)
        k_ref, state_ref, out_ref, _, _ = gnn.forward(gnn.variables, batch, training=False)

        tp = TensorParallelGNN(gnn, mesh8)
        k, state, out = tp.forward(batch, training=False)
        assert float(k) == float(k_ref)
        np.testing.assert_allclose(np.asarray(state), np.asarray(state_ref), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-5, atol=1e-6)

    def test_tp_forward_matches_single_random_state_and_dropout(self, mesh8):
        """dim_state>0 random init + output-head dropout under training=True:
        TP must reproduce the single-device key chain exactly — rng splits
        into (loop, out), the loop key drives the state init and per-step
        keys, the OUT key drives the readout dropout (regression: the readout
        reused the last step's already-consumed key).  Dropout lives in the
        replicated output net only — masks over the SHARDED state features
        are drawn per-shard and cannot be bit-compared."""
        ds = 6
        inp_s, layers_s = get_inout_dims("state", 3, 2, 2, "n", ds)
        inp_o, layers_o = get_inout_dims("output", 3, 2, 2, "n", ds)
        net_st = MLP(input_dim=inp_s[0], layers=[16] + list(layers_s),
                     activations=["selu"] * (1 + len(layers_s)),
                     kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        net_out = MLP(input_dim=inp_o[0], layers=[8] + list(layers_o),
                      activations=["selu"] * len(layers_o) + ["softmax"],
                      dropout_rate=0.4, dropout_pos=1,
                      kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        gnn = GNNnodeBased(net_st, net_out, ds, 4, 0.01)
        gnn.build(seed=3)
        batch = from_graph_object(big_graph(seed=5))
        rng = jax.random.PRNGKey(11)
        k_ref, state_ref, out_ref, _, _ = gnn.forward(gnn.variables, batch, training=True, rng=rng)

        tp = TensorParallelGNN(gnn, mesh8)
        k, state, out = tp.forward(batch, training=True, rng=rng)
        assert float(k) == float(k_ref)
        # atol 5e-6: the column-split matmul sums partials in a different
        # order (f32), amplified across 4 BN+selu iterations
        np.testing.assert_allclose(np.asarray(state), np.asarray(state_ref), rtol=1e-4, atol=5e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-4, atol=5e-6)

    def test_tp_train_step_matches_single(self, mesh8):
        from gnnkeras_tpu.training.trainer import _get_train_step

        g = big_graph(seed=3)

        def fresh():
            gnn = build_gnn(hidden=[16])
            # sgd: the update is proportional to the grad, so float
            # reassociation noise stays small (Adam's first step is
            # ±lr·sign(g), which flips on near-zero grads)
            gnn.compile(optimizer="sgd:0.1", loss="mse")
            gnn.build(seed=3)
            gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])
            return gnn

        rng = jax.random.PRNGKey(7)
        batch = from_graph_object(big_graph(seed=3))

        gnn1 = fresh()
        step1 = _get_train_step(gnn1)
        params1, _, _, logs1 = step1(
            gnn1.variables["params"], gnn1.variables["state"], gnn1._opt_state, batch, rng
        )
        loss1 = float(logs1["loss_sum"]) / float(logs1["count"])

        gnn2 = fresh()
        tp = TensorParallelGNN(gnn2, mesh8)
        stacked = tp.shard_variables(gnn2.variables)
        opt_state = jax.vmap(gnn2.optimizer.init)(stacked["params"])
        step2 = tp.make_train_step()
        params2, mstate2, _, logs2 = step2(stacked["params"], stacked["state"], opt_state, batch, rng)
        assert float(logs2["loss"]) == pytest.approx(loss1, rel=1e-5)

        full2 = tp.gather_variables({"params": params2, "state": mstate2})
        for a, b in zip(jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(full2["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_tp_fit_learns(self, mesh8):
        g = big_graph(seed=5)
        gnn = build_gnn(hidden=[16])
        gnn.compile(optimizer="adam:0.01", loss="mse")
        batch = from_graph_object(g)
        tp = TensorParallelGNN(gnn, mesh8)
        h = tp.fit(batch, epochs=8, verbose=0)
        assert h["loss"][-1] < h["loss"][0]
        # weights written back gathered: the plain engine can keep using them
        _, _, out, _, _ = gnn.forward(gnn.variables, batch, training=False)
        assert np.all(np.isfinite(np.asarray(out)))


class TestHybridTP:
    def test_three_axis_step_matches_single_device(self):
        """data(1) x graph(4) x model(2) hybrid-TP step == the single-device
        SGD train step (the full 3-axis composition the dryrun compiles)."""
        from gnnkeras_tpu.parallel.hybrid import make_hybrid_train_step, stack_partitioned
        from gnnkeras_tpu.parallel.partition import PartitionedGNN, partition_graph
        from gnnkeras_tpu.training.trainer import _get_train_step

        g = big_graph(seed=9)
        rng = jax.random.PRNGKey(23)

        def fresh():
            gnn = build_gnn(hidden=[16])
            gnn.compile(optimizer="sgd:0.1", loss="mse")
            gnn.build(seed=3)
            gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])
            return gnn

        gnn1 = fresh()
        batch = from_graph_object(g)
        step1 = _get_train_step(gnn1)
        params1, _, _, logs1 = step1(
            gnn1.variables["params"], gnn1.variables["state"], gnn1._opt_state, batch, rng
        )
        loss1 = float(logs1["loss_sum"]) / float(logs1["count"])

        gnn2 = fresh()
        mesh = make_mesh(("data", "graph", "model"), shape=(1, 4, 2))
        pgnn = PartitionedGNN(gnn2, mesh, tp_shards=2)
        stacked_vars = pgnn.shard_tp_variables(gnn2.variables)
        opt_state = gnn2.optimizer.init(stacked_vars["params"])
        step2 = make_hybrid_train_step(pgnn, mesh, opt_template=opt_state)
        pg = partition_graph(g, 4)
        stacked_pg = stack_partitioned([pg])
        # the hybrid step folds in the data index; reproduce the same rng the
        # single-device step saw is impossible via fold_in, but with no
        # dropout and dim_state=0 the rng is inert.
        params2, mstate2, _, logs2 = step2(
            stacked_vars["params"], stacked_vars["state"], opt_state, stacked_pg, rng
        )
        assert float(logs2["loss"]) == pytest.approx(loss1, rel=1e-5)
        full2 = pgnn.gather_tp_variables({"params": params2, "state": mstate2})
        for a, b in zip(
            jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(full2["params"])
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
