"""Numerical parity of the convergence engine against a NumPy oracle.

The oracle transcribes the reference's convergence step literally
(condition GNN.py:196-214, update GNN.py:217-236) in NumPy; the model must
match it per-iteration, and the training (scan) and inference (while_loop)
paths must agree with each other and be invariant to padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.graph.batch import from_graph_object
from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.models.gnn import GNNarcBased, GNNgraphBased, GNNnodeBased
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims


def _selu(x):
    alpha, scale = 1.6732632423543772, 1.0507009873554805
    return scale * np.where(x > 0, x, alpha * (np.exp(x) - 1))


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def _np_mlp(params, x, act):
    for p in params:
        if "kernel" in p:
            x = act(x @ np.asarray(p["kernel"]) + np.asarray(p["bias"]))
    return x


def build_gnn(model_cls, dn=3, da=2, T=2, max_iter=10, threshold=0.01, focus="n"):
    inp_s, layers_s = get_inout_dims("state", dn, da, T, focus, 0)
    inp_o, layers_o = get_inout_dims("output", dn, da, T, focus, 0)
    net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal",
                 batch_normalization=False)
    net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal",
                  batch_normalization=False)
    gnn = model_cls(net_st, net_out, 0, max_iter, threshold)
    gnn.build(seed=3)
    return gnn


def rand_graph(seed=0, n=6, a=12, dn=3, da=2, T=2, focus="n", mode="average"):
    rng = np.random.default_rng(seed)
    nodes = rng.normal(size=(n, dn))
    arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, da))], axis=1)
    if focus == "g":
        targets = np.eye(T)[[0]]
    elif focus == "a":
        targets = rng.normal(size=(len(np.unique(arcs[:, :2], axis=0)), T))
    else:
        targets = rng.normal(size=(n, T))
    g = GraphObject(nodes=nodes, arcs=arcs, targets=np.atleast_2d(targets), focus=focus, aggregation_mode=mode)
    if focus == "a" and g.targets.shape[0] != g.arcs.shape[0]:
        # arcs were deduped: regenerate targets to match
        g = GraphObject(nodes=nodes, arcs=g.arcs, targets=rng.normal(size=(g.arcs.shape[0], T)),
                        focus=focus, aggregation_mode=mode)
    return g


def oracle_unfold(gnn, g, record=False):
    """Literal NumPy transcription of GNN.Loop (reference GNN.py:245-274)
    for dim_state == 0, BN-free MLPs."""
    n = g.nodes.shape[0]
    src = g.arcs[:, 0].astype(int)
    dst = g.arcs[:, 1].astype(int)
    w = g.arcnode_weight.astype(np.float64)
    arc_labels = g.arcs[:, 2:]

    agg_arcs = np.zeros((n, arc_labels.shape[1]))
    np.add.at(agg_arcs, dst, arc_labels * w[:, None])

    params = gnn.variables["params"]["net_state"]
    state = g.nodes.astype(np.float64).copy()
    state_old = np.ones_like(state)
    k = 0
    traj = [state.copy()]
    while True:
        dist = np.sqrt(np.sum((state - state_old) ** 2, axis=1))
        norm = np.sqrt(np.sum(state_old**2, axis=1))
        if not (np.any(dist > gnn.state_threshold * norm) and k < gnn.max_iteration):
            break
        agg_state = np.zeros_like(state)
        np.add.at(agg_state, dst, state[src] * w[:, None])
        inp = np.concatenate([state, agg_state, np.zeros((n, 0)), agg_arcs], axis=1)
        state_old, state = state, _np_mlp(params, inp, _selu)
        k += 1
        traj.append(state.copy())
    return k, state, traj


class TestOracleParity:
    @pytest.mark.parametrize("mode", ["sum", "average", "normalized"])
    @pytest.mark.parametrize("training", [False, True])
    def test_state_matches_oracle(self, mode, training):
        g = rand_graph(seed=1, mode=mode)
        gnn = build_gnn(GNNnodeBased)
        k_ref, state_ref, _ = oracle_unfold(gnn, g)
        batch = from_graph_object(g, pad_nodes=16, pad_arcs=24)
        k, state, _ = gnn.unfold(gnn.variables, batch, training=training)
        assert float(k) == k_ref
        np.testing.assert_allclose(np.asarray(state)[: g.nodes.shape[0]], state_ref, rtol=1e-4, atol=1e-5)

    def test_training_and_inference_paths_agree(self):
        g = rand_graph(seed=2)
        gnn = build_gnn(GNNnodeBased)
        batch = from_graph_object(g, pad_nodes=16, pad_arcs=24)
        k_t, s_t, _ = gnn.unfold(gnn.variables, batch, training=True)
        k_i, s_i, _ = gnn.unfold(gnn.variables, batch, training=False)
        assert float(k_t) == float(k_i)
        np.testing.assert_allclose(np.asarray(s_t), np.asarray(s_i), rtol=1e-6)

    def test_padding_invariance(self):
        g = rand_graph(seed=3)
        gnn = build_gnn(GNNnodeBased)
        b1 = from_graph_object(g, pad_nodes=8, pad_arcs=16)
        b2 = from_graph_object(g, pad_nodes=64, pad_arcs=128)
        k1, s1, _ = gnn.unfold(gnn.variables, b1, training=True)
        k2, s2, _ = gnn.unfold(gnn.variables, b2, training=True)
        assert float(k1) == float(k2)
        np.testing.assert_allclose(
            np.asarray(s1)[: g.nodes.shape[0]], np.asarray(s2)[: g.nodes.shape[0]], rtol=1e-5, atol=1e-6
        )

    def test_max_iteration_caps(self):
        g = rand_graph(seed=4)
        gnn = build_gnn(GNNnodeBased, max_iter=2, threshold=0.0)
        batch = from_graph_object(g)
        k, _, _ = gnn.unfold(gnn.variables, batch, training=True)
        assert float(k) == 2.0

    def test_node_output_matches_oracle(self):
        g = rand_graph(seed=5)
        gnn = build_gnn(GNNnodeBased)
        _, state_ref, _ = oracle_unfold(gnn, g)
        out_ref = _np_mlp(gnn.variables["params"]["net_output"], state_ref, _softmax)

        batch = from_graph_object(g)
        _, _, out, mask, _ = gnn.forward(gnn.variables, batch, training=False)
        np.testing.assert_allclose(np.asarray(out)[: g.nodes.shape[0]], out_ref, rtol=1e-4, atol=1e-5)

    def test_arc_output_matches_oracle(self):
        g = rand_graph(seed=6, focus="a")
        gnn = build_gnn(GNNarcBased, focus="a")
        _, state_ref, _ = oracle_unfold(gnn, g)
        src, dst = g.arcs[:, 0].astype(int), g.arcs[:, 1].astype(int)
        arc_in = np.concatenate([state_ref[src], state_ref[dst], g.arcs[:, 2:]], axis=1)
        out_ref = _np_mlp(gnn.variables["params"]["net_output"], arc_in, _softmax)

        batch = from_graph_object(g)
        _, _, out, mask, _ = gnn.forward(gnn.variables, batch, training=False)
        np.testing.assert_allclose(np.asarray(out)[: g.arcs.shape[0]], out_ref, rtol=1e-4, atol=1e-5)

    def test_graph_output_matches_oracle(self):
        g = rand_graph(seed=7, focus="g")
        gnn = build_gnn(GNNgraphBased, focus="g")
        _, state_ref, _ = oracle_unfold(gnn, g)
        node_out = _np_mlp(gnn.variables["params"]["net_output"], state_ref, _softmax)
        out_ref = node_out.mean(axis=0, keepdims=True)

        batch = from_graph_object(g)
        _, _, out, mask, _ = gnn.forward(gnn.variables, batch, training=False)
        np.testing.assert_allclose(np.asarray(out)[:1], out_ref, rtol=1e-4, atol=1e-5)

    def test_gradients_flow_only_through_executed_iterations(self):
        """average_st_grads divides by the executed k; also sanity-check that
        grads are finite and nonzero through the scan."""
        g = rand_graph(seed=8, focus="n")
        gnn = build_gnn(GNNnodeBased)
        batch = from_graph_object(g)

        def loss_fn(params):
            variables = {"params": params, "state": gnn.variables["state"]}
            _, _, out, mask, _ = gnn.forward(variables, batch, training=True)
            return jnp.sum(jnp.where(mask[:, None], (out - batch.targets) ** 2, 0.0))

        grads = jax.grad(loss_fn)(gnn.variables["params"])
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
        assert any(np.any(np.asarray(x) != 0) for x in flat)
