"""Activation-level parity against the actual reference implementation.

Runs the reference (TensorFlow, /root/reference) and this framework on the
same graph with the same transplanted MLP weights and compares the converged
state, iteration count and model output — the BASELINE.md requirement
("per-iteration node-state activations allclose vs reference").

dim_state=0 keeps the reference deterministic (state init = node labels,
GNN/Models/GNN.py:259); BatchNorm is on (the reference default) so these
tests also pin masked-BN semantics end-to-end.
"""

import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, "/root/reference")

from GNN.Models.GNN import (  # noqa: E402  (reference import)
    GNNarcBased as RefGNNarc,
    GNNgraphBased as RefGNNgraph,
    GNNnodeBased as RefGNNnode,
)
from GNN.Models.MLP import MLP as RefMLP, get_inout_dims as ref_get_inout_dims  # noqa: E402
from GNN.graph_class import GraphObject as RefGraphObject, GraphTensor as RefGraphTensor  # noqa: E402

# Modern-scipy shim for the reference: its buildAdjacency passes a zip
# iterator as coo indices (graph_class.py:87-88), which scipy >= 1.11 rejects.
# Functionally identical replacement with materialized index arrays.
def _build_adjacency_shim(self):
    from scipy.sparse import coo_matrix

    values = self.ArcNode.data
    row = self.arcs[:, 0].astype(int)
    col = self.arcs[:, 1].astype(int)
    return coo_matrix((values, (row, col)), shape=(self.nodes.shape[0],) * 2, dtype=self.dtype)


RefGraphObject.buildAdjacency = _build_adjacency_shim

from gnnkeras_tpu.graph.batch import from_graph_object  # noqa: E402
from gnnkeras_tpu.graph.graph import GraphObject  # noqa: E402
from gnnkeras_tpu.models.gnn import GNNarcBased, GNNgraphBased, GNNnodeBased  # noqa: E402
from gnnkeras_tpu.models.mlp import MLP, get_inout_dims  # noqa: E402


def rand_graph_arrays(seed=0, n=7, a=14, dn=3, da=2, T=2, focus="n"):
    rng = np.random.default_rng(seed)
    nodes = rng.normal(size=(n, dn)).astype(np.float32)
    arcs = np.concatenate(
        [rng.integers(0, n, (a, 2)).astype(np.float32), rng.normal(size=(a, da)).astype(np.float32)], axis=1
    )
    arcs = np.unique(arcs, axis=0)
    if focus == "g":
        targets = np.eye(T, dtype=np.float32)[[0]]
    elif focus == "a":
        targets = rng.normal(size=(arcs.shape[0], T)).astype(np.float32)
    else:
        targets = rng.normal(size=(n, T)).astype(np.float32)
    return nodes, arcs, targets


def transplant_keras_to_ours(keras_model, ours: MLP, variables):
    import jax.numpy as jnp

    params = [dict(p) for p in variables["params"]]
    state = [dict(s) for s in variables["state"]]
    k_layers = list(keras_model.layers)
    ki = 0
    for idx, layer in enumerate(ours.program):
        if layer[0] == "dense":
            while not k_layers[ki].get_weights() or len(k_layers[ki].get_weights()) != 2:
                ki += 1
            w, b = k_layers[ki].get_weights()
            params[idx]["kernel"], params[idx]["bias"] = jnp.asarray(w), jnp.asarray(b)
            ki += 1
        elif layer[0] == "batch_norm":
            while len(k_layers[ki].get_weights()) != 4:
                ki += 1
            gamma, beta, mm, mv = k_layers[ki].get_weights()
            params[idx]["gamma"], params[idx]["beta"] = jnp.asarray(gamma), jnp.asarray(beta)
            state[idx]["moving_mean"], state[idx]["moving_var"] = jnp.asarray(mm), jnp.asarray(mv)
            ki += 1
    return {"params": params, "state": state}


def build_pair(focus, ref_cls, our_cls, dn=3, da=2, T=2, max_iter=8, threshold=0.01):
    """Reference model + our model with identical (reference-initialized)
    weights, both dim_state=0."""
    inp_s, layers_s = ref_get_inout_dims("state", dn, da, T, focus, 0)
    inp_o, layers_o = ref_get_inout_dims("output", dn, da, T, focus, 0)
    ref_st = RefMLP(input_dim=inp_s[0], layers=[int(u) for u in np.ravel(layers_s)], activations="selu",
                    kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    ref_out = RefMLP(input_dim=inp_o[0], layers=[int(u) for u in np.ravel(layers_o)], activations="softmax",
                     kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    ref_gnn = ref_cls(ref_st, ref_out, 0, max_iter, threshold)

    our_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    our_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    our_gnn = our_cls(our_st, our_out, 0, max_iter, threshold)
    our_gnn.build(seed=0)
    our_gnn.variables = {
        "params": {
            "net_state": transplant_keras_to_ours(ref_st, our_st, {"params": our_gnn.variables["params"]["net_state"], "state": our_gnn.variables["state"]["net_state"]})["params"],
            "net_output": transplant_keras_to_ours(ref_out, our_out, {"params": our_gnn.variables["params"]["net_output"], "state": our_gnn.variables["state"]["net_output"]})["params"],
        },
        "state": our_gnn.variables["state"],
    }
    return ref_gnn, our_gnn


def make_ref_graph(nodes, arcs, targets, focus, mode):
    """Reference GraphObject; for non-'g' focus its buildNodeGraph creates an
    empty coo_matrix that newer scipy rejects — pass an explicit zero
    NodeGraph (semantically unused for 'n'/'a')."""
    from scipy.sparse import coo_matrix

    kwargs = {}
    if focus != "g":
        kwargs["NodeGraph"] = coo_matrix((nodes.shape[0], 1), dtype=np.float32)
    return RefGraphObject(nodes=nodes.copy(), arcs=arcs.copy(), targets=targets.copy(), focus=focus,
                          aggregation_mode=mode, **kwargs)


def run_reference(ref_gnn, g_ref: RefGraphObject, training=False):
    gt = RefGraphTensor.fromGraphObject(g_ref)
    k, state, out = ref_gnn.Loop(
        gt.nodes, gt.arcs, gt.DIM_NODE_LABEL, gt.set_mask, gt.output_mask,
        gt.Adjacency, gt.ArcNode, gt.NodeGraph, training=training,
    )
    return float(k), state.numpy(), out.numpy()


@pytest.mark.parametrize("mode", ["sum", "average", "normalized"])
@pytest.mark.parametrize(
    "focus,ref_cls,our_cls",
    [("n", RefGNNnode, GNNnodeBased), ("a", RefGNNarc, GNNarcBased), ("g", RefGNNgraph, GNNgraphBased)],
)
def test_forward_parity(focus, ref_cls, our_cls, mode):
    nodes, arcs, targets = rand_graph_arrays(seed=11, focus=focus)
    g_ref = make_ref_graph(nodes, arcs, targets, focus, mode)
    g_our = GraphObject(nodes=nodes.copy(), arcs=arcs.copy(), targets=targets.copy(), focus=focus,
                        aggregation_mode=mode)

    ref_gnn, our_gnn = build_pair(focus, ref_cls, our_cls)
    k_ref, state_ref, out_ref = run_reference(ref_gnn, g_ref)

    batch = from_graph_object(g_our, pad_nodes=16, pad_arcs=32)
    k, state, out, out_mask, _ = our_gnn.forward(our_gnn.variables, batch, training=False)

    assert float(k) == k_ref
    n = nodes.shape[0]
    np.testing.assert_allclose(np.asarray(state)[:n], state_ref, rtol=1e-4, atol=1e-5)
    rows = {"n": n, "a": g_our.arcs.shape[0], "g": 1}[focus]
    np.testing.assert_allclose(np.asarray(out)[:rows], out_ref, rtol=1e-4, atol=1e-5)


def test_forward_parity_merged_batch():
    """Disjoint-union merge of 3 graphs must match the reference's merged
    GraphTensor bit-for-bit at the activation level."""
    parts_ref, parts_our = [], []
    for seed in (1, 2, 3):
        nodes, arcs, targets = rand_graph_arrays(seed=seed, focus="g")
        parts_ref.append(make_ref_graph(nodes, arcs, targets, "g", "average"))
        parts_our.append(GraphObject(nodes=nodes.copy(), arcs=arcs.copy(), targets=targets.copy(),
                                     focus="g", aggregation_mode="average"))
    merged_ref = RefGraphObject.merge(parts_ref, focus="g", aggregation_mode="average")
    merged_our = GraphObject.merge(parts_our, focus="g", aggregation_mode="average")

    ref_gnn, our_gnn = build_pair("g", RefGNNgraph, GNNgraphBased)
    k_ref, state_ref, out_ref = run_reference(ref_gnn, merged_ref)

    batch = from_graph_object(merged_our, pad_nodes=64, pad_arcs=128)
    k, state, out, _, _ = our_gnn.forward(our_gnn.variables, batch, training=False)

    assert float(k) == k_ref
    n = merged_our.nodes.shape[0]
    np.testing.assert_allclose(np.asarray(state)[:n], state_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[:3], out_ref, rtol=1e-4, atol=1e-5)


def test_training_mode_bn_parity():
    """training=True: BatchNorm uses batch statistics inside the unfolding;
    state trajectories must still match the reference."""
    nodes, arcs, targets = rand_graph_arrays(seed=21, focus="n")
    g_ref = make_ref_graph(nodes, arcs, targets, "n", "average")
    g_our = GraphObject(nodes=nodes.copy(), arcs=arcs.copy(), targets=targets.copy(), focus="n",
                        aggregation_mode="average")

    ref_gnn, our_gnn = build_pair("n", RefGNNnode, GNNnodeBased)
    k_ref, state_ref, out_ref = run_reference(ref_gnn, g_ref, training=True)

    batch = from_graph_object(g_our, pad_nodes=16, pad_arcs=32)
    k, state, out, _, _ = our_gnn.forward(our_gnn.variables, batch, training=True)

    assert float(k) == k_ref
    n = nodes.shape[0]
    np.testing.assert_allclose(np.asarray(state)[:n], state_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out)[:n], out_ref, rtol=1e-3, atol=1e-4)


def test_forward_parity_dim_state():
    """dim_state>0: random state init + aggregated neighbor labels + [state |
    label] readout concat.  The reference draws its init from tf.random
    (GNN.py:257); inject our jax-drawn init so both unfoldings start from the
    same state."""
    import jax

    ds = 7
    nodes, arcs, targets = rand_graph_arrays(seed=31, focus="n")
    n = nodes.shape[0]
    g_ref = make_ref_graph(nodes, arcs, targets, "n", "average")
    from gnnkeras_tpu.graph.graph import GraphObject as OurGO

    g_our = OurGO(nodes=nodes.copy(), arcs=arcs.copy(), targets=targets.copy(), focus="n",
                  aggregation_mode="average")

    from GNN.Models.MLP import get_inout_dims as rgid

    inp_s, layers_s = rgid("state", 3, 2, 2, "n", ds)
    inp_o, layers_o = rgid("output", 3, 2, 2, "n", ds)
    ref_st = RefMLP(input_dim=inp_s[0], layers=[int(u) for u in np.ravel(layers_s)], activations="selu",
                    kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    ref_out = RefMLP(input_dim=inp_o[0], layers=[int(u) for u in np.ravel(layers_o)], activations="softmax",
                     kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    ref_gnn = RefGNNnode(ref_st, ref_out, ds, 8, 0.01)

    from gnnkeras_tpu.models.gnn import GNNnodeBased as OurGNN
    from gnnkeras_tpu.models.mlp import MLP as OurMLP

    our_st = OurMLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                    kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    our_out = OurMLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                     kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    our_gnn = OurGNN(our_st, our_out, ds, 8, 0.01)
    our_gnn.build(seed=0)
    our_gnn.variables = {
        "params": {
            "net_state": transplant_keras_to_ours(ref_st, our_st, {"params": our_gnn.variables["params"]["net_state"], "state": our_gnn.variables["state"]["net_state"]})["params"],
            "net_output": transplant_keras_to_ours(ref_out, our_out, {"params": our_gnn.variables["params"]["net_output"], "state": our_gnn.variables["state"]["net_output"]})["params"],
        },
        "state": our_gnn.variables["state"],
    }

    # the exact state init our unfold will draw with this key: forward splits
    # the key, and the padded batch draws (pad_nodes, ds) — the reference gets
    # the first n rows of that same draw.
    key = jax.random.PRNGKey(5)
    rng_loop, rng_out = jax.random.split(key)
    state0_padded = np.asarray(0.1 * jax.random.normal(rng_loop, (16, ds), dtype=np.float32))
    state0 = state0_padded[:n]

    original_normal = tf.random.normal
    tf.random.normal = lambda shape, stddev=0.1, dtype=None, **kw: tf.constant(state0)
    try:
        k_ref, state_ref, out_ref = run_reference(ref_gnn, g_ref)
    finally:
        tf.random.normal = original_normal

    from gnnkeras_tpu.graph.batch import from_graph_object as fgo

    batch = fgo(g_our, pad_nodes=16, pad_arcs=32)
    k, state, out, mask, _ = our_gnn.forward(our_gnn.variables, batch, training=False, rng=key)

    assert float(k) == k_ref
    np.testing.assert_allclose(np.asarray(state)[:n], state_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[:n], out_ref, rtol=1e-4, atol=1e-5)


def test_composite_forward_parity():
    """Composite (heterogeneous) activation parity: per-type transition MLPs,
    type-gated neighbor-label aggregation, shared output MLP — same
    transplanted weights and injected random init as the reference
    CompositeGNNnodeBased."""
    import jax

    from GNN.Models.CompositeGNN import CompositeGNNnodeBased as RefCGNN
    from GNN.composite_graph_class import (
        CompositeGraphObject as RefCGO,
        CompositeGraphTensor as RefCGT,
    )

    from gnnkeras_tpu.graph.batch import from_graph_object as fgo
    from gnnkeras_tpu.graph.graph import CompositeGraphObject as OurCGO
    from gnnkeras_tpu.models.composite import CompositeGNNnodeBased as OurCGNN
    from gnnkeras_tpu.models.mlp import MLP as OurMLP

    rng = np.random.default_rng(77)
    n, a, n_types, ds = 9, 20, 2, 5
    dims = (3, 4)
    width = max(dims)
    nodes = rng.normal(size=(n, width)).astype(np.float32)
    arcs = np.unique(
        np.concatenate([rng.integers(0, n, (a, 2)).astype(np.float32),
                        rng.normal(size=(a, 2)).astype(np.float32)], axis=1), axis=0)
    tm = np.zeros((n, n_types), dtype=bool)
    tm[np.arange(n), rng.integers(0, n_types, n)] = True
    targets = rng.normal(size=(n, 2)).astype(np.float32)

    from scipy.sparse import coo_matrix

    g_ref = RefCGO(nodes=nodes.copy(), arcs=arcs.copy(), targets=targets.copy(), type_mask=tm.copy(),
                   dim_node_label=dims, focus="n", aggregation_mode="composite_average",
                   NodeGraph=coo_matrix((n, 1), dtype=np.float32))
    g_our = OurCGO(nodes=nodes.copy(), arcs=arcs.copy(), targets=targets.copy(), type_mask=tm.copy(),
                   dim_node_label=dims, focus="n", aggregation_mode="composite_average")
    np.testing.assert_allclose(g_our.arcnode_weight, g_ref.ArcNode.data, rtol=1e-6)

    # per-type state MLPs with the model's true input widths; shared output
    comp_w = int(np.sum(dims)) + 2
    in_widths = [int(d) + 2 * ds + comp_w for d in dims]
    ref_sts = [RefMLP(input_dim=(w,), layers=[ds], activations="selu",
                      kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
               for w in in_widths]
    ref_out = RefMLP(input_dim=(ds,), layers=[2], activations="softmax",
                     kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    ref_cgnn = RefCGNN(ref_sts, ref_out, ds, 6, 0.01)

    our_sts = [OurMLP(input_dim=(w,), layers=[ds], activations="selu",
                      kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
               for w in in_widths]
    our_out = OurMLP(input_dim=(ds,), layers=[2], activations="softmax",
                     kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    our_cgnn = OurCGNN(our_sts, our_out, ds, 6, 0.01)
    our_cgnn.build(seed=1)
    new_params = {"net_state": [], "net_output": None}
    for t, (rm, om) in enumerate(zip(ref_sts, our_sts)):
        v = transplant_keras_to_ours(rm, om, {"params": our_cgnn.variables["params"]["net_state"][t],
                                              "state": our_cgnn.variables["state"]["net_state"][t]})
        new_params["net_state"].append(v["params"])
    v = transplant_keras_to_ours(ref_out, our_out, {"params": our_cgnn.variables["params"]["net_output"],
                                                    "state": our_cgnn.variables["state"]["net_output"]})
    new_params["net_output"] = v["params"]
    our_cgnn.variables = {"params": new_params, "state": our_cgnn.variables["state"]}

    # exact random-init injection (pad 16 rows; reference gets the first n)
    key = jax.random.PRNGKey(8)
    rng_loop, rng_out = jax.random.split(key)
    state0_padded = np.asarray(0.1 * jax.random.normal(rng_loop, (16, ds), dtype=np.float32))

    gt = RefCGT.fromGraphObject(g_ref)
    original_normal = tf.random.normal
    tf.random.normal = lambda shape, stddev=0.1, dtype=None, **kw: tf.constant(state0_padded[:n])
    try:
        k_ref, state_ref, out_ref = [
            x.numpy() if hasattr(x, "numpy") else float(x)
            for x in ref_cgnn.Loop(gt.nodes, gt.arcs, gt.DIM_NODE_LABEL, gt.type_mask,
                                   gt.set_mask, gt.output_mask, gt.CompositeAdjacencies,
                                   gt.Adjacency, gt.ArcNode, gt.NodeGraph, training=False)
        ]
    finally:
        tf.random.normal = original_normal

    batch = fgo(g_our, pad_nodes=16, pad_arcs=32)
    k, state, out, mask, _ = our_cgnn.forward(our_cgnn.variables, batch, training=False, rng=key)

    assert float(k) == float(k_ref)
    np.testing.assert_allclose(np.asarray(state)[:n], state_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[:n], out_ref, rtol=1e-4, atol=1e-5)


def test_lgnn_stack_parity():
    """Layered-stack parity: per-layer ks, states and outputs of a 3-layer
    node-focused LGNN (get_state & get_output) vs the reference LGNN.Loop —
    covers update_graph feature propagation (LGNN.py:175-214) end-to-end."""
    from GNN.Models.LGNN import LGNN as RefLGNN

    from gnnkeras_tpu.graph.batch import from_graph_object as fgo
    from gnnkeras_tpu.graph.graph import GraphObject as OurGO
    from gnnkeras_tpu.models.gnn import GNNnodeBased as OurGNN
    from gnnkeras_tpu.models.lgnn import LGNN as OurLGNN
    from gnnkeras_tpu.models.mlp import MLP as OurMLP

    nodes, arcs, targets = rand_graph_arrays(seed=51, focus="n")
    n = nodes.shape[0]
    g_ref = make_ref_graph(nodes, arcs, targets, "n", "average")
    g_our = OurGO(nodes=nodes.copy(), arcs=arcs.copy(), targets=targets.copy(), focus="n",
                  aggregation_mode="average")

    layers = 3
    ref_gnns, our_gnns = [], []
    for i in range(layers):
        inp_s, layers_s = ref_get_inout_dims("state", 3, 2, 2, "n", 0, layer=i,
                                             get_state=True, get_output=True)
        inp_o, layers_o = ref_get_inout_dims("output", 3, 2, 2, "n", 0, layer=i,
                                             get_state=True, get_output=True)
        r_st = RefMLP(input_dim=inp_s[0], layers=[int(u) for u in np.ravel(layers_s)], activations="selu",
                      kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        r_ot = RefMLP(input_dim=inp_o[0], layers=[int(u) for u in np.ravel(layers_o)], activations="softmax",
                      kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        ref_gnns.append(RefGNNnode(r_st, r_ot, 0, 4, 0.01))

        o_st = OurMLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                      kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        o_ot = OurMLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                      kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        our_gnns.append(OurGNN(o_st, o_ot, 0, 4, 0.01))

    ref_lgnn = RefLGNN(ref_gnns, get_state=True, get_output=True)
    our_lgnn = OurLGNN(our_gnns, get_state=True, get_output=True)
    our_lgnn.build(seed=0)

    params = {"gnns": []}
    for i in range(layers):
        sub = our_lgnn.variables["params"]["gnns"][i]
        sub_state = our_lgnn.variables["state"]["gnns"][i]
        vs = transplant_keras_to_ours(ref_gnns[i].net_state, our_gnns[i].net_state,
                                      {"params": sub["net_state"], "state": sub_state["net_state"]})
        vo = transplant_keras_to_ours(ref_gnns[i].net_output, our_gnns[i].net_output,
                                      {"params": sub["net_output"], "state": sub_state["net_output"]})
        params["gnns"].append({"net_state": vs["params"], "net_output": vo["params"]})
    our_lgnn.variables = {"params": params, "state": our_lgnn.variables["state"]}

    gt = RefGraphTensor.fromGraphObject(g_ref)
    ks_ref, states_ref, outs_ref = ref_lgnn.Loop(
        gt.nodes, gt.arcs, gt.DIM_NODE_LABEL, gt.set_mask, gt.output_mask,
        gt.Adjacency, gt.ArcNode, gt.NodeGraph, training=False,
    )

    batch = fgo(g_our, pad_nodes=16, pad_arcs=32)
    ks, states, outs, out_mask, _ = our_lgnn.forward(our_lgnn.variables, batch, training=False)

    for i in range(layers):
        assert float(ks[i]) == float(ks_ref[i]), f"layer {i} iteration count"
        np.testing.assert_allclose(np.asarray(states[i])[:n], states_ref[i].numpy(),
                                   rtol=1e-4, atol=1e-5, err_msg=f"layer {i} state")
        np.testing.assert_allclose(np.asarray(outs[i])[:n], outs_ref[i].numpy(),
                                   rtol=1e-4, atol=1e-5, err_msg=f"layer {i} output")


class TestTransductionParity:
    def test_get_transduction_matches_reference(self):
        """Identical global-RNG transduction: the reference's static
        get_transduction (TransductiveGraphSequencers.py:62-95) and ours
        produce the same heterogeneous graph for the same seed."""
        from GNN.Sequencers.TransductiveGraphSequencers import (
            TransductiveMultiGraphSequencer as RefTSeq,
        )

        from gnnkeras_tpu.data.transductive import get_transduction
        from gnnkeras_tpu.graph.graph import GraphObject

        rng = np.random.default_rng(3)
        n, a = 40, 160
        nodes = rng.normal(size=(n, 5)).astype(np.float32)
        arcs = np.concatenate(
            [rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1
        ).astype(np.float32)
        targets = rng.normal(size=(n, 3)).astype(np.float32)

        ours_g = GraphObject(nodes=nodes, arcs=arcs, targets=targets, focus="n",
                             aggregation_mode="average")
        ref_g = RefGraphObject(nodes=nodes.copy(), arcs=arcs.copy(), targets=targets.copy(),
                               focus="n", aggregation_mode="average")

        np.random.seed(123)
        ours_t = get_transduction(ours_g, 0.4, "n")
        np.random.seed(123)
        ref_t = RefTSeq.get_transduction(ref_g, 0.4, "n", "float32")

        np.testing.assert_allclose(ours_t.nodes, np.asarray(ref_t.nodes))
        np.testing.assert_allclose(ours_t.targets, np.asarray(ref_t.targets))
        np.testing.assert_array_equal(ours_t.type_mask, np.asarray(ref_t.type_mask))
        np.testing.assert_array_equal(ours_t.output_mask, np.asarray(ref_t.output_mask))
        np.testing.assert_array_equal(ours_t.set_mask, np.asarray(ref_t.set_mask))
        assert tuple(ours_t.DIM_NODE_LABEL) == tuple(int(d) for d in np.ravel(ref_t.DIM_NODE_LABEL))


def test_serial_bake_cycle_parity():
    """One serial bake cycle: with identical trained layer-1 weights, our
    baking pass (training/serial.py _bake_graphs) and the reference's
    (LGNN.fit serial body, LGNN.py:328-338: node-level Loop with
    training=True + update_graph) produce the same layer-2 input features."""
    from GNN.Models.LGNN import LGNN as RefLGNN

    from gnnkeras_tpu.models.lgnn import LGNN
    from gnnkeras_tpu.training.serial import _bake_graphs

    # layer-0 pair (focus 'g', serial starter shape algebra with GS/GO)
    ref0, our0 = build_pair("g", RefGNNgraph, GNNgraphBased, max_iter=5, threshold=0.0)

    # second layer only to satisfy the LGNN constructors (not executed)
    inp_s1, layers_s1 = ref_get_inout_dims("state", 3, 2, 2, "g", 0, layer=1,
                                           get_state=True, get_output=True)
    inp_o1, layers_o1 = ref_get_inout_dims("output", 3, 2, 2, "g", 0, layer=1,
                                           get_state=True, get_output=True)
    ref1 = RefGNNgraph(
        RefMLP(input_dim=inp_s1[0], layers=[int(u) for x in layers_s1 for u in np.ravel(x)],
               activations="selu", kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        RefMLP(input_dim=inp_o1[0], layers=[int(u) for x in layers_o1 for u in np.ravel(x)],
               activations="softmax", kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
        0, 5, 0.0,
    )
    our1 = GNNgraphBased(
        MLP(input_dim=inp_s1[0], layers=layers_s1, activations="selu"),
        MLP(input_dim=inp_o1[0], layers=layers_o1, activations="softmax"),
        0, 5, 0.0,
    )
    our1.build(seed=1)
    ref_lgnn = RefLGNN([ref0, ref1], get_state=True, get_output=True)
    our_lgnn = LGNN([our0, our1], True, True)

    rng = np.random.default_rng(17)
    graphs, ref_graphs = [], []
    for seed in range(4):
        nodes, arcs, targets = rand_graph_arrays(seed=seed, n=9, a=20, focus="g")
        graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=targets, focus="g",
                                  aggregation_mode="average"))
        ref_graphs.append(make_ref_graph(nodes, graphs[-1].arcs, targets, "g", "average"))

    # OUR bake
    our0.build(seed=0)
    baked = _bake_graphs(our_lgnn, our0, [g.copy() for g in graphs], [g.copy() for g in graphs])

    # REFERENCE bake (LGNN.py:332-338 verbatim)
    for g_ref, ours_baked in zip(ref_graphs, baked):
        gt = RefGraphTensor.fromGraphObject(g_ref)
        k, s, o = RefGNNnode.Loop(
            ref0, gt.nodes, gt.arcs, gt.DIM_NODE_LABEL, gt.set_mask, gt.output_mask,
            gt.Adjacency, gt.ArcNode, gt.NodeGraph, training=True,
        )
        n_new, a_new, dims_new = ref_lgnn.update_graph(
            g_ref.nodes, g_ref.arcs, g_ref.DIM_NODE_LABEL, g_ref.set_mask, g_ref.output_mask, s, o
        )
        np.testing.assert_allclose(
            ours_baked.nodes, np.asarray(n_new), rtol=2e-4, atol=1e-5
        )
        np.testing.assert_allclose(ours_baked.arcs, np.asarray(a_new), rtol=2e-4, atol=1e-5)


def test_transduction_matches_reference():
    """get_transduction bit-parity: with the same global np.random state, our
    transduced composite graph equals the reference's
    (TransductiveGraphSequencers.py:62-95) field for field."""
    from GNN.Sequencers.TransductiveGraphSequencers import (
        TransductiveMultiGraphSequencer as RefTransSeq,
    )

    from gnnkeras_tpu.data.transductive import get_transduction as our_transduction
    from gnnkeras_tpu.graph.graph import GraphObject as OurGO

    rng = np.random.default_rng(13)
    n, a = 30, 80
    nodes = rng.normal(size=(n, 4)).astype(np.float32)
    arcs = np.unique(
        np.concatenate([rng.integers(0, n, (a, 2)).astype(np.float32),
                        rng.normal(size=(a, 2)).astype(np.float32)], axis=1), axis=0)
    targets = np.eye(2, dtype=np.float32)[rng.integers(0, 2, n)]
    set_mask = rng.random(n) < 0.8
    output_mask = rng.random(n) < 0.9

    g_ref = make_ref_graph(nodes, arcs, targets[output_mask], "n", "average")
    g_ref.set_mask, g_ref.output_mask = set_mask.copy(), output_mask.copy()
    g_our = OurGO(nodes=nodes.copy(), arcs=arcs.copy(), targets=targets[output_mask].copy(),
                  focus="n", aggregation_mode="average",
                  set_mask=set_mask.copy(), output_mask=output_mask.copy())

    np.random.seed(99)
    t_ref = RefTransSeq.get_transduction(g_ref, 0.5, "n", np.float32)
    np.random.seed(99)
    t_our = our_transduction(g_our, 0.5, "n")

    np.testing.assert_array_equal(np.asarray(t_our.type_mask), np.asarray(t_ref.type_mask))
    np.testing.assert_array_equal(t_our.nodes, np.asarray(t_ref.nodes))
    np.testing.assert_array_equal(t_our.targets, np.asarray(t_ref.targets))
    np.testing.assert_array_equal(t_our.output_mask, np.asarray(t_ref.output_mask))
    np.testing.assert_array_equal(t_our.set_mask, np.asarray(t_ref.set_mask))
    assert tuple(int(d) for d in t_our.DIM_NODE_LABEL) == tuple(int(d) for d in np.ravel(t_ref.DIM_NODE_LABEL))
