"""Pallas BCSR-SpMM kernel vs the XLA einsum path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnkeras_tpu.graph.graph import GraphObject
from gnnkeras_tpu.ops.bcsr import bcsr_aggregate, build_bcsr
from gnnkeras_tpu.ops.spmm import pallas_bcsr_aggregate, prepare_pallas_bcsr


def merged_graph(seed=0, n_graphs=12):
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(10, 60))
        a = int(rng.integers(20, 120))
        nodes = rng.normal(size=(n, 4))
        arcs = np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 1))], axis=1)
        graphs.append(GraphObject(nodes=nodes, arcs=arcs, targets=np.ones((n, 1)), focus="n", aggregation_mode="average"))
    return GraphObject.merge(graphs, focus="n", aggregation_mode="average")


@pytest.fixture(scope="module")
def operator():
    g = merged_graph()
    n_pad = ((g.nodes.shape[0] + 127) // 128) * 128
    m = build_bcsr(g.arcs[:, 0].astype(int), g.arcs[:, 1].astype(int), g.arcnode_weight, n_pad)
    return m, prepare_pallas_bcsr(m), n_pad


class TestPallasSpmm:
    def test_matches_xla_path(self, operator):
        m, pm, n_pad = operator
        rng = np.random.default_rng(1)
        state = jnp.asarray(rng.normal(size=(n_pad, 14)).astype(np.float32))
        ref = bcsr_aggregate(state, m)
        got = pallas_bcsr_aggregate(state, pm)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_feature_padding(self, operator):
        # d not a multiple of 128 must round-trip through lane padding
        m, pm, n_pad = operator
        rng = np.random.default_rng(2)
        for d in (1, 14, 128, 130):
            state = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))
            ref = bcsr_aggregate(state, m)
            got = pallas_bcsr_aggregate(state, pm)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5, err_msg=f"d={d}")

    def test_empty_dst_tiles_are_zero(self, operator):
        # padding tiles (no incoming blocks) must come out exactly zero
        m, pm, n_pad = operator
        state = jnp.ones((n_pad, 8), jnp.float32)
        got = np.asarray(pallas_bcsr_aggregate(state, pm))
        ref = np.asarray(bcsr_aggregate(state, m))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_gradient_matches_xla(self, operator):
        m, pm, n_pad = operator
        rng = np.random.default_rng(3)
        state = jnp.asarray(rng.normal(size=(n_pad, 6)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(n_pad, 6)).astype(np.float32))

        g_ref = jax.grad(lambda s: jnp.sum(bcsr_aggregate(s, m) * w))(state)
        g_got = jax.grad(lambda s: jnp.sum(pallas_bcsr_aggregate(s, pm) * w))(state)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-5)

    def test_bf16_blocks(self, operator):
        from gnnkeras_tpu.ops.bcsr import cast_bcsr

        m, _, n_pad = operator
        m16 = cast_bcsr(m, jnp.bfloat16)
        pm16 = prepare_pallas_bcsr(m16)
        rng = np.random.default_rng(4)
        state = jnp.asarray(rng.normal(size=(n_pad, 14)).astype(np.float32))
        ref = bcsr_aggregate(state, m16)
        got = pallas_bcsr_aggregate(state, pm16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=1e-2)


class TestPallasInModel:
    def test_training_forward_and_grads_with_pallas_backend(self):
        """Full model forward + backprop through the checkpointed scan with
        the fused Pallas aggregation (custom VJP) — must match the XLA BCSR
        backend."""
        import jax
        from gnnkeras_tpu.graph.batch import from_graph_object
        from gnnkeras_tpu.models.gnn import GNNnodeBased
        from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

        g = merged_graph(seed=9)
        b_xla = from_graph_object(g, pallas=False)
        b_pal = from_graph_object(g, pallas=True)

        inp_s, layers_s = get_inout_dims("state", 4, 1, 2, "n", 0)
        inp_o, layers_o = get_inout_dims("output", 4, 1, 2, "n", 0)
        gnn = GNNnodeBased(
            MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
            MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                kernel_initializer="glorot_normal", bias_initializer="glorot_normal"),
            0, 4, 0.01,
        )
        gnn.build(seed=3)

        def loss_of(p, batch):
            variables = {"params": p, "state": gnn.variables["state"]}
            _, _, out, mask, _ = gnn.forward(variables, batch, training=True)
            return jnp.sum(jnp.where(mask[:, None], (out - batch.targets) ** 2, 0.0))

        l1, g1 = jax.value_and_grad(loss_of)(gnn.variables["params"], b_xla)
        l2, g2 = jax.value_and_grad(loss_of)(gnn.variables["params"], b_pal)
        assert float(l1) == pytest.approx(float(l2), rel=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)
