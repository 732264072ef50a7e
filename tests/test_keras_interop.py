"""Importing reference-style Keras model archives (GNN/Models/GNN.py:94-137):
a reference-built Keras MLP saved to disk loads into this framework with
identical outputs."""

import json
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")


def build_ref_mlp(input_dim=7, units=(9, 4)):
    import sys

    sys.path.insert(0, "/root/reference")
    from GNN.Models.MLP import MLP as RefMLP

    acts = ["selu"] * (len(units) - 1) + ["softmax"]
    return RefMLP(input_dim=(input_dim,), layers=list(units), activations=acts,
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")


class TestKerasInterop:
    def test_weights_from_keras_matches_outputs(self):
        from gnnkeras_tpu.utils.keras_interop import mlp_spec_from_keras, weights_from_keras

        ref = build_ref_mlp()
        x = np.random.default_rng(0).normal(size=(12, 7)).astype(np.float32)
        ref_out = ref(x, training=False).numpy()

        spec = mlp_spec_from_keras(ref)
        variables = weights_from_keras(ref, spec)
        import jax.numpy as jnp

        got, _ = spec.apply(
            {"params": [{k: jnp.asarray(v) for k, v in d.items()} for d in variables["params"]],
             "state": [{k: jnp.asarray(v) for k, v in d.items()} for d in variables["state"]]},
            jnp.asarray(x), training=False,
        )
        np.testing.assert_allclose(np.asarray(got), ref_out, rtol=1e-5, atol=1e-6)

    def test_load_reference_gnn_directory(self, tmp_path):
        """A reference-layout model directory (config.json + per-MLP Keras
        archives) loads into GNNgraphBased with working forward."""
        from gnnkeras_tpu.utils.keras_interop import load_reference_gnn

        path = str(tmp_path / "refmodel") + "/"
        os.makedirs(path, exist_ok=True)
        st = build_ref_mlp(input_dim=2 * 3 + 2, units=(3,))
        ot = build_ref_mlp(input_dim=3, units=(2,))
        st.save(path + "net_state.keras")
        ot.save(path + "net_output.keras")
        with open(path + "config.json", "w") as f:
            json.dump({"state_vect_dim": 0, "max_iteration": 4, "state_threshold": 0.01,
                       "average_st_grads": False}, f)

        model = load_reference_gnn(path, focus="g")
        assert model.max_iteration == 4
        assert model.variables is not None

        # forward runs on a toy batch
        from gnnkeras_tpu.graph.batch import from_graph_object
        from gnnkeras_tpu.graph.graph import GraphObject

        rng = np.random.default_rng(1)
        n, a = 10, 24
        g = GraphObject(
            nodes=rng.normal(size=(n, 3)),
            arcs=np.concatenate([rng.integers(0, n, (a, 2)), rng.normal(size=(a, 2))], axis=1),
            targets=rng.normal(size=(1, 2)), focus="g", aggregation_mode="average",
        )
        batch = from_graph_object(g)
        k, state, out, mask, _ = model.forward(model.variables, batch, training=False)
        assert np.all(np.isfinite(np.asarray(out)))
