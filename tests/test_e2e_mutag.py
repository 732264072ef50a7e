"""End-to-end MUTAG graph classification (SURVEY §4: the de-facto reference
test is running starter.py and checking accuracy; here it is an assertion)."""

import numpy as np
import pytest


class TestEndToEndMutag:
    def test_starter_config_learns_mutag(self):
        from gnnkeras_tpu import MLP, GNNgraphBased, MultiGraphSequencer
        from gnnkeras_tpu.data.mutag import load_mutag, mutag_splits
        from gnnkeras_tpu.models.mlp import get_inout_dims

        try:
            graphs = load_mutag()
        except FileNotFoundError:
            pytest.skip("MUTAG raw data not available")
        for g in graphs:
            g.setAggregation("average")
        gTr, gTe, gVa = mutag_splits(graphs, seed=42)

        inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", 0)
        inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", 0)
        net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                     kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                      kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        gnn = GNNgraphBased(net_st, net_out, 0, 5, 0.01)
        gnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])

        seq = MultiGraphSequencer(gTr[:800], "g", "average", batch_size=400, shuffle=False)
        h = gnn.fit(seq, epochs=6, verbose=0)
        # measured band over 3 seeds (round 5, CPU 8-device mesh): train
        # 0.674-0.716, test 0.573-0.579 — floors sit under the band with
        # seed margin but far above the ~0.55/0.45 majority class, so a
        # semantics regression (not noise) trips them
        assert h.history["accuracy"][-1] > 0.65, h.history["accuracy"]
        ev = gnn.evaluate(MultiGraphSequencer(gTe, "g", "average", 1000, shuffle=False))
        assert ev["accuracy"] > 0.55, ev
