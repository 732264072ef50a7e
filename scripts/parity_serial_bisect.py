"""Bisect the serial-LGNN accuracy divergence (ours 0.363 vs reference 0.579).

Runs OUR serial fit (starter serial config, shuffle off), then evaluates the
SAME trained weights through (a) our LGNN evaluate path and (b) the
reference's own LGNN.Loop.  If (b) also scores ~0.36 the divergence is in
training/baking; if (b) scores ~0.58 our evaluation path diverges.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--layers", type=int, default=3)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    from gnnkeras_tpu.data.mutag import load_mutag, mutag_splits
    from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
    from gnnkeras_tpu.models.gnn import GNNgraphBased
    from gnnkeras_tpu.models.lgnn import LGNN
    from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

    graphs = load_mutag()
    for g in graphs:
        g.setAggregation("average")
    gTr, gTe, gVa = mutag_splits(graphs, seed=args.seed)

    gnns = []
    for layer in range(args.layers):
        inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", 0, layer=layer,
                                         get_state=True, get_output=True)
        inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", 0, layer=layer,
                                         get_state=True, get_output=True)
        st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        ot = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                 kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        gnns.append(GNNgraphBased(st, ot, 0, 5, 0.01))
    lgnn = LGNN(gnns, True, True)
    lgnn.compile(optimizer="adam:0.01", loss="categorical_crossentropy",
                 metrics=["accuracy"], training_mode="serial")
    lgnn.build(seed=7)

    seqTr = MultiGraphSequencer(gTr, "g", "average", 1000, shuffle=False)
    seqTe = MultiGraphSequencer(gTe, "g", "average", 1000, shuffle=False)

    lgnn.fit(seqTr, epochs=args.epochs, verbose=1)
    ours_eval = lgnn.evaluate(seqTe)
    print(f"\nOURS serial: test acc {ours_eval['accuracy']:.4f} loss {ours_eval['loss']:.4f}")

    # ---- evaluate the SAME weights through the reference's LGNN.Loop ------
    sys.path.insert(0, "/root/reference")
    import tensorflow as tf
    from scipy.sparse import coo_matrix

    from GNN.Models.GNN import GNNgraphBased as RefGNN
    from GNN.Models.LGNN import LGNN as RefLGNN
    from GNN.Models.MLP import MLP as RefMLP
    from GNN.Sequencers.GraphSequencers import MultiGraphSequencer as RefSeq
    from GNN.graph_class import GraphObject as RefGO, GraphTensor as RefGT

    def _adj(self):
        return coo_matrix(
            (self.ArcNode.data, (self.arcs[:, 0].astype(int), self.arcs[:, 1].astype(int))),
            shape=(self.nodes.shape[0],) * 2, dtype=self.dtype,
        )

    RefGO.buildAdjacency = _adj
    RefSeq.merge = staticmethod(
        lambda glist, focus, aggregation_mode, dtype="float32": RefGO.merge(glist, focus, aggregation_mode, dtype)
    )
    RefSeq.to_graph_tensor = staticmethod(RefGT.fromGraphObject)

    def set_ref_weights(keras_model, mlp, variables):
        k_layers = [l for l in keras_model.layers]
        ki = 0
        for idx, layer in enumerate(mlp.program):
            p = variables["params"][idx]
            s = variables["state"][idx]
            if layer[0] == "dense":
                while len(k_layers[ki].get_weights()) != 2:
                    ki += 1
                k_layers[ki].set_weights([np.asarray(p["kernel"]), np.asarray(p["bias"])])
                ki += 1
            elif layer[0] == "batch_norm":
                while len(k_layers[ki].get_weights()) != 4:
                    ki += 1
                k_layers[ki].set_weights([
                    np.asarray(p["gamma"]), np.asarray(p["beta"]),
                    np.asarray(s["moving_mean"]), np.asarray(s["moving_var"]),
                ])
                ki += 1

    ref_gnns = []
    for layer in range(args.layers):
        inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", 0, layer=layer,
                                         get_state=True, get_output=True)
        inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", 0, layer=layer,
                                         get_state=True, get_output=True)
        st = RefMLP(input_dim=inp_s[0], layers=[int(u) for x in layers_s for u in np.ravel(x)],
                    activations="selu", kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        ot = RefMLP(input_dim=inp_o[0], layers=[int(u) for x in layers_o for u in np.ravel(x)],
                    activations="softmax", kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        layer_vars = {
            "params": lgnn.variables["params"]["gnns"][layer],
            "state": lgnn.variables["state"]["gnns"][layer],
        }
        set_ref_weights(st, lgnn.gnns[layer].net_state,
                        {"params": layer_vars["params"]["net_state"], "state": layer_vars["state"]["net_state"]})
        set_ref_weights(ot, lgnn.gnns[layer].net_output,
                        {"params": layer_vars["params"]["net_output"], "state": layer_vars["state"]["net_output"]})
        ref_gnns.append(RefGNN(st, ot, 0, 5, 0.01))
    ref_lgnn = RefLGNN(ref_gnns, get_state=True, get_output=True)

    def to_ref(g):
        return RefGO(nodes=g.nodes.copy(), arcs=g.arcs.copy(), targets=g.targets.copy(),
                     focus="g", aggregation_mode="average")

    ref_te = RefSeq([to_ref(g) for g in gTe], "g", "average", 1000, shuffle=False)
    cce = tf.keras.losses.categorical_crossentropy
    hits, count, losses = 0, 0, []
    for i in range(len(ref_te)):
        x, y, sw = ref_te[i]
        inputs = ref_lgnn.process_inputs(x)
        k, state, out = ref_lgnn.Loop(*inputs, training=False)
        y_pred = out[-1] if isinstance(out, (list, tuple)) else out
        losses.append(float(tf.reduce_mean(cce(y, y_pred))))
        hits += int(np.sum(np.argmax(y, -1) == np.argmax(y_pred.numpy(), -1)))
        count += y.shape[0]
    print(f"REFERENCE eval of OUR trained weights: test acc {hits / count:.4f} loss {np.mean(losses):.4f}")


if __name__ == "__main__":
    main()
