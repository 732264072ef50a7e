"""Measure the REFERENCE's serial-LGNN test accuracy on MUTAG (VERDICT r1
weak #8: our serial run records test acc 0.363, attributed to the reference's
BatchNorm-momentum artifact — this measures whether the reference's own
serial path shows the same collapse).

Reproduces the reference's serial orchestration verbatim (GNN/Models/
LGNN.py:290-359) with a manual train loop standing in for Keras fit (Keras 3
cannot drive the reference's Sequence protocol or train_step — same approach
as scripts/parity_mutag.py): per layer N epochs of eager Adam steps, then the
per-graph baking pass with training=True (LGNN.py:332), update_graph into the
t=0 graphs, rebuild the sequencer; finally the full-stack evaluation through
the reference's own LGNN.Loop.

Run: python scripts/parity_serial.py --epochs 10 --layers 3
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--layers", type=int, default=3)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--average-st-grads", action="store_true",
                        help="divide state-net grads by the iteration count "
                             "(the reference starter's LGNN config, starter.py:96)")
    args = parser.parse_args()

    from gnnkeras_tpu.data.mutag import load_mutag, mutag_splits
    from gnnkeras_tpu.models.mlp import get_inout_dims

    graphs = load_mutag()
    for g in graphs:
        g.setAggregation("average")
    gTr, gTe, gVa = mutag_splits(graphs, seed=args.seed)
    print(f"split: train {len(gTr)} / test {len(gTe)} / val {len(gVa)}")

    sys.path.insert(0, "/root/reference")
    import tensorflow as tf
    from scipy.sparse import coo_matrix

    from GNN.Models.GNN import GNNgraphBased as RefGNN, GNNnodeBased as RefNodeGNN
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

    def to_ref(g):
        return RefGO(nodes=g.nodes.copy(), arcs=g.arcs.copy(), targets=g.targets.copy(),
                     focus="g", aggregation_mode="average")

    # starter.py serial defaults: 3 layers, get_state/get_output True, dim_state 0
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
        ref_gnns.append(RefGNN(st, ot, 0, 5, 0.01))
    lgnn = RefLGNN(ref_gnns, get_state=True, get_output=True)

    cce = tf.keras.losses.categorical_crossentropy

    def train_gnn(gnn, sequence, epochs, tag):
        optimizer = tf.optimizers.Adam(learning_rate=0.01)
        for epoch in range(epochs):
            losses, hits, count = [], 0, 0
            for i in range(len(sequence)):
                x, y, sw = sequence[i]
                inputs = gnn.process_inputs(x)
                with tf.GradientTape() as tape:
                    k, state, y_pred = gnn.Loop(*inputs, training=True)
                    loss = tf.reduce_mean(cce(y, y_pred))
                wS, wO = gnn.net_state.trainable_variables, gnn.net_output.trainable_variables
                dwbS, dwbO = tape.gradient(loss, [wS, wO])
                if args.average_st_grads:  # reference GNN.py:295
                    dwbS = [gr / tf.cast(k, gr.dtype) for gr in dwbS]
                optimizer.apply_gradients(zip(dwbS + dwbO, wS + wO))
                losses.append(float(loss))
                hits += int(np.sum(np.argmax(y, -1) == np.argmax(y_pred.numpy(), -1)))
                count += y.shape[0]
            print(f"[{tag}] epoch {epoch + 1}/{epochs} loss {np.mean(losses):.4f} acc {hits / count:.4f}", flush=True)

    # serial orchestration (LGNN.py:305-359)
    processing_function = RefNodeGNN.Loop  # graph focus → node-level processing (LGNN.py:298)
    training_data_t0 = RefSeq([to_ref(g) for g in gTr], "g", "average", 1000, shuffle=False)
    training_sequence = training_data_t0.copy()

    t0 = time.time()
    for idx, gnn in enumerate(lgnn.gnns[:-1]):
        print(f"\n--- GNN {idx + 1}/{lgnn.LAYERS} ---", flush=True)
        train_gnn(gnn, training_sequence.copy(), args.epochs, f"L{idx}")

        training_sequence.shuffle = False
        training_sequence.set_batch_size(1)
        _, sTr, oTr = zip(*[processing_function(gnn, *gnn.process_inputs(i[0]), training=True)
                            for i in training_sequence])
        training_sequence = training_data_t0.copy()
        for g, s, o in zip(training_sequence.data, sTr, oTr):
            n, a, l = lgnn.update_graph(g.nodes, g.arcs, g.DIM_NODE_LABEL, g.set_mask, g.output_mask, s, o)
            g.nodes, g.arcs, g.DIM_NODE_LABEL = n.numpy(), a.numpy(), l

    print(f"\n--- GNN {lgnn.LAYERS}/{lgnn.LAYERS} ---", flush=True)
    train_gnn(lgnn.gnns[-1], training_sequence.copy(), args.epochs, f"L{lgnn.LAYERS - 1}")
    fit_time = time.time() - t0

    # full-stack evaluation through the reference's own LGNN.Loop
    ref_te = RefSeq([to_ref(g) for g in gTe], "g", "average", 1000, shuffle=False)
    hits, count, losses = 0, 0, []
    for i in range(len(ref_te)):
        x, y, sw = ref_te[i]
        inputs = lgnn.process_inputs(x)
        k, state, out = lgnn.Loop(*inputs, training=False)
        y_pred = out[-1] if isinstance(out, (list, tuple)) else out
        losses.append(float(tf.reduce_mean(cce(y, y_pred))))
        hits += int(np.sum(np.argmax(y, -1) == np.argmax(y_pred.numpy(), -1)))
        count += y.shape[0]
    print(f"\nREFERENCE serial-LGNN ({args.layers} layers, {args.epochs} ep/layer): "
          f"test acc {hits / count:.4f}  loss {np.mean(losses):.4f}  (fit {fit_time:.0f}s)")


if __name__ == "__main__":
    main()
