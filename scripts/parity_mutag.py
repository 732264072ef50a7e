"""End-to-end MUTAG training parity: this framework vs the reference.

Trains both frameworks on the identical dataset (same deterministic split,
shuffle off so batch composition matches), starting from the SAME initial MLP
weights (transplanted), with the reference starter.py single-GNN config
(graph-focused, dim_state=0, max_iter=5, threshold=0.01, Adam 0.01, batch
1000) and reports per-epoch train loss and final test accuracy side by side.

Run on CPU (deterministic f32 matmuls):
    python scripts/parity_mutag.py --epochs 10
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
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--skip-reference", action="store_true")
    args = parser.parse_args()

    import jax

    if jax.default_backend() != "cpu":
        print(f"note: running on {jax.default_backend()} — CPU recommended for exact parity")

    from gnnkeras_tpu.data.mutag import load_mutag, mutag_splits
    from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
    from gnnkeras_tpu.models.gnn import GNNgraphBased
    from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

    graphs = load_mutag()
    for g in graphs:
        g.setAggregation("average")
    gTr, gTe, gVa = mutag_splits(graphs, seed=args.seed)
    print(f"split: train {len(gTr)} / test {len(gTe)} / val {len(gVa)}")

    inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", 0)
    inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", 0)
    net_st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    net_out = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    ours = GNNgraphBased(net_st, net_out, 0, 5, 0.01)
    ours.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])
    ours.build(seed=7)
    # snapshot the initial weights before training mutates them — the
    # reference model starts from these exact values.
    ours_initial_variables = jax.tree_util.tree_map(lambda x: np.asarray(x), ours.variables)

    seqTr = MultiGraphSequencer(gTr, "g", "average", 1000, shuffle=False)
    seqTe = MultiGraphSequencer(gTe, "g", "average", 1000, shuffle=False)

    t0 = time.time()
    ours.fit(seqTr, epochs=args.epochs, verbose=1)
    ours_time = time.time() - t0
    ours_eval = ours.evaluate(seqTe)
    print(f"\nOURS:      test acc {ours_eval['accuracy']:.4f}  loss {ours_eval['loss']:.4f}  ({ours_time:.1f}s)")

    if args.skip_reference:
        return

    # ---- reference, same weights, same data ------------------------------
    sys.path.insert(0, "/root/reference")
    import tensorflow as tf
    from scipy.sparse import coo_matrix

    from GNN.Models.GNN import GNNgraphBased as RefGNN
    from GNN.Models.MLP import MLP as RefMLP
    from GNN.Sequencers.GraphSequencers import MultiGraphSequencer as RefSeq
    from GNN.graph_class import GraphObject as RefGO

    # modern-scipy shim (reference builds Adjacency from a zip iterator)
    def _adj(self):
        return coo_matrix(
            (self.ArcNode.data, (self.arcs[:, 0].astype(int), self.arcs[:, 1].astype(int))),
            shape=(self.nodes.shape[0],) * 2, dtype=self.dtype,
        )

    RefGO.buildAdjacency = _adj
    # py3.12 shim: the reference wraps an already-bound classmethod in
    # classmethod() (GraphSequencers.py:16), which double-passes cls.
    RefSeq.merge = staticmethod(
        lambda glist, focus, aggregation_mode, dtype="float32": RefGO.merge(glist, focus, aggregation_mode, dtype)
    )
    from GNN.graph_class import GraphTensor as RefGT

    RefSeq.to_graph_tensor = staticmethod(RefGT.fromGraphObject)

    ref_st = RefMLP(input_dim=inp_s[0], layers=[int(u) for u in np.ravel(layers_s)], activations="selu",
                    kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    ref_out = RefMLP(input_dim=inp_o[0], layers=[int(u) for u in np.ravel(layers_o)], activations="softmax",
                     kernel_initializer="glorot_normal", bias_initializer="glorot_normal")

    # transplant OUR initial weights into the reference nets
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

    init_vars = ours_initial_variables
    set_ref_weights(ref_st, net_st, {"params": init_vars["params"]["net_state"], "state": init_vars["state"]["net_state"]})
    set_ref_weights(ref_out, net_out, {"params": init_vars["params"]["net_output"], "state": init_vars["state"]["net_output"]})

    ref_gnn = RefGNN(ref_st, ref_out, 0, 5, 0.01)

    def to_ref(g):
        return RefGO(nodes=g.nodes.copy(), arcs=g.arcs.copy(), targets=g.targets.copy(),
                     focus="g", aggregation_mode="average")

    ref_tr = RefSeq([to_ref(g) for g in gTr], "g", "average", 1000, shuffle=False)
    ref_te = RefSeq([to_ref(g) for g in gTe], "g", "average", 1000, shuffle=False)

    # Keras 3 cannot drive the reference's Sequence protocol (nested tuple
    # signatures) nor its train_step (compiled_loss was removed), so this
    # reproduces the reference's own train_step body verbatim
    # (GNN/Models/GNN.py:277-298): eager tape over Loop, mean CCE, Adam.
    optimizer = tf.optimizers.Adam(learning_rate=0.01)
    cce = tf.keras.losses.categorical_crossentropy

    def ref_train_epoch():
        losses, hits, count = [], 0, 0
        for i in range(len(ref_tr)):
            x, y, sw = ref_tr[i]
            inputs = ref_gnn.process_inputs(x)
            with tf.GradientTape() as tape:
                k, state, y_pred = ref_gnn.Loop(*inputs, training=True)
                loss = tf.reduce_mean(cce(y, y_pred))
            wS, wO = ref_gnn.net_state.trainable_variables, ref_gnn.net_output.trainable_variables
            dwbS, dwbO = tape.gradient(loss, [wS, wO])
            optimizer.apply_gradients(zip(dwbS + dwbO, wS + wO))
            losses.append(float(loss))
            hits += int(np.sum(np.argmax(y, -1) == np.argmax(y_pred.numpy(), -1)))
            count += y.shape[0]
        return float(np.mean(losses)), hits / count

    def ref_eval_seq(seq):
        losses, hits, count = [], 0, 0
        for i in range(len(seq)):
            x, y, sw = seq[i]
            inputs = ref_gnn.process_inputs(x)
            y_pred = ref_gnn.Loop(*inputs, training=False)[2]
            losses.append(float(tf.reduce_mean(cce(y, y_pred))))
            hits += int(np.sum(np.argmax(y, -1) == np.argmax(y_pred.numpy(), -1)))
            count += y.shape[0]
        return float(np.mean(losses)), hits / count

    t0 = time.time()
    for epoch in range(args.epochs):
        tr_loss, tr_acc = ref_train_epoch()
        print(f"[ref] Epoch {epoch + 1}/{args.epochs} loss: {tr_loss:.4f} - accuracy: {tr_acc:.4f}")
    ref_time = time.time() - t0
    ref_loss, ref_acc = ref_eval_seq(ref_te)
    print(f"REFERENCE: test acc {ref_acc:.4f}  loss {ref_loss:.4f}  ({ref_time:.1f}s)")
    print(f"\nspeedup (wall-clock fit): {ref_time / ours_time:.1f}x")


if __name__ == "__main__":
    main()
