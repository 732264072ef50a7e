"""End-to-end PARALLEL/RESIDUAL-mode LGNN training parity: this framework
vs the reference.

Completes the training-parity matrix (single GNN: parity_mutag.py, exact;
serial stack: parity_serial.py): a 3-layer graph-focused LGNN trained in the
reference's 'parallel' mode — one tape over all layers, loss = mean of the
per-layer losses (LGNN.py:261-262), gradients over every layer's nets at
once (LGNN.py:270-278) — from the SAME transplanted initial weights on the
same deterministic split with shuffle off, reporting per-epoch train loss
and final test accuracy side by side.

Run on CPU (deterministic f32 matmuls):
    python scripts/parity_parallel.py --epochs 5
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # exact f32 parity (TPU matmuls default bf16-ish)

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--layers", type=int, default=3)
    parser.add_argument("--mode", choices=["parallel", "residual"], default="parallel",
                        help="parallel: mean of per-layer losses (LGNN.py:262); "
                             "residual: loss of the mean of layer outputs (LGNN.py:263)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--skip-reference", action="store_true")
    args = parser.parse_args()

    import jax

    if jax.default_backend() != "cpu":
        print(f"note: running on {jax.default_backend()} — CPU recommended for exact parity")

    from gnnkeras_tpu.data.mutag import load_mutag, mutag_splits
    from gnnkeras_tpu.data.sequencers import MultiGraphSequencer
    from gnnkeras_tpu.models.gnn import GNNgraphBased
    from gnnkeras_tpu.models.lgnn import LGNN
    from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

    graphs = load_mutag()
    for g in graphs:
        g.setAggregation("average")
    gTr, gTe, gVa = mutag_splits(graphs, seed=args.seed)
    print(f"split: train {len(gTr)} / test {len(gTe)} / val {len(gVa)}")

    dims = []
    gnns = []
    for layer in range(args.layers):
        inp_s, layers_s = get_inout_dims("state", 14, 3, 2, "g", 0, layer=layer,
                                         get_state=True, get_output=True)
        inp_o, layers_o = get_inout_dims("output", 14, 3, 2, "g", 0, layer=layer,
                                         get_state=True, get_output=True)
        dims.append((inp_s, layers_s, inp_o, layers_o))
        st = MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                 kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        ot = MLP(input_dim=inp_o[0], layers=layers_o, activations="softmax",
                 kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        gnns.append(GNNgraphBased(st, ot, 0, 5, 0.01))
    ours = LGNN(gnns, get_state=True, get_output=True)
    ours.compile(optimizer="adam:0.01", loss="categorical_crossentropy",
                 metrics=["accuracy"], training_mode=args.mode)
    ours.build(seed=7)
    init_vars = jax.tree_util.tree_map(lambda x: np.asarray(x), ours.variables)

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
        inp_s, layers_s, inp_o, layers_o = dims[layer]
        st = RefMLP(input_dim=inp_s[0], layers=[int(u) for u in np.ravel(layers_s)],
                    activations="selu", kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
        ot = RefMLP(input_dim=inp_o[0], layers=[int(u) for u in np.ravel(layers_o)],
                    activations="softmax", kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
        set_ref_weights(st, ours.gnns[layer].net_state, {
            "params": init_vars["params"]["gnns"][layer]["net_state"],
            "state": init_vars["state"]["gnns"][layer]["net_state"],
        })
        set_ref_weights(ot, ours.gnns[layer].net_output, {
            "params": init_vars["params"]["gnns"][layer]["net_output"],
            "state": init_vars["state"]["gnns"][layer]["net_output"],
        })
        ref_gnns.append(RefGNN(st, ot, 0, 5, 0.01))
    ref_lgnn = RefLGNN(ref_gnns, get_state=True, get_output=True)

    def to_ref(g):
        return RefGO(nodes=g.nodes.copy(), arcs=g.arcs.copy(), targets=g.targets.copy(),
                     focus="g", aggregation_mode="average")

    ref_tr = RefSeq([to_ref(g) for g in gTr], "g", "average", 1000, shuffle=False)
    ref_te = RefSeq([to_ref(g) for g in gTe], "g", "average", 1000, shuffle=False)

    # the reference's parallel train_step body verbatim (LGNN.py:252-287):
    # one tape over LGNN.Loop, mean of per-layer mean-CCE losses, gradients
    # over all layers' nets flattened, Adam; metrics on the LAST layer
    optimizer = tf.optimizers.Adam(learning_rate=0.01)
    cce = tf.keras.losses.categorical_crossentropy

    def ref_train_epoch():
        losses, hits, count = [], 0, 0
        for i in range(len(ref_tr)):
            x, y, sw = ref_tr[i]
            inputs = ref_lgnn.process_inputs(x)
            with tf.GradientTape() as tape:
                k, state, outs = ref_lgnn.Loop(*inputs, training=True)
                if args.mode == "parallel":  # LGNN.py:262
                    loss = tf.reduce_mean([tf.reduce_mean(cce(y, o)) for o in outs])
                else:  # residual: loss of the MEAN output (LGNN.py:263)
                    loss = tf.reduce_mean(cce(y, tf.reduce_mean(tf.stack(outs, 0), 0)))
            # LGNN.py:270-278: per-layer variable lists, flattened
            wS = [g.net_state.trainable_variables for g in ref_lgnn.gnns]
            wO = [g.net_output.trainable_variables for g in ref_lgnn.gnns]
            dwbS, dwbO = tape.gradient(loss, [wS, wO])
            dW = [i for j in dwbS + dwbO for i in j]
            W = [i for j in wS + wO for i in j]
            optimizer.apply_gradients(zip(dW, W))
            losses.append(float(loss))
            y_last = outs[-1]
            hits += int(np.sum(np.argmax(y, -1) == np.argmax(y_last.numpy(), -1)))
            count += y.shape[0]
        return float(np.mean(losses)), hits / count

    def ref_eval_seq(seq):
        losses, hits, count = [], 0, 0
        for i in range(len(seq)):
            x, y, sw = seq[i]
            inputs = ref_lgnn.process_inputs(x)
            out = ref_lgnn.Loop(*inputs, training=False)[2]
            y_pred = out[-1] if isinstance(out, (list, tuple)) else out
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