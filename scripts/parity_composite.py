"""Composite-GNN training parity: this framework vs the reference.

Trains a graph-focused CompositeGNN (the starter_composite.py config family:
1-type composite MUTAG, dim_state=10, max_iter=5) in BOTH frameworks from the
same transplanted initial weights on the same batches, and injects OUR
per-step random state inits (0.1·N(0,1), reference GNN.py:257 /
CompositeGNN.py:256) into the reference's ``tf.random.normal`` so the two
trajectories are comparable step for step despite dim_state > 0.

The reference's own composite starter cannot run (load_MUTAG.py:59 passes a
``dim_node_features`` kwarg its constructor doesn't accept), so the reference
side reproduces CompositeGNN.train_step verbatim (CompositeGNN.py:277-306
analog) with a manual eager loop, exactly like scripts/parity_mutag.py does
for the homogeneous model.

Run on CPU (deterministic f32):  python scripts/parity_composite.py --epochs 3
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--batch-size", type=int, default=500)
    parser.add_argument("--dim-state", type=int, default=10)
    args = parser.parse_args()

    import jax

    if jax.default_backend() != "cpu":
        print(f"note: running on {jax.default_backend()} — CPU recommended for exact parity")

    from gnnkeras_tpu.data.mutag import load_mutag, mutag_splits
    from gnnkeras_tpu.data.sequencers import CompositeMultiGraphSequencer
    from gnnkeras_tpu.models.composite import CompositeGNNgraphBased
    from gnnkeras_tpu.models.mlp import MLP, get_inout_dims

    ds = args.dim_state
    graphs = load_mutag(composite=True)
    for g in graphs:
        g.setAggregation("average")
    gTr, gTe, _ = mutag_splits(graphs, seed=args.seed)
    print(f"split: train {len(gTr)} / test {len(gTe)}  dim_state={ds}")

    inp_s, layers_s = get_inout_dims("state", (14,), 3, 2, "g", ds)
    net_st = [MLP(input_dim=inp_s[0], layers=layers_s, activations="selu",
                  kernel_initializer="lecun_normal", bias_initializer="lecun_normal")]
    net_out = MLP(input_dim=(ds,), layers=[2], activations="softmax",
                  kernel_initializer="glorot_normal", bias_initializer="glorot_normal")
    ours = CompositeGNNgraphBased(net_st, net_out, ds, 5, 0.01)
    ours.compile(optimizer="adam:0.01", loss="categorical_crossentropy", metrics=["accuracy"])
    ours.build(seed=7)
    init_vars = jax.tree_util.tree_map(lambda x: np.asarray(x), ours.variables)

    # tile_pack=False keeps padded row r == merged row r, so the injected
    # reference inits align with ours row for row
    seqTr = CompositeMultiGraphSequencer(gTr, "g", "average", args.batch_size,
                                         shuffle=False, tile_pack=False)
    seqTe = CompositeMultiGraphSequencer(gTe, "g", "average", args.batch_size,
                                         shuffle=False, tile_pack=False)

    # record every rng our fit/evaluate consumes (one per step, in order)
    import jax.random as jrandom

    used_rngs = []
    orig_next = type(ours).next_rng

    def recording_next(self):
        sub = orig_next(self)
        used_rngs.append(np.asarray(sub))
        return sub

    type(ours).next_rng = recording_next
    try:
        ours._rng = jrandom.PRNGKey(123)
        t0 = time.time()
        ours.fit(seqTr, epochs=args.epochs, verbose=1)
        ours_time = time.time() - t0
        ours_eval = ours.evaluate(seqTe)
    finally:
        type(ours).next_rng = orig_next
    print(f"\nOURS:      test acc {ours_eval['accuracy']:.4f}  loss {ours_eval['loss']:.4f}  ({ours_time:.1f}s)")

    # materialize the state inits those rngs produced: forward() splits the
    # per-step rng into (rng_loop, rng_out) and the unfold draws
    # 0.1*normal(rng_loop, (N_pad, ds)) over the PADDED rows
    # (models/gnn.py forward); reference gets rows [:n]
    pad_nodes = seqTr.batches[0].num_nodes
    pad_nodes_te = seqTe.batches[0].num_nodes
    n_tr_steps = len(seqTr) * args.epochs
    inits = [np.asarray(0.1 * jrandom.normal(jrandom.split(jax.numpy.asarray(k))[0],
                                             (pad_nodes if i < n_tr_steps else pad_nodes_te, ds),
                                             dtype=np.float32))
             for i, k in enumerate(used_rngs)]

    # ---- reference, same weights, same batches, same inits -----------------
    sys.path.insert(0, "/root/reference")
    import tensorflow as tf
    from scipy.sparse import coo_matrix

    from GNN.Models.CompositeGNN import CompositeGNNgraphBased as RefCGNN
    from GNN.Models.MLP import MLP as RefMLP
    from GNN.composite_graph_class import (
        CompositeGraphObject as RefCGO,
        CompositeGraphTensor as RefCGT,
    )
    from GNN.graph_class import GraphObject as RefGO

    RefGO.buildAdjacency = lambda self: coo_matrix(
        (self.ArcNode.data, (self.arcs[:, 0].astype(int), self.arcs[:, 1].astype(int))),
        shape=(self.nodes.shape[0],) * 2, dtype=self.dtype,
    )

    ref_st = RefMLP(input_dim=inp_s[0], layers=[int(u) for u in np.ravel(layers_s)], activations="selu",
                    kernel_initializer="lecun_normal", bias_initializer="lecun_normal")
    ref_out = RefMLP(input_dim=(ds,), layers=[2], activations="softmax",
                     kernel_initializer="glorot_normal", bias_initializer="glorot_normal")

    def set_ref_weights(keras_model, mlp, variables):
        k_layers = list(keras_model.layers)
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

    set_ref_weights(ref_st, net_st[0],
                    {"params": init_vars["params"]["net_state"][0], "state": init_vars["state"]["net_state"][0]})
    set_ref_weights(ref_out, net_out,
                    {"params": init_vars["params"]["net_output"], "state": init_vars["state"]["net_output"]})

    ref_cgnn = RefCGNN([ref_st], ref_out, ds, 5, 0.01)

    def to_ref(g):
        return RefCGO(nodes=g.nodes.copy(), arcs=g.arcs.copy(), targets=g.targets.copy(),
                      type_mask=g.type_mask.copy(), dim_node_label=(14,),
                      focus="g", aggregation_mode="average")

    def batches_of(graphs_list):
        merged = []
        for i in range(0, len(graphs_list), args.batch_size):
            merged.append(RefCGO.merge([to_ref(g) for g in graphs_list[i : i + args.batch_size]],
                                       focus="g", aggregation_mode="average"))
        return [RefCGT.fromGraphObject(m) for m in merged]

    ref_tr = batches_of(gTr)
    ref_te = batches_of(gTe)

    init_queue = list(inits)
    original_normal = tf.random.normal

    def injected_normal(shape, stddev=0.1, dtype=None, **kw):
        vals = init_queue.pop(0)
        return tf.constant(vals[: int(shape[0])])

    optimizer = tf.optimizers.Adam(learning_rate=0.01)
    cce = tf.keras.losses.categorical_crossentropy

    def loop(gt, training):
        return ref_cgnn.Loop(gt.nodes, gt.arcs, gt.DIM_NODE_LABEL, gt.type_mask,
                             gt.set_mask, gt.output_mask, gt.CompositeAdjacencies,
                             gt.Adjacency, gt.ArcNode, gt.NodeGraph, training=training)

    def targets_of(gt):
        return gt.targets.numpy() if hasattr(gt.targets, "numpy") else np.asarray(gt.targets)

    tf.random.normal = injected_normal
    try:
        t0 = time.time()
        for epoch in range(args.epochs):
            losses, hits, count = [], 0, 0
            for gt in ref_tr:
                y = targets_of(gt)
                with tf.GradientTape() as tape:
                    k, state, y_pred = loop(gt, training=True)
                    loss = tf.reduce_mean(cce(y, y_pred))
                wS = [v for net in ref_cgnn.net_state for v in net.trainable_variables]
                wO = ref_cgnn.net_output.trainable_variables
                dwS, dwO = tape.gradient(loss, [wS, wO])
                optimizer.apply_gradients(zip(dwS + dwO, wS + wO))
                losses.append(float(loss))
                hits += int(np.sum(np.argmax(y, -1) == np.argmax(y_pred.numpy(), -1)))
                count += y.shape[0]
            print(f"[ref] Epoch {epoch + 1}/{args.epochs} loss: {np.mean(losses):.4f} - "
                  f"accuracy: {hits / count:.4f}")
        ref_time = time.time() - t0

        losses, hits, count = [], 0, 0
        for gt in ref_te:
            y = targets_of(gt)
            y_pred = loop(gt, training=False)[2]
            losses.append(float(tf.reduce_mean(cce(y, y_pred))))
            hits += int(np.sum(np.argmax(y, -1) == np.argmax(y_pred.numpy(), -1)))
            count += y.shape[0]
    finally:
        tf.random.normal = original_normal

    print(f"REFERENCE: test acc {hits / count:.4f}  loss {np.mean(losses):.4f}  ({ref_time:.1f}s)")
    print(f"\ninit queue leftover: {len(init_queue)} (0 = both sides consumed the same randomness)")


if __name__ == "__main__":
    main()
