"""MUTAG accuracy sweep driver: train one CLGNN configuration end-to-end and
print its test metrics as a JSON line.

The repo's best recorded MUTAG test accuracy (BASELINE.md) is the 5-layer
parallel CLGNN, dim_state=10, 40 epochs + EarlyStopping(val_accuracy,
patience 10, restore_best) → 0.711.  This script parameterizes that recipe
(state width, hidden layers, dropout, LR schedule, seed) so variants can be
compared on equal footing — same split, same protocol.

    python scripts/sweep_mutag.py --name base
    python scripts/sweep_mutag.py --name wide --dim-state 20
    python scripts/sweep_mutag.py --name deep --hidden 20
    python scripts/sweep_mutag.py --name drop --dropout 0.1
    python scripts/sweep_mutag.py --name rlrop --reduce-lr
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gnnkeras_tpu import (
    CompositeGNNgraphBased,
    CompositeLGNN,
    CompositeMultiGraphSequencer,
    MLP,
    get_inout_dims,
)
from gnnkeras_tpu.data.mutag import load_mutag, mutag_splits
from gnnkeras_tpu.training.callbacks import EarlyStopping, ReduceLROnPlateau


def build_lgnn(g, args):
    layers = args.layers
    nets_st = []
    for i in range(layers):
        inp_s, layers_s = get_inout_dims(
            "state", g.DIM_NODE_LABEL, g.DIM_ARC_LABEL, g.DIM_TARGET,
            "g", args.dim_state, layer=i, get_state=True, get_output=True,
        )
        spec = ([args.hidden] if args.hidden else []) + list(layers_s)
        acts = ["selu"] * len(spec)
        # with a hidden layer: dropout between hidden and state output;
        # otherwise: input dropout (pos indexes the Dense stack)
        dropout = (
            dict(dropout_rate=args.dropout, dropout_pos=1 if args.hidden else 0)
            if args.dropout else {}
        )
        nets_st.append([
            MLP(input_dim=shape, layers=spec, activations=acts,
                kernel_initializer="lecun_normal", bias_initializer="lecun_normal",
                name=f"state_{i}_{t}", **dropout)
            for t, shape in enumerate(inp_s)
        ])
    def out_net(i):
        return MLP(input_dim=(args.dim_state,), layers=[g.DIM_TARGET], activations="softmax",
                   kernel_initializer="glorot_normal", bias_initializer="glorot_normal",
                   name=f"out_{i}")
    return CompositeLGNN(
        [CompositeGNNgraphBased(s, out_net(i), args.dim_state, args.max_iter, 0.01)
         for i, s in enumerate(nets_st)],
        True, True,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="run")
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--dim-state", type=int, default=10)
    p.add_argument("--max-iter", type=int, default=5)
    p.add_argument("--hidden", type=int, default=0, help="extra hidden width in the state nets")
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--reduce-lr", action="store_true")
    p.add_argument("--batch-size", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--split-seed", type=int, default=None, help="default: starter protocol (global shuffle)")
    args = p.parse_args()

    graphs = load_mutag(composite=True, verbose=False)
    for g in graphs:
        g.setAggregation("average")
    gTr, gTe, gVa = mutag_splits(graphs, seed=args.split_seed)

    lgnn = build_lgnn(gTr[0], args)
    lgnn.compile(optimizer=f"adam:{args.lr}", loss="categorical_crossentropy",
                 metrics=["accuracy"], training_mode="parallel")

    seq = CompositeMultiGraphSequencer(gTr, "g", "average", args.batch_size)
    val = CompositeMultiGraphSequencer(gVa, "g", "average", args.batch_size, shuffle=False)
    cbs = [EarlyStopping(monitor="val_accuracy", mode="max", patience=args.patience,
                         restore_best_weights=True)]
    if args.reduce_lr:
        cbs.append(ReduceLROnPlateau(monitor="val_loss", factor=0.5, patience=4, min_lr=1e-4))

    t0 = time.time()
    h = lgnn.fit(seq, epochs=args.epochs, validation_data=val, callbacks=cbs, verbose=0, seed=args.seed)
    test = lgnn.evaluate(CompositeMultiGraphSequencer(gTe, "g", "average", args.batch_size, shuffle=False), verbose=0)
    print(json.dumps({
        "name": args.name,
        "test_accuracy": round(float(test["accuracy"]), 4),
        "test_loss": round(float(test["loss"]), 4),
        "best_val_accuracy": round(float(np.max(h.history.get("val_accuracy", [0]))), 4),
        "epochs_ran": len(h.history["loss"]),
        "wall_s": round(time.time() - t0, 1),
        "config": {k: v for k, v in vars(args).items() if k != "name"},
    }))


if __name__ == "__main__":
    main()
