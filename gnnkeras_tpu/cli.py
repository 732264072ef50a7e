"""Command-line entry point: train / evaluate / predict / export / bench a
GNN experiment from a ``GNNConfig`` JSON file and a dataset spec.

The reference has no CLI (its "entry scripts" are hand-edited starter
modules, README.md:30); this is the framework-grade equivalent of that
surface, driven by the same typed config the starters use:

    gnnkeras-tpu train  --dataset mutag --save model_dir/ --epochs 10
    gnnkeras-tpu train  --config exp.json --dataset tu:/data:PROTEINS \\
                        --checkpoint-dir ck/ --resume
    gnnkeras-tpu evaluate --model model_dir/ --config exp.json --dataset mutag
    gnnkeras-tpu predict  --model model_dir/ --config exp.json --dataset mutag \\
                          --out preds.npy
    gnnkeras-tpu export   --model model_dir/ --config exp.json --dataset mutag \\
                          --out artifact/
    gnnkeras-tpu bench

Dataset specs: ``mutag`` (the reference Mutagenicity dump, auto-located),
``mutag-composite``, or ``tu:<path>:<prefix>[:composite]`` for any TU-format
dump.  Splits follow the reference starters (shuffle + 2837/750/750,
``--split-seed``).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional

import numpy as np


def _load_dataset(spec: str, verbose: bool = True):
    from gnnkeras_tpu.data.mutag import load_mutag, load_tu_dataset

    if spec in ("mutag", "mutag-composite"):
        return load_mutag(composite=spec.endswith("composite"), verbose=verbose)
    if spec.startswith("tu:"):
        parts = spec.split(":")
        if len(parts) not in (3, 4) or (len(parts) == 4 and parts[3] != "composite"):
            raise SystemExit(f"bad dataset spec {spec!r} (want tu:<path>:<prefix>[:composite])")
        return load_tu_dataset(parts[1], parts[2], composite=len(parts) == 4, verbose=verbose)
    raise SystemExit(f"unknown dataset {spec!r} (mutag | mutag-composite | tu:<path>:<prefix>)")


def _config(args) -> "GNNConfig":
    from gnnkeras_tpu.config import GNNConfig

    if args.config:
        with open(args.config) as f:
            cfg = GNNConfig.from_json(f.read())
    else:
        cfg = GNNConfig()
    if getattr(args, "epochs", None) is not None:
        cfg.epochs = args.epochs
    # engine overrides (flagship transposed strip stack knobs)
    if getattr(args, "slot_pack", None) is not None:
        cfg.slot_pack = args.slot_pack
    if getattr(args, "strip_dtype", None) is not None:
        cfg.strip_dtype = args.strip_dtype
    if getattr(args, "transposed", None) is not None:
        cfg.transposed = {"auto": None, "on": True, "off": False}[args.transposed]
    if getattr(args, "agg_dtype", None) is not None:
        cfg.agg_dtype = None if args.agg_dtype == "none" else args.agg_dtype
    cfg.__post_init__()  # re-validate after CLI overrides
    return cfg


def _splits(graphs, cfg, args):
    from gnnkeras_tpu.data.mutag import dataset_splits, mutag_splits

    for g in graphs:
        g.setAggregation(cfg.aggregation_mode)
    # the reference's fixed 750/750 tail slices (starter.py:63-66) only make
    # sense at Mutagenicity scale; any other dataset gets proportional splits
    explicit = args.test_frac is not None or args.val_frac is not None
    if args.dataset.startswith("mutag") and not explicit:
        return mutag_splits(graphs, seed=args.split_seed)
    return dataset_splits(
        graphs, seed=args.split_seed,
        test_frac=args.test_frac if args.test_frac is not None else 750 / 4337,
        val_frac=args.val_frac if args.val_frac is not None else 750 / 4337,
    )


def _dims(graphs):
    g = graphs[0]
    dims = tuple(int(d) for d in g.DIM_NODE_LABEL)
    node_dim = dims if len(dims) > 1 or hasattr(g, "type_mask") else dims[0]
    return node_dim, int(g.DIM_ARC_LABEL), int(g.DIM_TARGET)


def _load_model(model_dir: str):
    """Generic loader: dispatch on the ``model_class`` recorded in
    config.json (models/base.py save format)."""
    import os

    from gnnkeras_tpu import models as M

    with open(os.path.join(model_dir, "config.json")) as f:
        name = json.load(f).get("model_class")
    cls = getattr(M, name, None)
    if cls is None:
        raise SystemExit(f"unknown model_class {name!r} in {model_dir}/config.json")
    return cls.load(model_dir)


def _train_parallel(par, cfg, model, tr, va, args, class_weight=None):
    """Drive one of the distributed engines from the CLI.  Every engine
    writes the trained weights back into ``model``, so evaluation and
    ``--save`` below run on the ordinary single-device surface."""
    import jax

    from gnnkeras_tpu.parallel.mesh import make_mesh

    n_dev = cfg.parallel_devices or len(jax.devices())
    epochs = cfg.epochs

    if par == "dp":
        from gnnkeras_tpu.parallel.data_parallel import DataParallelTrainer

        dp = DataParallelTrainer(model, make_mesh(("data",), devices=jax.devices()[:n_dev]))
        h = dp.fit(
            cfg.build_sequencer(tr), epochs=epochs,
            validation_data=cfg.build_sequencer(va, shuffle=False) if va else None,
            verbose=args.verbose, checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            class_weight=class_weight,
        )
        return {k: v[-1] for k, v in h.history.items()}

    from gnnkeras_tpu.graph.graph import GraphObject

    if par == "partitioned":
        from gnnkeras_tpu.parallel.partition import PartitionedGNN, partition_graph

        merged = type(tr[0]).merge(list(tr), focus=cfg.focus, aggregation_mode=cfg.aggregation_mode)
        # agg_dtype='auto' (the config default): per-shard banded int8
        # local operators when every shard factors exactly — the measured
        # 9.79B edges/s/chip partitioned engine (BASELINE.md round 4)
        pg = partition_graph(merged, n_dev, dense_blocks=True, agg_dtype=cfg.agg_dtype)
        pgnn = PartitionedGNN(model, make_mesh(("graph",), devices=jax.devices()[:n_dev]))
        h = pgnn.fit(pg, epochs=epochs, verbose=args.verbose,
                     validation_data=cfg.build_sequencer(va, shuffle=False) if va else None,
                     checkpoint_dir=args.checkpoint_dir, resume=args.resume,
                     class_weight=class_weight)
        return {k: v[-1] for k, v in h.items()}

    if par == "packed":
        from gnnkeras_tpu.parallel.packed import (
            PackedPartitionedGNN,
            PackedPartitionedLGNN,
            partition_packed,
        )

        merged = type(tr[0]).merge(list(tr), focus="g", aggregation_mode=cfg.aggregation_mode)
        # the packed route follows the config's strip storage (int8 default),
        # like the single-chip sequencer path — previously pinned to bf16
        stacked, _ = partition_packed(merged, n_dev, strip_dtype=cfg.strip_dtype)
        # an empty (--val-frac 0) or too-small validation split skips
        # validation instead of crashing the merge/partition below
        stacked_va = None
        if len(va) >= n_dev:
            merged_va = type(va[0]).merge(list(va), focus="g", aggregation_mode=cfg.aggregation_mode)
            stacked_va, _ = partition_packed(merged_va, n_dev, strip_dtype=cfg.strip_dtype)
        wrapper = PackedPartitionedLGNN if hasattr(model, "gnns") else PackedPartitionedGNN
        pgnn = wrapper(model, make_mesh(("graph",), devices=jax.devices()[:n_dev]))
        h = pgnn.fit(
            stacked, epochs=epochs, verbose=args.verbose,
            validation_data=stacked_va,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
            class_weight=class_weight,
        )
        return {k: v[-1] for k, v in h.items()}

    if par == "pipeline":
        from gnnkeras_tpu.graph.batch import graphs_to_batch
        from gnnkeras_tpu.parallel.pipeline import PipelineLGNN

        pp = PipelineLGNN(model, make_mesh(("stage",), devices=jax.devices()[:n_dev]))
        # two microbatches of uniform padded shape (GPipe needs >= 2 in flight)
        n_pad = max(sum(g.nodes.shape[0] for g in tr[i::2]) for i in range(2))
        a_pad = max(sum(g.arcs.shape[0] for g in tr[i::2]) for i in range(2))
        mbs = [
            graphs_to_batch(tr[i::2], cfg.focus, cfg.aggregation_mode,
                            pad_nodes=-(-n_pad // 8) * 8, pad_arcs=-(-a_pad // 8) * 8)
            for i in range(2)
        ]
        h = pp.fit([mbs], epochs=epochs, verbose=args.verbose,
                   validation_data=cfg.build_sequencer(va, shuffle=False) if va else None,
                   checkpoint_dir=args.checkpoint_dir, resume=args.resume,
                   class_weight=class_weight)
        return {k: v[-1] for k, v in h.items()}

    if par == "expert":
        from gnnkeras_tpu.parallel.expert import ExpertParallelCompositeGNN

        ep = ExpertParallelCompositeGNN(model, make_mesh(("expert",), devices=jax.devices()[:n_dev]))
        h = ep.fit(cfg.build_sequencer(tr), epochs=epochs, verbose=args.verbose,
                   validation_data=cfg.build_sequencer(va, shuffle=False) if va else None,
                   checkpoint_dir=args.checkpoint_dir, resume=args.resume,
                   class_weight=class_weight)
        return {k: v[-1] for k, v in h.items()}

    raise SystemExit(f"unknown --parallel {par!r}")


def cmd_train(args) -> int:
    cfg = _config(args)
    if args.parallel is not None:
        cfg.parallel = args.parallel
    if args.parallel_devices is not None:
        cfg.parallel_devices = args.parallel_devices
    cfg.__post_init__()  # re-validate the CLI overrides
    class_weight = None
    if args.class_weight:
        class_weight = {int(k): float(v) for k, v in json.loads(args.class_weight).items()}
    graphs = _load_dataset(args.dataset, verbose=args.verbose > 0)
    tr, te, va = _splits(graphs, cfg, args)
    node_dim, arc_dim, t_dim = _dims(graphs)
    model = cfg.build_model(node_dim, arc_dim, t_dim)
    if cfg.parallel != "none":
        final_train = _train_parallel(cfg.parallel, cfg, model, tr, va, args, class_weight)
    else:
        history = model.fit(
            cfg.build_sequencer(tr),
            epochs=cfg.epochs,
            validation_data=cfg.build_sequencer(va, shuffle=False) if va else None,
            verbose=args.verbose,
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
            class_weight=class_weight,
        )
        final_train = {k: v[-1] for k, v in history.history.items()}
    logs = model.evaluate(cfg.build_sequencer(te, shuffle=False), verbose=args.verbose)
    print(json.dumps({"test": logs, "final_train": final_train}))
    if args.save:
        model.save(args.save)
        print(f"saved model to {args.save}", file=sys.stderr)
    return 0


def _restore(args):
    cfg = _config(args)
    graphs = _load_dataset(args.dataset, verbose=args.verbose > 0)
    tr, te, va = _splits(graphs, cfg, args)
    model = _load_model(args.model)
    # loaded models bypass build_model, so the engine override must be
    # applied here too or --transposed would be silently ignored on
    # evaluate/predict/export
    if cfg.transposed is not None:
        for g in (model.gnns if hasattr(model, "gnns") else [model]):
            g.transposed = cfg.transposed
    model.compile(optimizer=cfg.optimizer, loss=cfg.loss, metrics=list(cfg.metrics))
    return cfg, model, (tr, te, va)


def cmd_evaluate(args) -> int:
    cfg, model, (_, te, _) = _restore(args)
    print(json.dumps(model.evaluate(cfg.build_sequencer(te, shuffle=False), verbose=args.verbose)))
    return 0


def cmd_predict(args) -> int:
    cfg, model, (_, te, _) = _restore(args)
    preds = model.predict(cfg.build_sequencer(te, shuffle=False))
    if args.out:
        np.save(args.out, preds)
        print(f"wrote {preds.shape} predictions to {args.out}", file=sys.stderr)
    else:
        np.savetxt(sys.stdout, preds, fmt="%.6g")
    return 0


def cmd_export(args) -> int:
    from gnnkeras_tpu.serving import export_forward

    cfg, model, (tr, _, _) = _restore(args)
    seq = cfg.build_sequencer(tr[: cfg.batch_size], shuffle=False)
    export_forward(model, seq[0], args.out)
    print(f"exported StableHLO artifact to {args.out}", file=sys.stderr)
    return 0


def cmd_bench(args) -> int:
    import runpy
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    if not os.path.exists(path):  # installed wheel: the repo-root benchmark is not shipped
        raise SystemExit(
            "gnnkeras-tpu bench runs the repository benchmark (bench.py at the repo "
            "root) and needs a source checkout; it is not part of the installed package"
        )
    runpy.run_path(path, run_name="__main__")
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="gnnkeras-tpu", description=__doc__.split("\n")[0])
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p, model=False, needs_out=False):
        p.add_argument("--config", help="GNNConfig JSON file (defaults: starter surface)")
        p.add_argument("--dataset", default="mutag", help="mutag | mutag-composite | tu:<path>:<prefix>[:composite]")
        p.add_argument("--split-seed", type=int, default=42, help="reference starter split shuffle seed")
        p.add_argument("--test-frac", type=float, default=None,
                       help="test split fraction (default: reference proportions; mutag uses the exact 750-graph slices)")
        p.add_argument("--val-frac", type=float, default=None,
                       help="validation split fraction (see --test-frac)")
        p.add_argument("--verbose", type=int, default=1)
        p.add_argument("--slot-pack", type=int, default=None, choices=[0, 128],
                       help="sequencer slot packing (0 = off, 128 = strip engine; "
                            "default: auto — 128 for graph-focused runs)")
        p.add_argument("--strip-dtype", default=None,
                       choices=["int8", "bfloat16", "float32"],
                       help="strip operator storage (default: config, int8)")
        p.add_argument("--transposed", default=None, choices=["auto", "on", "off"],
                       help="feature-major unfold engine (default: auto)")
        p.add_argument("--agg-dtype", default=None,
                       choices=["auto", "int8", "bfloat16", "float32", "none"],
                       help="single-graph aggregation-operator storage "
                            "(default: auto — banded int8 only when the "
                            "factorization is exact; 'none' = plain float)")
        if model:
            p.add_argument("--model", required=True, help="saved model directory")
        if needs_out:
            p.add_argument("--out", required=needs_out == "required", help="output path")

    p = sub.add_parser("train", help="train from a config, print test metrics as JSON")
    common(p)
    p.add_argument("--epochs", type=int, default=None, help="override config epochs")
    p.add_argument("--save", help="save the trained model to this directory")
    p.add_argument("--checkpoint-dir", help="resumable Orbax checkpoints")
    p.add_argument("--resume", action="store_true", help="resume from --checkpoint-dir")
    p.add_argument("--parallel", default=None,
                   choices=["none", "dp", "partitioned", "packed", "pipeline", "expert"],
                   help="distributed engine (overrides config.parallel)")
    p.add_argument("--parallel-devices", type=int, default=None,
                   help="devices for --parallel (default: all visible)")
    p.add_argument("--class-weight", default=None,
                   help='JSON {class index: weight}, e.g. \'{"0": 2.0}\' (Keras fit semantics)')
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("evaluate", help="evaluate a saved model on the test split")
    common(p, model=True)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("predict", help="predictions for the test split (npy or stdout)")
    common(p, model=True, needs_out=True)
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("export", help="export a StableHLO serving artifact")
    common(p, model=True, needs_out="required")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("bench", help="run the repo benchmark (one JSON line)")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
