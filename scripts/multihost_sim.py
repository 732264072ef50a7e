"""Two-PROCESS multi-host simulation of the hybrid data(DCN) x graph(ICI) step.

The single-process ``TestMultiHost`` run shapes the mesh like a 2-host slice
but all collectives stay in one runtime.  This script runs the REAL
multi-process path: two OS processes, each owning 4 CPU devices, bootstrapped
through ``jax.distributed`` (Gloo transport standing in for DCN), building the
mesh via ``make_multihost_mesh``'s process-grouped branch (CPU devices carry
no slice topology; a real multi-SLICE TPU run takes the
``create_hybrid_device_mesh`` branch instead, parallel/multihost.py:46-80).
The
per-step loss must match the single-process simulation bit-for-bit (same
seeds, same program), which the test suite asserts
(tests/test_parallel.py TestMultiHostProcess).

Usage:
  python scripts/multihost_sim.py --launch            # spawn both workers
  python scripts/multihost_sim.py --process-id 0|1    # one worker (internal)

No reference counterpart: the reference is single-process eager TF
(SURVEY.md §2 "Parallelism statement").
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

DEVICES_PER_HOST = 4
N_HOSTS = 2
STEPS = 3


def build_problem():
    """Deterministic model + 2 partitioned graphs (one per data shard)."""
    import numpy as np

    from gnnkeras_tpu.graph.graph import GraphObject
    from gnnkeras_tpu.models.gnn import GNNnodeBased
    from gnnkeras_tpu.models.mlp import MLP, get_inout_dims
    from gnnkeras_tpu.parallel.hybrid import stack_partitioned
    from gnnkeras_tpu.parallel.partition import partition_graph

    def one_graph(seed):
        r = np.random.default_rng(seed)
        n = 32
        src = np.repeat(np.arange(n), 2)
        dst = (src + np.tile([1, 2], n)) % n
        arcs = np.concatenate([np.stack([src, dst], 1), r.normal(size=(len(src), 2))], axis=1)
        return GraphObject(
            nodes=r.normal(size=(n, 3)), arcs=arcs, targets=r.normal(size=(n, 2)),
            focus="n", aggregation_mode="average",
        )

    inp_s, layers_s = get_inout_dims("state", 3, 2, 2, "n", 0)
    inp_o, layers_o = get_inout_dims("output", 3, 2, 2, "n", 0)
    gnn = GNNnodeBased(
        MLP(input_dim=inp_s[0], layers=layers_s, activations="tanh",
            kernel_initializer="lecun_normal", bias_initializer="lecun_normal"),
        MLP(input_dim=inp_o[0], layers=layers_o, activations="linear",
            kernel_initializer="glorot_normal", bias_initializer="zeros"),
        0, 6, 0.01,
    )
    gnn.compile(optimizer="sgd:0.1", loss="mse")
    gnn.build(seed=1)
    gnn._opt_state = gnn.optimizer.init(gnn.variables["params"])

    pgs = [partition_graph(one_graph(s), DEVICES_PER_HOST) for s in range(N_HOSTS)]
    return gnn, stack_partitioned(pgs)


def run_steps(mesh, steps: int = STEPS):
    """``steps`` hybrid train steps; returns (losses, |params| checksum)."""
    import numpy as np

    from gnnkeras_tpu.parallel.hybrid import make_hybrid_train_step
    from gnnkeras_tpu.parallel.partition import PartitionedGNN

    gnn, stacked = build_problem()
    pgnn = PartitionedGNN(gnn, mesh)
    step = make_hybrid_train_step(pgnn, mesh)
    params, mstate, opt = gnn.variables["params"], gnn.variables["state"], gnn._opt_state
    losses = []
    for i in range(steps):
        params, mstate, opt, logs = step(params, mstate, opt, stacked, jax.random.PRNGKey(i))
        losses.append(float(np.asarray(logs["loss"].addressable_data(0))))
    checksum = float(
        sum(float(np.abs(np.asarray(x.addressable_data(0))).sum())
            for x in jax.tree_util.tree_leaves(params))
    )
    return losses, checksum


def time_steps(mesh, data_shards: int, n_timed: int = 10):
    """Median wall-clock of one hybrid step (after warmup) on ``mesh``; the
    scaling-efficiency measurement path of the BASELINE 1→2-host target —
    per-host work is constant (one partitioned graph per data shard), so
    perfect scaling is equal step time at 1 and N hosts."""
    import time

    import numpy as np

    from gnnkeras_tpu.parallel.hybrid import make_hybrid_train_step
    from gnnkeras_tpu.parallel.partition import PartitionedGNN

    gnn, stacked1 = build_problem()
    if data_shards == 1:
        stacked = jax.tree_util.tree_map(lambda x: x[:1], stacked1)
    else:
        stacked = stacked1
    pgnn = PartitionedGNN(gnn, mesh)
    step = make_hybrid_train_step(pgnn, mesh)
    params, mstate, opt = gnn.variables["params"], gnn.variables["state"], gnn._opt_state
    for i in range(3):  # warmup + compile
        params, mstate, opt, logs = step(params, mstate, opt, stacked, jax.random.PRNGKey(i))
    _ = np.asarray(logs["loss"].addressable_data(0))
    times = []
    for i in range(n_timed):
        t0 = time.perf_counter()
        params, mstate, opt, logs = step(params, mstate, opt, stacked, jax.random.PRNGKey(i))
        _ = np.asarray(logs["loss"].addressable_data(0))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def worker(process_id: int, port: int, bench: bool = False) -> None:
    jax.config.update("jax_num_cpu_devices", DEVICES_PER_HOST)
    from gnnkeras_tpu.parallel.multihost import initialize_multihost, make_multihost_mesh

    initialize_multihost(f"localhost:{port}", N_HOSTS, process_id)
    assert jax.process_count() == N_HOSTS
    assert jax.local_device_count() == DEVICES_PER_HOST
    mesh = make_multihost_mesh(N_HOSTS, DEVICES_PER_HOST)
    if bench:
        dt = time_steps(mesh, data_shards=N_HOSTS)
        print(json.dumps({"process": process_id, "step_seconds": dt}), flush=True)
        return
    losses, checksum = run_steps(mesh)
    print(json.dumps({"process": process_id, "losses": losses, "checksum": checksum}), flush=True)


def launch(port: int, bench: bool = False):
    """Spawn both workers; returns their parsed JSON reports."""
    env = dict(os.environ)
    # the workers run this file as a script (sys.path[0] = scripts/), so the
    # package root must ride PYTHONPATH explicitly
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    extra = ["--bench"] if bench else []
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--process-id", str(i), "--port", str(port)]
            + extra,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(N_HOSTS)
    ]
    reports = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            if p.returncode != 0:
                raise RuntimeError(f"worker failed rc={p.returncode}:\n{err[-3000:]}")
            line = [l for l in out.splitlines() if l.startswith("{")][-1]
            reports.append(json.loads(line))
    finally:
        for p in procs:  # a dead peer must not leave the other blocked on the rendezvous
            if p.poll() is None:
                p.kill()
    return reports


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--port", type=int, default=12473)
    ap.add_argument("--launch", action="store_true")
    ap.add_argument("--bench", action="store_true",
                    help="measure 1-host vs 2-host step time (weak scaling: "
                         "one partitioned graph per host) and report the "
                         "scaling efficiency — the BASELINE 1→2-host metric's "
                         "measurement path, here over CPU+Gloo")
    args = ap.parse_args()
    if args.process_id is not None:
        worker(args.process_id, args.port, bench=args.bench)
        return
    if args.bench:
        jax.config.update("jax_num_cpu_devices", DEVICES_PER_HOST)
        from gnnkeras_tpu.parallel.multihost import make_multihost_mesh

        t1 = time_steps(make_multihost_mesh(1, DEVICES_PER_HOST), data_shards=1)
        reports = launch(args.port, bench=True)
        t2 = max(r["step_seconds"] for r in reports)
        print(json.dumps({
            "one_host_step_s": t1,
            "two_host_step_s": t2,
            "weak_scaling_efficiency": t1 / t2,
            "transport": "gloo-cpu (stands in for DCN)",
        }, indent=2))
        return
    reports = launch(args.port)
    print(json.dumps(reports, indent=2))
    assert reports[0]["losses"] == reports[1]["losses"], "processes disagree"
    print("2-process multi-host simulation: losses agree across processes")


if __name__ == "__main__":
    main()
