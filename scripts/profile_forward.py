"""Capture a jax.profiler trace of the flagship forward (utils/profiling's
trace-span annotations + the XLA device trace).  View with TensorBoard or
xprof: the transition iterations, the BCSR einsum and the compact readout
appear as named regions.

Usage: python scripts/profile_forward.py [--out /tmp/gnn_trace]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/gnn_trace")
    args = ap.parse_args()

    import bench as benchmod

    gnn, batch, n_arcs = benchmod.build_workload()

    @jax.jit
    def forward(variables, batch):
        k, state, bn = gnn.unfold(variables, batch, training=True)
        out, mask, _ = gnn.apply_output(variables, state, batch, training=False, rng=None)
        return out

    # warm up (compile outside the trace)
    _ = jnp.sum(forward(gnn.variables, batch)).block_until_ready()

    with jax.profiler.trace(args.out):
        for _ in range(10):
            out = forward(gnn.variables, batch)
        _ = float(jnp.sum(out))

    n_files = sum(len(fs) for _, _, fs in os.walk(args.out))
    print(f"trace written to {args.out} ({n_files} files)")


if __name__ == "__main__":
    main()
