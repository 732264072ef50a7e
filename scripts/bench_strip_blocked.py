"""Experiment: K-tiles-per-grid-step blocking of the compact-strip kernel.

The round-2 strip kernel (scripts/bench_pallas_compact.py) reads 4x fewer
HBM bytes than the production 128x128 einsum but measured 2x SLOWER
(0.204 vs 0.098 ms/iter): its grid has one step per 128-node tile (~1000
steps on merged Mutagenicity), and each step does only one tiny
(16,128)@(128,128) matmul -- per-grid-step overhead dominates.  This
experiment processes K tiles per grid step (strips block (K,32,128), state
block (16, K*128), K unrolled expand+matmul pairs inside), amortizing the
step overhead by K while keeping the 4x byte saving.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts.bench_pallas_compact import build, timeit, TILE, SLOT


def _blocked_kernel(k_tiles: int):
    def kernel(strip_ref, state_ref, out_ref):
        col_group = jax.lax.broadcasted_iota(jnp.int32, (SLOT, TILE), 1) // SLOT
        for k in range(k_tiles):
            a = strip_ref[k]  # (SLOT, TILE)
            parts = [a * (col_group == g_i).astype(a.dtype) for g_i in range(TILE // SLOT)]
            bd = jnp.concatenate(parts, axis=0)  # (TILE, TILE)
            x = state_ref[:, k * TILE : (k + 1) * TILE]
            out_ref[:, k * TILE : (k + 1) * TILE] = jnp.dot(
                x.astype(bd.dtype), bd, preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)

    return kernel


def blocked_aggregate(state_t: jax.Array, strip: jax.Array, k_tiles: int) -> jax.Array:
    d_sub, n = state_t.shape
    t = strip.shape[0]
    assert n == t * TILE and t % k_tiles == 0
    return pl.pallas_call(
        _blocked_kernel(k_tiles),
        out_shape=jax.ShapeDtypeStruct((d_sub, n), state_t.dtype),
        grid=(t // k_tiles,),
        in_specs=[
            pl.BlockSpec((k_tiles, SLOT, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_sub, k_tiles * TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d_sub, k_tiles * TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(strip, state_t)


def main():
    strip, N, src, dst, w, in_slot = build()
    t = strip.shape[0]
    d, d_sub = 14, 16
    rng = np.random.default_rng(0)
    state_t = rng.standard_normal((d_sub, N)).astype(np.float32)
    state_t[d:] = 0.0
    n_edges = int(in_slot.sum())

    # correctness at K=8 (pad T to a multiple)
    k0 = 8
    t_pad = ((t + k0 - 1) // k0) * k0
    strip_p = np.zeros((t_pad, SLOT, TILE), np.float32)
    strip_p[:t] = strip
    st_p = np.zeros((d_sub, t_pad * TILE), np.float32)
    st_p[:, :N] = state_t
    ref = np.zeros((d_sub, N), np.float32)
    s_, d2, w2 = src[in_slot], dst[in_slot], w[in_slot]
    np.add.at(ref.T, d2, (state_t[:, s_] * w2).T)
    got = np.asarray(blocked_aggregate(jnp.asarray(st_p), jnp.asarray(strip_p), k0))[:, :N]
    print(f"blocked K={k0} correctness: max err {np.max(np.abs(got - ref)):.2e}")

    for k in (2, 4, 8, 16, 32):
        t_pad = ((t + k - 1) // k) * k
        sp = np.zeros((t_pad, SLOT, TILE), np.float32)
        sp[:t] = strip
        stp = np.zeros((d_sub, t_pad * TILE), np.float32)
        stp[:, :N] = state_t
        timeit(lambda st, s, k=k: blocked_aggregate(st, s, k), (stp, sp), n_edges, f"blocked_f32 K={k}")
        timeit(
            lambda st, s, k=k: blocked_aggregate(st, s, k),
            (stp, sp.astype(jnp.bfloat16)),
            n_edges,
            f"blocked_bf16 K={k}",
        )


if __name__ == "__main__":
    main()
