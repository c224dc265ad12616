"""REAL-TPU verification of the Pallas reverse-table build + its consumer.

Mosaic's window-param/memory passes run only in the remote backend compile
(CLAUDE.md), so interpret/lower green is not enough: execute the kernel
for real at a small-but-tiled spec and check (a) bit-identity vs the XLA
contract path, (b) the backward window matmul consuming the [T, 9W, QB]
layout matches the oracle gather gradient.

Run from /root/repo (TPU): python benchmarks/verify_rev_kernel_tpu.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        CellBlockSpec,
        build_cellblock,
        cellblock_aggregate,
        sort_neighbors,
    )
    from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic

    print("backend:", jax.default_backend(), flush=True)
    spec = CellBlockSpec(
        grid_size=6, col_capacity=160, query_block=32, window=128,
        wrap_cap=48, h_block=128,
    )
    rng = np.random.default_rng(11)
    n, k, h = 3000, 4, 16
    pos = jnp.asarray(rng.uniform(0, 1.0, size=(n, 3)), jnp.float32)
    nbr = knn_periodic(pos, k, 1.0)
    z = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)

    a = jax.jit(
        lambda p, nb: build_cellblock(
            p, nb, 1.0, spec, with_reverse=True, s_build="contract"
        )
    )(pos, nbr)
    b = jax.jit(
        lambda p, nb: build_cellblock(
            p, nb, 1.0, spec, with_reverse=True, s_build="kernel"
        )
    )(pos, nbr)
    srt_a = np.asarray(a.s_rev_table)
    srt_b = np.asarray(b.s_rev_table)
    assert srt_a.shape == srt_b.shape, (srt_a.shape, srt_b.shape)
    assert np.array_equal(srt_a, srt_b), (
        f"reverse tables differ: {np.sum(srt_a != srt_b)} entries"
    )
    assert int(b.reverse_mismatch) == 0, int(b.reverse_mismatch)
    assert np.array_equal(np.asarray(a.s_table), np.asarray(b.s_table))
    print("reverse kernel == contract (bit-identical), mismatch 0",
          flush=True)

    # Backward through the aggregation: the reverse matmul consumes the
    # [T, 9W, rev_lanes] table on the MXU. Integer-valued cotangents are
    # exactly representable in bf16 and their small-int x int8 products
    # accumulate exactly in f32, so the VJP must match the f32 transpose
    # oracle EXACTLY — any missing/duplicated/misplaced edge shows as an
    # integer deviation (bf16 noise cannot hide it).
    nbr_sorted = sort_neighbors(nbr, b.order)
    z_sorted = jnp.take(z, b.order, axis=0)
    gr_int = jnp.asarray(
        rng.integers(-8, 9, size=(n, h)), jnp.float32
    )

    def agg_cb(zz):
        return cellblock_aggregate(
            zz, b, spec, out_dtype=jnp.float32, carry_dtype=jnp.bfloat16,
        )

    _, vjp = jax.vjp(agg_cb, z_sorted.astype(jnp.bfloat16))
    (dz,) = jax.jit(vjp)(gr_int)
    # Oracle transpose: dz[j] = sum of gr over receivers listing j.
    dz_or = (
        jnp.zeros((n + 1, h), jnp.float32)
        .at[nbr_sorted.reshape(-1)]
        .add(jnp.repeat(gr_int, nbr_sorted.shape[1], axis=0))[:n]
    )
    dz_or = np.asarray(jax.jit(lambda: dz_or)())
    mism = int(np.sum(np.asarray(dz, np.float32) != dz_or))
    print(f"backward exact-integer mismatches: {mism}", flush=True)
    assert mism == 0, mism
    print("OK", flush=True)


if __name__ == "__main__":
    main()
