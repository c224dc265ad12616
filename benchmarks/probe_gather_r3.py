"""Probe: what makes the flagship aggregation gather fast?

The N=65k step is gather-bound: take(z[65k,128]bf16, nbr[65k,16]).sum(1)
measures 2.50 ms (107 GB/s effective, 420 Mrows/s) — 10 MP steps = 23 ms
of the 44 ms rollout step. This probes:

  * H-chunked gathers (2x64, 4x32 lanes): does rows/s rise enough with
    smaller rows for chunking to win?
  * f32 vs bf16 rows at each width
  * the existing streamed cell-block kernel at a flagship-shaped spec
  * build_cellblock (forward) cost at that spec — the per-re-neighbor
    price any cell-block flagship path must pay
  * sorted vs unsorted neighbor indices (cell-sorted rows: monotone-ish)

Run from /root/repo (TPU): python benchmarks/probe_gather_r3.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 65536
K = 16
H = 128
REPS = 3


def marginal(make_fn, k_short=4, k_long=12):
    f_s, f_l = make_fn(k_short), make_fn(k_long)

    def best_of(f):
        float(f(0.0).reshape(()))
        best = float("inf")
        for rep in range(REPS):
            t0 = time.perf_counter()
            float(f((rep + 1) * 1e-6).reshape(()))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(f_l) - best_of(f_s)) / (k_long - k_short)


def main():
    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import pallas_cell_list_knn

    rng = np.random.default_rng(0)
    positions = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    grid = choose_cell_grid(N, K)
    nbr = jax.jit(lambda p: pallas_cell_list_knn(p, K, 1.0, grid))(positions)
    nbr = jax.block_until_ready(nbr)
    z0 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
    results = {}

    def gather_probe(dtype, chunks):
        zc = z0.astype(dtype)
        hc = H // chunks

        def make(steps):
            @jax.jit
            def f(eps):
                def body(c, _):
                    parts = [
                        jnp.take(c[:, i * hc:(i + 1) * hc], nbr, axis=0)
                        .sum(axis=1)
                        for i in range(chunks)
                    ]
                    agg = jnp.concatenate(parts, axis=1)
                    return c + eps.astype(dtype) * agg[:, :1], jnp.sum(
                        agg[::4097, 0].astype(jnp.float32))
                _, outs = jax.lax.scan(body, zc, None, length=steps)
                return jnp.sum(outs).reshape(())
            return f

        return marginal(make) * 1e3

    for dtype, chunks, name in (
        (jnp.bfloat16, 1, "bf16_h128"),
        (jnp.bfloat16, 2, "bf16_2xh64"),
        (jnp.bfloat16, 4, "bf16_4xh32"),
        (jnp.float32, 1, "f32_h128"),
        (jnp.float32, 2, "f32_2xh64"),
    ):
        results[name] = gather_probe(dtype, chunks)
        print(f"gather {name}: {results[name]:.3f} ms", flush=True)

    # Cell-sorted rows + remapped neighbors (the cellblock order):
    # does a near-banded index pattern change anything at this scale?
    from cosmology_gnn_simulation_tpu.ops.cellblock import sort_neighbors
    inv_cell = grid.grid_size / 1.0
    coords = jnp.clip(jnp.floor(positions * inv_cell).astype(jnp.int32),
                      0, grid.grid_size - 1)
    cell_id = (coords[:, 0] * grid.grid_size + coords[:, 1]) * \
        grid.grid_size + coords[:, 2]
    order = jnp.argsort(cell_id).astype(jnp.int32)
    nbr_sorted = jax.jit(sort_neighbors)(nbr, order)
    nbr_sorted = jax.block_until_ready(nbr_sorted)

    def make_sorted(steps):
        zb = z0.astype(jnp.bfloat16)

        @jax.jit
        def f(eps):
            def body(c, _):
                agg = jnp.take(c, nbr_sorted, axis=0).sum(axis=1)
                return c + eps.astype(jnp.bfloat16) * agg[:, :1], jnp.sum(
                    agg[::4097, 0].astype(jnp.float32))
            _, outs = jax.lax.scan(body, zb, None, length=steps)
            return jnp.sum(outs).reshape(())
        return f

    results["bf16_h128_cellsorted"] = marginal(make_sorted) * 1e3
    print(f"gather bf16 cell-sorted: {results['bf16_h128_cellsorted']:.3f} ms",
          flush=True)

    # Existing streamed cell-block kernel at a flagship-shaped spec.
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        build_cellblock,
        cellblock_aggregate_slots,
        choose_cellblock_spec,
    )
    spec = choose_cellblock_spec(N, K)
    print(f"flagship cellblock spec: G={spec.grid_size} CC={spec.col_capacity}"
          f" QB={spec.query_block} W={spec.window} wrap={spec.wrap_cap} "
          f"slots={spec.num_slots} S={spec.num_slots*spec.s_width/1e6:.0f}MB",
          flush=True)
    results["cb_spec"] = (
        f"G={spec.grid_size} CC={spec.col_capacity} QB={spec.query_block} "
        f"W={spec.window}"
    )

    @jax.jit
    def planf(p, nb, eps):
        plan = build_cellblock(jnp.remainder(p + eps, 1.0), nb, 1.0, spec)
        return (jnp.sum(plan.s_table[::4097].astype(jnp.int32))
                + plan.overflow + plan.dropped_edges).astype(jnp.float32)

    def plan_t(eps):
        return planf(positions, nbr, eps)

    float(plan_t(0.0))
    best = float("inf")
    for rep in range(REPS):
        t0 = time.perf_counter()
        float(plan_t((rep + 1) * 1e-6))
        best = min(best, time.perf_counter() - t0)
    results["plan_fwd_standalone_ms"] = best * 1e3
    print(f"plan build (standalone, incl ~30ms floor): {best*1e3:.1f} ms",
          flush=True)

    plan = jax.jit(lambda p, nb: build_cellblock(p, nb, 1.0, spec))(
        positions, nbr)
    plan = jax.block_until_ready(plan)
    print("diag: overflow", int(plan.overflow), "dropped",
          int(plan.dropped_edges), "wof", int(plan.window_overflow),
          flush=True)
    zs = jnp.asarray(
        rng.standard_normal((spec.num_slots, H)).astype(np.float32))

    def make_cb(steps):
        @jax.jit
        def f(eps):
            def body(c, _):
                out = cellblock_aggregate_slots(c + eps, plan, spec)
                # Feed the output back into the carry — otherwise XLA
                # hoists the loop-invariant kernel out of the scan and the
                # marginal measures zero.
                c = c + eps * out[:, :1]
                return c, jnp.sum(out[::4097, 0])
            _, outs = jax.lax.scan(body, zs, None, length=steps)
            return jnp.sum(outs).reshape(())
        return f

    results["cellblock_kernel_ms"] = marginal(make_cb) * 1e3
    print(f"cellblock kernel (streamed): {results['cellblock_kernel_ms']:.3f}"
          " ms", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/gather_probe_r3.json", "w") as f:
        json.dump({k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in results.items()}, f, indent=2)
    print("wrote benchmarks/results/gather_probe_r3.json", flush=True)


if __name__ == "__main__":
    main()
