"""TPU benchmark: cell-block (S-matmul) aggregation vs. the XLA gather+sum.

Config-4 shapes (N=500k, k=32, H=256). Timing per CLAUDE.md: perturbed
inputs each call, scalar checksum forced to host, min over repeats,
marginal differences vs. the ~30 ms RPC floor.

Run: cd /root/repo && python benchmarks/profile_cellblock_tpu.py
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosmology_gnn_simulation_tpu.ops.cellblock import (
    CellBlockSpec,
    build_cellblock,
    cellblock_aggregate,
    choose_cellblock_spec,
    sort_neighbors,
)
from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
from cosmology_gnn_simulation_tpu.ops.pallas_knn import pallas_cell_list_knn

REPS = 4


def bench(fn, *args):
    jax.block_until_ready(fn(*args, 0.0))
    best = float("inf")
    for rep in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args, (rep + 1) * 1e-6).reshape(()))
        best = min(best, time.perf_counter() - t0)
    return best


def floor_time():
    @jax.jit
    def tiny(x, eps):
        return jnp.sum(x + eps)

    return bench(tiny, jnp.zeros((8,), jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--h256", action="store_true",
                    help="also try a single-H-pass kernel (h_block=256)")
    ap.add_argument("--only", action="store_true",
                    help="with --h256: run ONLY the h256 spec")
    ap.add_argument("--fast", action="store_true",
                    help="skip the gather baseline and component breakdown")
    ap.add_argument("--spec", action="append", default=None,
                    help="explicit G,C,BLK spec(s), e.g. --spec 16,32,2")
    args = ap.parse_args()
    n, k, h, steps = args.n, args.k, args.h, args.steps

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 1, size=(n, 3)), jnp.float32)
    print("computing kNN (pallas)...", flush=True)
    knn_grid = choose_cell_grid(n, k)
    nbr = pallas_cell_list_knn(pos, k, 1.0, knn_grid)
    jax.block_until_ready(nbr)
    print(f"kNN done (grid {knn_grid})", flush=True)

    floor = floor_time()
    print(f"RPC floor: {floor*1e3:.1f} ms", flush=True)

    z = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)

    # --- baseline: chained gather+sum, chunked as in the production model
    # path (an unchunked [N, k, H] intermediate is ~15 GB at these shapes).
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        _gather_sum,
    )

    @functools.partial(jax.jit, static_argnames=("steps",))
    def baseline(z, nbr, eps, steps=steps):
        def body(carry, _):
            out = _gather_sum(carry, nbr)
            return out * 1e-4 + carry + eps, None

        final, _ = jax.lax.scan(body, z + eps, None, length=steps)
        return jnp.sum(final[:1, :8])

    if args.fast and n == 500_000:
        per_base = 0.227  # measured repeatedly; skip the recompile
    else:
        t = bench(baseline, z, nbr)
        per_base = (t - floor) / steps
        print(f"baseline gather+sum: {per_base*1e3:8.2f} ms/step", flush=True)

    base_spec = choose_cellblock_spec(n)
    specs = [base_spec]
    if args.spec:
        specs = [
            CellBlockSpec(*[int(x) for x in s.split(",")], 256)
            for s in args.spec
        ]
    if args.h256:
        specs = [base_spec._replace(h_block=256)] if args.only else             specs + [base_spec._replace(h_block=256)]
    for spec in specs:
        m = n / spec.grid_size**3
        print(
            f"\nspec {spec} mean_occ {m:.1f} slots {spec.num_slots}"
            f" ({spec.num_slots/n:.2f}x)",
            flush=True,
        )
        t0 = time.perf_counter()
        plan = build_cellblock(pos, nbr, 1.0, spec)
        jax.block_until_ready(plan)
        print(f"  build compile+run: {time.perf_counter()-t0:.1f} s",
              flush=True)
        print(
            f"  overflow {int(plan.overflow)} dropped "
            f"{int(plan.dropped_edges)}",
            flush=True,
        )
        if int(plan.overflow) or int(plan.dropped_edges):
            print("  !! certificate fails — skipping timing")
            continue

        @functools.partial(jax.jit, static_argnames=("spec", "steps"))
        def run_build(pos, nbr, eps, spec=spec, steps=2):
            def body(carry, _):
                p = build_cellblock(pos + eps, nbr, 1.0, spec)
                return carry + jnp.sum(p.s_table[:1, :8]), None

            acc, _ = jax.lax.scan(body, 0.0, None, length=steps)
            return acc

        t = bench(run_build, pos, nbr)
        per_build = (t - floor) / 2
        print(f"  build_cellblock:   {per_build*1e3:8.2f} ms", flush=True)

        z_sorted = jnp.take(z, plan.order, axis=0)

        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            cellblock_aggregate_slots as _agg_slots,
            expand_to_slots as _expand,
        )

        @functools.partial(jax.jit, static_argnames=("spec", "steps"))
        def run_slots(z_slots, plan, eps, spec=spec, steps=steps):
            def body(carry, _):
                out = _agg_slots(carry, plan, spec)
                return out * 1e-4 + carry + eps, None

            final, _ = jax.lax.scan(body, z_slots + eps, None, length=steps)
            return jnp.sum(final[:1, :8])

        z_slots0 = _expand(z_sorted, plan).astype(jnp.float32)
        t = bench(run_slots, z_slots0, plan)
        per = (t - floor) / steps
        print(
            f"  slot-space agg:    {per*1e3:8.2f} ms/step "
            f"({per_base/per:.1f}x vs gather)",
            flush=True,
        )

        if args.fast:
            del plan, z_slots0
            continue

        @functools.partial(jax.jit, static_argnames=("spec", "steps"))
        def run_agg(z, plan, eps, spec=spec, steps=steps):
            def body(carry, _):
                out = cellblock_aggregate(carry, plan, spec)
                return out * 1e-4 + carry + eps, None

            final, _ = jax.lax.scan(body, z + eps, None, length=steps)
            return jnp.sum(final[:1, :8])

        t = bench(run_agg, z_sorted, plan)
        per = (t - floor) / steps
        print(
            f"  cellblock_agg:     {per*1e3:8.2f} ms/step "
            f"({per_base/per:.1f}x vs gather)",
            flush=True,
        )
        # --- Component breakdown ------------------------------------------
        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            _build_s_table, _local_indices,
        )
        g_, c_ = spec.grid_size, spec.capacity

        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            expand_to_slots,
        )

        @functools.partial(jax.jit, static_argnames=("steps",))
        def expand_only(z, plan, eps, steps=steps):
            def body(carry, _):
                z_slots = expand_to_slots(carry, plan, dtype=jnp.bfloat16)
                return carry + z_slots[: carry.shape[0]].astype(
                    jnp.float32
                ) * 1e-6 + eps, None

            final, _ = jax.lax.scan(body, z + eps, None, length=steps)
            return jnp.sum(final[:1, :8])

        t = bench(expand_only, z_sorted, plan)
        print(f"  expand once-equiv: {(t-floor)/steps*1e3:8.2f} ms",
              flush=True)

        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            cellblock_aggregate_slots,
        )

        @functools.partial(jax.jit, static_argnames=("spec", "steps"))
        def run_agg_slots(z_slots, plan, eps, spec=spec, steps=steps):
            def body(carry, _):
                out = cellblock_aggregate_slots(carry, plan, spec)
                return out * 1e-4 + carry + eps, None

            final, _ = jax.lax.scan(body, z_slots + eps, None, length=steps)
            return jnp.sum(final[:1, :8])

        z_slots0 = expand_to_slots(z_sorted, plan).astype(jnp.float32)
        t = bench(run_agg_slots, z_slots0, plan)
        print(
            f"  slot-space agg:    {(t-floor)/steps*1e3:8.2f} ms/step "
            f"({per_base/((t-floor)/steps):.1f}x vs gather)",
            flush=True,
        )

        @functools.partial(jax.jit, static_argnames=("steps",))
        def compact_only(out_slots, plan, eps, steps=steps):
            def body(carry, _):
                o = jnp.take(carry, plan.slot_of_sorted, axis=0,
                             mode="clip")
                return carry.at[: o.shape[0]].add(o * 1e-6 + eps), None

            final, _ = jax.lax.scan(body, out_slots + eps, None,
                                    length=steps)
            return jnp.sum(final[:1, :8])

        big = jnp.zeros((spec.num_slots, h), jnp.float32)
        t = bench(compact_only, big, plan)
        print(f"  compact only:      {(t-floor)/steps*1e3:8.2f} ms",
              flush=True)

        # S build split: local-index arithmetic+table vs one-hot matmuls.
        nbr_sorted_full = sort_neighbors(nbr, plan.order)
        nbr_slot = jnp.take(plan.slot_of_sorted, nbr_sorted_full, axis=0,
                            mode="clip")
        nbr_table = (
            jnp.full((spec.num_slots + 1, k), spec.num_slots, jnp.int32)
            .at[plan.slot_of_sorted]
            .set(nbr_slot, mode="drop")[: spec.num_slots]
        )

        @functools.partial(jax.jit, static_argnames=("spec",))
        def s_only(nbr_table, eps, spec=spec):
            s, dropped = _build_s_table(
                (nbr_table + jnp.int32(eps * 1e9)) % (spec.num_slots + 1),
                spec,
            )
            return jnp.sum(s[:1, :8].astype(jnp.float32)) + dropped

        t = bench(s_only, nbr_table)
        print(f"  S one-hot matmuls: {(t-floor)*1e3:8.2f} ms", flush=True)

        @jax.jit
        def table_only(nbr_slot, slot_of_sorted, eps):
            tbl = (
                jnp.full((spec.num_slots + 1, k), spec.num_slots, jnp.int32)
                .at[slot_of_sorted]
                .set(nbr_slot + jnp.int32(eps * 1e9), mode="drop")
            )
            return jnp.sum(tbl[:1])

        t = bench(table_only, nbr_slot, plan.slot_of_sorted)
        print(f"  nbr-table scatter: {(t-floor)*1e3:8.2f} ms", flush=True)

        # Correctness spot check on-device (first 8192 rows — the full
        # unchunked oracle gather would need ~15 GB).
        nbr_sorted = sort_neighbors(nbr, plan.order)
        got = cellblock_aggregate(z_sorted, plan, spec)[:8192]
        zb = z_sorted.astype(jnp.bfloat16).astype(jnp.float32)
        want = jnp.take(zb, nbr_sorted[:8192], axis=0).sum(axis=1)
        err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        print(f"  max rel err vs oracle: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
