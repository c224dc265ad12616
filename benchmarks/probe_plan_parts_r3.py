"""Attribute the hybrid/cellblock re-neighbor round's ~27.5 ms (round 3).

flagship_hybrid_r3.json: the hybrid MP steps cost 11.4 ms per step-rest vs
the gather path's 25.4, but the re-neighbor ROUND costs 27.5 vs 13.5 —
cancelling the win at R=1. The extra ~14 ms is search-with-codes overhead
+ build_cellblock. This probe attributes it in-scan:

  search            neighbor_search_certified, with_codes=False
  search_codes      with_codes=True                  -> codes overhead
  plan_full         search_codes + build_cellblock (s_build=kernel)
  plan_no_kernel    same but _s_from_offsets stubbed  -> Pallas S-kernel cost
  plan_aux          search (no codes) + build via the aux path
  plan_contract     search_codes + build (s_build=contract)

Run from /root/repo on TPU: python benchmarks/probe_plan_parts_r3.py
Writes benchmarks/results/plan_parts_r3.json.
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

N, K = 65536, 16
SHORT, LONG = 6, 22
REPS = 3


def main():
    import cosmology_gnn_simulation_tpu.ops.cellblock as cb
    from cosmology_gnn_simulation_tpu.featurize import (
        neighbor_search_certified,
    )

    print("backend:", jax.default_backend(), flush=True)
    box = 1.0
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.random((N, 3), np.float32))
    spec = cb.choose_cellblock_spec(N, K)
    print(f"spec: G={spec.grid_size} CC={spec.col_capacity} "
          f"QB={spec.query_block} W={spec.window}", flush=True)

    def scan_over(body, iters):
        @jax.jit
        def f(eps):
            def step(carry, _):
                pos = jnp.remainder(pos0 + carry * eps, 1.0)
                return carry + 1.0, body(pos)

            _, s = jax.lax.scan(step, 0.0, None, length=iters)
            return jnp.sum(s)

        return f

    def marginal(body):
        f_s, f_l = scan_over(body, SHORT), scan_over(body, LONG)

        def best_of(f):
            float(f(0.0).reshape(()))
            best = float("inf")
            for rep in range(REPS):
                t0 = time.perf_counter()
                float(f((rep + 1) * 1e-6).reshape(()))
                best = min(best, time.perf_counter() - t0)
            return best

        return (best_of(f_l) - best_of(f_s)) / (LONG - SHORT) * 1e3

    def chk_plan(plan):
        return (
            jnp.sum(plan.window_starts[:1].astype(jnp.float32))
            + jnp.sum(plan.s_table[:1].astype(jnp.float32))
            + plan.overflow.astype(jnp.float32)
            + plan.dropped_edges.astype(jnp.float32)
        )

    def search(pos):
        idx, exact = neighbor_search_certified(pos, K, box, method="pallas")
        return jnp.sum(idx[:1].astype(jnp.float32))

    def search_codes(pos):
        idx, codes, cap, spill, exact = neighbor_search_certified(
            pos, K, box, method="pallas", with_codes=True
        )
        return (jnp.sum(idx[:1].astype(jnp.float32))
                + jnp.sum(codes[:1].astype(jnp.float32)))

    def plan_full(pos):
        idx, codes, cap, spill, exact = neighbor_search_certified(
            pos, K, box, method="pallas", with_codes=True
        )
        plan = cb.build_cellblock(pos, idx, box, spec, s_build="kernel",
                                  neighbor_codes=codes, codes_cap=cap,
                                  codes_spill=spill)
        return chk_plan(plan)

    def plan_aux(pos):
        idx, exact = neighbor_search_certified(pos, K, box, method="pallas")
        plan = cb.build_cellblock(pos, idx, box, spec, s_build="kernel")
        return chk_plan(plan)

    def plan_contract(pos):
        idx, codes, cap, spill, exact = neighbor_search_certified(
            pos, K, box, method="pallas", with_codes=True
        )
        plan = cb.build_cellblock(pos, idx, box, spec, s_build="contract",
                                  neighbor_codes=codes, codes_cap=cap,
                                  codes_spill=spill)
        return chk_plan(plan)

    results = {"spec": f"G={spec.grid_size} CC={spec.col_capacity} "
                       f"QB={spec.query_block} W={spec.window}"}

    for name, body in (
        ("search", search),
        ("search_codes", search_codes),
        ("plan_full", plan_full),
        ("plan_aux", plan_aux),
        ("plan_contract", plan_contract),
    ):
        ms = marginal(body)
        results[name + "_ms"] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)

    # Stub the Pallas one-hot S kernel to isolate its cost.
    real_kernel = cb._s_from_offsets
    try:
        cb._s_from_offsets = lambda offsets, spec_, interpret_: jnp.zeros(
            (spec_.num_slots, spec_.s_width), jnp.int8
        ) + offsets[:, :1].astype(jnp.int8) * 0
        ms = marginal(plan_full)
        results["plan_no_s_kernel_ms"] = round(ms, 3)
        print(f"plan_no_s_kernel: {ms:.3f} ms", flush=True)
    finally:
        cb._s_from_offsets = real_kernel

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/plan_parts_r3.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote benchmarks/results/plan_parts_r3.json", flush=True)


if __name__ == "__main__":
    main()
