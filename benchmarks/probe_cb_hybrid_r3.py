"""Hybrid cell-block aggregation at flagship scale (round 3).

cb_flagship_parts_r3.json showed the slot-space S@window kernel costs
1.01 ms/step but the 1.41x slot padding taxes every rowwise pass (LN+MLP
0.51 vs 0.20 ms on particle rows). The HYBRID form — latents stay in
cell-sorted PARTICLE space, each MP step pays expand (quasi-monotone row
gather to slots) -> kernel -> compact (monotone row gather back) — trades
two [~slots, H] row gathers per step for the whole slot-row tax. This
probe times that trade against the XLA fused gather+sum the flagship
currently uses.

Marginal-scan timing per CLAUDE.md. Run from /root/repo (TPU):
python benchmarks/probe_cb_hybrid_r3.py
Writes benchmarks/results/cb_hybrid_r3.json.
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

N, K, H = 65536, 16, 128
REPS = 3


def main():
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        build_cellblock,
        cellblock_aggregate,
        choose_cellblock_spec,
        sort_neighbors,
    )
    from cosmology_gnn_simulation_tpu.featurize import (
        neighbor_search_certified,
    )

    print("backend:", jax.default_backend(), flush=True)
    box = 1.0
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.random((N, 3), np.float32))
    spec = choose_cellblock_spec(N, K)
    print(f"spec: G={spec.grid_size} CC={spec.col_capacity} "
          f"QB={spec.query_block} W={spec.window} "
          f"pad={spec.num_slots / N:.2f}x", flush=True)

    nbr, codes, codes_cap, spill, exact = neighbor_search_certified(
        pos0, K, box, method="pallas", with_codes=True
    )
    plan = build_cellblock(pos0, nbr, box, spec, neighbor_codes=codes,
                           codes_cap=codes_cap, codes_spill=spill)
    nbr_sorted = sort_neighbors(nbr, plan.order)
    z0 = jnp.asarray(rng.normal(0, 1, (N, H)), jnp.bfloat16)

    def scan_over(body, iters):
        @jax.jit
        def f(eps):
            def step(carry, _):
                z = z0 + (carry * eps).astype(jnp.bfloat16)
                return carry + 1.0, body(z)

            _, s = jax.lax.scan(step, 0.0, None, length=iters)
            return jnp.sum(s)

        return f

    def marginal(body, k_short=8, k_long=24):
        f_s, f_l = scan_over(body, k_short), scan_over(body, k_long)

        def best_of(f):
            float(f(0.0).reshape(()))
            best = float("inf")
            for rep in range(REPS):
                t0 = time.perf_counter()
                float(f((rep + 1) * 1e-6).reshape(()))
                best = min(best, time.perf_counter() - t0)
            return best

        return (best_of(f_l) - best_of(f_s)) / (k_long - k_short)

    def body_hybrid(z):
        out = cellblock_aggregate(z, plan, spec)
        return jnp.sum(out[:1].astype(jnp.float32))

    def body_gather(z):
        out = jnp.take(z, nbr_sorted, axis=0).astype(jnp.float32).sum(axis=1)
        return jnp.sum(out[:1])

    results = {"spec": f"G={spec.grid_size} CC={spec.col_capacity} "
                       f"QB={spec.query_block} W={spec.window} "
                       f"pad={spec.num_slots / N:.2f}"}
    for name, body in (
        ("hybrid_expand_kernel_compact", body_hybrid),
        ("xla_fused_gather_sum", body_gather),
    ):
        ms = marginal(body) * 1e3
        results[name + "_ms"] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)

    # Fidelity at this scale (f32 slot sums vs f32 gather baseline).
    a = np.asarray(cellblock_aggregate(z0, plan, spec))
    b = np.asarray(
        jnp.take(z0, nbr_sorted, axis=0).astype(jnp.float32).sum(axis=1)
    )
    results["max_abs_diff"] = float(np.abs(a - b).max())
    results["overflow"] = int(plan.overflow)
    results["dropped_edges"] = int(plan.dropped_edges)
    print("max_abs_diff:", results["max_abs_diff"],
          "overflow:", results["overflow"],
          "dropped:", results["dropped_edges"], flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/cb_hybrid_r3.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote benchmarks/results/cb_hybrid_r3.json", flush=True)


if __name__ == "__main__":
    main()
