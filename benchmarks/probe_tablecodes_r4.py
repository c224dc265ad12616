"""Round-4 probe: codes_layout='table' vs 'particle' for the flagship
re-neighbor round (VERDICT round-3 item 1).

The particle layout pays a random [N, k] re-order gather in the kNN
wrapper (table -> particle) plus an inverse-permutation N-key sort and an
[N, k] row scatter in the plan build (particle -> slot). The table layout
hands the kernel's cell-table codes straight to the plan, which consumes
them with ONE quasi-monotone [num_slots] row gather (slot order ascends
through the identical (cell, rank) sort key).

Measures, in-scan with marginal differencing (CLAUDE.md timing rules):
  * search+plan round, particle layout (round-3 path);
  * search+plan round, table layout;
  * the full hybrid rollout A/B (the number bench.py reports).

Run from /root/repo on TPU: python benchmarks/probe_tablecodes_r4.py
Writes benchmarks/results/tablecodes_r4.json.
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

N, K, WINDOW = 65536, 16, 5


def main():
    from cosmology_gnn_simulation_tpu.featurize import (
        neighbor_search_certified,
    )
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        build_cellblock,
        choose_cellblock_spec,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    print("backend:", jax.default_backend(), flush=True)
    results = {}
    spec = choose_cellblock_spec(N, K)
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)

    def round_body(pos, layout):
        neighbors, codes, codes_cap, spill, exact = (
            neighbor_search_certified(
                pos, K, 1.0, method="pallas", with_codes=True,
                codes_only=True, codes_layout=layout,
            )
        )
        plan = build_cellblock(
            pos, neighbors, 1.0, spec, s_build="kernel",
            neighbor_codes=codes, codes_cap=codes_cap, codes_spill=spill,
            codes_layout=layout,
        )
        return (
            jnp.sum(plan.s_table[:, :1].astype(jnp.int32)).astype(
                jnp.float32
            )
            + plan.dropped_edges.astype(jnp.float32)
            + exact.astype(jnp.float32)
        )

    def scan_over(layout, iters):
        @jax.jit
        def f(eps):
            def step(carry, _):
                p = jnp.remainder(pos0 + carry[None, :] * 1e-5, 1.0)
                s = round_body(p, layout)
                return carry + s * 1e-9 + eps, s

            init = jnp.ones((3,), jnp.float32) * eps
            c, ss = jax.lax.scan(step, init, jnp.arange(iters))
            return jnp.sum(c) + jnp.sum(ss)

        return f

    def marginal(layout, k_s=6, k_l=22):
        f_s, f_l = scan_over(layout, k_s), scan_over(layout, k_l)

        def best_of(f):
            float(f(0.0))
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                float(f((rep + 1) * 1e-6))
                best = min(best, time.perf_counter() - t0)
            return best

        t_s, t_l = best_of(f_s), best_of(f_l)
        return (t_l - t_s) / (k_l - k_s) * 1e3

    for layout in ("particle", "table"):
        ms = marginal(layout)
        results[f"round_{layout}_ms"] = round(ms, 3)
        print(f"search+plan round, {layout}: {ms:.3f} ms", flush=True)

    # Full hybrid rollout (the headline path now defaults to table layout
    # in _cellblock_rollout; this is the after number).
    model_config = default_model_config()
    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    base = rng.uniform(0, 1, (1, N, 3))
    drift = rng.normal(0, 5e-4, (WINDOW, N, 3)).cumsum(axis=0)
    positions = jnp.asarray(np.remainder(base + drift, 1.0), jnp.float32)
    temperatures = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (WINDOW, N, 1))), jnp.float32
    )

    @jax.jit
    def checksum(out):
        return (
            jnp.sum(out["Coordinates"][-1])
            + jnp.sum(out["InternalEnergy"][-1])
        )

    def run(steps, eps):
        out = rollout(
            params, model_config,
            jnp.remainder(positions + eps, 1.0), temperatures,
            stats, steps, num_neighbors=K, dtype=jnp.bfloat16,
            aggregation="cellblock_hybrid",
        )
        return float(checksum(out)), bool(out["neighbor_exactness"].all())

    def measure(steps):
        run(steps, 0.0)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            run(steps, (rep + 1) * 1e-6)
            best = min(best, time.perf_counter() - t0)
        return best

    t_s, t_l = measure(10), measure(40)
    per_step = (t_l - t_s) / 30
    _, exact = run(10, 7e-7)
    results["hybrid_rollout"] = {
        "ms_per_step": round(per_step * 1e3, 3),
        "psteps_per_s": round(N / per_step, 1),
        "exact_all_steps": exact,
    }
    print("hybrid rollout:", results["hybrid_rollout"], flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/tablecodes_r4.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
