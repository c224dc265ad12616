"""Round 4: fused codes->S Pallas kernel (single-pass plan build) on TPU.

1. REAL-TPU bit-exactness of ``_s_from_codes_fused`` (s_build="kernel" on
   the codes path) vs the contract path, on a uniform frame AND a crammed
   frame that engages the kNN spill block (Mosaic backend acceptance is
   not implied by interpret mode — CLAUDE.md).
2. In-scan marginal of search / search+plan — the plan build was 6.7 ms
   in round 3 (benchmarks/results/plan_parts_r3.json, via R-differencing).
3. The headline: hybrid R=1 rollout ms/step with the fused plan.

Run from /root/repo on TPU: python benchmarks/probe_fusedplan_r4.py
Writes benchmarks/results/fusedplan_r4.json.
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
SHORT, LONG = 10, 40


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
    rng = np.random.default_rng(0)
    spec = choose_cellblock_spec(N, K)
    results["spec"] = (
        f"G={spec.grid_size} CC={spec.col_capacity} QB={spec.query_block} "
        f"W={spec.window}"
    )
    print(results["spec"], flush=True)

    def ab_check(pos, tag):
        _, codes, cap, spill, exact = neighbor_search_certified(
            pos, K, 1.0, method="pallas", with_codes=True, codes_only=True
        )
        a = build_cellblock(
            pos, None, 1.0, spec, s_build="contract",
            neighbor_codes=codes, codes_cap=cap, codes_spill=spill,
        )
        b = build_cellblock(
            pos, None, 1.0, spec, s_build="kernel",
            neighbor_codes=codes, codes_cap=cap, codes_spill=spill,
        )
        eq = bool(jnp.array_equal(a.s_table, b.s_table))
        diag = {
            f: (int(getattr(a, f)), int(getattr(b, f)))
            for f in ("overflow", "dropped_edges", "window_overflow")
        }
        spill_used = bool(spill is not None and jnp.any(codes >= 27 * cap))
        results[tag] = {
            "s_equal": eq, "diag": diag, "spill_codes_used": spill_used,
            "exact": bool(exact),
        }
        print(tag, results[tag], flush=True)
        assert eq, f"{tag}: fused kernel s_table mismatch"
        for f, (va, vb) in diag.items():
            assert va == vb, f"{tag}: {f} {va} != {vb}"

    pos0 = jnp.asarray(rng.random((N, 3), np.float32))
    ab_check(pos0, "uniform")

    crammed = rng.random((N, 3)).astype(np.float32)
    g = spec.grid_size
    crammed[:200] = 0.5 / g + rng.uniform(0, 0.3 / g, size=(200, 3))
    ab_check(jnp.asarray(crammed), "crammed")

    # ---- In-scan marginals.
    def scan_over(body, iters):
        @jax.jit
        def f(eps):
            def step(carry, _):
                pos = jnp.remainder(pos0 + carry * eps, 1.0)
                return carry + 1.0, body(pos)

            _, s = jax.lax.scan(step, 0.0, None, length=iters)
            return jnp.sum(s)

        return f

    def marg_body(body, k_s=6, k_l=22):
        f_s, f_l = scan_over(body, k_s), scan_over(body, k_l)

        def best_of(f):
            float(f(0.0).reshape(()))
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                float(f((rep + 1) * 1e-6).reshape(()))
                best = min(best, time.perf_counter() - t0)
            return best

        return (best_of(f_l) - best_of(f_s)) / (k_l - k_s) * 1e3

    def s_codes_only(pos):
        _, codes, _, _, exact = neighbor_search_certified(
            pos, K, 1.0, method="pallas", with_codes=True, codes_only=True
        )
        return jnp.sum(codes[:1].astype(jnp.float32))

    def s_plus_plan(pos):
        _, codes, cap, spill, exact = neighbor_search_certified(
            pos, K, 1.0, method="pallas", with_codes=True, codes_only=True
        )
        plan = build_cellblock(
            pos, None, 1.0, spec, s_build="kernel",
            neighbor_codes=codes, codes_cap=cap, codes_spill=spill,
        )
        return (
            jnp.sum(plan.s_table[:, :1].astype(jnp.int32)).astype(jnp.float32)
            + plan.dropped_edges.astype(jnp.float32)
            + jnp.sum(plan.window_starts[:1]).astype(jnp.float32)
        )

    results["search_ms"] = round(marg_body(s_codes_only), 3)
    results["search_plus_plan_ms"] = round(marg_body(s_plus_plan), 3)
    results["plan_ms"] = round(
        results["search_plus_plan_ms"] - results["search_ms"], 3
    )
    print("search:", results["search_ms"], "search+plan:",
          results["search_plus_plan_ms"], flush=True)

    # ---- Headline rollout.
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

    def run(steps, eps, **kw):
        out = rollout(
            params, model_config,
            jnp.remainder(positions + eps, 1.0), temperatures,
            stats, steps, num_neighbors=K, dtype=jnp.bfloat16, **kw,
        )
        return float(checksum(out))

    def measure(steps, **kw):
        run(steps, 0.0, **kw)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            run(steps, (rep + 1) * 1e-6, **kw)
            best = min(best, time.perf_counter() - t0)
        return best

    def marginal(tag, **kw):
        t_s = measure(SHORT, **kw)
        t_l = measure(LONG, **kw)
        per_step = (t_l - t_s) / (LONG - SHORT)
        results[tag] = {
            "ms_per_step": round(per_step * 1e3, 3),
            "psteps_per_s": round(N / per_step, 1),
        }
        print(tag, results[tag], flush=True)

    marginal("hybrid_codesonly_fusedplan", aggregation="cellblock_hybrid")
    marginal("hybrid_r2", aggregation="cellblock_hybrid", reneighbor_every=2)

    b = rollout(
        params, model_config, positions, temperatures, stats, SHORT,
        num_neighbors=K, dtype=jnp.bfloat16, aggregation="cellblock_hybrid",
    )
    results["hybrid_exact_all_steps"] = bool(jnp.all(b["neighbor_exactness"]))
    print("hybrid exact:", results["hybrid_exact_all_steps"], flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/fusedplan_r4.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
