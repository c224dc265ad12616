"""Real-TPU verification + measurement of spill-enabled candidate codes
(round 3).

The codes path previously disabled the kNN spill block, paying the durable
Poisson-quantile capacity in every cell's candidate width ([32, 896]
selection tiles at the flagship spec). With spill codes (lane >= 27*cap,
resolved through the kernel's (spill_cells, spill_ranks) tables by the
plan build) the kernel runs at the common-case capacity ([24, 768] tiles,
0.64x selection work).

Checks on the real chip (interpret-mode equality does NOT imply Mosaic
backend acceptance/bit-equality — CLAUDE.md):
  1. uniform flagship fixture: plan from codes_only search == aux-path
     plan (S table, window starts, diagnostics);
  2. cram fixture that overflows a cell (spill codes actually picked):
     same equality + certificate still passes;
  3. search marginal (codes_only) and the headline hybrid rollout
     marginal at the new capacity.

Run from /root/repo on TPU: python benchmarks/verify_spill_codes_tpu.py
Writes benchmarks/results/spill_codes_r3.json.
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
    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        build_cellblock,
        choose_cellblock_spec,
    )
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        codes_packing_cap,
        spill_layout,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    print("backend:", jax.default_backend(), flush=True)
    results = {}
    grid = choose_cell_grid(N, K)
    cap, num_cand, spill_cap = spill_layout(N, K, grid)
    results["layout"] = {
        "cell_capacity": grid.cell_capacity, "cap": cap,
        "num_cand": num_cand, "spill_cap": spill_cap,
    }
    print("layout:", results["layout"], flush=True)
    spec = choose_cellblock_spec(N, K)
    assert spec.grid_size == grid.grid_size
    s_build = "kernel"

    def plans_equal(pos, tag):
        idx, exact_a = neighbor_search_certified(pos, K, 1.0,
                                                 method="pallas")
        a = build_cellblock(pos, idx, 1.0, spec, s_build=s_build)
        none_idx, codes, ccap, spill, exact_b = neighbor_search_certified(
            pos, K, 1.0, method="pallas", with_codes=True, codes_only=True
        )
        assert none_idx is None
        assert ccap == codes_packing_cap(N, K, grid)
        b = build_cellblock(pos, None, 1.0, spec, s_build=s_build,
                            neighbor_codes=codes, codes_cap=ccap,
                            codes_spill=spill)
        eq_s = bool(jnp.array_equal(a.s_table, b.s_table))
        eq_w = bool(jnp.array_equal(a.window_starts, b.window_starts))
        spill_used = bool((codes >= 27 * ccap).any()) if spill else False
        results[tag] = {
            "s_equal": eq_s, "windows_equal": eq_w,
            "exact_ids": bool(exact_a), "exact_codes": bool(exact_b),
            "spill_codes_used": spill_used,
            "overflow": int(b.overflow), "dropped": int(b.dropped_edges),
            "aux_overflow": int(a.overflow),
            "aux_dropped": int(a.dropped_edges),
        }
        print(tag, results[tag], flush=True)
        assert eq_s and eq_w

    rng = np.random.default_rng(0)
    pos_u = jnp.asarray(rng.random((N, 3), np.float32))
    plans_equal(pos_u, "uniform")

    # Cram fixture: overfill one cell past the common-case capacity so the
    # spill block is genuinely picked through (certificate must still
    # hold: the spilled rows are solved exactly).
    edge = 1.0 / grid.grid_size
    cell0 = np.floor(0.5 / edge) * edge  # low corner of one interior cell
    cram = (
        cell0 + edge * (0.05 + 0.9 * rng.random((int(1.8 * cap), 3)))
    ).astype(np.float32)
    pos_c = jnp.asarray(
        np.concatenate([np.asarray(pos_u)[: N - cram.shape[0]], cram])
    )
    plans_equal(pos_c, "cram")
    assert results["cram"]["spill_codes_used"]

    # ---- Search + headline marginals at the new capacity.
    def scan_over(body, iters):
        @jax.jit
        def f(eps):
            def step(carry, _):
                pos = jnp.remainder(pos_u + carry * eps, 1.0)
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

    results["search_codes_only_ms"] = round(marg_body(s_codes_only), 3)
    print("search codes_only:", results["search_codes_only_ms"], flush=True)

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
        return (jnp.sum(out["Coordinates"][-1])
                + jnp.sum(out["InternalEnergy"][-1]))

    def run(steps, eps):
        out = rollout(
            params, model_config, jnp.remainder(positions + eps, 1.0),
            temperatures, stats, steps, num_neighbors=K,
            dtype=jnp.bfloat16, aggregation="cellblock_hybrid",
        )
        return (float(checksum(out)),
                bool(out["neighbor_exactness"].all()))

    def measure(steps):
        run(steps, 0.0)
        best = float("inf")
        exact = True
        for rep in range(3):
            t0 = time.perf_counter()
            _, ex = run(steps, (rep + 1) * 1e-6)
            best = min(best, time.perf_counter() - t0)
            exact = exact and ex
        return best, exact

    t_s, _ = measure(SHORT)
    t_l, exact = measure(LONG)
    per_step = (t_l - t_s) / (LONG - SHORT)
    results["hybrid_spill"] = {
        "ms_per_step": round(per_step * 1e3, 3),
        "psteps_per_s": round(N / per_step, 1),
        "exact_all_steps": bool(exact),
    }
    print("hybrid_spill:", results["hybrid_spill"], flush=True)
    assert exact

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/spill_codes_r3.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
