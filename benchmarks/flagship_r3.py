"""Round-3 flagship experiments (N=65k, k=16, latent 128, 10 MP steps).

Round-2 headline: 46.3 ms/step (1.42M particle-steps/s). Decomposition:
kNN ~17 ms + 10 MP steps x ~2.7 ms + ~2.3 ms fixed. This script measures
the round-3 levers:

  * bf16 residual-stream carry (model carry_dtype) — the per-step state
    traffic the matmul-only bf16 cast leaves at f32;
  * kNN component split: binning/table build (XLA scatters) vs the
    selection kernel — to size the scatter-free table-build win.

Timing per CLAUDE.md (perturbed inputs, scalar checksum, min over reps,
marginal differences). Run from /root/repo on TPU:
python benchmarks/flagship_r3.py
Writes benchmarks/results/flagship_r3.json.
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
REPS = 3


def main():
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        _build_table,
        pallas_cell_list_knn,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, N, 3))
    drift = rng.normal(0, 5e-4, (WINDOW, N, 3)).cumsum(axis=0)
    positions = jnp.asarray(np.remainder(base + drift, 1.0), jnp.float32)
    temperatures = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (WINDOW, N, 1))), jnp.float32
    )
    pos_last = positions[-1]
    results = {}

    # ---- kNN component split -------------------------------------------
    grid = choose_cell_grid(N, K)
    results["grid"] = f"G={grid.grid_size} C={grid.cell_capacity}"

    def timeit(fn, reps=REPS):
        float(fn(0.0).reshape(()))
        best = float("inf")
        for rep in range(reps):
            t0 = time.perf_counter()
            float(fn((rep + 1) * 1e-6).reshape(()))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    cap = ((grid.cell_capacity + 7) // 8) * 8

    @jax.jit
    def table_only(eps):
        p = jnp.remainder(pos_last + eps, 1.0)
        px, py, pz, ids, cell_id, rank, ovf = _build_table(
            p, grid.grid_size, cap, jnp.float32(1.0)
        )
        return (jnp.sum(px[::37]) + jnp.sum(ids[::37]) + ovf).astype(
            jnp.float32
        )

    results["knn_table_build_ms"] = timeit(table_only)
    print(f"knn table build: {results['knn_table_build_ms']:.1f} ms",
          flush=True)

    @jax.jit
    def knn_full(eps):
        p = jnp.remainder(pos_last + eps, 1.0)
        idx = pallas_cell_list_knn(p, K, 1.0, grid)
        return jnp.sum(idx).astype(jnp.float32)

    results["knn_full_ms"] = timeit(knn_full)
    print(f"knn full: {results['knn_full_ms']:.1f} ms", flush=True)

    # ---- rollout variants ----------------------------------------------
    variants = {
        "baseline_bf16": dict(carry_dtype=None),
        "bf16_carry": dict(carry_dtype="bfloat16"),
    }
    for name, mkw in variants.items():
        mc = default_model_config(**mkw)
        params = init_encode_process_decode(jax.random.PRNGKey(0), mc)

        def run(steps, eps, mc=mc, params=params):
            out = rollout(
                params, mc,
                jnp.remainder(positions + eps, 1.0), temperatures, stats,
                steps, num_neighbors=K, dtype=jnp.bfloat16,
            )
            return float(
                (jnp.sum(out["Coordinates"][-1])
                 + jnp.sum(out["InternalEnergy"][-1]))
            )

        def measure(steps):
            run(steps, 0.0)
            best = float("inf")
            for rep in range(REPS):
                t0 = time.perf_counter()
                run(steps, (rep + 1) * 1e-6)
                best = min(best, time.perf_counter() - t0)
            return best

        t_short = measure(5)
        t_long = measure(25)
        per_step = (t_long - t_short) / 20 * 1e3
        results[f"{name}_step_ms"] = per_step
        results[f"{name}_psteps_per_s"] = N / (per_step / 1e3)
        print(f"{name}: {per_step:.1f} ms/step "
              f"({N / per_step * 1e3 / 1e6:.2f}M psteps/s)", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/flagship_r3.json", "w") as f:
        json.dump({k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in results.items()}, f, indent=2)
    print("wrote benchmarks/results/flagship_r3.json", flush=True)


if __name__ == "__main__":
    main()
