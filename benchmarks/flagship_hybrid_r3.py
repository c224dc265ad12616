"""Flagship rollout: gather vs slot-space cellblock vs HYBRID cellblock.

cb_hybrid_r3.json measured the hybrid aggregation primitive at 0.285 ms vs
the XLA fused gather+sum's 3.88 at N=65k/H=128 bf16. This driver measures
the number that matters — the full jitted rollout (re-neighbor every step,
certificate on) — for all three aggregation modes, plus trajectory
agreement between them.

Marginal-scan timing per CLAUDE.md. Run from /root/repo on TPU:
python benchmarks/flagship_hybrid_r3.py
Writes benchmarks/results/flagship_hybrid_r3.json.
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
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    print("backend:", jax.default_backend(), flush=True)
    model_config = default_model_config()
    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)

    rng = np.random.default_rng(0)
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

    results = {}

    def marginal(tag, **kw):
        t_s = measure(SHORT, **kw)
        t_l = measure(LONG, **kw)
        per_step = (t_l - t_s) / (LONG - SHORT)
        results[tag] = {
            "ms_per_step": round(per_step * 1e3, 3),
            "psteps_per_s": round(N / per_step, 1),
        }
        print(tag, results[tag], flush=True)

    marginal("gather")
    marginal("cellblock_hybrid", aggregation="cellblock_hybrid")
    marginal("cellblock_slots", aggregation="cellblock")
    marginal("hybrid_r2", aggregation="cellblock_hybrid",
             reneighbor_every=2)

    # Fidelity: 10-step trajectories, hybrid vs gather.
    def traj(**kw):
        return rollout(
            params, model_config, positions, temperatures, stats, SHORT,
            num_neighbors=K, dtype=jnp.bfloat16, **kw,
        )

    a = traj()
    b = traj(aggregation="cellblock_hybrid")
    results["max_coord_diff_vs_gather"] = float(
        jnp.max(jnp.abs(a["Coordinates"] - b["Coordinates"]))
    )
    results["hybrid_exact_all_steps"] = bool(
        jnp.all(b["neighbor_exactness"])
    )
    print("max_coord_diff:", results["max_coord_diff_vs_gather"],
          "exact:", results["hybrid_exact_all_steps"], flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/flagship_hybrid_r3.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
