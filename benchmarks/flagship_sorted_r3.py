"""Flagship A/B: cell-sorted scan-state carriage for the gather rollout.

Measures the headline rollout (N=65k, k=16, 10 MP, latent 128, bf16) with
``sorted_state`` off vs on — the gather probe predicted ~0.48 ms/MP-step
from quasi-monotone aggregation-gather ids (gather_probe_r3.json) — and
re-measures the opt-in reneighbor_every=2 point on the winner. Also
verifies sorted and unsorted 10-step trajectories agree on real TPU
(bit-identical expected on tie-free data).

Marginal-scan timing per CLAUDE.md (perturbed inputs, scalar checksum,
best-of-3, 10<->40-step marginal). Run from /root/repo on TPU:
python benchmarks/flagship_sorted_r3.py
Writes benchmarks/results/flagship_sorted_r3.json.
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
            "short_s": round(t_s, 4), "long_s": round(t_l, 4),
            "ms_per_step": round(per_step * 1e3, 3),
            "psteps_per_s": round(N / per_step, 1),
        }
        print(tag, results[tag], flush=True)

    marginal("gather_unsorted", sorted_state="off")
    marginal("gather_sorted", sorted_state="on")

    # Fidelity: sorted vs unsorted 10-step trajectories on real TPU.
    def traj(**kw):
        return rollout(
            params, model_config, positions, temperatures, stats, SHORT,
            num_neighbors=K, dtype=jnp.bfloat16, **kw,
        )

    a, b = traj(sorted_state="off"), traj(sorted_state="on")
    results["max_coord_diff"] = float(
        jnp.max(jnp.abs(a["Coordinates"] - b["Coordinates"]))
    )
    results["exact_all_steps_sorted"] = bool(
        jnp.all(b["neighbor_exactness"])
    )
    print("max_coord_diff:", results["max_coord_diff"],
          "exact:", results["exact_all_steps_sorted"], flush=True)

    best = ("gather_sorted"
            if results["gather_sorted"]["ms_per_step"]
            < results["gather_unsorted"]["ms_per_step"]
            else "gather_unsorted")
    marginal("r2_" + best,
             sorted_state="on" if best == "gather_sorted" else "off",
             reneighbor_every=2)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/flagship_sorted_r3.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
