"""Config-4 rollout: slot-space vs hybrid cell-block (round 3).

At the flagship (N=65k) the hybrid carry won because the slot-row tax on
every LN/MLP pass outweighs two quasi-monotone expand/compact gathers.
Config 4 (N=500k, k=32, latent 256, 15 MP) has a smaller padding (1.29x)
but much bigger rows — this measures which side wins at that scale, plus
the codes-only search there.

Marginal 2<->6-step rollout timing per CLAUDE.md. Run from /root/repo:
python benchmarks/config4_hybrid_r3.py
Writes benchmarks/results/config4_hybrid_r3.json.
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

N, K, H, MP, WINDOW = 500_000, 32, 256, 15, 5
SHORT, LONG = 2, 6


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
    model_config = default_model_config(
        latent_size=H, mlp_hidden_size=H, num_message_passing_steps=MP,
    )
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
    drift = rng.normal(0, 2e-4, (WINDOW, N, 3)).cumsum(axis=0)
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
        return float(checksum(out)), bool(out["neighbor_exactness"].all())

    def measure(steps, **kw):
        run(steps, 0.0, **kw)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            _, exact = run(steps, (rep + 1) * 1e-6, **kw)
            best = min(best, time.perf_counter() - t0)
        return best, exact

    results = {}

    def marginal(tag, **kw):
        t_s, _ = measure(SHORT, **kw)
        t_l, exact = measure(LONG, **kw)
        per_step = (t_l - t_s) / (LONG - SHORT)
        results[tag] = {
            "ms_per_step": round(per_step * 1e3, 1),
            "psteps_per_s": round(N / per_step, 1),
            "exact": exact,
        }
        print(tag, results[tag], flush=True)

    marginal("cellblock_slots", aggregation="cellblock")
    marginal("cellblock_hybrid", aggregation="cellblock_hybrid")

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/config4_hybrid_r3.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
