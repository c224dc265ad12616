"""Config-4 chip-level benchmark in bench.py's form (round-3 verdict item
8): rollout ms/step at N=500,000, k=32, latent 256, 15 MP steps — the
BASELINE ladder's largest single-chip config, where the cell-block MXU
aggregation (not the flagship's hybrid) is the production path.

Prints ONE JSON line shaped like bench.py's and appends the measurement to
``benchmarks/results/bench_config4_history.json`` so the per-round config-4
trend is recorded alongside the flagship BENCH_r*.json series.

``vs_baseline`` uses the same anchoring philosophy as bench.py: the
reference's measured CPU rollout fits t(N) = a*N^2 + b*N (BASELINE.md) —
~54,000 s/step at N=500k — and is granted the same ~930x GPU allowance,
i.e. a baseline of 500,000/58 s ~ 8,600 particle-steps/s. That is generous:
the reference was never demonstrated above N=16,384.

Run from /root/repo on TPU: python benchmarks/bench_config4.py
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

N_PARTICLES = 500_000
K_NEIGHBORS = 32
LATENT = 256
MP_STEPS = 15
WINDOW = 5
STEPS_SHORT = 2
STEPS_LONG = 6
# Reference quadratic fit at N=500k (~5.4e4 s/step measured-fit CPU),
# granted the same ~930x GPU allowance bench.py grants at the flagship.
BASELINE_PARTICLE_STEPS_PER_SEC = 8600.0


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variable", action="store_true",
                    help="variable per-column slot capacities (packed "
                         "layout — the config-4 train-step winner, "
                         "train_r4.json)")
    args = ap.parse_args()

    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    model_config = default_model_config(
        latent_size=LATENT, mlp_hidden_size=LATENT,
        num_message_passing_steps=MP_STEPS,
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
    base = rng.uniform(0, 1, (1, N_PARTICLES, 3))
    drift = rng.normal(0, 5e-4, (WINDOW, N_PARTICLES, 3)).cumsum(axis=0)
    positions = jnp.asarray(np.remainder(base + drift, 1.0), jnp.float32)
    temperatures = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (WINDOW, N_PARTICLES, 1))), jnp.float32
    )

    @jax.jit
    def checksum(out):
        return (
            jnp.sum(out["Coordinates"][-1])
            + jnp.sum(out["InternalEnergy"][-1])
        )

    def run(steps, eps, check=False):
        out = rollout(
            params, model_config,
            jnp.remainder(positions + eps, 1.0), temperatures,
            stats, steps, num_neighbors=K_NEIGHBORS, dtype=jnp.bfloat16,
            aggregation="cellblock", cellblock_variable=args.variable,
        )
        if check:
            assert bool(out["neighbor_exactness"].all()), (
                "exactness certificate failed mid-rollout"
            )
        return float(checksum(out))

    def measure(steps):
        run(steps, 0.0)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            run(steps, (rep + 1) * 1e-6)
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = measure(STEPS_SHORT)
    t_long = measure(STEPS_LONG)
    per_step = (t_long - t_short) / (STEPS_LONG - STEPS_SHORT)
    psteps = N_PARTICLES / per_step
    run(STEPS_SHORT, 7e-7, check=True)

    layout = "variable" if args.variable else "uniform"
    line = {
        "metric": (
            f"rollout particle-steps/s/chip @ N={N_PARTICLES}, "
            f"k={K_NEIGHBORS}, {MP_STEPS} MP steps, latent {LATENT} "
            f"(config 4, cellblock {layout})"
        ),
        "value": round(psteps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(psteps / BASELINE_PARTICLE_STEPS_PER_SEC, 2),
        "ms_per_step": round(per_step * 1e3, 1),
    }
    hist_path = "benchmarks/results/bench_config4_history.json"
    hist = []
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            hist = json.load(f)
    hist.append(line)
    os.makedirs("benchmarks/results", exist_ok=True)
    with open(hist_path, "w") as f:
        json.dump(hist, f, indent=2)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
