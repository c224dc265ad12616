"""Round 5 (VERDICT missing item 3): the literal BASELINE config-3
artifact — a 100-step certificate-exact rollout at N=65,536, k=16,
latent 128, 10 MP steps, re-neighbor every step, on one chip.

bench.py measures 10<->40-step marginals; this driver runs the full
100-step rollout the BASELINE.json config names (reference loop:
``/root/reference/render_rollout.py:39-58``), records the per-step
exactness bits, and reports wall-clock throughput (including the one-off
dispatch/transfer floor — slightly conservative vs the marginal method).

Run from /root/repo on TPU: python benchmarks/rollout100_r5.py
  [--steps 100] [--search auto|dense|codes]
Writes benchmarks/results/rollout100_r5.json.
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--search", type=str, default="auto",
                    choices=["auto", "dense", "codes"])
    args = ap.parse_args()

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

    def run(eps):
        out = rollout(
            params, model_config,
            jnp.remainder(positions + eps, 1.0), temperatures,
            stats, args.steps, num_neighbors=K, dtype=jnp.bfloat16,
            aggregation="cellblock_hybrid", cellblock_search=args.search,
        )
        cs = float(checksum(out))  # forces full execution
        return out, cs

    out, _ = run(0.0)  # compile + first certificate look
    best = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        out, _ = run((rep + 1) * 1e-6)
        best = min(best, time.perf_counter() - t0)
    exact = np.asarray(out["neighbor_exactness"])
    result = {
        "config": "BASELINE config 3: 100-step rollout at N=65,536, k=16, "
                  "latent 128, 10 MP steps, re-neighbor every step",
        "n": N, "k": K, "steps": args.steps,
        "search": args.search,
        "wall_s": round(best, 3),
        "ms_per_step": round(best / args.steps * 1e3, 3),
        "particle_steps_per_s": round(N * args.steps / best, 1),
        "exact_steps": int(exact.sum()),
        "exactness_per_step": exact.astype(int).tolist(),
        "all_steps_exact": bool(exact.all()),
        "final_coords_finite": bool(
            np.isfinite(np.asarray(out["Coordinates"][-1])).all()
        ),
    }
    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/rollout100_r5.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2), flush=True)


if __name__ == "__main__":
    main()
