"""Headline benchmark: rollout throughput at N=65k, k=16, 10 MP steps
(BASELINE.md primary metric), on one chip.

Measures the fully-jitted rollout `lax.scan` — on-device cell-list periodic
k-NN re-neighboring + Encode-Process-Decode forward + un-normalize + Euler
integrate + wrap, every step — on the flagship config (reference defaults,
``/root/reference/config.py:16-23``), on the hybrid cell-block path (MXU
selection-matrix aggregation, codes-only kNN payload; exactness certificate
asserted — see benchmarks/results/flagship_codesonly_r3.json).

Timing methodology (the TPU tunnel memoizes identical RPCs and its
block_until_ready is unreliable, so):
* every measured call perturbs the inputs;
* completion is forced by reducing outputs to a scalar fetched to host;
* throughput uses the marginal cost between a short and a long rollout,
  cancelling constant dispatch/transfer overhead.

Baseline: the reference publishes no numbers, so round 2 MEASURED it
(BASELINE.md "Measured reference numbers"): the reference's own unmodified
rollout runs at 71 particle-steps/s at N=65k on this machine's CPU
(926 s/step, quadratic fit over four measured sizes; its 27x-ghost-copy
k-NN rebuild stays host-side even with a GPU, ``render_rollout.py:39-58``).
BASELINE_PARTICLE_STEPS_PER_SEC = 65536 grants the reference a ~930x GPU
speedup over that measurement — deliberately generous (A100-class GPUs
deliver ~50-200x single-core-CPU on this op mix), so vs_baseline is a
lower bound on the true ratio.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_PARTICLES = 65536
K_NEIGHBORS = 16
WINDOW = 5
STEPS_SHORT = 10
STEPS_LONG = 40
BASELINE_PARTICLE_STEPS_PER_SEC = 65536.0  # ~1 ref step/s at N=65k (est.)


def main():
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    model_config = default_model_config()  # latent 128, 10 MP steps
    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0),
        temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0),
        temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0),
        vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0),
        acc_std=jnp.asarray(0.2),
        box_size=1.0,
        dt=0.05,
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
            jnp.sum(out["Coordinates"][-1]) + jnp.sum(out["InternalEnergy"][-1])
        )

    def run(steps, eps):
        # aggregation="cellblock_hybrid": the round-3 headline path — the
        # message-passing aggregation runs as selection-matrix MXU matmuls
        # (ops/cellblock.py) with the carry on particle rows, and the kNN
        # kernel emits candidate CODES as its only selection payload
        # (ops/pallas_knn.py codes_only). Exact reference semantics:
        # re-neighbor every step, per-step exactness certificate ON and
        # asserted below. 29.3 ms/step vs the gather path's 38.3
        # (benchmarks/results/flagship_codesonly_r3.json).
        out = rollout(
            params,
            model_config,
            jnp.remainder(positions + eps, 1.0),
            temperatures,
            stats,
            steps,
            num_neighbors=K_NEIGHBORS,
            dtype=jnp.bfloat16,
            aggregation="cellblock_hybrid",
        )
        exact = out["neighbor_exactness"]
        return float(checksum(out)) + 0.0 * float(exact.all())

    def run_and_check(steps, eps):
        out = rollout(
            params,
            model_config,
            jnp.remainder(positions + eps, 1.0),
            temperatures,
            stats,
            steps,
            num_neighbors=K_NEIGHBORS,
            dtype=jnp.bfloat16,
            aggregation="cellblock_hybrid",
        )
        assert bool(out["neighbor_exactness"].all()), (
            "kNN/cell-block exactness certificate failed mid-rollout"
        )
        return float(checksum(out))  # host fetch forces full execution

    def measure(steps):
        run(steps, 0.0)  # compile
        best = float("inf")
        for rep in range(3):
            eps = (rep + 1) * 1e-6
            t0 = time.perf_counter()
            run(steps, eps)
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = measure(STEPS_SHORT)
    t_long = measure(STEPS_LONG)
    per_step = (t_long - t_short) / (STEPS_LONG - STEPS_SHORT)
    particle_steps_per_sec = N_PARTICLES / per_step
    # One certificate-asserted run: the measured configuration must be
    # provably exact (no cell overflow, every k-th neighbor within its
    # per-query window margin) on every step.
    run_and_check(STEPS_SHORT, 7e-7)

    print(
        json.dumps(
            {
                "metric": (
                    f"rollout particle-steps/s/chip @ N={N_PARTICLES}, "
                    f"k={K_NEIGHBORS}, 10 MP steps, latent 128"
                ),
                "value": round(particle_steps_per_sec, 1),
                "unit": "particle-steps/s",
                "vs_baseline": round(
                    particle_steps_per_sec / BASELINE_PARTICLE_STEPS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
