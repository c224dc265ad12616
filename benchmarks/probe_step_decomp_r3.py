"""In-scan attribution of the flagship rollout step (round 3).

The R=2 A/B (flagship_sorted_r3.json: 38.76 -> 32.09 ms/step) implies each
search round costs ~13.4 ms in-scan — substantially more than the ~8.6 ms
the standalone kNN decomposition attributes to the search itself. This
probe attributes the full 38.8 ms budget from INSIDE the rollout scan by
differencing variants of the real `rollout()` entry point:

  base        R=1, guard=flag, fused_tail auto, MP=10   (the headline)
  guard_off   R=1, guard=off          -> in-scan certificate cost
  r2 / once   R=2 / search-only-at-init -> per-search-round cost
  ft_off      fused_tail=False        -> step-tail kernel win
  mp1         MP=1                    -> per-MP-step cost ((base-mp1)/9)

Marginal-scan timing per CLAUDE.md. Run from /root/repo on TPU:
python benchmarks/probe_step_decomp_r3.py
Writes benchmarks/results/step_decomp_r3.json.
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
    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )
    cfg10 = default_model_config()
    cfg1 = default_model_config(num_message_passing_steps=1)
    p10 = init_encode_process_decode(jax.random.PRNGKey(0), cfg10)
    p1 = init_encode_process_decode(jax.random.PRNGKey(0), cfg1)

    rng = np.random.default_rng(0)
    base_pos = rng.uniform(0, 1, (1, N, 3))
    drift = rng.normal(0, 5e-4, (WINDOW, N, 3)).cumsum(axis=0)
    positions = jnp.asarray(np.remainder(base_pos + drift, 1.0), jnp.float32)
    temperatures = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (WINDOW, N, 1))), jnp.float32
    )

    @jax.jit
    def checksum(out):
        return (
            jnp.sum(out["Coordinates"][-1])
            + jnp.sum(out["InternalEnergy"][-1])
        )

    def run(steps, eps, params, cfg, **kw):
        out = rollout(
            params, cfg,
            jnp.remainder(positions + eps, 1.0), temperatures,
            stats, steps, num_neighbors=K, dtype=jnp.bfloat16, **kw,
        )
        return float(checksum(out))

    def measure(steps, params, cfg, **kw):
        run(steps, 0.0, params, cfg, **kw)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            run(steps, (rep + 1) * 1e-6, params, cfg, **kw)
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}

    def marginal(tag, params, cfg, **kw):
        t_s = measure(SHORT, params, cfg, **kw)
        t_l = measure(LONG, params, cfg, **kw)
        ms = (t_l - t_s) / (LONG - SHORT) * 1e3
        results[tag] = round(ms, 3)
        print(f"{tag}: {ms:.3f} ms/step", flush=True)

    marginal("base", p10, cfg10)
    marginal("guard_off", p10, cfg10, exactness_guard="off")
    marginal("r2", p10, cfg10, reneighbor_every=2)
    marginal("once", p10, cfg10, reneighbor_every=LONG + 1)
    marginal("ft_off", p10, cfg10, fused_tail=False)
    marginal("mp1", p1, cfg1)

    results["derived"] = {
        "certificate_ms": round(results["base"] - results["guard_off"], 3),
        "search_round_ms_from_r2": round(
            2 * (results["base"] - results["r2"]), 3
        ),
        "search_round_ms_from_once": round(
            results["base"] - results["once"], 3
        ),
        "per_mp_step_ms": round((results["base"] - results["mp1"]) / 9, 3),
        "fused_tail_win_ms": round(results["ft_off"] - results["base"], 3),
        "fixed_tail_ms_mp0_extrap": round(
            results["once"]
            - 10 * (results["base"] - results["mp1"]) / 9, 3
        ),
    }
    print(json.dumps(results["derived"], indent=2), flush=True)
    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/step_decomp_r3.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
