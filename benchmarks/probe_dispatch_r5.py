"""Round 5: pin the aggregation="auto" dispatch thresholds by measurement.

The round-4 numbers fix the table at N=65k (hybrid wins rollout 29.3 vs
38.3 ms and train 117 vs 236 ms) and N=500k (slots wins), but the 32k
boundary was asserted, not measured. This probe measures BOTH paths at
N=32,768 (config-2 shapes: k=16, latent 128, 10 MP steps, bf16):

  * rollout marginal ms/step, gather vs cellblock_hybrid
    (10<->40-step marginal, perturbed inputs, checksum forced);
  * full train step ms, gather vs cellblock_hybrid (fused tail on).

Run from /root/repo on TPU: python benchmarks/probe_dispatch_r5.py
Writes benchmarks/results/dispatch_r5.json.
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

N, K, LATENT, MP, WINDOW = 32768, 16, 128, 10, 5
SHORT, LONG = 10, 40
REPS = 3


def _stats():
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    return NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )


def main():
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig,
        default_model_config,
        make_optimizer,
        make_train_step,
    )

    print("backend:", jax.default_backend(), flush=True)
    results = {"n": N, "k": K, "latent": LATENT, "mp": MP}
    stats = _stats()
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, N, 3))
    drift = rng.normal(0, 5e-4, (WINDOW, N, 3)).cumsum(axis=0)
    positions = jnp.asarray(np.remainder(base + drift, 1.0), jnp.float32)
    temperatures = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (WINDOW, N, 1))), jnp.float32
    )
    model_config = default_model_config(
        latent_size=LATENT, mlp_hidden_size=LATENT,
        num_message_passing_steps=MP,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)

    @jax.jit
    def checksum(out):
        return (
            jnp.sum(out["Coordinates"][-1])
            + jnp.sum(out["InternalEnergy"][-1])
        )

    def run(steps, eps, agg):
        out = rollout(
            params, model_config,
            jnp.remainder(positions + eps, 1.0), temperatures,
            stats, steps, num_neighbors=K, dtype=jnp.bfloat16,
            aggregation=agg,
        )
        return float(checksum(out))

    def measure(steps, agg):
        run(steps, 0.0, agg)
        best = float("inf")
        for rep in range(REPS):
            t0 = time.perf_counter()
            run(steps, (rep + 1) * 1e-6, agg)
            best = min(best, time.perf_counter() - t0)
        return best

    for agg in ("gather", "cellblock_hybrid"):
        t_s = measure(SHORT, agg)
        t_l = measure(LONG, agg)
        ms = (t_l - t_s) / (LONG - SHORT) * 1e3
        results[f"rollout_{agg}_ms_per_step"] = round(ms, 3)
        print(f"rollout {agg}: {ms:.2f} ms/step", flush=True)

    # ---- Train step A/B.
    tpos = jnp.asarray(
        np.remainder(base[0] + drift[-1] + rng.normal(0, 5e-4, (N, 3)),
                     1.0).astype(np.float32))
    batch = {
        "positions": positions[None], "temperatures": temperatures[None],
        "target_positions": tpos[None],
        "target_temperatures": temperatures[-1][None],
    }
    for agg in ("gather", "cellblock_hybrid"):
        tc = TrainConfig(
            num_neighbors=K, batch_size=1, noise_std=3e-4, augment_prob=0.0,
            compute_dtype="bfloat16", aggregation=agg,
            momentum_loss_weight=1.0,
        )
        opt = make_optimizer(tc, steps_per_epoch=1)
        step = make_train_step(model_config, stats, tc, opt)
        opt_state = opt.init(params)

        def trun(eps):
            b = dict(batch)
            b["positions"] = jnp.remainder(batch["positions"] + eps, 1.0)
            p2, _, m = step(params, opt_state, b, jax.random.PRNGKey(3))
            return float(jax.tree.leaves(p2)[0].reshape(-1)[0])

        trun(0.0)
        best = float("inf")
        for rep in range(REPS):
            t0 = time.perf_counter()
            trun((rep + 1) * 1e-6)
            best = min(best, time.perf_counter() - t0)
        results[f"train_{agg}_ms"] = round(best * 1e3, 1)
        print(f"train {agg}: {best*1e3:.1f} ms", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/dispatch_r5.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
