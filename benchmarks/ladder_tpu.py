"""BASELINE config-ladder benchmark (single TPU chip).

Measures train-step and rollout s/step for BASELINE.json configs 1-4 and
writes ``benchmarks/results/ladder_tpu.json`` + a markdown table for
docs/PERFORMANCE.md. Timing per CLAUDE.md: perturbed inputs each repeat,
scalar checksum forced to host, min over repeats; rollout numbers come from
a warm jitted scan so the ~30 ms RPC floor amortizes over the steps.

Run: cd /root/repo && python benchmarks/ladder_tpu.py [--configs 1,2,3,4]
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

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results")

CONFIGS = {
    1: dict(n=4_096, k=8, latent=64, mp=5, momentum=0.0, train=True,
            rollout_steps=40, aggregation="gather"),
    2: dict(n=32_768, k=16, latent=128, mp=10, momentum=0.1, train=True,
            rollout_steps=20, aggregation="gather"),
    3: dict(n=65_536, k=16, latent=128, mp=10, momentum=0.0, train=False,
            rollout_steps=20, aggregation="gather"),
    4: dict(n=500_000, k=32, latent=256, mp=15, momentum=0.0, train=False,
            rollout_steps=4, aggregation="both"),
}


def synth_window(n, window=5, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (1, n, 3))
    drift = rng.normal(0, 0.002, (window, n, 3)).cumsum(axis=0)
    pos = np.remainder(base + drift, 1.0).astype(np.float32)
    temp = np.abs(rng.normal(1.0, 0.3, (window, n, 1))).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(temp)


def default_stats():
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    return NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )


def time_rollout(params, mc, pos, temp, stats, cfg, aggregation, dtype,
                 reneighbor_every=1):
    from cosmology_gnn_simulation_tpu.rollout import rollout

    steps = cfg["rollout_steps"]

    def run(eps):
        out = rollout(
            params, mc, pos + eps, temp, stats, steps,
            num_neighbors=cfg["k"], dtype=dtype,
            neighbor_method="pallas", aggregation=aggregation,
            reneighbor_every=reneighbor_every,
        )
        return float(jnp.sum(out["Coordinates"][-1][:2]))

    run(0.0)  # compile
    best = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        run((rep + 1) * 1e-7)
        best = min(best, time.perf_counter() - t0)
    return best / steps


def time_train(params, mc, stats, cfg, dtype):
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig, make_optimizer, make_train_step,
    )

    n = cfg["n"]
    tc = TrainConfig(
        num_neighbors=cfg["k"], batch_size=1, noise_std=3e-4,
        momentum_loss_weight=cfg["momentum"],
        compute_dtype="bfloat16" if dtype == jnp.bfloat16 else "float32",
        neighbor_method="pallas",
    )
    optimizer = make_optimizer(tc, steps_per_epoch=1)
    opt_state = optimizer.init(params)
    train_step = make_train_step(mc, stats, tc, optimizer)
    pos, temp = synth_window(n, seed=1)
    batch = {
        "positions": np.asarray(pos)[None],
        "temperatures": np.asarray(temp)[None],
        "target_positions": np.asarray(pos[-1]),
        "target_temperatures": np.asarray(temp[-1]),
    }
    batch["target_positions"] = batch["target_positions"][None]
    batch["target_temperatures"] = batch["target_temperatures"][None]
    p, o, m = train_step(params, opt_state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(m)
    best = float("inf")
    for rep in range(3):
        b = dict(batch)
        b["positions"] = batch["positions"] + (rep + 1) * 1e-7
        t0 = time.perf_counter()
        p, o, m = train_step(p, o, b, jax.random.PRNGKey(rep))
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )

    stats = default_stats()
    os.makedirs(RESULTS, exist_ok=True)
    out_path = os.path.join(RESULTS, "ladder_tpu.json")
    results = {}
    if os.path.exists(out_path):
        # Merge with previous runs so partial --configs passes don't drop
        # the other rows.
        with open(out_path) as f:
            results = {int(k2): v for k2, v in
                       json.load(f).get("configs", {}).items()}
    for idx in [int(s) for s in args.configs.split(",")]:
        cfg = CONFIGS[idx]
        mc = default_model_config(
            window_size=5, latent_size=cfg["latent"],
            mlp_hidden_size=cfg["latent"], mlp_num_hidden_layers=2,
            num_message_passing_steps=cfg["mp"],
        )
        params = init_encode_process_decode(jax.random.PRNGKey(0), mc)
        pos, temp = synth_window(cfg["n"])
        row = dict(cfg)
        aggs = (
            ["gather", "cellblock"]
            if cfg["aggregation"] == "both"
            else [cfg["aggregation"]]
        )
        for agg in aggs:
            t = time_rollout(params, mc, pos, temp, stats, cfg, agg, dtype)
            row[f"rollout_s_per_step_{agg}"] = t
            row[f"rollout_particle_steps_per_s_{agg}"] = cfg["n"] / t
            print(f"config {idx} rollout[{agg}]: {t*1e3:.1f} ms/step "
                  f"({cfg['n']/t/1e6:.2f}M particle-steps/s)", flush=True)
        if cfg["aggregation"] == "both":
            # Opt-in approximation: reuse the neighbor graph (and the
            # cell-block plan) for 4 steps — amortizes the per-graph kNN +
            # S build, which dominate after the kernel work.
            t = time_rollout(params, mc, pos, temp, stats, cfg,
                             "cellblock", dtype, reneighbor_every=4)
            row["rollout_s_per_step_cellblock_r4"] = t
            print(f"config {idx} rollout[cellblock,R=4]: {t*1e3:.1f} ms/step "
                  f"({cfg['n']/t/1e6:.2f}M particle-steps/s)", flush=True)
        if cfg["train"]:
            t = time_train(params, mc, stats, cfg, dtype)
            row["train_s_per_batch"] = t
            print(f"config {idx} train: {t*1e3:.1f} ms/batch", flush=True)
        results[idx] = row
        with open(out_path, "w") as f:
            json.dump({"dtype": args.dtype, "configs": results}, f, indent=2)
    print("written to benchmarks/results/ladder_tpu.json")


if __name__ == "__main__":
    main()
