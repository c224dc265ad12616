"""Round-4 evidence (round-3 verdict item 3): rollout-error curve of the
TPU-trained N=32,768 config-2 model vs the box^2/6 uncorrelated line, plus
the measured rollout step time — accuracy and throughput on the SAME
config.

Loads the checkpoint `benchmarks/results/ours_model_n32768_s42/model_best`
(trained on TPU by `measure_ours.py train --n 32768 --k 16 --latent 128
--mp_steps 10 --epochs 5 --tpu`), rolls out the held-out test trajectory
`benchmarks/fixtures/mse_test_n32768.hdf5` through the real library path
(the same `rollout` the render_rollout CLI drives), and writes
benchmarks/results/ours_rollout_n32768_s42.json.

Run from /root/repo on TPU: python benchmarks/eval_rollout_n32768.py
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--model", default="benchmarks/results/ours_model_n32768_s42/model_best")
    ap.add_argument("--test", default="benchmarks/fixtures/mse_test_n32768.hdf5")
    ap.add_argument(
        "--metadata", default="benchmarks/fixtures/mse_metadata_n32768.json")
    ap.add_argument(
        "--out", default="benchmarks/results/ours_rollout_n32768_s42.json")
    args = ap.parse_args()

    from cosmology_gnn_simulation_tpu.cli.one_step_test import (
        load_model_from_checkpoint,
    )
    from cosmology_gnn_simulation_tpu.data.hdf5 import read_simulation
    from cosmology_gnn_simulation_tpu.evaluation import (
        calculate_rollout_errors,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    print("backend:", jax.default_backend(), flush=True)
    with open(args.metadata) as f:
        stats = NormalizationStats.from_metadata(json.load(f))

    class _Flags:
        # load_model_from_checkpoint reads CLI-shaped fallbacks; the
        # checkpoint's embedded config wins for the model itself.
        window_size = 5
        num_neighbors = 16
        latent_size = 128
        mlp_hidden_size = 128
        mlp_num_hidden_layers = 2
        num_message_passing_steps = 10
        output_size = 3
        neighbor_method = "auto"

    params, model_config = load_model_from_checkpoint(args.model, _Flags())
    gt = read_simulation(args.test, fields=["Coordinates", "InternalEnergy"])
    window = _Flags.window_size  # node_input_size 17 <=> window 5
    steps = gt["Coordinates"].shape[0] - window
    pos0 = jnp.asarray(gt["Coordinates"][:window], jnp.float32)
    temp0 = jnp.asarray(gt["InternalEnergy"][:window], jnp.float32)
    if temp0.ndim == 2:
        temp0 = temp0[..., None]

    # Accuracy rollout at the CLI's defaults (f32 compute, gather path)
    # plus the brute-force fallback guard: any step whose cell-list
    # certificate trips is rerun exactly (the trained model's attractor
    # clustering can overflow the Poisson-quantile cell capacity late in
    # the trajectory) — the error curve below is certified-exact on every
    # step, and the JSON records how many steps needed the fallback.
    t0 = time.perf_counter()
    out = rollout(params, model_config, pos0, temp0, stats, steps,
                  num_neighbors=16, exactness_guard="fallback")
    wall_first = time.perf_counter() - t0
    out = {k: np.asarray(v) for k, v in out.items()}
    cert = out.pop("neighbor_exactness").astype(bool)
    exact = bool(cert.all())
    fallback_steps = int((~cert).sum())
    errors = calculate_rollout_errors(out, gt)

    # Step time: marginal between two rollout lengths, perturbed inputs
    # (CLAUDE.md TPU timing rules).
    def run(steps_, eps):
        o = rollout(
            params, model_config,
            jnp.remainder(pos0 + eps, stats.box_size), temp0, stats,
            steps_, num_neighbors=16, dtype=jnp.bfloat16,
        )
        return float(jnp.sum(o["Coordinates"][-1]))

    def measure(steps_):
        run(steps_, 0.0)
        best = float("inf")
        for rep in range(3):
            t = time.perf_counter()
            run(steps_, (rep + 1) * 1e-6)
            best = min(best, time.perf_counter() - t)
        return best

    t_s, t_l = measure(4), measure(steps)
    per_step = (t_l - t_s) / (steps - 4)

    results = {
        "n": 32768, "k": 16, "latent": 128, "mp_steps": 10, "seed": 42,
        "platform": jax.default_backend(),
        "rollout_steps": steps,
        "exactness_guard": "fallback",
        "cert_clean_all_steps": exact,
        "fallback_steps": fallback_steps,
        "position_errors_per_step": errors["position_errors"],
        "temperature_errors_per_step": errors["temperature_errors"],
        "mean_position_error": errors["mean_position_error"],
        "mean_temperature_error": errors["mean_temperature_error"],
        "uncorrelated_line_box2_over_6": stats.box_size**2 / 6.0,
        "rollout_s_per_step_marginal": round(per_step, 5),
        "timing_dtype": "bfloat16",
        "rollout_wall_first_s": round(wall_first, 1),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items()
                      if "per_step" not in k or "s_per" in k}, indent=2))


if __name__ == "__main__":
    main()
