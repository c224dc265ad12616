"""TPU training-step profile at BASELINE config 2 (N=32k, k=16, latent 128,
10 MP steps, momentum loss) — locates where the 386 ms round-1 step goes and
compares backward-pass strategies:

* native autodiff (the gather's VJP is an XLA scatter-add),
* sorted-edge custom VJP (backward = prefix-sum differences over the
  sender-sorted edge stream, ops/aggregation.py),
* fp32 vs bf16 compute.

Timing per CLAUDE.md: perturb inputs every call, force a scalar checksum to
host, min over repeats; fwd-only and fwd+bwd+adam are measured separately so
the backward share is a difference of two measurements (the ~30 ms RPC floor
cancels). Run on the real TPU: `cd /root/repo && python
benchmarks/profile_train_tpu.py` (no PYTHONPATH!).
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

N, K, LATENT, MP = 32768, 16, 128, 10
REPS = 3


def main():
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig,
        default_model_config,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    model_config = default_model_config(latent_size=LATENT,
                                        mlp_hidden_size=LATENT,
                                        num_message_passing_steps=MP)
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
    drift = rng.normal(0, 5e-4, (5, N, 3)).cumsum(axis=0)
    batch = {
        "positions": np.remainder(base + drift, 1.0).astype(np.float32)[None],
        "temperatures": np.abs(
            rng.normal(1.0, 0.3, (1, 5, N, 1))).astype(np.float32),
        "target_positions": rng.uniform(0, 1, (1, N, 3)).astype(np.float32),
        "target_temperatures": np.abs(
            rng.normal(1.0, 0.3, (1, N, 1))).astype(np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def time_step(fn, *args, perturb):
        fn(*args, 0.0)  # compile
        best = float("inf")
        for rep in range(REPS):
            t0 = time.perf_counter()
            fn(*args, (rep + 1) * 1e-6)
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}

    for dtype_name in ("float32", "bfloat16"):
        common = dict(num_neighbors=K, batch_size=1, noise_std=3e-4,
                      momentum_loss_weight=1.0, compute_dtype=dtype_name)

        tc = TrainConfig(**common)
        eval_step = make_eval_step(model_config, stats, tc)

        def run_eval(batch, params, eps):
            b = dict(batch)
            b["positions"] = jnp.remainder(b["positions"] + eps, 1.0)
            m = eval_step(params, b)
            return float(m["loss"])

        results[f"fwd_only_{dtype_name}"] = time_step(
            lambda b, p, e: run_eval(b, p, e), batch, params, perturb=True)

        variants = [
            ("native", dict(build_reverse=False)),
            ("sorted_edges", dict(build_reverse=True)),
        ]
        for name, extra in variants:
            tc = TrainConfig(**common, **extra)
            optimizer = make_optimizer(tc, steps_per_epoch=1)
            opt_state = optimizer.init(params)
            train_step = make_train_step(model_config, stats, tc, optimizer)

            def run_train(batch, eps):
                b = dict(batch)
                b["positions"] = jnp.remainder(b["positions"] + eps, 1.0)
                p2, o2, m = train_step(params, opt_state, b,
                                       jax.random.PRNGKey(0))
                return float(m["loss"])

            key = f"train_{name}_{dtype_name}"
            results[key] = time_step(
                lambda b, e: run_train(b, e), batch, perturb=True)
            print(f"{key}: {results[key]*1e3:.1f} ms", flush=True)

    print(json.dumps({k: round(v * 1e3, 1) for k, v in results.items()},
                     indent=2))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "train_profile_tpu.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
