"""Flagship rollout: UNIFORM vs VARIABLE cell-block slot layouts (round 4).

VERDICT round-3 item 5: the uniform layout pads slot rows by the per-column
Poisson tail (measured 1.41x at the flagship spec, 1.29x at config 4); the
variable layout packs columns at query-block granularity behind
data-dependent prefix offsets, cutting the row tax to the QB-rounding floor
(~1.1x). This driver measures the number that matters — the full jitted
rollout (re-neighbor every step, certificate on) — hybrid and slots modes,
both layouts, plus trajectory agreement.

Also reports the spec geometry (num_slots, padding ratio) for both layouts
so the ms delta can be attributed.

Marginal-scan timing per CLAUDE.md. Run from /root/repo on TPU:
python benchmarks/flagship_variable_r4.py [--n 65536] [--tag flagship]
Writes benchmarks/results/<tag>_variable_r4.json.
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

WINDOW = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--latent", type=int, default=128)
    ap.add_argument("--mp", type=int, default=10)
    ap.add_argument("--short", type=int, default=10)
    ap.add_argument("--long", type=int, default=40)
    ap.add_argument("--modes", default="hybrid,slots")
    ap.add_argument("--tag", default="flagship")
    args = ap.parse_args()
    n, k = args.n, args.k
    SHORT, LONG = args.short, args.long

    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        choose_cellblock_spec,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    print("backend:", jax.default_backend(), flush=True)
    model_config = default_model_config(
        latent_size=args.latent, mlp_hidden_size=args.latent,
        num_message_passing_steps=args.mp,
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
    base = rng.uniform(0, 1, (1, n, 3))
    drift = rng.normal(0, 5e-4, (WINDOW, n, 3)).cumsum(axis=0)
    positions = jnp.asarray(np.remainder(base + drift, 1.0), jnp.float32)
    temperatures = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (WINDOW, n, 1))), jnp.float32
    )

    results = {}
    for name, variable in (("uniform", False), ("variable", True)):
        spec = choose_cellblock_spec(n, k, variable=variable)
        results[f"spec_{name}"] = {
            "num_slots": spec.num_slots,
            "padding_ratio": round(spec.num_slots / n, 3),
            "query_block": spec.query_block,
            "col_capacity": spec.col_capacity,
            "window": spec.window,
        }
        print(name, results[f"spec_{name}"], flush=True)

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
            stats, steps, num_neighbors=k, dtype=jnp.bfloat16, **kw,
        )
        exact = out["neighbor_exactness"]
        return float(checksum(out)) + 0.0 * float(exact.all()), out

    def marginal(tag, **kw):
        def measure(steps):
            run(steps, 0.0, **kw)
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                run(steps, (rep + 1) * 1e-6, **kw)
                best = min(best, time.perf_counter() - t0)
            return best

        t_s = measure(SHORT)
        t_l = measure(LONG)
        per_step = (t_l - t_s) / (LONG - SHORT)
        # Certificate must hold on the measured configuration.
        _, out = run(SHORT, 7e-7, **kw)
        exact = bool(jnp.all(out["neighbor_exactness"]))
        results[tag] = {
            "ms_per_step": round(per_step * 1e3, 3),
            "psteps_per_s": round(n / per_step, 1),
            "exact_all_steps": exact,
        }
        print(tag, results[tag], flush=True)
        return out

    modes = args.modes.split(",")
    base_out = var_out = None
    if "hybrid" in modes:
        base_out = marginal("hybrid_uniform", aggregation="cellblock_hybrid")
        var_out = marginal(
            "hybrid_variable", aggregation="cellblock_hybrid",
            cellblock_variable=True,
        )
    if "slots" in modes:
        s_out = marginal("slots_uniform", aggregation="cellblock")
        sv_out = marginal(
            "slots_variable", aggregation="cellblock",
            cellblock_variable=True,
        )
        if base_out is None:
            base_out, var_out = s_out, sv_out

    results["max_coord_diff_variable_vs_uniform"] = float(
        jnp.max(jnp.abs(base_out["Coordinates"] - var_out["Coordinates"]))
    )
    print("max_coord_diff:", results["max_coord_diff_variable_vs_uniform"],
          flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    out_path = f"benchmarks/results/{args.tag}_variable_r4.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
