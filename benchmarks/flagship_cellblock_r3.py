"""Flagship (N=65k, k=16, H=128, 10 MP) cell-block experiment, round 3.

Round 2 rejected cell-block aggregation at this size because the per-graph
plan build (~7.6 ms XLA one-hot contract + aux gathers) exceeded the
gather savings at re-neighbor-every-step semantics. Round 3 changed the
plan-build economics: the Pallas one-hot S-build (~1 ms) and the kNN
candidate codes (no 1M-element aux[neighbors] gather) make the plan nearly
free. This script measures whether the selection-matrix MXU path now beats
the fused gather path end-to-end at flagship scale.

Also cross-checks the two marginal-step methodologies that currently
disagree (bench.py 10<->40 says ~36.8 ms; profile_flagship_r3 4<->12 said
~26.1 ms for the same fused rollout).

Timing per CLAUDE.md: perturbed inputs, scalar checksum to host, best-of-3,
marginal differences. Run from /root/repo on TPU:
python benchmarks/flagship_cellblock_r3.py
Writes benchmarks/results/flagship_cellblock_r3.json.
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
REPS = 3


def main():
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

    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, N, 3))
    drift = rng.normal(0, 5e-4, (WINDOW, N, 3)).cumsum(axis=0)
    positions = jnp.asarray(np.remainder(base + drift, 1.0), jnp.float32)
    temperatures = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (WINDOW, N, 1))), jnp.float32
    )
    model_config = default_model_config()
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    results = {}

    def run(steps, eps, **kw):
        out = rollout(
            params, model_config,
            jnp.remainder(positions + eps, 1.0), temperatures, stats,
            steps, num_neighbors=K, dtype=jnp.bfloat16, **kw,
        )
        cs = float(
            jnp.sum(out["Coordinates"][-1])
            + jnp.sum(out["InternalEnergy"][-1])
        )
        exact = out.get("neighbor_exactness")
        if exact is not None and not bool(jnp.all(exact)):
            raise AssertionError(f"exactness flag tripped ({kw})")
        return cs

    def measure(steps, **kw):
        run(steps, 0.0, **kw)  # compile
        best = float("inf")
        for rep in range(REPS):
            t0 = time.perf_counter()
            run(steps, (rep + 1) * 1e-6, **kw)
            best = min(best, time.perf_counter() - t0)
        return best

    def marginal(lo, hi, **kw):
        return (measure(hi, **kw) - measure(lo, **kw)) / (hi - lo) * 1e3

    # --- control: gather path (fused tail default-on), both methodologies
    for lo, hi in ((10, 40), (4, 12)):
        ms = marginal(lo, hi)
        results[f"gather_{lo}_{hi}_ms"] = ms
        print(f"gather marginal {lo}<->{hi}: {ms:.2f} ms/step "
              f"({N / ms * 1e3 / 1e6:.2f}M psteps/s)", flush=True)

    # --- cell-block: default spec + one finer-QB variant
    spec = choose_cellblock_spec(N, K)
    specs = {"default": spec}
    if spec.query_block != 32:
        specs["qb32"] = choose_cellblock_spec(N, K, query_block=32)
    for name, sp in specs.items():
        s_mb = sp.num_slots * sp.s_width / 1e6
        pad = sp.num_slots / N
        print(f"spec {name}: G={sp.grid_size} CC={sp.col_capacity} "
              f"QB={sp.query_block} W={sp.window} wrap={sp.wrap_cap} "
              f"slots={sp.num_slots} (pad {pad:.2f}x) S={s_mb:.0f} MB",
              flush=True)
        results[f"spec_{name}"] = (
            f"G={sp.grid_size} CC={sp.col_capacity} QB={sp.query_block} "
            f"W={sp.window} wrap={sp.wrap_cap} pad={pad:.2f}"
        )
        try:
            ms = marginal(10, 40, aggregation="cellblock", cellblock_spec=sp)
        except Exception as e:  # noqa: BLE001 - sweep must survive one spec
            print(f"cellblock {name} FAILED: {type(e).__name__}: {e}",
                  flush=True)
            results[f"cellblock_{name}_error"] = f"{type(e).__name__}: {e}"
            continue
        results[f"cellblock_{name}_ms"] = ms
        print(f"cellblock {name}: {ms:.2f} ms/step "
              f"({N / ms * 1e3 / 1e6:.2f}M psteps/s)", flush=True)

    # --- fidelity: 5-step trajectories agree between paths (summation
    # order differs inside a receiver's k-sum, so exact-zero is not
    # expected; bf16 forward => coordinate agreement at ~1e-3 scale).
    out_g = rollout(
        params, model_config, positions, temperatures, stats, 5,
        num_neighbors=K, dtype=jnp.bfloat16,
    )
    out_c = rollout(
        params, model_config, positions, temperatures, stats, 5,
        num_neighbors=K, dtype=jnp.bfloat16, aggregation="cellblock",
        cellblock_spec=spec,
    )
    from cosmology_gnn_simulation_tpu.ops.periodic import (
        min_image_displacement,
    )
    diff = float(jnp.max(jnp.abs(min_image_displacement(
        out_g["Coordinates"][-1] - out_c["Coordinates"][-1], 1.0
    ))))
    results["coord_maxdiff_5step"] = diff
    print(f"5-step coordinate max min-image |diff| gather vs cellblock: "
          f"{diff:.3e}", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/flagship_cellblock_r3.json", "w") as f:
        json.dump({k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in results.items()}, f, indent=2)
    print("wrote benchmarks/results/flagship_cellblock_r3.json", flush=True)


if __name__ == "__main__":
    main()
