"""Decompose the flagship-scale cell-block MP step (round 3).

The flagship cellblock experiment measured 39.6 ms/step vs the gather
path's 38.3 (flagship_cellblock_r3.json) — this probe attributes the
cell-block MP step's cost: the per-step padded-image realization (pad_src
row gather), the S @ window kernel itself, and the slot-space LN/MLP row
tax, to size the next optimization (a ranged block-copy kernel for the
piecewise-contiguous pad_src map, and per-column variable capacities).

Marginal-scan timing per CLAUDE.md. Run from /root/repo (TPU):
python benchmarks/probe_cb_flagship_parts_r3.py
Writes benchmarks/results/cb_flagship_parts_r3.json.
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

N, K, H = 65536, 16, 128
REPS = 3


def main():
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        build_cellblock,
        cellblock_aggregate_slots,
        choose_cellblock_spec,
    )
    from cosmology_gnn_simulation_tpu.featurize import (
        neighbor_search_certified,
    )

    print("backend:", jax.default_backend(), flush=True)
    box = 1.0
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.random((N, 3), np.float32))
    spec = choose_cellblock_spec(N, K)
    print(f"spec: G={spec.grid_size} CC={spec.col_capacity} "
          f"QB={spec.query_block} W={spec.window} wrap={spec.wrap_cap} "
          f"slots={spec.num_slots} pad={spec.num_slots / N:.2f}x", flush=True)

    nbr, codes, codes_cap, spill, exact = neighbor_search_certified(
        pos0, K, box, method="pallas", with_codes=True
    )
    plan = build_cellblock(pos0, nbr, box, spec, neighbor_codes=codes,
                           codes_cap=codes_cap, codes_spill=spill)
    z0 = jnp.asarray(rng.normal(0, 1, (spec.num_slots, H)), jnp.bfloat16)

    def scan_over(body, iters):
        @jax.jit
        def f(eps):
            def step(carry, _):
                z = z0 + (carry * eps).astype(jnp.bfloat16)
                return carry + 1.0, body(z)

            _, s = jax.lax.scan(step, 0.0, None, length=iters)
            return jnp.sum(s)

        return f

    def marginal(body, k_short=8, k_long=24):
        f_s, f_l = scan_over(body, k_short), scan_over(body, k_long)

        def best_of(f):
            float(f(0.0).reshape(()))
            best = float("inf")
            for rep in range(REPS):
                t0 = time.perf_counter()
                float(f((rep + 1) * 1e-6).reshape(()))
                best = min(best, time.perf_counter() - t0)
            return best

        return (best_of(f_l) - best_of(f_s)) / (k_long - k_short)

    results = {"spec": f"G={spec.grid_size} CC={spec.col_capacity} "
                       f"QB={spec.query_block} W={spec.window} "
                       f"pad={spec.num_slots / N:.2f}"}

    # 1. padded-image realization alone (the per-step pad_src row gather)
    def body_pad(z):
        padded = jnp.take(
            jnp.concatenate([z, jnp.zeros((1, H), z.dtype)]),
            plan.pad_src, axis=0,
        )
        return jnp.sum(padded[:1].astype(jnp.float32))

    # 2. full aggregation (pad + kernel)
    def body_agg(z):
        out = cellblock_aggregate_slots(z, plan, spec)
        return jnp.sum(out[:1].astype(jnp.float32))

    # 3. slot-row LayerNorm+matmul tax (the MLP work the 1.41x padding
    #    multiplies) — slot rows vs particle rows
    wmat = jnp.asarray(rng.normal(0, 0.1, (H, H)), jnp.bfloat16)

    def ln_mlp(x):
        mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        y = ((x.astype(jnp.float32) - mu) / jnp.sqrt(var + 1e-5))
        return jnp.maximum(y.astype(jnp.bfloat16) @ wmat, 0)

    def body_mlp_slots(z):
        return jnp.sum(ln_mlp(z)[:1].astype(jnp.float32))

    def body_mlp_particles(z):
        return jnp.sum(ln_mlp(z[:N])[:1].astype(jnp.float32))

    for name, body in (
        ("pad_gather", body_pad),
        ("aggregate_full", body_agg),
        ("ln_mlp_slot_rows", body_mlp_slots),
        ("ln_mlp_particle_rows", body_mlp_particles),
    ):
        ms = marginal(body) * 1e3
        results[name + "_ms"] = round(ms, 3)
        print(f"{name}: {ms:.2f} ms", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    out = "benchmarks/results/cb_flagship_parts_r3.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
