"""Round-3 TPU profile of BASELINE config 4 (N=500k, k=32, latent 256,
15 MP steps) on the per-column-compacted cell-block path.

Measures, on the real chip (timing per CLAUDE.md: perturbed inputs, scalar
checksum to host, min over repeats, marginal differences):

  * plan build (forward table) and plan build with the reverse table
  * the window-matmul kernel alone (slot-space aggregate, fixed plan)
  * full cell-block rollout marginal step (round-2 result: 1459 ms;
    round-3 target: <= ~700 ms)
  * full TRAIN step (fwd+bwd+adam, B=1, bf16, remat) — round-2 verdict
    item 1: config-4 training must execute on one chip (the gather path
    compiled to 17.3 GB vs 15.75 GB HBM)

Run from /root/repo (TPU): python benchmarks/profile_config4_r3.py
Writes benchmarks/results/config4_r3.json.
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

REPS = 3


def timeit(fn, *args, reps=REPS):
    float(fn(*args, 0.0).reshape(()))
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        float(fn(*args, (rep + 1) * 1e-6).reshape(()))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--latent", type=int, default=256)
    ap.add_argument("--mp", type=int, default=15)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--train_only", action="store_true",
                    help="skip the rollout measurements (train step only)")
    args = ap.parse_args()
    n, k, latent = args.n, args.k, args.latent

    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        build_cellblock,
        cellblock_aggregate_slots,
        choose_cellblock_spec,
    )
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import pallas_cell_list_knn
    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig,
        default_model_config,
        make_optimizer,
        make_train_step,
    )
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, n, 3))
    drift = rng.normal(0, 2e-4, (5, n, 3)).cumsum(axis=0)
    pos_seq = jnp.asarray(np.remainder(base + drift, 1.0).astype(np.float32))
    temp_seq = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (5, n, 1))).astype(np.float32))
    positions = pos_seq[-1]

    results = {}
    if args.train_only:
        try:
            with open("benchmarks/results/config4_r3.json") as f:
                results.update(json.load(f))
        except FileNotFoundError:
            pass
    spec = choose_cellblock_spec(n, k)
    results["spec"] = (
        f"G={spec.grid_size} CC={spec.col_capacity} QB={spec.query_block} "
        f"W={spec.window} wrap={spec.wrap_cap}"
    )
    results["slots"] = spec.num_slots
    results["slot_padding"] = round(spec.num_slots / n, 3)
    results["s_table_gb"] = round(spec.num_slots * spec.s_width / 1e9, 3)
    print(results["spec"], "padding", results["slot_padding"],
          "S", results["s_table_gb"], "GB", flush=True)

    MEASURE_ROLLOUT = not args.train_only
    if MEASURE_ROLLOUT:
        grid = choose_cell_grid(n, k)
        nbr = jax.jit(
            lambda p: pallas_cell_list_knn(p, k, 1.0, grid)
        )(positions)
        nbr = jax.block_until_ready(nbr)

        # Plan builds (jitted; eps perturbs positions so the tunnel can't memoize)
        @jax.jit
        def plan_fwd(p, nb, eps):
            plan = build_cellblock(
                jnp.remainder(p + eps, 1.0), nb, 1.0, spec
            )
            return (jnp.sum(plan.s_table[::4097].astype(jnp.int32))
                    + plan.overflow + plan.dropped_edges).astype(jnp.float32)

        results["plan_fwd_ms"] = timeit(plan_fwd, positions, nbr) * 1e3
        print(f"plan_fwd: {results['plan_fwd_ms']:.0f} ms", flush=True)

        @jax.jit
        def plan_rev(p, nb, eps):
            plan = build_cellblock(
                jnp.remainder(p + eps, 1.0), nb, 1.0, spec, with_reverse=True
            )
            return (jnp.sum(plan.s_rev_table[::4097].astype(jnp.int32))
                    + plan.reverse_mismatch).astype(jnp.float32)

        results["plan_rev_ms"] = timeit(plan_rev, positions, nbr) * 1e3
        print(f"plan_with_reverse: {results['plan_rev_ms']:.0f} ms", flush=True)

        plan = jax.block_until_ready(
            jax.jit(
                lambda p, nb: build_cellblock(p, nb, 1.0, spec)
            )(positions, nbr)
        )
        print("diagnostics: overflow", int(plan.overflow),
              "dropped", int(plan.dropped_edges),
              "window_overflow", int(plan.window_overflow), flush=True)
        results["overflow"] = int(plan.overflow)
        results["dropped_edges"] = int(plan.dropped_edges)

        z = jnp.asarray(
            rng.standard_normal((spec.num_slots, latent)).astype(np.float32))

        MEASURE_ROLLOUT = not args.train_only
        # Plan passed as an ARGUMENT: closing over it would bake the 2.3 GB
        # S table into the jaxpr as a constant (the remote compile service
        # rejects the request body).
        @jax.jit
        def agg(zz, pl, eps):
            out = cellblock_aggregate_slots(zz + eps, pl, spec)
            return jnp.sum(out[:: 4097]).reshape(())

        def agg_t(zz, eps):
            return agg(zz, plan, eps)

        results["kernel_ms"] = timeit(agg_t, z) * 1e3
        print(f"aggregate kernel: {results['kernel_ms']:.1f} ms", flush=True)

    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )
    model_config = default_model_config(
        latent_size=latent, mlp_hidden_size=latent,
        num_message_passing_steps=args.mp,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)

    if MEASURE_ROLLOUT:
        def roll_steps(num_steps, eps):
            out = rollout(
                params, model_config,
                jnp.remainder(pos_seq + eps, 1.0), temp_seq, stats, num_steps,
                num_neighbors=k, neighbor_method="pallas",
                aggregation="cellblock", dtype=jnp.bfloat16,
            )
            return jnp.sum(out["Coordinates"][-1]).reshape(())

        jroll = jax.jit(roll_steps, static_argnums=0)
        for steps in (1, 3):
            float(jroll(steps, 0.0))
            best = float("inf")
            for rep in range(REPS):
                t0 = time.perf_counter()
                float(jroll(steps, (rep + 1) * 1e-6))
                best = min(best, time.perf_counter() - t0)
            results[f"rollout_{steps}step_ms"] = best * 1e3
            print(f"rollout_{steps}step: {best*1e3:.0f} ms", flush=True)
        marginal = (
            results["rollout_3step_ms"] - results["rollout_1step_ms"]) / 2
        results["rollout_marginal_step_ms"] = marginal
        results["particle_steps_per_s"] = n / (marginal / 1e3)
        print(f"marginal rollout step: {marginal:.0f} ms "
              f"({results['particle_steps_per_s']/1e6:.2f}M particle-steps/s)",
              flush=True)

    if not args.skip_train:
        # Hierarchical remat (remat_chunk): 15 stored [646k, 256] scan
        # carries (4.9 GB) shrink to 3 outer + 5 inner — the flat per-step
        # remat still ResourceExhausted'd on the 15.75 GB chip.
        mc_train = default_model_config(
            latent_size=latent, mlp_hidden_size=latent,
            num_message_passing_steps=args.mp, remat=True,
            remat_chunk=5, carry_dtype="bfloat16",
        )
        tc = TrainConfig(
            num_neighbors=k, batch_size=1, noise_std=3e-4,
            compute_dtype="bfloat16", aggregation="cellblock",
            momentum_loss_weight=1.0,
        )
        opt = make_optimizer(tc, steps_per_epoch=1)
        opt_state = opt.init(params)
        step = make_train_step(model_config=mc_train, stats=stats,
                               train_config=tc, optimizer=opt)
        batch = {
            "positions": pos_seq[None],
            "temperatures": temp_seq[None],
            "target_positions": positions[None],
            "target_temperatures": temp_seq[-1][None],
        }
        print("compiling train step...", flush=True)
        t0 = time.perf_counter()
        p2, o2, m = step(params, opt_state, batch,
                         jax.random.PRNGKey(0))
        m = {kk: float(vv) for kk, vv in m.items()}
        print(f"train step compiled+ran in {time.perf_counter()-t0:.0f} s; "
              f"metrics {m}", flush=True)
        results["train_violations"] = m.get("cellblock_violations", -1.0)
        best = float("inf")
        for rep in range(REPS):
            batch2 = dict(batch)
            batch2["positions"] = jnp.remainder(
                batch["positions"] + (rep + 1) * 1e-6, 1.0)
            t0 = time.perf_counter()
            p3, _, m3 = step(params, opt_state, batch2,
                             jax.random.PRNGKey(rep + 1))
            float(jax.tree.leaves(p3)[0].sum())
            best = min(best, time.perf_counter() - t0)
        results["train_step_ms"] = best * 1e3
        print(f"train step: {best*1e3:.0f} ms", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    out_path = "benchmarks/results/config4_r3.json"
    with open(out_path, "w") as f:
        json.dump({kk: (round(vv, 2) if isinstance(vv, float) else vv)
                   for kk, vv in results.items()}, f, indent=2)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
