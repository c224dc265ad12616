"""TPU profile of BASELINE config 4 (N=500k, k=32, latent 256, 15 MP steps).

Round 1 measured the full rollout step at 3.2 s — "unoptimized at this
size". This script times the components separately so optimization targets
the real cost:

  * pallas cell-list kNN at N=500k/k=32 (and capacity variants)
  * XLA cell-list kNN (comparison)
  * model forward alone (graph fixed)
  * featurize alone (includes the kNN)
  * one full rollout step (scan of length 1..2 marginal)

Timing per CLAUDE.md: perturbed inputs, scalar checksum to host, min over
repeats, marginal differences against the ~30 ms RPC floor. Run:
cd /root/repo && python benchmarks/profile_config4_tpu.py [--n 500000]
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
    args = ap.parse_args()
    n, k = args.n, args.k

    from cosmology_gnn_simulation_tpu.featurize import featurize
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        apply_encode_process_decode,
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.ops.cell_list import (
        cell_list_knn,
        choose_cell_grid,
    )
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import pallas_cell_list_knn
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
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
    grid = choose_cell_grid(n, k)
    results["grid"] = f"G={grid.grid_size} C={grid.cell_capacity}"
    print(results["grid"], flush=True)

    @jax.jit
    def knn_pallas(p, eps):
        q = jnp.remainder(p + eps, 1.0)
        idx = pallas_cell_list_knn(q, k, 1.0, grid)
        return jnp.sum(idx)

    results["knn_pallas_ms"] = timeit(knn_pallas, positions) * 1e3
    print(f"knn_pallas: {results['knn_pallas_ms']:.0f} ms", flush=True)

    # Grid sweep: the (G, C) defaults were tuned at N=65k; the optimum can
    # differ at this size. Certified = no overflow (exactness requires a
    # separate d_k check, done by the production path).
    from cosmology_gnn_simulation_tpu.ops.cell_list import CellGrid

    for g_, c_ in ((26, 64), (32, 40), (36, 32)):
        sweep_grid = CellGrid(g_, c_)

        @jax.jit
        def knn_sweep(p, eps, sg=sweep_grid):
            q = jnp.remainder(p + eps, 1.0)
            idx, (ovf, maxd2, excess) = pallas_cell_list_knn(
                q, k, 1.0, sg, return_diagnostics=True)
            return jnp.sum(idx) + ovf

        t = timeit(knn_sweep, positions) * 1e3
        idx, (ovf, maxd2, excess) = pallas_cell_list_knn(
            positions, k, 1.0, sweep_grid, return_diagnostics=True)
        cert = int(ovf) == 0 and float(excess) <= 0.0
        results[f"knn_G{g_}C{c_}_ms"] = t
        print(f"knn G={g_} C={c_}: {t:.0f} ms certified={cert}",
              flush=True)

    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )
    model_config = default_model_config(
        latent_size=args.latent, mlp_hidden_size=args.latent,
        num_message_passing_steps=args.mp,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)

    @jax.jit
    def feat_only(ps, ts, eps):
        g = featurize(
            jnp.remainder(ps + eps, 1.0), ts, stats, jax.random.PRNGKey(0),
            num_neighbors=k, neighbor_method="pallas",
        )
        return jnp.sum(g.neighbors) + jnp.sum(g.nodes)

    results["featurize_ms"] = timeit(feat_only, pos_seq, temp_seq) * 1e3
    print(f"featurize: {results['featurize_ms']:.0f} ms", flush=True)

    graph = jax.jit(
        lambda ps, ts: featurize(
            ps, ts, stats, jax.random.PRNGKey(0), num_neighbors=k,
            neighbor_method="pallas",
        )
    )(pos_seq, temp_seq)
    graph = jax.block_until_ready(graph)

    for dtype_name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        @jax.jit
        def fwd(nodes, eps, dtype=dtype):
            g2 = graph._replace(nodes=nodes + eps)
            out = apply_encode_process_decode(params, g2, model_config, dtype)
            return jnp.sum(out["acceleration"]) + jnp.sum(out["temp_rate"])

        results[f"model_fwd_{dtype_name}_ms"] = (
            timeit(fwd, graph.nodes) * 1e3)
        print(f"model_fwd_{dtype_name}: "
              f"{results[f'model_fwd_{dtype_name}_ms']:.0f} ms", flush=True)

    def roll_steps(num_steps, eps):
        out = rollout(
            params, model_config,
            jnp.remainder(pos_seq + eps, 1.0), temp_seq, stats, num_steps,
            num_neighbors=k, neighbor_method="pallas", exactness_guard="off",
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
    print(json.dumps({k2: (round(v, 1) if isinstance(v, float) else v)
                      for k2, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
