"""Attribute the flagship rollout's ~12.2 ms in-scan search round.

step_decomp_r3.json put the per-search-round cost at 12.2-13.7 ms in-scan,
vs the 8.6 ms the older standalone decomposition (knn_decomp_r3.json,
measured pre-Poisson-capacity/pre-spill-bucket) attributed to the kNN.
This probe re-measures the CURRENT search stack in-scan, in layers:

  knn_raw     pallas_cell_list_knn, no diagnostics
  knn_diag    + return_diagnostics (overflow / max_excess margins)
  certified   neighbor_search_certified (what the rollout calls)
  cert_wrap   + the rollout's wrap_positions pre-pass

Marginal-scan timing per CLAUDE.md (perturb positions per iteration via a
carried epsilon, checksum forced to host). Run from /root/repo on TPU:
python benchmarks/probe_search_round_r3.py
Writes benchmarks/results/search_round_r3.json.
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

N, K = 65536, 16
SHORT, LONG = 6, 22
REPS = 3


def main():
    from cosmology_gnn_simulation_tpu.featurize import (
        neighbor_search_certified,
    )
    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        pallas_cell_list_knn,
    )
    from cosmology_gnn_simulation_tpu.ops.periodic import wrap_positions

    print("backend:", jax.default_backend(), flush=True)
    box = 1.0
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.random((N, 3), np.float32))
    grid = choose_cell_grid(N, K)
    print(f"grid: G={grid.grid_size} C={grid.cell_capacity}", flush=True)

    def scan_over(body, iters):
        @jax.jit
        def f(eps):
            def step(carry, _):
                pos = jnp.remainder(pos0 + carry * eps, 1.0)
                return carry + 1.0, body(pos)

            _, s = jax.lax.scan(step, 0.0, None, length=iters)
            return jnp.sum(s)

        return f

    def marginal(body):
        f_s, f_l = scan_over(body, SHORT), scan_over(body, LONG)

        def best_of(f):
            float(f(0.0).reshape(()))
            best = float("inf")
            for rep in range(REPS):
                t0 = time.perf_counter()
                float(f((rep + 1) * 1e-6).reshape(()))
                best = min(best, time.perf_counter() - t0)
            return best

        return (best_of(f_l) - best_of(f_s)) / (LONG - SHORT) * 1e3

    def knn_raw(pos):
        idx = pallas_cell_list_knn(pos, K, box, grid)
        return jnp.sum(idx[:1].astype(jnp.float32))

    def knn_diag(pos):
        idx, (ovf, _, mex) = pallas_cell_list_knn(
            pos, K, box, grid, return_diagnostics=True
        )
        return (jnp.sum(idx[:1].astype(jnp.float32))
                + ovf.astype(jnp.float32) + mex)

    def certified(pos):
        idx, exact = neighbor_search_certified(pos, K, box, method="pallas")
        return jnp.sum(idx[:1].astype(jnp.float32)) + exact.astype(
            jnp.float32
        )

    def cert_wrap(pos):
        idx, exact = neighbor_search_certified(
            wrap_positions(pos, box), K, box, method="pallas"
        )
        return jnp.sum(idx[:1].astype(jnp.float32)) + exact.astype(
            jnp.float32
        )

    results = {"grid": f"G={grid.grid_size} C={grid.cell_capacity}"}
    for name, body in (
        ("knn_raw", knn_raw),
        ("knn_diag", knn_diag),
        ("certified", certified),
        ("cert_wrap", cert_wrap),
    ):
        ms = marginal(body)
        results[name + "_ms"] = round(ms, 3)
        print(f"{name}: {ms:.3f} ms", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/search_round_r3.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote benchmarks/results/search_round_r3.json", flush=True)


if __name__ == "__main__":
    main()
