"""Cost model of the pallas kNN select kernel (round 3).

The round-3 decomposition (knn_decomp_r3.json) shows the kernel dominates
the flagship kNN (7.3 of 8.6 ms at G=19/cap24); the Poisson capacity fix
(cap 24 -> 31, padded 32) grew the [cap, 27*cap] tile 1.56x. To choose the
next optimization (fewer selection passes vs smaller tiles vs window-shared
DMA), fit time ~ cap_pad * num_cand * (c0 + c1 * k) from a (cap, k) sweep,
plus G variants to separate DMA from compute.

Marginal-scan timing per CLAUDE.md. Run from /root/repo (TPU):
python benchmarks/probe_knn_kernel_r3.py
Writes benchmarks/results/knn_kernel_r3.json.
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

N = 65536
REPS = 3


def main():
    from cosmology_gnn_simulation_tpu.ops.cell_list import CellGrid
    from cosmology_gnn_simulation_tpu.ops import pallas_knn as pk

    print("backend:", jax.default_backend(), flush=True)
    box = 1.0
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.random((N, 3), np.float32))
    results = {}

    def scan_over(body, k_iters):
        @jax.jit
        def f(eps):
            def step(carry, _):
                return carry + 1.0, body((pos0 + eps * carry) % box)

            _, s = jax.lax.scan(step, 0.0, None, length=k_iters)
            return jnp.sum(s)

        return f

    def marginal(body, k_short=4, k_long=12):
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

    # (G, raw capacity, k) sweep. cap pads to 8s; num_cand to 128s.
    cases = [
        (19, 24, 16),   # round-2 spec (uncertified-durable, reference point)
        (19, 24, 8),    # selection-pass scaling at fixed tile
        (19, 31, 16),   # current production spec
        (19, 31, 8),
        (19, 31, 4),
        (21, 26, 16),   # finer grid, same padded cap (32): more cells
        (17, 40, 16),   # coarser grid: fewer, fatter cells
    ]
    for g, c, k in cases:
        grid = CellGrid(g, c)
        cap = pk._round_up(c, 8)
        num_cand = pk._round_up(27 * cap, 128)

        def body(p, grid=grid, k=k):
            nb = pk.pallas_cell_list_knn(p, k, box, grid)
            return jnp.sum(nb[:, 0]).astype(jnp.float32)

        ms = marginal(body) * 1e3
        key = f"G{g}_C{c}_k{k}"
        results[key] = round(ms, 3)
        print(f"{key}: cap_pad={cap} num_cand={num_cand} "
              f"tile_work={cap * num_cand} -> {ms:.2f} ms", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    out = "benchmarks/results/knn_kernel_r3.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
