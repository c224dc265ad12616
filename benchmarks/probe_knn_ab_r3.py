"""A/B the kNN kernel's selection variant x cells_per_block at the flagship
spec (G=19, C=31, k=16/8). Round 3: the lex-carry selection regressed 2.3x
vs in-place masked re-min; this isolates cpb and selection contributions.

Run from /root/repo (TPU): python benchmarks/probe_knn_ab_r3.py
Writes benchmarks/results/knn_ab_r3.json.
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
    grid = CellGrid(19, 31)
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

    for lex in (False, True):
        for cpb in (8, 16, 32):
            for k in (16, 8):
                def body(p, k=k, cpb=cpb, lex=lex):
                    nb = pk.pallas_cell_list_knn(
                        p, k, box, grid, cells_per_block=cpb, lex_carry=lex
                    )
                    return jnp.sum(nb[:, 0]).astype(jnp.float32)

                ms = marginal(body) * 1e3
                key = f"{'lex' if lex else 'masked'}_cpb{cpb}_k{k}"
                results[key] = round(ms, 3)
                print(f"{key}: {ms:.2f} ms", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    out = "benchmarks/results/knn_ab_r3.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
