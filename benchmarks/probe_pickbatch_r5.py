"""Round 5: batched-pick selection in the codes-only kNN kernel.

The in-place masked re-min selection pays one full-tile masked STORE of
d2 per pick (~1/3 of kernel time at k=16 — knn_kernel_r3.json). With
``pick_batch=B`` the kernel shares one store across B picks, masking the
intra-batch picks out of a read-only `avail` view instead (the roofline
table's "batched-pick" owner idea, docs/PERFORMANCE.md). This probe:

  * pins bit-parity: codes + kth identical for B in {1, 2, 4, 8} on the
    flagship fixture (real TPU);
  * measures the in-scan marginal of the codes-only search for each B.

Run from /root/repo on TPU: python benchmarks/probe_pickbatch_r5.py
Writes benchmarks/results/pickbatch_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

N, K = 65536, 16


def main():
    global N, K
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=N)
    ap.add_argument("--k", type=int, default=K)
    ap.add_argument("--skip_parity", action="store_true",
                    help="timing-only rerun (parity is pinned at the "
                         "default spec and by the interpret-mode test)")
    args = ap.parse_args()
    N, K = args.n, args.k

    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        pallas_cell_list_knn,
    )

    print("backend:", jax.default_backend(), flush=True)
    results = {}
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.random((N, 3), np.float32))
    grid = choose_cell_grid(N, K)
    results["grid"] = grid.grid_size

    # ---- Bit parity across batch sizes.
    outs = {}
    parity_bs = () if args.skip_parity else (1, 2, 4, 8)
    for b in parity_bs:
        o = jax.jit(lambda p, b=b: pallas_cell_list_knn(
            p, K, 1.0, grid, codes_only=True, pick_batch=b,
            return_diagnostics=True,
        ))(pos0)
        outs[b] = jax.tree.map(np.asarray, o)
    def leaves(o):
        return [x for x in jax.tree.leaves(o) if x is not None]

    for b in parity_bs[1:]:
        ref = outs[1]
        same = all(
            np.array_equal(a, c) for a, c in zip(leaves(ref), leaves(outs[b]))
        )
        results[f"parity_B{b}"] = bool(same)
        print(f"parity B={b}: {same}", flush=True)

    # ---- In-scan marginals.
    def scan_over(b, iters):
        @jax.jit
        def f(eps):
            def step(carry, _):
                p = jnp.remainder(pos0 + carry * eps, 1.0)
                out = pallas_cell_list_knn(
                    p, K, 1.0, grid, codes_only=True, pick_batch=b,
                )
                codes = out[1]
                return carry + 1.0, jnp.sum(codes[0].astype(jnp.float32))

            _, s = jax.lax.scan(step, 0.0, None, length=iters)
            return jnp.sum(s)

        return f

    def marg(b, k_s=6, k_l=22):
        f_s, f_l = scan_over(b, k_s), scan_over(b, k_l)

        def best_of(f):
            float(f(0.0).reshape(()))
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                float(f((rep + 1) * 1e-6).reshape(()))
                best = min(best, time.perf_counter() - t0)
            return best

        return (best_of(f_l) - best_of(f_s)) / (k_l - k_s) * 1e3

    for b in (1, 2, 4, 8):
        try:
            ms = marg(b)
            results[f"search_B{b}_ms"] = round(ms, 3)
            print(f"search B={b}: {ms:.3f} ms", flush=True)
        except Exception as e:
            results[f"search_B{b}_ms"] = f"FAILED: {e}"[:300]
            print(f"search B={b} FAILED: {e}", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    suffix = "" if (N, K) == (65536, 16) else f"_n{N}_k{K}"
    with open(f"benchmarks/results/pickbatch_r5{suffix}.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
