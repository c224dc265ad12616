"""Decompose the flagship pallas kNN (N=65,536, k=16, G=19, C=24) on the
real chip: binning argsort vs scatters vs 27-roll expansion vs the select
kernel — to size the next optimization.

Marginal-scan method (CLAUDE.md): scan the component K_long vs K_short
times inside one jit with perturbed inputs and a scalar checksum, then
difference the wall times so the ~30 ms RPC floor and compile constants
cancel.

Run from /root/repo (TPU): python benchmarks/probe_knn_decomp_r3.py
Writes benchmarks/results/knn_decomp_r3.json.
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
REPS = 3


def marginal(make_fn, k_short=4, k_long=12):
    f_s, f_l = make_fn(k_short), make_fn(k_long)

    def best_of(f):
        float(f(0.0).reshape(()))
        best = float("inf")
        for rep in range(REPS):
            t0 = time.perf_counter()
            float(f((rep + 1) * 1e-6).reshape(()))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(f_l) - best_of(f_s)) / (k_long - k_short)


def main():
    from cosmology_gnn_simulation_tpu.ops.binning import bin_by_key
    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.ops import pallas_knn as pk

    print("backend:", jax.default_backend(), flush=True)
    box = 1.0
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.random((N, 3), np.float32))
    grid = choose_cell_grid(N, K)
    g = grid.grid_size
    cap = pk._round_up(grid.cell_capacity, 8)
    print(f"grid G={g} cap={cap}", flush=True)
    results = {"grid": f"G={g} cap={cap}"}

    def scan_over(body, k_iters):
        @jax.jit
        def f(eps):
            def step(carry, _):
                return carry + 1.0, body((pos0 + eps * carry) % box)

            _, s = jax.lax.scan(step, 0.0, None, length=k_iters)
            return jnp.sum(s)

        return f

    # 1. argsort of cell ids alone
    def body_argsort(p):
        inv_cell = g / box
        coords = jnp.clip(jnp.floor(p * inv_cell).astype(jnp.int32), 0, g - 1)
        cid = (coords[:, 0] * g + coords[:, 1]) * g + coords[:, 2]
        return jnp.sum(jnp.argsort(cid)[:1])

    # 2. full bin_by_key (argsort + searchsorted + rank)
    def body_bin(p):
        inv_cell = g / box
        coords = jnp.clip(jnp.floor(p * inv_cell).astype(jnp.int32), 0, g - 1)
        cid = (coords[:, 0] * g + coords[:, 1]) * g + coords[:, 2]
        b = bin_by_key(cid, g**3, cap)
        return jnp.sum(b.slot[:1]) * 1.0

    # 3. full table build (binning + 4 scatters + rank bookkeeping)
    def body_table(p):
        px, py, pz, ids, cid, rank, ov = pk._build_table(p, g, cap, box)
        return px[0, 0] + ids[0, 0] + rank[0]

    # 4. table + 27-roll expansion (everything XLA-side)
    def body_expand(p):
        px, py, pz, ids, cid, rank, ov = pk._build_table(p, g, cap, box)
        num_cand = pk._round_up(27 * cap, pk._LANE)

        def gather_cands(plane, fill, shift_dim=None):
            p3 = plane.reshape(g, g, g, cap)
            shifted = []
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        r = jnp.roll(p3, (-dx, -dy, -dz), axis=(0, 1, 2))
                        if shift_dim is not None:
                            d = (dx, dy, dz)[shift_dim]
                            if d != 0:
                                idx = [slice(None)] * 3
                                idx[shift_dim] = g - 1 if d == 1 else 0
                                r = r.at[tuple(idx)].add(d * box)
                        shifted.append(r)
            rows = jnp.concatenate(shifted, axis=-1).reshape(g**3, 27 * cap)
            pad = num_cand - 27 * cap
            if pad:
                rows = jnp.pad(rows, ((0, 0), (0, pad)), constant_values=fill)
            return rows

        cx = gather_cands(px, 0.0, 0)
        cy = gather_cands(py, 0.0, 1)
        cz = gather_cands(pz, 0.0, 2)
        cids = gather_cands(ids, N)
        return cx[0, 0] + cy[0, 0] + cz[0, 0] + cids[0, 0]

    # 5. the whole kNN (table + expansion + kernel)
    def body_full(p):
        nb = pk.pallas_cell_list_knn(p, K, box, grid)
        return jnp.sum(nb[:, 0]).astype(jnp.float32)

    for name, body in (
        ("argsort", body_argsort),
        ("bin_by_key", body_bin),
        ("table", body_table),
        ("table_expand", body_expand),
        ("full_knn", body_full),
    ):
        ms = marginal(lambda k_iters, b=body: scan_over(b, k_iters)) * 1e3
        results[name + "_ms"] = round(ms, 3)
        print(f"{name}: {ms:.2f} ms", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    out = "benchmarks/results/knn_decomp_r3.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
