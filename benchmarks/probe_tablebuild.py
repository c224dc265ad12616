"""Head-to-head probe: kNN cell-table build strategies on the real chip.

Round-3 found the 'obvious' scatter-free builds can LOSE to the original
.at[slot].set scatters (flagship regressed 46.4 -> 53 ms/step). This probe
times the three strategies at flagship and config-4 scale so the choice is
measured, not assumed:

  A. scatter:     4x .at[slot].set + .at[order].set rank inverse (round 2)
  B. arithmetic:  gstart[cell]+rank slot map + gathers, sort_key_val rank
  C. hybrid:      arithmetic slot map + scatter rank inverse

Run from /root/repo on TPU: python benchmarks/probe_tablebuild.py
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

from cosmology_gnn_simulation_tpu.ops.binning import bin_by_key
from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid

REPS = 3


def variants(g, cap, n):
    def common(positions):
        inv_cell = g / 1.0
        coords = jnp.clip(
            jnp.floor(positions * inv_cell).astype(jnp.int32), 0, g - 1
        )
        cell_id = (coords[:, 0] * g + coords[:, 1]) * g + coords[:, 2]
        b = bin_by_key(cell_id, g**3, cap)
        return cell_id, b, positions[b.order]

    def scatter(positions):
        cell_id, b, sorted_pos = common(positions)

        def tab(sorted_vals, fill, dtype):
            base = jnp.full((g**3 * cap,), fill, dtype)
            return base.at[b.slot].set(
                sorted_vals.astype(dtype), mode="drop", unique_indices=True
            )

        px = tab(sorted_pos[:, 0], 0.0, jnp.float32)
        py = tab(sorted_pos[:, 1], 0.0, jnp.float32)
        pz = tab(sorted_pos[:, 2], 0.0, jnp.float32)
        ids = tab(b.order, n, jnp.int32)
        rank = jnp.zeros((n,), jnp.int32).at[b.order].set(b.rank)
        return px, py, pz, ids, rank

    def arithmetic(positions):
        cell_id, b, sorted_pos = common(positions)
        sorted_cell = jnp.take(cell_id, b.order)
        gstart = jnp.searchsorted(
            sorted_cell, jnp.arange(g**3 + 1, dtype=jnp.int32),
            side="left", method="sort",
        ).astype(jnp.int32)
        counts = gstart[1:] - gstart[:-1]
        sc = jnp.arange(g**3 * cap, dtype=jnp.int32) // cap
        sr = jnp.arange(g**3 * cap, dtype=jnp.int32) % cap
        pos_slot = jnp.where(
            sr < jnp.take(counts, sc), jnp.take(gstart[:-1], sc) + sr, n
        )

        def tab(sorted_vals, fill, dtype):
            ext = jnp.concatenate(
                [sorted_vals.astype(dtype), jnp.asarray([fill], dtype)]
            )
            return jnp.take(ext, pos_slot, mode="clip")

        px = tab(sorted_pos[:, 0], 0.0, jnp.float32)
        py = tab(sorted_pos[:, 1], 0.0, jnp.float32)
        pz = tab(sorted_pos[:, 2], 0.0, jnp.float32)
        ids = tab(b.order, n, jnp.int32)
        _, rank = jax.lax.sort_key_val(
            b.order.astype(jnp.int32), b.rank.astype(jnp.int32)
        )
        return px, py, pz, ids, rank

    def hybrid(positions):
        px, py, pz, ids, _ = arithmetic(positions)
        _, b, _ = common(positions)
        rank = jnp.zeros((n,), jnp.int32).at[b.order].set(b.rank)
        return px, py, pz, ids, rank

    return {"scatter": scatter, "arithmetic": arithmetic, "hybrid": hybrid}


def main():
    results = {}
    for n, k in ((65536, 16), (500_000, 32)):
        grid = choose_cell_grid(n, k)
        g = grid.grid_size
        cap = ((grid.cell_capacity + 7) // 8) * 8
        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        for name, fn in variants(g, cap, n).items():
            @jax.jit
            def run(p, eps, fn=fn):
                px, py, pz, ids, rank = fn(jnp.remainder(p + eps, 1.0))
                return (
                    jnp.sum(px[::97]) + jnp.sum(ids[::97]) + jnp.sum(rank[::97])
                ).astype(jnp.float32)

            float(run(pos, 0.0))
            best = float("inf")
            for rep in range(REPS):
                t0 = time.perf_counter()
                float(run(pos, (rep + 1) * 1e-6))
                best = min(best, time.perf_counter() - t0)
            results[f"{name}_n{n}_ms"] = round(best * 1e3, 1)
            print(f"{name} n={n} (G={g} C={cap}): {best*1e3:.1f} ms",
                  flush=True)
    with open("benchmarks/results/tablebuild_probe.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote benchmarks/results/tablebuild_probe.json", flush=True)


if __name__ == "__main__":
    main()
