"""REAL-TPU verification + timing of the shifted-planes kNN kernel.

The round-3 shifted-planes optimization pre-adjusts wrapped candidate
coordinates by +-box during the 27-roll expansion so the kernel computes
plain differences instead of per-element min-image. Exactness argument
(ops/pallas_knn.py): pairs whose true min-image distance is strictly below
one cell edge get an exact representative under their roll offset for any
g >= 3; all other pairs can only be OVER-estimated, which cannot steal a
certified selection slot and only inflates the exactness certificate.

This script checks the claim empirically on the real chip (Mosaic's memory
passes only run in the remote backend compile — CLAUDE.md): neighbor SETS
vs the brute-force oracle at N=65,536 uniform and on a clustered fixture,
then the marginal in-scan kNN cost. Run from /root/repo (TPU):
python benchmarks/verify_knn_shifted_tpu.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, K = 65536, 16
REPS = 3


def neighbor_sets_equal(a, b):
    """Rows compared as sets (tie order may differ between backends)."""
    return bool(np.all(np.sort(np.asarray(a), 1) == np.sort(np.asarray(b), 1)))


def main():
    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import pallas_cell_list_knn

    print("backend:", jax.default_backend(), flush=True)
    box = 1.0

    rng = np.random.default_rng(0)
    uniform = rng.random((N, 3), np.float32).astype(np.float32)
    # Clustered: 256 Gaussian blobs (sigma = 2% box) + 10% uniform background,
    # wrapped periodically — the adversarial case for bucketed backends.
    centers = rng.random((256, 3))
    blob = centers[rng.integers(0, 256, int(N * 0.9))] + rng.normal(
        0, 0.02, (int(N * 0.9), 3)
    )
    clustered = np.concatenate(
        [blob, rng.random((N - blob.shape[0], 3))]
    ).astype(np.float32) % box

    for name, pos, capmul in (
        ("uniform", uniform, 2.5),
        ("clustered", clustered, 12.0),
    ):
        p = jnp.asarray(pos)
        grid = choose_cell_grid(N, K, capacity_multiplier=capmul)
        got, (overflow, max_d2, max_excess) = pallas_cell_list_knn(
            p, K, box, grid, return_diagnostics=True
        )
        want = knn_periodic(p, K, box)
        ok = neighbor_sets_equal(got, want)
        cell = box / grid.grid_size
        certified = int(overflow) == 0 and float(max_excess) <= 0.0
        print(
            f"{name}: grid G={grid.grid_size} C={grid.cell_capacity} "
            f"sets_equal={ok} overflow={int(overflow)} "
            f"max_kth_d={float(max_d2) ** 0.5:.4f} cell={cell:.4f} "
            f"excess={float(max_excess):.2e} "
            f"certified={certified}",
            flush=True,
        )
        if certified:
            assert ok, f"{name}: certified but sets differ from brute force"
        else:
            print(f"{name}: uncertified (expected for this fixture) — "
                  f"certificate correctly refused", flush=True)

    # Marginal in-scan kNN cost (perturbed positions, scalar checksum).
    grid = choose_cell_grid(N, K)

    def make(k_iters):
        @jax.jit
        def f(eps):
            def body(carry, _):
                p = (uniform + eps * carry) % box
                nb = pallas_cell_list_knn(p, K, box, grid)
                return carry + 1.0, jnp.sum(nb[:, 0])

            _, s = jax.lax.scan(body, 0.0, None, length=k_iters)
            return jnp.sum(s)

        return f

    f4, f12 = make(4), make(12)
    float(f4(1e-6))
    float(f12(1e-6))
    best = float("inf")
    for rep in range(REPS):
        t0 = time.perf_counter()
        float(f12((rep + 1) * 1e-6))
        t12 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f4((rep + 1) * 1e-6))
        t4 = time.perf_counter() - t0
        best = min(best, (t12 - t4) / 8)
    print(f"in-scan kNN marginal: {best * 1e3:.2f} ms", flush=True)
    print("KNN_SHIFTED_TPU_OK", flush=True)


if __name__ == "__main__":
    main()


