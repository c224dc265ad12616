"""Diagnose the flagship exactness-flag trip at 40 rollout steps (round 3).

Runs the default gather rollout with the in-scan guard, finds the first
failing step, re-extracts that frame's positions, and evaluates the
certificate components (overflow, max k-th distance vs cell edge) plus a
brute-force neighbor-set comparison to tell a conservative certificate from
a real neighbor error. Run from /root/repo on TPU.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, K, WINDOW, STEPS = 65536, 16, 5, 40


def main():
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats
    from cosmology_gnn_simulation_tpu.featurize import (
        neighbor_search_certified,
    )
    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic

    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, N, 3))
    drift = rng.normal(0, 5e-4, (WINDOW, N, 3)).cumsum(axis=0)
    positions = jnp.asarray(np.remainder(base + drift, 1.0), jnp.float32)
    temperatures = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (WINDOW, N, 1))), jnp.float32
    )
    model_config = default_model_config()
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)

    out = rollout(
        params, model_config, positions, temperatures, stats, STEPS,
        num_neighbors=K, dtype=jnp.bfloat16,
    )
    exact = np.asarray(out["neighbor_exactness"])
    print("exactness per step:", exact.astype(int).tolist(), flush=True)
    if exact.all():
        print("no failure at", STEPS, "steps (flaky?)")
        return
    first_bad = int(np.argmin(exact))
    print("first failing step:", first_bad, flush=True)

    coords = out["Coordinates"]  # [W+steps, N, 3]
    # Frame used for step t's search: window ends at index W-1+t.
    frame = coords[WINDOW - 1 + first_bad]
    frame = jnp.remainder(frame, 1.0)

    spec = choose_cell_grid(N, K)
    print("grid:", spec, flush=True)

    nbr, exact_flag = neighbor_search_certified(
        frame, K, stats.box_size, method="auto", query_tile=512,
    )
    print("offline certificate on failing frame:", bool(exact_flag), flush=True)

    # Components: occupancy overflow + max k-th distance.
    g = spec.grid_size
    cell = (jnp.floor(frame * g).astype(jnp.int32)) % g
    code = (cell[:, 0] * g + cell[:, 1]) * g + cell[:, 2]
    occ = jnp.zeros((g * g * g,), jnp.int32).at[code].add(1)
    max_occ = int(jnp.max(occ))
    print(f"max cell occupancy: {max_occ} (cap {spec.cell_capacity})",
          flush=True)

    # Position stats: has the untrained model collapsed/clustered the box?
    disp = np.asarray(coords[WINDOW - 1 + first_bad] - coords[WINDOW - 1])
    print("max |disp| since seed:", float(np.abs(disp).max()), flush=True)
    print("coord min/max:", float(coords[WINDOW - 1 + first_bad].min()),
          float(coords[WINDOW - 1 + first_bad].max()), flush=True)

    # Max k-th neighbor distance vs cell edge.
    from cosmology_gnn_simulation_tpu.ops.periodic import (
        min_image_displacement,
    )
    d = min_image_displacement(
        frame[nbr] - frame[:, None, :], stats.box_size
    )
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
    kth = jnp.max(dist, axis=1)
    print(f"max k-th distance: {float(jnp.max(kth)):.5f} vs cell edge "
          f"{1.0 / g:.5f}", flush=True)

    # Per-query margin-certificate decomposition: how many queries exceed
    # their window margin, and by how much?
    from cosmology_gnn_simulation_tpu.ops.cell_list import window_margin_sq
    margin_sq = window_margin_sq(frame, stats.box_size, spec)
    excess = np.asarray(kth * kth - margin_sq)
    n_over = int((excess > 0).sum())
    print(f"queries exceeding their window margin: {n_over} "
          f"(max excess {float(excess.max()):.3e}, "
          f"kth/edge at argmax "
          f"{float(kth[int(np.argmax(excess))]) * g:.4f}, "
          f"margin/edge at argmax "
          f"{float(np.sqrt(np.asarray(margin_sq))[int(np.argmax(excess))]) * g:.4f})",
          flush=True)
    # Distribution of kth/edge across all queries.
    ke = np.asarray(kth) * g
    print("kth/edge percentiles 50/99/99.9/100:",
          [round(float(np.percentile(ke, p)), 4)
           for p in (50, 99, 99.9, 100)], flush=True)

    # Real neighbor-set error? Compare against brute force.
    brute = knn_periodic(frame, K, stats.box_size, query_tile=512)
    a = np.sort(np.asarray(nbr), axis=1)
    b = np.sort(np.asarray(brute), axis=1)
    bad_rows = int((a != b).any(axis=1).sum())
    print("rows whose neighbor set differs from brute force:", bad_rows,
          flush=True)

    # What grid WOULD certify every step? Offline sweep on the failing
    # frame: coarser grids until the margin certificate passes.
    from cosmology_gnn_simulation_tpu.ops.cell_list import (
        CellGrid, cell_list_knn,
    )
    for gg in range(g, max(g - 5, 2), -1):
        cap = max(K, int(np.ceil(2.5 * N / gg**3)))
        _, (ovf, maxd2, exc) = cell_list_knn(
            frame, K, stats.box_size, CellGrid(gg, cap),
            return_diagnostics=True,
        )
        print(f"  G={gg} cap={cap}: overflow={int(ovf)} "
              f"max_excess={float(exc):.3e} "
              f"certified={int(ovf) == 0 and float(exc) <= 0}", flush=True)


if __name__ == "__main__":
    main()
