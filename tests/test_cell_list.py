"""Cell-list k-NN vs brute-force oracle — uniform and clustered fixtures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.ops.cell_list import (
    CellGrid,
    cell_list_knn,
    choose_cell_grid,
)
from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic


def assert_same_neighbor_sets(a, b):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape
    for i in range(a.shape[0]):
        assert set(a[i].tolist()) == set(b[i].tolist()), f"row {i}"


def test_uniform_matches_bruteforce():
    rng = np.random.default_rng(0)
    n, k = 4096, 16
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    grid = choose_cell_grid(n, k)
    idx, (overflow, max_d2, max_excess) = cell_list_knn(
        pos, k, 1.0, grid, return_diagnostics=True
    )
    assert int(overflow) == 0
    assert float(max_excess) <= 0.0  # provably exact (per-query margin)
    ref = knn_periodic(pos, k, 1.0, query_tile=512)
    assert_same_neighbor_sets(idx, ref)


def test_clustered_matches_bruteforce():
    """Strongly clustered distribution (cosmology-like): correctness holds
    as long as capacity absorbs the densest cells."""
    rng = np.random.default_rng(1)
    n, k = 3000, 8
    centers = rng.uniform(0, 1, (6, 3))
    which = rng.integers(0, 6, n)
    pos = np.remainder(
        centers[which] + rng.normal(0, 0.03, (n, 3)), 1.0
    ).astype(np.float32)
    grid = choose_cell_grid(n, k, capacity_multiplier=90.0)
    idx, (overflow, max_d2, max_excess) = cell_list_knn(
        jnp.asarray(pos), k, 1.0, grid, return_diagnostics=True
    )
    assert int(overflow) == 0
    ref = knn_periodic(jnp.asarray(pos), k, 1.0, query_tile=512)
    if float(max_excess) <= 0.0:
        assert_same_neighbor_sets(idx, ref)
    else:
        # Sparse-region queries may exceed the cell radius; at minimum the
        # dense-region rows must agree and self-loops must be present.
        d2 = None
        matches = sum(
            set(np.asarray(idx)[i].tolist()) == set(np.asarray(ref)[i].tolist())
            for i in range(n)
        )
        assert matches > 0.95 * n


def test_cross_boundary_neighbors_found():
    pos = np.array(
        [[0.01, 0.5, 0.5], [0.99, 0.5, 0.5]]
        + [[0.3 + 0.05 * i, 0.2, 0.7] for i in range(8)],
        dtype=np.float32,
    )
    grid = CellGrid(grid_size=4, cell_capacity=8)
    idx = cell_list_knn(jnp.asarray(pos), 2, 1.0, grid)
    idx = np.asarray(idx)
    assert idx[0, 0] == 0 and idx[0, 1] == 1  # through the wall
    assert idx[1, 0] == 1 and idx[1, 1] == 0


def test_overflow_detection():
    # 64 coincident particles in one cell with capacity 4 -> overflow.
    pos = jnp.asarray(np.full((64, 3), 0.5, dtype=np.float32))
    grid = CellGrid(grid_size=4, cell_capacity=4)
    idx, (overflow, _, _) = cell_list_knn(pos, 2, 1.0, grid, return_diagnostics=True)
    assert int(overflow) == 60


def test_query_tiling_consistent():
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, 1, (1000, 3)), jnp.float32)
    grid = choose_cell_grid(1000, 8)
    full = cell_list_knn(pos, 8, 1.0, grid, query_tile=2048)
    tiled = cell_list_knn(pos, 8, 1.0, grid, query_tile=128)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(tiled))


def test_separate_queries():
    rng = np.random.default_rng(4)
    pos = jnp.asarray(rng.uniform(0, 1, (2048, 3)), jnp.float32)
    q = pos[:100]
    grid = choose_cell_grid(2048, 8)
    idx = cell_list_knn(pos, 8, 1.0, grid, queries=q)
    ref = knn_periodic(pos, 8, 1.0, queries=q, query_tile=128)
    assert_same_neighbor_sets(idx, ref)


def test_grid_too_small_rejected():
    with pytest.raises(ValueError, match="grid_size"):
        cell_list_knn(
            jnp.zeros((10, 3)), 2, 1.0, CellGrid(grid_size=2, cell_capacity=4)
        )


def test_window_margin_values():
    """Margin is (1.5*edge)^2 at cell centers, edge^2 at cell corners."""
    from cosmology_gnn_simulation_tpu.ops.cell_list import window_margin_sq

    grid = CellGrid(grid_size=5, cell_capacity=8)
    e = 1.0 / 5
    center = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)  # mid-cell
    corner = jnp.asarray([[0.4, 0.4, 0.4]], jnp.float32)  # cell boundary
    np.testing.assert_allclose(
        float(window_margin_sq(center, 1.0, grid)[0]), (1.5 * e) ** 2,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(window_margin_sq(corner, 1.0, grid)[0]), e**2, rtol=1e-6
    )


def test_margin_certificate_sound_across_fine_grids():
    """Across deliberately-too-fine grids: whenever the per-query margin
    certificate passes, the neighbor sets must equal brute force."""
    rng = np.random.default_rng(7)
    n, k = 4096, 16
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    ref = np.sort(np.asarray(knn_periodic(pos, k, 1.0, query_tile=512)), axis=1)
    base_g = choose_cell_grid(n, k).grid_size
    for g in range(base_g, base_g + 4):
        grid = CellGrid(grid_size=g, cell_capacity=max(k, int(2.5 * n / g**3)))
        idx, (overflow, _, max_excess) = cell_list_knn(
            pos, k, 1.0, grid, return_diagnostics=True
        )
        if int(overflow) == 0 and float(max_excess) <= 0.0:
            np.testing.assert_array_equal(
                np.sort(np.asarray(idx), axis=1), ref,
                err_msg=f"G={g}: certified but sets differ",
            )


def test_margin_certificate_tighter_than_edge_bound():
    """The round-3 flagship regression, distilled: a mid-cell query whose
    k-th neighbor lies between 1 and 1.5 cell edges away. The old global
    ``d_k <= edge`` bound refuses it; the per-query window margin certifies
    it, and the sets are provably exact (brute-force comparison)."""
    rng = np.random.default_rng(11)
    g, e, k = 5, 0.2, 4
    q = np.array([0.5, 0.5, 0.5])
    # Three neighbors at distance 1.25*e from the mid-cell query (margin
    # there is 1.5*e), each with a tight buddy cluster so its OWN k-th
    # neighbor stays local.
    dirs = np.array([[1.0, 0, 0], [0, 1.0, 0], [-0.6, -0.6, 0.52915]])
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ring = q + 1.25 * e * dirs
    buddies = (ring[:, None, :] + rng.normal(0, 3e-3, (3, 3, 3))).reshape(-1, 3)
    # Jittered background lattice, with a hole of radius 1.5*e around q so
    # the ring points really are q's nearest neighbors.
    axis = np.arange(10) / 10 + 0.05
    lattice = np.stack(np.meshgrid(axis, axis, axis), axis=-1).reshape(-1, 3)
    lattice = lattice + rng.uniform(-0.02, 0.02, lattice.shape)
    lattice = lattice[np.linalg.norm(lattice - q, axis=1) > 1.5 * e]
    pos = jnp.asarray(
        np.remainder(np.concatenate([[q], ring, buddies, lattice]), 1.0),
        jnp.float32,
    )
    grid = CellGrid(grid_size=g, cell_capacity=32)
    idx, (overflow, max_d2, max_excess) = cell_list_knn(
        pos, k, 1.0, grid, return_diagnostics=True
    )
    assert int(overflow) == 0
    assert float(max_d2) > e**2  # the old global bound refuses this frame
    assert float(max_excess) <= 0.0  # the per-query margin certifies it
    ref = knn_periodic(pos, k, 1.0, query_tile=512)
    assert_same_neighbor_sets(idx, ref)
