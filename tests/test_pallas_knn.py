"""Pallas fused cell-list kNN kernel — correctness in interpret mode (the
kernel's compiled path is exercised on real TPUs by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.ops.cell_list import (
    CellGrid,
    choose_cell_grid,
)
from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic
from cosmology_gnn_simulation_tpu.ops.pallas_knn import pallas_cell_list_knn


def rowmatch(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.mean(
        [set(x.tolist()) == set(y.tolist()) for x, y in zip(a, b)]
    )


def test_uniform_exact(rng):
    n, k = 2048, 16
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    grid = choose_cell_grid(n, k)
    idx, (overflow, max_d2, max_excess) = pallas_cell_list_knn(
        pos, k, 1.0, grid, return_diagnostics=True, interpret=True
    )
    assert int(overflow) == 0
    assert float(max_excess) <= 0.0
    # The per-query margin is never looser than 1.5 cell edges.
    assert float(max_d2) <= (1.5 / grid.grid_size) ** 2
    ref = knn_periodic(pos, k, 1.0, query_tile=256)
    assert rowmatch(idx, ref) == 1.0


def test_self_loop_present(rng):
    n, k = 512, 4
    pos = jnp.asarray(rng.uniform(0, 2.0, (n, 3)), jnp.float32)
    grid = choose_cell_grid(n, k)
    idx = np.asarray(
        pallas_cell_list_knn(pos, k, 2.0, grid, interpret=True)
    )
    for i in range(n):
        assert i in idx[i]


def test_cross_boundary(rng):
    pos = np.concatenate(
        [
            [[0.005, 0.5, 0.5], [0.995, 0.5, 0.5]],
            rng.uniform(0.3, 0.7, (300, 3)),
        ]
    ).astype(np.float32)
    grid = CellGrid(grid_size=5, cell_capacity=80)
    idx = np.asarray(
        pallas_cell_list_knn(jnp.asarray(pos), 2, 1.0, grid, interpret=True)
    )
    assert set(idx[0].tolist()) == {0, 1}
    assert set(idx[1].tolist()) == {0, 1}


def test_nonuniform_box_size(rng):
    n, k = 1024, 8
    box = 3.7
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    grid = choose_cell_grid(n, k)
    idx = pallas_cell_list_knn(pos, k, box, grid, interpret=True)
    ref = knn_periodic(pos, k, box, query_tile=256)
    assert rowmatch(idx, ref) == 1.0


def test_k_too_large_rejected():
    with pytest.raises(ValueError, match="exceeds"):
        pallas_cell_list_knn(
            jnp.zeros((10, 3)), 200, 1.0,
            CellGrid(grid_size=3, cell_capacity=8), interpret=True,
        )


def test_spill_absorbs_cell_overflow_exactly(rng):
    """Round-3 spill bucket: a cell holding more particles than the table
    capacity no longer degrades the neighbor sets — the overflowing
    particles ride the spill block as candidates for everyone, and their
    own rows are solved exactly on the XLA side. Round-2 semantics (clamp +
    failed certificate) would be inexact here."""
    n_bg, n_cram, k = 2048, 40, 8
    bg = rng.uniform(0, 1, (n_bg, 3))
    cram = 0.44 + 0.04 * rng.uniform(0, 1, (n_cram, 3))  # one dense cell
    pos = jnp.asarray(np.concatenate([bg, cram]), jnp.float32)
    grid = CellGrid(grid_size=8, cell_capacity=16)  # cram cell overflows 16
    from cosmology_gnn_simulation_tpu.ops.cell_list import cell_list_knn

    # The fixture genuinely over-fills a cell: the spill-less XLA cell list
    # reports table overflow on the same grid.
    _, (xla_overflow, _, _) = cell_list_knn(
        pos, k, 1.0, grid, return_diagnostics=True
    )
    assert int(xla_overflow) > 0

    idx, (overflow, _, max_excess) = pallas_cell_list_knn(
        pos, k, 1.0, grid, return_diagnostics=True, interpret=True
    )
    assert int(overflow) == 0  # the spill block absorbed the tail
    assert float(max_excess) <= 0.0  # certificate PASSES despite the cram
    ref = knn_periodic(pos, k, 1.0, query_tile=256)
    assert rowmatch(idx, ref) == 1.0


def test_spill_exhaustion_fails_loudly(rng):
    """Cramming more particles than table + spill capacity must surface in
    the overflow diagnostic (never silent)."""
    n, k = 2048, 8
    pos = jnp.asarray(
        np.remainder(0.5 + rng.normal(0, 0.004, (n, 3)), 1.0), jnp.float32
    )
    grid = CellGrid(grid_size=8, cell_capacity=16)
    _, (overflow, _, _) = pallas_cell_list_knn(
        pos, k, 1.0, grid, return_diagnostics=True, interpret=True
    )
    assert int(overflow) > 0


def test_codes_only_matches_with_codes(rng):
    """codes_only: single-payload (lane) selection must emit the same codes
    as the dual id+code carriage on tie-free data, with identical
    diagnostics, and the plan built from them must be identical."""
    n, k = 600, 6
    pos = jnp.asarray(rng.random((n, 3), np.float32))
    grid = choose_cell_grid(n, k)
    ids, codes, spill, (ovf, maxd, exc) = pallas_cell_list_knn(
        pos, k, 1.0, grid, return_diagnostics=True, with_codes=True,
        interpret=True,
    )
    ids2, codes2, spill2, (ovf2, maxd2, exc2) = pallas_cell_list_knn(
        pos, k, 1.0, grid, return_diagnostics=True, codes_only=True,
        interpret=True,
    )
    assert ids2 is None
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))
    if spill is not None:
        for x, y in zip(spill, spill2):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert float(maxd) == float(maxd2)
    assert float(exc) == float(exc2)
    assert int(ovf) == int(ovf2)


def test_spill_codes_plan_matches_aux_plan(rng):
    """Spill-block picks emit lane codes >= 27*cap; the cell-block plan
    resolves them through the kernel's (spill_cells, spill_ranks) tables.
    On a fixture that genuinely overflows a cell, the codes-built plans
    (fused forward AND two-sweep reverse) must be bit-identical to the
    aux-path plan built from the neighbor ids."""
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        CellBlockSpec,
        build_cellblock,
    )
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        codes_packing_cap,
    )

    k = 8
    bg = rng.uniform(0, 1, (2048, 3))
    cram = 0.44 + 0.04 * rng.uniform(0, 1, (40, 3))  # one dense cell
    pos = jnp.asarray(np.concatenate([bg, cram]), jnp.float32)
    n = pos.shape[0]
    grid = CellGrid(grid_size=8, cell_capacity=16)
    ids, codes, spill, (ovf, _, exc) = pallas_cell_list_knn(
        pos, k, 1.0, grid, return_diagnostics=True, with_codes=True,
        interpret=True,
    )
    cap = codes_packing_cap(n, k, grid)
    assert spill is not None
    assert int(ovf) == 0 and float(exc) <= 0.0
    # The fixture must actually exercise spill codes.
    assert (np.asarray(codes) >= 27 * cap).any()

    spec = CellBlockSpec(grid_size=8, col_capacity=96, query_block=32,
                         window=128, wrap_cap=16)
    a = build_cellblock(pos, ids, 1.0, spec, with_reverse=True)
    b = build_cellblock(pos, None, 1.0, spec, neighbor_codes=codes,
                        codes_cap=cap, codes_spill=spill)
    c = build_cellblock(pos, ids, 1.0, spec, with_reverse=True,
                        neighbor_codes=codes, codes_cap=cap,
                        codes_spill=spill)
    np.testing.assert_array_equal(np.asarray(a.s_table), np.asarray(b.s_table))
    np.testing.assert_array_equal(np.asarray(a.s_table), np.asarray(c.s_table))
    np.testing.assert_array_equal(
        np.asarray(a.s_rev_table), np.asarray(c.s_rev_table)
    )
    for f in ("overflow", "dropped_edges", "window_overflow"):
        assert int(getattr(a, f)) == int(getattr(b, f)) == int(
            getattr(c, f)
        ) == 0, f
    assert int(c.reverse_mismatch) == 0


def test_codes_only_plan_matches_ids_plan(rng):
    """build_cellblock(neighbors=None, codes) == build_cellblock(ids, codes)."""
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        build_cellblock,
        choose_cellblock_spec,
    )
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        codes_packing_cap,
    )

    n, k = 600, 6
    pos = jnp.asarray(rng.random((n, 3), np.float32))
    grid = choose_cell_grid(n, k)
    spec = choose_cellblock_spec(n, k)
    assert spec.grid_size == grid.grid_size
    ids, codes, spill = pallas_cell_list_knn(
        pos, k, 1.0, grid, with_codes=True, interpret=True
    )
    cap = codes_packing_cap(n, k, grid)
    a = build_cellblock(pos, ids, 1.0, spec, neighbor_codes=codes,
                        codes_cap=cap, codes_spill=spill)
    b = build_cellblock(pos, None, 1.0, spec, neighbor_codes=codes,
                        codes_cap=cap, codes_spill=spill)
    np.testing.assert_array_equal(np.asarray(a.s_table), np.asarray(b.s_table))
    np.testing.assert_array_equal(
        np.asarray(a.window_starts), np.asarray(b.window_starts)
    )
    assert int(a.dropped_edges) == int(b.dropped_edges) == 0


def test_row_groups_matches_ungrouped(rng):
    """Occupancy-gated row groups (round 4): identical ids, codes, and
    certificate on every REAL query row vs the ungrouped kernel — spill
    engaged via a crammed cell so partially-empty and fully-empty groups
    both occur."""
    n, k = 3000, 8
    pos = np.asarray(rng.uniform(0, 1, (n, 3)), np.float32)
    g = choose_cell_grid(n, k).grid_size
    pos[:40] = 0.5 / g + rng.uniform(0, 0.2 / g, size=(40, 3))
    pos = jnp.asarray(pos)
    grid = CellGrid(grid_size=g, cell_capacity=max(
        8, int(np.ceil(n / g**3 * 2.0))))
    outs = {}
    for rg in (False, True):
        idx, codes, spill, (overflow, max_d2, max_excess) = (
            pallas_cell_list_knn(
                pos, k, 1.0, grid, return_diagnostics=True,
                with_codes=True, interpret=True, row_groups=rg,
            )
        )
        outs[rg] = (idx, codes, overflow, max_d2, max_excess)
    np.testing.assert_array_equal(np.asarray(outs[False][0]),
                                  np.asarray(outs[True][0]))
    np.testing.assert_array_equal(np.asarray(outs[False][1]),
                                  np.asarray(outs[True][1]))
    for i in (2, 3, 4):
        assert float(outs[False][i]) == float(outs[True][i])
    # codes_only path too (the production rollout payload).
    a = pallas_cell_list_knn(pos, k, 1.0, grid, with_codes=True,
                             codes_only=True, interpret=True,
                             row_groups=False)
    b = pallas_cell_list_knn(pos, k, 1.0, grid, with_codes=True,
                             codes_only=True, interpret=True,
                             row_groups=True)
    # Per-particle codes (gathered to particle order) must match exactly.
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_pick_batch_matches_single(rng):
    """Batched-pick selection (round 5): bit-identical codes and
    certificate vs the single-pick loop for every batch size, including a
    crammed cell that engages the spill block and exhausted rows."""
    n, k = 3000, 8
    pos = np.asarray(rng.uniform(0, 1, (n, 3)), np.float32)
    g = choose_cell_grid(n, k).grid_size
    pos[:40] = 0.5 / g + rng.uniform(0, 0.2 / g, size=(40, 3))
    pos = jnp.asarray(pos)
    grid = CellGrid(grid_size=g, cell_capacity=max(
        8, int(np.ceil(n / g**3 * 2.0))))
    outs = {}
    for b in (1, 2, 3, 4, 8):
        outs[b] = jax.tree.map(
            np.asarray,
            pallas_cell_list_knn(
                pos, k, 1.0, grid, codes_only=True, interpret=True,
                pick_batch=b, return_diagnostics=True,
            ),
        )
    ref = jax.tree.leaves(outs[1])
    for b in (2, 3, 4, 8):
        for a, c in zip(ref, jax.tree.leaves(outs[b])):
            np.testing.assert_array_equal(a, c)
