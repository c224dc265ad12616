"""Cell-block (selection-matrix) aggregation vs. the gather+sum oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.ops.cellblock import (
    CellBlockSpec,
    build_cellblock,
    cellblock_aggregate,
    choose_cellblock_spec,
    reference_cellblock_aggregate,
    sort_neighbors,
)
from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic

SPEC = CellBlockSpec(grid_size=4, capacity=32, z_block=2, h_block=128)


def _fixture(n=200, k=4, h=16, seed=0, box=1.0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, box, size=(n, 3)), jnp.float32)
    nbr = knn_periodic(pos, k, box)
    z = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    return pos, nbr, z


def test_spec_validation():
    with pytest.raises(ValueError):
        CellBlockSpec(5, 32, 2).validate()  # G not multiple of BLK
    with pytest.raises(ValueError):
        CellBlockSpec(4, 24, 2).validate()  # (BLK+2)*C not lane-aligned
    with pytest.raises(ValueError):
        CellBlockSpec(4, 32, 4).validate()  # window exceeds grid
    SPEC.validate()


def test_choose_spec_occupancy():
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        _poisson_overflow_cells,
    )

    spec = choose_cellblock_spec(500_000)
    spec.validate()
    m = 500_000 / spec.grid_size**3
    assert (
        _poisson_overflow_cells(m, spec.capacity, spec.grid_size**3) <= 0.05
    )
    # Coarsest valid grid: one step coarser must violate the tail bound.
    g_prev = spec.grid_size - spec.z_block
    if g_prev >= spec.z_block + 2:
        m_prev = 500_000 / g_prev**3
        assert (
            _poisson_overflow_cells(m_prev, spec.capacity, g_prev**3) > 0.05
        )


def test_matches_gather_sum_oracle():
    pos, nbr, z = _fixture()
    plan = build_cellblock(pos, nbr, 1.0, SPEC)
    assert int(plan.overflow) == 0
    assert int(plan.dropped_edges) == 0

    nbr_sorted = sort_neighbors(nbr, plan.order)
    z_sorted = z[plan.order]
    got = cellblock_aggregate(z_sorted, plan, SPEC, interpret=True)
    # The kernel carries z in bf16; compare against the oracle on the same
    # rounded values (f32 accumulation order may differ by ULPs).
    z_bf = z_sorted.astype(jnp.bfloat16).astype(jnp.float32)
    want = reference_cellblock_aggregate(z_bf, nbr_sorted)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6,
                               atol=2e-6)


def test_matches_oracle_in_original_order():
    pos, nbr, z = _fixture(seed=3, h=128)
    plan = build_cellblock(pos, nbr, 1.0, SPEC)
    got_sorted = cellblock_aggregate(
        z[plan.order], plan, SPEC, interpret=True
    )
    inv = np.zeros(len(pos), np.int32)
    inv[np.asarray(plan.order)] = np.arange(len(pos))
    got = np.asarray(got_sorted)[inv]
    z_bf = z.astype(jnp.bfloat16).astype(jnp.float32)
    want = np.asarray(jnp.take(z_bf, nbr, axis=0).sum(axis=1))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_duplicate_neighbors_counted():
    # Multiplicity must be preserved (clamped sentinel rows duplicate picks).
    pos, nbr, z = _fixture(n=64, k=3, h=8, seed=1)
    nbr = nbr.at[:, 2].set(nbr[:, 1])  # duplicate an edge everywhere
    plan = build_cellblock(pos, nbr, 1.0, SPEC)
    assert int(plan.dropped_edges) == 0
    nbr_sorted = sort_neighbors(nbr, plan.order)
    got = cellblock_aggregate(z[plan.order], plan, SPEC, interpret=True)
    z_bf = z[plan.order].astype(jnp.bfloat16).astype(jnp.float32)
    want = reference_cellblock_aggregate(z_bf, nbr_sorted)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6,
                               atol=2e-6)


def test_s_table_counts():
    pos, nbr, _ = _fixture(n=50, k=3, h=8, seed=2)
    plan = build_cellblock(pos, nbr, 1.0, SPEC)
    s = np.asarray(plan.s_table)
    # Every real particle's row sums to k; empty slots to 0.
    row_sums = s.sum(axis=1)
    slots = np.asarray(plan.slot_of_sorted)
    expect = np.zeros(SPEC.num_slots, np.int64)
    expect[slots] = nbr.shape[1]
    np.testing.assert_array_equal(row_sums, expect)


def test_overflow_flagged():
    rng = np.random.default_rng(0)
    # 80 particles crammed into one cell (capacity 32).
    pos = jnp.asarray(
        0.05 + 0.01 * rng.uniform(size=(80, 3)), jnp.float32
    )
    nbr = knn_periodic(pos, 4, 1.0)
    plan = build_cellblock(pos, nbr, 1.0, SPEC)
    assert int(plan.overflow) > 0


def test_out_of_window_edges_flagged():
    pos, nbr, _ = _fixture(n=100, k=3)
    # Wire one neighbor to a particle 2+ cells away.
    pos = pos.at[0].set(jnp.array([0.05, 0.05, 0.05]))
    pos = pos.at[1].set(jnp.array([0.55, 0.55, 0.55]))
    nbr = nbr.at[0, 1].set(1)
    plan = build_cellblock(pos, nbr, 1.0, SPEC)
    assert int(plan.dropped_edges) >= 1


def test_sort_neighbors_roundtrip():
    pos, nbr, _ = _fixture(n=64, k=4)
    plan = build_cellblock(pos, nbr, 1.0, SPEC)
    nbr_sorted = sort_neighbors(nbr, plan.order)
    order = np.asarray(plan.order)
    # Edge sets (as original-id pairs) must be identical.
    orig = {(i, int(s)) for i in range(64) for s in np.asarray(nbr)[i]}
    via = {
        (int(order[i]), int(order[s]))
        for i in range(64)
        for s in np.asarray(nbr_sorted)[i]
    }
    assert orig == via
