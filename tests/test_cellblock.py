"""Cell-block (selection-matrix) aggregation vs. the gather+sum oracle.

Round-3 scheme: per-column compaction with dynamically-placed candidate
windows (``ops/cellblock.py``). The contract: identical to gather+sum up
to summation order whenever ``overflow == dropped_edges == 0``, and the
custom VJP (reverse selection table) is the exact transpose whenever
``reverse_mismatch == 0``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.ops.cellblock import (
    CellBlockSpec,
    build_cellblock,
    cellblock_aggregate,
    cellblock_aggregate_slots,
    choose_cellblock_spec,
    compact_from_slots,
    expand_to_slots,
    reference_cellblock_aggregate,
    sort_neighbors,
)
from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic

# G=4, one tile per column, window = whole padded column (96 rows): small
# enough that z-wrap windows are exercised on every fixture.
SPEC = CellBlockSpec(
    grid_size=4, col_capacity=32, query_block=32, window=96, wrap_cap=32,
    h_block=128,
)
# Narrow-window variant: 5 tiles per column with W < padded_col, so the
# dynamically-placed (Element-indexed) candidate windows actually move —
# the config-4-scale regime the whole-column specs above never enter.
SPEC_TILED = CellBlockSpec(
    grid_size=6, col_capacity=160, query_block=32, window=128, wrap_cap=48,
    h_block=128,
)


def _fixture(n=200, k=4, h=16, seed=0, box=1.0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, box, size=(n, 3)), jnp.float32)
    nbr = knn_periodic(pos, k, box)
    z = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    return pos, nbr, z


def test_spec_validation():
    with pytest.raises(ValueError):
        CellBlockSpec(2, 32, 32, 96, 32).validate()  # grid too small
    with pytest.raises(ValueError):
        CellBlockSpec(4, 48, 32, 96, 32).validate()  # CC not multiple of QB
    with pytest.raises(ValueError):
        CellBlockSpec(4, 32, 8, 96, 32).validate()  # QB not 32-aligned
    with pytest.raises(ValueError):
        CellBlockSpec(4, 32, 32, 200, 32).validate()  # 128<W not lane-aligned
    with pytest.raises(ValueError):
        CellBlockSpec(4, 32, 32, 128, 32).validate()  # window > padded col
    SPEC.validate()
    SPEC_TILED.validate()


def test_choose_spec():
    spec = choose_cellblock_spec(500_000, 32)
    spec.validate()
    mean_col = 500_000 / spec.num_columns
    # Column capacity covers the Poisson tail but stays lean (< 1.5x mean).
    assert spec.col_capacity >= mean_col + 5 * np.sqrt(mean_col) - spec.query_block
    assert spec.col_capacity <= 1.5 * mean_col
    # Tiny N still yields a valid spec.
    choose_cellblock_spec(200).validate()
    choose_cellblock_spec(200, 4).validate()


@pytest.mark.parametrize("spec,n,k", [(SPEC, 200, 4), (SPEC_TILED, 3000, 5)])
def test_matches_gather_sum_oracle(spec, n, k):
    pos, nbr, z = _fixture(n=n, k=k)
    plan = build_cellblock(pos, nbr, 1.0, spec)
    assert int(plan.overflow) == 0
    assert int(plan.dropped_edges) == 0
    assert int(plan.window_overflow) == 0

    nbr_sorted = sort_neighbors(nbr, plan.order)
    z_sorted = z[plan.order]
    got = cellblock_aggregate(z_sorted, plan, spec, interpret=True)
    # The kernel carries z in bf16; compare against the oracle on the same
    # rounded values (f32 accumulation order may differ by ULPs).
    z_bf = z_sorted.astype(jnp.bfloat16).astype(jnp.float32)
    want = reference_cellblock_aggregate(z_bf, nbr_sorted)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6,
                               atol=2e-6)


def test_matches_oracle_in_original_order():
    pos, nbr, z = _fixture(seed=3, h=128)
    plan = build_cellblock(pos, nbr, 1.0, SPEC)
    assert int(plan.dropped_edges) == 0
    got_sorted = cellblock_aggregate(
        z[plan.order], plan, SPEC, interpret=True
    )
    inv = np.zeros(len(pos), np.int32)
    inv[np.asarray(plan.order)] = np.arange(len(pos))
    got = np.asarray(got_sorted)[inv]
    z_bf = z.astype(jnp.bfloat16).astype(jnp.float32)
    want = np.asarray(jnp.take(z_bf, nbr, axis=0).sum(axis=1))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_matches_oracle_chosen_spec():
    # The chooser's own spec (different G/QB/window) must agree too.
    pos, nbr, z = _fixture(n=700, k=5, h=32, seed=7)
    spec = choose_cellblock_spec(700, 5)
    plan = build_cellblock(pos, nbr, 1.0, spec)
    assert int(plan.overflow) == 0
    assert int(plan.dropped_edges) == 0
    got = cellblock_aggregate(z[plan.order], plan, spec, interpret=True)
    z_bf = z[plan.order].astype(jnp.bfloat16).astype(jnp.float32)
    want = reference_cellblock_aggregate(
        z_bf, sort_neighbors(nbr, plan.order)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6,
                               atol=2e-6)


def test_duplicate_neighbors_counted():
    # Multiplicity must be preserved.
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
    s = np.asarray(plan.s_table, np.int64)
    # Every real particle's row sums to k; empty slots to 0.
    row_sums = s.sum(axis=1)
    slots = np.asarray(plan.slot_of_sorted)
    expect = np.zeros(SPEC.num_slots, np.int64)
    expect[slots] = nbr.shape[1]
    np.testing.assert_array_equal(row_sums, expect)


def test_overflow_flagged():
    rng = np.random.default_rng(0)
    # 80 particles crammed into one cell (column capacity 32).
    pos = jnp.asarray(
        0.05 + 0.01 * rng.uniform(size=(80, 3)), jnp.float32
    )
    nbr = knn_periodic(pos, 4, 1.0)
    plan = build_cellblock(pos, nbr, 1.0, SPEC)
    assert int(plan.overflow) > 0


def test_out_of_window_edges_flagged():
    pos, nbr, _ = _fixture(n=100, k=3)
    # Wire one neighbor to a particle 2+ cells away (outside the 3x3 ring).
    pos = pos.at[0].set(jnp.array([0.05, 0.05, 0.05]))
    pos = pos.at[1].set(jnp.array([0.55, 0.55, 0.55]))
    nbr = nbr.at[0, 1].set(1)
    plan = build_cellblock(pos, nbr, 1.0, SPEC)
    assert int(plan.dropped_edges) >= 1


def test_expand_compact_roundtrip_and_vjp():
    pos, nbr, z = _fixture(n=120, k=3, h=8, seed=4)
    plan = build_cellblock(pos, nbr, 1.0, SPEC)
    z_sorted = z[plan.order]
    slots = expand_to_slots(z_sorted, plan)
    back = compact_from_slots(slots, plan)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(z_sorted))

    # VJPs are the exact transposes (gather both ways — no scatter).
    def f(x):
        return jnp.sum(compact_from_slots(expand_to_slots(x, plan), plan) ** 2)

    g = jax.grad(f)(z_sorted)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(z_sorted),
                               rtol=1e-6)


def test_reverse_table_certified():
    pos, nbr, _ = _fixture(n=150, k=4, seed=5)
    plan = build_cellblock(pos, nbr, 1.0, SPEC, with_reverse=True)
    assert int(plan.dropped_edges) == 0
    assert int(plan.reverse_mismatch) == 0
    # Column sums of S == row sums of S_rev per slot (same edge multiset).
    s = np.asarray(plan.s_table, np.int64)
    sr = np.asarray(plan.s_rev_table, np.int64)
    assert s.sum() == sr.sum() == nbr.size


@pytest.mark.parametrize("spec,n", [(SPEC, 180), (SPEC_TILED, 3000)])
def test_aggregation_vjp_matches_oracle(spec, n):
    """d/dz of sum(f(S @ z)) must equal the oracle gather+sum's gradient
    (the wrap-window dedup makes this nontrivial)."""
    pos, nbr, z = _fixture(n=n, k=4, h=16, seed=6)
    plan = build_cellblock(pos, nbr, 1.0, spec, with_reverse=True)
    assert int(plan.reverse_mismatch) == 0
    nbr_sorted = sort_neighbors(nbr, plan.order)
    z_sorted = z[plan.order]
    w = jnp.asarray(
        np.random.default_rng(9).standard_normal((16,)), jnp.float32
    )

    def f_cb(x):
        slots = expand_to_slots(x, plan)
        out = cellblock_aggregate_slots(
            slots, plan, spec, carry_dtype=jnp.float32, interpret=True
        )
        return jnp.sum(compact_from_slots(out, plan) ** 2 @ w)

    def f_oracle(x):
        return jnp.sum(
            reference_cellblock_aggregate(x, nbr_sorted) ** 2 @ w
        )

    np.testing.assert_allclose(
        float(f_cb(z_sorted)), float(f_oracle(z_sorted)), rtol=1e-5
    )
    g_cb = jax.grad(f_cb)(z_sorted)
    g_oracle = jax.grad(f_oracle)(z_sorted)
    np.testing.assert_allclose(
        np.asarray(g_cb), np.asarray(g_oracle), rtol=1e-4, atol=1e-5
    )


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


@pytest.mark.parametrize("spec", [SPEC, SPEC_TILED])
def test_s_build_kernel_matches_contract(spec):
    """The Pallas one-hot S-build (s_build='kernel') produces a table
    bit-identical to the XLA one-hot contract, including duplicate-edge
    multiplicities and the dropped-edge count."""
    pos, nbr, _ = _fixture(n=300, k=5, seed=3)
    a = build_cellblock(pos, nbr, 1.0, spec)
    b = build_cellblock(pos, nbr, 1.0, spec, s_build="kernel")
    np.testing.assert_array_equal(np.asarray(a.s_table), np.asarray(b.s_table))
    assert int(a.dropped_edges) == int(b.dropped_edges)
    assert int(a.overflow) == int(b.overflow)
    assert int(a.window_overflow) == int(b.window_overflow)


@pytest.mark.parametrize("spec,n", [(SPEC, 200), (SPEC_TILED, 3000)])
def test_reverse_build_kernel_matches_contract(spec, n):
    """The Pallas reverse-table build (s_build='kernel', interpret mode on
    CPU) is bit-identical to the XLA gather + one-hot contract, including
    the wrap-image dedup and the edge-total used by reverse_mismatch."""
    pos, nbr, _ = _fixture(n=n, k=4, seed=7)
    a = build_cellblock(pos, nbr, 1.0, spec, with_reverse=True)
    b = build_cellblock(
        pos, nbr, 1.0, spec, with_reverse=True, s_build="kernel"
    )
    np.testing.assert_array_equal(
        np.asarray(a.s_rev_table), np.asarray(b.s_rev_table)
    )
    assert int(a.reverse_mismatch) == int(b.reverse_mismatch) == 0


@pytest.mark.parametrize("spec,n", [(SPEC, 200), (SPEC_TILED, 3000)])
def test_neighbor_codes_match_aux_path(spec, n):
    """Plans built from the Pallas kNN's candidate codes (arithmetic sender
    decode, no aux[neighbors] gather) are bit-identical to the aux path —
    forward table, reverse table, and every diagnostic."""
    from cosmology_gnn_simulation_tpu.ops.cell_list import CellGrid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        codes_packing_cap,
        pallas_cell_list_knn,
    )

    rng = np.random.default_rng(12)
    pos = jnp.asarray(rng.uniform(0, 1.0, size=(n, 3)), jnp.float32)
    g = spec.grid_size
    cap = max(8, int(np.ceil(n / g**3 * 4)))
    grid = CellGrid(grid_size=g, cell_capacity=cap)
    nbr, codes, spill = pallas_cell_list_knn(
        pos, 4, 1.0, grid, with_codes=True, interpret=True
    )
    cap_out = codes_packing_cap(n, 4, grid)
    a = build_cellblock(pos, nbr, 1.0, spec, with_reverse=True)
    b = build_cellblock(
        pos, nbr, 1.0, spec, with_reverse=True,
        neighbor_codes=codes, codes_cap=cap_out, codes_spill=spill,
    )
    np.testing.assert_array_equal(np.asarray(a.s_table), np.asarray(b.s_table))
    np.testing.assert_array_equal(
        np.asarray(a.s_rev_table), np.asarray(b.s_rev_table)
    )
    for f in ("overflow", "dropped_edges", "window_overflow",
              "reverse_mismatch"):
        assert int(getattr(a, f)) == int(getattr(b, f)), f


@pytest.mark.parametrize("spec,n", [(SPEC, 200), (SPEC_TILED, 3000)])
def test_neighbor_codes_fused_forward(spec, n):
    """``with_reverse=False`` + codes takes the FUSED decode+S tile (one
    lax.map sweep, no decoded-aux intermediate — the rollout path). Its
    forward table and diagnostics must be bit-identical to both the aux
    path and the two-sweep codes path (with_reverse=True)."""
    from cosmology_gnn_simulation_tpu.ops.cell_list import CellGrid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        codes_packing_cap,
        pallas_cell_list_knn,
    )

    rng = np.random.default_rng(21)
    pos = jnp.asarray(rng.uniform(0, 1.0, size=(n, 3)), jnp.float32)
    g = spec.grid_size
    cap = max(8, int(np.ceil(n / g**3 * 4)))
    grid = CellGrid(grid_size=g, cell_capacity=cap)
    nbr, codes, spill = pallas_cell_list_knn(
        pos, 4, 1.0, grid, with_codes=True, interpret=True
    )
    cap_out = codes_packing_cap(n, 4, grid)
    a = build_cellblock(pos, nbr, 1.0, spec)
    b = build_cellblock(
        pos, None, 1.0, spec, neighbor_codes=codes, codes_cap=cap_out,
        codes_spill=spill,
    )
    c = build_cellblock(
        pos, nbr, 1.0, spec, with_reverse=True,
        neighbor_codes=codes, codes_cap=cap_out, codes_spill=spill,
    )
    np.testing.assert_array_equal(np.asarray(a.s_table), np.asarray(b.s_table))
    np.testing.assert_array_equal(np.asarray(b.s_table), np.asarray(c.s_table))
    for f in ("overflow", "dropped_edges", "window_overflow"):
        assert int(getattr(a, f)) == int(getattr(b, f)) == int(
            getattr(c, f)
        ), f


def test_s_build_kernel_duplicates():
    pos, nbr, z = _fixture(n=120, k=4, seed=4)
    nbr = nbr.at[:, 1].set(nbr[:, 0])  # duplicate edges -> multiplicity 2
    a = build_cellblock(pos, nbr, 1.0, SPEC)
    b = build_cellblock(pos, nbr, 1.0, SPEC, s_build="kernel")
    np.testing.assert_array_equal(np.asarray(a.s_table), np.asarray(b.s_table))
    assert int(np.asarray(b.s_table).max()) >= 2


@pytest.mark.parametrize("spec,n", [(SPEC, 200), (SPEC_TILED, 3000)])
def test_s_from_codes_fused_kernel_matches_contract(spec, n):
    """Round 4: the single-pass Pallas codes->S kernel (s_build='kernel' on
    the fused codes path — decode + const select + window math + one-hot
    accumulate in one kernel) is bit-identical to the contract path,
    including the dropped-edges count."""
    from cosmology_gnn_simulation_tpu.ops.cell_list import CellGrid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        codes_packing_cap,
        pallas_cell_list_knn,
    )

    rng = np.random.default_rng(33)
    pos = jnp.asarray(rng.uniform(0, 1.0, size=(n, 3)), jnp.float32)
    g = spec.grid_size
    cap = max(8, int(np.ceil(n / g**3 * 4)))
    grid = CellGrid(grid_size=g, cell_capacity=cap)
    nbr, codes, spill = pallas_cell_list_knn(
        pos, 4, 1.0, grid, with_codes=True, interpret=True
    )
    cap_out = codes_packing_cap(n, 4, grid)
    a = build_cellblock(
        pos, None, 1.0, spec, s_build="contract",
        neighbor_codes=codes, codes_cap=cap_out, codes_spill=spill,
    )
    b = build_cellblock(
        pos, None, 1.0, spec, s_build="kernel",
        neighbor_codes=codes, codes_cap=cap_out, codes_spill=spill,
    )
    np.testing.assert_array_equal(np.asarray(a.s_table), np.asarray(b.s_table))
    for f in ("overflow", "dropped_edges", "window_overflow"):
        assert int(getattr(a, f)) == int(getattr(b, f)), f


def test_s_from_codes_fused_kernel_spill():
    """Fused kernel parity on a frame whose kNN actually engages the spill
    block (one crammed cell overflows the common-case capacity): resolved
    spill codes, drop marks and invalids all decode identically to the
    contract path."""
    from cosmology_gnn_simulation_tpu.ops.cell_list import CellGrid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        codes_packing_cap,
        pallas_cell_list_knn,
        spill_layout,
    )

    rng = np.random.default_rng(7)
    n = 3000
    spec = SPEC_TILED
    g = spec.grid_size
    pos = rng.uniform(0, 1.0, size=(n, 3)).astype(np.float32)
    # Cram 60 particles into one cell so the kNN table capacity overflows
    # into the spill block.
    pos[:60] = 0.5 / g + rng.uniform(0, 0.2 / g, size=(60, 3))
    pos = jnp.asarray(pos)
    cap = max(8, int(np.ceil(n / g**3 * 2.0)))
    grid = CellGrid(grid_size=g, cell_capacity=cap)
    _, _, spill_cap = spill_layout(n, 4, grid)
    assert spill_cap > 0
    nbr, codes, spill = pallas_cell_list_knn(
        pos, 4, 1.0, grid, with_codes=True, interpret=True
    )
    assert spill is not None
    assert int(jnp.sum(codes >= 27 * codes_packing_cap(n, 4, grid))) > 0
    cap_out = codes_packing_cap(n, 4, grid)
    a = build_cellblock(
        pos, None, 1.0, spec, s_build="contract",
        neighbor_codes=codes, codes_cap=cap_out, codes_spill=spill,
    )
    b = build_cellblock(
        pos, None, 1.0, spec, s_build="kernel",
        neighbor_codes=codes, codes_cap=cap_out, codes_spill=spill,
    )
    np.testing.assert_array_equal(np.asarray(a.s_table), np.asarray(b.s_table))
    for f in ("overflow", "dropped_edges", "window_overflow"):
        assert int(getattr(a, f)) == int(getattr(b, f)), f


# ---------------------------------------------------------------------------
# Variable per-column capacities (round 4): slot_budget > 0 packs columns at
# QB granularity behind data-dependent prefixes. Contract: identical
# aggregation results and certificates; only the slot-table layout changes.
# ---------------------------------------------------------------------------


def _variable_spec(n, k, query_block=32):
    spec = choose_cellblock_spec(n, k, query_block=query_block, variable=True)
    assert spec.variable and spec.slot_budget % spec.query_block == 0
    return spec


def test_variable_spec_chooser():
    spec = _variable_spec(3000, 5)
    spec.validate()
    uniform = choose_cellblock_spec(3000, 5, query_block=32)
    # The budget undercuts the uniform layout's slot count (the whole
    # point) while covering the expected QB-rounded occupancy.
    assert spec.num_slots < uniform.num_slots
    assert spec.num_slots >= 3000
    with pytest.raises(ValueError):  # budget must be a QB multiple
        spec._replace(slot_budget=spec.slot_budget + 1).validate()
    with pytest.raises(ValueError):  # halo slabs are uniform-only
        spec._replace(grid_x=spec.grid_size + 2, periodic_x=False).validate()


@pytest.mark.parametrize("n,k", [(200, 4), (3000, 5)])
def test_variable_matches_gather_sum_oracle(n, k):
    pos, nbr, z = _fixture(n=n, k=k)
    spec = _variable_spec(n, k)
    plan = build_cellblock(pos, nbr, 1.0, spec)
    assert int(plan.overflow) == 0
    assert int(plan.dropped_edges) == 0
    assert int(plan.window_overflow) == 0
    nbr_sorted = sort_neighbors(nbr, plan.order)
    z_sorted = z[plan.order]
    got = cellblock_aggregate(z_sorted, plan, spec, interpret=True)
    z_bf = z_sorted.astype(jnp.bfloat16).astype(jnp.float32)
    want = reference_cellblock_aggregate(z_bf, nbr_sorted)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6,
                               atol=2e-6)
    # Edge totals preserved (no edge lost to the packed layout).
    assert int(np.asarray(plan.s_table, np.int64).sum()) == nbr.size


@pytest.mark.parametrize("n", [180, 3000])
def test_variable_vjp_matches_oracle(n):
    pos, nbr, z = _fixture(n=n, k=4, h=16, seed=6)
    spec = _variable_spec(n, 4)
    plan = build_cellblock(pos, nbr, 1.0, spec, with_reverse=True)
    assert int(plan.reverse_mismatch) == 0
    nbr_sorted = sort_neighbors(nbr, plan.order)
    z_sorted = z[plan.order]
    w = jnp.asarray(
        np.random.default_rng(9).standard_normal((16,)), jnp.float32
    )

    def f_cb(x):
        slots = expand_to_slots(x, plan)
        out = cellblock_aggregate_slots(
            slots, plan, spec, carry_dtype=jnp.float32, interpret=True
        )
        return jnp.sum(compact_from_slots(out, plan) ** 2 @ w)

    def f_oracle(x):
        return jnp.sum(
            reference_cellblock_aggregate(x, nbr_sorted) ** 2 @ w
        )

    np.testing.assert_allclose(
        float(f_cb(z_sorted)), float(f_oracle(z_sorted)), rtol=1e-5
    )
    g_cb = jax.grad(f_cb)(z_sorted)
    g_oracle = jax.grad(f_oracle)(z_sorted)
    np.testing.assert_allclose(
        np.asarray(g_cb), np.asarray(g_oracle), rtol=1e-4, atol=1e-5
    )


def test_variable_kernel_builds_match_contract():
    """Pallas S / reverse builds under the variable layout are bit-identical
    to the contract path (interpret mode)."""
    pos, nbr, _ = _fixture(n=3000, k=5, seed=3)
    spec = _variable_spec(3000, 5)
    a = build_cellblock(pos, nbr, 1.0, spec, with_reverse=True)
    b = build_cellblock(
        pos, nbr, 1.0, spec, with_reverse=True, s_build="kernel"
    )
    np.testing.assert_array_equal(np.asarray(a.s_table), np.asarray(b.s_table))
    np.testing.assert_array_equal(
        np.asarray(a.s_rev_table), np.asarray(b.s_rev_table)
    )
    assert int(a.reverse_mismatch) == int(b.reverse_mismatch) == 0
    assert int(a.dropped_edges) == int(b.dropped_edges)


@pytest.mark.parametrize("n", [200, 3000])
def test_variable_neighbor_codes_paths(n):
    """Codes-path plans (two-sweep, fused lax.map, fused kernel) under the
    variable layout are all bit-identical to the aux path."""
    from cosmology_gnn_simulation_tpu.ops.cell_list import CellGrid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        codes_packing_cap,
        pallas_cell_list_knn,
    )

    rng = np.random.default_rng(12)
    pos = jnp.asarray(rng.uniform(0, 1.0, size=(n, 3)), jnp.float32)
    spec = _variable_spec(n, 4)
    g = spec.grid_size
    cap = max(8, int(np.ceil(n / g**3 * 4)))
    grid = CellGrid(grid_size=g, cell_capacity=cap)
    nbr, codes, spill = pallas_cell_list_knn(
        pos, 4, 1.0, grid, with_codes=True, interpret=True
    )
    cap_out = codes_packing_cap(n, 4, grid)
    a = build_cellblock(pos, nbr, 1.0, spec, with_reverse=True)
    b = build_cellblock(
        pos, nbr, 1.0, spec, with_reverse=True,
        neighbor_codes=codes, codes_cap=cap_out, codes_spill=spill,
    )
    c = build_cellblock(
        pos, None, 1.0, spec, s_build="contract",
        neighbor_codes=codes, codes_cap=cap_out, codes_spill=spill,
    )
    d = build_cellblock(
        pos, None, 1.0, spec, s_build="kernel",
        neighbor_codes=codes, codes_cap=cap_out, codes_spill=spill,
    )
    for other in (b, c, d):
        np.testing.assert_array_equal(
            np.asarray(a.s_table), np.asarray(other.s_table)
        )
    np.testing.assert_array_equal(
        np.asarray(a.s_rev_table), np.asarray(b.s_rev_table)
    )
    for f in ("overflow", "dropped_edges", "window_overflow"):
        assert int(getattr(a, f)) == int(getattr(b, f)) == int(
            getattr(c, f)
        ) == int(getattr(d, f)), f


@pytest.mark.parametrize("variable", [False, True])
def test_table_codes_layout_matches_particle(variable):
    """codes_layout='table' (round 4): a plan consumed straight from the
    kNN kernel's cell-table codes output (one quasi-monotone gather, no
    inverse-permutation sort / [N, k] scatter) is bit-identical to the
    particle-layout plan — spill engaged, both S builds, uniform and
    variable slot layouts, with and without the reverse table."""
    from cosmology_gnn_simulation_tpu.ops.cell_list import CellGrid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        codes_packing_cap,
        pallas_cell_list_knn,
        spill_layout,
    )

    rng = np.random.default_rng(7)
    n, k = 3000, 4
    spec = _variable_spec(n, k) if variable else SPEC_TILED
    g = spec.grid_size
    pos = rng.uniform(0, 1.0, size=(n, 3)).astype(np.float32)
    # Cram one cell so the spill block engages (spilled particles own no
    # table row — their solved picks ride the 3rd spill element). 36 is
    # tuned: 46 spill codes with zero window overflow / dropped edges —
    # crammed harder the plan itself goes non-exact (the certificate's
    # job) and the ==0 asserts below would test the wrong thing.
    pos[:36] = 0.5 / g + rng.uniform(0, 0.2 / g, size=(36, 3))
    pos = jnp.asarray(pos)
    cap = max(8, int(np.ceil(n / g**3 * 2.0)))
    grid = CellGrid(grid_size=g, cell_capacity=cap)
    assert spill_layout(n, k, grid)[2] > 0
    cap_out = codes_packing_cap(n, k, grid)
    _, codes_p, spill_p = pallas_cell_list_knn(
        pos, k, 1.0, grid, with_codes=True, codes_only=True, interpret=True
    )
    _, codes_t, spill_t = pallas_cell_list_knn(
        pos, k, 1.0, grid, with_codes=True, codes_only=True,
        codes_layout="table", interpret=True,
    )
    assert codes_t.shape == (g**3 * cap_out, k)
    assert len(spill_t) == 3
    assert int(jnp.sum(codes_p >= 27 * cap_out)) > 0  # spill codes present
    for s_build in ("contract", "kernel"):
        for with_reverse in (False, True):
            a = build_cellblock(
                pos, None, 1.0, spec, s_build=s_build,
                with_reverse=with_reverse,
                neighbor_codes=codes_p, codes_cap=cap_out,
                codes_spill=spill_p[:2],
            )
            b = build_cellblock(
                pos, None, 1.0, spec, s_build=s_build,
                with_reverse=with_reverse,
                neighbor_codes=codes_t, codes_cap=cap_out,
                codes_spill=spill_t, codes_layout="table",
            )
            np.testing.assert_array_equal(
                np.asarray(a.s_table), np.asarray(b.s_table)
            )
            if with_reverse:
                np.testing.assert_array_equal(
                    np.asarray(a.s_rev_table), np.asarray(b.s_rev_table)
                )
                assert int(a.reverse_mismatch) == int(b.reverse_mismatch) == 0
            for f in ("overflow", "dropped_edges", "window_overflow"):
                assert int(getattr(a, f)) == int(getattr(b, f)), f


def test_variable_budget_overflow_is_loud():
    """A budget too small for the data trips the overflow counter (columns
    past the clamped prefix own zero slots) — never a silent drop."""
    pos, nbr, z = _fixture(n=3000, k=4, seed=2)
    spec = _variable_spec(3000, 4)
    tight = spec._replace(
        slot_budget=(3000 // 2) // spec.query_block * spec.query_block
    )
    tight.validate()
    plan = build_cellblock(pos, nbr, 1.0, tight)
    assert int(plan.overflow) > 0
    # The aggregation still runs (overflowed rows clamp to the zero row).
    out = cellblock_aggregate(z[plan.order], plan, tight, interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize(
    "spec,n",
    [
        (SPEC, 200),
        (SPEC_TILED, 3000),
        # VARIABLE layout: the sender-pack decode takes the prefix-offset
        # branch (the config-4 opt-in the TPU probe runs with
        # --cellblock_variable).
        (SPEC_TILED._replace(slot_budget=5760), 3000),
    ],
)
def test_ids_free_reverse_plan_matches_ids_plan(spec, n):
    """Round 5: the TRAINING plan (``with_reverse=True``) built from
    codes-only search output (``neighbors=None`` — the single-payload kNN
    kernel the trainer now requests, saving the dual id+code selection)
    is bit-identical to the ids+codes plan: forward table, reverse table,
    and every diagnostic."""
    from cosmology_gnn_simulation_tpu.ops.cell_list import CellGrid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
        codes_packing_cap,
        pallas_cell_list_knn,
    )

    rng = np.random.default_rng(12)
    pos = jnp.asarray(rng.uniform(0, 1.0, size=(n, 3)), jnp.float32)
    g = spec.grid_size
    cap = max(8, int(np.ceil(n / g**3 * 4)))
    grid = CellGrid(grid_size=g, cell_capacity=cap)
    nbr, codes, spill = pallas_cell_list_knn(
        pos, 4, 1.0, grid, with_codes=True, interpret=True
    )
    cap_out = codes_packing_cap(n, 4, grid)
    a = build_cellblock(
        pos, nbr, 1.0, spec, with_reverse=True,
        neighbor_codes=codes, codes_cap=cap_out, codes_spill=spill,
    )
    _, codes2, spill2 = pallas_cell_list_knn(
        pos, 4, 1.0, grid, with_codes=True, codes_only=True, interpret=True
    )
    b = build_cellblock(
        pos, None, 1.0, spec, with_reverse=True,
        neighbor_codes=codes2, codes_cap=cap_out, codes_spill=spill2,
    )
    np.testing.assert_array_equal(np.asarray(a.s_table), np.asarray(b.s_table))
    np.testing.assert_array_equal(
        np.asarray(a.s_rev_table), np.asarray(b.s_rev_table)
    )
    for f in ("overflow", "dropped_edges", "window_overflow",
              "reverse_mismatch"):
        assert int(getattr(a, f)) == int(getattr(b, f)), f
