"""Pallas TPU kernel: fused cell-list k-NN selection.

Why a kernel: at N=65k the periodic k-NN dominates the simulation step.
XLA-level implementations are bottlenecked by ops TPUs dislike —
``lax.top_k`` over 65k-wide rows (~500 ms) and elementwise gathers of
hundreds of millions of candidate coordinates (~2.5 s). This kernel keeps
everything in VMEM: for each cell of a periodic grid, the 27-cell candidate
block is streamed in via the pallas pipeline, min-image distances are
computed on the VPU, and the k nearest are selected with an unrolled
argmin-and-mask loop — no sort, no top_k, no scatter/gather in the hot loop.

Pipeline (wrapper ``pallas_cell_list_knn``):
  1. [XLA] bin particles into a G^3 grid, sort by cell id, build dense
     per-cell planes ``x/y/z/valid`` of shape [G^3, C] plus the particle ids
     per slot. C is sized for the COMMON case (lam + 4.5 sigma); the rare
     particles beyond C land in a static global SPILL block that rides the
     candidate rows' lane padding (round 3 — durability without paying the
     Poisson-extreme capacity in every cell's candidate width; overflow
     then counts only spill exhaustion).
  2. [XLA] expand each cell's 27-neighborhood into candidate rows
     [G^3, 27*C] via 27 periodic **rolls** of the 3-D cell table —
     contiguous memory ops; a [G^3, 27] row gather is pathologically slow
     to compile/run on this backend.
  3. [Pallas] grid over cell blocks: per cell, d2 = sum_d min_image(q - c)^2
     over the [C, 27C] query-x-candidate tile (spill lanes min-imaged);
     select k smallest by k iterations of (min, min-id-among-minima,
     mask-by-id) — exact, deterministic (smallest particle id wins
     exact-distance ties) — resolving the winners' particle ids on-chip.
  4. [XLA] reorder results to the original particle indexing via each
     particle's (cell, rank); spilled queries' rows are solved exactly
     against their own cell's candidate row (tiny static shapes) and
     scattered in.

Exactness matches the cell list's guarantee: provably exact when no cell
overflows C and every query's k-th neighbor lies within its per-query
3x3x3-window margin (between 1 and 1.5 cell edges — see
``cell_list.window_margin_sq``; diagnostics returned for both).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosmology_gnn_simulation_tpu.ops.binning import bin_by_key, scatter_to_table
from cosmology_gnn_simulation_tpu.ops.cell_list import (
    CellGrid,
    choose_cell_grid,
    poisson_occupancy_capacity,
    window_margin_sq,
)
from cosmology_gnn_simulation_tpu.ops.periodic import min_image_displacement

_BIG = 1e30
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def padded_cell_capacity(grid: CellGrid) -> int:
    """The spill-less static per-cell table capacity (8-aligned). With the
    spill block active the kernel uses the smaller common-case capacity —
    use ``spill_layout``/``codes_packing_cap`` for the authoritative
    numbers."""
    return _round_up(grid.cell_capacity, 8)


def spill_layout(n: int, k: int, grid: CellGrid):
    """The kernel's static candidate-row layout: ``(cap, num_cand,
    spill_cap)``.

    Single source of truth shared by the kernel wrapper and the codes
    consumers (``codes_cap`` MUST equal the packing cap the kernel used).
    The spill block activates when the caller kept the uniform-default
    capacity (``choose_cell_grid``'s durable Poisson quantile): the table
    then holds the common case (lam + 4.5 sigma) and the rare overflow
    rides the spill lanes. Callers that RAISED capacities (clustered-data
    overrides) get the spill-less layout.
    """
    g = grid.grid_size
    lam = n / g**3
    use_spill = grid.cell_capacity <= max(
        k, poisson_occupancy_capacity(lam, g**3)
    )
    if use_spill:
        cap = _round_up(
            min(grid.cell_capacity,
                max(8, int(np.ceil(lam + 4.5 * np.sqrt(lam))))), 8
        )
        num_cand = _round_up(27 * cap, _LANE)
        spill_cap = num_cand - 27 * cap
        if spill_cap < 32:
            num_cand += _LANE
            spill_cap += _LANE
    else:
        cap = _round_up(grid.cell_capacity, 8)
        num_cand = _round_up(27 * cap, _LANE)
        spill_cap = 0
    return cap, num_cand, spill_cap


def codes_packing_cap(n: int, k: int, grid: CellGrid) -> int:
    """The per-cell capacity the ``with_codes`` lane packing
    ``j27 * cap + rank`` uses — the ``codes_cap`` to hand
    ``build_cellblock``."""
    return spill_layout(n, k, grid)[0]


def _select_kernel(
    k: int, cells_per_block: int, cap: int, num_cand: int,
    with_codes: bool = False, lex_carry: bool = True, mi_lanes: int = 0,
    codes_only: bool = False, row_groups: bool = False, pick_batch: int = 1,
):
    """Build the kernel body: per cell, exact k-smallest-distance selection
    over its candidate row, emitting the selected **particle ids** directly
    (id resolution on-chip avoids a [G^3, cap, k] gather afterwards).

    ``with_codes`` additionally emits each pick's CANDIDATE LANE index
    ``j27 * cap + rank`` — the (neighbor-cell offset, in-cell rank) code the
    cell-block plan build decodes into sender slots arithmetically, instead
    of the pathological 16M-element ``aux[neighbors]`` gather (143 ms at
    config 4, benchmarks/results/cb_parts_r3.json). Costs one extra
    masked-min pass per pick (in-scan +10 ms at the flagship spec —
    benchmarks/results/plan_parts_r3.json); off for the plain-kNN path.

    ``codes_only`` emits ONLY the codes: the selection tracks the pick's
    candidate LANE as its single payload — the same two reduce passes per
    pick as the ids-only form, none of ``with_codes``'s extra pass — and
    the particle-id output (never read by the cell-block pipeline) is
    dropped entirely. Tie-break becomes smallest LANE among equal
    distances, i.e. lexicographic (neighbor-cell offset, in-cell rank) —
    a different but equally-exact pick than the min-id rule on
    exact-distance ties (measure-zero for continuous data).

    ``lex_carry`` selects the write-free lexicographic-threshold selection
    (production widths); False falls back to in-place masked re-min, which
    keeps one fewer [cap, num_cand] tile live — for fat clustered-data
    capacities that would otherwise blow the 16 MB scoped-VMEM limit.
    Both enumerate picks in identical exact (d2, id) ascending order.
    """

    # Query-row grouping (round 4, OPT-IN — measured negative as a
    # default): the mean cell occupancy is well below ``cap`` (Poisson
    # lam + 4.5 sigma sizing — lam ~ 9.6 vs cap 24 at the flagship spec),
    # so ~60% of the selection loop's VPU work runs on EMPTY query rows.
    # With ``row_groups`` the per-cell body processes the [cap, num_cand]
    # tile as cap/8 sublane groups of 8 rows, each gated by
    # ``pl.when(occ > gi * 8)`` on the cell's scalar occupancy — groups
    # past the occupied rows are skipped (E[ceil(occ/8) * 8] ~ 13.4 of 24
    # rows at flagship). On this backend the branches SERIALIZE the
    # pipeline and lose 2.3x end-to-end (see the wrapper docstring), so
    # the default stays ungrouped. Skipped groups write the same sentinel
    # rows (codes = num_cand / id = n, kth = _BIG) the selection emits for
    # exhausted rows, so outputs stay deterministic.
    group = 8 if row_groups else cap
    n_groups = cap // group
    assert cap % group == 0

    def codes_kernel(qx, qy, qz, cx, cy, cz, cids, nref, box_ref, occ_ref,
                     *outs):
        codes_ref, kth_ref = outs[0], outs[1]
        n_sentinel = nref[0]
        box = box_ref[0]
        cell_base = pl.program_id(0) * cells_per_block

        def _codes_rows(c, rows):
            d2 = jnp.zeros((group, num_cand), jnp.float32)
            for q_ref, c_ref in ((qx, cx), (qy, cy), (qz, cz)):
                delta = q_ref[c, rows][:, None] - c_ref[c, :][None, :]
                if mi_lanes:
                    tail = delta[:, num_cand - mi_lanes:]
                    tail = jnp.where(tail > 0.5 * box, tail - box, tail)
                    tail = jnp.where(tail < -0.5 * box, tail + box, tail)
                    delta = jnp.concatenate(
                        [delta[:, : num_cand - mi_lanes], tail], axis=1
                    )
                d2 = d2 + delta * delta
            ids_row = jnp.broadcast_to(
                cids[c, :][None, :], (group, num_cand))
            d2 = jnp.where(ids_row >= n_sentinel, _BIG, d2)

            codes = jnp.zeros((group, _LANE), jnp.int32)
            cand_lane = jax.lax.broadcasted_iota(
                jnp.int32, (group, num_cand), 1
            )
            out_lane = jax.lax.broadcasted_iota(jnp.int32, (group, _LANE), 1)
            big_lane = jnp.int32(2**30)
            m = jnp.full((group, 1), -1.0, jnp.float32)
            # Batched picks (round 5): the in-place masked re-min pays one
            # full-[group, num_cand] masked STORE of d2 per pick (~1/3 of
            # kernel time at k=16, knn_kernel_r3.json). With pick_batch=B,
            # B picks share ONE store — picks 2..B mask the previous pick
            # out of a read-only `avail` view instead (the extra live tile
            # is [group, num_cand] f32, well under scoped VMEM at
            # production widths). pick_batch=1 is exactly the round-3 loop.
            prev = []  # picked lanes not yet masked out of d2 itself
            j = 0
            while j < k:
                b = min(pick_batch, k - j)
                mask = None
                for lp in prev:
                    eq = cand_lane == lp
                    mask = eq if mask is None else (mask | eq)
                if mask is not None:
                    d2 = jnp.where(mask, _BIG, d2)
                prev = []
                avail = d2
                for t in range(b):
                    m = jnp.min(avail, axis=1, keepdims=True)
                    new_lane = jnp.min(
                        jnp.where(avail <= m, cand_lane, big_lane),
                        axis=1, keepdims=True,
                    )
                    # Exhausted row: emit the num_cand sentinel (stays
                    # excluded on later picks — no lane equals num_cand).
                    lane_pick = jnp.where(m < _BIG * 0.5, new_lane, num_cand)
                    codes = jnp.where(out_lane == j + t, lane_pick, codes)
                    prev.append(lane_pick)
                    if t < b - 1:
                        avail = jnp.where(
                            cand_lane == lane_pick, _BIG, avail
                        )
                j += b
            codes_ref[c, rows] = codes
            kth_ref[c, rows] = m[:, 0]

        for c in range(cells_per_block):
            if not row_groups:
                _codes_rows(c, slice(0, cap))
                continue
            occ = occ_ref[cell_base + c]
            for gi in range(n_groups):
                rows = slice(gi * group, (gi + 1) * group)

                @pl.when(occ > gi * group)
                def _(c=c, rows=rows):
                    _codes_rows(c, rows)

                @pl.when(occ <= gi * group)
                def _(c=c, rows=rows):
                    codes_ref[c, rows] = jnp.full(
                        (group, _LANE), num_cand, jnp.int32)
                    kth_ref[c, rows] = jnp.full(
                        (group,), _BIG, jnp.float32)

    if codes_only:
        return codes_kernel

    def kernel(qx, qy, qz, cx, cy, cz, cids, nref, box_ref, occ_ref, *outs):
        out_ref, kth_ref = outs[0], outs[1]
        codes_ref = outs[2] if with_codes else None
        n_sentinel = nref[0]
        box = box_ref[0]
        cell_base = pl.program_id(0) * cells_per_block

        def _select_rows(c, rows):
            d2 = jnp.zeros((group, num_cand), jnp.float32)
            for q_ref, c_ref in ((qx, cx), (qy, cy), (qz, cz)):
                # Candidates arrive PRE-SHIFTED by +-box on wrapped rolls
                # (gather_cands), so the plain difference IS a valid
                # periodic representative: it equals the min-image
                # displacement for any candidate within one cell (the
                # certified regime) and never underestimates the true
                # distance otherwise — exactness is unchanged, and the
                # VPU saves the |d| vs box-|d| compare-selects per dim.
                delta = q_ref[c, rows][:, None] - c_ref[c, :][None, :]
                if mi_lanes:
                    # The trailing lane tiles carry the GLOBAL spill block
                    # (absolute coordinates from anywhere in the box) —
                    # min-image those lanes. A few real candidate lanes in
                    # the shared tile get min-imaged too, which is exact:
                    # min-image of a +-box pre-shifted displacement is the
                    # true periodic displacement.
                    tail = delta[:, num_cand - mi_lanes:]
                    tail = jnp.where(tail > 0.5 * box, tail - box, tail)
                    tail = jnp.where(tail < -0.5 * box, tail + box, tail)
                    delta = jnp.concatenate(
                        [delta[:, : num_cand - mi_lanes], tail], axis=1
                    )
                d2 = d2 + delta * delta
            ids_row = jnp.broadcast_to(
                cids[c, :][None, :], (group, num_cand))
            # Empty slots carry the sentinel id — mask them out directly
            # (no separate validity plane needed).
            d2 = jnp.where(ids_row >= n_sentinel, _BIG, d2)

            picked = jnp.zeros((group, _LANE), jnp.int32)
            codes = jnp.zeros((group, _LANE), jnp.int32)
            cand_lane = jax.lax.broadcasted_iota(
                jnp.int32, (group, num_cand), 1
            )
            out_lane = jax.lax.broadcasted_iota(jnp.int32, (group, _LANE), 1)
            big_id = jnp.int32(2**30)
            # Lexicographic-threshold selection: picks enumerate candidates
            # in exact (d2, id) ascending order — identical pick order to
            # masked re-min (ids are unique per row: each particle sits in
            # exactly one of the 27 distinct cells), but the "already
            # picked" state is the scalar pair (m, pid) per row instead of
            # a masked d2 copy. Per pick: 2 reduce traversals of the tile
            # and NO tile-wide write-back (the old form paid a third,
            # full-tile masked store per pick — ~1/3 of kernel time at
            # k=16, benchmarks/results/knn_kernel_r3.json). Ties broken by
            # SMALLEST PARTICLE ID, matching the brute-force backend's
            # top_k lowest-index tie-break. (The XLA cell list tie-breaks
            # by lane order instead; the backends can differ on EXACT
            # distance ties — measure-zero for continuous data, possible
            # for lattice initial conditions.)
            m = jnp.full((group, 1), -1.0, jnp.float32)
            pid = jnp.full((group, 1), -1, jnp.int32)
            for j in range(k):
                if lex_carry:
                    # Strictly-after-(m, pid) candidates in lex order.
                    avail = jnp.where(
                        (d2 > m) | ((d2 == m) & (ids_row > pid)), d2, _BIG
                    )
                else:
                    # In-place masked re-min: drop the previous pick from
                    # d2 itself (ids are unique per row).
                    d2 = jnp.where(ids_row == pid, _BIG, d2)
                    avail = d2
                m = jnp.min(avail, axis=1, keepdims=True)  # [group, 1]
                new_pid = jnp.min(
                    jnp.where(avail <= m, ids_row, big_id),
                    axis=1, keepdims=True,
                )  # [group, 1] — min id among the minima
                # Exhausted row (fewer than k valid candidates — only in the
                # uncertified regime): emit the sentinel instead of repeating
                # an already-picked real id, so the failure is detectable and
                # no edge gets silently double-counted. (Sentinel-id lanes
                # carry d2 == _BIG and id == n, so they stay excluded on
                # every later pick.)
                pid = jnp.where(m < _BIG * 0.5, new_pid, n_sentinel)
                picked = jnp.where(out_lane == j, pid, picked)
                if with_codes:
                    # The pick's unique candidate lane. Exhausted rows emit
                    # the num_cand sentinel.
                    lane = jnp.min(
                        jnp.where(ids_row == pid, cand_lane, big_id),
                        axis=1, keepdims=True,
                    )
                    lane = jnp.where(m < _BIG * 0.5, lane, num_cand)
                    codes = jnp.where(out_lane == j, lane, codes)
            out_ref[c, rows] = picked
            # m after the last iteration IS the k-th smallest distance —
            # the exactness certificate for free.
            kth_ref[c, rows] = m[:, 0]
            if with_codes:
                codes_ref[c, rows] = codes

        for c in range(cells_per_block):
            if not row_groups:
                _select_rows(c, slice(0, cap))
                continue
            occ = occ_ref[cell_base + c]
            for gi in range(n_groups):
                rows = slice(gi * group, (gi + 1) * group)

                @pl.when(occ > gi * group)
                def _(c=c, rows=rows):
                    _select_rows(c, rows)

                @pl.when(occ <= gi * group)
                def _(c=c, rows=rows):
                    out_ref[c, rows] = jnp.full(
                        (group, _LANE), n_sentinel, jnp.int32)
                    kth_ref[c, rows] = jnp.full(
                        (group,), _BIG, jnp.float32)
                    if with_codes:
                        codes_ref[c, rows] = jnp.full(
                            (group, _LANE), num_cand, jnp.int32)

    return kernel


def _build_table(positions, g: int, cap: int, box):
    """XLA-side binning: dense per-cell planes + particle bookkeeping.

    Deliberately SCATTER-based: benchmarks/probe_tablebuild.py measured the
    drop-mode unique-index .at[slot].set form fastest at BOTH flagship and
    config-4 scale (35.0 vs 39.7 ms and 104.8 vs 137.0 ms against the
    arithmetic gstart[cell]+rank gather form) — TPU table scatters of this
    shape are fine; it is elementwise *gathers* at 1e8+ elements that are
    pathological (docs/PERFORMANCE.md).
    """
    n = positions.shape[0]
    inv_cell = g / box
    coords = jnp.clip(
        jnp.floor(positions * inv_cell).astype(jnp.int32), 0, g - 1
    )
    cell_id = (coords[:, 0] * g + coords[:, 1]) * g + coords[:, 2]
    b = bin_by_key(
        cell_id, g**3, cap,
        payload=(positions[:, 0], positions[:, 1], positions[:, 2]),
    )
    sx, sy, sz = b.payload

    plane_x = scatter_to_table(b, sx, g**3, cap, 0.0, jnp.float32)
    plane_y = scatter_to_table(b, sy, g**3, cap, 0.0, jnp.float32)
    plane_z = scatter_to_table(b, sz, g**3, cap, 0.0, jnp.float32)
    ids = scatter_to_table(b, b.order, g**3, cap, n, jnp.int32)  # n == empty
    # Per original particle: its (cell, rank) for result re-ordering.
    particle_rank = jnp.zeros((n,), jnp.int32).at[b.order].set(b.rank)
    return plane_x, plane_y, plane_z, ids, cell_id, particle_rank, b.overflow


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "grid", "return_diagnostics", "with_codes", "interpret",
        "cells_per_block", "lex_carry", "codes_only", "codes_layout",
        "row_groups", "pick_batch",
    ),
)
def pallas_cell_list_knn(
    positions: jnp.ndarray,
    k: int,
    box_size,
    grid: CellGrid,
    *,
    return_diagnostics: bool = False,
    with_codes: bool = False,
    interpret: bool = False,
    cells_per_block: Optional[int] = None,
    lex_carry: Optional[bool] = None,
    codes_only: bool = False,
    codes_layout: str = "particle",
    row_groups: Optional[bool] = None,
    pick_batch: Optional[int] = None,
):
    """Exact periodic k-NN (self-query) via the fused Pallas kernel.

    ``row_groups`` (round 4, default OFF — measured negative): gate the
    per-cell selection in 8-row sublane groups on the cell's scalar
    occupancy. The Poisson common-case capacity leaves ~60% of query rows
    empty at the flagship spec, but the per-group ``pl.when`` branches
    cost more than the skipped VPU work saves on this backend (bench.py
    2.27M -> 0.98M particle-steps/s with gating on). Identical results on
    every REAL query row (pinned by test_row_groups_matches_ungrouped);
    kept opt-in for clustered-data probes where whole cells go empty.

    Args / returns match ``cell_list_knn`` (queries == positions). ``k`` must
    be <= 128 (one output lane tile) and <= candidate width.
    ``cells_per_block``/``lex_carry`` override the measured-default kernel
    shape (see the inline notes) — exposed for hardware probes only.

    ``with_codes``: additionally return ``codes [N, k]`` int32 — each
    neighbor's candidate coordinates ``j27 * cap + rank`` on this grid
    (``j27`` indexes the (dx,dy,dz) in {-1,0,1}^3 offset of the NEIGHBOR's
    cell relative to the query's, lexicographic; ``rank`` is the neighbor's
    stable-sort rank within its cell; ``cap`` is the STATIC
    ``padded_cell_capacity(grid)``). The cell-block plan build decodes
    these into sender slots with pure arithmetic — its cell sort uses the
    identical key, so ranks agree. Rows match ``neighbors`` positionally;
    missing picks (exhausted uncertified rows) duplicate the row's first
    code like ``neighbors`` duplicates its first id. Returns
    ``(neighbors, codes, spill)`` (plus diagnostics if requested).

    ``codes_only=True`` (implies ``with_codes``): the kernel tracks the
    candidate lane as its ONLY selection payload and the particle-id
    output is skipped — the same per-pick cost as the plain ids kernel
    (the dual id+code carriage costs +10 ms in-scan at the flagship spec,
    plan_parts_r3.json). The cell-block pipeline never reads neighbor
    ids, so its rollout path uses this mode. ``neighbors`` is returned as
    ``None``; exact-distance ties break by smallest lane (lexicographic
    neighbor-cell offset, then in-cell rank) instead of smallest id.

    ``codes_layout="table"`` (requires ``codes_only``): return the codes
    in the kernel's CELL-TABLE order ``[G^3 * cap, k]`` (row
    ``cell * cap + rank``) instead of gathering them back to particle
    order. The cell-block plan build bins by the IDENTICAL key, so its
    slot layout visits table rows in ascending order — consuming the
    table directly turns its per-slot codes map into one quasi-monotone
    row gather and deletes this wrapper's random ``[N, k]`` re-order
    gather (round 4). ``spill`` then carries a third element: the solved
    spill queries' code picks ``[spill_cap, k]`` (sentinel rows when no
    spill), since those rows cannot be scattered into a table the spilled
    particles have no row of.

    With codes, the extras are ``(codes, spill)``: ``spill`` is ``None``
    when the spill block is inactive, else ``(spill_cells, spill_ranks)``
    — per spill slot, the spilled particle's cell id and its stable-sort
    rank WITHIN that cell (sentinel rank ``2**20`` for unused slots).
    Spill picks emit their lane as the code (``>= 27 * cap``); the
    cell-block plan build resolves them through these tables (the rank
    agrees with its own cell sort — identical sort key). Enabling spill
    under codes keeps the kernel at the common-case capacity
    (lam + 4.5 sigma) instead of the durable Poisson quantile — at the
    flagship spec that is a [24, 768] selection tile instead of
    [32, 896] (0.64x selection work).
    """
    if codes_only:
        with_codes = True
    if codes_layout not in ("particle", "table"):
        raise ValueError(f"unknown codes_layout: {codes_layout}")
    table_codes = codes_layout == "table"
    if table_codes and not codes_only:
        raise ValueError("codes_layout='table' requires codes_only=True")
    if k > _LANE:
        raise ValueError(f"k={k} exceeds {_LANE}")
    g = grid.grid_size
    if g < 3:
        raise ValueError("grid_size must be >= 3")
    n = positions.shape[0]
    box = jnp.asarray(box_size, jnp.float32)

    # Spill bucket (round 3): durability-grade capacities (the Poisson
    # quantile over G^3 cells x every rollout frame) pay for the worst
    # cell in EVERY cell's candidate width — at the flagship spec the
    # padded capacity grows 24 -> 32 and the select kernel 8.6 -> 10.2 ms.
    # Instead, size the table for the common case (lam + 4.5 sigma) and
    # park the rare overflowing particles in a static global SPILL block
    # that rides the otherwise-dead lane padding of the candidate rows:
    # every query scans it (min-imaged in-kernel), and the spilled
    # queries themselves are solved exactly on the XLA side against their
    # own cell's candidate row. Exactness is unchanged; `overflow` then
    # counts only spill-block exhaustion. Under ``with_codes`` the spill
    # lanes' codes (``>= 27 * cap``) resolve through the returned
    # ``(spill_cells, spill_ranks)`` tables instead of arithmetic — see
    # the docstring. Disabled when the caller raised capacities above
    # the uniform default (clustered-data overrides).
    cap, num_cand, spill_cap = spill_layout(n, k, grid)

    (plane_x, plane_y, plane_z, ids, cell_id, particle_rank,
     overflow) = _build_table(positions.astype(jnp.float32), g, cap, box)

    spill_planes = {}
    if spill_cap:
        spilled = particle_rank >= cap
        spill_slot = jnp.where(
            spilled, jnp.cumsum(spilled.astype(jnp.int32)) - 1, spill_cap
        )

        def to_spill(v, fill, dtype):
            return jnp.full((spill_cap,), fill, dtype).at[spill_slot].set(
                v.astype(dtype), mode="drop"
            )

        pos_f32 = positions.astype(jnp.float32)
        spill_planes = {
            "x": to_spill(pos_f32[:, 0], 0.0, jnp.float32),
            "y": to_spill(pos_f32[:, 1], 0.0, jnp.float32),
            "z": to_spill(pos_f32[:, 2], 0.0, jnp.float32),
            "ids": to_spill(jnp.arange(n, dtype=jnp.int32), n, jnp.int32),
        }
        if with_codes:
            # Spill-code resolution tables for the cell-block plan build:
            # the spilled particle's cell and its stable-sort rank within
            # it (the plan's own cell sort uses the identical key, so the
            # rank transfers). Unused slots carry a rank past any column
            # capacity — they decode to the overflow sentinel.
            spill_planes["cell"] = to_spill(cell_id, 0, jnp.int32)
            spill_planes["rank"] = to_spill(particle_rank, 2**20, jnp.int32)
        # Only spill-block exhaustion drops candidates now.
        overflow = jnp.maximum(overflow - spill_cap, 0)

    def gather_cands(plane, fill, shift_dim=None, spill=None):
        # 27-neighborhood expansion WITHOUT gathers: the neighbor cells of
        # every cell at offset (dx,dy,dz) are a periodic roll of the 3-D
        # cell table — rolls are cheap contiguous memory ops, whereas a
        # [G^3, 27] row gather is pathologically slow to compile/run on the
        # TPU backend.
        #
        # With ``shift_dim`` (coordinate planes), rows that wrapped around
        # the periodic boundary during the roll get their coordinate
        # pre-shifted by +-box: the roll by -d along axis a puts cell
        # (i + d) mod g at index i, which wrapped iff i == g-1 (d=+1,
        # shift +box) or i == 0 (d=-1, shift -box). The kernel then takes
        # plain differences — no per-element min-image.
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
            if spill is not None:
                # The lane padding IS the spill block: every cell's row
                # carries the same global spill candidates (absolute
                # coordinates; the kernel min-images these lanes).
                rows = jnp.concatenate(
                    [rows, jnp.broadcast_to(spill[None, :], (g**3, pad))],
                    axis=-1,
                )
            else:
                rows = jnp.pad(
                    rows, ((0, 0), (0, pad)), constant_values=fill
                )
        return rows

    cand_x = gather_cands(plane_x, 0.0, shift_dim=0, spill=spill_planes.get("x"))
    cand_y = gather_cands(plane_y, 0.0, shift_dim=1, spill=spill_planes.get("y"))
    cand_z = gather_cands(plane_z, 0.0, shift_dim=2, spill=spill_planes.get("z"))
    cand_ids = gather_cands(ids, n, spill=spill_planes.get("ids"))

    # Round-3 A/B sweeps (benchmarks/results/knn_ab_r3.json,
    # knn_kernel_r3.json) pinned both defaults:
    # * cells_per_block = 8: SMALL blocks win (masked selection measured
    #   10.2 / 15.3 / 23.5 ms at 8 / 16 / 32 cells per block at the
    #   flagship spec) — pipeline overlap of the per-block candidate DMAs
    #   beats per-block fixed overhead. 8 is also the sublane floor for
    #   the [cpb, cap] query blocks, and keeps fat clustered-data
    #   capacities inside the 16 MB scoped-VMEM limit (a [120, 3328] spec
    #   with one extra live tile per unrolled cell allocates 16.78 MB and
    #   is rejected — Mosaic's stack allocator does not share the
    #   selection temporaries across unrolled cells).
    # * lex_carry = False: in-place masked re-min beats the write-free
    #   lexicographic-threshold carry (per-pick 0.40 vs 1.38 ms — the
    #   threshold predicate's broadcast compares cost more than the masked
    #   store). Both knobs stay exposed for future hardware probes.
    if lex_carry is None:
        lex_carry = False
    if cells_per_block is None:
        cells_per_block = 8
    if row_groups is None:
        # Measured NEGATIVE at the flagship spec despite cutting ~44% of
        # the selection's VPU work: bench.py dropped 2.27M -> 0.98M
        # particle-steps/s with gating on (round 4) — the per-group
        # pl.when branches serialize Mosaic's pipeline far more than the
        # skipped work saves. Kept opt-in for clustered data probes.
        row_groups = False
    if pick_batch is None:
        pick_batch = 1
    if pick_batch < 1 or (pick_batch > 1 and not codes_only):
        # Batched picks are wired for the codes-only selection (the
        # flagship rollout path); the ids/lex selections keep the round-3
        # loops.
        raise ValueError(
            f"pick_batch={pick_batch} requires codes_only=True"
        )
    # Per-cell table occupancy (<= cap; overflow spills). Drives the
    # row-group gating — cells' empty sublane groups are skipped.
    occ = jnp.sum((ids < n).astype(jnp.int32), axis=1)
    num_cells = g**3
    pad_cells = (-num_cells) % cells_per_block
    if pad_cells:
        def padc(x, fill=0):
            return jnp.pad(x, ((0, pad_cells), (0, 0)), constant_values=fill)
        plane_x, plane_y, plane_z = padc(plane_x), padc(plane_y), padc(plane_z)
        cand_x, cand_y, cand_z = padc(cand_x), padc(cand_y), padc(cand_z)
        cand_ids = padc(cand_ids, n)
        occ = jnp.pad(occ, (0, pad_cells))
    num_blocks = (num_cells + pad_cells) // cells_per_block

    q_spec = pl.BlockSpec(
        (cells_per_block, cap), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    c_spec = pl.BlockSpec(
        (cells_per_block, num_cand), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    lane_spec = pl.BlockSpec(
        (cells_per_block, cap, _LANE),
        lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kth_spec = pl.BlockSpec(
        (cells_per_block, cap),
        lambda i: (i, 0),
        memory_space=pltpu.VMEM,
    )
    lane_shape = jax.ShapeDtypeStruct(
        (num_blocks * cells_per_block, cap, _LANE), jnp.int32
    )
    kth_shape = jax.ShapeDtypeStruct(
        (num_blocks * cells_per_block, cap), jnp.float32
    )
    if codes_only:
        # [codes, kth] — no particle-id output at all.
        out_block_specs = [lane_spec, kth_spec]
        out_shapes = [lane_shape, kth_shape]
    else:
        out_block_specs = [lane_spec, kth_spec]
        out_shapes = [lane_shape, kth_shape]
        if with_codes:
            out_block_specs.append(lane_spec)
            out_shapes.append(lane_shape)
    # Min-image region: the trailing lane tiles that contain spill lanes
    # (128-aligned; may include a few real candidate lanes — exact either
    # way, see the kernel note).
    mi_lanes = num_cand - (27 * cap) // _LANE * _LANE if spill_cap else 0
    results = pl.pallas_call(
        _select_kernel(k, cells_per_block, cap, num_cand, with_codes,
                       lex_carry=lex_carry, mi_lanes=mi_lanes,
                       codes_only=codes_only, row_groups=row_groups,
                       pick_batch=pick_batch),
        grid=(num_blocks,),
        in_specs=[q_spec, q_spec, q_spec, c_spec, c_spec, c_spec, c_spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=tuple(out_block_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(plane_x, plane_y, plane_z, cand_x, cand_y, cand_z, cand_ids,
      jnp.asarray([n], jnp.int32), jnp.asarray([box], jnp.float32),
      occ.astype(jnp.int32))

    # Back to original particle order via (cell, rank). Overflowed particles
    # (rank >= cap: cell held more than `cap` particles) have no query slot
    # of their own — clamp them to the last slot of their OWN cell (under
    # the spill design their rows are then OVERWRITTEN with the exact
    # XLA-side solve below; without spill the `overflow` diagnostic makes
    # the approximation loud).
    table_row = cell_id * cap + jnp.minimum(particle_rank, cap - 1)

    # Lanes below this are real candidates (ring + spill block); at or
    # above is the kernel's exhausted-pick sentinel.
    valid_lanes = 27 * cap + spill_cap
    codes = None
    if codes_only:
        codes_tbl, kth_d2 = results[0], results[1]
        codes = codes_tbl[:num_cells, :, :k].reshape(-1, k)
        if not table_codes:
            codes = codes[table_row]
        # Exhausted picks carry the num_cand lane sentinel; duplicate the
        # row's first code like the ids path duplicates its first id. The
        # kth output keeps _BIG, so the certificate still fails loudly on
        # such rows. (Table layout: empty table slots keep all-sentinel
        # rows — the plan build masks them by its own slot-occupancy map.)
        missing = codes >= valid_lanes
        codes = jnp.where(missing, codes[:, :1], codes)
        out = None
    else:
        picked, kth_d2 = results[0], results[1]
        neighbor_ids = picked[:num_cells, :, :k]  # [G^3, cap, k]
        out = neighbor_ids.reshape(-1, k)[table_row]  # [N, k]

        # Rows with fewer than k valid candidates carry the sentinel id n
        # (see _select_kernel); a downstream take would clamp it to particle
        # N-1 — an arbitrary far particle. Clamp to the row's own nearest
        # pick instead (self: a benign duplicate edge). Exhausted rows keep
        # k-th distance _BIG in the kernel's kth output, so the exactness
        # certificate still fails loudly.
        missing = out == n
        out = jnp.where(missing, out[:, :1], out)
        if with_codes:
            codes = results[2][:num_cells, :, :k].reshape(-1, k)[table_row]
            # Mirror the id clamping: missing picks duplicate the row's
            # first code, keeping codes positionally consistent with
            # `neighbors`.
            codes = jnp.where(missing, codes[:, :1], codes)

    spill_kth = spill_valid = None
    if spill_cap:
        # Exact kNN for the spilled queries: their candidate set is their
        # OWN cell's already-materialized candidate row (the full 27-ring
        # plus the spill block — the identical set a table slot in that
        # cell scans), so the window-margin certificate applies unchanged.
        # Tiny static shapes: [spill_cap, num_cand]. The whole solve (row
        # gathers + [spill_cap, num_cand] sort + scatters) rides a real
        # lax.cond: frames with NO spilled particles — the typical case at
        # the common-case capacity — skip it entirely (it measured ~1 ms
        # per rollout step when unconditional).
        sp_pos = jnp.stack(
            [spill_planes["x"], spill_planes["y"], spill_planes["z"]],
            axis=1,
        )
        spill_valid = spill_planes["ids"] != n
        sp_scatter = jnp.where(spill_valid, spill_planes["ids"], n)

        def _spill_solve(carry):
            out_c, codes_c = carry
            spc = jnp.clip(
                jnp.floor(sp_pos * (g / box)).astype(jnp.int32), 0, g - 1
            )
            sp_cell = (spc[:, 0] * g + spc[:, 1]) * g + spc[:, 2]
            d2s = jnp.zeros((spill_cap, num_cand), jnp.float32)
            for dim, cand in enumerate((cand_x, cand_y, cand_z)):
                rows = cand[sp_cell]
                # Min-image ALL lanes: min-image of a +-box pre-shifted
                # displacement is the true periodic displacement, so this
                # is exact for ring lanes and required for spill lanes.
                dd = min_image_displacement(
                    sp_pos[:, dim:dim + 1] - rows, box
                )
                d2s = d2s + dd * dd
            sp_ids = cand_ids[sp_cell]
            d2s = jnp.where(sp_ids >= n, _BIG, d2s)
            if with_codes:
                # The spilled query's candidate row is its own cell's —
                # its picks' LANES are valid codes relative to its own
                # cell, the same frame the plan-build decode expects.
                lanes = jnp.broadcast_to(
                    jnp.arange(num_cand, dtype=jnp.int32)[None, :],
                    (spill_cap, num_cand),
                )
                if codes_only:
                    # Lane-lexicographic tie-break, matching the codes
                    # kernel.
                    d2_sorted, lane_sorted = jax.lax.sort(
                        (d2s, lanes), dimension=1, num_keys=2
                    )
                    ids_sorted = None
                else:
                    # (d2, id) keys — min-id tie-break like the ids kernel
                    # — with the lane riding as payload.
                    d2_sorted, ids_sorted, lane_sorted = jax.lax.sort(
                        (d2s, sp_ids, lanes), dimension=1, num_keys=2
                    )
                kth = d2_sorted[:, k - 1]
                sp_miss = d2_sorted[:, :k] >= _BIG * 0.5
                code_picks = jnp.where(
                    sp_miss, lane_sorted[:, :1], lane_sorted[:, :k]
                )
                if table_codes:
                    # Spilled particles have no table row: hand their
                    # solved picks back as a separate [spill_cap, k] block
                    # (the codes carry IS that buffer in table mode); the
                    # plan build scatters them into the slots it computes
                    # for the spill (cell, rank) pairs.
                    codes_c = code_picks
                else:
                    codes_c = codes_c.at[sp_scatter].set(
                        code_picks, mode="drop"
                    )
                if not codes_only:
                    picks = jnp.where(sp_miss, ids_sorted[:, :1],
                                      ids_sorted[:, :k])
                    picks = jnp.where(picks == n, 0, picks)
                    out_c = out_c.at[sp_scatter].set(picks, mode="drop")
            else:
                # Exact (d2, id)-lexicographic ascending selection — the
                # same min-id tie-break as the kernel.
                d2_sorted, ids_sorted = jax.lax.sort(
                    (d2s, sp_ids), dimension=1, num_keys=2
                )
                picks = ids_sorted[:, :k]
                kth = d2_sorted[:, k - 1]
                picks = jnp.where(picks == n, picks[:, :1], picks)
                picks = jnp.where(picks == n, 0, picks)
                out_c = out_c.at[sp_scatter].set(picks, mode="drop")
            return out_c, codes_c, kth

        def _spill_skip(carry):
            out_c, codes_c = carry
            # spill_valid is all-False here, so every downstream consumer
            # of spill_kth masks these zeros out.
            return out_c, codes_c, jnp.zeros((spill_cap,), jnp.float32)

        _dummy = jnp.zeros((1, 1), jnp.int32)
        spill_picks = None
        if table_codes:
            # The codes carry is the spill-picks buffer (sentinel-filled
            # when the solve is skipped); the table-layout codes array is
            # untouched by the spill solve.
            codes_carry = jnp.full((spill_cap, k), num_cand, jnp.int32)
        else:
            codes_carry = codes if codes is not None else _dummy
        out_r, codes_r, spill_kth = jax.lax.cond(
            jnp.any(spill_valid), _spill_solve, _spill_skip,
            (out if out is not None else _dummy, codes_carry),
        )
        if out is not None:
            out = out_r
        if table_codes:
            spill_picks = codes_r
        elif codes is not None:
            codes = codes_r

    extras = ()
    if with_codes:
        if not spill_cap:
            spill_info = None
        elif table_codes:
            spill_info = (
                spill_planes["cell"], spill_planes["rank"], spill_picks
            )
        else:
            spill_info = (spill_planes["cell"], spill_planes["rank"])
        extras = (codes, spill_info)

    if return_diagnostics:
        # The kernel emits each query row's k-th smallest distance directly
        # (free — the selection loop computes it anyway). Mask empty slots
        # via the id table; overflowed particles share their clamped slot's
        # row, which is covered by the overflow count.
        valid_slot = ids.reshape(-1) != n
        kth = kth_d2[:num_cells].reshape(-1)
        max_d2 = jnp.max(jnp.where(valid_slot, kth, 0.0))
        # Per-slot window margin (see cell_list.window_margin_sq): the slot's
        # cell coords come from its table index, its coordinate from the
        # planes — exactly the binning the kernel searched, so the per-query
        # certificate max(d_k^2 - margin^2) <= 0 is sound by construction.
        edge = box / g
        cell = jnp.arange(num_cells * cap, dtype=jnp.int32) // cap
        sx = plane_x[:num_cells].reshape(-1)
        sy = plane_y[:num_cells].reshape(-1)
        sz = plane_z[:num_cells].reshape(-1)
        fx = sx - (cell // (g * g)).astype(jnp.float32) * edge
        fy = sy - ((cell // g) % g).astype(jnp.float32) * edge
        fz = sz - (cell % g).astype(jnp.float32) * edge
        m = edge + jnp.minimum(
            jnp.minimum(jnp.minimum(fx, edge - fx), jnp.minimum(fy, edge - fy)),
            jnp.minimum(fz, edge - fz),
        )
        max_excess = jnp.max(jnp.where(valid_slot, kth - m * m, -_BIG))
        if spill_cap:
            # Fold the spilled queries into both certificate reductions
            # (their kth comes from the exact XLA-side solve; margins from
            # their own positions).
            sp_margin = window_margin_sq(sp_pos, box, grid)
            sp_excess = jnp.where(
                spill_valid, spill_kth - sp_margin, -_BIG
            )
            max_d2 = jnp.maximum(
                max_d2,
                jnp.max(jnp.where(spill_valid, spill_kth, 0.0)),
            )
            max_excess = jnp.maximum(max_excess, jnp.max(sp_excess))
        return (out, *extras, (overflow, max_d2, max_excess))
    return (out, *extras) if extras else out
