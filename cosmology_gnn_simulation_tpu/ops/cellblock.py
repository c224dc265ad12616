"""Cell-block neighbor aggregation: selection-matrix matmuls on the MXU
instead of HBM row gathers.

The aggregation ``agg[i] = sum_j z[neighbors[i, j]]`` is the hot op of the
pruned sender-latents message-passing step (SURVEY.md C11/C12; reference
counterpart: the torch_scatter segment-add inside PyG's ``propagate``,
``/root/reference/graph_network.py:79,92``). At BASELINE config 4
(N=500k, k=32, H=256) the XLA row-gather form runs at ~91 Mrows/s —
latency-bound at ~1/8 of HBM bandwidth, ~176 ms per message-passing step.

This module re-expresses the aggregation as dense matmuls over a periodic
cell decomposition:

* particles are binned into a ``G^3`` grid (``C`` slots per cell) and the
  model state is kept in **cell-sorted order** so slot<->particle maps are
  monotone (fast contiguous-row gathers);
* a 0/1 **selection matrix** ``S`` is built ONCE per graph (amortized over
  all message-passing steps): row = query slot, column = candidate slot in
  the query's 3x3 column x (BLK+2)-cell z-window; ``S[q, c]`` counts how
  often candidate ``c`` appears in query ``q``'s neighbor list;
* per step, a Pallas kernel computes ``out = S @ z_window`` per cell block:
  the 9 neighbor columns are VMEM-resident (streamed once per column sweep
  thanks to z-innermost grid order), and the data-dependent neighbor
  structure rides the MXU as int8->bf16 matmuls — no per-row HBM gathers.

Exactness: identical to gather+sum (in exact arithmetic) whenever
(a) no cell holds more than ``C`` particles and (b) every neighbor lies
within one cell of its receiver — exactly the cell-list exactness
certificate (``d_k <= cell edge``), checked on the aggregation grid via the
``dropped_edges``/``overflow`` diagnostics (never silent).

Round-3 design note — per-column compaction (the measured ~2.8x slot
padding at config 4 multiplies S size, matmul FLOPs, column traffic and
the slot-space MLP rows; the kernel is DMA-bound at ~500-600 GB/s):

* bin particles per (gx, gy) COLUMN with a per-column capacity
  (~mean + 5*sqrt(mean), ~1.2x padding) instead of per-cell slots; keep
  within-column cell order. Per-(column, cell) start offsets from the
  sorted keys (searchsorted, as here).
* query block = the occupants of BLK consecutive cells of one column
  (static row cap); candidate window per neighbor column j = a CONTIGUOUS
  row range [start(j, zb*BLK-1), +W_cap) of j's compact array, where
  W_cap ~ (BLK+2)*mean + tail, padded to a lane multiple.
* kernel uses pltpu.PrefetchScalarGridSpec: the per-(column, zb) window
  starts ride as scalar-prefetch operands and the column inputs use
  element-offset indexing; z-wrap is covered by 9 extra fixed-size
  first/last-cell segments (used only by the first/last z-blocks, zero S
  elsewhere).
* S build: local index = j * W_cap + (compact_idx - start_j) — the same
  two-factor one-hot contraction over (column one-hot [9], offset one-hot
  [W_cap]).
Projected: S ~2 GB, ~1 TF, ~12 ms/step at config 4 (vs 43 ms), and the
slot-space MLP/LN rows shrink 2.3x.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosmology_gnn_simulation_tpu.ops.binning import bin_by_key

_LANE = 128


class CellBlockSpec(NamedTuple):
    """Static cell-block configuration (python ints — part of the jit key).

    Constraints (asserted by ``validate``):
      * ``grid_size % z_block == 0`` (query blocks tile z exactly);
      * ``(z_block + 2) * capacity % 128 == 0`` (per-column selection slices
        are lane-aligned — no padding waste in the matmul K dimension);
      * ``z_block + 2 <= grid_size`` (a window never self-overlaps).
    """

    grid_size: int  # G: cells per box edge
    capacity: int  # C: slots per cell
    z_block: int  # BLK: query cells per block along z
    h_block: int = 256  # latent tile per kernel pass (min(h_block, H) used)

    @property
    def num_columns(self) -> int:
        return self.grid_size**2

    @property
    def num_zblocks(self) -> int:
        return self.grid_size // self.z_block

    @property
    def num_slots(self) -> int:
        return self.grid_size**3 * self.capacity

    @property
    def window_cells(self) -> int:
        return self.z_block + 2

    @property
    def kc(self) -> int:  # K-dim contributed by one neighbor column
        return self.window_cells * self.capacity

    @property
    def rows_per_block(self) -> int:
        return self.z_block * self.capacity

    def validate(self) -> None:
        g, c, blk = self.grid_size, self.capacity, self.z_block
        if g % blk != 0:
            raise ValueError(f"grid_size {g} not a multiple of z_block {blk}")
        if (blk + 2) * c % _LANE != 0:
            raise ValueError(
                f"(z_block+2)*capacity = {(blk + 2) * c} not a multiple of 128"
            )
        if blk + 2 > g:
            raise ValueError(f"z_block+2 = {blk + 2} exceeds grid_size {g}")
        if self.rows_per_block % 8 != 0:
            raise ValueError("z_block*capacity must be a multiple of 8")


def _poisson_overflow_cells(mean: float, capacity: int, num_cells: int):
    """Expected number of cells whose Poisson(mean) occupancy exceeds
    ``capacity`` (stable log-space evaluation, plain Python floats)."""
    import math

    log_pmf = -mean  # k = 0
    cdf = math.exp(log_pmf)
    for k in range(1, capacity + 1):
        log_pmf += math.log(mean) - math.log(k)
        cdf += math.exp(log_pmf)
    return num_cells * max(0.0, 1.0 - cdf)


def choose_cellblock_spec(
    num_particles: int,
    *,
    max_expected_overflow: float = 0.05,
    h_block: int = 256,
) -> CellBlockSpec:
    """Pick (G, C, BLK) for a roughly uniform distribution.

    C is fixed at 64 and BLK at 4 (so the per-column K slice is exactly
    3 x 128 lanes and M = 256 rows); G is the smallest multiple of 4 whose
    expected number of overflowing cells (exact Poisson tail at mean
    occupancy ``N/G^3``) is under ``max_expected_overflow``. Coarser is
    better — fewer empty slots means a smaller S table and fewer wasted
    FLOPs. Clustered data needs more headroom — the ``overflow``
    diagnostic makes violations loud.
    """
    c, blk = 64, 4
    g = blk
    while True:
        g_next = g + blk
        m = num_particles / g_next**3
        if (
            m < c
            and _poisson_overflow_cells(m, c, g_next**3)
            <= max_expected_overflow
        ):
            return CellBlockSpec(g_next, c, blk, h_block)
        g = g_next


class CellBlockGraph(NamedTuple):
    """Per-graph cell-block plan (pytree of arrays; spec carried separately).

    All particle indexing below is in **cell-sorted order** (the caller
    permutes the model state by ``order`` once per graph).

    Attributes:
      order:          ``[N]`` int32 — sort permutation; ``x_sorted = x[order]``.
      slot_of_sorted: ``[N]`` int32 — ascending query-slot id per sorted
                      particle (sentinel ``num_slots`` for overflow).
      particle_of_slot: ``[num_slots]`` int32 — slot -> sorted particle
                      index (sentinel ``N`` for empty slots).
      s_table:        ``[num_slots, 9 * kc]`` int8 — selection matrices.
      overflow:       scalar int32 — particles beyond C in their cell.
      dropped_edges:  scalar int32 — edges S cannot represent despite the
                      receiver having a row: sender outside the receiver's
                      3^3-cell window, or sender dropped by cell overflow
                      (certificate breach either way). Edges whose RECEIVER
                      overflowed are accounted by ``overflow`` instead.
    """

    order: jnp.ndarray
    slot_of_sorted: jnp.ndarray
    particle_of_slot: jnp.ndarray
    s_table: jnp.ndarray
    overflow: jnp.ndarray
    dropped_edges: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("spec",))
def build_cellblock(
    positions: jnp.ndarray,
    neighbors: jnp.ndarray,
    box_size,
    spec: CellBlockSpec,
) -> CellBlockGraph:
    """Build the per-graph plan: binning, sort order, and the S table.

    ``positions``/``neighbors`` are in ORIGINAL particle order (as produced
    by the k-NN backends); the returned plan's ``order`` defines the sorted
    order everything else uses.

    TPU note: everything here is sorts, merges, contiguous ops, row gathers
    and MXU contractions — elementwise scatters (60+ ms for a [500k] -> [1.4M]
    int table at config 4) are deliberately absent.
    """
    spec.validate()
    g, c, blk = spec.grid_size, spec.capacity, spec.z_block
    n = positions.shape[0]
    k = neighbors.shape[1]
    if k > 127:
        raise ValueError(
            f"k={k} exceeds 127 — S-table entries are int8 multiplicity "
            "counts (an all-duplicate row could overflow)"
        )
    num_cells = g**3
    num_slots = spec.num_slots

    inv_cell = g / jnp.asarray(box_size, positions.dtype)
    coords = jnp.clip(
        jnp.floor(positions * inv_cell).astype(jnp.int32), 0, g - 1
    )
    cell_id = (coords[:, 0] * g + coords[:, 1]) * g + coords[:, 2]
    b = bin_by_key(cell_id, num_cells, c)

    # slot ids for sorted particles are ascending by construction.
    slot_of_sorted = b.slot.astype(jnp.int32)
    # original particle -> slot: invert the sort permutation by sorting
    # (order, slot) pairs by original index — a scatter-free inverse.
    _, slot_of_particle = jax.lax.sort_key_val(
        b.order.astype(jnp.int32), slot_of_sorted
    )
    # slot -> sorted particle: boundaries of the (ascending, injective)
    # slot_of_sorted stream under a sorted-merge searchsorted; a slot is
    # occupied iff its boundary strictly advances. No gathers, no scatters.
    boundaries = jnp.searchsorted(
        slot_of_sorted,
        jnp.arange(num_slots + 1, dtype=jnp.int32),
        side="left",
        method="sort",
    ).astype(jnp.int32)
    occupied = boundaries[1:] > boundaries[:-1]
    particle_of_slot = jnp.where(occupied, boundaries[:-1], n)

    # Neighbor slots per sorted particle: map neighbor ids (original order)
    # through slot_of_particle, rows arranged by the receiver's sorted
    # position. The S rows are computed on this COMPACT stream (N rows,
    # ~1/2.8 of the slot count at config 4) and spread to slot rows with a
    # single wide row gather — empty slots pull the appended zero row.
    nbr_slot = jnp.take(
        slot_of_particle, neighbors, axis=0, mode="clip"
    )  # [N(orig), k]
    nbr_slot_sorted = jnp.take(nbr_slot, b.order, axis=0)  # rows sorted

    s_compact, dropped = _build_s_table(
        nbr_slot_sorted, spec, query_slots=slot_of_sorted
    )
    s_ext = jnp.concatenate(
        [s_compact, jnp.zeros((1, s_compact.shape[1]), jnp.int8)]
    )
    s_table = jnp.take(s_ext, particle_of_slot, axis=0, mode="clip")
    return CellBlockGraph(
        order=b.order.astype(jnp.int32),
        slot_of_sorted=slot_of_sorted,
        particle_of_slot=particle_of_slot,
        s_table=s_table,
        overflow=b.overflow.astype(jnp.int32),
        dropped_edges=dropped,
    )


def expand_to_slots(
    x_sorted: jnp.ndarray, plan: CellBlockGraph, dtype=None
) -> jnp.ndarray:
    """``[N, F]`` (cell-sorted rows) -> ``[num_slots, F]`` slot table.

    Empty slots get zero rows. Monotone row gather (the index stream is
    sorted), so it runs far faster than a scatter."""
    if dtype is not None:
        x_sorted = x_sorted.astype(dtype)
    x_ext = jnp.concatenate(
        [x_sorted, jnp.zeros((1, x_sorted.shape[1]), x_sorted.dtype)]
    )
    return jnp.take(x_ext, plan.particle_of_slot, axis=0, mode="clip")


def compact_from_slots(
    x_slots: jnp.ndarray, plan: CellBlockGraph
) -> jnp.ndarray:
    """``[num_slots, F]`` -> ``[N, F]`` cell-sorted rows (monotone gather;
    overflow sentinel slots clamp — flagged by ``plan.overflow``)."""
    return jnp.take(x_slots, plan.slot_of_sorted, axis=0, mode="clip")


def _local_indices(
    nbr_table: jnp.ndarray, spec: CellBlockSpec, query_slots=None
):
    """Decompose neighbor slot ids into (window-cell, slot) local coords.

    ``nbr_table`` rows correspond to query slots ``query_slots`` (default:
    ``arange(rows)`` — one row per slot). Returns ``czw`` in
    [0, 9*(BLK+2)) (or -1 if invalid), ``sl`` in [0, C), and the count of
    edges not representable in S: real-sender-out-of-window plus
    sender-overflowed-its-cell (sentinel slot). Rows whose QUERY slot is the
    overflow sentinel are masked out of both S and the dropped count — the
    receiving particle has no S row at all; those edges are covered by the
    separate ``overflow`` diagnostic.
    """
    g, c, blk = spec.grid_size, spec.capacity, spec.z_block
    num_slots = spec.num_slots
    rows = nbr_table.shape[0]

    if query_slots is None:
        query_slots = jnp.arange(rows, dtype=jnp.int32)
    q = query_slots.astype(jnp.int32)[:, None]  # query slot ids
    q_cell = q // c
    q_col, q_cz = q_cell // g, q_cell % g
    q_gx, q_gy = q_col // g, q_col % g
    zb0 = (q_cz // blk) * blk  # first z-cell of the query's block

    s = nbr_table
    s_cell = s // c
    sl = s % c
    s_col, s_cz = s_cell // g, s_cell % g
    s_gx, s_gy = s_col // g, s_col % g

    dx = (s_gx - q_gx + 1 + g) % g
    dy = (s_gy - q_gy + 1 + g) % g
    w = (s_cz - zb0 + 1 + g) % g
    q_ok = q < num_slots  # receiver overflowed its cell -> no S row exists
    is_real = s < num_slots
    sender_overflowed = s == num_slots  # sentinel from slot_of_particle
    in_window = (dx < 3) & (dy < 3) & (w < blk + 2)
    valid = q_ok & is_real & in_window
    czw = jnp.where(valid, (dx * 3 + dy) * (blk + 2) + w, -1)
    # Edges S cannot represent even though the receiver has a row: sender
    # outside the 3x3x(BLK+2) window, or sender dropped by cell overflow.
    dropped = jnp.sum(
        q_ok & ((is_real & ~in_window) | sender_overflowed)
    ).astype(jnp.int32)
    return czw, sl, valid, dropped


# Row-tile length for the chunked S build: bounds the bf16 one-hot factors
# and the f32 contraction output to ~hundreds of MB (the full [slots, 9*kc]
# f32 intermediate would be ~19 GB at BASELINE config 4).
_S_BUILD_TILE = 32768


def _build_s_table(
    nbr_table: jnp.ndarray, spec: CellBlockSpec, query_slots=None
):
    """S[q, czw * C + sl] = multiplicity of that candidate in q's neighbor
    list — via two one-hot factors contracted on the MXU (a direct
    scatter-add over N*k elements is pathologically slow on TPU), chunked
    over row tiles so only the int8 result is ever resident in full."""
    c = spec.capacity
    nwin = 9 * spec.window_cells
    czw, sl, valid, dropped = _local_indices(nbr_table, spec, query_slots)

    def tile_s(args):
        czw_t, sl_t, valid_t = args
        oh_czw = (
            czw_t[:, :, None] == jnp.arange(nwin, dtype=jnp.int32)
        ).astype(jnp.bfloat16)  # [tile, k, nwin]
        oh_sl = jnp.where(valid_t[:, :, None], 1.0, 0.0).astype(
            jnp.bfloat16
        ) * (
            sl_t[:, :, None] == jnp.arange(c, dtype=jnp.int32)
        ).astype(jnp.bfloat16)  # [tile, k, C]
        s = jax.lax.dot_general(
            oh_czw,
            oh_sl,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [tile, nwin, C]
        return s.reshape(s.shape[0], nwin * c).astype(jnp.int8)

    rows = nbr_table.shape[0]
    tile = min(_S_BUILD_TILE, rows)
    if rows % tile:
        pad = tile - rows % tile
        czw = jnp.pad(czw, ((0, pad), (0, 0)), constant_values=-1)
        sl = jnp.pad(sl, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad), (0, 0)))
    num_tiles = czw.shape[0] // tile
    s = jax.lax.map(
        tile_s,
        (
            czw.reshape(num_tiles, tile, -1),
            sl.reshape(num_tiles, tile, -1),
            valid.reshape(num_tiles, tile, -1),
        ),
    ).reshape(num_tiles * tile, nwin * c)[:rows]
    return s, dropped


def _agg_kernel(spec: CellBlockSpec, out_dtype):
    blk_c = spec.rows_per_block
    kc = spec.kc
    blk, c = spec.z_block, spec.capacity

    def kernel(s_ref, *col_refs_and_out):
        col_refs = col_refs_and_out[:9]
        out_ref = col_refs_and_out[9]
        zb = pl.program_id(2)
        acc = jnp.zeros((blk_c, out_ref.shape[-1]), jnp.float32)
        for j in range(9):
            cand = col_refs[j][0, pl.ds(zb * blk * c, kc), :]  # [kc, hb]
            sj = s_ref[:, j * kc : (j + 1) * kc].astype(cand.dtype)
            acc += jnp.dot(
                sj, cand, preferred_element_type=jnp.float32
            )
        out_ref[:] = acc.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("spec", "out_dtype", "carry_dtype", "interpret")
)
def cellblock_aggregate_slots(
    z_slots: jnp.ndarray,
    plan: CellBlockGraph,
    spec: CellBlockSpec,
    *,
    out_dtype=jnp.float32,
    carry_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Slot-space aggregation: ``out[slot q] = sum over q's neighbor slots``.

    ``z_slots`` is ``[num_slots, H]`` (empty-slot rows may hold garbage —
    the selection matrices never reference them). The hot path of the
    slot-space forward: the only per-step data prep is a contiguous
    z-wrap pad (one copy), not a gather.

    ``carry_dtype`` is the precision of the candidate table inside the
    kernel (accumulation is always f32 on the MXU); bf16 halves VMEM and
    HBM traffic, f32 makes the op exact up to summation order.
    ``interpret=None``: auto — compiled on TPU, interpreter elsewhere
    (CPU tests and the virtual multi-device mesh).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec.validate()
    g, c, blk = spec.grid_size, spec.capacity, spec.z_block
    num_slots, h = z_slots.shape
    if num_slots != spec.num_slots:
        raise ValueError(
            f"z_slots rows {num_slots} != spec.num_slots {spec.num_slots}"
        )
    hb = min(spec.h_block, h)
    if h % hb != 0:
        raise ValueError(f"H={h} not a multiple of h_block={hb}")

    # Periodic z-pad: one contiguous copy (no gathers).
    z5 = z_slots.astype(carry_dtype).reshape(g * g, g, c * h)
    z_pad = jnp.concatenate(
        [z5[:, -1:], z5, z5[:, :1]], axis=1
    ).reshape(g * g, (g + 2) * c, h)

    grid = (h // hb, g * g, spec.num_zblocks)
    nzb = spec.num_zblocks

    def col_spec(dx, dy):
        def index_map(hi, b, zb):
            gx, gy = b // g, b % g
            return ((gx + dx - 1) % g) * g + (gy + dy - 1) % g, 0, hi

        # Single-buffered: the columns change only once per z sweep (the
        # index map ignores zb), so the transition stall is ~1/nzb-th of a
        # column fetch per step — and halving their VMEM lets the whole H
        # ride in one pass (h_block=256 needs ~19 MB double-buffered vs the
        # 16 MB VMEM budget).
        return pl.BlockSpec(
            (1, (g + 2) * c, hb), index_map, memory_space=pltpu.VMEM,
            pipeline_mode=pl.Buffered(buffer_count=1),
        )

    # (Deeper buffering and lookahead are unsupported by this Mosaic
    # version — Buffered(3) and use_lookahead both raise at lowering.)
    s_spec = pl.BlockSpec(
        (spec.rows_per_block, 9 * spec.kc),
        lambda hi, b, zb: (b * nzb + zb, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (spec.rows_per_block, hb),
        lambda hi, b, zb: (b * nzb + zb, hi),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _agg_kernel(spec, out_dtype),
        grid=grid,
        in_specs=[s_spec] + [
            col_spec(dx, dy) for dx in (0, 1, 2) for dy in (0, 1, 2)
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((num_slots, h), out_dtype),
        interpret=interpret,
    )(plan.s_table, *([z_pad] * 9))


@functools.partial(
    jax.jit, static_argnames=("spec", "out_dtype", "carry_dtype", "interpret")
)
def cellblock_aggregate(
    z_sorted: jnp.ndarray,
    plan: CellBlockGraph,
    spec: CellBlockSpec,
    *,
    out_dtype=jnp.float32,
    carry_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``agg[i] = sum_j z[neighbors[i, j]]`` for cell-sorted ``[N, H]`` rows.

    Convenience wrapper: expand -> slot-space kernel -> compact. The
    slot-space forward (``models/encode_process_decode.py``) skips the
    per-step expand/compact by carrying latents in slot space throughout.
    """
    z_slots = expand_to_slots(z_sorted, plan, dtype=carry_dtype)
    out = cellblock_aggregate_slots(
        z_slots, plan, spec,
        out_dtype=out_dtype, carry_dtype=carry_dtype, interpret=interpret,
    )
    # Compact back to sorted-particle rows (monotone gather; overflow
    # sentinel clamps — flagged by plan.overflow, never silent).
    return compact_from_slots(out, plan)


def reference_cellblock_aggregate(
    z_sorted: jnp.ndarray,
    neighbors_sorted: jnp.ndarray,
) -> jnp.ndarray:
    """Oracle: plain gather+sum over a sorted-order neighbor table."""
    return jnp.take(z_sorted, neighbors_sorted, axis=0).sum(axis=1)


def sort_neighbors(
    neighbors: jnp.ndarray, order: jnp.ndarray
) -> jnp.ndarray:
    """Re-index a neighbor table from original to sorted particle ids:
    rows permuted by ``order``, values mapped through the inverse."""
    n = neighbors.shape[0]
    inv = (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
    return jnp.take(inv, jnp.take(neighbors, order, axis=0), axis=0)
