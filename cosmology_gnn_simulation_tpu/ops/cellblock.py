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
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosmology_gnn_simulation_tpu.ops.binning import bin_by_key, scatter_to_table

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
    h_block: int = 128  # latent tile per kernel pass

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


def choose_cellblock_spec(
    num_particles: int,
    *,
    tail_sigmas: float = 5.0,
    h_block: int = 128,
) -> CellBlockSpec:
    """Pick (G, C, BLK) for a roughly uniform distribution.

    C is fixed at 64 and BLK at 4 (so the per-column K slice is exactly
    3 x 128 lanes and M = 256 rows); G is the largest multiple of 4 whose
    mean occupancy ``m = N/G^3`` keeps the Poisson tail under C:
    ``m + tail_sigmas * sqrt(m) <= C``. Clustered data needs more headroom —
    the ``overflow`` diagnostic makes violations loud.
    """
    c, blk = 64, 4
    g = blk
    while True:
        g_next = g + blk
        m = num_particles / g_next**3
        if m + tail_sigmas * np.sqrt(m) <= c:
            # Largest mean occupancy (coarsest grid) that still fits:
            # fewer empty slots => smaller S and fewer wasted FLOPs.
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
      pad_src:        ``[G^2 * (G+2) * C]`` int32 — padded-slot -> sorted
                      particle index (sentinel ``N`` -> zero row).
      s_table:        ``[num_slots, 9 * kc]`` int8 — selection matrices.
      overflow:       scalar int32 — particles beyond C in their cell.
      dropped_edges:  scalar int32 — real edges whose sender fell outside
                      the receiver's 3^3-cell window (certificate breach).
    """

    order: jnp.ndarray
    slot_of_sorted: jnp.ndarray
    pad_src: jnp.ndarray
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
    """
    spec.validate()
    g, c, blk = spec.grid_size, spec.capacity, spec.z_block
    n = positions.shape[0]
    k = neighbors.shape[1]
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
    # original particle -> slot (sentinel num_slots on overflow)
    slot_of_particle = (
        jnp.full((n,), num_slots, jnp.int32)
        .at[b.order]
        .set(slot_of_sorted, mode="drop")
    )
    # padded-slot -> sorted particle index (sentinel n)
    sorted_idx_table = scatter_to_table(
        b, jnp.arange(n, dtype=jnp.int32), num_cells, c, n, jnp.int32
    ).reshape(g * g, g, c)
    pad_src = jnp.concatenate(
        [sorted_idx_table[:, -1:], sorted_idx_table, sorted_idx_table[:, :1]],
        axis=1,
    ).reshape(-1)

    # Neighbor slots per query slot, in sorted-row order. neighbors[i] lists
    # ORIGINAL ids; map through slot_of_particle, then arrange rows by the
    # receiver's sorted position.
    nbr_slot = jnp.take(
        slot_of_particle, neighbors, axis=0, mode="clip"
    )  # [N(orig), k]
    nbr_slot_sorted = jnp.take(nbr_slot, b.order, axis=0)  # rows sorted
    # Query-slot table of neighbor slots (sentinel num_slots).
    nbr_table = (
        jnp.full((num_slots + 1, k), num_slots, jnp.int32)
        .at[slot_of_sorted]
        .set(nbr_slot_sorted, mode="drop")[:num_slots]
    )

    s_table, dropped = _build_s_table(nbr_table, spec)
    return CellBlockGraph(
        order=b.order.astype(jnp.int32),
        slot_of_sorted=slot_of_sorted,
        pad_src=pad_src,
        s_table=s_table,
        overflow=b.overflow.astype(jnp.int32),
        dropped_edges=dropped,
    )


def _local_indices(nbr_table: jnp.ndarray, spec: CellBlockSpec):
    """Decompose neighbor slot ids into (window-cell, slot) local coords.

    Returns ``czw`` in [0, 9*(BLK+2)) (or -1 if invalid), ``sl`` in [0, C),
    and the count of real-but-out-of-window edges.
    """
    g, c, blk = spec.grid_size, spec.capacity, spec.z_block
    num_slots = spec.num_slots
    rows = nbr_table.shape[0]

    q = jnp.arange(rows, dtype=jnp.int32)[:, None]  # query slot ids
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
    is_real = s < num_slots
    in_window = (dx < 3) & (dy < 3) & (w < blk + 2)
    valid = is_real & in_window
    czw = jnp.where(valid, (dx * 3 + dy) * (blk + 2) + w, -1)
    dropped = jnp.sum(is_real & ~in_window).astype(jnp.int32)
    return czw, sl, valid, dropped


def _build_s_table(nbr_table: jnp.ndarray, spec: CellBlockSpec):
    """S[q, czw * C + sl] = multiplicity of that candidate in q's neighbor
    list — via two one-hot factors contracted on the MXU (a direct
    scatter-add over N*k elements is pathologically slow on TPU)."""
    c = spec.capacity
    nwin = 9 * spec.window_cells
    czw, sl, valid, dropped = _local_indices(nbr_table, spec)
    oh_czw = (
        czw[:, :, None] == jnp.arange(nwin, dtype=jnp.int32)
    ).astype(jnp.bfloat16)  # [rows, k, nwin]
    oh_sl = jnp.where(valid[:, :, None], 1.0, 0.0).astype(jnp.bfloat16) * (
        sl[:, :, None] == jnp.arange(c, dtype=jnp.int32)
    ).astype(jnp.bfloat16)  # [rows, k, C]
    s = jax.lax.dot_general(
        oh_czw,
        oh_sl,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [rows, nwin, C]
    return s.reshape(s.shape[0], nwin * c).astype(jnp.int8), dropped


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
def cellblock_aggregate(
    z_sorted: jnp.ndarray,
    plan: CellBlockGraph,
    spec: CellBlockSpec,
    *,
    out_dtype=jnp.float32,
    carry_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``agg[i] = sum_j z[neighbors[i, j]]`` for cell-sorted state.

    ``z_sorted`` is ``[N, H]`` in sorted order; the result is too.
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
    n, h = z_sorted.shape
    hb = min(spec.h_block, h)
    if h % hb != 0:
        raise ValueError(f"H={h} not a multiple of h_block={hb}")
    num_slots = spec.num_slots

    # Expand to the z-padded slot table (monotone gather; sentinel rows pull
    # the appended zero row).
    z_ext = jnp.concatenate(
        [z_sorted.astype(carry_dtype), jnp.zeros((1, h), carry_dtype)]
    )
    z_pad = jnp.take(z_ext, plan.pad_src, axis=0, mode="clip").reshape(
        g * g, (g + 2) * c, h
    )

    grid = (h // hb, g * g, spec.num_zblocks)
    nzb = spec.num_zblocks

    def col_spec(dx, dy):
        def index_map(hi, b, zb):
            gx, gy = b // g, b % g
            return ((gx + dx - 1) % g) * g + (gy + dy - 1) % g, 0, hi

        return pl.BlockSpec(
            (1, (g + 2) * c, hb), index_map, memory_space=pltpu.VMEM
        )

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
    out_slots = pl.pallas_call(
        _agg_kernel(spec, out_dtype),
        grid=grid,
        in_specs=[s_spec] + [
            col_spec(dx, dy) for dx in (0, 1, 2) for dy in (0, 1, 2)
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((num_slots, h), out_dtype),
        interpret=interpret,
    )(plan.s_table, *([z_pad] * 9))

    # Compact back to sorted-particle rows (monotone gather; overflow
    # sentinel clamps — flagged by plan.overflow, never silent).
    return jnp.take(out_slots, plan.slot_of_sorted, axis=0, mode="clip")


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
