"""Cell-block neighbor aggregation: selection-matrix matmuls on the MXU
instead of HBM row gathers.

The aggregation ``agg[i] = sum_j z[neighbors[i, j]]`` is the hot op of the
pruned sender-latents message-passing step (SURVEY.md C11/C12; reference
counterpart: the torch_scatter segment-add inside PyG's ``propagate``,
``/root/reference/graph_network.py:79,92``). At BASELINE config 4
(N=500k, k=32, H=256) the XLA row-gather form runs at ~91 Mrows/s —
latency-bound at ~1/8 of HBM bandwidth, ~176 ms per message-passing step.

This module re-expresses the aggregation as dense matmuls over a periodic
cell decomposition. Round-3 design: **per-column compaction** (the round-2
per-cell slot table carried a measured 2.81x padding that multiplied S
size, matmul FLOPs, column traffic and the slot-space MLP rows):

* particles are sorted by cell id and stored COMPACTLY per (gx, gy)
  **column**: column ``col`` owns rows ``[col*CC, col*CC + cnt_col)`` of the
  slot table (capacity ``CC ~ mean + 5*sqrt(mean)``, ~1.2-1.35x padding),
  in z-cell order within the column;
* a 0/1 **selection matrix** ``S`` (int8 multiplicity counts) is built ONCE
  per graph: row = query slot, column = ``(neighbor column j in the 3x3
  ring, offset inside a contiguous candidate window of that column)``;
* per step, a Pallas kernel computes ``out[tile] = sum_j S_j @ window_j``
  per ``QB``-row query tile: the 9 candidate windows are **dynamically
  placed** contiguous row ranges of a z-wrap-padded candidate array
  (``pl.Element`` indexing, window starts ride as scalar prefetch), and the
  data-dependent neighbor structure rides the MXU as int8->bf16 matmuls —
  no per-row HBM gathers.

Z-wrap: each column's padded image is ``[cP | main | cA]`` — up to
``wrap_cap`` copies of its LAST z-cell's rows, then its real rows, then up
to ``wrap_cap`` copies of its FIRST cell's rows, tightly packed (layout is
data-dependent; the per-graph ``pad_src`` gather map realizes it from slot
space in one monotone-ish row gather per step). Windows for tiles at the
z boundary run into the wrap segments, so every window is one contiguous
range.

Exactness: identical to gather+sum (in exact arithmetic) whenever
(a) no column holds more than ``CC`` rows and (b) every edge is
representable: sender within the 3x3 column ring and inside the receiver
tile's candidate window — which holds whenever every neighbor lies within
one cell of its receiver (the cell-list exactness certificate,
``d_k <= cell edge``) and the static window/wrap capacities fit the data.
All violations are counted (``overflow``/``dropped_edges``/
``window_overflow``) — never silent.

Training (round 3): the aggregation is linear, ``out = S @ z``, so the VJP
is ``dz = S^T @ g`` — ANOTHER cell-block matmul with queries and candidates
swapped. ``build_cellblock(..., with_reverse=True)`` additionally builds
the reverse selection table over the SAME tile windows (the +-1-cell
adjacency is symmetric, so the window geometry transposes to itself), and
``cellblock_aggregate_slots`` exposes it through a ``jax.custom_vjp`` —
the backward pass is the same Pallas kernel with ``s_rev_table``.
``reverse_mismatch`` certifies the transpose is exact (fwd and reverse
tables must represent the same edge multiset).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosmology_gnn_simulation_tpu.ops.binning import bucket_boundaries
from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-int(x) // m) * m


class CellBlockSpec(NamedTuple):
    """Static cell-block configuration (python ints — part of the jit key).

    Attributes:
      grid_size:    G — cells per box edge (G^2 columns, G z-cells each on
                    the default cubic grid).
      col_capacity: CC — slot rows per column (multiple of ``query_block``).
      query_block:  QB — query rows per kernel grid step.
      window:       W — candidate rows per neighbor column per tile
                    (the matmul K-dim contribution of one column).
      wrap_cap:     max rows copied per z-wrap segment (first/last cell).
      h_block:      latent tile per kernel pass (min(h_block, H) used).
      grid_x:       x-cells when the grid is NOT cubic (0 = cubic =
                    ``grid_size``). Used by the halo composition: each
                    shard's plan covers its extended slab of
                    ``slab_layers + 2*halo_layers`` x-layers over the full
                    ``grid_size x grid_size`` (y, z) cross-section.
      periodic_x:   x-ring wrap. False for halo slabs (queries never sit in
                    the outermost halo layers, so the +-1 x-neighborhood
                    never leaves the local grid; the ring index uses a
                    plain difference instead of a modular one).
      slot_budget:  0 = UNIFORM layout (every column owns ``col_capacity``
                    slot rows — the round-2/3 design). Nonzero = VARIABLE
                    per-column capacities (round 4): column ``col`` owns
                    ``round_up(min(cnt_col, col_capacity), QB)`` rows at a
                    data-dependent QB-aligned prefix offset, and
                    ``slot_budget`` (a QB multiple) is the static total.
                    Cuts the slot padding from the per-column Poisson tail
                    (measured 1.41x flagship / 1.29x config 4) to the
                    QB-rounding floor (~1.1x); ``col_capacity`` survives
                    only as the per-column clamp (so it can be generous —
                    it no longer costs slots). Exceeding the budget is
                    counted by ``overflow`` like a per-column overflow.
    """

    grid_size: int
    col_capacity: int
    query_block: int
    window: int
    wrap_cap: int
    h_block: int = 256
    grid_x: int = 0
    periodic_x: bool = True
    slot_budget: int = 0

    @property
    def gx(self) -> int:
        return self.grid_x or self.grid_size

    @property
    def variable(self) -> bool:
        return self.slot_budget > 0

    @property
    def num_columns(self) -> int:
        return self.gx * self.grid_size

    @property
    def tiles_per_col(self) -> int:
        return self.col_capacity // self.query_block

    @property
    def num_tiles(self) -> int:
        return self.num_slots // self.query_block

    @property
    def num_slots(self) -> int:
        if self.variable:
            return self.slot_budget
        return self.num_columns * self.col_capacity

    @property
    def pack_slots(self) -> int:
        """Size of the (col, rank) PACK encoding ``col * col_capacity + r``
        the sender-decode tables use (== ``num_slots`` in uniform mode,
        where pack ids ARE slot ids)."""
        return self.num_columns * self.col_capacity

    @property
    def padded_col(self) -> int:  # CCp: rows per column in the padded image
        return self.col_capacity + 2 * self.wrap_cap

    @property
    def num_padded(self) -> int:
        if self.variable:
            # Variable z-wrap image: per-column spans are
            # round_up(c_pre + m + c_app, 16) at data-dependent offsets;
            # the static budget adds the worst-case per-column wrap+round
            # overhead plus one trailing window so the global window clamp
            # never reads past the buffer.
            return _round_up(
                self.slot_budget
                + self.num_columns * (2 * self.wrap_cap + 16)
                + max(self.window, 16),
                16,
            )
        return self.num_columns * self.padded_col

    @property
    def s_width(self) -> int:
        return 9 * self.window

    @property
    def rev_lanes(self) -> int:
        """Lane-padded QB for the reverse table's minor dim: Mosaic's
        window-params pass rejects Blocked INPUT blocks whose lane size is
        not a 128-multiple (the same shape is accepted as an output —
        probed round 3). Padding lanes never match a local sender in the
        build and contribute zero rows to the backward matmul."""
        return _round_up(self.query_block, _LANE)

    def validate(self) -> None:
        g, cc, qb, w, ec = (self.grid_size, self.col_capacity,
                            self.query_block, self.window, self.wrap_cap)
        if g < 3:
            raise ValueError(f"grid_size {g} must be >= 3")
        if self.gx < 3:
            raise ValueError(f"grid_x {self.gx} must be >= 3")
        if not self.periodic_x and self.grid_x == 0:
            raise ValueError("periodic_x=False requires an explicit grid_x")
        if self.variable:
            if self.slot_budget % qb:
                raise ValueError(
                    f"slot_budget {self.slot_budget} not a multiple of "
                    f"query_block {qb}"
                )
            if self.grid_x or not self.periodic_x:
                raise ValueError(
                    "variable capacities are cubic-periodic only (halo "
                    "slabs use the uniform layout)"
                )
            if w % 16:
                raise ValueError(
                    f"window {w} must be a 16-multiple in variable mode "
                    "(the global padded-image clamp must stay 16-aligned)"
                )
        if cc % qb:
            raise ValueError(f"col_capacity {cc} not a multiple of "
                             f"query_block {qb}")
        if qb % 32:
            # The S table is int8: Mosaic's sublane tiling for int8 is 32
            # rows, and the S/out block row offsets are t * query_block.
            raise ValueError(
                f"query_block {qb} must be a multiple of 32 (int8 block "
                "tiling)"
            )
        if w % 8 or ec % 16:
            raise ValueError(
                f"window/wrap_cap ({w}/{ec}) must be multiples of 8/16 "
                "(TPU sublane alignment; wrap_cap also keeps padded_col - "
                "window 16-aligned for window-start alignment)"
            )
        if w >= _LANE and w % _LANE:
            raise ValueError(f"window {w} >= 128 must be a multiple of 128")
        if w > self.padded_col:
            raise ValueError(
                f"window {w} exceeds padded column {self.padded_col}"
            )
        if max(self.num_slots, self.pack_slots) * g >= 2**31:
            raise ValueError("num_slots * grid_size overflows int32 packing")


def choose_cellblock_spec(
    num_particles: int,
    k: Optional[int] = None,
    *,
    h_block: int = 256,
    query_block: Optional[int] = None,
    variable: bool = False,
) -> CellBlockSpec:
    """Pick (G, CC, QB, W, wrap_cap) for a roughly uniform distribution.

    G follows the k-NN exactness grid when ``k`` is known (every neighbor
    within one cell <=> ``choose_cell_grid``'s certified edge), else targets
    ~24 particles per cell. CC covers the per-column Poisson tail
    (mean + 5 sqrt(mean)), QB ~ a third of a column so windows stay narrow,
    and W covers a QB-row tile's z-extent plus one cell on each side with a
    5-sigma fluctuation margin. Clustered data can exceed any of the static
    capacities — the ``overflow``/``dropped_edges`` diagnostics make
    violations loud, never silent.

    ``variable=True`` (round 4): per-column VARIABLE capacities — slots
    pack tightly at QB granularity behind data-dependent prefix offsets,
    ``slot_budget`` covers the QB-rounding floor plus a 6-sigma total
    fluctuation margin, and CC becomes a generous per-column clamp (it no
    longer costs slots). See ``CellBlockSpec.slot_budget``.
    """
    if k is not None:
        g = choose_cell_grid(num_particles, k).grid_size
    else:
        g = max(3, int(round((num_particles / 24.0) ** (1.0 / 3.0))))
    mean_col = num_particles / g**2
    mean_cell = num_particles / g**3
    return _plan_spec(
        g, mean_col, mean_cell, h_block, query_block, variable=variable
    )


def _plan_spec(
    g, mean_col, mean_cell, h_block, query_block,
    num_columns=None, grid_x=0, periodic_x=True, variable=False,
):
    """Capacity planning shared by the cubic and halo-slab choosers:
    CC covers the per-column Poisson tail, W a QB tile's z-extent plus one
    cell each side with 5-sigma margin."""
    if num_columns is None:
        num_columns = g * g
    wrap = _round_up(mean_cell + 6.0 * np.sqrt(mean_cell) + 4.0, 16)

    def plan(qb):
        if variable:
            # CC is only the per-column clamp: 8-sigma so real data never
            # trips it; capacity costs slots only through the budget.
            cc = _round_up(max(mean_col + 8.0 * np.sqrt(mean_col), qb), qb)
        else:
            cc = _round_up(max(mean_col + 5.0 * np.sqrt(mean_col), qb), qb)
        need = qb + 3.0 * mean_cell + 5.0 * np.sqrt(qb + 3.0 * mean_cell)
        w = _round_up(need, _LANE)
        padded = cc + 2 * wrap
        if w > padded:
            # Tiny columns: one window covers the whole padded column.
            w = padded if padded < _LANE else padded // _LANE * _LANE
        if variable and w % 16:
            w = _round_up(w, 16)
        return cc, w

    def budget(qb):
        # E[round_up(cnt, QB)] ~ mean + QB/2 per occupied column, plus a
        # 6-sigma margin on the total (cnt variance ~ Poisson mean, the
        # rounding jitter ~ QB^2/12).
        n_total = num_columns * mean_col
        exp_slots = num_columns * (mean_col + qb / 2.0)
        sigma = np.sqrt(n_total + num_columns * qb * qb / 12.0)
        return _round_up(exp_slots + 6.0 * sigma, qb)

    def slots_for(qb, cc):
        return budget(qb) if variable else num_columns * cc

    if query_block is not None:
        qb = query_block
        cc, w = plan(qb)
    else:
        # QB must be a multiple of 32 (int8 tiling); among the candidates,
        # minimize the kernel's per-step HBM traffic: the int8 S table
        # (read once per step) plus the 9 candidate windows per tile
        # (re-streamed per tile — smaller QB means narrower windows but
        # more tiles). Both terms are exact functions of the spec.
        best = None
        for qb_c in range(32, 257, 32):
            cc_c, w_c = plan(qb_c)
            slots_c = slots_for(qb_c, cc_c)
            s_bytes = slots_c * 9 * w_c
            win_bytes = (slots_c // qb_c) * 9 * w_c * h_block * 2
            score = (s_bytes + win_bytes, -qb_c)
            if best is None or score < best[0]:
                best = (score, qb_c, cc_c, w_c)
        _, qb, cc, w = best
    return CellBlockSpec(
        grid_size=g, col_capacity=cc, query_block=qb, window=w,
        wrap_cap=wrap, h_block=h_block, grid_x=grid_x,
        periodic_x=periodic_x,
        slot_budget=budget(qb) if variable else 0,
    )


# Measured dispatch thresholds for ``choose_aggregation`` (TPU v5e,
# docs/PERFORMANCE.md + benchmarks/results/train_r4.json):
#   * training, N=65,536: cellblock_hybrid 117 ms vs gather 236 ms;
#   * rollout,  N=65,536: hybrid 29.3 ms/step vs gather 38.3;
#   * N=500,000 (config 4): slots beats hybrid (744 vs 814 ms rollout) —
#     the expand/compact row gathers are latency-bound at 500k rows;
#   * small N: the per-graph plan build exceeds the gather savings
#     (N=65k rollout crossover analysis, docs/PERFORMANCE.md "Crossover").
_AGG_SLOTS_MIN_N = 250_000
_AGG_HYBRID_MIN_N_TRAIN = 32_768
_AGG_HYBRID_MIN_N_ROLLOUT = 32_768


def choose_aggregation(
    num_particles: int,
    *,
    training: bool,
    pruned: bool = True,
    backend: Optional[str] = None,
) -> str:
    """Resolve ``aggregation="auto"`` to the measured-best backend.

    Returns ``"gather"``, ``"cellblock_hybrid"`` (particle-space carry) or
    ``"cellblock"`` (slot-space carry) by particle count, matching the
    dispatch table measured on the v5e (see the constants above). Cell-block
    requires the pruned sender-latents model and pays off only where the
    Mosaic kernels run natively, so non-TPU backends and unpruned models
    always resolve to ``"gather"``.
    """
    if backend is None:
        backend = jax.default_backend()
    if not pruned or backend != "tpu":
        return "gather"
    if num_particles >= _AGG_SLOTS_MIN_N:
        return "cellblock"
    threshold = (
        _AGG_HYBRID_MIN_N_TRAIN if training else _AGG_HYBRID_MIN_N_ROLLOUT
    )
    if num_particles >= threshold:
        return "cellblock_hybrid"
    return "gather"


def choose_cellblock_spec_halo(
    num_particles: int,
    grid_size: int,
    slab_layers: int,
    halo_layers: int,
    num_shards: int,
    *,
    h_block: int = 256,
    query_block: Optional[int] = None,
) -> CellBlockSpec:
    """Spec for one halo shard's LOCAL plan: an open (non-periodic) slab of
    ``slab_layers + 2*halo_layers`` x-layers over the full periodic
    ``grid_size x grid_size`` (y, z) cross-section, cell edge equal to the
    halo decomposition's (``parallel/halo.py``) so both exactness
    certificates share the same geometry. ``num_particles`` is the GLOBAL
    particle count; capacities assume ~uniform occupancy (clustered data
    trips the plan's loud overflow/dropped diagnostics, like everywhere
    else)."""
    g = grid_size
    gxl = slab_layers + 2 * halo_layers
    mean_cell = num_particles / g**3
    mean_col = mean_cell * g  # one (x, y) column spans all G z-cells
    return _plan_spec(
        g, mean_col, mean_cell, h_block, query_block,
        num_columns=gxl * g, grid_x=gxl, periodic_x=False,
    )


class CellBlockGraph(NamedTuple):
    """Per-graph cell-block plan (pytree of arrays; spec carried separately).

    All particle indexing below is in **cell-sorted order** (the caller
    permutes the model state by ``order`` once per graph).

    Attributes:
      order:          ``[N]`` int32 — sort permutation; ``x_sorted = x[order]``.
      slot_of_sorted: ``[N]`` int32 — ascending slot id per sorted particle
                      (``col*CC + rank``; sentinel ``num_slots`` for column
                      overflow).
      particle_of_slot: ``[num_slots]`` int32 — slot -> sorted particle
                      index (sentinel ``N`` for empty slots).
      pad_src:        ``[num_padded]`` int32 — padded-image row -> source
                      slot (sentinel ``num_slots`` for unused rows); realizes
                      the ``[cP | main | cA]`` z-wrap layout as one gather.
      window_starts:  ``[num_tiles, 9]`` int32 — flat padded-image row
                      offset of each tile's candidate window per neighbor
                      column (scalar-prefetch operand of the kernel).
      s_table:        ``[num_slots, 9*W]`` int8 — selection matrices.
      overflow:       scalar int32 — particles beyond CC in their column.
      dropped_edges:  scalar int32 — edges S cannot represent despite the
                      receiver having a row: sender outside the 3x3-column
                      ring, dropped by column overflow, or outside the
                      tile's candidate window (certificate breach either
                      way). Edges whose RECEIVER overflowed are accounted
                      by ``overflow`` instead.
      window_overflow: scalar int32 — worst-case rows a tile's required
                      candidate range exceeds ``window`` by (0 when every
                      window fit; the per-edge misses are already in
                      ``dropped_edges`` — this localizes the cause).
      search_excess:  scalar f32 or None — dense-search path only
                      (``dense_search=...``): max over occupied query rows
                      of ``kth_d2 - window_margin_sq``; <= 0 certifies every
                      query's k-th neighbor inside its provable window.
      search_window_overflow: scalar int32 or None — dense-search path
                      only: rows the per-search-tile candidate windows
                      truncated, plus z-wrap copies beyond ``wrap_cap``
                      (either can HIDE a true neighbor from the in-kernel
                      selection without tripping the margin bound, so this
                      must gate exactness).
      s_rev_table:    ``[num_tiles, 9*W, rev_lanes]`` int8 or None — transpose
                      selection matrices (``with_reverse=True``), consumed
                      by the custom VJP; entry ``[t, (j, off), q]`` counts
                      edges whose sender is tile-local slot ``q`` of tile
                      ``t`` and whose receiver sits at window position
                      ``(j, off)``. Window dim leads so the backward kernel
                      contracts it directly against the candidate window
                      (lane dim = array minor: no tile-alignment constraint
                      on QB, no transposes).
      reverse_mismatch: scalar int32 or None — (edges in S) − (edges in
                      S_rev); 0 certifies the backward is the exact
                      transpose of the forward.
    """

    order: jnp.ndarray
    slot_of_sorted: jnp.ndarray
    particle_of_slot: jnp.ndarray
    pad_src: jnp.ndarray
    window_starts: jnp.ndarray
    s_table: jnp.ndarray
    overflow: jnp.ndarray
    dropped_edges: jnp.ndarray
    window_overflow: jnp.ndarray
    s_rev_table: Optional[jnp.ndarray] = None
    reverse_mismatch: Optional[jnp.ndarray] = None
    search_excess: Optional[jnp.ndarray] = None
    search_window_overflow: Optional[jnp.ndarray] = None


# Row-tile length for the chunked S build: bounds the bf16 one-hot factors
# and the f32 contraction output to a few hundred MB.
_S_BUILD_TILE = 16384

# Query tiles per chunk of the reverse-table build (bounds the gathered
# [chunk, 9W, k] window tables and their one-hot factors).
_REV_BUILD_TILES = 8


# Rows per grid step of the Pallas S-build kernel (multiple of 32 — int8
# sublane tiling).
_S_KERNEL_ROWS = 256


def _s_from_offsets(offsets, spec, interpret):
    """Build int8 S rows from packed flat lane indices (sentinel = s_width)
    by one-hot accumulation on the VPU — ~1 ms at flagship scale where the
    XLA one-hot contract costs ~13 ms (it writes a [rows, 9W] f32 transient
    per chunk)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    num_slots = spec.num_slots
    k = offsets.shape[1]
    width = spec.s_width
    rows = _S_KERNEL_ROWS
    pad = (-num_slots) % rows
    if pad:
        offsets = jnp.pad(offsets, ((0, pad), (0, 0)),
                          constant_values=width)
    tiles = (num_slots + pad) // rows

    # int16 offsets (the fused decode path) halve the decode->accumulate
    # transfer traffic, but ALL in-kernel vector arithmetic must run in
    # int32: the v5e backend compile rejects both a native 16-bit iota
    # ("16-bit iota not supported by hardware") and i16 vector compares
    # ("Target does not support this comparison") — round-4 probes. Upcast
    # on read; the compare/accumulate sweep is i32 either way.

    def kernel(off_ref, s_ref):
        offs = off_ref[...].astype(jnp.int32)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
        acc = jnp.zeros((rows, width), jnp.int32)
        for kk in range(k):
            acc = acc + (lanes == offs[:, kk][:, None]).astype(jnp.int32)
        s_ref[...] = acc.astype(jnp.int8)

    out = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((rows, k), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((rows, width), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((num_slots + pad, width), jnp.int8),
        interpret=interpret,
    )(offsets)
    return out[:num_slots]


# Slots per lane-block of the transposed decode kernel.
_DECODE_LANES = 512


def _s_from_codes_fused(packed_aux_t, spec, k, cap, interpret):
    """Fused codes->S build (round 4): a TRANSPOSED Pallas decode kernel
    (slots on LANES, the k codes + per-slot tables on SUBLANES — every op
    runs on full ``[16, 512]``-class tiles) turns pre-normalized candidate
    codes into packed S-lane offsets, which the existing one-hot
    ``_s_from_offsets`` kernel accumulates into int8 rows. Replaces the XLA
    ``lax.map`` decode whose elementwise one-hot transients cost ~5 ms of
    the 6.7 ms flagship plan build (plan_parts_r3.json,
    step_decomp_r3.json). A first, row-major in-kernel decode measured
    SLOWER than the lax.map (31.6 vs 29.3 ms/step in-rollout): ``[R, k]``
    ops use k/128 of each vector register — orientation, not fusion, was
    the bottleneck.

    ``packed_aux_t`` is ``[k + 73 (sublane-padded), num_slots]`` int32 with
    sublane rows ``[codes(k) | s27(27) | const(45) | qz(1)]``. Codes are
    PRE-NORMALIZED by the XLA-side spill pass: ring picks stay
    ``j27 * cap + rank``; resolved spill senders arrive as
    ``27*cap + jring*(cc*g) + r_s*g + s_cz``; real-but-out-of-ring spill
    senders as ``DROP_MARK``; everything else (sentinels, unused spill
    slots) at or above ``INVALID`` — the kernel needs no spill tables and
    no data-dependent control flow.

    Returns ``(s_table [num_slots, 9W] int8, dropped scalar int32)``.
    Bit-identical to the ``contract``/``lax.map`` paths (pinned by
    tests/test_cellblock.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g, cc, w_cap = spec.grid_size, spec.col_capacity, spec.window
    num_slots, width = spec.num_slots, spec.s_width
    res_base = 27 * cap
    ccg = cc * g
    drop_mark = res_base + 9 * ccg
    drop_sent = width + 1  # _s_from_offsets ignores every lane >= width
    rows_in = packed_aux_t.shape[0]
    lanes_blk = _DECODE_LANES
    pad = (-num_slots) % lanes_blk
    if pad:
        # Padding lanes decode garbage offsets; they are sliced off before
        # the accumulate and before the dropped count.
        packed_aux_t = jnp.pad(packed_aux_t, ((0, 0), (0, pad)))
    blocks = (num_slots + pad) // lanes_blk

    def kernel(aux_ref, out_ref):
        aux = aux_ref[...]
        codes = aux[:k, :]  # [k, L]
        s27 = aux[k:k + 27, :]
        const = aux[k + 27:k + 72, :]
        qz = aux[k + 72:k + 73, :]  # [1, L] — broadcasts along sublanes
        is_res = codes >= res_base
        # Ring decode: j27 * cap + rank; sender column rank = (compact
        # start of its cell within the column) + in-cell rank.
        cr = jnp.where(is_res, 0, codes)
        j27 = cr // cap
        rank = cr - j27 * cap
        start = jnp.zeros((k, lanes_blk), jnp.int32)
        for j in range(27):
            start = start + jnp.where(j27 == j, s27[j:j + 1, :], 0)
        r_ring = start + rank
        cz_ring = (qz + (j27 % 3) - 1 + g) % g
        j_ring = (j27 // 9) * 3 + (j27 // 3) % 3
        # Resolved-spill decode (pure arithmetic by construction).
        v = jnp.where(is_res, codes - res_base, 0)
        jr2 = v // ccg
        rem = v - jr2 * ccg
        r2 = rem // g
        cz2 = rem - r2 * g
        ok2 = jr2 < 9  # DROP_MARK/INVALID give jr2 >= 9
        is_drop = codes == drop_mark
        r_s = jnp.where(is_res, r2, r_ring)
        s_cz = jnp.where(is_res, cz2, cz_ring)
        jring = jnp.where(is_res, jnp.where(ok2, jr2, 9), j_ring)
        # Boolean select via logical ops: Mosaic cannot lower a vector
        # where() on i1 operands ("unsupported target bitwidth for
        # truncation" at backend compile).
        ok = (is_res & ok2) | ~is_res
        # Per-(tile, j) constant select: [w_loc, cp, m, ca, cg1] at j*5+i.
        sel = [jnp.zeros((k, lanes_blk), jnp.int32) for _ in range(5)]
        for j in range(9):
            mj = jring == j
            for i in range(5):
                sel[i] = sel[i] + jnp.where(
                    mj, const[j * 5 + i:j * 5 + i + 1, :], 0
                )
        w_s, cp_s, m_s, ca_s, cg1_s = sel
        # Capacity check against the sender column's USED main rows m
        # (selected per ring column above) instead of the static CC:
        # equivalent in the uniform layout (ranks are < count, so
        # r < CC iff r < min(count, CC) == m), and REQUIRED in the
        # variable layout where CC is only the per-column clamp — a rank
        # in [m, CC) names a slot the column does not own there.
        ok = ok & (r_s < m_s)
        rel_main = cp_s + r_s - w_s
        ok_main = ok & (rel_main >= 0) & (rel_main < w_cap)
        rank_pre = r_s - cg1_s
        rel_pre = rank_pre - w_s
        ok_pre = (
            ok & (s_cz == g - 1) & (rank_pre < cp_s)
            & (rel_pre >= 0) & (rel_pre < w_cap)
        )
        rel_app = cp_s + m_s + r_s - w_s
        ok_app = (
            ok & (s_cz == 0) & (r_s < ca_s)
            & (rel_app >= 0) & (rel_app < w_cap)
        )
        use_pre = ok_pre & ~ok_main
        off = jnp.where(
            ok_main, rel_main, jnp.where(use_pre, rel_pre, rel_app)
        )
        valid = ok_main | ok_pre | ok_app
        dropped_e = (ok & ~valid) | is_drop
        # Dropped edges carry a distinct sentinel so the XLA side can count
        # them from the offsets array; both sentinels sit outside the
        # accumulate's [0, width) compare range. int16 output when the lane
        # space fits: halves the transpose-back traffic and doubles the
        # one-hot accumulate's lane throughput.
        out = jnp.where(
            valid, jring * w_cap + off,
            jnp.where(dropped_e, drop_sent, width),
        )
        if krows != k:
            # Sublane-pad the output to the dtype tile (padding rows carry
            # the inert `width` sentinel; sliced off below).
            out = jnp.pad(
                out, ((0, krows - k), (0, 0)), constant_values=width
            )
        out_ref[...] = out.astype(out_dtype)

    out_dtype = jnp.int16 if width + 2 < 2**15 else jnp.int32
    krows = _round_up(k, 16 if out_dtype == jnp.int16 else 8)
    lanes_t = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[pl.BlockSpec((rows_in, lanes_blk), lambda t: (0, t))],
        out_specs=pl.BlockSpec((krows, lanes_blk), lambda t: (0, t)),
        out_shape=jax.ShapeDtypeStruct((krows, num_slots + pad), out_dtype),
        interpret=interpret,
    )(packed_aux_t)
    offsets = lanes_t[:k, :num_slots].T  # [num_slots, k]
    dropped = jnp.sum(offsets == drop_sent).astype(jnp.int32)
    return _s_from_offsets(offsets, spec, interpret), dropped


def _onehot_contract(jh, lo, valid, n_jh, n_lo):
    """``S[row, jh * n_lo + lo] = multiplicity`` via two one-hot factors
    contracted on the MXU (a direct scatter-add over N*k elements is
    pathologically slow on TPU). ``jh``/``lo``/``valid`` are ``[rows, k]``;
    returns ``[rows, n_jh * n_lo]`` int8."""
    oh_jh = (
        jh[:, :, None] == jnp.arange(n_jh, dtype=jnp.int32)
    ).astype(jnp.bfloat16)
    oh_lo = jnp.where(valid[:, :, None], 1.0, 0.0).astype(jnp.bfloat16) * (
        lo[:, :, None] == jnp.arange(n_lo, dtype=jnp.int32)
    ).astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        oh_jh, oh_lo,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [rows, n_jh, n_lo]
    return s.reshape(s.shape[0], n_jh * n_lo).astype(jnp.int8)


class DenseSearchSpec(NamedTuple):
    """Static config of the fused dense-query kNN (round 5).

    The dense search replaces the separate Pallas cell-list kNN + codes
    decode for the cell-block pipeline: queries are processed QB dense
    cell-sorted rows at a time against the 9 neighbor columns' z-windows of
    the SAME padded-column coordinate layout the aggregation kernel reads —
    so the selection's output lanes ARE (up to a per-tile window rebase)
    S-table lanes, and the whole codes->S decode machinery disappears.

    Attributes:
      query_block: QB_s — dense query rows per kernel grid step (sublane
        multiple of 8; smaller than the aggregation QB — the select's VPU
        work scales with rows x width, and dense tiles keep rows ~= N
        instead of num_slots).
      window: W_s — candidate rows per neighbor column per search tile
        (lane multiple of 128 — the 9 per-column distance segments
        concatenate on lanes). Must cover a QB_s-row tile's z-extent plus
        one cell each side; truncation is counted and gates the
        exactness certificate.
    """

    query_block: int = 16
    window: int = 128

    def validate(self) -> None:
        if self.query_block % 8 or self.query_block <= 0:
            raise ValueError(
                f"dense query_block {self.query_block} must be a positive "
                "multiple of 8 (f32 sublane tiling)"
            )
        if self.window % _LANE:
            raise ValueError(
                f"dense window {self.window} must be a multiple of {_LANE} "
                "(the 9 distance segments concatenate on lanes)"
            )


def choose_dense_search_spec(
    num_particles: int, spec: CellBlockSpec, query_block: int = 16
) -> DenseSearchSpec:
    """Size the dense-search window for a roughly uniform distribution.

    A QB_s-row tile's z-window holds ~QB_s + 2*mean_cell rows plus the
    fluctuation of its two margin cells; 5 sigma on the total plus the
    <= QB_s-1 extra span when a tile straddles cell boundaries keeps
    truncation (certificate-gated, never silent) out of uniform runs.
    """
    g = spec.grid_size
    mean_cell = num_particles / g**3
    expect = query_block + 2.0 * mean_cell
    w = expect + 5.0 * np.sqrt(max(expect, 1.0)) + query_block
    return DenseSearchSpec(
        query_block=query_block,
        window=max(_round_up(int(np.ceil(w)), _LANE), _LANE),
    )


def _dense_select_kernel(k, qb, w_eff, num_cand):
    """Masked re-min k-selection over 9 column windows.

    Identical selection scheme to the production kNN kernel (in-place
    masked re-min — the probed write-free alternatives measured 3.5x
    slower, knn_ab_r3.json); candidates arrive as 9 z-windows of the
    lane-major padded-column coordinate table, fetched as Element blocks
    at 128-FLOORED lane starts (``wl128 * 128`` is the provably-divisible
    form Mosaic's window-param pass accepts; the <=127 lead lanes are
    absorbed by the widened ``w_eff`` window). The first cut of this
    kernel compacted windows with in-kernel ``pltpu.roll`` instead —
    measured 22.8-30.7 ms vs the codes round's 14.9 at the flagship spec
    (flagship_dense_r5.json v1): 9 dynamic rolls per tile serialize the
    VPU far beyond the wider window's extra compare work. Outputs per
    tile: the k picked candidate lanes (codes, lanes [0, k) of a 128-lane
    row) and the k-th distance broadcast across a full lane row (a
    [1, QB]-shaped output block would violate Mosaic's sublane tiling).
    """
    # np scalar, not jnp: a jnp.int32 here is an eager Array the kernel
    # would close over ("captures constants" trace error).
    big_lane = np.int32(2**30)

    def kernel(cols_r, wl_r, sxj_r, syj_r, box_ref, q_ref, *refs):
        del cols_r, wl_r  # consumed by the index maps only
        tab_refs = refs[:9]
        codes_ref, kth_ref = refs[9], refs[10]
        t = pl.program_id(0)
        bx = box_ref[0]
        q = q_ref[...]
        qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        segs = []
        for j in range(9):
            w = tab_refs[j][...]  # [8, w_eff] — sublanes 0..2 = x, y, z
            cx = w[0:1, :] + sxj_r[t * 9 + j].astype(jnp.float32) * bx
            cy = w[1:2, :] + syj_r[t * 9 + j].astype(jnp.float32) * bx
            cz = w[2:3, :]
            segs.append((qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2)
        d2 = jnp.concatenate(segs, axis=1)  # [QB_s, 9*w_eff]

        codes = jnp.zeros((qb, _LANE), jnp.int32)
        cand_lane = jax.lax.broadcasted_iota(jnp.int32, (qb, num_cand), 1)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (qb, _LANE), 1)
        mm = jnp.full((qb, 1), -1.0, jnp.float32)
        lane_pick = jnp.full((qb, 1), -1, jnp.int32)
        for kk in range(k):
            d2 = jnp.where(cand_lane == lane_pick, _DENSE_BIG, d2)
            mm = jnp.min(d2, axis=1, keepdims=True)
            new_lane = jnp.min(
                jnp.where(d2 <= mm, cand_lane, big_lane),
                axis=1, keepdims=True,
            )
            lane_pick = jnp.where(mm < _DENSE_BIG * 0.5, new_lane, num_cand)
            codes = jnp.where(out_lane == kk, lane_pick, codes)
        codes_ref[...] = codes
        kth_ref[...] = jnp.broadcast_to(mm, (qb, _LANE))

    return kernel


_DENSE_BIG = np.float32(1e30)


def _dense_search_offsets(
    spec, dspec, k, n, box_size,
    sx, sy, sz, sorted_col, sorted_cz, r_col, r_cell,
    gstart, col_start, m, c_pre, c_app, cstart_ext,
    w_loc_a, interpret,
):
    """Fused dense-query exact kNN -> aggregation S-lane offsets.

    All row inputs are in CELL-SORTED order (build_cellblock's sort):
    ``sx/sy/sz`` sorted coordinates, ``r_col``/``r_cell`` each row's rank
    within its column/cell. Returns ``(offsets [num_slots, k] int32,
    kth_sorted [n] f32, search_window_overflow scalar int32)``. Offsets use
    the ``_s_from_offsets`` conventions: lane index in ``[0, 9*W)``, the
    inert ``width`` sentinel for empty/no-pick entries, ``width + 1`` for
    picks the aggregation window cannot represent (counted as dropped
    edges). ``kth_sorted`` holds each sorted query row's k-th squared
    distance (fill ``-_DENSE_BIG`` for rows without a search row) for the
    margin certificate.
    """
    g = spec.grid_size
    cc, wrap = spec.col_capacity, spec.wrap_cap
    qb_a, w_cap = spec.query_block, spec.window
    num_cols, num_slots = spec.num_columns, spec.num_slots
    qb_s, w_s = dspec.query_block, dspec.window
    ccp_s = _round_up(2 * wrap + cc, _LANE)
    # Fetched window: the logical W_s plus one 128-lane block of slack for
    # the 128-floored Element starts (clamped to the column width).
    w_eff = min(w_s + _LANE, ccp_s)
    max_tiles_col = -(-cc // qb_s)
    t_bound = num_cols + -(-n // qb_s)
    num_cand = 9 * w_eff
    width = spec.s_width
    drop_sent = jnp.int32(width + 1)
    big_i = jnp.int32(2**30)
    box_f = jnp.asarray(box_size, jnp.float32).reshape(())

    # ---- Lane-major padded coordinate table [8*num_cols, CCP_s]:
    # rows 8*col + {0,1,2} = x, y, z; rows 3..7 are the sublane-block
    # floor. Same per-column [cP | main | cA] z-wrap layout as the
    # aggregation's padded image (z-wrap copies carry pre-shifted z).
    flat_sz = num_cols * ccp_s
    oob = flat_sz
    c_pre_i = jnp.take(c_pre, sorted_col)
    m_i = jnp.take(m, sorted_col)
    dst_main = jnp.where(
        r_col < jnp.minimum(m_i, cc),
        sorted_col * ccp_s + c_pre_i + r_col, oob,
    )
    pre_m = (sorted_cz == g - 1) & (r_cell < wrap)
    dst_pre = jnp.where(pre_m, sorted_col * ccp_s + r_cell, oob)
    app_m = (sorted_cz == 0) & (r_cell < wrap) & (r_col < cc)
    dst_app = jnp.where(
        app_m, sorted_col * ccp_s + c_pre_i + m_i + r_cell, oob
    )
    # Unused padded rows carry coordinate 4*box: their distance to any
    # in-box query exceeds 9*box^2 — far outside any certifiable margin —
    # so no validity plane is needed (a pick of one fails the margin
    # certificate loudly, and its S entry references a zero padded row).
    tabs = []
    for vals, zshift in ((sx, 0.0), (sy, 0.0), (sz, 1.0)):
        t0 = jnp.full((flat_sz + 1,), 1.0, jnp.float32) * (4.0 * box_f)
        t0 = t0.at[dst_main].set(vals, mode="drop")
        t0 = t0.at[dst_pre].set(vals - zshift * box_f, mode="drop")
        t0 = t0.at[dst_app].set(vals + zshift * box_f, mode="drop")
        tabs.append(t0[:flat_sz].reshape(num_cols, ccp_s))
    zero = jnp.zeros((num_cols, ccp_s), jnp.float32)
    tab = jnp.stack(
        [tabs[0], tabs[1], tabs[2], zero, zero, zero, zero, zero], axis=1
    ).reshape(num_cols * 8, ccp_s)

    # ---- Dense query tiles: column `col` packs ceil(m/QB_s) tiles at the
    # data-dependent prefix offset; T is the static hard bound.
    tiles_per_col = -(-m // qb_s)
    tile_ofs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(tiles_per_col).astype(jnp.int32)]
    )
    tile_col = jnp.zeros((t_bound + 1,), jnp.int32)
    tile_row0 = jnp.zeros((t_bound + 1,), jnp.int32)
    cols_iota = jnp.arange(num_cols, dtype=jnp.int32)
    for ti in range(max_tiles_col):
        sel = ti < tiles_per_col
        idx = jnp.where(sel, tile_ofs[:-1] + ti, t_bound)
        tile_col = tile_col.at[idx].set(cols_iota, mode="drop")
        tile_row0 = tile_row0.at[idx].set(ti * qb_s, mode="drop")
    tile_col, tile_row0 = tile_col[:t_bound], tile_row0[:t_bound]
    t_used = tile_ofs[-1]
    live = jnp.arange(t_bound, dtype=jnp.int32) < t_used

    abs0 = jnp.take(col_start, tile_col) + tile_row0
    rows_t = jnp.clip(jnp.take(m, tile_col) - tile_row0, 0, qb_s)
    cz_ext = jnp.concatenate([sorted_cz, jnp.zeros((1,), jnp.int32)])
    z_lo = jnp.take(cz_ext, jnp.clip(abs0, 0, n), mode="clip")
    z_hi = jnp.take(
        cz_ext, jnp.clip(abs0 + jnp.maximum(rows_t, 1) - 1, 0, n),
        mode="clip",
    )
    z_lo = jnp.where(live & (rows_t > 0), z_lo, 0)
    z_hi = jnp.where(live & (rows_t > 0), z_hi, 0)

    # Queries in tile-dense order [T*QB_s, 128] (lanes 0..2), scatter-built.
    q_dst = jnp.where(
        r_col < cc,
        (jnp.take(tile_ofs, sorted_col) + r_col // qb_s) * qb_s
        + r_col % qb_s,
        t_bound * qb_s,
    )
    qtab = jnp.zeros((t_bound * qb_s + 1, 8), jnp.float32)
    qtab = qtab.at[q_dst].set(
        jnp.stack([sx, sy, sz] + [jnp.zeros_like(sx)] * 5, axis=1),
        mode="drop",
    )[: t_bound * qb_s]
    qtab = jnp.pad(qtab, ((0, 0), (0, _LANE - 8)))

    # ---- Per-(tile, j) windows into the padded columns.
    gx_t = tile_col // g
    gy_t = tile_col % g
    dxy = jnp.arange(9, dtype=jnp.int32)
    dx = dxy[None, :] // 3 - 1
    dy = dxy[None, :] % 3 - 1
    cj = ((gx_t[:, None] + dx) % g) * g + (gy_t[:, None] + dy) % g
    sx_j = jnp.where(
        gx_t[:, None] + dx < 0, -1,
        jnp.where(gx_t[:, None] + dx >= g, 1, 0),
    )
    sy_j = jnp.where(
        gy_t[:, None] + dy < 0, -1,
        jnp.where(gy_t[:, None] + dy >= g, 1, 0),
    )
    cp_j = jnp.take(c_pre, cj)
    m_j = jnp.take(m, cj)
    ca_j = jnp.take(c_app, cj)
    ce_flat = jnp.take(cstart_ext, cj.reshape(-1), axis=0).reshape(
        t_bound, 9, g + 1
    )
    start_lo = jnp.take_along_axis(
        ce_flat,
        jnp.broadcast_to(
            jnp.clip(z_lo - 1, 0, g)[:, None, None], (t_bound, 9, 1)
        ),
        axis=2,
    )[..., 0]
    start = jnp.where(z_lo[:, None] >= 1, cp_j + start_lo, 0)
    end_hi = jnp.take_along_axis(
        ce_flat,
        jnp.broadcast_to(
            jnp.clip(z_hi + 2, 0, g)[:, None, None], (t_bound, 9, 1)
        ),
        axis=2,
    )[..., 0]
    end = jnp.where(z_hi[:, None] <= g - 2, cp_j + end_hi, cp_j + m_j + ca_j)
    # 128-floored fetch start (clamped so the widened window stays inside
    # the column); the lead lanes only add candidates, never hide one.
    fl = jnp.clip(start // _LANE * _LANE, 0, ccp_s - w_eff)
    window_truncated = jnp.sum(
        jnp.where(live[:, None], jnp.maximum(end - fl - w_eff, 0), 0)
    ).astype(jnp.int32)
    # z-wrap copies beyond wrap_cap are invisible to the selection —
    # certificate-gated like truncation (the aggregation side counts its
    # own misses per edge, but a hidden CANDIDATE never becomes an edge).
    wrap_hidden = (
        jnp.sum(jnp.maximum(jnp.take(gstart, (cols_iota + 1) * g)
                            - jnp.take(gstart, cols_iota * g + g - 1)
                            - wrap, 0))
        + jnp.sum(jnp.maximum(jnp.take(gstart, cols_iota * g + 1)
                              - jnp.take(gstart, cols_iota * g)
                              - wrap, 0))
    ).astype(jnp.int32)
    search_window_overflow = window_truncated + wrap_hidden

    # ---- The select kernel.
    codes2d, kth2d = pl.pallas_call(
        _dense_select_kernel(k, qb_s, w_eff, num_cand),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(t_bound,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (qb_s, _LANE), lambda t, c, wl, sxp, syp: (t, 0)
                ),
            ]
            + [
                # Element fetches: row offset c*8 (f32 sublane tile) and
                # lane offset wl*128 are the mul-by-tile forms Mosaic's
                # window-param pass can prove divisible.
                pl.BlockSpec(
                    (pl.Element(8), pl.Element(w_eff)),
                    lambda t, c, wl, sxp, syp, j=j: (
                        c[t * 9 + j] * 8, wl[t * 9 + j] * _LANE,
                    ),
                )
                for j in range(9)
            ],
            out_specs=[
                pl.BlockSpec(
                    (qb_s, _LANE), lambda t, c, wl, sxp, syp: (t, 0)
                ),
                pl.BlockSpec(
                    (qb_s, _LANE), lambda t, c, wl, sxp, syp: (t, 0)
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((t_bound * qb_s, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((t_bound * qb_s, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(
        cj.reshape(-1).astype(jnp.int32),
        (fl // _LANE).reshape(-1).astype(jnp.int32),
        sx_j.reshape(-1).astype(jnp.int32),
        sy_j.reshape(-1).astype(jnp.int32),
        jnp.asarray([box_f], jnp.float32),
        qtab,
        *([tab] * 9),
    )

    # ---- Rebase tile-window lanes -> absolute padded-column positions.
    codes_t = codes2d.reshape(t_bound, qb_s, _LANE)[..., :k]
    kth_t = kth2d.reshape(t_bound, qb_s, _LANE)[..., 0]
    j_t = codes_t // w_eff  # 9 for the no-pick sentinel
    wrow = codes_t - j_t * w_eff
    wsel = jnp.zeros_like(codes_t)
    for j in range(9):
        wsel = wsel + jnp.where(j_t == j, fl[:, j][:, None, None], 0)
    code_abs = jnp.where(j_t < 9, j_t * ccp_s + wsel + wrow, big_i)

    # ---- Scatter tile rows to slot rows / sorted rows. Dead rows get
    # UNIQUE out-of-range destinations (dropped) so unique_indices holds
    # exactly — a shared sentinel index would be a duplicate, and lying to
    # the scatter about uniqueness is undefined behavior on TPU.
    row_i = jnp.arange(qb_s, dtype=jnp.int32)[None, :]
    row_ok = live[:, None] & (row_i < rows_t[:, None])
    flat_i = jnp.arange(t_bound * qb_s, dtype=jnp.int32).reshape(
        t_bound, qb_s
    )
    slot_dst = jnp.where(
        row_ok, tile_col[:, None] * cc + tile_row0[:, None] + row_i,
        num_slots + flat_i,
    ).reshape(-1)
    offsets_abs = (
        jnp.full((num_slots, k), big_i, jnp.int32)
        .at[slot_dst]
        .set(code_abs.reshape(-1, k), mode="drop", unique_indices=True)
    )
    sort_dst = jnp.where(row_ok, abs0[:, None] + row_i, n + flat_i).reshape(
        -1
    )
    kth_sorted = (
        jnp.full((n,), -_DENSE_BIG, jnp.float32)
        .at[sort_dst]
        .set(kth_t.reshape(-1), mode="drop", unique_indices=True)
    )

    # ---- Rebase to the aggregation tiles' windows: both coordinate
    # systems are column-relative padded rows, so the lane offset is a
    # plain difference against the slot's aggregation-tile window start.
    slot_ids = jnp.arange(num_slots, dtype=jnp.int32)
    w_a_rows = jnp.take(w_loc_a, slot_ids // qb_a, axis=0)  # monotone rows
    j2 = jnp.minimum(offsets_abs // ccp_s, 9)
    p2 = offsets_abs - j2 * ccp_s
    wsel_a = jnp.zeros_like(offsets_abs)
    for j in range(9):
        wsel_a = wsel_a + jnp.where(j2 == j, w_a_rows[:, j][:, None], 0)
    rel = p2 - wsel_a
    picked = offsets_abs < big_i
    ok = picked & (rel >= 0) & (rel < w_cap)
    offsets = jnp.where(
        ok, j2 * w_cap + rel,
        jnp.where(picked, drop_sent, jnp.int32(width)),
    )
    return offsets, offsets_abs, kth_sorted, search_window_overflow


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "with_reverse", "s_build", "codes_cap", "interpret",
        "codes_layout", "dense_search", "num_neighbors",
    ),
)
def build_cellblock(
    positions: jnp.ndarray,
    neighbors: jnp.ndarray,
    box_size,
    spec: CellBlockSpec,
    with_reverse: bool = False,
    s_build: str = "auto",
    neighbor_codes: Optional[jnp.ndarray] = None,
    codes_cap: Optional[int] = None,
    codes_spill: Optional[tuple] = None,
    interpret: Optional[bool] = None,
    valid: Optional[jnp.ndarray] = None,
    codes_layout: str = "particle",
    dense_search: Optional[DenseSearchSpec] = None,
    num_neighbors: Optional[int] = None,
) -> CellBlockGraph:
    """Build the per-graph plan: binning, sort order, windows, S table(s).

    ``positions``/``neighbors`` are in ORIGINAL particle order (as produced
    by the k-NN backends); the returned plan's ``order`` defines the sorted
    order everything else uses.

    TPU note: everything here is sorts, merges, contiguous ops, row gathers
    and MXU contractions — elementwise scatters (60+ ms for a [500k] -> [1.4M]
    int table at config 4) are deliberately absent. The only large
    elementwise gather is the unavoidable ``aux[neighbors]`` id mapping.

    ``s_build`` selects how the S table(s) are materialized from the
    per-edge (j, offset) pairs:
      * ``"contract"`` — one-hot factors contracted on the MXU via XLA
        (works everywhere; writes a [rows, 9W] f32 transient per chunk —
        the dominant plan-build cost at small-N/re-neighbor-every-step
        scales: ~15 ms of the flagship step);
      * ``"kernel"`` — Pallas one-hot-accumulate kernels build the S rows
        (and, with ``with_reverse``, the reverse table) directly as int8
        (~1 ms at flagship scale; interpret-mode on CPU);
      * ``"auto"`` (default) — ``"kernel"`` on real TPU, else
        ``"contract"``.
    Both produce bit-identical tables (pinned by tests).

    ``neighbor_codes``/``codes_cap``: the Pallas kNN's per-neighbor
    candidate codes (``pallas_cell_list_knn(..., with_codes=True)``) and
    the cap they were packed with. MUST come from a kNN run on the SAME
    grid size as ``spec.grid_size`` (the caller asserts this — codes carry
    no grid tag); the tables are then bit-identical to the aux path while
    skipping its 16M-element gather (see the decode comment below).
    ``neighbors`` may be ``None`` when codes are given (the kernel's
    ``codes_only`` mode — the plan never reads neighbor ids on the codes
    path).

    ``codes_spill``: the kNN kernel's spill-block resolution tables
    ``(spill_cells, spill_ranks)`` (see ``pallas_cell_list_knn``). Codes
    ``>= 27 * codes_cap`` index this block; each resolves to the spilled
    particle's cell and in-cell stable-sort rank, from which its sender
    slot is derived exactly like a ring code's (the sorts share the key).

    ``codes_layout="table"`` (round 4): ``neighbor_codes`` is the kNN
    kernel's raw CELL-TABLE output ``[G^3 * codes_cap, k]`` (row
    ``cell * codes_cap + rank``; ``pallas_cell_list_knn(...,
    codes_layout="table")``). The slot layout visits table rows in
    ascending (col, cz, rank) order — the identical stable sort key — so
    the per-slot codes map becomes ONE quasi-monotone row gather,
    replacing the particle layout's inverse-permutation sort + ``[N, k]``
    row scatter here AND the kNN wrapper's random ``[N, k]`` re-order
    gather. ``codes_spill`` must then carry the kernel's third element
    (the solved spill queries' code picks), scattered into the spilled
    particles' own slots.

    ``valid``: optional ``[N]`` bool — rows marked False (padding slots of
    a halo shard's candidate buffer) are binned past every real cell: they
    occupy no slot, appear in no window, and are excluded from the
    ``overflow`` count. Senders listed in ``neighbors`` must be valid rows.

    Non-cubic grids (``spec.grid_x``): ``box_size`` may be a per-dimension
    ``[3]`` extent; positions must already live in the LOCAL frame
    ``[0, box_size_d)`` per dimension. ``periodic_x=False`` (halo slabs)
    requires every QUERY (= row with real neighbor entries) to sit at
    least one x-layer inside the grid. The codes path requires the default
    cubic periodic grid.
    """
    if s_build == "auto":
        s_build = "kernel" if jax.default_backend() == "tpu" else "contract"
    # "kernel_map": the round-3 kernel path (XLA lax.map decode +
    # _s_from_offsets) without the round-4 fused decode kernel — kept as a
    # measured A/B reference and fallback.
    force_map = s_build == "kernel_map"
    if force_map:
        s_build = "kernel"
    if s_build not in ("contract", "kernel"):
        raise ValueError(f"unknown s_build mode: {s_build}")
    if (neighbor_codes is None) != (codes_cap is None):
        raise ValueError("neighbor_codes and codes_cap go together")
    if dense_search is not None:
        # Fused dense-query kNN (round 5): the search runs HERE, against
        # the plan's own padded-column layout — no neighbor ids, no codes
        # decode. with_reverse decodes sender packs from the picks'
        # absolute padded positions (see the dense branch below).
        dense_search.validate()
        if num_neighbors is None:
            raise ValueError("dense_search requires num_neighbors")
        if neighbors is not None or neighbor_codes is not None:
            raise ValueError(
                "dense_search replaces the neighbor search — pass "
                "neighbors=None without codes"
            )
        if spec.variable or spec.grid_x or not spec.periodic_x:
            raise ValueError(
                "dense_search requires the uniform cubic periodic layout"
            )
        if valid is not None:
            raise ValueError("dense_search does not support a validity mask")
        if dense_search.window > _round_up(spec.padded_col, _LANE):
            raise ValueError(
                f"dense window {dense_search.window} exceeds the padded "
                f"column {_round_up(spec.padded_col, _LANE)}"
            )
    elif neighbors is None and neighbor_codes is None:
        raise ValueError("neighbors=None requires neighbor_codes")
    if codes_layout not in ("particle", "table"):
        raise ValueError(f"unknown codes_layout: {codes_layout}")
    if codes_layout == "table":
        if neighbor_codes is None:
            raise ValueError("codes_layout='table' requires neighbor_codes")
        if codes_spill is not None and len(codes_spill) != 3:
            raise ValueError(
                "codes_layout='table' needs the kNN kernel's 3-element "
                "spill info (cells, ranks, solved picks)"
            )
    spec.validate()
    g = spec.grid_size
    gxd = spec.gx  # x-cells (== g on the default cubic grid)
    cc, qb, w_cap, wrap = (spec.col_capacity, spec.query_block,
                           spec.window, spec.wrap_cap)
    tpc, ccp = spec.tiles_per_col, spec.padded_col
    num_cols, num_slots = spec.num_columns, spec.num_slots
    num_tiles = spec.num_tiles
    num_cells = num_cols * g
    n = positions.shape[0]
    if dense_search is not None:
        k = num_neighbors
    else:
        k = (neighbors if neighbors is not None else neighbor_codes).shape[1]
    if k > 127:
        raise ValueError(
            f"k={k} exceeds 127 — S-table entries are int8 multiplicity "
            "counts (an all-duplicate row could overflow)"
        )
    if neighbor_codes is not None and (spec.grid_x or not spec.periodic_x):
        raise ValueError(
            "the codes path requires the default cubic periodic grid "
            "(the kNN kernel's 27-roll candidate layout is cubic)"
        )

    grid_dims = jnp.asarray([gxd, g, g], jnp.float32)
    inv_cell = grid_dims / jnp.asarray(
        box_size, positions.dtype
    ).astype(jnp.float32)
    coords = jnp.clip(
        jnp.floor(positions * inv_cell).astype(jnp.int32),
        0,
        jnp.asarray([gxd - 1, g - 1, g - 1], jnp.int32),
    )
    col_id = coords[:, 0] * g + coords[:, 1]
    cz = coords[:, 2]
    cell_id = col_id * g + cz
    if valid is not None:
        # Invalid rows bin past every real cell: no slot, no window rows,
        # no overflow contribution.
        cell_id = jnp.where(valid, cell_id, num_cells)

    # One sort network carries the index payload; a separate
    # cell_id[order] permutation would be an elementwise gather (slow here).
    # The dense search additionally co-sorts the coordinates (a
    # positions[order] gather afterwards puts the size-3 axis minor-most —
    # lane-padded 42x on TPU; sort payloads are the round-3 fast path).
    sx = sy = sz = None
    if dense_search is not None:
        pos_f = positions.astype(jnp.float32)
        sorted_cell, order, sx, sy, sz = jax.lax.sort(
            (cell_id, jnp.arange(n, dtype=jnp.int32),
             pos_f[:, 0], pos_f[:, 1], pos_f[:, 2]),
            num_keys=1, is_stable=True,
        )
    else:
        sorted_cell, order = jax.lax.sort(
            (cell_id, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
            is_stable=True,
        )
    sorted_col = sorted_cell // g
    sorted_cz = sorted_cell % g

    # Per-cell / per-column boundaries of the sorted stream (scatter +
    # suffix-min; searchsorted's binary search / method="sort" are both
    # slower on this backend — see ops/binning.py:bucket_boundaries). With
    # a validity mask the invalid rows form one extra trailing bucket,
    # sliced off here (gstart[num_cells] is then the valid-row count).
    if valid is None:
        gstart = bucket_boundaries(sorted_cell, num_cells)  # [cells + 1]
    else:
        gstart = bucket_boundaries(sorted_cell, num_cells + 1)[
            : num_cells + 1
        ]
    col_start = gstart[:: g]  # [cols + 1] (gstart[c*G] == column start)
    counts = (gstart[1:] - gstart[:-1]).reshape(num_cols, g)
    col_cnt = col_start[1:] - col_start[:-1]

    # Compact per-column rank (z-ordered) and the slot table maps.
    real_row = sorted_col < num_cols  # False only for invalid rows
    r = jnp.arange(n, dtype=jnp.int32) - jnp.take(
        col_start, jnp.minimum(sorted_col, num_cols)
    )
    col_cnt_raw = col_start[1:] - col_start[:-1]
    slot_ids_i = jnp.arange(num_slots, dtype=jnp.int32)
    pack_slots = spec.pack_slots
    if spec.variable:
        # VARIABLE layout (round 4): column `col` owns rows
        # [prefix[col], prefix[col] + cap_col[col]) of the slot table,
        # cap_col = round_up(min(cnt, CC), QB) clamped by the budget. The
        # QB-aligned prefixes keep tiles single-column, so every per-tile
        # structure below (windows, S blocks, reverse) carries over; CC is
        # only the per-column clamp. All maps keyed by sorted_col or by
        # slot id are MONOTONE gathers (fast on this backend — unlike
        # elementwise ones).
        used_raw = jnp.minimum(col_cnt_raw, cc)
        alloc = -(-used_raw // qb) * qb
        prefix = jnp.minimum(
            jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(alloc)]
            ),
            num_slots,
        ).astype(jnp.int32)
        cap_col = prefix[1:] - prefix[:-1]
        used_cols = jnp.minimum(used_raw, cap_col)
        col_clamped = jnp.minimum(sorted_col, num_cols - 1)
        q_ok = real_row & (r < jnp.take(cap_col, col_clamped))
        slot_of_sorted = jnp.where(
            q_ok, jnp.take(prefix, col_clamped) + r, num_slots
        )
        # PACK encoding (col * CC + r): what the sender-decode tables use —
        # ring/cell arithmetic recovers (col, r) by the static CC stride,
        # which real slot ids no longer admit.
        pack_of_sorted = jnp.where(
            q_ok, sorted_col * cc + r, pack_slots
        )
        overflow = jnp.sum(real_row & ~q_ok).astype(jnp.int32)
        # slot -> column by boundary scatter + cumsum (col_of_slot[s] =
        # #{col : prefix[col + 1] <= s}); reserve rows past prefix[-1] get
        # num_cols.
        marks = (
            jnp.zeros((num_slots + 1,), jnp.int32)
            .at[jnp.minimum(prefix[1:], num_slots)]
            .add(1, mode="drop")
        )
        col_of_slot = jnp.cumsum(marks)[:num_slots]
        csl = jnp.minimum(col_of_slot, num_cols - 1)
        prefix_of_slot = jnp.take(prefix, csl)
        slot_r_var = slot_ids_i - prefix_of_slot
        in_use = (col_of_slot < num_cols) & (
            slot_r_var < jnp.take(used_cols, csl)
        )
        particle_of_slot = jnp.where(
            in_use, jnp.take(col_start[:-1], csl) + slot_r_var, n
        )
        if neighbor_codes is None:
            _, pack_of_particle = jax.lax.sort_key_val(order, pack_of_sorted)
    else:
        q_ok = real_row & (r < cc)
        slot_of_sorted = jnp.where(q_ok, sorted_col * cc + r, num_slots)
        overflow = jnp.sum(real_row & (r >= cc)).astype(jnp.int32)
        if neighbor_codes is None:
            # Only the aux path needs the inverse permutation; the codes
            # path decodes sender slots arithmetically.
            _, pack_of_particle = jax.lax.sort_key_val(order, slot_of_sorted)
        # slot -> sorted index by ARITHMETIC (column col's particles pack
        # at [col_start[col], ...), so slot (col, r) holds
        # col_start[col] + r iff r < count) — no searchsorted over all
        # slots, and exact under column overflow (the first CC particles
        # of the column by sort order).
        slot_col = slot_ids_i // cc
        slot_r = slot_ids_i % cc
        particle_of_slot = jnp.where(
            slot_r < jnp.take(col_cnt_raw, slot_col),
            jnp.take(col_start[:-1], slot_col) + slot_r,
            n,
        )

    # Per-column z-wrap layout [cP | main | cA], tightly packed.
    m = (
        used_cols if spec.variable else jnp.minimum(col_cnt, cc)
    )  # used main rows
    cnt_last = counts[:, g - 1]
    cnt_first = counts[:, 0]
    c_pre = jnp.minimum(cnt_last, wrap)
    c_app = jnp.minimum(cnt_first, wrap)
    # Compact start of each z-cell within its column, clipped by capacity;
    # extended so index G reads the used-row count.
    cstart_rel = jnp.clip(
        gstart[: num_cols * g].reshape(num_cols, g) - col_start[:-1, None],
        0,
        cap_col[:, None] if spec.variable else cc,
    )
    cstart_ext = jnp.concatenate([cstart_rel, m[:, None]], axis=1)  # [C, G+1]
    cstart_g1 = cstart_rel[:, g - 1]

    if spec.variable:
        # Variable z-wrap image: column `col` spans padded rows
        # [pprefix[col], pprefix[col] + span[col]), span 16-aligned so the
        # 16-floored window starts stay provably sublane-aligned. Row ->
        # column by the same boundary-scatter trick as col_of_slot; the
        # relative 3-way [cP | main | cA] decode matches the uniform path.
        span = -(-(c_pre + m + c_app) // 16) * 16
        num_pad_rows = spec.num_padded
        pprefix = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(span)]
        ).astype(jnp.int32)
        pmarks = (
            jnp.zeros((num_pad_rows + 1,), jnp.int32)
            .at[jnp.minimum(pprefix[1:], num_pad_rows)]
            .add(1, mode="drop")
        )
        pcol = jnp.cumsum(pmarks)[:num_pad_rows]
        pcsl = jnp.minimum(pcol, num_cols - 1)
        t_rel = jnp.arange(num_pad_rows, dtype=jnp.int32) - jnp.take(
            pprefix, pcsl
        )
        cpre_r = jnp.take(c_pre, pcsl)
        m_r = jnp.take(m, pcsl)
        capp_r = jnp.take(c_app, pcsl)
        cg1_r = jnp.take(cstart_g1, pcsl)
        cap_r = jnp.take(cap_col, pcsl)
        src_v = jnp.where(
            t_rel < cpre_r,
            cg1_r + t_rel,
            jnp.where(
                t_rel < cpre_r + m_r,
                t_rel - cpre_r,
                jnp.where(
                    t_rel < cpre_r + m_r + capp_r,
                    t_rel - cpre_r - m_r,
                    cap_r,
                ),
            ),
        )
        ok_src = (pcol < num_cols) & (src_v < cap_r) & (src_v >= 0)
        pad_src = jnp.where(
            ok_src, jnp.take(prefix, pcsl) + src_v, num_slots
        )
    else:
        # pad_src: padded-image row -> source slot.
        t_pad = jnp.arange(ccp, dtype=jnp.int32)[None, :]  # [1, CCp]
        src_pre = cstart_g1[:, None] + t_pad
        src_main = t_pad - c_pre[:, None]
        src_app = t_pad - c_pre[:, None] - m[:, None]
        src = jnp.where(
            t_pad < c_pre[:, None],
            src_pre,
            jnp.where(
                t_pad < (c_pre + m)[:, None],
                src_main,
                jnp.where(t_pad < (c_pre + m + c_app)[:, None], src_app, cc),
            ),
        )
        cols = jnp.arange(num_cols, dtype=jnp.int32)[:, None]
        pad_src = jnp.where(
            src < cc, cols * cc + src, num_slots
        ).reshape(-1)

    # Per-tile z extents (first/last VALID query row of the tile).
    if spec.variable:
        # Tiles are single-column by the QB-aligned prefixes: tile t owns
        # slots [t*QB, (t+1)*QB) of column col_of_slot[t*QB]; reserve tiles
        # past the used prefix have no rows.
        tile_col_raw = col_of_slot[::qb]  # [num_tiles] strided slice
        tile_col = jnp.minimum(tile_col_raw, num_cols - 1)
        a_row = slot_ids_i[::qb] - jnp.take(prefix, tile_col)
        m_tile = jnp.take(m, tile_col)
        has_rows = (tile_col_raw < num_cols) & (a_row < m_tile)
        b_row = jnp.clip(jnp.minimum(a_row + qb, m_tile) - 1, a_row, None)
    else:
        tile_col = jnp.arange(num_tiles, dtype=jnp.int32) // tpc
        tile_qt = jnp.arange(num_tiles, dtype=jnp.int32) % tpc
        a_row = tile_qt * qb
        m_tile = jnp.take(m, tile_col)
        has_rows = a_row < m_tile
        b_row = jnp.clip(
            jnp.minimum((tile_qt + 1) * qb, m_tile) - 1, a_row, None
        )
    base = jnp.take(col_start, tile_col)
    z_lo = jnp.take(sorted_cz, jnp.clip(base + a_row, 0, n - 1))
    z_hi = jnp.take(sorted_cz, jnp.clip(base + b_row, 0, n - 1))
    z_lo = jnp.where(has_rows, z_lo, 0)
    z_hi = jnp.where(has_rows, z_hi, 0)

    # Neighbor columns of each tile (3x3 ring; x open on halo slabs —
    # edge-column clamps are never referenced by a real edge because
    # queries sit at least one layer inside).
    gx_t = tile_col // g
    gy_t = tile_col % g
    dxy = jnp.arange(9, dtype=jnp.int32)
    if spec.periodic_x:
        colx_j = (gx_t[:, None] + dxy[None, :] // 3 - 1) % gxd
    else:
        colx_j = jnp.clip(
            gx_t[:, None] + dxy[None, :] // 3 - 1, 0, gxd - 1
        )
    col_j = (
        colx_j * g + (gy_t[:, None] + dxy[None, :] % 3 - 1) % g
    )  # [num_tiles, 9]
    cp_j = jnp.take(c_pre, col_j)
    m_j = jnp.take(m, col_j)
    ca_j = jnp.take(c_app, col_j)
    cg1_j = jnp.take(cstart_g1, col_j)
    start_lo = jnp.take_along_axis(
        jnp.take(cstart_ext, col_j.reshape(-1), axis=0).reshape(
            num_tiles, 9, g + 1
        ),
        jnp.broadcast_to(
            jnp.clip(z_lo - 1, 0, g)[:, None, None], (num_tiles, 9, 1)
        ),
        axis=2,
    )[..., 0]
    w_loc = jnp.where(z_lo[:, None] >= 1, cp_j + start_lo, 0)
    end_hi = jnp.take_along_axis(
        jnp.take(cstart_ext, col_j.reshape(-1), axis=0).reshape(
            num_tiles, 9, g + 1
        ),
        jnp.broadcast_to(
            jnp.clip(z_hi + 2, 0, g)[:, None, None], (num_tiles, 9, 1)
        ),
        axis=2,
    )[..., 0]
    end = jnp.where(
        z_hi[:, None] <= g - 2, cp_j + end_hi, cp_j + m_j + ca_j
    )
    # Floor starts to 16-row alignment (sublane tiling of the bf16/f32
    # candidate windows — unaligned Element offsets cost Mosaic re-align
    # copies); the chooser's tail slack absorbs the <=15 extra lead rows,
    # and padded_col - window is 16-aligned so the upper clamp stays
    # aligned too. (Variable mode: spans and prefixes are 16-aligned and
    # the window is a 16-multiple, so the clamped flat start stays
    # provable; a span shorter than the window reads into the next
    # column's rows, which no S entry references — rel offsets are bounded
    # by the span.)
    if spec.variable:
        span_j = jnp.take(span, col_j)
        w_loc = jnp.clip(
            w_loc // 16 * 16, 0, jnp.maximum(span_j - w_cap, 0)
        )
        window_starts = (jnp.take(pprefix, col_j) + w_loc).astype(jnp.int32)
        # In-column extent of each window: columns pack contiguously, so a
        # window whose column span is shorter than W bleeds into the next
        # column's rows. Forward S entries never reference those offsets
        # (rel < span by construction), but the REVERSE build enumerates
        # window rows as candidate receivers and must not match them.
        window_lims = jnp.clip(span_j - w_loc, 0, w_cap).astype(jnp.int32)
    else:
        w_loc = jnp.clip(w_loc // 16 * 16, 0, ccp - w_cap)
        window_starts = (col_j * ccp + w_loc).astype(jnp.int32)
        # Uniform columns own a full CCp-row block with W <= CCp: windows
        # never bleed (w_loc <= CCp - W), so the limit is inert.
        window_lims = jnp.full((num_tiles, 9), w_cap, jnp.int32)
    window_overflow = jnp.max(
        jnp.where(has_rows[:, None], end - w_loc - w_cap, 0)
    ).astype(jnp.int32)
    window_overflow = jnp.maximum(window_overflow, 0)

    if dense_search is not None:
        # ---- Fused dense-query kNN (round 5): search + S build in one
        # pass over the plan's own layout. Early return — the codes/aux
        # decode machinery below has nothing left to do.
        from cosmology_gnn_simulation_tpu.ops.cell_list import (
            CellGrid,
            window_margin_sq,
        )

        interp = (
            interpret if interpret is not None
            else jax.default_backend() != "tpu"
        )
        r_cell = jnp.arange(n, dtype=jnp.int32) - jnp.take(
            gstart, sorted_cell
        )
        (offsets, offsets_abs, kth_sorted,
         search_window_overflow) = _dense_search_offsets(
            spec, dense_search, k, n, box_size,
            sx, sy, sz, sorted_col, sorted_cz, r, r_cell,
            gstart, col_start, m, c_pre, c_app, cstart_ext,
            w_loc, interp,
        )
        s_table = _s_from_offsets(offsets, spec, interp)
        dropped = jnp.sum(offsets == spec.s_width + 1).astype(jnp.int32)
        margin = window_margin_sq(
            jnp.stack([sx, sy, sz], axis=1), box_size,
            CellGrid(grid_size=g, cell_capacity=0),
        )
        search_excess = jnp.max(kth_sorted - margin)
        s_rev_table = None
        reverse_mismatch = None
        if with_reverse:
            # Training: sender PACK ids (col * CC + rank) by segment-
            # decoding each pick's absolute padded position against its
            # sender column's [cP | main | cA] layout — the reverse build
            # consumes packs only (the cz component of the aux encoding is
            # discarded there). reverse_mismatch == 0 certifies S_rev is
            # the exact transpose, as on the codes path.
            ccp_se = _round_up(2 * wrap + cc, _LANE)
            slot_ids2 = jnp.arange(num_slots, dtype=jnp.int32)
            ta = slot_ids2 // qb
            j2 = jnp.minimum(offsets_abs // ccp_se, 9)
            p2 = offsets_abs - j2 * ccp_se

            def sel9(tbl):
                rows = jnp.take(tbl, ta, axis=0)  # monotone row gather
                out = jnp.zeros_like(offsets_abs)
                for j in range(9):
                    out = out + jnp.where(j2 == j, rows[:, j][:, None], 0)
                return out

            col_s = sel9(col_j)
            cp_s = sel9(cp_j)
            m_s = sel9(m_j)
            cg1_s = sel9(cg1_j)
            is_pre = p2 < cp_s
            is_main = ~is_pre & (p2 < cp_s + m_s)
            rank = jnp.where(
                is_pre, cg1_s + p2,
                jnp.where(is_main, p2 - cp_s, p2 - cp_s - m_s),
            )
            edge_ok = offsets < spec.s_width
            sender_pack = jnp.where(
                edge_ok & (rank >= 0) & (rank < cc),
                col_s * cc + rank, spec.pack_slots,
            )
            main_pos_slot = (
                (slot_ids2 // cc) * ccp
                + jnp.take(c_pre, slot_ids2 // cc)
                + slot_ids2 % cc
            )
            tile_pack_base = jnp.arange(num_tiles, dtype=jnp.int32) * qb
            s_rev_table, rev_total = _build_reverse_table(
                sender_pack, pad_src, window_starts, window_lims,
                main_pos_slot, tile_pack_base, spec.pack_slots, spec,
                mode=s_build, interpret=interp,
            )
            fwd_total = jnp.sum(s_table.astype(jnp.int32)).astype(jnp.int32)
            reverse_mismatch = fwd_total - rev_total
        return CellBlockGraph(
            order=order,
            slot_of_sorted=slot_of_sorted,
            particle_of_slot=particle_of_slot,
            pad_src=pad_src,
            window_starts=window_starts,
            s_table=s_table,
            overflow=overflow,
            dropped_edges=dropped,
            window_overflow=window_overflow,
            s_rev_table=s_rev_table,
            reverse_mismatch=reverse_mismatch,
            search_excess=search_excess,
            search_window_overflow=search_window_overflow,
        )

    # ---- Forward S table --------------------------------------------------
    # The codes path fuses the sender-slot decode into the S tile sweep
    # when the reverse table is not needed (rollout): one lax.map pass,
    # no [num_slots, k] decoded-aux or [num_slots, 27] start-row
    # intermediates. Training (with_reverse) still materializes the
    # decoded sender slots because the reverse build consumes them.
    fuse_codes = neighbor_codes is not None and not with_reverse
    nbr_aux_slots = None
    if neighbor_codes is not None:
        # Arithmetic decode of the Pallas kNN's candidate codes
        # (j27 * cap + rank): the neighbor's cell is the query's cell plus
        # the code's (dx,dy,dz) in {-1,0,1}^3, and its per-column slot rank
        # is (clipped compact cell start) + (its stable-sort rank within
        # the cell) — the kNN binning sorts by the IDENTICAL key, so ranks
        # agree. Replaces the aux build's full sort_key_val + the
        # pathological 16M-element aux[neighbors] gather + the [N, k] row
        # permutation (143 + 35 + 32 ms at config 4:
        # benchmarks/results/cb_parts_r3.json).
        spill_len = 0 if codes_spill is None else codes_spill[0].shape[0]
        # Always-invalid sentinel for unoccupied slots: past the ring AND
        # the spill block (27 * codes_cap itself is a real spill code when
        # the spill block is active).
        code_sentinel = 27 * codes_cap + spill_len
        sp_aux = None
        sp_slot_q = sp_code_picks = None
        if spill_len:
            # Per spill candidate: packed sender aux (slot * G + cz), the
            # same convention as the aux path — derived from its cell and
            # in-cell rank (unused slots carry rank 2**20 -> the overflow
            # sentinel). Tiny [spill_len] arrays, computed once.
            sp_cells_t, sp_ranks_t = codes_spill[0], codes_spill[1]
            sp_cells_t = jnp.clip(sp_cells_t, 0, g**3 - 1)
            sp_col = sp_cells_t // g
            sp_cz = sp_cells_t % g
            sp_start = jnp.take(cstart_rel.reshape(-1), sp_cells_t)
            sp_rs = sp_start + sp_ranks_t
            sp_slot = jnp.where(
                sp_rs < cc, sp_col * cc + sp_rs, pack_slots
            )
            sp_aux = sp_slot * g + jnp.where(sp_rs < cc, sp_cz, 0)
            if codes_layout == "table":
                # The spilled particle's OWN slot (real slot id, not the
                # pack encoding): its codes row comes from the kernel's
                # solved spill picks, not from the table (it owns no table
                # row). Unused spill slots carry rank 2**20 -> an
                # out-of-range target, dropped by the scatter.
                sp_code_picks = codes_spill[2].astype(jnp.int32)
                if spec.variable:
                    sp_in = sp_rs < jnp.take(cap_col, sp_col)
                    sp_slot_q = jnp.where(
                        sp_in, jnp.take(prefix, sp_col) + sp_rs, num_slots
                    )
                else:
                    sp_slot_q = jnp.where(
                        sp_rs < cc, sp_col * cc + sp_rs, num_slots
                    )
        p_iota = jnp.arange(n, dtype=jnp.int32)
        if codes_layout == "table":
            # Per-slot codes by ONE quasi-monotone row gather straight out
            # of the kNN kernel's cell-table output: slot (col, r) holds
            # the column's r-th particle = table row
            # cell * cap + (in-cell rank), and slot order ascends through
            # (col, cz, rank) — the gather indices are non-decreasing
            # (monotone row gathers run ~2x the random rate on this
            # backend). Replaces the particle layout's inverse-permutation
            # N-key sort + [N, k] row scatter below AND the kNN wrapper's
            # random [N, k] re-order gather. The per-slot table row rides
            # the same sorted-order scatter pattern as qz_slot.
            exp_rows = num_cells * codes_cap
            if neighbor_codes.shape[0] != exp_rows:
                raise ValueError(
                    f"table-layout codes have {neighbor_codes.shape[0]} "
                    f"rows, expected G^3*cap = {exp_rows}"
                )
            cellrank = p_iota - jnp.take(
                gstart, jnp.minimum(sorted_cell, num_cells)
            )
            # Overflowed particles (in-cell rank >= cap) read their cell's
            # clamped last row — identical to the particle-layout wrapper's
            # table_row clamp (loud via the kNN overflow count; under the
            # spill design their rows are overwritten by the spill scatter
            # below).
            trow_sorted = jnp.minimum(sorted_cell, num_cells - 1) * (
                codes_cap
            ) + jnp.clip(cellrank, 0, codes_cap - 1)
            slot_idx_sorted = jnp.where(
                slot_of_sorted < num_slots, slot_of_sorted, num_slots + p_iota
            )
            trow_slot = (
                jnp.full((num_slots,), exp_rows, jnp.int32)
                .at[slot_idx_sorted]
                .set(trow_sorted, mode="drop", unique_indices=True)
            )
            codes_tbl_ext = jnp.concatenate(
                [neighbor_codes.astype(jnp.int32),
                 jnp.full((1, k), code_sentinel, jnp.int32)]
            )
            codes_slots = jnp.take(
                codes_tbl_ext, trow_slot, axis=0, mode="clip"
            )  # [num_slots, k]
            if sp_slot_q is not None:
                # Spilled particles own no table row: inject the kernel's
                # solved picks at their slots (tiny [spill_len, k] scatter).
                codes_slots = codes_slots.at[sp_slot_q].set(
                    sp_code_picks, mode="drop"
                )
        else:
            # Per-slot codes by ROW SCATTER through each particle's slot
            # id — table scatters are fast on this backend, while the
            # round-3 two-level gather (order[particle_of_slot] -> codes
            # row gather) cost ~2.4 ms of the 6.4 ms flagship plan
            # (planparts_r4.json). Slotless rows (column overflow) all
            # write the discarded row num_slots; empty slots keep the
            # sentinel fill.
            _, slot_of_particle_codes = jax.lax.sort_key_val(
                order, slot_of_sorted
            )
            # Slotless particles get unique out-of-range indices (dropped)
            # so unique_indices holds exactly (the bucket_boundaries
            # pattern).
            slot_idx = jnp.where(
                slot_of_particle_codes < num_slots,
                slot_of_particle_codes,
                num_slots + p_iota,
            )
            codes_slots = (
                jnp.full((num_slots, k), code_sentinel, jnp.int32)
                .at[slot_idx]
                .set(neighbor_codes.astype(jnp.int32), mode="drop",
                     unique_indices=True)
            )  # [num_slots, k]
        # Clipped compact starts of each cell's 27 neighbors (periodic
        # rolls of the [G, G, G] start table — no gathers).
        cstart3 = cstart_rel.reshape(g, g, g)
        cstart27 = jnp.stack(
            [
                jnp.roll(cstart3, (-dx, -dy, -dz), axis=(0, 1, 2))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                for dz in (-1, 0, 1)
            ],
            axis=-1,
        ).reshape(g**3, 27)
        # Per-slot query z-cell by the same scatter pattern — but in SORTED
        # order (sorted_cz rows pair with slot_of_sorted, not slot_idx):
        # the previous elementwise take through particle_of_slot is a
        # pathological 92k-element gather on this backend. Empty slots keep
        # 0, matching the old clip-take semantics.
        slot_idx_sorted = jnp.where(
            slot_of_sorted < num_slots, slot_of_sorted, num_slots + p_iota
        )
        qz_slot = (
            jnp.zeros((num_slots,), jnp.int32)
            .at[slot_idx_sorted]
            .set(sorted_cz, mode="drop", unique_indices=True)
        )
        # Per-slot query column: arithmetic in the uniform layout, the
        # boundary-scan map in the variable one (reserve slots clamp to a
        # real column; their codes are sentinels, so nothing decodes).
        col_q_slot = csl if spec.variable else slot_ids_i // cc
    if neighbor_codes is not None and not fuse_codes:
        start27_rows = jnp.take(
            cstart27, col_q_slot * g + qz_slot, axis=0
        )  # [num_slots, 27]

        def decode_tile(args):
            codes_t, s27_t, qz_t, col_t = args
            rows = codes_t.shape[0]
            j27 = codes_t // codes_cap
            rank = codes_t % codes_cap
            valid = j27 < 27
            j27c = jnp.where(valid, j27, 0)
            oh = j27c[:, :, None] == jnp.arange(27, dtype=jnp.int32)
            start = jnp.sum(
                jnp.where(oh, s27_t.reshape(rows, 1, 27), 0), axis=2
            )  # exact integer one-hot select (f32 einsum would corrupt)
            dx = j27c // 9 - 1
            dy = (j27c // 3) % 3 - 1
            dz = j27c % 3 - 1
            gx = col_t // g
            gy = col_t % g
            scol = (
                ((gx[:, None] + dx + g) % g) * g
                + (gy[:, None] + dy + g) % g
            )
            scz = (qz_t[:, None] + dz + g) % g
            sr = start + rank
            ok = valid & (sr < cc)
            slot = jnp.where(ok, scol * cc + sr, pack_slots)  # PACK id
            aux = slot * g + jnp.where(ok, scz, 0)
            if sp_aux is not None:
                # Spill codes (>= 27 * codes_cap, < sentinel) resolve
                # through the precomputed spill aux table — selected by an
                # exact integer one-hot broadcast (a per-edge jnp.take here
                # is a pathological TPU elementwise gather: measured
                # +13.8 ms/step at the flagship spec), gated by a real
                # lax.cond (lax.map is a scan, not vmap): tiles without
                # spill codes — ALL tiles on uniform data — skip it.
                sp_idx = codes_t - 27 * codes_cap
                is_sp = (sp_idx >= 0) & (sp_idx < spill_len)

                def _with_sp(aux):
                    oh_sp = sp_idx[:, :, None] == jnp.arange(
                        spill_len, dtype=jnp.int32
                    )
                    aux_sp = jnp.sum(jnp.where(oh_sp, sp_aux, 0), axis=2)
                    return jnp.where(is_sp, aux_sp, aux)

                aux = jax.lax.cond(
                    jnp.any(is_sp), _with_sp, lambda a: a, aux
                )
            return aux

        tile0 = min(_S_BUILD_TILE, num_slots)
        pad0 = (-num_slots) % tile0
        dec_arrays = [codes_slots, start27_rows, qz_slot, col_q_slot]
        if pad0:
            dec_arrays = [
                jnp.pad(a, ((0, pad0),) + ((0, 0),) * (a.ndim - 1))
                for a in dec_arrays
            ]
        num0 = (num_slots + pad0) // tile0
        nbr_aux_slots = jax.lax.map(
            decode_tile,
            tuple(
                a.reshape((num0, tile0) + a.shape[1:]) for a in dec_arrays
            ),
        ).reshape(num0 * tile0, k)[:num_slots]
    elif neighbor_codes is None:
        # Packed sender aux (slot * G + cz) in original particle order,
        # then the one unavoidable big elementwise gather through the
        # neighbor table. Neighbor entries >= N are no-edge sentinels
        # (halo shards pad candidate rows without neighbor lists): the
        # appended sentinel aux row decodes to "no sender".
        aux = pack_of_particle * g + jnp.where(
            pack_of_particle < pack_slots, cz, 0
        )
        aux_ext = jnp.concatenate(
            [aux, jnp.full((1,), pack_slots * g, aux.dtype)]
        )
        nbr_aux = jnp.take(
            jnp.take(
                aux_ext, neighbors.reshape(-1), mode="clip"
            ).reshape(n, k),
            order, axis=0,
        )  # [N(sorted rows), k]

        # The S build runs DIRECTLY on slot rows (rows = slots; padding
        # rows read a sentinel line and produce zero S rows): building a
        # compact [N, 9W] table first and expanding it costs two extra
        # full-table transients (~4.4 GB at config-4 scale — the round-3
        # train-step OOM).
        nbr_aux_slots = jnp.take(
            jnp.concatenate(
                [nbr_aux, jnp.full((1, k), num_slots * g, nbr_aux.dtype)]
            ),
            particle_of_slot, axis=0, mode="clip",
        )  # [num_slots, k]
    occupied = particle_of_slot < n
    slot_ids = jnp.arange(num_slots, dtype=jnp.int32)
    # Per-(tile, j) constants, replicated QB-fold to slot rows by a pure
    # broadcast-reshape (tiles are slot-aligned: num_tiles * QB ==
    # num_slots) — a take() here is a 92k-row expansion gather for data
    # XLA can materialize with no gather at all.
    const = jnp.stack([w_loc, cp_j, m_j, ca_j, cg1_j], axis=2).astype(
        jnp.int32
    )  # [num_tiles, 9, 5]
    const_rows = jnp.broadcast_to(
        const.reshape(num_tiles, 1, 45), (num_tiles, qb, 45)
    ).reshape(num_slots, 45)  # [num_slots, 45]

    lo_w = min(_LANE, w_cap)
    hi_w = w_cap // lo_w

    col_q_all = csl if spec.variable else slot_ids // cc
    gx_q = col_q_all // g
    gy_q = col_q_all % g

    def s_tile(args):
        nbr_t, const_t, gxq_t, gyq_t, qok_t = args
        rows = nbr_t.shape[0]
        s_slot = nbr_t // g  # PACK id (col * CC + r) — static-CC stride
        s_cz = nbr_t % g
        real = s_slot < pack_slots
        col_s = s_slot // cc
        r_s = s_slot % cc
        if spec.periodic_x:
            dx = (col_s // g - gxq_t[:, None] + 1 + gxd) % gxd
        else:
            dx = col_s // g - gxq_t[:, None] + 1
        dy = (col_s % g - gyq_t[:, None] + 1 + g) % g
        in3 = (dx >= 0) & (dx < 3) & (dy < 3) & real
        j = jnp.where(in3, dx * 3 + dy, 9)
        oh_j = j[:, :, None] == jnp.arange(9, dtype=jnp.int32)  # [rows, k, 9]
        # Select the 5 per-(tile, j) constants via the j one-hot in EXACT
        # integer arithmetic. (An f32 einsum here silently corrupts on TPU:
        # the MXU downcasts f32 operands to bf16 by default, and the
        # constants exceed bf16's 256-integer exactness range — measured as
        # ~0.025% dropped/misplaced edges at config-4 scale.)
        sel = jnp.sum(
            jnp.where(oh_j[:, :, :, None],
                      const_t.astype(jnp.int32).reshape(rows, 1, 9, 5), 0),
            axis=2,
        )  # [rows, k, 5] int32
        w_s, cp_s, m_s, ca_s, cg1_s = (
            sel[..., 0], sel[..., 1], sel[..., 2], sel[..., 3], sel[..., 4]
        )
        # Capacity against the sender column's USED rows m_s (uniform:
        # always true for real packs, so bit-identical; variable: a pack
        # rank in [m, CC) names a slot the column does not own).
        in3 = in3 & (r_s < m_s)
        rel_main = cp_s + r_s - w_s
        ok_main = in3 & (rel_main >= 0) & (rel_main < w_cap)
        rank_pre = r_s - cg1_s
        rel_pre = rank_pre - w_s
        ok_pre = (
            in3 & (s_cz == g - 1) & (rank_pre < cp_s)
            & (rel_pre >= 0) & (rel_pre < w_cap)
        )
        rel_app = cp_s + m_s + r_s - w_s
        ok_app = (
            in3 & (s_cz == 0) & (r_s < ca_s)
            & (rel_app >= 0) & (rel_app < w_cap)
        )
        use_pre = ok_pre & ~ok_main
        use_app = ok_app & ~ok_main & ~ok_pre
        off = jnp.where(
            ok_main, rel_main, jnp.where(use_pre, rel_pre, rel_app)
        )
        valid = (qok_t[:, None]) & (ok_main | ok_pre | ok_app)
        dropped = jnp.sum(
            qok_t[:, None] & real & ~(ok_main | ok_pre | ok_app)
        ).astype(jnp.int32)
        if s_build == "kernel":
            # Packed flat S-lane index per edge; the Pallas one-hot-
            # accumulate kernel scatters these into int8 rows.
            packed = jnp.where(
                valid, j * w_cap + off, jnp.int32(9 * w_cap)
            ).astype(jnp.int32)
            return packed, dropped
        jh = j * hi_w + jnp.clip(off // lo_w, 0, hi_w - 1)
        s = _onehot_contract(
            jnp.where(valid, jh, -1), off % lo_w, valid, 9 * hi_w, lo_w
        )
        return s, dropped

    # Round 4: the codes-path S build moves ENTIRELY into one Pallas pass
    # (_s_from_codes_fused) when the packed aux row fits one lane tile —
    # the XLA lax.map decode below (one-hot 27-select + 9x5 const select
    # per edge) was ~5 ms of the 6.7 ms flagship plan build. Spill codes
    # are pre-normalized here (rare path, gated by a real lax.cond) into a
    # self-describing packing the kernel decodes arithmetically.
    use_fused_kernel = fuse_codes and s_build == "kernel" and not force_map
    if use_fused_kernel:
        res_base = 27 * codes_cap
        ccg = cc * g
        drop_mark = res_base + 9 * ccg
        invalid = drop_mark + 1

        def _invalidate(codes):
            # No live spill codes: everything at/above the ring range is a
            # sentinel (or an unused spill lane) — never a real edge.
            return jnp.where(codes >= res_base, invalid, codes)

        if sp_aux is not None:

            def _resolve_tile(args):
                codes_t, gxq_t, gyq_t = args
                sp_idx = codes_t - res_base
                is_sp = (sp_idx >= 0) & (sp_idx < spill_len)
                oh = sp_idx[:, :, None] == jnp.arange(
                    spill_len, dtype=jnp.int32
                )
                aux_sp = jnp.sum(jnp.where(oh, sp_aux, 0), axis=2)
                slot_sp = aux_sp // g
                real = is_sp & (slot_sp < pack_slots)
                col_sp = slot_sp // cc
                dxm = (col_sp // g - gxq_t[:, None] + 1 + g) % g
                dym = (col_sp % g - gyq_t[:, None] + 1 + g) % g
                in3 = real & (dxm < 3) & (dym < 3)
                packed_sp = (
                    res_base + (dxm * 3 + dym) * ccg
                    + (slot_sp % cc) * g + aux_sp % g
                )
                v = jnp.where(
                    in3, packed_sp, jnp.where(real, drop_mark, invalid)
                )
                return jnp.where(is_sp, v, _invalidate(codes_t))

            def _resolve(codes):
                tile0 = min(_S_BUILD_TILE, num_slots)
                pad0 = (-num_slots) % tile0
                arrs = [codes, gx_q, gy_q]
                if pad0:
                    arrs = [
                        jnp.pad(a, ((0, pad0),) + ((0, 0),) * (a.ndim - 1))
                        for a in arrs
                    ]
                num0 = (num_slots + pad0) // tile0
                out = jax.lax.map(
                    _resolve_tile,
                    tuple(
                        a.reshape((num0, tile0) + a.shape[1:]) for a in arrs
                    ),
                )
                return out.reshape(num0 * tile0, k)[:num_slots]

            any_sp = jnp.any(
                (codes_slots >= res_base)
                & (codes_slots < res_base + spill_len)
            )
            codes2 = jax.lax.cond(any_sp, _resolve, _invalidate, codes_slots)
        else:
            codes2 = _invalidate(codes_slots)
        s27_rows = jnp.take(
            cstart27, col_q_slot * g + qz_slot, axis=0
        )  # [num_slots, 27]
        packed_aux = jnp.concatenate(
            [codes2, s27_rows, const_rows, qz_slot[:, None]], axis=1
        ).astype(jnp.int32)
        # Transpose to [k + 73, num_slots]: the decode kernel wants slots
        # on LANES (full vector-register utilization — see the kernel
        # docstring); one 2-D XLA transpose, sublane-padded to 8.
        packed_t = packed_aux.T
        sub_pad = (-packed_t.shape[0]) % 8
        if sub_pad:
            packed_t = jnp.pad(packed_t, ((0, sub_pad), (0, 0)))
        s_table, dropped = _s_from_codes_fused(
            packed_t, spec, k, codes_cap, interpret
        )
    if fuse_codes:
        # Fused decode + S-build tile for the codes path (rollout): the
        # 27-way code decode and the 9-way constants select run in one
        # pass, with the per-slot neighbor-cell start rows gathered
        # in-tile from the small closured [G^3, 27] table. The sender's
        # 3x3 ring index j comes directly from the code's (dx, dy) —
        # identical to the generic tile's modular reconstruction because
        # (sender_gx - query_gx + 1) mod G == dx + 1 for dx in {-1,0,1}.
        def s_tile_fused(args):
            codes_t, qz_t, col_t, const_t, qok_t = args
            rows = codes_t.shape[0]
            j27 = codes_t // codes_cap
            rank = codes_t % codes_cap
            valid27 = j27 < 27
            j27c = jnp.where(valid27, j27, 0)
            s27_t = jnp.take(cstart27, col_t * g + qz_t, axis=0)
            oh27 = j27c[:, :, None] == jnp.arange(27, dtype=jnp.int32)
            start = jnp.sum(
                jnp.where(oh27, s27_t.reshape(rows, 1, 27), 0), axis=2
            )  # exact integer one-hot select (f32 einsum would corrupt)
            r_s = start + rank  # sender's per-column compact rank
            # The capacity check happens against the USED rows m_s after
            # the per-j const select below (uniform-equivalent to r < CC;
            # required in the variable layout — see _s_from_codes_fused).
            ok = valid27
            s_cz = (qz_t[:, None] + j27c % 3 - 1 + g) % g
            j = jnp.where(ok, (j27c // 9) * 3 + (j27c // 3) % 3, 9)
            sp_ring_drop = None
            if sp_aux is not None:
                # Spill codes resolve through the precomputed aux table;
                # their ring index j comes from the sender/query column
                # delta (the generic tile's modular reconstruction). The
                # table select is an exact integer one-hot broadcast — a
                # per-edge jnp.take here is a pathological TPU elementwise
                # gather (measured +13.8 ms/step at the flagship spec) —
                # gated by a real lax.cond (lax.map is a scan, not vmap):
                # tiles without spill codes — ALL tiles on uniform data —
                # skip the whole branch.
                sp_idx = codes_t - 27 * codes_cap
                is_sp = (sp_idx >= 0) & (sp_idx < spill_len)

                def _with_sp(state):
                    r_s, s_cz, j, ok, _ = state
                    oh_sp = sp_idx[:, :, None] == jnp.arange(
                        spill_len, dtype=jnp.int32
                    )
                    aux_sp = jnp.sum(jnp.where(oh_sp, sp_aux, 0), axis=2)
                    slot_sp = aux_sp // g
                    real_sp = is_sp & (slot_sp < pack_slots)
                    col_sp = slot_sp // cc
                    dxm = (col_sp // g - (col_t // g)[:, None] + 1 + g) % g
                    dym = (col_sp % g - (col_t % g)[:, None] + 1 + g) % g
                    in3_sp = real_sp & (dxm < 3) & (dym < 3)
                    return (
                        jnp.where(is_sp, slot_sp % cc, r_s),
                        jnp.where(is_sp, aux_sp % g, s_cz),
                        jnp.where(
                            is_sp, jnp.where(in3_sp, dxm * 3 + dym, 9), j
                        ),
                        jnp.where(is_sp, in3_sp, ok),
                        # Real spill senders outside the 3x3 ring
                        # (uncertified regime only) cannot be represented —
                        # count them like the aux path does.
                        real_sp & ~in3_sp,
                    )

                r_s, s_cz, j, ok, sp_ring_drop = jax.lax.cond(
                    jnp.any(is_sp), _with_sp, lambda s: s,
                    (r_s, s_cz, j, ok, jnp.zeros_like(is_sp)),
                )
            oh_j = j[:, :, None] == jnp.arange(9, dtype=jnp.int32)
            sel = jnp.sum(
                jnp.where(
                    oh_j[:, :, :, None],
                    const_t.astype(jnp.int32).reshape(rows, 1, 9, 5), 0,
                ),
                axis=2,
            )  # [rows, k, 5] int32 (exact — see s_tile note on the MXU)
            w_s, cp_s, m_s, ca_s, cg1_s = (
                sel[..., 0], sel[..., 1], sel[..., 2], sel[..., 3],
                sel[..., 4],
            )
            ok = ok & (r_s < m_s)
            rel_main = cp_s + r_s - w_s
            ok_main = ok & (rel_main >= 0) & (rel_main < w_cap)
            rank_pre = r_s - cg1_s
            rel_pre = rank_pre - w_s
            ok_pre = (
                ok & (s_cz == g - 1) & (rank_pre < cp_s)
                & (rel_pre >= 0) & (rel_pre < w_cap)
            )
            rel_app = cp_s + m_s + r_s - w_s
            ok_app = (
                ok & (s_cz == 0) & (r_s < ca_s)
                & (rel_app >= 0) & (rel_app < w_cap)
            )
            use_pre = ok_pre & ~ok_main
            off = jnp.where(
                ok_main, rel_main, jnp.where(use_pre, rel_pre, rel_app)
            )
            valid = qok_t[:, None] & (ok_main | ok_pre | ok_app)
            dropped = jnp.sum(
                qok_t[:, None] & ok & ~(ok_main | ok_pre | ok_app)
            ).astype(jnp.int32)
            if sp_ring_drop is not None:
                dropped = dropped + jnp.sum(
                    qok_t[:, None] & sp_ring_drop
                ).astype(jnp.int32)
            if s_build == "kernel":
                packed = jnp.where(
                    valid, j * w_cap + off, jnp.int32(9 * w_cap)
                ).astype(jnp.int32)
                return packed, dropped
            jh = j * hi_w + jnp.clip(off // lo_w, 0, hi_w - 1)
            s = _onehot_contract(
                jnp.where(valid, jh, -1), off % lo_w, valid, 9 * hi_w, lo_w
            )
            return s, dropped

        tile_fn = s_tile_fused
        arrays = [codes_slots, qz_slot, col_q_slot, const_rows, occupied]
    else:
        tile_fn = s_tile
        arrays = [nbr_aux_slots, const_rows, gx_q, gy_q, occupied]
    if not use_fused_kernel:
        tile = min(_S_BUILD_TILE, num_slots)
        pad = (-num_slots) % tile
        if pad:
            arrays = [
                jnp.pad(
                    a,
                    ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                    constant_values=False if a.dtype == jnp.bool_ else 0,
                )
                for a in arrays
            ]
        num = (num_slots + pad) // tile
        s_chunks, drop_chunks = jax.lax.map(
            tile_fn,
            tuple(a.reshape((num, tile) + a.shape[1:]) for a in arrays),
        )
        if s_build == "kernel":
            offsets = s_chunks.reshape(num * tile, k)[:num_slots]
            s_table = _s_from_offsets(offsets, spec, interpret)
        else:
            s_table = s_chunks.reshape(num * tile, spec.s_width)[:num_slots]
        dropped = jnp.sum(drop_chunks).astype(jnp.int32)

    s_rev_table = None
    reverse_mismatch = None
    if with_reverse:
        # Each slot's main-image position in the padded image, and each
        # tile's PACK-space base (senders in nbr_aux_slots are pack ids;
        # tile t's rows are pack ids [base, base + QB) of its column).
        if spec.variable:
            main_pos_slot = (
                jnp.take(pprefix, csl) + jnp.take(c_pre, csl) + slot_r_var
            )
            # Reserve tiles get a base past every sender value (senders
            # are <= the pack sentinel): local = sender - base < 0 always.
            tile_pack_base = jnp.where(
                tile_col_raw < num_cols, tile_col * cc + a_row,
                pack_slots + qb,
            )
        else:
            main_pos_slot = (
                (slot_ids // cc) * ccp
                + jnp.take(c_pre, slot_ids // cc)
                + slot_ids % cc
            )
            tile_pack_base = jnp.arange(num_tiles, dtype=jnp.int32) * qb
        s_rev_table, rev_total = _build_reverse_table(
            nbr_aux_slots // g, pad_src, window_starts, window_lims,
            main_pos_slot, tile_pack_base, pack_slots, spec,
            mode=s_build, interpret=interpret,
        )
        fwd_total = (
            jnp.sum(s_table.astype(jnp.int32)).astype(jnp.int32)
        )
        reverse_mismatch = fwd_total - rev_total

    return CellBlockGraph(
        order=order,
        slot_of_sorted=slot_of_sorted,
        particle_of_slot=particle_of_slot,
        pad_src=pad_src,
        window_starts=window_starts,
        s_table=s_table,
        overflow=overflow,
        dropped_edges=dropped,
        window_overflow=window_overflow,
        s_rev_table=s_rev_table,
        reverse_mismatch=reverse_mismatch,
    )


def _build_reverse_table(
    nbr_slots_tbl, pad_src, window_starts, window_lims, main_pos_slot,
    tile_pack_base, pack_slots, spec, mode="contract", interpret=None,
):
    """Transpose selection table ``S_rev[tile, (j, off), local sender]``:
    entry counts the edges whose RECEIVER is the particle at padded-window
    position ``(j, off)`` of the sender tile's window and whose SENDER is
    the tile-local slot (layout ``[num_tiles, 9W, rev_lanes]`` int8 — the lane dim
    is the full array minor, so any ``QB % 32 == 0`` stays tile-aligned).

    Enumerates each tile's 9 candidate windows (the receiver side), reads
    each candidate's own neighbor-slot list, and one-hot-matches the
    senders against the tile's slot range — no scatters (a 16M-update 2-D
    scatter measured 1.6 s at config-4 scale, benchmarks/results/
    rev_scatter_r3.json), no per-sender adjacency table. Wrap-duplicated
    candidate rows are deduplicated against the window (a particle
    contributes through its main image when that image is inside the
    window, else through exactly one wrap image).

    ``mode="contract"`` does the window reads as one XLA row gather per
    tile chunk and the match as a factored one-hot MXU contraction;
    ``mode="kernel"`` fuses window DMAs (``pl.Element`` starts, the same
    scalar-prefetch machinery as the aggregation kernel) with a VPU
    one-hot accumulate — the XLA gather alone costs ~360 ms at config-4
    (the [T*9W, k+1] minor-dim-33 rows pad to 128 lanes;
    benchmarks/results/cb_parts_r3.json).

    ``nbr_slots_tbl``: ``[num_slots, k]`` sender PACK ids per receiver SLOT
    row (padding rows hold the ``pack_slots`` sentinel); ``tile_pack_base``
    is each tile's first pack id (uniform: ``t * QB``; variable:
    ``tile_col * CC + a_row``; reserve tiles carry ``pack_slots`` so they
    match nothing), ``main_pos_slot`` each slot's main-image padded row.
    """
    g, cc, qb, w_cap = (spec.grid_size, spec.col_capacity,
                        spec.query_block, spec.window)
    num_slots, num_tiles = spec.num_slots, spec.num_tiles
    k = nbr_slots_tbl.shape[1]
    packed = jnp.concatenate(
        [nbr_slots_tbl, main_pos_slot[:, None]], axis=1
    )  # [num_slots, k+1]
    packed_ext = jnp.concatenate(
        [packed, jnp.full((1, k + 1), pack_slots, packed.dtype)]
    )
    packed_pad = jnp.take(
        packed_ext, pad_src, axis=0, mode="clip"
    )  # [num_padded, k+1]; sentinel rows read the sentinel line
    packed_pad = jnp.concatenate(
        [packed_pad, jnp.full((1, k + 1), pack_slots, packed.dtype)]
    )
    if mode == "kernel":
        return _reverse_table_kernel(
            packed_pad, window_starts, window_lims, tile_pack_base, spec,
            k, interpret,
        )

    # Factor the row one-hot as [f1] x [f2] (f1*f2 == QB) with f2 near 16 —
    # balanced factors keep both one-hot tables small.
    f2 = max(d for d in range(1, 17) if qb % d == 0)
    f1 = qb // f2

    def rev_chunk(args):
        # [T, 9], [T, 9], [T] (pack-space base)
        starts_c, lims_c, tile_base_c = args
        t_chunk = starts_c.shape[0]
        offs = jnp.arange(w_cap, dtype=jnp.int32)
        rows = starts_c[:, :, None] + offs[None, None, :]  # [T, 9, W]
        win = jnp.take(
            packed_pad, rows.reshape(-1), axis=0, mode="clip"
        ).reshape(t_chunk, 9 * w_cap, k + 1)
        senders = win[..., :k]  # [T, 9W, k] sender slots of each candidate
        main_pos = win[..., k]  # [T, 9W]
        # Dedup: the candidate row speaks for its particle iff it IS the
        # main image, or the main image lies outside this window. The
        # in-column limit masks rows past the ring column's packed span
        # (windows can bleed into the next column in the variable layout).
        pos = rows.reshape(t_chunk, 9 * w_cap)
        w_arr = starts_c[:, :, None]
        in_win = (
            (main_pos.reshape(t_chunk, 9, w_cap) >= w_arr)
            & (main_pos.reshape(t_chunk, 9, w_cap) < w_arr + w_cap)
        ).reshape(t_chunk, 9 * w_cap)
        in_col = (offs[None, None, :] < lims_c[:, :, None]).reshape(
            t_chunk, 9 * w_cap
        )
        canonical = ((main_pos == pos) | ~in_win) & in_col
        tile_base = tile_base_c[:, None, None]
        local = senders - tile_base  # [T, 9W, k] pack-relative rank
        valid = (
            (local >= 0) & (local < qb) & canonical[:, :, None]
        )
        oh_hi = (
            jnp.clip(local // f2, 0, f1 - 1)[..., None]
            == jnp.arange(f1, dtype=jnp.int32)
        ).astype(jnp.bfloat16) * jnp.where(
            valid[..., None], 1.0, 0.0
        ).astype(jnp.bfloat16)
        oh_lo = (
            (local % f2)[..., None] == jnp.arange(f2, dtype=jnp.int32)
        ).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            oh_hi, oh_lo,
            dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )  # [T, 9W, f1, f2]
        s = s.reshape(t_chunk, 9 * w_cap, qb)
        return s.astype(jnp.int8), jnp.sum(s).astype(jnp.int32)

    t_chunk = min(_REV_BUILD_TILES, num_tiles)
    pad_t = (-num_tiles) % t_chunk
    starts = window_starts
    lims = window_lims
    tile_base = tile_pack_base
    if pad_t:
        # Padding tiles read window 0 but match no senders (their pack
        # base lies past every sender value, incl. the sentinel).
        starts = jnp.pad(starts, ((0, pad_t), (0, 0)))
        lims = jnp.pad(lims, ((0, pad_t), (0, 0)))
        tile_base = jnp.pad(
            tile_base, (0, pad_t), constant_values=pack_slots + qb
        )
    chunks = (num_tiles + pad_t) // t_chunk
    s_chunks, totals = jax.lax.map(
        rev_chunk,
        (
            starts.reshape(chunks, t_chunk, 9),
            lims.reshape(chunks, t_chunk, 9),
            tile_base.reshape(chunks, t_chunk),
        ),
    )
    s_rev = s_chunks.reshape(num_tiles + pad_t, spec.s_width, qb)[:num_tiles]
    s_rev = jnp.pad(s_rev, ((0, 0), (0, 0), (0, spec.rev_lanes - qb)))
    return s_rev, jnp.sum(totals).astype(jnp.int32)


def _reverse_table_kernel(
    packed_pad, window_starts, window_lims, tile_pack_base, spec, k,
    interpret,
):
    """Pallas reverse-table build: fuse the per-tile window reads (dynamic
    ``pl.Element`` starts, scalar-prefetched in 16-row units like the
    aggregation kernel) with the sender one-hot accumulate on the VPU.

    Layout choices keep every vector in its natural register orientation:
    the window block ``[W, k+1]`` puts candidates on sublanes, so per-k
    lane slices ``win[:, kk]`` broadcast along lanes against a
    ``[W, QB]`` local-sender iota with no relayouts, and the output tile
    ``[9W, QB]`` (lane dim = array minor) needs no transposes and no
    128-multiple constraint on QB.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qb, w, sw = spec.query_block, spec.window, spec.s_width
    num_tiles = spec.num_tiles
    # Lane-pad the packed table to one full 128-lane tile: Element-indexed
    # blocks must be Element on EVERY dim (mixing is rejected at lowering),
    # and an Element lane dim must prove 128-divisibility — a 33-lane
    # window cannot. k <= 127 (int8 multiplicity guard), so k+1 <= 128.
    packed_pad = jnp.pad(packed_pad, ((0, 0), (0, _LANE - (k + 1))))

    qpad = spec.rev_lanes

    def kernel(starts_ref, lane0_ref, tbase_ref, lims_ref, *wins_and_out):
        del lane0_ref  # lane-index divisibility token, see win_spec
        wins = wins_and_out[:9]
        out_ref = wins_and_out[9]
        t = pl.program_id(0)
        tbase = tbase_ref[t]  # tile's PACK-space base (see caller)
        q_iota = jax.lax.broadcasted_iota(jnp.int32, (w, qpad), 1)
        pos_rel = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
        for j in range(9):
            win = wins[j][...]  # [W, k+1] int32 candidate rows
            start = starts_ref[t * 9 + j] * 16
            main = win[:, k : k + 1]  # [W, 1] main-image padded position
            in_win = (main >= start) & (main < start + w)
            # A candidate row speaks for its particle iff it IS the main
            # image or the main image lies outside this window (identical
            # dedup rule to the contract path / forward build), and lies
            # within the ring column's packed span (variable-layout
            # windows can bleed into the next column's rows).
            canonical = ((main == start + pos_rel) | ~in_win) & (
                pos_rel < lims_ref[t * 9 + j]
            )
            # int32 accumulator: Mosaic cannot lower int8 vector adds on
            # this backend (arith.addi on i8 vectors rejected at backend
            # compile); cast to int8 only at the block write.
            acc = jnp.zeros((w, qpad), jnp.int32)
            for kk in range(k):
                local = win[:, kk : kk + 1] - tbase  # [W, 1] sender slot
                ok = canonical & (local >= 0) & (local < qb)
                sel = jnp.where(ok, local, -1)
                acc = acc + (sel == q_iota).astype(jnp.int32)
            out_ref[0, j * w : (j + 1) * w, :] = acc.astype(jnp.int8)

    starts16 = (window_starts // 16).reshape(-1)
    # In-column limits ride scalar prefetch too, flattened to 1-D (a
    # [T, 9] SMEM operand lane-pads the minor dim to 128 and blows the
    # 1 MB SMEM budget — backend-compile reject, see CLAUDE.md).
    lims_flat = window_lims.reshape(-1).astype(jnp.int32)

    def win_spec(j):
        # The lane index is an opaque prefetched zero times 128: Mosaic's
        # window-param pass proves Element divisibility only for
        # mul-by-tile expressions — a literal 0 (or a size-1 grid dim,
        # which folds to 0) is rejected ("couldn't prove that tiling (128)
        # divides index", backend compile only).
        return pl.BlockSpec(
            (pl.Element(w), pl.Element(_LANE)),
            lambda t, st, lz, tb, lm, j=j: (st[t * 9 + j] * 16, lz[0] * _LANE),
        )

    lane0 = jnp.zeros((1,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[win_spec(j) for j in range(9)],
        out_specs=pl.BlockSpec(
            (1, sw, qpad), lambda t, st, lz, tb, lm: (t, 0, 0)
        ),
    )
    srt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, sw, qpad), jnp.int8),
        interpret=interpret,
    )(starts16, lane0, tile_pack_base.astype(jnp.int32), lims_flat,
      *([packed_pad] * 9))
    # Edge total for the reverse_mismatch certificate, summed outside the
    # kernel (a [T, 128] per-tile totals output would need 1-sublane int32
    # blocks, below Mosaic's (8, 128) tile floor — rejected at backend
    # compile).
    return srt, jnp.sum(srt.astype(jnp.int32)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Slot-space expand / compact (monotone gathers both ways — custom VJPs so
# the transposes never become TPU scatter-adds)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _expand(x_sorted, particle_of_slot, slot_of_sorted):
    x_ext = jnp.concatenate(
        [x_sorted, jnp.zeros((1, x_sorted.shape[1]), x_sorted.dtype)]
    )
    return jnp.take(x_ext, particle_of_slot, axis=0, mode="clip")


def _expand_fwd(x_sorted, particle_of_slot, slot_of_sorted):
    return _expand(x_sorted, particle_of_slot, slot_of_sorted), slot_of_sorted


def _expand_bwd(slot_of_sorted, gr):
    g_ext = jnp.concatenate(
        [gr, jnp.zeros((1, gr.shape[1]), gr.dtype)]
    )
    dx = jnp.take(g_ext, slot_of_sorted, axis=0, mode="clip")
    return dx, None, None


_expand.defvjp(_expand_fwd, _expand_bwd)


@jax.custom_vjp
def _compact(x_slots, particle_of_slot, slot_of_sorted):
    return jnp.take(x_slots, slot_of_sorted, axis=0, mode="clip")


def _compact_fwd(x_slots, particle_of_slot, slot_of_sorted):
    return (
        _compact(x_slots, particle_of_slot, slot_of_sorted),
        particle_of_slot,
    )


def _compact_bwd(particle_of_slot, gr):
    g_ext = jnp.concatenate(
        [gr, jnp.zeros((1, gr.shape[1]), gr.dtype)]
    )
    dy = jnp.take(g_ext, particle_of_slot, axis=0, mode="clip")
    return dy, None, None


_compact.defvjp(_compact_fwd, _compact_bwd)


def expand_to_slots(
    x_sorted: jnp.ndarray, plan: CellBlockGraph, dtype=None
) -> jnp.ndarray:
    """``[N, F]`` (cell-sorted rows) -> ``[num_slots, F]`` slot table.

    Empty slots get zero rows. Monotone row gather both ways (the custom
    VJP gathers by ``slot_of_sorted`` — no scatter transpose)."""
    if dtype is not None:
        x_sorted = x_sorted.astype(dtype)
    return _expand(x_sorted, plan.particle_of_slot, plan.slot_of_sorted)


def compact_from_slots(
    x_slots: jnp.ndarray, plan: CellBlockGraph
) -> jnp.ndarray:
    """``[num_slots, F]`` -> ``[N, F]`` cell-sorted rows (monotone gather;
    overflow sentinel slots clamp — flagged by ``plan.overflow``)."""
    return _compact(x_slots, plan.particle_of_slot, plan.slot_of_sorted)


# ---------------------------------------------------------------------------
# The window-matmul Pallas kernel (shared by forward and reverse)
# ---------------------------------------------------------------------------


def _window_kernel(spec: CellBlockSpec, hb: int, out_dtype, s_rev3: bool):
    qb, w = spec.query_block, spec.window

    def kernel(starts_ref, s_ref, *wins_and_out):
        wins = wins_and_out[:9]
        out_ref = wins_and_out[9]
        acc = jnp.zeros((qb, hb), jnp.float32)
        for j in range(9):
            cand = wins[j][...]  # [W, hb]
            # bf16 candidates: MXU products (small-int x bf16) are exact
            # with f32 accumulation. f32 candidates: request the multi-pass
            # matmul — the MXU's default single-pass bf16 costs ~1% error.
            # NOTE (probe, round 3): on the real backend Mosaic honors
            # in-kernel HIGHEST only partially (~1.5e-3 relative) — f32
            # carry is therefore NOT exact on real TPU (the wrapper warns);
            # bf16 carry is the production mode and its products are exact.
            precision = (
                jax.lax.Precision.HIGHEST
                if cand.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
            )
            if s_rev3:
                # Reverse table block [9W, rev_lanes]: contract the window
                # dim of BOTH operands (an lhs-transposed matmul — no
                # relayout); the result's padding rows (always-zero
                # selection lanes) are dropped by a sublane slice.
                sj = s_ref[j * w : (j + 1) * w, :].astype(cand.dtype)
                acc += jax.lax.dot_general(
                    sj, cand,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )[:qb, :]
            else:
                sj = s_ref[:, j * w : (j + 1) * w].astype(cand.dtype)
                acc += jnp.dot(
                    sj, cand, preferred_element_type=jnp.float32,
                    precision=precision,
                )
        out_ref[:] = acc.astype(out_dtype)

    return kernel


def _pad_candidates(z_slots, pad_src, carry_dtype):
    """Slot rows -> the z-wrap padded candidate image (one row gather)."""
    z_ext = jnp.concatenate(
        [
            z_slots.astype(carry_dtype),
            jnp.zeros((1, z_slots.shape[1]), carry_dtype),
        ]
    )
    return jnp.take(z_ext, pad_src, axis=0, mode="clip")


def _window_matmul(
    s_table, z_slots, pad_src, window_starts, spec, out_dtype, carry_dtype,
    interpret, s_rev3=False,
):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and jnp.dtype(carry_dtype) == jnp.float32:
        import warnings

        warnings.warn(
            "cellblock carry_dtype=float32 on real TPU is ~1.5e-3 accurate "
            "(Mosaic honors in-kernel Precision.HIGHEST only partially); "
            "use carry_dtype=bfloat16 for the exact small-int x bf16 path",
            stacklevel=3,
        )
    num_slots, h_in = z_slots.shape
    # Lane-pad small latents: the candidate windows are Element-indexed and
    # their lane offsets are hi * hb, which Mosaic's window-params pass can
    # prove 128-divisible only when hb is a 128-multiple (backend compile
    # rejects hb=16 with "couldn't prove that tiling (128) divides index").
    h = _round_up(h_in, _LANE)
    if h != h_in:
        z_slots = jnp.pad(z_slots, ((0, 0), (0, h - h_in)))
    hb = min(spec.h_block, h)
    if h % hb != 0:
        raise ValueError(f"H={h} not a multiple of h_block={hb}")
    z_pad = _pad_candidates(z_slots, pad_src, carry_dtype)
    qb, w = spec.query_block, spec.window

    # Window starts ride as scalar prefetch in units of 16 rows and the
    # index map multiplies back: Mosaic must PROVE the Element row offset
    # divisible by the sublane tiling (8 for f32, 16 for bf16), which it
    # cannot for a raw runtime scalar — `st * 16` is provable. The build
    # floors every start to 16 rows, so the division is exact. FLATTENED
    # to 1-D: a [T, 9] SMEM operand pads its minor dim to 128 lanes and
    # blows the 1 MB SMEM budget at config-4 tile counts.
    starts16 = (window_starts // 16).reshape(-1)

    def win_spec(j):
        return pl.BlockSpec(
            (pl.Element(w), pl.Element(hb)),
            lambda hi, t, st, j=j: (st[t * 9 + j] * 16, hi * hb),
        )

    if s_rev3:
        # Flatten [num_tiles, 9W, rev_lanes] -> [num_tiles*9W, rev_lanes]
        # (free row-major reshape): a 3-D Blocked INPUT block of this shape
        # is rejected by Mosaic's window-params pass; the 2-D form mirrors
        # the proven forward s_table pattern.
        s_table = s_table.reshape(-1, spec.rev_lanes)
        s_spec = pl.BlockSpec(
            (spec.s_width, spec.rev_lanes), lambda hi, t, st: (t, 0)
        )
    else:
        s_spec = pl.BlockSpec((qb, spec.s_width), lambda hi, t, st: (t, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h // hb, spec.num_tiles),
        in_specs=[s_spec] + [win_spec(j) for j in range(9)],
        out_specs=pl.BlockSpec((qb, hb), lambda hi, t, st: (t, hi)),
    )
    out = pl.pallas_call(
        _window_kernel(spec, hb, out_dtype, s_rev3),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((spec.num_slots, h), out_dtype),
        interpret=interpret,
    )(starts16, s_table, *([z_pad] * 9))
    return out[:, :h_in] if h != h_in else out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def _aggregate_slots(z_slots, plan, spec, out_dtype, carry_dtype, interpret):
    return _window_matmul(
        plan.s_table, z_slots, plan.pad_src, plan.window_starts, spec,
        out_dtype, carry_dtype, interpret,
    )


def _aggregate_slots_fwd(z_slots, plan, spec, out_dtype, carry_dtype,
                         interpret):
    out = _aggregate_slots(
        z_slots, plan, spec, out_dtype, carry_dtype, interpret
    )
    # Zero-length dtype token: residuals must be JAX types, and the bwd
    # needs the primal's dtype for the cotangent.
    return out, (plan, jnp.zeros((0,), z_slots.dtype))


def _aggregate_slots_bwd(spec, out_dtype, carry_dtype, interpret, res, gr):
    plan, z_token = res
    z_dtype = z_token.dtype
    if plan.s_rev_table is None:
        raise ValueError(
            "cellblock_aggregate_slots backward needs the reverse table — "
            "build the plan with build_cellblock(..., with_reverse=True)"
        )
    dz = _window_matmul(
        plan.s_rev_table, gr, plan.pad_src, plan.window_starts, spec,
        z_dtype, carry_dtype, interpret, s_rev3=True,
    )
    return dz, None


_aggregate_slots.defvjp(_aggregate_slots_fwd, _aggregate_slots_bwd)


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
    slot-space forward: the only per-step data prep is the ``pad_src`` row
    gather realizing the z-wrap image, not an elementwise gather.

    ``carry_dtype`` is the precision of the candidate table inside the
    kernel (accumulation is always f32 on the MXU); bf16 halves VMEM and
    HBM traffic and its small-int x bf16 products are exact. f32 is exact
    up to summation order only in interpret mode — on real TPU Mosaic
    honors in-kernel Precision.HIGHEST only partially (~1.5e-3 relative;
    a warning is raised).
    ``interpret=None``: auto — compiled on TPU, interpreter elsewhere
    (CPU tests and the virtual multi-device mesh).

    Differentiable in ``z_slots`` when the plan carries a reverse table
    (``with_reverse=True``): the VJP is the same kernel with
    ``s_rev_table`` (``dz = S^T g``), certified by
    ``plan.reverse_mismatch == 0``.
    """
    spec.validate()
    if z_slots.shape[0] != spec.num_slots:
        raise ValueError(
            f"z_slots rows {z_slots.shape[0]} != spec.num_slots "
            f"{spec.num_slots}"
        )
    return _aggregate_slots(
        z_slots, plan, spec, out_dtype, carry_dtype, interpret
    )


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
