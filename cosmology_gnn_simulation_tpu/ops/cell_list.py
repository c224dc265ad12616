"""Cell-list (bucketed) periodic k-NN — the production neighbor search.

Replaces the O(N^2) brute-force distance matrix (``ops/neighbors.py``) with a
classic cell-list: bin particles into a G^3 periodic grid with cell edge >=
the expected k-th-neighbor radius, then search only the 27 surrounding cells
(~27 * occupancy candidates instead of N). This is the TPU-native equivalent
of the reference's host-side ``torch_cluster.knn`` over 27x ghost copies
(``/root/reference/data_utils.py:9-33,147-152``) — SURVEY.md §7.3's "hardest
novel component".

Everything is static-shape and jit/scan-friendly:

* the cell table is ``[G^3, C]`` with a fixed per-cell capacity ``C``;
  particles beyond ``C`` in a cell are dropped from the *candidate* set and
  counted in the ``overflow`` diagnostic;
* candidate gathering is a dense ``[Q, 27*C]`` gather + masked min-image
  distance reduction + ``top_k`` over 27*C (hundreds, not N);
* exactness is *verifiable per query*: if the k-th neighbor distance is
  within the query's 3x3x3-window margin (``window_margin_sq`` — between
  1 and 1.5 cell edges) the neighborhood provably contains every true
  neighbor. ``max_excess``/``overflow`` outputs let callers assert this.

Cost at N=65k, k=16, G=25, C=24: ~65k x 648 distances ≈ 0.34 GFLOP (vs
34 GFLOP brute) and top_k width 648 (vs 65536) — a ~40x step-time win.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosmology_gnn_simulation_tpu.ops.binning import bin_by_key, scatter_to_table
from cosmology_gnn_simulation_tpu.ops.periodic import min_image_displacement


class CellGrid(NamedTuple):
    """Static cell-list configuration (python ints — part of the jit key)."""

    grid_size: int  # G: cells per box edge
    cell_capacity: int  # C: max particles tabulated per cell


def poisson_occupancy_capacity(
    mean_occupancy: float, num_cells: int, frame_failure_prob: float = 1e-4
) -> int:
    """Smallest capacity ``c`` with ``P(any of num_cells Poisson(lam) cells
    exceeds c) <= frame_failure_prob`` — i.e. the per-cell tail must be
    below ``frame_failure_prob / num_cells``.

    Near-uniform particle counts per cell are binomial ~ Poisson; a flat
    capacity multiplier ignores the extreme-value statistics across G^3
    cells *per frame* and across every frame of a rollout. Round 3: the
    flagship rollout (65,536 particles, grid 19, mean occupancy 9.55,
    capacity 2.5x = 24) hits occupancy 25 within ~13 steps — expected,
    since max occupancy over 6,859 cells concentrates at
    lam + sqrt(2 lam ln G^3) ~ 22.5 and each step redraws the extreme
    (benchmarks/diag_exactness_r3.py). The default 1e-4 per-frame budget
    lands the flagship at C=31; the pallas backend pads capacity to a
    multiple of 8 (here 32), pushing the realized per-frame risk to
    ~1.4e-5 — a 1,000-step rollout overflows with probability ~1%, and
    the in-scan certificate catches the event loudly when it happens.
    """
    lam = float(mean_occupancy)
    tail_target = frame_failure_prob / max(num_cells, 1)
    # Walk the pmf upward from the mode; survivor = P(X > c).
    pmf = math.exp(-lam)
    survivor = 1.0 - pmf
    c = 0
    while survivor > tail_target and c < 100_000:
        c += 1
        pmf *= lam / c
        survivor -= pmf
        survivor = max(survivor, 0.0)  # guard accumulated rounding
    return c


def choose_cell_grid(
    num_particles: int,
    k: int,
    *,
    safety: Optional[float] = None,
    capacity_multiplier: Optional[float] = None,
) -> CellGrid:
    """Pick (G, C) for a roughly uniform distribution of ``num_particles``
    in a unit-scaled box.

    Cell edge is ``safety`` x the uniform k-th-neighbor radius
    r_k = (3k / (4 pi n))^(1/3); capacity defaults to the Poisson upper
    quantile of the cell occupancy (``poisson_occupancy_capacity`` — sized
    so a whole frame overflows with probability <= 1e-4, durable across
    long rollouts), with ``capacity_multiplier`` x mean occupancy as an
    explicit override for clustered data.

    The default safety covers the MAX k-th-neighbor radius over all N
    queries, not the mean: exactness requires every query's k-th neighbor
    within its window margin, and for Poisson-uniform data the count in a
    ball fluctuates by ~sqrt(k) with an extreme-value ln(N) term across N
    queries, so edge^3 must hold ~(k + 3 sqrt(k) + ln N) expected points:
    ``safety = ((k + 3 sqrt(k) + ln N) / k)^(1/3)``, floored at 1.35 — the
    TPU-tuned value at N=65k/k=16 (grid 19: 47ms vs 82ms at grid 17,
    certificate intact; see git history), which the formula reproduces
    there (1.346). Small N/k get the coarser grids their heavier relative
    tails need (e.g. N=4096/k=4: 1.66 -> grid 9, where 1.35's grid 12
    fails the certificate on the synthetic fixture).
    """
    if safety is None:
        tail = (k + 3.0 * math.sqrt(k) + math.log(num_particles)) / k
        safety = max(1.35, tail ** (1.0 / 3.0))
    r_k = (3.0 * k / (4.0 * math.pi * num_particles)) ** (1.0 / 3.0)
    grid_size = max(3, int(1.0 / (safety * r_k)))
    mean_occupancy = num_particles / grid_size**3
    if capacity_multiplier is None:
        capacity = poisson_occupancy_capacity(mean_occupancy, grid_size**3)
    else:
        capacity = int(math.ceil(capacity_multiplier * mean_occupancy))
    return CellGrid(grid_size=grid_size, cell_capacity=max(k, capacity))


# The 27 neighbor-cell offsets, precomputed host-side.
_OFFSETS = np.array(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int32,
)


def window_margin_sq(queries: jnp.ndarray, box_size, grid: CellGrid):
    """Per-query squared exactness radius of the 3x3x3 candidate window.

    A query in cell ``c`` (per dim) sees candidates covering coordinates
    ``[(c-1)*edge, (c+2)*edge]``; every particle within Euclidean min-image
    distance ``m(q) = min_d min(frac_d + edge, 2*edge - frac_d)`` of the
    query (``frac_d`` = offset into its cell) provably lies inside that
    window, so ``d_k(q)^2 <= m(q)^2`` certifies query ``q`` exactly. This is
    the *per-query* form of the classic ``d_k <= edge`` bound — tighter by
    up to 1.5x (cell centers), and the global bound is its worst case
    (queries exactly on a cell boundary). Round 3: the flagship rollout's
    mid-trajectory frames reach max-d_k/edge = 1.00002 with provably exact
    neighbor sets (benchmarks/diag_exactness_r3.py) — the global bound is
    too blunt in exactly the regime the grid tuner targets.

    Values are in ``[edge^2, (1.5*edge)^2]`` for wrapped queries; out-of-box
    coordinates shrink the margin (never inflate it), keeping the bound
    sound for any input.
    """
    g = grid.grid_size
    box = jnp.asarray(box_size, queries.dtype)
    edge = box / g
    c = jnp.clip(jnp.floor(queries * (g / box)).astype(jnp.int32), 0, g - 1)
    frac = queries - c.astype(queries.dtype) * edge
    m = edge + jnp.min(jnp.minimum(frac, edge - frac), axis=-1)
    return m * m


def cell_sort_order(positions: jnp.ndarray, k: int, box_size) -> jnp.ndarray:
    """Stable cell-sort permutation of ``positions`` on the exactness grid.

    The opt-in ``sorted_state`` rollout keeps its scan state in this order
    so the per-message-passing-step aggregation gather reads quasi-local
    rows. Standalone that gather measured 2.82 -> 2.34 ms at the flagship
    spec (gather_probe_r3.json), but in-scan the win did not reproduce
    (flagship_sorted_r3.json) — hence opt-in. Any deterministic
    permutation preserves numerics exactly (aggregation sums keep their
    lane order); cell order matches the kNN table layout. Identity when no
    viable grid exists (tiny N).
    """
    n = positions.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    grid = choose_cell_grid(n, k)
    g = grid.grid_size
    if g < 3:
        return iota
    box = jnp.asarray(box_size, positions.dtype)
    c = jnp.clip(jnp.floor(positions * (g / box)).astype(jnp.int32), 0, g - 1)
    cell_id = (c[:, 0] * g + c[:, 1]) * g + c[:, 2]
    return jax.lax.sort((cell_id, iota), num_keys=1, is_stable=True)[1]


@functools.partial(
    jax.jit,
    static_argnames=("k", "grid", "query_tile", "return_diagnostics"),
)
def cell_list_knn(
    positions: jnp.ndarray,
    k: int,
    box_size,
    grid: CellGrid,
    *,
    queries: Optional[jnp.ndarray] = None,
    query_tile: int = 8192,
    return_diagnostics: bool = False,
    valid: Optional[jnp.ndarray] = None,
):
    """Periodic k-NN via cell lists.

    Args:
      positions: ``[N, 3]`` wrapped coordinates (the reference set).
      k: neighbor count including the self-loop.
      box_size: scalar box edge.
      grid: static ``CellGrid``; ``grid.grid_size`` must be >= 3 (27 distinct
        cells under periodic wrap).
      queries: optional ``[Q, 3]`` query points (default: ``positions``).
      query_tile: queries processed per tile (memory = tile * 27C * 4 B).
      return_diagnostics: also return ``(overflow, max_d2, max_excess)``
        where ``overflow`` counts particles dropped from candidate tables,
        ``max_d2`` is the largest k-th-neighbor squared distance (reporting
        only), and ``max_excess = max_q(d_k(q)^2 - window_margin_sq(q))`` —
        exact iff ``overflow == 0`` and ``max_excess <= 0`` (the per-query
        certificate; see ``window_margin_sq``). Pad queries with zero valid
        candidates (halo path) carry +inf — callers masking pad queries
        must compute their own reduction, as ``featurize_halo`` does.
      valid: optional ``[N]`` bool — False rows are excluded from the
        candidate set entirely (the halo-sharded path's padding slots).

    Returns:
      ``[Q, k]`` int32 neighbor indices (ascending distance), plus
      diagnostics if requested.
    """
    g, cap = grid.grid_size, grid.cell_capacity
    if g < 3:
        raise ValueError("grid_size must be >= 3 (use brute force below that)")
    n = positions.shape[0]
    box = jnp.asarray(box_size, positions.dtype)
    if queries is None:
        queries = positions
    nq = queries.shape[0]

    inv_cell = g / box

    def cell_coords(p):
        c = jnp.floor(p * inv_cell).astype(jnp.int32)
        return jnp.clip(c, 0, g - 1)

    # --- Build the cell table: [G^3, C] of particle ids (n = empty sentinel).
    coords = cell_coords(positions)
    cell_id = (coords[:, 0] * g + coords[:, 1]) * g + coords[:, 2]  # [N]
    if valid is not None:
        # Out-of-range key -> the scatter's drop mode discards the row.
        cell_id = jnp.where(valid, cell_id, g**3)
    b = bin_by_key(cell_id, g**3, cap)
    # Deliberately scatter-based (probe-measured faster than the arithmetic
    # gather form at both flagship and config-4 scale — see
    # ops/pallas_knn._build_table and benchmarks/probe_tablebuild.py).
    table = scatter_to_table(b, b.order, g**3, cap, n, jnp.int32).reshape(-1)
    overflow = b.overflow
    if valid is not None:
        # Invalid rows all share the sentinel key; don't count the ones
        # beyond `cap` as real cell overflow.
        invalid = jnp.sum(~valid)
        overflow = overflow - jnp.maximum(invalid - cap, 0)

    # Positions padded with a sentinel row so gathers of empty slots are
    # safe. Stored as three [N+1] planes: gathering a [T, 27C, 3] tensor
    # would put the size-3 axis minor-most, which TPU pads to 128 lanes
    # (a 42x memory blowup at N=65k) — per-dimension [T, 27C] gathers keep
    # the wide candidate axis minor instead.
    pad_row = jnp.zeros((1,), positions.dtype)
    planes = tuple(
        jnp.concatenate([positions[:, d], pad_row]) for d in range(3)
    )
    offsets = jnp.asarray(_OFFSETS)

    def one_tile(q):
        qc = cell_coords(q)  # [T, 3]
        ncells = jnp.mod(qc[:, None, :] + offsets[None, :, :], g)  # [T, 27, 3]
        ncell_id = (ncells[..., 0] * g + ncells[..., 1]) * g + ncells[..., 2]
        # Candidate particle ids: [T, 27, C] -> [T, 27C]
        cand = table.reshape(g**3, cap)[ncell_id].reshape(q.shape[0], -1)
        d2 = jnp.zeros(cand.shape, positions.dtype)
        for d in range(3):
            delta = min_image_displacement(q[:, d: d + 1] - planes[d][cand], box)
            d2 = d2 + delta * delta
        d2 = jnp.where(cand == n, jnp.inf, d2)  # mask empty slots
        neg_d2, pick = jax.lax.top_k(-d2, k)
        picked = jnp.take_along_axis(cand, pick, axis=1)
        # Rows with fewer than k valid candidates pick the empty-slot
        # sentinel n; downstream takes would clamp it to particle N-1 —
        # an arbitrary far particle. Clamp to the row's nearest valid pick
        # instead (self for self-queries: a benign duplicate edge). The
        # condition stays loud through the diagnostics: d2 keeps +inf,
        # so max_d2 fails the exactness certificate.
        picked = jnp.where(picked == n, picked[:, :1], picked)
        # A row with ZERO valid candidates (possible only for invalid pad
        # queries in the halo-sharded path — real self-queries always see
        # themselves) would keep the sentinel; clamp to 0 so downstream
        # jnp.take (whose out-of-range mode is fill=NaN) stays finite. Such
        # rows are masked out by their callers.
        picked = jnp.where(picked == n, 0, picked)
        return picked, -neg_d2

    if nq <= query_tile:
        idx, d2 = one_tile(queries)
    else:
        rem = (-nq) % query_tile
        padded_q = jnp.pad(queries, ((0, rem), (0, 0)))
        tiles = padded_q.reshape(-1, query_tile, queries.shape[1])
        idx, d2 = jax.lax.map(one_tile, tiles)
        idx = idx.reshape(-1, k)[:nq]
        d2 = d2.reshape(-1, k)[:nq]

    if return_diagnostics:
        kth = jnp.max(d2, axis=1)  # robust to clamped duplicate picks
        excess = kth - window_margin_sq(queries, box, grid)
        return idx, (overflow, jnp.max(d2), jnp.max(excess))
    return idx
