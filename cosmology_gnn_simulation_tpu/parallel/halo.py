"""Halo-exchange spatial (domain-decomposition) particle sharding.

This is the workload's analog of sequence/context parallelism (SURVEY.md §5
"long-context"): the periodic box is split into P slabs along x, each device
owns the particles inside its slab, and the only cross-device traffic is

* at graph build: the particles in the ``halo_layers`` boundary cell layers
  (positions, ``[H_cap, 3]``) exchanged with the two ring neighbors via
  ``jax.lax.ppermute``;
* per message-passing step: the *projected* latents of those same boundary
  particles (``[H_cap, H]``).

Per-device memory and ICI volume are O(N/P + halo) — unlike the legacy
index-sharded path (``parallel/sharded.py``), which all-gathers the full
``[N, 3]`` positions and ``[N, H]`` projected latents every step. This is
the scaling answer to the reference's O(N * 27N) single-device neighbor
build (``/root/reference/data_utils.py:9-33,149``) at BASELINE config 5
(N=2M over 8 chips).

Geometry (all static):
* cell grid ``G = P * L`` (slabs aligned to cell boundaries), cell edge
  >= the k-th-neighbor radius so the 27-cell search is exact;
* device d owns slab layers ``[d*L, (d+1)*L)``; halo = ``halo_layers``
  layers each side. Requires ``L >= 2*halo_layers`` (disjoint boundary
  sets, no duplicate candidates — checked at config time);
* ``halo_layers=1`` suffices for noise-free queries. Training noise moves a
  query at most one cell off its host-assigned slab (noise << cell edge),
  so ``halo_layers=2`` keeps the 27-cell neighborhood covered — the
  default when ``noise_std > 0``.

Everything is static-shape: owned slots padded to ``local_capacity``, halo
buffers to ``halo_capacity``, migration buffers to ``migrate_capacity``,
each with an overflow diagnostic (never silent).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosmology_gnn_simulation_tpu.ops.cell_list import (
    CellGrid,
    cell_list_knn,
    choose_cell_grid,
    poisson_occupancy_capacity,
    window_margin_sq,
)
from cosmology_gnn_simulation_tpu.ops.noise import (
    random_walk_position_noise,
    random_walk_temperature_noise,
)
from cosmology_gnn_simulation_tpu.ops.periodic import (
    min_image_displacement,
    wrap_positions,
)
from cosmology_gnn_simulation_tpu.types import NormalizationStats, ParticleGraph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class HaloConfig(NamedTuple):
    """Static halo-decomposition geometry (part of the jit key)."""

    num_shards: int  # P: particle-axis size
    grid_size: int  # G = P * slab_layers
    cell_capacity: int  # C: cell-list capacity
    halo_layers: int  # boundary cell layers exchanged per side
    local_capacity: int  # owned-particle slots per shard
    halo_capacity: int  # exchanged-particle slots per side
    migrate_capacity: int  # migration slots per direction per step

    @property
    def slab_layers(self) -> int:
        return self.grid_size // self.num_shards

    @property
    def candidate_count(self) -> int:
        return self.local_capacity + 2 * self.halo_capacity


def choose_halo_config(
    num_particles: int,
    k: int,
    num_shards: int,
    *,
    noise: bool = False,
    local_slack: float = 1.3,
    halo_slack: float = 2.0,
    capacity_multiplier: float = 2.5,
    positions: Optional[np.ndarray] = None,
    box: float = 1.0,
    slab_layers: Optional[int] = None,
) -> HaloConfig:
    """Pick a halo decomposition for data in a unit-scaled box.

    Without ``positions``, capacities assume ~uniform occupancy. Clustered
    cosmological data (the actual physics) violates that: a dense slab
    overflows ``local_capacity`` and the run dies loudly at
    ``partition_windows``. Passing a representative ``positions`` sample
    (e.g. the first frame, host-side — this is setup-time numpy, not jit)
    sizes ``local/halo/cell`` capacities from the MEASURED per-slab,
    boundary-layer and cell occupancies instead (taking the max with the
    uniform estimate, so capacities never shrink below the uniform plan).
    Extremely clustered data still fails loudly — at partition time or via
    the exactness certificates — rather than silently dropping particles.

    ``slab_layers`` overrides the cells-per-slab choice with a COARSER
    grid (bigger cells, bigger per-query exactness margins) — the knob for
    clustered or drifting data whose k-th-neighbor distances exceed the
    uniform-calibrated grid's window margin mid-rollout (the config-5
    driver uses it; see benchmarks/config5_virtual.py).

    Raises if the box does not support ``num_shards`` slabs of at least
    ``2 * halo_layers`` cell layers at an exactness-preserving cell size
    (the remedy is fewer shards or the all-gather path in
    ``parallel/sharded.py``).
    """
    if num_shards < 2:
        raise ValueError("halo decomposition needs num_shards >= 2")
    base = choose_cell_grid(num_particles, k,
                            capacity_multiplier=capacity_multiplier)
    halo_layers = 2 if noise else 1
    if slab_layers is None:
        slab_layers = base.grid_size // num_shards
    elif slab_layers > max(base.grid_size // num_shards, 2 * halo_layers):
        raise ValueError(
            f"slab_layers={slab_layers} is FINER than the exactness grid "
            f"allows ({base.grid_size // num_shards}); coarser (smaller) "
            f"values trade throughput for certificate margin on clustered "
            f"or drifting data."
        )
    if slab_layers < 2 * halo_layers:
        raise ValueError(
            f"N={num_particles}, k={k} supports a grid of only "
            f"{base.grid_size} exact cell layers; {num_shards} slabs of >= "
            f"{2 * halo_layers} layers do not fit. Use fewer particle "
            f"shards or parallel.sharded's all-gather path."
        )
    grid_size = slab_layers * num_shards
    # Cells got larger (G <= base G): size capacity from the new mean
    # occupancy with a Poisson-quantile floor (the extreme over G^3 cells
    # is redrawn every rollout step — see
    # cell_list.poisson_occupancy_capacity) — a pure multiplicative margin
    # is too tight at small occupancies, silently dropping candidates from
    # full cells.
    occupancy = num_particles / grid_size**3
    cell_capacity = int(max(
        k,
        np.ceil(capacity_multiplier * occupancy),
        poisson_occupancy_capacity(occupancy, grid_size**3),
    ))
    per_layer = num_particles / grid_size  # expected particles per layer
    local_capacity = _round_up(
        int(np.ceil(num_particles / num_shards * local_slack)), 8
    )
    halo_capacity = _round_up(
        int(np.ceil(halo_layers * per_layer * halo_slack)), 8
    )
    if positions is not None:
        pos = np.remainder(np.asarray(positions, np.float64), box)
        # Measured slab occupancy (ownership rule of partition_windows).
        owner = np.clip(
            np.floor(pos[:, 0] / box * num_shards).astype(np.int64),
            0, num_shards - 1,
        )
        slab_max = int(np.bincount(owner, minlength=num_shards).max())
        # Measured boundary-layer mass: worst sum of halo_layers adjacent
        # cell layers at any slab edge (what one ppermute send carries).
        layer = np.clip(
            np.floor(pos[:, 0] / box * grid_size).astype(np.int64),
            0, grid_size - 1,
        )
        layer_counts = np.bincount(layer, minlength=grid_size)
        edge_max = 0
        for s in range(num_shards):
            lo = s * slab_layers
            hi = (s + 1) * slab_layers
            edge_max = max(
                edge_max,
                int(layer_counts[lo:lo + halo_layers].sum()),
                int(layer_counts[hi - halo_layers:hi].sum()),
            )
        # Measured cell occupancy for the shard-local cell lists.
        coords = np.clip(
            np.floor(pos / box * grid_size).astype(np.int64),
            0, grid_size - 1,
        )
        cell_ids = (coords[:, 0] * grid_size + coords[:, 1]) * grid_size + \
            coords[:, 2]
        cell_max = int(np.bincount(
            cell_ids, minlength=grid_size**3
        ).max())
        # Modest slack over the measurement (noise/migration move particles
        # by << a cell per step); floors at the uniform plan.
        local_capacity = max(
            local_capacity, _round_up(int(np.ceil(slab_max * 1.15)), 8)
        )
        halo_capacity = max(
            halo_capacity, _round_up(int(np.ceil(edge_max * 1.3)), 8)
        )
        cell_capacity = max(cell_capacity, int(np.ceil(cell_max * 1.3)))
    return HaloConfig(
        num_shards=num_shards,
        grid_size=grid_size,
        cell_capacity=cell_capacity,
        halo_layers=halo_layers,
        local_capacity=local_capacity,
        halo_capacity=halo_capacity,
        migrate_capacity=halo_capacity,
    )


class HaloCellBlock(NamedTuple):
    """Per-shard cell-block state for halo-sharded MXU aggregation
    (round 4 — composes the two flagship kernels; VERDICT r3 item 2).

    ``plan`` is a LOCAL ``CellBlockGraph`` over the shard's candidate set
    ``[own; halo_left; halo_right]`` on the open-slab grid
    (``choose_cellblock_spec_halo``): rows = candidate indices, queries =
    owned rows (halo/padding rows carry sentinel neighbor lists and so own
    zero S rows). ``inv_owned[i]`` is the plan-sorted position of owned
    candidate row ``i`` — the per-step compact map back to owned rows.
    """

    plan: object  # CellBlockGraph (kept untyped to avoid a hard import)
    inv_owned: jnp.ndarray  # [local_capacity] int32


class HaloSends(NamedTuple):
    """Per-shard boundary-send sets for one graph (traced arrays).

    ``send_left[j]`` = local slot of the j-th particle to ship to the left
    ring neighbor (sentinel ``local_capacity`` for empty slots); these same
    index sets are reused for every per-MP-step latent exchange of the
    graph, so the graph build pays for their construction exactly once.
    """

    send_left: jnp.ndarray  # [H_cap] int32
    send_right: jnp.ndarray  # [H_cap] int32


def _ring_perms(p: int):
    to_left = [(i, (i - 1) % p) for i in range(p)]
    to_right = [(i, (i + 1) % p) for i in range(p)]
    return to_left, to_right


def exchange_halo(values: jnp.ndarray, halo: HaloSends, axis_name: str):
    """Ship boundary rows to the ring neighbors.

    Returns ``(from_left, from_right)``: the rows this shard receives from
    its left / right neighbor (each ``[H_cap, ...]``; sentinel send slots
    arrive as zero rows). Differentiable — the VJP is the reverse permute +
    a scatter-add into the boundary slots.
    """
    p = jax.lax.axis_size(axis_name)
    to_left, to_right = _ring_perms(p)
    padded = jnp.concatenate([values, jnp.zeros_like(values[:1])], axis=0)
    left_buf = jnp.take(padded, halo.send_left, axis=0)
    right_buf = jnp.take(padded, halo.send_right, axis=0)
    from_right = jax.lax.ppermute(left_buf, axis_name, to_left)
    from_left = jax.lax.ppermute(right_buf, axis_name, to_right)
    return from_left, from_right


def expand_candidates(
    values: jnp.ndarray, halo: HaloSends, axis_name: str
) -> jnp.ndarray:
    """``[own; halo_from_left; halo_from_right]`` — the candidate-space
    layout every ``neighbors`` index built by ``featurize_halo`` points
    into."""
    from_left, from_right = exchange_halo(values, halo, axis_name)
    return jnp.concatenate([values, from_left, from_right], axis=0)


def _boundary_sends(
    cell_x: jnp.ndarray, valid: jnp.ndarray, hc: HaloConfig, axis_name: str
):
    """Build the static-capacity boundary send sets from owned cell layers.

    Layers are measured RELATIVE to the slab with periodic centering: a
    noised particle that wrapped across the box boundary (x ~ 0 -> x ~ box)
    sits at rel ~ -1, still within the left-send margin — absolute cell
    comparisons would ship it to the wrong neighbor."""
    d = jax.lax.axis_index(axis_name)
    g, layers = hc.grid_size, hc.slab_layers
    lo = d * layers
    rel = jnp.mod(cell_x - lo, g)
    rel = jnp.where(rel > g // 2, rel - g, rel)  # centered: [-G/2, G/2)
    left_mask = valid & (rel < hc.halo_layers)
    right_mask = valid & (rel >= layers - hc.halo_layers)

    def pick(mask):
        # Stable argsort puts True rows first in slot order; cap at H_cap.
        order = jnp.argsort(~mask)[: hc.halo_capacity].astype(jnp.int32)
        picked = jnp.where(mask[order], order, hc.local_capacity)
        overflow = jnp.maximum(
            jnp.sum(mask) - hc.halo_capacity, 0
        )
        return picked, overflow

    send_left, left_over = pick(left_mask)
    send_right, right_over = pick(right_mask)
    return HaloSends(send_left, send_right), left_over + right_over


def _cell_x(recent: jnp.ndarray, hc: HaloConfig, box) -> jnp.ndarray:
    g = hc.grid_size
    return jnp.clip(
        jnp.floor(recent[:, 0] * (g / box)).astype(jnp.int32), 0, g - 1
    )


def featurize_halo(
    position_seq: jnp.ndarray,
    temperature_seq: jnp.ndarray,
    valid: jnp.ndarray,
    stats: NormalizationStats,
    key: jax.Array,
    *,
    noise_std,
    num_neighbors: int,
    hc: HaloConfig,
    axis_name: str,
    query_tile: int = 2048,
    target_position: Optional[jnp.ndarray] = None,
    target_temperature: Optional[jnp.ndarray] = None,
    with_diagnostics: bool = False,
    noise_gids: Optional[jnp.ndarray] = None,
    cellblock_spec=None,
    cellblock_reverse: bool = False,
):
    """Shard-local graph build with halo exchange.

    ``cellblock_spec`` (a ``choose_cellblock_spec_halo`` spec): additionally
    build the shard-local selection-matrix plan over the candidate set and
    attach it as ``graph.cellblock`` (a :class:`HaloCellBlock`) — pass the
    same spec to ``apply_encode_process_decode(..., cellblock_spec=...,
    cellblock_mode="hybrid")`` to run the aggregation on the MXU path.
    ``cellblock_reverse`` builds the S^T table too (training).

    The featurization semantics are exactly ``featurize``'s (noise-then-wrap,
    min-image velocities, raw-displacement edges, noise-shifted targets —
    ``/root/reference/data_utils.py:72-228``); only the *neighbor candidate
    set* differs: owned + exchanged boundary particles instead of the global
    box, with ``graph.neighbors`` indexing that candidate space.

    Args:
      position_seq / temperature_seq: ``[T, N_cap, .]`` spatially-partitioned
        windows (``partition_windows``); padding slots arbitrary.
      valid: ``[N_cap]`` bool — real-particle slots.
      noise_gids: ``[N_cap]`` global particle ids (``partition_windows``'s
        ``gid``) — REQUIRED whenever ``noise_std`` can be nonzero: noise is
        then keyed per particle id (``ops/noise.py``), making the sharded
        noised step numerically identical to the single-device step with the
        same ids (stream keying would give every shard row-position-dependent
        draws instead).

    Returns:
      ``(graph, halo, diagnostics)`` — pass ``halo`` into
      ``apply_encode_process_decode(..., particle_axis=axis_name, halo=halo)``.
      ``diagnostics`` (None unless ``with_diagnostics``): dict with
      ``halo_overflow``, ``cell_overflow``, ``max_kth_d2`` (over valid
      queries) for the exactness certificate.
    """
    box = stats.box_size
    dt = stats.dt

    pos_seq = jnp.transpose(position_seq, (1, 0, 2)).astype(jnp.float32)
    temp_seq = jnp.transpose(temperature_seq, (1, 0, 2)).astype(jnp.float32)

    pos_key, temp_key = jax.random.split(key)
    position_noise = random_walk_position_noise(
        pos_key, pos_seq, noise_std, dt, gids=noise_gids
    )
    pos_seq = wrap_positions(pos_seq + position_noise, box)
    temperature_noise = random_walk_temperature_noise(
        temp_key, temp_seq, noise_std, stats.temp_rate_std, dt,
        gids=noise_gids,
    )
    temp_seq = temp_seq + temperature_noise

    recent = pos_seq[:, -1]  # [N_cap, 3]
    velocity_seq = (
        min_image_displacement(pos_seq[:, 1:] - pos_seq[:, :-1], box) / dt
    )
    n = pos_seq.shape[0]
    normal_velocity = (velocity_seq - stats.vel_mean) / stats.vel_std
    normal_temp = (temp_seq - stats.temp_mean) / stats.temp_std
    nodes = jnp.concatenate(
        [normal_velocity.reshape(n, -1), normal_temp.reshape(n, -1)], axis=-1
    )

    # --- Halo construction from the NOISED positions (the same coordinates
    # the k-NN queries use; halo_layers=2 covers sub-cell noise drift).
    cell_x = _cell_x(recent, hc, box)
    halo, halo_overflow = _boundary_sends(cell_x, valid, hc, axis_name)
    # One fused exchange for positions + validity (sentinel slots arrive as
    # zero rows -> invalid).
    payload = jnp.concatenate(
        [recent, valid[:, None].astype(jnp.float32)], axis=-1
    )
    cand = expand_candidates(payload, halo, axis_name)
    cand_pos = cand[:, :3]
    cand_valid = cand[:, 3] > 0.5

    grid = CellGrid(hc.grid_size, hc.cell_capacity)
    neighbors, (cell_overflow, _, _) = cell_list_knn(
        cand_pos,
        num_neighbors,
        box,
        grid,
        queries=recent,
        query_tile=query_tile,
        valid=cand_valid,
        return_diagnostics=True,
    )

    # Raw (non-minimum-image) displacement, replicating data_utils.py:162 —
    # halo rows carry the sender's wrapped GLOBAL coordinate, so this matches
    # the single-device features bit-for-bit.
    edge_displacement = (
        jnp.take(cand_pos, neighbors, axis=0) - recent[:, None, :]
    )
    edge_distance = jnp.linalg.norm(edge_displacement, axis=-1, keepdims=True)
    edges = jnp.concatenate([edge_displacement, edge_distance], axis=-1)

    target_acceleration = None
    target_temp_rate = None
    if target_position is not None:
        shifted_target = target_position.astype(jnp.float32) + position_noise[:, -1]
        next_velocity = (
            min_image_displacement(shifted_target - recent, box) / dt
        )
        acceleration = (next_velocity - velocity_seq[:, -1]) / dt
        target_acceleration = (acceleration - stats.acc_mean) / stats.acc_std
    if target_temperature is not None:
        shifted_temp = (
            target_temperature.astype(jnp.float32) + temperature_noise[:, -1]
        )
        temp_rate = (shifted_temp - temp_seq[:, -1]) / dt
        target_temp_rate = (temp_rate - stats.temp_rate_mean) / stats.temp_rate_std

    cb_state = None
    if cellblock_spec is not None:
        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            build_cellblock,
        )

        d = jax.lax.axis_index(axis_name)
        edge = box / hc.grid_size
        # Local x frame: the extended slab starts halo_layers BELOW the
        # owned slab; the periodic remainder maps box-wrapped halo
        # candidates into [0, gx_local * edge) too.
        lo = (d * hc.slab_layers - hc.halo_layers).astype(jnp.float32) * edge
        cand_local = jnp.concatenate(
            [
                jnp.remainder(cand_pos[:, :1] - lo, box),
                cand_pos[:, 1:],
            ],
            axis=1,
        )
        n_cand = cand_pos.shape[0]
        n_own = neighbors.shape[0]
        # Halo rows have no query role: sentinel (>= n_cand) neighbor
        # entries decode to "no edge" in the plan build.
        nbr_full = jnp.concatenate(
            [
                neighbors,
                jnp.full(
                    (n_cand - n_own, num_neighbors), n_cand, jnp.int32
                ),
            ]
        )
        box_local = jnp.asarray(
            [cellblock_spec.gx * edge, box, box], jnp.float32
        )
        plan = build_cellblock(
            cand_local, nbr_full, box_local, cellblock_spec,
            with_reverse=cellblock_reverse, valid=cand_valid,
        )
        invp = (
            jnp.zeros((n_cand,), jnp.int32)
            .at[plan.order]
            .set(jnp.arange(n_cand, dtype=jnp.int32))
        )
        cb_state = HaloCellBlock(plan=plan, inv_owned=invp[:n_own])

    graph = ParticleGraph(
        nodes=nodes,
        neighbors=neighbors,
        edges=edges,
        positions=recent,
        target_acceleration=target_acceleration,
        target_temp_rate=target_temp_rate,
        cellblock=cb_state,
    )

    diagnostics = None
    if with_diagnostics:
        nbr_pos = jnp.take(cand_pos, neighbors, axis=0)
        d2 = jnp.sum(
            min_image_displacement(recent[:, None, :] - nbr_pos, box) ** 2,
            axis=-1,
        )
        max_d2 = jnp.max(jnp.where(valid[:, None], d2, 0.0))
        # Per-query window-margin certificate (ops.cell_list.window_margin_sq):
        # the halo exchange guarantees the full 27-cell window is candidate-
        # populated across slab boundaries (halo_layers >= 1), so the same
        # per-query bound as the single-device path applies shard-locally.
        kth = jnp.max(d2, axis=1)
        margin_sq = window_margin_sq(recent, box, grid)
        max_excess = jnp.max(jnp.where(valid, kth - margin_sq, -jnp.inf))
        diagnostics = {
            "halo_overflow": halo_overflow,
            "cell_overflow": cell_overflow,
            "max_kth_d2": max_d2,
            "max_excess_sq": max_excess,
            "cell_edge_sq": (box / hc.grid_size) ** 2,
        }
        if cb_state is not None:
            # Cell-block representability certificate (same contract as
            # the single-device path: exact iff both are zero).
            diagnostics["cb_overflow"] = cb_state.plan.overflow
            diagnostics["cb_dropped"] = cb_state.plan.dropped_edges
    return graph, halo, diagnostics


# ---------------------------------------------------------------------------
# Host-side spatial partitioning
# ---------------------------------------------------------------------------


def partition_windows(
    position_seq: np.ndarray,
    temperature_seq: np.ndarray,
    hc: HaloConfig,
    box: float,
    target_position: Optional[np.ndarray] = None,
    target_temperature: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Partition one sample's ``[T, N, .]`` windows into P slab segments.

    Returns arrays laid out ``[. , P * local_capacity, .]`` along the
    particle axis (shard s owns segment ``[s*cap, (s+1)*cap)``) plus
    ``valid`` masks and ``gid`` (original global particle index, for
    reassembling outputs). Raises loudly if any slab exceeds
    ``local_capacity`` — the static-shape contract, never silent dropping.
    """
    p, cap = hc.num_shards, hc.local_capacity
    n = position_seq.shape[1]
    recent = np.asarray(position_seq[-1])
    owner = np.floor(recent[:, 0] / box * p).astype(np.int64)
    owner = np.clip(owner, 0, p - 1)
    counts = np.bincount(owner, minlength=p)
    if counts.max() > cap:
        raise ValueError(
            f"slab occupancy {counts.max()} exceeds local_capacity {cap} "
            f"(counts={counts.tolist()}) — the data is more clustered than "
            "the capacity plan. Remedies, in order: (a) pass a "
            "representative frame as choose_halo_config(positions=...) so "
            "capacities are sized from measured occupancies; (b) raise "
            "local_slack; (c) use fewer particle shards; (d) fall back to "
            "parallel.sharded's all-gather path."
        )
    t = position_seq.shape[0]
    out_pos = np.zeros((t, p * cap, 3), np.float32)
    out_temp = np.zeros((t, p * cap, temperature_seq.shape[-1]), np.float32)
    valid = np.zeros((p * cap,), bool)
    gid = np.zeros((p * cap,), np.int32)
    out_tpos = (
        np.zeros((p * cap, 3), np.float32) if target_position is not None
        else None
    )
    out_ttemp = (
        np.zeros((p * cap, target_temperature.shape[-1]), np.float32)
        if target_temperature is not None else None
    )
    for s in range(p):
        idx = np.nonzero(owner == s)[0]
        seg = slice(s * cap, s * cap + len(idx))
        out_pos[:, seg] = position_seq[:, idx]
        out_temp[:, seg] = temperature_seq[:, idx]
        valid[seg] = True
        gid[seg] = idx
        if out_tpos is not None:
            out_tpos[seg] = target_position[idx]
        if out_ttemp is not None:
            out_ttemp[seg] = target_temperature[idx]
    result = {
        "positions": out_pos,
        "temperatures": out_temp,
        "valid": valid,
        "gid": gid,
    }
    if out_tpos is not None:
        result["target_positions"] = out_tpos
    if out_ttemp is not None:
        result["target_temperatures"] = out_ttemp
    return result


def partition_batch(
    batch: Dict[str, np.ndarray],
    hc: HaloConfig,
    box: float,
    *,
    augment_prob: float = 0.0,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, np.ndarray]:
    """Spatially partition a ``[B, T, N, .]`` training batch.

    The xyz axis-permutation augmentation (``/root/reference/dataloader.py:
    137-150``) runs HERE on the host, before partitioning — the slab
    decomposition is along the post-augmentation x axis. (The index-sharded
    and single-device paths keep it on device; same distribution.)
    """
    b = batch["positions"].shape[0]
    parts = []
    for i in range(b):
        pos = np.asarray(batch["positions"][i])
        tpos = np.asarray(batch["target_positions"][i])
        temp = np.asarray(batch["temperatures"][i])
        ttemp = np.asarray(batch["target_temperatures"][i])
        if rng is not None and augment_prob > 0 and rng.random() < augment_prob:
            perm = rng.permutation(3)
            pos = pos[..., perm]
            tpos = tpos[..., perm]
        parts.append(partition_windows(
            pos, temp, hc, box,
            target_position=tpos, target_temperature=ttemp,
        ))
    return {
        key: np.stack([p[key] for p in parts]) for key in parts[0]
    }


# ---------------------------------------------------------------------------
# Sharded training step
# ---------------------------------------------------------------------------


def make_halo_train_step(
    model_config,
    stats: NormalizationStats,
    train_config,
    optimizer,
    mesh,
    hc: HaloConfig,
    cellblock_spec=None,
):
    """Training step with halo-exchange particle sharding over a
    (data, particle) mesh. Feed it ``partition_batch`` outputs placed with
    ``shard_halo_batch``. Loss semantics match the single-device step
    exactly (masked means over real particles; global momentum impulse).

    ``cellblock_spec`` (``choose_cellblock_spec_halo``): run each shard's
    message-passing aggregation on the selection-matrix MXU path — the
    round-4 halo x cellblock composition. The backward flows through the
    per-shard S^T kernel (plans are built ``with_reverse``) and the
    ppermute transpose; gradients match the gather path (pinned by
    tests/test_halo_cellblock.py).
    """
    import optax
    from jax.sharding import PartitionSpec as P

    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        apply_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.parallel.sharded import (
        DATA_AXIS,
        PARTICLE_AXIS,
    )

    tc = train_config
    dtype = jnp.dtype(tc.compute_dtype) if tc.compute_dtype else None
    if mesh.shape[PARTICLE_AXIS] != hc.num_shards:
        raise ValueError(
            f"mesh particle axis {mesh.shape[PARTICLE_AXIS]} != "
            f"halo num_shards {hc.num_shards}"
        )

    batch_specs = {
        "positions": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "temperatures": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "target_positions": P(DATA_AXIS, PARTICLE_AXIS, None),
        "target_temperatures": P(DATA_AXIS, PARTICLE_AXIS, None),
        "valid": P(DATA_AXIS, PARTICLE_AXIS),
        "gid": P(DATA_AXIS, PARTICLE_AXIS),
    }

    def per_sample(params, pos, temp, tpos, ttemp, valid, gid, key):
        # Same key derivation as the single-device step (which splits into
        # (aug_key, feat_key); augmentation is host-side here, so the aug
        # slot is discarded) + per-particle-gid noise keying: the noised
        # sharded step is numerically IDENTICAL to the single-device one.
        feat_key = jax.random.split(key)[1]
        graph, halo, _ = featurize_halo(
            pos, temp, valid, stats, feat_key,
            noise_std=tc.noise_std,
            num_neighbors=tc.num_neighbors,
            hc=hc,
            axis_name=PARTICLE_AXIS,
            query_tile=tc.neighbor_query_tile,
            target_position=tpos,
            target_temperature=ttemp,
            noise_gids=gid,
            cellblock_spec=cellblock_spec,
            cellblock_reverse=cellblock_spec is not None,
        )
        preds = apply_encode_process_decode(
            params, graph, model_config, dtype,
            particle_axis=PARTICLE_AXIS, halo=halo,
            cellblock_spec=cellblock_spec, cellblock_mode="hybrid",
        )
        mask = valid[:, None]
        count = jax.lax.psum(jnp.sum(valid), PARTICLE_AXIS)
        acc_sse = jnp.sum(jnp.where(
            mask, (preds["acceleration"] - graph.target_acceleration) ** 2, 0.0
        ))
        acc_se = jax.lax.psum(acc_sse, PARTICLE_AXIS) / (count * 3)
        temp_sse = jnp.sum(jnp.where(
            mask, (preds["temp_rate"] - graph.target_temp_rate) ** 2, 0.0
        ))
        temp_se = jax.lax.psum(temp_sse, PARTICLE_AXIS) / count
        impulse = jax.lax.psum(
            jnp.sum(jnp.where(mask, preds["acceleration"] * stats.dt, 0.0),
                    axis=0),
            PARTICLE_AXIS,
        )
        momentum = jnp.sum(impulse**2)
        return acc_se, temp_se, momentum

    def loss_fn(params, batch, keys):
        acc_se, temp_se, momentum = jax.vmap(
            per_sample, in_axes=(None, 0, 0, 0, 0, 0, 0, 0)
        )(
            params,
            batch["positions"],
            batch["temperatures"],
            batch["target_positions"],
            batch["target_temperatures"],
            batch["valid"],
            batch["gid"],
            keys,
        )
        acc_loss = jax.lax.pmean(jnp.mean(acc_se), DATA_AXIS)
        temp_loss = jax.lax.pmean(jnp.mean(temp_se), DATA_AXIS)
        momentum_loss = tc.momentum_loss_weight * jax.lax.pmean(
            jnp.mean(momentum), DATA_AXIS
        )
        total = (
            tc.acc_loss_weight * acc_loss
            + tc.temp_rate_loss_weight * temp_loss
            + momentum_loss
        )
        return total, {
            "acceleration": acc_loss,
            "temp_rate": temp_loss,
            "momentum": momentum_loss,
        }

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), batch_specs, P(DATA_AXIS)),
        out_specs=(P(), P()),
        # The cell-block Pallas kernels inside the shard don't carry
        # varying-mesh-axes metadata; the invariance tests pin numerics.
        check_vma=cellblock_spec is None,
    )
    def sharded_value_and_grad(params, batch, keys):
        (loss, components), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, keys)
        grads = jax.lax.psum(grads, (DATA_AXIS, PARTICLE_AXIS))
        return (loss, components), grads

    @jax.jit
    def train_step(params, opt_state, batch, keys):
        (loss, components), grads = sharded_value_and_grad(params, batch, keys)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, **components}

    return train_step


def shard_halo_batch(batch: Dict[str, np.ndarray], mesh,
                     *, process_local: Optional[bool] = None):
    """Place a ``partition_batch`` output onto the (data, particle) mesh.

    ``process_local``: in a multi-process runtime (``jax.distributed``, data
    axis over DCN — ``parallel.mesh.make_mesh``), each process passes only
    ITS data-axis block of the partitioned batch (global batch =
    process-local batches stacked in process order along the data axis);
    the global arrays are assembled without cross-host transfers via
    ``jax.make_array_from_process_local_data``. Default: auto (on iff
    ``jax.process_count() > 1``).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cosmology_gnn_simulation_tpu.parallel.sharded import (
        DATA_AXIS,
        PARTICLE_AXIS,
    )

    if process_local is None:
        process_local = jax.process_count() > 1
    specs = {
        "positions": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "temperatures": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "target_positions": P(DATA_AXIS, PARTICLE_AXIS, None),
        "target_temperatures": P(DATA_AXIS, PARTICLE_AXIS, None),
        "valid": P(DATA_AXIS, PARTICLE_AXIS),
        "gid": P(DATA_AXIS, PARTICLE_AXIS),
    }
    if process_local:
        return {
            name: jax.make_array_from_process_local_data(
                NamedSharding(mesh, specs[name]), np.asarray(arr)
            )
            for name, arr in batch.items()
            if name in specs
        }
    return {
        name: jax.device_put(arr, NamedSharding(mesh, specs[name]))
        for name, arr in batch.items()
        if name in specs
    }


# ---------------------------------------------------------------------------
# Rollout with inter-slab migration
# ---------------------------------------------------------------------------


def _migrate(pos_window, temp_window, valid, gid, hc: HaloConfig, box,
             axis_name: str):
    """Ship particles whose integrated position left the slab to the ring
    neighbor that now owns them; compact survivors + immigrants into the
    static ``local_capacity`` slots.

    One step can only move a particle to an adjacent slab (drift per step
    << slab width); anything farther is kept in place and counted in the
    ``stranded`` diagnostic, and slot overflow in ``overflow`` — both must
    stay 0 for an exact rollout.
    """
    p = hc.num_shards
    m_cap = hc.migrate_capacity
    n_cap = hc.local_capacity
    d = jax.lax.axis_index(axis_name)
    recent = pos_window[-1]
    owner = _cell_x(recent, hc, box) // hc.slab_layers
    go_left = valid & (owner == (d - 1) % p) & (owner != d)
    go_right = valid & (owner == (d + 1) % p) & (owner != d) & ~go_left
    keep = valid & ~go_left & ~go_right
    stranded = jnp.sum(
        valid & (owner != d) & ~go_left & ~go_right
    )

    # Particle-major layout so one gather moves a particle's whole window.
    pos_pm = jnp.transpose(pos_window, (1, 0, 2))  # [N_cap, T, 3]
    temp_pm = jnp.transpose(temp_window, (1, 0, 2))

    def build_buffer(mask):
        order = jnp.argsort(~mask)[:m_cap].astype(jnp.int32)
        sent = mask[order]
        overflow = jnp.maximum(jnp.sum(mask) - m_cap, 0)
        idx = jnp.where(sent, order, 0)
        return {
            "pos": pos_pm[idx],
            "temp": temp_pm[idx],
            "gid": gid[idx],
            "valid": sent,
        }, overflow

    left_buf, lo = build_buffer(go_left)
    right_buf, ro = build_buffer(go_right)
    to_left, to_right = _ring_perms(p)
    ppermute = functools.partial(jax.lax.ppermute, axis_name=axis_name)
    in_from_right = jax.tree.map(
        lambda a: ppermute(a, perm=to_left), left_buf
    )
    in_from_left = jax.tree.map(
        lambda a: ppermute(a, perm=to_right), right_buf
    )

    all_pos = jnp.concatenate(
        [pos_pm, in_from_left["pos"], in_from_right["pos"]], axis=0
    )
    all_temp = jnp.concatenate(
        [temp_pm, in_from_left["temp"], in_from_right["temp"]], axis=0
    )
    all_gid = jnp.concatenate(
        [gid, in_from_left["gid"], in_from_right["gid"]], axis=0
    )
    all_valid = jnp.concatenate(
        [keep, in_from_left["valid"], in_from_right["valid"]], axis=0
    )
    order = jnp.argsort(~all_valid)[:n_cap]
    overflow = (
        jnp.maximum(jnp.sum(all_valid) - n_cap, 0) + lo + ro
    )
    new_pos = jnp.transpose(all_pos[order], (1, 0, 2))
    new_temp = jnp.transpose(all_temp[order], (1, 0, 2))
    return (
        new_pos, new_temp, all_valid[order], all_gid[order],
        {"overflow": overflow, "stranded": stranded},
    )


def make_halo_rollout(
    model_config,
    stats: NormalizationStats,
    mesh,
    num_steps: int,
    hc: HaloConfig,
    *,
    num_neighbors: int = 16,
    min_image_velocity: bool = False,
    dtype=None,
    query_tile: int = 2048,
    with_certificate_components: bool = False,
    cellblock_spec=None,
):
    """Halo-sharded multi-step rollout (BASELINE config 5's execution plan).

    ``cellblock_spec`` (``choose_cellblock_spec_halo``): per-shard
    selection-matrix MXU aggregation (halo x cellblock composition); the
    per-step exactness certificate additionally covers the plan's
    overflow/dropped-edge diagnostics.

    Returns jitted ``(params, positions [W, P*cap, 3], temperatures
    [W, P*cap, 1], valid [P*cap], gid [P*cap]) -> (outputs, diag, exactness)``
    where outputs carry per-step ``positions/temperatures/valid/gid`` (slot
    layouts change as particles migrate between slabs — reassemble with
    ``reassemble_trajectory``), ``diag`` the max-over-steps migration/halo
    overflow diagnostics, and ``exactness`` a per-step ``[num_steps]`` bool
    certificate (parity with ``rollout()``'s in-scan guard: halo sends,
    cell capacity, the per-query window-margin bound and migration all
    within limits). ``with_certificate_components=True`` appends a fourth
    return: a dict of per-step global certificate components
    (halo/cell/migration overflow counts, max margin excess) so a failing
    step is attributable without a rerun.

    Use ``run_halo_rollout`` for the partition -> rollout -> reassemble
    round trip with the single-device ``rollout()`` interface.
    """
    from jax.sharding import PartitionSpec as P

    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        apply_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.parallel.sharded import PARTICLE_AXIS
    from cosmology_gnn_simulation_tpu.rollout import integrate_step

    zero_key = jax.random.PRNGKey(0)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, PARTICLE_AXIS, None),
            P(None, PARTICLE_AXIS, None),
            P(PARTICLE_AXIS),
            P(PARTICLE_AXIS),
        ),
        out_specs=(
            {
                "positions": P(None, PARTICLE_AXIS, None),
                "temperatures": P(None, PARTICLE_AXIS, None),
                "valid": P(None, PARTICLE_AXIS),
                "gid": P(None, PARTICLE_AXIS),
            },
            P(),
            P(),
            {
                "halo_overflow": P(),
                "cell_overflow": P(),
                "max_excess_sq": P(),
                "max_kth_d2": P(),
                "migration_overflow": P(),
                "migration_stranded": P(),
            },
        ),
        check_vma=cellblock_spec is None,
    )
    def rollout_fn(params, init_pos, init_temp, valid, gid):
        def body(carry, _):
            pos_w, temp_w, valid, gid = carry
            graph, halo, fdiag = featurize_halo(
                pos_w, temp_w, valid, stats, zero_key,
                noise_std=0.0,
                num_neighbors=num_neighbors,
                hc=hc,
                axis_name=PARTICLE_AXIS,
                query_tile=query_tile,
                with_diagnostics=True,
                cellblock_spec=cellblock_spec,
            )
            # Per-step exactness certificate, the sharded counterpart of
            # rollout()'s in-scan guard (rollout.py): neighbor graphs are
            # provably exact iff no halo send overflowed, no cell
            # overflowed, and every k-th neighbor lies within its query's
            # 3x3x3-window margin (ops.cell_list.window_margin_sq).
            exact_local = (
                (fdiag["halo_overflow"] == 0)
                & (fdiag["cell_overflow"] == 0)
                & (fdiag["max_excess_sq"] <= 0.0)
            )
            if cellblock_spec is not None:
                exact_local &= (
                    (fdiag["cb_overflow"] == 0) & (fdiag["cb_dropped"] == 0)
                )
            preds = apply_encode_process_decode(
                params, graph, model_config, dtype,
                particle_axis=PARTICLE_AXIS, halo=halo,
                cellblock_spec=cellblock_spec, cellblock_mode="hybrid",
            )
            acceleration = preds["acceleration"] * stats.acc_std + stats.acc_mean
            temp_rate = (
                preds["temp_rate"] * stats.temp_rate_std + stats.temp_rate_mean
            )
            new_position, new_temperature = integrate_step(
                pos_w[-1], pos_w[-2], temp_w[-1],
                acceleration, temp_rate, stats,
                min_image_velocity=min_image_velocity,
            )
            pos_w = jnp.concatenate([pos_w[1:], new_position[None]], axis=0)
            temp_w = jnp.concatenate(
                [temp_w[1:], new_temperature[None]], axis=0
            )
            pos_w, temp_w, valid, gid, diag = _migrate(
                pos_w, temp_w, valid, gid, hc, stats.box_size, PARTICLE_AXIS
            )
            exact_local &= (diag["overflow"] == 0) & (diag["stranded"] == 0)
            # psum of violations makes the flag identical on every shard.
            exact = jax.lax.psum(
                jnp.where(exact_local, 0, 1), PARTICLE_AXIS
            ) == 0
            # Per-step GLOBAL certificate components, so a failing step is
            # attributable without a rerun (config-5 runs cost ~35 min on
            # the virtual mesh).
            cert = {
                "halo_overflow": jax.lax.psum(
                    fdiag["halo_overflow"], PARTICLE_AXIS
                ),
                "cell_overflow": jax.lax.psum(
                    fdiag["cell_overflow"], PARTICLE_AXIS
                ),
                "max_excess_sq": jax.lax.pmax(
                    fdiag["max_excess_sq"], PARTICLE_AXIS
                ),
                "max_kth_d2": jax.lax.pmax(
                    fdiag["max_kth_d2"], PARTICLE_AXIS
                ),
                "migration_overflow": jax.lax.psum(
                    diag["overflow"], PARTICLE_AXIS
                ),
                "migration_stranded": jax.lax.psum(
                    diag["stranded"], PARTICLE_AXIS
                ),
            }
            out = {
                "positions": pos_w[-1],
                "temperatures": temp_w[-1],
                "valid": valid,
                "gid": gid,
            }
            return (pos_w, temp_w, valid, gid), (out, diag, exact, cert)

        init = (
            init_pos.astype(jnp.float32),
            init_temp.astype(jnp.float32),
            valid,
            gid,
        )
        _, (outs, diags, exactness, certs) = jax.lax.scan(
            body, init, None, length=num_steps
        )
        diag_max = jax.lax.psum(
            jax.tree.map(jnp.max, diags), PARTICLE_AXIS
        )
        return outs, diag_max, exactness, certs

    def run(params, init_pos, init_temp, valid, gid):
        outs, diag_max, exactness, certs = rollout_fn(
            params, init_pos, init_temp, valid, gid
        )
        if with_certificate_components:
            return outs, diag_max, exactness, certs
        return outs, diag_max, exactness

    return jax.jit(run)


def reassemble_trajectory(
    outs: Dict[str, np.ndarray],
    seed_positions: np.ndarray,
    seed_temperatures: np.ndarray,
) -> Dict[str, np.ndarray]:
    """Scatter per-slot rollout outputs back to the original particle order
    via the carried global ids; prepend the ground-truth seed window
    (matching ``rollout()``'s trajectory layout, render_rollout.py:87-90)."""
    w, n = seed_positions.shape[0], seed_positions.shape[1]
    steps = outs["positions"].shape[0]
    coords = np.zeros((w + steps, n, 3), np.float32)
    temps = np.zeros((w + steps, n, seed_temperatures.shape[-1]), np.float32)
    coords[:w] = seed_positions
    temps[:w] = seed_temperatures
    valid = np.asarray(outs["valid"])
    gid = np.asarray(outs["gid"])
    pos = np.asarray(outs["positions"])
    temp = np.asarray(outs["temperatures"])
    # One vectorized scatter over all (step, slot) pairs — a Python loop of
    # per-step fancy-index assignments is O(steps) host dispatches and
    # crawls at config-5 trajectory sizes (N=2M x hundreds of steps).
    m = valid.reshape(-1)
    step_idx = np.repeat(np.arange(w, w + steps), valid.shape[1])[m]
    part_idx = gid.reshape(-1)[m]
    coords[step_idx, part_idx] = pos.reshape(-1, 3)[m]
    temps[step_idx, part_idx] = temp.reshape(-1, temp.shape[-1])[m]
    return {"Coordinates": coords, "InternalEnergy": temps}


def run_halo_rollout(
    params,
    model_config,
    initial_positions,
    initial_temperatures,
    stats: NormalizationStats,
    num_steps: int,
    mesh,
    hc: HaloConfig,
    *,
    num_neighbors: int = 16,
    min_image_velocity: bool = False,
    dtype=None,
    query_tile: int = 2048,
    cellblock_spec=None,
):
    """Partition -> halo rollout -> reassemble, with the same interface and
    trajectory layout as the single-device ``rollout()`` — including the
    per-step ``neighbor_exactness`` certificate. Also returns the overflow
    diagnostics dict."""
    init_pos = np.asarray(initial_positions, np.float32)
    init_temp = np.asarray(initial_temperatures, np.float32)
    part = partition_windows(init_pos, init_temp, hc, stats.box_size)
    fn = make_halo_rollout(
        model_config, stats, mesh, num_steps, hc,
        num_neighbors=num_neighbors,
        min_image_velocity=min_image_velocity,
        dtype=dtype, query_tile=query_tile,
        cellblock_spec=cellblock_spec,
    )
    outs, diag, exactness = fn(
        params,
        jnp.asarray(part["positions"]),
        jnp.asarray(part["temperatures"]),
        jnp.asarray(part["valid"]),
        jnp.asarray(part["gid"]),
    )
    diag = {k: int(v) for k, v in diag.items()}
    traj = reassemble_trajectory(
        jax.tree.map(np.asarray, outs), init_pos, init_temp
    )
    traj["neighbor_exactness"] = np.asarray(exactness)
    return traj, diag


def make_halo_eval_step(
    model_config,
    stats: NormalizationStats,
    train_config,
    mesh,
    hc: HaloConfig,
):
    """Halo-sharded validation step (noise 0, no augmentation, no grad),
    returning per-sample ``[B]`` metric vectors so tail batches can be
    padded + masked — identical contract to
    ``parallel.sharded.make_sharded_eval_step(per_sample=True)``."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        apply_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.parallel.sharded import (
        DATA_AXIS,
        PARTICLE_AXIS,
    )

    tc = dataclasses.replace(train_config, noise_std=0.0, augment_prob=0.0)
    dtype = jnp.dtype(tc.compute_dtype) if tc.compute_dtype else None

    batch_specs = {
        "positions": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "temperatures": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "target_positions": P(DATA_AXIS, PARTICLE_AXIS, None),
        "target_temperatures": P(DATA_AXIS, PARTICLE_AXIS, None),
        "valid": P(DATA_AXIS, PARTICLE_AXIS),
        "gid": P(DATA_AXIS, PARTICLE_AXIS),
    }
    zero_key = jax.random.PRNGKey(0)

    def per_sample(params, pos, temp, tpos, ttemp, valid):
        graph, halo, _ = featurize_halo(
            pos, temp, valid, stats, zero_key,
            noise_std=0.0,
            num_neighbors=tc.num_neighbors,
            hc=hc,
            axis_name=PARTICLE_AXIS,
            query_tile=tc.neighbor_query_tile,
            target_position=tpos,
            target_temperature=ttemp,
        )
        preds = apply_encode_process_decode(
            params, graph, model_config, dtype,
            particle_axis=PARTICLE_AXIS, halo=halo,
        )
        mask = valid[:, None]
        count = jax.lax.psum(jnp.sum(valid), PARTICLE_AXIS)
        acc_se = jax.lax.psum(jnp.sum(jnp.where(
            mask, (preds["acceleration"] - graph.target_acceleration) ** 2, 0.0
        )), PARTICLE_AXIS) / (count * 3)
        temp_se = jax.lax.psum(jnp.sum(jnp.where(
            mask, (preds["temp_rate"] - graph.target_temp_rate) ** 2, 0.0
        )), PARTICLE_AXIS) / count
        impulse = jax.lax.psum(
            jnp.sum(jnp.where(mask, preds["acceleration"] * stats.dt, 0.0),
                    axis=0),
            PARTICLE_AXIS,
        )
        momentum = tc.momentum_loss_weight * jnp.sum(impulse**2)
        total = (
            tc.acc_loss_weight * acc_se
            + tc.temp_rate_loss_weight * temp_se
            + momentum
        )
        return {
            "loss": total,
            "acceleration": acc_se,
            "temp_rate": temp_se,
            "momentum": momentum,
        }

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=P(DATA_AXIS),
    )
    def sharded_eval(params, batch):
        return jax.vmap(per_sample, in_axes=(None, 0, 0, 0, 0, 0))(
            params,
            batch["positions"],
            batch["temperatures"],
            batch["target_positions"],
            batch["target_temperatures"],
            batch["valid"],
        )

    @jax.jit
    def eval_step(params, batch):
        return sharded_eval(params, batch)

    return eval_step
