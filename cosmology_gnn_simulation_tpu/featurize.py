"""Graph featurization — the on-device equivalent of the reference's
``preprocess`` (``/root/reference/data_utils.py:72-228``).

Everything here is pure JAX with static shapes, designed to run *inside* the
jitted train step / rollout scan. The reference instead runs this per-sample
on the host CPU each step (``train.py:227-244``, ``render_rollout.py:44-52``)
— the dominant structural bottleneck this framework removes.

Replicated behavioral details (each cited):
* noise-then-wrap of positions (``data_utils.py:91-92``);
* minimum-image finite-difference velocities (``:100-107``);
* node features = flattened normalized velocity history + normalized
  temperature history, [N, 3*(T-1) + T] (``:127-145``);
* k-NN with self-loop over the periodic box (``:147-152``);
* edge features = **raw** (non-minimum-image) displacement + norm (``:161-164``);
* targets shifted by the final noise term so the model learns to denoise
  (``:180-182``, ``:204-206``), normalized by dataset stats (``:194-197``,
  ``:211-214``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cosmology_gnn_simulation_tpu.ops.cell_list import (
    cell_list_knn,
    choose_cell_grid,
)
from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic
from cosmology_gnn_simulation_tpu.ops.noise import (
    random_walk_position_noise,
    random_walk_temperature_noise,
)
from cosmology_gnn_simulation_tpu.ops.periodic import (
    min_image_displacement,
    wrap_positions,
)
from cosmology_gnn_simulation_tpu.types import NormalizationStats, ParticleGraph


def node_feature_size(window_size: int) -> int:
    """3*(T-1) velocity dims + T temperature dims (``data_utils.py:138-145``)."""
    return 3 * (window_size - 1) + window_size


# Below this reference-set size the brute-force distance matrix beats the
# cell-list's table-build overhead.
_CELL_LIST_MIN_N = 8192


def neighbor_search(
    positions: jnp.ndarray,
    k: int,
    box_size,
    *,
    queries: Optional[jnp.ndarray] = None,
    method: str = "auto",
    query_tile: int = 512,
    with_codes: bool = False,
    codes_only: bool = False,
):
    """Dispatch between the periodic k-NN backends.

    ``auto`` picks the fused Pallas cell-list kernel for large self-query
    sets (TPU's fastest path — no top_k, no hot-loop gathers), the XLA cell
    list when separate queries are involved (the sharded path), and exact
    brute force for small N (and when no viable grid exists).

    ``with_codes=True`` returns ``(neighbors, codes, codes_cap, spill)``
    — the Pallas backend's candidate codes (and its spill-block
    resolution tables, see ``pallas_cell_list_knn``) for the cell-block
    plan build (all ``None`` for every other backend).

    ``codes_only=True`` (round 5, requires ``with_codes``): when the
    Pallas backend serves the search, request its single-payload codes
    kernel — ``neighbors`` comes back ``None`` and the dual id+code
    selection passes are skipped (the cell-block pipeline never reads
    neighbor ids; the dual carriage costs ~+10 ms in-scan at flagship and
    ~+200 ms at config 4 — ``config4_r5.json``). Other backends still
    return real ids with ``codes=None`` — callers must handle both.
    """
    n = positions.shape[0]
    self_query = queries is None or queries is positions
    if method == "auto":
        if n < _CELL_LIST_MIN_N:
            method = "bruteforce"
        elif self_query and jax.default_backend() == "tpu":
            method = "pallas"
        else:
            method = "celllist"
    if method == "pallas":
        grid = choose_cell_grid(n, k)
        if grid.grid_size < 3 or not self_query:
            method = "celllist"
        else:
            from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
                codes_packing_cap,
                pallas_cell_list_knn,
            )

            if with_codes:
                idx, codes, spill = pallas_cell_list_knn(
                    positions, k, box_size, grid, with_codes=True,
                    codes_only=codes_only,
                )
                return idx, codes, codes_packing_cap(n, k, grid), spill
            return pallas_cell_list_knn(positions, k, box_size, grid)
    if method == "celllist":
        grid = choose_cell_grid(n, k)
        if grid.grid_size < 3:
            method = "bruteforce"
        else:
            idx = cell_list_knn(
                positions, k, box_size, grid, queries=queries,
                query_tile=max(query_tile, 4096),
            )
            return (idx, None, None, None) if with_codes else idx
    if method != "bruteforce":
        raise ValueError(f"unknown neighbor method: {method}")
    idx = knn_periodic(
        positions, k, box_size, queries=queries, query_tile=query_tile
    )
    return (idx, None, None, None) if with_codes else idx


def neighbor_search_certified(
    positions: jnp.ndarray,
    k: int,
    box_size,
    *,
    method: str = "auto",
    query_tile: int = 512,
    with_codes: bool = False,
    codes_only: bool = False,
    codes_layout: str = "particle",
):
    """Neighbor search + a traced exactness certificate, usable INSIDE jit
    (e.g. every step of a rollout scan — clustered distributions can break
    the bucketed backends' assumptions mid-trajectory even when the seed
    frame passes ``verify_neighbor_exactness``).

    Returns ``(neighbors, exact)`` where ``exact`` is a traced bool: True
    iff this step's result is provably the exact k-NN set (no cell
    overflow and every k-th neighbor within its query's 3x3x3-window
    margin — the per-query bound of ``ops.cell_list.window_margin_sq``,
    up to 1.5x looser than the blunt one-cell-edge form; brute force is
    exact by construction). The certificate's cost is O(N*k) vector math.

    ``with_codes=True`` returns ``(neighbors, codes, codes_cap, spill,
    exact)`` where ``codes``/``codes_cap``/``spill`` are the Pallas
    backend's candidate codes and spill-block resolution tables for the
    cell-block plan build (``None`` when another backend was picked —
    callers must handle both).
    """
    n = positions.shape[0]
    self_query = True
    if method == "auto":
        if n < _CELL_LIST_MIN_N:
            method = "bruteforce"
        elif jax.default_backend() == "tpu":
            method = "pallas"
        else:
            method = "celllist"
    if method != "bruteforce":
        grid = choose_cell_grid(n, k)
        if grid.grid_size < 3:
            method = "bruteforce"
    if method == "bruteforce":
        idx = knn_periodic(positions, k, box_size, query_tile=query_tile)
        if with_codes:
            return idx, None, None, None, jnp.asarray(True)
        return idx, jnp.asarray(True)
    codes = codes_cap = spill = None
    if method == "pallas" and self_query:
        from cosmology_gnn_simulation_tpu.ops.pallas_knn import (
            codes_packing_cap,
            pallas_cell_list_knn,
        )

        if with_codes:
            # codes_only: the kernel carries the candidate lane as its only
            # selection payload and returns idx=None — same cost as the
            # plain ids kernel, vs +10 ms in-scan for carrying both
            # (plan_parts_r3.json). The cell-block pipeline never reads
            # neighbor ids, so its rollout path requests this.
            idx, codes, spill, (overflow, _, max_excess) = (
                pallas_cell_list_knn(
                    positions, k, box_size, grid,
                    return_diagnostics=True, with_codes=True,
                    codes_only=codes_only,
                    codes_layout=codes_layout if codes_only else "particle",
                )
            )
            codes_cap = codes_packing_cap(n, k, grid)
        else:
            idx, (overflow, _, max_excess) = pallas_cell_list_knn(
                positions, k, box_size, grid, return_diagnostics=True
            )
    else:
        idx, (overflow, _, max_excess) = cell_list_knn(
            positions, k, box_size, grid,
            query_tile=max(query_tile, 4096), return_diagnostics=True,
        )
    exact = (overflow == 0) & (max_excess <= 0.0)
    if with_codes:
        return idx, codes, codes_cap, spill, exact
    return idx, exact


def verify_neighbor_exactness(
    positions,
    k: int,
    box_size,
    *,
    method: str = "auto",
    strict: bool = True,
):
    """Runtime exactness check for the cell-list/pallas k-NN backends.

    The bucketed backends are provably exact only when (a) no cell overflows
    its static capacity and (b) every query's k-th neighbor lies within the
    query's 3x3x3-window margin (1-1.5 cell edges depending on the query's
    offset in its cell — ``ops.cell_list.window_margin_sq``). Those hold
    comfortably for near-uniform boxes with the default
    grid sizing, but strongly clustered (real cosmological) data can violate
    them — *silently* degrading the neighbor graphs. Call this outside jit on
    representative positions (Trainer does it on the first batch; the rollout
    CLI on the seed frame). Returns a dict of diagnostics; raises (strict) or
    warns when the certificate fails, with the remedy.
    """
    import warnings

    from cosmology_gnn_simulation_tpu.ops.cell_list import (
        cell_list_knn,
        choose_cell_grid,
    )

    positions = jnp.asarray(positions, jnp.float32)
    n = positions.shape[0]
    if method == "bruteforce" or n < _CELL_LIST_MIN_N:
        return {"method": "bruteforce", "exact": True}
    grid = choose_cell_grid(n, k)
    if grid.grid_size < 3:
        return {"method": "bruteforce", "exact": True}
    _, (overflow, max_d2, max_excess) = cell_list_knn(
        positions, k, box_size, grid, return_diagnostics=True
    )
    overflow = int(overflow)
    max_d2 = float(max_d2)
    max_excess = float(max_excess)
    cell_edge_sq = (float(box_size) / grid.grid_size) ** 2
    exact = overflow == 0 and max_excess <= 0.0
    result = {
        "method": "celllist",
        "grid": grid,
        "overflow": overflow,
        "max_kth_distance_sq": max_d2,
        "max_excess_sq": max_excess,
        "cell_edge_sq": cell_edge_sq,
        "exact": exact,
    }
    if not exact:
        msg = (
            f"Cell-list k-NN exactness certificate FAILED for this particle "
            f"distribution: overflow={overflow} particles dropped from "
            f"candidate tables, max k-th-neighbor distance^2 {max_d2:.3e} "
            f"exceeds its query's window margin^2 by {max_excess:.3e} "
            f"(cell edge^2 {cell_edge_sq:.3e}). Neighbor graphs may be "
            f"approximate. Remedies: choose_cell_grid(capacity_multiplier=...)"
            f" larger / safety smaller, or neighbor_method='bruteforce'."
        )
        if strict:
            raise ValueError(msg)
        warnings.warn(msg)
    return result


def featurize(
    position_seq: jnp.ndarray,
    temperature_seq: jnp.ndarray,
    stats: NormalizationStats,
    key: jax.Array,
    *,
    noise_std=0.0,
    num_neighbors: int = 16,
    target_position: Optional[jnp.ndarray] = None,
    target_temperature: Optional[jnp.ndarray] = None,
    neighbor_query_tile: int = 512,
    neighbor_method: str = "auto",
    particle_axis: Optional[str] = None,
    build_reverse: bool = False,
    neighbors: Optional[jnp.ndarray] = None,
    build_edges: bool = True,
    noise_gids: Optional[jnp.ndarray] = None,
    with_codes: bool = False,
    codes_only: bool = False,
) -> ParticleGraph:
    """Build a ``ParticleGraph`` from a trajectory window.

    ``with_codes=True`` changes the return to
    ``(graph, codes, codes_cap, spill)`` — the Pallas kNN backend's
    candidate codes (+ spill-block resolution tables) computed on the
    (noised, wrapped) positions, for the cell-block plan build (all
    ``None`` when another backend served the search or ``neighbors``
    were precomputed). ``codes_only=True`` additionally requests the
    single-payload codes kernel: ``graph.neighbors`` is then ``None``
    when the Pallas backend served the search (the cell-block pipeline
    never reads ids — skipping the dual id+code selection saves ~200 ms
    per config-4 train step); incompatible with
    ``build_edges``/``build_reverse``.

    Args:
      position_seq: ``[T, N, 3]`` time-major position history (HDF5 layout).
      temperature_seq: ``[T, N, 1]`` internal-energy history.
      stats: normalization statistics + box/dt.
      key: PRNG key for training noise (pass any key with ``noise_std=0``
        for deterministic eval — the draw is multiplied to exact zeros).
      noise_std: random-walk noise scale (may be a traced scalar).
      num_neighbors: k, **including** the self-loop.
      target_position / target_temperature: ``[N, 3]`` / ``[N, 1]`` next-frame
        ground truth; if given, normalized training targets are attached.
      build_reverse: also build the sender-sorted edge stream (training-time
        option: enables the fast exact scatter-free custom-VJP aggregation
        backward, ``ops/aggregation.py``; pointless for inference). Not
        supported together with ``particle_axis``.
      neighbors: optional precomputed ``[N, k]`` neighbor indices — skips the
        neighbor search entirely (the rollout engine's
        ``reneighbor_every > 1`` reuse path).
      build_edges: build the ``[N, k, 4]`` per-edge features (default). The
        pruned sender-latents model provably never reads them — callers in
        that mode pass False to skip a latency-bound small-row gather
        (``graph.edges`` is then None).
      noise_gids: optional ``[N]`` global particle ids — layout-invariant
        per-particle noise keying (``ops/noise.py``), the mode that makes
        sharded and single-device noised training numerically identical.
      particle_axis: mesh axis name when called inside ``shard_map`` with
        particles sharded over that axis. Recent positions are all-gathered
        so the k-NN sees the global box; ``neighbors`` then hold **global**
        particle indices. All other features stay shard-local.

    Returns:
      ``ParticleGraph`` with static shapes ``[N, F]``, ``[N, k]``, ``[N, k, 4]``
      (N = shard-local count under ``particle_axis``).
    """
    box = stats.box_size
    dt = stats.dt

    pos_seq = jnp.transpose(position_seq, (1, 0, 2)).astype(jnp.float32)  # [N,T,3]
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

    recent_position = pos_seq[:, -1]  # [N, 3]
    velocity_seq = (
        min_image_displacement(pos_seq[:, 1:] - pos_seq[:, :-1], box) / dt
    )  # [N, T-1, 3]

    n = pos_seq.shape[0]
    normal_velocity = (velocity_seq - stats.vel_mean) / stats.vel_std
    normal_temp = (temp_seq - stats.temp_mean) / stats.temp_std
    nodes = jnp.concatenate(
        [normal_velocity.reshape(n, -1), normal_temp.reshape(n, -1)], axis=-1
    )

    if particle_axis is not None:
        all_positions = jax.lax.all_gather(
            recent_position, particle_axis, tiled=True
        )
    else:
        all_positions = recent_position
    codes = codes_cap = spill = None
    if neighbors is None:
        if with_codes:
            if codes_only and (build_edges or build_reverse):
                raise ValueError(
                    "codes_only=True returns no neighbor ids — "
                    "incompatible with build_edges/build_reverse"
                )
            neighbors, codes, codes_cap, spill = neighbor_search(
                all_positions,
                num_neighbors,
                box,
                queries=recent_position,
                method=neighbor_method,
                query_tile=neighbor_query_tile,
                with_codes=True,
                codes_only=codes_only,
            )
        else:
            neighbors = neighbor_search(
                all_positions,
                num_neighbors,
                box,
                queries=recent_position,
                method=neighbor_method,
                query_tile=neighbor_query_tile,
            )

    if build_edges:
        # Raw displacement sender - receiver, deliberately NOT minimum-image
        # (data_utils.py:162): boundary-crossing edges carry ~box-sized
        # features.
        edge_displacement = (
            jnp.take(all_positions, neighbors, axis=0)
            - recent_position[:, None, :]
        )
        edge_distance = jnp.linalg.norm(
            edge_displacement, axis=-1, keepdims=True
        )
        edges = jnp.concatenate([edge_displacement, edge_distance], axis=-1)
    else:
        # The default model (pruned sender-latents, SURVEY.md C11) provably
        # never reads edge features — skipping their [N, k, 4] small-row
        # gather saves real time at large N (elementwise/small-row gathers
        # are latency-bound on TPU).
        edges = None

    if build_reverse and particle_axis is not None:
        raise ValueError(
            "build_reverse=True is not supported together with particle_axis "
            "(sorted edges would need the candidate index space); the "
            "sharded path uses native autodiff aggregation."
        )
    sorted_edges = None
    if build_reverse:
        from cosmology_gnn_simulation_tpu.ops.aggregation import (
            build_sorted_edges,
        )

        sorted_edges = build_sorted_edges(neighbors)

    target_acceleration = None
    target_temp_rate = None
    if target_position is not None:
        shifted_target = target_position.astype(jnp.float32) + position_noise[:, -1]
        next_velocity = (
            min_image_displacement(shifted_target - recent_position, box) / dt
        )
        acceleration = (next_velocity - velocity_seq[:, -1]) / dt
        target_acceleration = (acceleration - stats.acc_mean) / stats.acc_std
    if target_temperature is not None:
        recent_temperature = temp_seq[:, -1]
        shifted_temp = (
            target_temperature.astype(jnp.float32) + temperature_noise[:, -1]
        )
        temp_rate = (shifted_temp - recent_temperature) / dt
        target_temp_rate = (temp_rate - stats.temp_rate_mean) / stats.temp_rate_std

    graph = ParticleGraph(
        nodes=nodes,
        neighbors=neighbors,
        edges=edges,
        positions=recent_position,
        target_acceleration=target_acceleration,
        target_temp_rate=target_temp_rate,
        sorted_edges=sorted_edges,
    )
    if with_codes:
        return graph, codes, codes_cap, spill
    return graph
