"""Jitted rollout and one-step evaluation engines.

The reference rollout (``/root/reference/render_rollout.py:26-90``) rebuilds
the graph on the host CPU and crosses the host<->device boundary twice per
simulated step. Here the entire loop — on-device re-neighboring, M message
passing steps, un-normalization, semi-implicit Euler integration, periodic
wrap — is one ``jax.lax.scan`` under ``jit``: zero host round-trips.

Replicated integration semantics:
* un-normalize predictions (``render_rollout.py:60-69``);
* ``recent_velocity = (x[-1] - x[-2]) / dt`` **without** minimum-image
  correction — a reference quirk (``render_rollout.py:73``,
  ``one_step_test.py:96``) kept by default for fidelity;
  ``min_image_velocity=True`` enables the physically-correct form;
* ``v' = v + a*dt``; ``x' = remainder(x + v'*dt, box)``; ``T' = T + Tdot*dt``
  (``render_rollout.py:77-82``).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from cosmology_gnn_simulation_tpu.featurize import (
    featurize,
    neighbor_search_certified,
)
from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic
from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    EncodeProcessDecodeConfig,
    apply_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.ops.periodic import (
    min_image_displacement,
    wrap_positions,
)
from cosmology_gnn_simulation_tpu.types import NormalizationStats


def _permute_window(win, order):
    """Permute a ``[W, N, D]`` window along N as ONE row gather on a
    ``[N, W*D]`` flattening — ``take(axis=1)`` would issue W x N tiny-slice
    gathers (latency-bound on TPU); the transposes are contiguous copies."""
    w, n_, d = win.shape
    flat = win.transpose(1, 0, 2).reshape(n_, w * d)
    return (
        jnp.take(flat, order, axis=0)
        .reshape(n_, w, d)
        .transpose(1, 0, 2)
    )


def _predict_physical(params, graph, model_config, stats, dtype,
                      cellblock_spec=None, cellblock_mode="slots"):
    """Forward pass + un-normalization to physical units."""
    preds = apply_encode_process_decode(
        params, graph, model_config, dtype, cellblock_spec=cellblock_spec,
        cellblock_mode=cellblock_mode,
    )
    acceleration = preds["acceleration"] * stats.acc_std + stats.acc_mean
    temp_rate = preds["temp_rate"] * stats.temp_rate_std + stats.temp_rate_mean
    return acceleration, temp_rate


def integrate_step(
    recent_position: jnp.ndarray,
    previous_position: jnp.ndarray,
    recent_temperature: jnp.ndarray,
    acceleration: jnp.ndarray,
    temp_rate: jnp.ndarray,
    stats: NormalizationStats,
    *,
    min_image_velocity: bool = False,
):
    """Semi-implicit Euler update (``render_rollout.py:72-82``)."""
    dt = stats.dt
    raw = recent_position - previous_position
    if min_image_velocity:
        raw = min_image_displacement(raw, stats.box_size)
    recent_velocity = raw / dt
    new_velocity = recent_velocity + acceleration * dt
    new_position = wrap_positions(recent_position + new_velocity * dt, stats.box_size)
    new_temperature = recent_temperature + temp_rate * dt
    return new_position, new_temperature


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_config",
        "num_steps",
        "num_neighbors",
        "min_image_velocity",
        "dtype",
        "neighbor_query_tile",
        "neighbor_method",
        "reneighbor_every",
        "exactness_guard",
        "aggregation",
        "cellblock_spec",
        "cellblock_variable",
        "fused_tail",
        "sorted_state",
        "s_build",
        "cellblock_search",
        "dense_search_spec",
    ),
)
def rollout(
    params,
    model_config: EncodeProcessDecodeConfig,
    initial_positions: jnp.ndarray,
    initial_temperatures: jnp.ndarray,
    stats: NormalizationStats,
    num_steps: int,
    *,
    num_neighbors: int = 16,
    min_image_velocity: bool = False,
    dtype: Optional[jnp.dtype] = None,
    neighbor_query_tile: int = 512,
    neighbor_method: str = "auto",
    reneighbor_every: int = 1,
    exactness_guard: str = "flag",
    aggregation: str = "auto",
    cellblock_spec=None,
    cellblock_variable: bool = False,
    fused_tail: Optional[bool] = None,
    sorted_state: str = "auto",
    s_build: str = "auto",
    cellblock_search: str = "auto",
    dense_search_spec=None,
) -> Dict[str, jnp.ndarray]:
    """Roll the learned simulator forward ``num_steps`` steps.

    Args:
      initial_positions: ``[W, N, 3]`` ground-truth seed window
        (``render_rollout.py:32-37``).
      initial_temperatures: ``[W, N, 1]``.
      reneighbor_every: rebuild the k-NN graph every R steps, reusing the
        neighbor indices in between (edge features are still recomputed from
        current positions each step). R=1 (default) is the reference
        semantics — re-neighbor every step; R>1 is an opt-in approximation
        exploiting that neighbor lists evolve slowly relative to dt, cutting
        the dominant per-step cost.
      exactness_guard: bucketed k-NN backends are provably exact only while
        no cell overflows and every k-th neighbor is within one cell edge —
        a CLUSTERED distribution can silently break that mid-rollout even
        when the seed frame passes the offline certificate. ``"flag"``
        (default) evaluates the certificate every re-neighboring step inside
        the scan and returns it as ``neighbor_exactness [num_steps]``;
        ``"fallback"`` additionally reruns failing steps with the exact
        brute-force search (paying its cost only on those steps);
        ``"off"`` skips the in-scan checks entirely.

    Returns:
      ``{"Coordinates": [W + num_steps, N, 3],
         "InternalEnergy": [W + num_steps, N, 1]}`` — seed window first, like
      the reference trajectory layout (``render_rollout.py:87-90``) — plus
      ``"neighbor_exactness"`` when the guard is on.

    ``aggregation="cellblock"`` switches the message-passing aggregation to
    the selection-matrix MXU kernel (``ops/cellblock.py``) — the big-N path
    (BASELINE config 4) where the HBM row gather is latency-bound. The scan
    state is kept in cell-sorted order (re-sorted at each re-neighboring);
    trajectory outputs are in original particle order as always. The
    in-scan exactness flag additionally covers the cell-block certificate
    (no cell overflow, every neighbor within one cell).
    ``aggregation="cellblock_hybrid"`` runs the same kernel but keeps the
    model carry on the N particle rows, paying per-step expand/compact
    gathers instead of the slot-padding row tax — the flagship-scale
    winner (see ``apply_encode_process_decode``).

    ``cellblock_search`` (cell-block modes only): ``"codes"`` = the
    round-4 production research round (codes-only Pallas kNN + codes->S
    plan build); ``"dense"`` = the round-5 FUSED dense-query search — the
    kNN runs inside ``build_cellblock`` against the plan's own
    padded-column layout and its output lanes rebase directly into S-table
    lanes, deleting the separate search round and the whole codes->S
    decode; ``"auto"`` picks dense on real TPU for uniform cubic specs.
    Both are exact with the same certificate guarantees (margin bound +
    overflow/truncation gates); neighbor sets agree with brute force
    (tests/test_dense_search.py). ``dense_search_spec`` overrides the
    dense kernel's (query_block, window) tuning.

    ``sorted_state`` applies the same cell-sorted state carriage to the
    default gather path. MEASURED NEGATIVE on real TPU at the flagship
    spec (benchmarks/results/flagship_sorted_r3.json: 40.2 vs 38.8
    ms/step): the standalone-probe gather win from quasi-monotone ids
    (gather_probe_r3.json, 2.82 -> 2.34 ms) does NOT survive inside the
    fused in-scan MP step, leaving the ~1.4 ms/step re-sort overhead as
    pure loss — so ``"auto"`` (default) resolves to off. ``"on"`` keeps
    the path available (bit-identical trajectories, max coord diff 0.0 on
    TPU; pinned by tests) for data layouts where the balance differs.
    """
    if reneighbor_every < 1:
        raise ValueError(
            f"reneighbor_every must be >= 1, got {reneighbor_every}"
        )
    if exactness_guard not in ("off", "flag", "fallback"):
        raise ValueError(f"unknown exactness_guard: {exactness_guard}")
    if aggregation not in ("auto", "gather", "cellblock", "cellblock_hybrid"):
        raise ValueError(f"unknown aggregation: {aggregation}")
    pruned = (
        model_config.aggregate == "sender_latents"
        and model_config.prune_dead_edge_stream
    )
    if aggregation == "auto":
        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            choose_aggregation,
        )

        aggregation = choose_aggregation(
            initial_positions.shape[1], training=False, pruned=pruned
        )
        if aggregation.startswith("cellblock") and (
            exactness_guard == "fallback"
        ):
            # The brute-force fallback is incompatible with the selection
            # windows (see below); keep the user's guard and use gather.
            aggregation = "gather"
    # Fused step-tail kernel (ops/fused_step.py): one Pallas pass instead of
    # ~6 XLA fusions per message-passing step. Default: on for real-TPU
    # pruned bf16 rollouts (differentiable since round 4, so training may
    # enable it too; bf16-only on real TPU — Mosaic in-kernel f32 matmuls are ~1e-3 even
    # at Precision.HIGHEST). Interpret-mode execution elsewhere is correct
    # but slow, so CPU keeps the plain XLA path unless explicitly requested.
    if fused_tail is None:
        fused_tail = (
            pruned
            and jax.default_backend() == "tpu"
            and dtype is not None
            and jnp.dtype(dtype) == jnp.bfloat16
        )
    elif fused_tail and not pruned:
        raise ValueError("fused_tail requires the pruned sender_latents mode")
    if fused_tail:
        model_config = model_config._replace(fused_tail=True)
    zero_key = jax.random.PRNGKey(0)
    reuse = reneighbor_every > 1
    guard = exactness_guard != "off"
    if aggregation in ("cellblock", "cellblock_hybrid"):
        if exactness_guard == "fallback":
            raise ValueError(
                "cellblock aggregation supports exactness_guard "
                "'flag'/'off' (brute-force fallback neighbors can exceed "
                "the one-cell window the selection matrices cover)"
            )
        if cellblock_spec is None and cellblock_variable:
            from cosmology_gnn_simulation_tpu.ops.cellblock import (
                choose_cellblock_spec,
            )

            cellblock_spec = choose_cellblock_spec(
                initial_positions.shape[1], num_neighbors, variable=True
            )
        return _cellblock_rollout(
            params, model_config,
            initial_positions.astype(jnp.float32),
            initial_temperatures.astype(jnp.float32),
            stats, num_steps, num_neighbors, min_image_velocity, dtype,
            neighbor_query_tile, neighbor_method, reneighbor_every, guard,
            cellblock_spec, zero_key,
            "hybrid" if aggregation == "cellblock_hybrid" else "slots",
            s_build, cellblock_search, dense_search_spec,
        )

    if sorted_state not in ("auto", "on", "off"):
        raise ValueError(f"unknown sorted_state: {sorted_state}")
    use_sorted = sorted_state == "on"
    if use_sorted:
        return _sorted_gather_rollout(
            params, model_config,
            initial_positions.astype(jnp.float32),
            initial_temperatures.astype(jnp.float32),
            stats, num_steps, num_neighbors, min_image_velocity, dtype,
            neighbor_query_tile, neighbor_method, reneighbor_every,
            exactness_guard, zero_key,
        )

    def searched(pos_window):
        # Match featurize's noise-then-wrap order (featurize wraps before
        # its internal search; seed windows may carry unwrapped coords).
        wrapped = wrap_positions(pos_window[-1], stats.box_size)
        neighbors, exact = neighbor_search_certified(
            wrapped,
            num_neighbors,
            stats.box_size,
            method=neighbor_method,
            query_tile=neighbor_query_tile,
        )
        if exactness_guard == "fallback":
            neighbors = jax.lax.cond(
                exact,
                lambda w: neighbors,
                lambda w: knn_periodic(
                    w, num_neighbors, stats.box_size,
                    query_tile=neighbor_query_tile,
                ),
                wrapped,
            )
        return neighbors, exact

    # The pruned sender-latents model never reads edge features — skip
    # their [N, k, 4] small-row gather (latency-bound at large N).
    need_edges = not (
        model_config.aggregate == "sender_latents"
        and model_config.prune_dead_edge_stream
    )

    def step(pos_window, temp_window, neighbors):
        graph = featurize(
            pos_window,
            temp_window,
            stats,
            zero_key,
            noise_std=0.0,
            num_neighbors=num_neighbors,
            neighbor_query_tile=neighbor_query_tile,
            neighbor_method=neighbor_method,
            neighbors=neighbors,
            build_edges=need_edges,
        )
        acceleration, temp_rate = _predict_physical(
            params, graph, model_config, stats, dtype
        )
        new_position, new_temperature = integrate_step(
            pos_window[-1],
            pos_window[-2],
            temp_window[-1],
            acceleration,
            temp_rate,
            stats,
            min_image_velocity=min_image_velocity,
        )
        return (
            jnp.concatenate([pos_window[1:], new_position[None]], axis=0),
            jnp.concatenate([temp_window[1:], new_temperature[None]], axis=0),
            graph.neighbors,
            (new_position, new_temperature),
        )

    init_windows = (
        initial_positions.astype(jnp.float32),
        initial_temperatures.astype(jnp.float32),
    )
    exactness = None
    if not reuse and not guard:
        def body(carry, _):
            pos_window, temp_window = carry
            pos_window, temp_window, _, out = step(
                pos_window, temp_window, None
            )
            return (pos_window, temp_window), out

        _, (positions, temperatures) = jax.lax.scan(
            body, init_windows, None, length=num_steps
        )
    elif not reuse:
        def body(carry, _):
            pos_window, temp_window = carry
            neighbors, exact = searched(pos_window)
            pos_window, temp_window, _, out = step(
                pos_window, temp_window, neighbors
            )
            return (pos_window, temp_window), (out, exact)

        _, ((positions, temperatures), exactness) = jax.lax.scan(
            body, init_windows, None, length=num_steps
        )
    else:
        def body(carry, step_index):
            pos_window, temp_window, neighbors, exact = carry
            # Step 0 uses the carry seeded with a real search; re-search only
            # at later multiples of R (avoids running the dominant kNN twice
            # for step 0). Reused steps inherit the exactness of the search
            # that produced their neighbor table.
            neighbors, exact = jax.lax.cond(
                (step_index % reneighbor_every == 0) & (step_index > 0),
                lambda pw, nb, ex: searched(pw),
                lambda pw, nb, ex: (nb, ex),
                pos_window,
                neighbors,
                exact,
            )
            pos_window, temp_window, neighbors, out = step(
                pos_window, temp_window, neighbors
            )
            return (pos_window, temp_window, neighbors, exact), (out, exact)

        init = (*init_windows, *searched(init_windows[0]))
        _, ((positions, temperatures), exactness) = jax.lax.scan(
            body, init, jnp.arange(num_steps)
        )
    result = {
        "Coordinates": jnp.concatenate([init_windows[0], positions], axis=0),
        "InternalEnergy": jnp.concatenate([init_windows[1], temperatures], axis=0),
    }
    if guard:
        result["neighbor_exactness"] = exactness
    return result


def _sorted_gather_rollout(
    params, model_config, init_pos, init_temp, stats, num_steps, k,
    min_image_velocity, dtype, tile, method, reneighbor_every,
    exactness_guard, zero_key,
):
    """Gather-aggregation rollout with cell-sorted scan state.

    Carrying the state in cell order makes the neighbor ids that the
    per-MP-step fused aggregation gather reads quasi-monotone (a query's
    neighbors live in its own and adjacent cells). A standalone fused
    gather+sum rewards that (2.82 -> 2.34 ms at the flagship spec,
    benchmarks/results/gather_probe_r3.json) but the win does NOT
    reproduce inside the in-scan MP step — the full rollout measured
    SLOWER (40.2 vs 38.8 ms/step, flagship_sorted_r3.json), the ~1.4
    ms/step re-sort overhead uncompensated. Kept opt-in (default off).

    The search runs on the already-sorted positions, so its neighbor table
    is directly in sorted ids (no post-hoc remap). Each query's neighbor
    list keeps its distance order (min-id tie-breaks may differ across
    permutations only at exact distance ties), so every aggregation sum is
    the same sequence of adds — sorted and unsorted rollouts are
    bit-identical on tie-free data (pinned by tests/test_rollout.py).
    ``inv_ids`` maps original particle index -> current row; trajectory
    outputs are emitted in original order every step.
    """
    from cosmology_gnn_simulation_tpu.ops.cell_list import cell_sort_order

    n = init_pos.shape[1]
    box = stats.box_size
    guard = exactness_guard != "off"
    iota = jnp.arange(n, dtype=jnp.int32)
    need_edges = not (
        model_config.aggregate == "sender_latents"
        and model_config.prune_dead_edge_stream
    )

    def research(pos_w, temp_w, inv_ids):
        wrapped = wrap_positions(pos_w[-1], box)
        order = cell_sort_order(wrapped, k, box)
        invp = jnp.zeros((n,), jnp.int32).at[order].set(iota)
        inv_ids = jnp.take(invp, inv_ids, axis=0)
        pos_w = _permute_window(pos_w, order)
        temp_w = _permute_window(temp_w, order)
        wrapped = jnp.take(wrapped, order, axis=0)
        neighbors, exact = neighbor_search_certified(
            wrapped, k, box, method=method, query_tile=tile
        )
        if exactness_guard == "fallback":
            neighbors = jax.lax.cond(
                exact,
                lambda w: neighbors,
                lambda w: knn_periodic(w, k, box, query_tile=tile),
                wrapped,
            )
        return pos_w, temp_w, inv_ids, neighbors, exact

    def step(pos_w, temp_w, neighbors):
        graph = featurize(
            pos_w,
            temp_w,
            stats,
            zero_key,
            noise_std=0.0,
            num_neighbors=k,
            neighbor_query_tile=tile,
            neighbor_method=method,
            neighbors=neighbors,
            build_edges=need_edges,
        )
        acceleration, temp_rate = _predict_physical(
            params, graph, model_config, stats, dtype
        )
        new_pos, new_temp = integrate_step(
            pos_w[-1],
            pos_w[-2],
            temp_w[-1],
            acceleration,
            temp_rate,
            stats,
            min_image_velocity=min_image_velocity,
        )
        return (
            jnp.concatenate([pos_w[1:], new_pos[None]], axis=0),
            jnp.concatenate([temp_w[1:], new_temp[None]], axis=0),
            (new_pos, new_temp),
        )

    if reneighbor_every == 1:
        def body(carry, _):
            pos_w, temp_w, inv_ids = carry
            pos_w, temp_w, inv_ids, neighbors, exact = research(
                pos_w, temp_w, inv_ids
            )
            pos_w, temp_w, (new_pos, new_temp) = step(
                pos_w, temp_w, neighbors
            )
            out = (
                jnp.take(new_pos, inv_ids, axis=0),
                jnp.take(new_temp, inv_ids, axis=0),
            )
            return (pos_w, temp_w, inv_ids), (out, exact)

        _, ((positions, temperatures), exactness) = jax.lax.scan(
            body, (init_pos, init_temp, iota), None, length=num_steps
        )
    else:
        def body(carry, step_index):
            pos_w, temp_w, inv_ids, neighbors, exact = carry
            pos_w, temp_w, inv_ids, neighbors, exact = jax.lax.cond(
                (step_index % reneighbor_every == 0) & (step_index > 0),
                lambda pw, tw, ii, nb, ex: research(pw, tw, ii),
                lambda pw, tw, ii, nb, ex: (pw, tw, ii, nb, ex),
                pos_w, temp_w, inv_ids, neighbors, exact,
            )
            pos_w, temp_w, (new_pos, new_temp) = step(
                pos_w, temp_w, neighbors
            )
            out = (
                jnp.take(new_pos, inv_ids, axis=0),
                jnp.take(new_temp, inv_ids, axis=0),
            )
            carry = (pos_w, temp_w, inv_ids, neighbors, exact)
            return carry, (out, exact)

        init = research(init_pos, init_temp, iota)
        _, ((positions, temperatures), exactness) = jax.lax.scan(
            body, init, jnp.arange(num_steps)
        )

    result = {
        "Coordinates": jnp.concatenate([init_pos, positions], axis=0),
        "InternalEnergy": jnp.concatenate([init_temp, temperatures], axis=0),
    }
    if guard:
        result["neighbor_exactness"] = exactness
    return result


def _cellblock_rollout(
    params, model_config, init_pos, init_temp, stats, num_steps, k,
    min_image_velocity, dtype, tile, method, reneighbor_every, guard,
    spec, zero_key, cellblock_mode="slots", s_build="auto",
    cellblock_search="auto", dense_search_spec=None,
):
    """Rollout with selection-matrix (cell-block) aggregation.

    Scan state rides in cell-sorted order; ``inv_ids`` maps original
    particle index -> current row so trajectory outputs stay in original
    order. Re-sorting happens only at re-neighboring steps (the plan and
    the window order must agree between them). ``cellblock_mode`` picks the
    slot-space vs hybrid forward (see ``apply_encode_process_decode``).
    """
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        build_cellblock,
        choose_cellblock_spec,
        sort_neighbors,
    )

    n = init_pos.shape[1]
    if spec is None:
        # Align the aggregation grid with the kNN exactness grid: both
        # certificates demand every neighbor within one cell edge.
        spec = choose_cellblock_spec(n, k)
    box = stats.box_size

    permute_window = _permute_window

    # S built by the Pallas kernels on real TPU (bit-identical tables,
    # pinned by tests); the contract path stays for CPU. "kernel_map"
    # selects the round-3 two-pass kernel path (A/B reference).
    if s_build == "auto":
        s_build = "kernel" if jax.default_backend() == "tpu" else "contract"

    # The Pallas kNN grid (choose_cell_grid) and the default cell-block
    # spec share the same grid size, so the kernel's candidate codes decode
    # directly into sender slots — skipping the plan build's pathological
    # aux[neighbors] elementwise gather. A custom spec on a different grid
    # falls back to the aux path.
    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid

    codes_ok = choose_cell_grid(n, k).grid_size == spec.grid_size

    # Fused dense-query search (round 5): search + plan in ONE pass over
    # the plan's own padded-column layout — the kNN kernel's output lanes
    # rebase directly into S-table lanes, deleting the separate search
    # round and the codes->S decode entirely. The certificate composes the
    # same guarantees: column overflow, un-representable edges, search
    # window truncation / hidden z-wrap copies, and the per-query k-th
    # distance within its window margin.
    if cellblock_search not in ("auto", "dense", "codes"):
        raise ValueError(f"unknown cellblock_search: {cellblock_search}")
    # "auto" stays on codes: BOTH dense kernel cuts measured SLOWER than
    # the codes research round (v1 rolls 22.8-30.7 ms, v2 Element fetches
    # 19.6-31.3 ms vs 14.9 — flagship_dense_r5.json; the 128-floored
    # starts widen every window to w_eff = W + 128, tripling the
    # selection width). Closed as a measured negative in
    # docs/PERFORMANCE.md; the mode stays as an exactness-certified
    # opt-in.
    use_dense = cellblock_search == "dense"
    if use_dense and (spec.variable or spec.grid_x or not spec.periodic_x):
        raise ValueError(
            "cellblock_search='dense' requires the uniform cubic periodic "
            "layout"
        )
    if use_dense:
        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            choose_dense_search_spec,
        )

        dspec = dense_search_spec or choose_dense_search_spec(n, spec)

        def research_dense(pos_w, temp_w, inv_ids):
            wrapped = wrap_positions(pos_w[-1], box)
            plan = build_cellblock(
                wrapped, None, box, spec, s_build=s_build,
                dense_search=dspec, num_neighbors=k,
            )
            exact = (
                (plan.overflow == 0)
                & (plan.dropped_edges == 0)
                & (plan.search_window_overflow == 0)
                & (plan.search_excess <= 0.0)
            )
            pos_w = permute_window(pos_w, plan.order)
            temp_w = permute_window(temp_w, plan.order)
            nbr_sorted = jnp.zeros((n, k), jnp.int32)
            invp = (
                jnp.zeros((n,), jnp.int32)
                .at[plan.order]
                .set(jnp.arange(n, dtype=jnp.int32))
            )
            inv_ids = jnp.take(invp, inv_ids, axis=0)
            return pos_w, temp_w, inv_ids, nbr_sorted, plan, exact

    def research(pos_w, temp_w, inv_ids):
        wrapped = wrap_positions(pos_w[-1], box)
        # codes_only (grid-matched pallas backend): the kernel's single
        # selection payload is the candidate lane — neighbor ids are never
        # materialized (the cell-block forward doesn't read them), saving
        # the dual-payload pass (+10 ms in-scan at the flagship spec,
        # plan_parts_r3.json). Other backends ignore the flag and return
        # real ids with codes=None (aux plan path).
        # codes_layout="table" (round 4) measured NEGATIVE end-to-end
        # (30.2 vs 29.8 ms/step, benchmarks/results/tablecodes_r4.json):
        # deleting the [N, k] re-order gather + inverse-permutation sort +
        # [N, k] scatter saved less than the plan-side quasi-monotone
        # [num_slots, k] row gather costs — table scatters really are fast
        # here (CLAUDE.md). The particle layout stays the default; "table"
        # remains available (and parity-pinned) via build_cellblock.
        neighbors, codes, codes_cap, spill, exact = (
            neighbor_search_certified(
                wrapped, k, box, method=method, query_tile=tile,
                with_codes=True, codes_only=codes_ok,
            )
        )
        if codes is not None and not codes_ok:
            codes = codes_cap = spill = None
        plan = build_cellblock(wrapped, neighbors, box, spec,
                               s_build=s_build,
                               neighbor_codes=codes, codes_cap=codes_cap,
                               codes_spill=spill)
        exact = exact & (plan.overflow == 0) & (plan.dropped_edges == 0)
        pos_w = permute_window(pos_w, plan.order)
        temp_w = permute_window(temp_w, plan.order)
        if neighbors is None:
            # Decorative: the cellblock forward never reads graph.neighbors
            # (featurize only attaches them; build_edges is False here).
            nbr_sorted = jnp.zeros((n, k), jnp.int32)
        else:
            nbr_sorted = sort_neighbors(neighbors, plan.order)
        invp = (
            jnp.zeros((n,), jnp.int32)
            .at[plan.order]
            .set(jnp.arange(n, dtype=jnp.int32))
        )
        inv_ids = jnp.take(invp, inv_ids, axis=0)
        return pos_w, temp_w, inv_ids, nbr_sorted, plan, exact

    if use_dense:
        research = research_dense

    def step(pos_w, temp_w, nbr_sorted, plan):
        graph = featurize(
            pos_w,
            temp_w,
            stats,
            zero_key,
            noise_std=0.0,
            num_neighbors=k,
            neighbor_query_tile=tile,
            neighbor_method=method,
            neighbors=nbr_sorted,
            build_edges=False,  # cellblock requires the pruned mode
        )
        graph = graph._replace(cellblock=plan)
        acceleration, temp_rate = _predict_physical(
            params, graph, model_config, stats, dtype, cellblock_spec=spec,
            cellblock_mode=cellblock_mode,
        )
        new_pos, new_temp = integrate_step(
            pos_w[-1],
            pos_w[-2],
            temp_w[-1],
            acceleration,
            temp_rate,
            stats,
            min_image_velocity=min_image_velocity,
        )
        return (
            jnp.concatenate([pos_w[1:], new_pos[None]], axis=0),
            jnp.concatenate([temp_w[1:], new_temp[None]], axis=0),
            (new_pos, new_temp),
        )

    init_inv = jnp.arange(n, dtype=jnp.int32)
    if reneighbor_every == 1:
        def body(carry, _):
            pos_w, temp_w, inv_ids = carry
            pos_w, temp_w, inv_ids, nbr_sorted, plan, exact = research(
                pos_w, temp_w, inv_ids
            )
            pos_w, temp_w, (new_pos, new_temp) = step(
                pos_w, temp_w, nbr_sorted, plan
            )
            out = (
                jnp.take(new_pos, inv_ids, axis=0),
                jnp.take(new_temp, inv_ids, axis=0),
            )
            return (pos_w, temp_w, inv_ids), (out, exact)

        _, ((positions, temperatures), exactness) = jax.lax.scan(
            body, (init_pos, init_temp, init_inv), None, length=num_steps
        )
    else:
        def body(carry, step_index):
            pos_w, temp_w, inv_ids, nbr_sorted, plan, exact = carry
            pos_w, temp_w, inv_ids, nbr_sorted, plan, exact = jax.lax.cond(
                (step_index % reneighbor_every == 0) & (step_index > 0),
                lambda pw, tw, ii, nb, pn, ex: research(pw, tw, ii),
                lambda pw, tw, ii, nb, pn, ex: (pw, tw, ii, nb, pn, ex),
                pos_w, temp_w, inv_ids, nbr_sorted, plan, exact,
            )
            pos_w, temp_w, (new_pos, new_temp) = step(
                pos_w, temp_w, nbr_sorted, plan
            )
            out = (
                jnp.take(new_pos, inv_ids, axis=0),
                jnp.take(new_temp, inv_ids, axis=0),
            )
            carry = (pos_w, temp_w, inv_ids, nbr_sorted, plan, exact)
            return carry, (out, exact)

        init = research(init_pos, init_temp, init_inv)
        _, ((positions, temperatures), exactness) = jax.lax.scan(
            body, init, jnp.arange(num_steps)
        )

    result = {
        "Coordinates": jnp.concatenate([init_pos, positions], axis=0),
        "InternalEnergy": jnp.concatenate([init_temp, temperatures], axis=0),
    }
    if guard:
        result["neighbor_exactness"] = exactness
    return result


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_config",
        "num_neighbors",
        "min_image_velocity",
        "dtype",
        "neighbor_method",
        "aggregation",
        "cellblock_spec",
        "cellblock_variable",
    ),
)
def one_step_prediction(
    params,
    model_config: EncodeProcessDecodeConfig,
    position_seq: jnp.ndarray,
    temperature_seq: jnp.ndarray,
    stats: NormalizationStats,
    *,
    num_neighbors: int = 16,
    min_image_velocity: bool = False,
    dtype: Optional[jnp.dtype] = None,
    neighbor_method: str = "auto",
    aggregation: str = "gather",
    cellblock_spec=None,
    cellblock_variable: bool = False,
):
    """Predict the next frame from a ``[W, N, ·]`` window
    (``one_step_test.py:67-105`` semantics, fully jitted).

    Note the reference integrates from the **raw input** window (pre-noise,
    pre-wrap positions), not from the featurized ones (``one_step_test.py:95``)
    — with ``noise_std=0`` and wrapped data these coincide.

    ``aggregation``: same surface as :func:`rollout` — ``"gather"``
    (default), ``"cellblock"`` or ``"cellblock_hybrid"`` (selection-matrix
    MXU aggregation; requires the pruned sender-latents model). Predictions
    are returned in the input particle order regardless of mode.
    """
    if aggregation not in ("auto", "gather", "cellblock", "cellblock_hybrid"):
        raise ValueError(f"unknown aggregation: {aggregation}")
    if aggregation == "auto":
        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            choose_aggregation,
        )

        aggregation = choose_aggregation(
            position_seq.shape[1], training=False,
            pruned=(
                model_config.aggregate == "sender_latents"
                and model_config.prune_dead_edge_stream
            ),
        )
    if aggregation != "gather":
        return _cellblock_one_step(
            params, model_config,
            position_seq.astype(jnp.float32),
            temperature_seq.astype(jnp.float32),
            stats, num_neighbors, min_image_velocity, dtype,
            neighbor_method, cellblock_spec,
            "hybrid" if aggregation == "cellblock_hybrid" else "slots",
            cellblock_variable,
        )
    graph = featurize(
        position_seq,
        temperature_seq,
        stats,
        jax.random.PRNGKey(0),
        noise_std=0.0,
        num_neighbors=num_neighbors,
        neighbor_method=neighbor_method,
    )
    acceleration, temp_rate = _predict_physical(
        params, graph, model_config, stats, dtype
    )
    new_position, new_temperature = integrate_step(
        position_seq[-1],
        position_seq[-2],
        temperature_seq[-1],
        acceleration,
        temp_rate,
        stats,
        min_image_velocity=min_image_velocity,
    )
    return new_position, new_temperature


def _cellblock_one_step(
    params, model_config, position_seq, temperature_seq, stats, k,
    min_image_velocity, dtype, method, spec, cellblock_mode,
    variable=False,
):
    """One-step prediction through the cell-block aggregation path.

    Mirrors ``_cellblock_rollout``'s re-neighboring round for a single
    step: sort by the plan order, predict on sorted rows, emit the new
    frame in ORIGINAL particle order. Semantics match the gather path
    exactly (same neighbor sets — certified by the plan diagnostics);
    used by the one-step eval CLI's ``--aggregation`` flag.
    """
    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        build_cellblock,
        choose_cellblock_spec,
    )

    n = position_seq.shape[1]
    box = stats.box_size
    if spec is None:
        spec = choose_cellblock_spec(n, k, variable=variable)
    s_build = "kernel" if jax.default_backend() == "tpu" else "contract"
    codes_ok = choose_cell_grid(n, k).grid_size == spec.grid_size
    wrapped = wrap_positions(position_seq[-1], box)
    neighbors, codes, codes_cap, spill, _ex = neighbor_search_certified(
        wrapped, k, box, method=method, with_codes=True,
        codes_only=codes_ok,
    )
    if codes is not None and not codes_ok:
        codes = codes_cap = spill = None
    plan = build_cellblock(
        wrapped, neighbors, box, spec, s_build=s_build,
        neighbor_codes=codes, codes_cap=codes_cap, codes_spill=spill,
    )
    pos_w = _permute_window(position_seq, plan.order)
    temp_w = _permute_window(temperature_seq, plan.order)
    graph = featurize(
        pos_w, temp_w, stats, jax.random.PRNGKey(0), noise_std=0.0,
        num_neighbors=k, neighbor_method=method,
        neighbors=jnp.zeros((n, k), jnp.int32), build_edges=False,
    )
    graph = graph._replace(cellblock=plan)
    acceleration, temp_rate = _predict_physical(
        params, graph, model_config, stats, dtype, cellblock_spec=spec,
        cellblock_mode=cellblock_mode,
    )
    new_pos, new_temp = integrate_step(
        pos_w[-1], pos_w[-2], temp_w[-1], acceleration, temp_rate, stats,
        min_image_velocity=min_image_velocity,
    )
    # Back to the caller's particle order (inverse of plan.order).
    inv = (
        jnp.zeros((n,), jnp.int32)
        .at[plan.order]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
    return jnp.take(new_pos, inv, axis=0), jnp.take(new_temp, inv, axis=0)
