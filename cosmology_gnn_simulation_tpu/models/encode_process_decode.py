"""Encode–Process–Decode Interaction Network, TPU-native.

Capability parity with ``/root/reference/graph_network.py:108-187``:

* Encoder: independent node/edge MLPs + LayerNorm (``:133-140``).
* Processor: M InteractionNetwork steps with additive residuals on both node
  and edge latents (``:177-183``), run here as one ``lax.scan`` over stacked
  per-step params (weights are NOT shared across steps, matching the
  reference's ``nn.ModuleList``).
* **Aggregation quirk replicated exactly**: the reference never overrides
  PyG's ``message``, so ``propagate`` scatter-adds *sender node latents*
  ``x_j`` — not the freshly-computed edge messages (``graph_network.py:92``;
  see SURVEY.md C11). The updated edge features survive only through the edge
  residual stream. ``aggregate="sender_latents"`` (default) reproduces this;
  ``aggregate="edge_messages"`` gives canonical GNS as an extension.

  **Consequence (provable from the reference's dataflow)**: under
  ``sender_latents`` the edge stream is *dead code for predictions*: node
  latents never read edge latents (``graph_network.py:92-96``), decoders
  read only node latents (``:158-159``), so edge features/MLPs cannot
  influence the output — and their parameters receive exactly zero gradient
  in the reference's training too. ``prune_dead_edge_stream=True`` (default)
  therefore skips the edge stream entirely in this mode: outputs, losses and
  all live-parameter gradients are mathematically identical to the
  reference, at ~1/4 of the FLOPs. Set it False to reproduce the reference's
  wasted edge compute for FLOP-parity measurements.
* Dual decoder heads without LayerNorm (``:151-152,158-159``).

TPU-first restructurings (exact in real arithmetic, not approximations):

1. Regular graphs: aggregation is a dense gather+sum over the ``[N, k]``
   neighbor axis — no scatter.
2. Matmul-then-gather: for the edge-MLP first layer, the concat
   ``[x_src, x_dst, e] @ W`` is split into ``x @ W_src`` / ``x @ W_dst``
   (computed once per *node*, then gathered/broadcast) plus the per-edge
   ``e @ W_e`` term — cutting the dominant first-layer FLOPs by ~3x vs. the
   per-edge concat matmul, and shrinking the gathered tensor.
3. Sum-then-matmul for sender-latent aggregation: ``(sum_j x_j) @ W_agg`` is
   evaluated as a gather+sum of the *pre-projected* ``x @ W_agg`` rows,
   turning an [N*k, L] matmul into an [N, L] one.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from cosmology_gnn_simulation_tpu.models.mlp import (
    apply_mlp,
    dense,
    init_mlp,
    layer_norm,
)
from cosmology_gnn_simulation_tpu.types import ParticleGraph

Params = Dict[str, Any]


class EncodeProcessDecodeConfig(NamedTuple):
    """Hyperparameters (defaults = reference ``config.py:16-23``)."""

    node_input_size: int  # 3*(window-1) + window = 17 at window 5
    edge_input_size: int = 4
    latent_size: int = 128
    mlp_hidden_size: int = 128
    mlp_num_hidden_layers: int = 2
    num_message_passing_steps: int = 10
    output_size: int = 3
    aggregate: str = "sender_latents"  # or "edge_messages" (canonical GNS)
    prune_dead_edge_stream: bool = True  # skip provably-dead edge compute
    # Dtype of the residual-stream scan carry (None = float32). The
    # message-passing step is HBM-bandwidth-bound, and ``dtype=bfloat16``
    # alone only casts matmul OPERANDS (the carried [N, L] state and its
    # residual adds/LN reads stay f32) — "bfloat16" here halves that
    # traffic too. Adds ~2^-8 relative rounding per step, the same class
    # as the bf16 aggregation carriage.
    carry_dtype: Optional[str] = None
    # Rematerialize each message-passing step in the backward pass
    # (jax.checkpoint over the scan body): activations per step are
    # recomputed instead of stored — O(1) instead of O(M) residual memory
    # in the step count, the standard trade for big-N training
    # (N=500k x latent 256 x 15 steps would otherwise hold ~30 GB of
    # residuals).
    remat: bool = False
    # Hierarchical (two-level) rematerialization: scan the processor as
    # M/remat_chunk checkpointed chunks of remat_chunk checkpointed steps.
    # The backward then holds M/c outer carries + c inner carries + one
    # step's transients instead of M carries — at BASELINE config 4
    # (15 steps x a 331 MB bf16 slot carry) that is the difference between
    # fitting the 15.75 GB HBM and not. Implies per-step checkpointing;
    # must divide num_message_passing_steps. Also checkpoints the
    # encoder/decoder MLPs (recompute two [N, H] matmuls instead of
    # storing ~4 [N, H] activations each).
    remat_chunk: Optional[int] = None
    # Run the step's post-aggregation tail (w_self matmul, hidden/final
    # Linears, LayerNorm, residual) as ONE fused Pallas row-tile pass
    # (ops/fused_step.py) instead of ~6 separate XLA fusions that each
    # round-trip an [N, H] tensor through HBM. Differentiable since round 4
    # (fused recompute-backward kernel with in-VMEM weight-grad
    # accumulation) — valid for rollout/eval AND training. Requires the
    # pruned sender-latents mode.
    fused_tail: bool = False


def init_encode_process_decode(
    key: jax.Array, config: EncodeProcessDecodeConfig
) -> Params:
    """Initialize all parameters. Internally jitted: eager init issues ~100
    tiny device ops, which is pathologically slow on remote-tunneled TPUs."""
    return _jit_init(key, config)


@functools.partial(jax.jit, static_argnames="config")
def _jit_init(key: jax.Array, config: EncodeProcessDecodeConfig) -> Params:
    latent = config.latent_size
    hidden = config.mlp_hidden_size
    n_hidden = config.mlp_num_hidden_layers
    keys = jax.random.split(key, 4 + config.num_message_passing_steps)

    def mlp_ln(k, in_dim):
        return init_mlp(k, in_dim, hidden, n_hidden, latent, layer_norm=True)

    encoder = {
        "node": mlp_ln(keys[0], config.node_input_size),
        "edge": mlp_ln(keys[1], config.edge_input_size),
    }
    steps = [
        {"edge": mlp_ln(jax.random.fold_in(k, 0), 3 * latent),
         "node": mlp_ln(jax.random.fold_in(k, 1), 2 * latent)}
        for k in keys[4:]
    ]
    processor = jax.tree.map(lambda *xs: jnp.stack(xs), *steps)
    return {
        "encoder": encoder,
        "processor": processor,
        "decoder_acc": init_mlp(
            keys[2], latent, hidden, n_hidden, config.output_size
        ),
        "decoder_temp_rate": init_mlp(keys[3], latent, hidden, n_hidden, 1),
    }


def _split_dense(
    x: jnp.ndarray, w: jnp.ndarray, dtype: Optional[jnp.dtype]
) -> jnp.ndarray:
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _mlp_tail(
    params: Params, h: jnp.ndarray, dtype: Optional[jnp.dtype]
) -> jnp.ndarray:
    """Hidden layers after the (externally computed) first layer, + final + LN."""
    layers = params["layers"]
    for layer in layers[1:-1]:
        h = jax.nn.relu(dense(h, layer, dtype))
    h = dense(h, layers[-1], dtype)
    if "ln" in params:
        h = layer_norm(h, params["ln"])
    return h


def _maybe_all_gather(
    values: jnp.ndarray, particle_axis: Optional[str], halo=None
) -> jnp.ndarray:
    """Expose the rows that shard-local neighbor indices may reference.

    Three modes:
    * single device (``particle_axis is None``): identity;
    * halo exchange (``halo`` set): concat ``[own, halo_left, halo_right]``
      — only the boundary-cell rows cross devices via ``ppermute``
      (O(N/P + halo) per device, the BASELINE config-5 scaling path;
      see ``parallel/halo.py``);
    * legacy all-gather: every shard's rows are gathered (O(N) per device —
      exact but memory/ICI-bound; kept for the index-sharded path)."""
    if particle_axis is None:
        return values
    if halo is not None:
        from cosmology_gnn_simulation_tpu.parallel.halo import expand_candidates

        return expand_candidates(values, halo, particle_axis)
    return jax.lax.all_gather(values, particle_axis, tiled=True)


# Above this many bytes for the gathered [N, k, H] tensor, neighbor
# aggregation is chunked over node tiles (N=500k, k=32, H=256 would
# otherwise materialize ~16 GB).
_GATHER_CHUNK_BYTES = 1 << 28


def _gather_sum(
    values: jnp.ndarray,
    neighbors: jnp.ndarray,
    sorted_edges=None,
) -> jnp.ndarray:
    """``out[i] = sum_j values[neighbors[i, j]]`` with automatic node-tile
    chunking so the intermediate gather never exceeds ~256 MB.

    With ``sorted_edges`` (training graphs), the custom-VJP form is used:
    the backward pass becomes a sorted-run prefix-sum difference instead of
    a slow TPU scatter-add (ops/aggregation.py)."""
    if sorted_edges is not None:
        from cosmology_gnn_simulation_tpu.ops.aggregation import (
            aggregate_sender_latents,
        )

        return aggregate_sender_latents(values, neighbors, sorted_edges)
    n, k = neighbors.shape
    h = values.shape[-1]
    total = n * k * h * 4
    if total <= _GATHER_CHUNK_BYTES:
        return jnp.take(values, neighbors, axis=0).sum(axis=1)
    rows_per_tile = max(1, _GATHER_CHUNK_BYTES // (k * h * 4))
    # Round to a divisor-friendly tile; pad N to a multiple.
    num_tiles = -(-n // rows_per_tile)
    pad = num_tiles * rows_per_tile - n
    padded = jnp.pad(neighbors, ((0, pad), (0, 0)))
    tiles = padded.reshape(num_tiles, rows_per_tile, k)
    out = jax.lax.map(
        lambda nb: jnp.take(values, nb, axis=0).sum(axis=1), tiles
    )
    return out.reshape(-1, h)[:n]


def _processor_step(
    x: jnp.ndarray,
    e: jnp.ndarray,
    neighbors: jnp.ndarray,
    step_params: Params,
    aggregate: str,
    dtype: Optional[jnp.dtype],
    particle_axis: Optional[str] = None,
    sorted_edges=None,
    halo=None,
):
    """One InteractionNetwork step (pre-residual outputs)."""
    latent = x.shape[-1]

    # --- Edge update: edge_mlp(cat[x_src, x_dst, e]) (graph_network.py:89-90),
    # first layer decomposed into per-node projections + per-edge e-term.
    edge_first = step_params["edge"]["layers"][0]
    w = edge_first["w"]
    w_src, w_dst, w_e = w[:latent], w[latent: 2 * latent], w[2 * latent:]
    y_src = _split_dense(x, w_src, dtype)  # [N, H]
    y_dst = _split_dense(x, w_dst, dtype)  # [N, H]
    y_src_all = _maybe_all_gather(y_src, particle_axis, halo)
    if sorted_edges is not None:
        from cosmology_gnn_simulation_tpu.ops.aggregation import (
            gather_sender_rows,
        )

        y_src_nbr = gather_sender_rows(y_src_all, neighbors, sorted_edges)
    else:
        y_src_nbr = jnp.take(y_src_all, neighbors, axis=0)
    h_e = jax.nn.relu(
        y_src_nbr
        + y_dst[:, None, :]
        + _split_dense(e, w_e, dtype)
        + edge_first["b"]
    )
    e_new = _mlp_tail(step_params["edge"], h_e, dtype)  # [N, k, L]

    # --- Aggregation at receivers (graph_network.py:92).
    node_first = step_params["node"]["layers"][0]
    nw = node_first["w"]
    w_self, w_agg = nw[:latent], nw[latent:]
    if aggregate == "sender_latents":
        # Reference semantics: scatter-add of x_j. Projected-then-gathered.
        z = _split_dense(x, w_agg, dtype)  # [N, H]
        agg_h = _gather_sum(
            _maybe_all_gather(z, particle_axis, halo), neighbors,
            sorted_edges,
        )
    elif aggregate == "edge_messages":
        agg_h = _split_dense(e_new.sum(axis=1), w_agg, dtype)
    else:
        raise ValueError(f"unknown aggregate mode: {aggregate}")

    h_n = jax.nn.relu(_split_dense(x, w_self, dtype) + agg_h + node_first["b"])
    x_new = _mlp_tail(step_params["node"], h_n, dtype)  # [N, L]
    return x_new, e_new


def _pruned_processor_step(
    x: jnp.ndarray,
    neighbors: jnp.ndarray,
    step_params: Params,
    dtype: Optional[jnp.dtype],
    particle_axis: Optional[str] = None,
    sorted_edges=None,
    halo=None,
    cellblock=None,
    cellblock_spec=None,
    fused_tail: bool = False,
    cellblock_mode: str = "slots",
) -> jnp.ndarray:
    """Node-stream-only InteractionNetwork step, valid under
    ``sender_latents`` aggregation where the edge stream is provably dead
    (see module docstring).

    With ``fused_tail`` the return value is the FULL new carry (residual
    included — one fused Pallas pass, see ``ops/fused_step.py``);
    otherwise the pre-residual step output, added by the caller."""
    latent = x.shape[-1]
    node_first = step_params["node"]["layers"][0]
    nw = node_first["w"]
    w_self, w_agg = nw[:latent], nw[latent:]
    z = _split_dense(x, w_agg, dtype)
    if cellblock is not None and halo is not None:
        # Halo x cell-block composition (round 4): `cellblock` is a
        # parallel.halo.HaloCellBlock over this shard's candidate set.
        # Exchange the projected boundary latents (ppermute), permute into
        # the local plan's sorted order, run the S@window MXU kernel, and
        # compact back to the owned rows. Differentiable end-to-end: the
        # takes transpose to scatters, the kernel through its S^T custom
        # VJP (plans built with cellblock_reverse=True), the exchange
        # through ppermute's reverse.
        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            cellblock_aggregate,
        )

        z_cand = _maybe_all_gather(z, particle_axis, halo)
        z_sorted = jnp.take(z_cand, cellblock.plan.order, axis=0)
        agg_sorted = cellblock_aggregate(
            z_sorted, cellblock.plan, cellblock_spec,
            carry_dtype=jnp.float32 if dtype is None else dtype,
        )
        agg_h = jnp.take(agg_sorted, cellblock.inv_owned, axis=0)
    elif cellblock is not None and cellblock_mode == "hybrid":
        # Hybrid cell-block aggregation: the carry `x` lives on the N
        # cell-sorted particle rows; expand the PROJECTED latents to slot
        # space, run the S@window kernel, compact back — two quasi-monotone
        # row gathers per step instead of the slot-row padding tax on every
        # LN/MLP pass (probe-measured the better trade at flagship scale;
        # cb_hybrid_r3.json).
        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            cellblock_aggregate,
        )

        agg_h = cellblock_aggregate(
            z, cellblock, cellblock_spec,
            carry_dtype=jnp.float32 if dtype is None else dtype,
        )
    elif cellblock is not None:
        # Selection-matrix aggregation on the MXU (ops/cellblock.py). The
        # carry `x` is already in SLOT space here (see the slot-space
        # expansion in apply_encode_process_decode), so the kernel consumes
        # z directly — the only per-step prep is a contiguous z-wrap pad.
        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            cellblock_aggregate_slots,
        )

        # Same precision policy as the gather path below: candidates carried
        # in `dtype` when reduced precision is requested, f32 otherwise.
        agg_h = cellblock_aggregate_slots(
            z, cellblock, cellblock_spec,
            carry_dtype=jnp.float32 if dtype is None else dtype,
        )
    else:
        if dtype is not None:
            # The gather+sum of projected latents is the bandwidth-dominant
            # op of the step; in reduced-precision mode carry it in that
            # dtype (k-wide bf16 sums add ~2^-8 relative noise, same order
            # as the matmuls).
            z = z.astype(dtype)
        agg_h = _gather_sum(
            _maybe_all_gather(z, particle_axis, halo), neighbors, sorted_edges
        )
        if not fused_tail:
            agg_h = agg_h.astype(jnp.float32)
        # (fused path: the kernel casts agg to f32 on read — materializing
        # the cast here would cost an extra [N, H] f32 HBM round-trip.)
    if fused_tail:
        from cosmology_gnn_simulation_tpu.ops.fused_step import (
            fused_step_tail,
        )

        return fused_step_tail(
            x, agg_h, step_params["node"],
            dtype=jnp.float32 if dtype is None else dtype,
        )
    h_n = jax.nn.relu(_split_dense(x, w_self, dtype) + agg_h + node_first["b"])
    return _mlp_tail(step_params["node"], h_n, dtype)


def apply_encode_process_decode(
    params: Params,
    graph: ParticleGraph,
    config: EncodeProcessDecodeConfig,
    dtype: Optional[jnp.dtype] = None,
    particle_axis: Optional[str] = None,
    halo=None,
    cellblock_spec=None,
    cellblock_mode: str = "slots",
) -> Dict[str, jnp.ndarray]:
    """Forward pass. Returns ``{'acceleration': [N, 3], 'temp_rate': [N, 1]}``.

    Under particle sharding (``particle_axis`` inside ``shard_map``), ``x``
    rows are shard-local while ``graph.neighbors`` hold global indices; the
    per-step projected latents are all-gathered before the neighbor gather.
    With ``halo`` (a ``parallel.halo.HaloSends``), neighbors instead index
    the ``[own, halo_left, halo_right]`` candidate space and only boundary
    rows are exchanged per step via ``ppermute``.

    When ``graph.cellblock`` is set (rows cell-sorted; requires the matching
    static ``cellblock_spec``), the pruned-path aggregation runs as
    selection-matrix matmuls (``ops/cellblock.py``). Incompatible with
    ``particle_axis``/``halo`` sharding. ``cellblock_mode`` picks where the
    residual carry lives:

    * ``"slots"`` — expand to the padded slot table once after the encoder,
      run every step on slot rows, compact once before the decoders. Wins
      when the expand/compact row gathers dominate (config-4 scale, where
      the per-step gathers are latency-bound).
    * ``"hybrid"`` — carry stays on the N cell-sorted particle rows; each
      step pays expand(projected z) -> S@window kernel -> compact. Wins
      when the slot padding's rowwise LN/MLP tax dominates (flagship
      scale: the padding taxes every pass 0.51 vs 0.20 ms while the
      quasi-monotone expand/compact gathers are nearly free —
      benchmarks/results/cb_flagship_parts_r3.json, cb_hybrid_r3.json).
    """
    if cellblock_mode not in ("slots", "hybrid"):
        raise ValueError(f"unknown cellblock_mode: {cellblock_mode}")
    if graph.cellblock is not None:
        if cellblock_spec is None:
            raise ValueError(
                "graph carries a cellblock plan but cellblock_spec was not "
                "passed (it is static and cannot ride the pytree)"
            )
        if particle_axis is not None and halo is None:
            raise ValueError(
                "cellblock aggregation under the index-sharded all-gather "
                "path is unsupported — use halo sharding "
                "(featurize_halo(cellblock_spec=...))"
            )
        if halo is not None and cellblock_mode != "hybrid":
            raise ValueError(
                "the halo x cellblock composition requires "
                "cellblock_mode='hybrid' (the residual carry stays on the "
                "owned particle rows; slot space is shard-local)"
            )
        if not (
            config.aggregate == "sender_latents"
            and config.prune_dead_edge_stream
        ):
            raise ValueError(
                "cellblock aggregation requires the pruned sender_latents "
                "mode (the edge_messages gather is not a segment sum)"
            )
    if config.fused_tail and not (
        config.aggregate == "sender_latents" and config.prune_dead_edge_stream
    ):
        raise ValueError(
            "fused_tail requires the pruned sender_latents mode (the edge "
            "stream's tail is not fused)"
        )
    chunk = config.remat_chunk
    if chunk is not None and chunk > 1:
        if config.num_message_passing_steps % chunk:
            raise ValueError(
                f"remat_chunk={chunk} must divide "
                f"num_message_passing_steps="
                f"{config.num_message_passing_steps}"
            )
    mlp_fn = (
        jax.checkpoint(apply_mlp, static_argnums=(2,))
        if chunk is not None and chunk > 1
        else apply_mlp
    )

    def scan_steps(body, carry):
        if config.remat or (chunk is not None and chunk > 1):
            body = jax.checkpoint(body)
        if chunk is None or chunk <= 1:
            out, _ = jax.lax.scan(body, carry, params["processor"])
            return out
        m = config.num_message_passing_steps
        chunked = jax.tree.map(
            lambda p: p.reshape((m // chunk, chunk) + p.shape[1:]),
            params["processor"],
        )

        @jax.checkpoint
        def chunk_body(c, chunk_params):
            out, _ = jax.lax.scan(body, c, chunk_params)
            return out, None

        out, _ = jax.lax.scan(chunk_body, carry, chunked)
        return out

    nodes = graph.nodes
    if graph.globals_ is not None:
        # Broadcast globals onto every node before encoding
        # (graph_network.py:166-173). node_input_size must include them.
        broadcast = jnp.broadcast_to(
            graph.globals_[None, :], (nodes.shape[0], graph.globals_.shape[-1])
        )
        nodes = jnp.concatenate([nodes, broadcast], axis=-1)
    x = mlp_fn(params["encoder"]["node"], nodes, dtype)
    carry_dt = (
        jnp.dtype(config.carry_dtype) if config.carry_dtype else None
    )

    def residual_add(carry, new):
        if carry_dt is None:
            return carry + new
        return carry + new.astype(carry_dt)

    if carry_dt is not None:
        x = x.astype(carry_dt)
    neighbors = graph.neighbors
    prune = (
        config.aggregate == "sender_latents" and config.prune_dead_edge_stream
    )

    if prune:
        slots_mode = graph.cellblock is not None and cellblock_mode == "slots"
        if slots_mode:
            # Slot-space forward: expand latents to the padded slot table
            # ONCE (monotone gather), run every message-passing step on slot
            # rows (empty-slot rows carry harmless garbage — the selection
            # matrices never reference them), and compact ONCE before the
            # decoders. Saves the ~2x-per-step expand/compact gathers at the
            # cost of C/mean-occupancy extra MLP rows. (The hybrid mode
            # makes the opposite trade — see the docstring.)
            from cosmology_gnn_simulation_tpu.ops.cellblock import (
                compact_from_slots,
                expand_to_slots,
            )

            x = expand_to_slots(x, graph.cellblock)

        def body(carry, step_params):
            x_new = _pruned_processor_step(
                carry, neighbors, step_params, dtype, particle_axis,
                graph.sorted_edges, halo, graph.cellblock, cellblock_spec,
                config.fused_tail, cellblock_mode,
            )
            if config.fused_tail:
                return x_new, None  # residual applied inside the kernel
            return residual_add(carry, x_new), None

        x = scan_steps(body, x)
        if slots_mode:
            x = compact_from_slots(x, graph.cellblock)
    else:
        e = mlp_fn(params["encoder"]["edge"], graph.edges, dtype)
        if carry_dt is not None:
            e = e.astype(carry_dt)

        def body(carry, step_params):
            x, e = carry
            x_new, e_new = _processor_step(
                x, e, neighbors, step_params, config.aggregate, dtype,
                particle_axis, graph.sorted_edges, halo,
            )
            return (residual_add(x, x_new), residual_add(e, e_new)), None

        x, e = scan_steps(body, (x, e))
    return {
        "acceleration": mlp_fn(params["decoder_acc"], x, dtype),
        "temp_rate": mlp_fn(params["decoder_temp_rate"], x, dtype),
    }


def reference_apply_encode_process_decode(
    params: Params,
    graph: ParticleGraph,
    config: EncodeProcessDecodeConfig,
) -> Dict[str, jnp.ndarray]:
    """Direct (unoptimized) forward matching the reference's tensor program
    shape-for-shape — concat inputs, per-edge matmuls, Python loop over steps.

    Used only in tests as the semantic oracle for ``apply_encode_process_decode``.
    """
    nodes = graph.nodes
    if graph.globals_ is not None:
        broadcast = jnp.broadcast_to(
            graph.globals_[None, :], (nodes.shape[0], graph.globals_.shape[-1])
        )
        nodes = jnp.concatenate([nodes, broadcast], axis=-1)
    x = apply_mlp(params["encoder"]["node"], nodes)
    e = apply_mlp(params["encoder"]["edge"], graph.edges)
    neighbors = graph.neighbors
    m = config.num_message_passing_steps
    for i in range(m):
        step_params = jax.tree.map(lambda p: p[i], params["processor"])
        x_src = jnp.take(x, neighbors, axis=0)  # [N, k, L]
        x_dst = jnp.broadcast_to(x[:, None, :], x_src.shape)
        edge_in = jnp.concatenate([x_src, x_dst, e], axis=-1)
        e_new = apply_mlp(step_params["edge"], edge_in)
        if config.aggregate == "sender_latents":
            agg = x_src.sum(axis=1)
        else:
            agg = e_new.sum(axis=1)
        node_in = jnp.concatenate([x, agg], axis=-1)
        x_new = apply_mlp(step_params["node"], node_in)
        x = x + x_new
        e = e + e_new
    return {
        "acceleration": apply_mlp(params["decoder_acc"], x),
        "temp_rate": apply_mlp(params["decoder_temp_rate"], x),
    }
