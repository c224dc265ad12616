"""Neighbor gather/aggregation ops with fast exact custom VJPs.

Forward ops over a regular ``[N, k]`` neighbor table:

* ``aggregate_sender_latents``: ``agg[i] = sum_j z[neighbors[i, j]]`` —
  a fused gather+sum (row gathers run at HBM bandwidth on TPU).
* ``gather_sender_rows``: ``out[i, j] = z[neighbors[i, j]]`` — the plain
  row gather feeding per-edge MLPs.

Both autodiff transposes are scatter-adds into ``dz`` — measured ~7.9 ms per
message-passing step at N=32k/k=16/H=128 on v5e (~79 ms across the 10-step
backward, the dominant term of the round-1 386 ms train step;
``benchmarks/profile_backward_tpu.py``).

Fix — express the transpose entirely in TPU-friendly primitives:

1. Once per graph (amortized over all message-passing steps and the whole
   fwd+bwd), sort the ``N*k`` edge stream by *sender* with
   ``lax.sort_key_val`` (~3 ms; crucially this carries the payload through
   the sort network, avoiding the pathological elementwise gather/scatter a
   reverse-adjacency *table* build needs — that build alone measured ~89 ms).
2. Per backward step, the cotangent is a segment sum over the sorted runs:
   ``dz[p] = sum_{e in run(p)} g_e``. Gather the cotangent rows in
   sorted-edge order (row gather, bandwidth-bound), take a running prefix
   sum over the edge axis, and read each segment as a *difference of two
   prefix rows*: ``dz[p] = prefix[end_p] - prefix[start_p]`` — two [N, H]
   row gathers. No scatter anywhere.

The prefix sum is carried in float32 with a two-level (chunked) form:
segments read from a chunk-local prefix plus an inter-chunk offset. The
intra-chunk error is bounded by ~chunk ULPs, but the inter-chunk offsets are
a plain f32 cumsum whose rounding scales with the ULP of the *running total*
— for same-sign cotangent streams it grows with the number of chunks (E can
reach ~16M at BASELINE config 4). Measured grad agreement vs. the native
scatter transpose is ~1e-6 relative at test sizes
(tests/test_aggregation.py asserts 1e-3/1e-4-scaled bounds); carry the
offsets in float64 if tighter agreement is ever needed at extreme E.

Exact for ANY neighbor table (duplicates included — multiplicity is
preserved by the edge stream); there is no capacity/overflow regime, unlike
the reverse-adjacency design this replaces.

Reference counterpart: the ``torch_scatter`` CUDA segment ops PyG's
``propagate(aggr='add')`` bottoms out in
(``/root/reference/graph_network.py:79,92``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cosmology_gnn_simulation_tpu.ops.binning import bucket_boundaries


class SortedEdges(NamedTuple):
    """Edge stream of a regular ``[N, k]`` neighbor table, sorted by sender.

    Edge ``e`` in flat order is ``(receiver i, sender neighbors[i, j])`` with
    ``e = i * k + j``.

    Attributes:
      order:      ``[N*k]`` int32 — flat edge indices in ascending-sender
                  order (ties keep flat order: the sort is stable).
      receivers:  ``[N*k]`` int32 — receiver of each edge in sorted order
                  (``order // k``, precomputed).
      boundaries: ``[N+1]`` int32 — ``boundaries[p]:boundaries[p+1]`` is the
                  run of sorted edges whose sender is particle ``p``.
    """

    order: jnp.ndarray
    receivers: jnp.ndarray
    boundaries: jnp.ndarray


@jax.jit
def build_sorted_edges(neighbors: jnp.ndarray) -> SortedEdges:
    """Sort the edge stream by sender, carrying payloads through the sort.

    ``lax.sort_key_val`` moves the payload inside the sort network — the
    separate ``payload[order]`` permutation an argsort would need is an
    elementwise gather, pathologically slow on TPU.
    """
    n, k = neighbors.shape
    senders = neighbors.reshape(-1).astype(jnp.int32)
    flat = jnp.arange(n * k, dtype=jnp.int32)
    sorted_senders, order = jax.lax.sort_key_val(senders, flat)
    boundaries = bucket_boundaries(sorted_senders, n)
    return SortedEdges(
        order=order, receivers=order // k, boundaries=boundaries
    )


# Chunk length for the two-level prefix sum: MXU-aligned, and small enough
# that the triangular matmul's O(E * chunk * H) FLOPs stay sub-ms.
_PREFIX_CHUNK = 128

# Above this many bytes for the gathered [E, H] cotangent stream, the
# backward runs per H-tile: slice the cotangent columns FIRST, then gather
# and prefix-sum each [E, h_tile] stream — at BASELINE config-4 training
# shapes (E = 16M, H = 256) the full f32 stream would be ~16 GB. The tile
# stays lane-aligned (>= 128) so nothing pads.
_BWD_STREAM_BYTES_LIMIT = 1 << 33


def _tiled_gather_segment_sum(g, gather_idx, boundaries, out_dtype):
    """``segment_sum(g[gather_idx][boundaries...])`` with the H axis tiled
    BEFORE the row gather, bounding peak memory (the gather is what
    materializes E rows)."""
    n, h = g.shape
    e = gather_idx.shape[0]
    if e * h * 4 <= _BWD_STREAM_BYTES_LIMIT or h <= _PREFIX_CHUNK:
        gathered = jnp.take(g, gather_idx, axis=0)
        return _segment_sum_sorted(gathered, boundaries, out_dtype)
    h_tile = max(_PREFIX_CHUNK, (_BWD_STREAM_BYTES_LIMIT // (e * 4))
                 // _PREFIX_CHUNK * _PREFIX_CHUNK)
    h_tile = min(h, h_tile)
    if h % h_tile:
        h_tile = next(
            d for d in range(h_tile, 0, -1) if h % d == 0
        )
    num_tiles = h // h_tile

    def tile(ti):
        g_t = jax.lax.dynamic_slice_in_dim(g, ti * h_tile, h_tile, axis=1)
        gathered = jnp.take(g_t, gather_idx, axis=0)
        return _segment_sum_sorted(gathered, boundaries, out_dtype)

    out = jax.lax.map(tile, jnp.arange(num_tiles))  # [T, P, h_tile]
    return out.transpose(1, 0, 2).reshape(-1, h)


def _segment_sum_sorted(
    rows: jnp.ndarray, boundaries: jnp.ndarray, out_dtype
) -> jnp.ndarray:
    """``out[p] = sum(rows[boundaries[p]:boundaries[p+1]])`` — segment sums
    of an already-sorted row stream via prefix-sum differences (no scatter).

    The prefix sum itself is a *triangular matmul* per chunk: XLA lowers
    ``cumsum`` to log2(chunk) shifted-add passes over the whole stream
    (~4 ms at N*k=512k, H=128 — as slow as the scatter it replaces), whereas
    ``L @ tiles`` with a lower-triangular ones matrix reads the stream once
    and runs on the MXU (~sub-ms).
    """
    e, h = rows.shape
    rows = rows.astype(jnp.float32)
    chunk = _PREFIX_CHUNK
    pad = (-e) % chunk
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
    t = (e + pad) // chunk
    tiles = rows.reshape(t, chunk, h)
    # Inclusive prefix within each chunk: one [chunk, chunk] triangular
    # matmul batched over chunks (constant-folded triangular matrix).
    tri = jnp.tril(jnp.ones((chunk, chunk), jnp.float32))
    intra = jax.lax.dot_general(
        tiles, tri,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).transpose(0, 2, 1)  # [t, chunk, h]
    totals = intra[:, -1, :]
    # Exclusive inter-chunk offsets: the totals stream is chunk-times
    # smaller, so a log-pass cumsum is cheap here (a [t, t] triangular
    # matmul would be O(t^2) memory — t can reach ~31k at N=500k, k=32).
    inter = jnp.cumsum(totals, axis=0) - totals
    # Exclusive flat prefix at a boundary b (sum rows[:b]) WITHOUT
    # materializing the combined prefix stream (saves two full passes):
    #   P(b) = inter[(b-1)//chunk] + intra_flat[b-1]   for b >= 1
    #   P(0) = 0
    # (valid at chunk starts too: inter[c] = inter[c-1] + totals[c-1] and
    # intra_flat[c*chunk - 1] = totals[c-1]).
    intra_flat = intra.reshape(t * chunk, h)

    def prefix_at(b):
        idx = jnp.maximum(b - 1, 0)
        val = (
            jnp.take(inter, idx // chunk, axis=0)
            + jnp.take(intra_flat, idx, axis=0)
        )
        return jnp.where((b > 0)[:, None], val, 0.0)

    starts = prefix_at(boundaries[:-1])
    ends = prefix_at(boundaries[1:])
    return (ends - starts).astype(out_dtype)


@jax.custom_vjp
def aggregate_sender_latents(
    z: jnp.ndarray, neighbors: jnp.ndarray, sorted_edges: SortedEdges
) -> jnp.ndarray:
    """``sum_j z[neighbors[i, j]]`` with a scatter-free backward pass."""
    return jnp.take(z, neighbors, axis=0).sum(axis=1)


def _agg_fwd(z, neighbors, sorted_edges):
    return jnp.take(z, neighbors, axis=0).sum(axis=1), sorted_edges


def _agg_bwd(sorted_edges, g):
    dz = _tiled_gather_segment_sum(
        g, sorted_edges.receivers, sorted_edges.boundaries, g.dtype
    )
    return dz, None, None


aggregate_sender_latents.defvjp(_agg_fwd, _agg_bwd)


@jax.custom_vjp
def gather_sender_rows(
    z: jnp.ndarray, neighbors: jnp.ndarray, sorted_edges: SortedEdges
) -> jnp.ndarray:
    """``z[neighbors]`` (``[N, k, H]``) with a scatter-free backward pass."""
    return jnp.take(z, neighbors, axis=0)


def _gather_fwd(z, neighbors, sorted_edges):
    return jnp.take(z, neighbors, axis=0), sorted_edges


def _gather_bwd(sorted_edges, g):
    h = g.shape[-1]
    dz = _tiled_gather_segment_sum(
        g.reshape(-1, h), sorted_edges.order, sorted_edges.boundaries, g.dtype
    )
    return dz, None, None


gather_sender_rows.defvjp(_gather_fwd, _gather_bwd)
