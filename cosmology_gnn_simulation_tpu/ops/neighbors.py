"""On-device periodic k-nearest-neighbor search.

The reference builds the periodic k-NN graph on the host by materializing all
27 ghost copies of the box and calling ``torch_cluster.knn``
(``/root/reference/data_utils.py:9-33,147-152``) — an O(27N) memory blowup and
a host<->device round trip per training step / rollout step.

Here the 27x ghost trick is replaced by minimum-image distance arithmetic
computed directly on device, inside ``jit``. The result is a *regular* graph:
every particle has exactly ``k`` neighbors (its own zero-distance image
included, matching the reference's effective self-loop), returned as a dense
``[N, k]`` index array with fully static shapes.

v0 strategy: tiled exact brute force. Queries are processed in tiles of
``query_tile`` rows; each tile computes min-image squared distances to all N
particles ([tile, N], fused subtract/round/square/reduce on the VPU) followed
by ``lax.top_k``. Exact, simple, and fast enough through N~100k. A cell-list
Pallas kernel covers larger N (see ``ops/cell_list.py``).

Fidelity note: selecting by minimum-image distance yields the same neighbor
*index* set as the reference's ghost-copy search whenever no particle's
second-closest periodic image would enter the k-NN set — i.e. whenever the
k-th neighbor distance < box/2, always true for real configs (k <= 32,
N >= 4k). Edge features depend only on indices, so model inputs match exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cosmology_gnn_simulation_tpu.ops.periodic import min_image_displacement


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int = 0) -> jnp.ndarray:
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("k", "query_tile", "return_distances"))
def knn_periodic(
    positions: jnp.ndarray,
    k: int,
    box_size,
    *,
    queries: jnp.ndarray = None,
    query_tile: int = 512,
    return_distances: bool = False,
):
    """Exact k-NN under the minimum-image (periodic) metric.

    Args:
      positions: ``[N, 3]`` wrapped coordinates in ``[0, box)`` — the
        reference set neighbor indices point into.
      k: neighbor count, **including** the self-loop (matching the reference's
        ``num_neighbors``; each node's k nearest ghost points include itself
        at distance 0 — ``data_utils.py:149``).
      box_size: scalar box edge length.
      queries: optional ``[Q, 3]`` query points (defaults to ``positions``).
        Used by the particle-sharded path: local queries against the
        all-gathered global reference set.
      query_tile: rows of the distance matrix computed at once. Peak temporary
        memory is ``query_tile * N * 4`` bytes.
      return_distances: also return ``[Q, k]`` squared min-image distances.

    Returns:
      ``[Q, k]`` int32 neighbor indices, ascending by distance (self first
      when queries == positions); optionally also the squared distances.
    """
    n = positions.shape[0]
    if k > n:
        raise ValueError(f"k={k} exceeds particle count {n}")
    box = jnp.asarray(box_size, positions.dtype)
    if queries is None:
        queries = positions
    nq = queries.shape[0]

    padded_q = _pad_to_multiple(queries, query_tile, axis=0)
    num_tiles = padded_q.shape[0] // query_tile
    tiles = padded_q.reshape(num_tiles, query_tile, positions.shape[1])

    def one_tile(q):
        # [tile, N, 3] displacement folds into a fused [tile, N] reduction.
        delta = min_image_displacement(q[:, None, :] - positions[None, :, :], box)
        d2 = jnp.sum(delta * delta, axis=-1)
        neg_d2, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg_d2

    idx, d2 = jax.lax.map(one_tile, tiles)
    idx = idx.reshape(-1, k)[:nq]
    if return_distances:
        return idx, d2.reshape(-1, k)[:nq]
    return idx
