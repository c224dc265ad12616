"""Segment aggregation ops.

The reference's message aggregation relies on ``torch_scatter`` scatter-add
inside PyG's ``MessagePassing.propagate``
(``/root/reference/graph_network.py:79,92``). Because our k-NN graphs are
regular ([N, k] neighbors), the hot path never needs a scatter — aggregation
is a gather + sum over the ``k`` axis (see ``models/encode_process_decode``).

These segment ops exist for the general/irregular-graph surface (halo-edge
aggregation in the sharded path, and API parity for users porting
scatter-based code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Sum ``data`` rows into ``num_segments`` buckets (static shape)."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def gather_sum_neighbors(values: jnp.ndarray, neighbors: jnp.ndarray) -> jnp.ndarray:
    """Regular-graph aggregation: ``out[i] = sum_j values[neighbors[i, j]]``.

    This is the TPU-native replacement for the reference's scatter-add of
    sender features (``graph_network.py:92`` with PyG's default
    ``message(x_j)``): a dense gather ([N, k, F]) followed by a sum over k.
    """
    return jnp.take(values, neighbors, axis=0).sum(axis=1)
