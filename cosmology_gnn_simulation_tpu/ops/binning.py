"""Shared sort-and-rank binning primitive.

Three components independently need the same algorithm — group integer keys,
rank members within their group, and scatter into a fixed-capacity table
with overflow counting:

* the XLA cell list (``ops/cell_list.py``): particles -> cells;
* the Pallas kNN table build (``ops/pallas_knn.py``): particles -> cells
  plus position/id planes;
* the reverse adjacency (``ops/aggregation.py``): edges -> sender buckets.

Keeping one implementation makes the backends provably consistent (a fix to
the rank/overflow arithmetic propagates everywhere).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Binning(NamedTuple):
    """Result of sorting ``keys`` into fixed-capacity buckets.

    Attributes:
      order:    ``[M]`` permutation sorting the items by key (stable).
      rank:     ``[M]`` each *sorted* item's index within its key group.
      slot:     ``[M]`` flat table slot ``key * capacity + rank`` for sorted
                items, or the out-of-bounds sentinel ``num_keys * capacity``
                for overflow (use with ``.at[slot].set(..., mode="drop")``).
      overflow: scalar — items beyond ``capacity`` in their group.
    """

    order: jnp.ndarray
    rank: jnp.ndarray
    slot: jnp.ndarray
    overflow: jnp.ndarray


def bin_by_key(keys: jnp.ndarray, num_keys: int, capacity: int) -> Binning:
    """Stable-sort ``keys`` and compute per-group ranks + capacity slots."""
    m = keys.shape[0]
    order = jnp.argsort(keys)
    sorted_keys = keys[order]
    run_start = jnp.searchsorted(sorted_keys, sorted_keys, side="left")
    rank = jnp.arange(m, dtype=jnp.int32) - run_start.astype(jnp.int32)
    overflow = jnp.sum(rank >= capacity)
    slot = jnp.where(
        rank < capacity, sorted_keys * capacity + rank, num_keys * capacity
    )
    return Binning(order=order, rank=rank, slot=slot, overflow=overflow)


def scatter_to_table(
    binning: Binning,
    sorted_values: jnp.ndarray,
    num_keys: int,
    capacity: int,
    fill,
    dtype,
) -> jnp.ndarray:
    """Scatter sorted per-item values into the ``[num_keys, capacity]`` table
    (overflow items dropped)."""
    base = jnp.full((num_keys * capacity,), fill, dtype)
    return base.at[binning.slot].set(
        sorted_values.astype(dtype), mode="drop", unique_indices=True
    ).reshape(num_keys, capacity)
