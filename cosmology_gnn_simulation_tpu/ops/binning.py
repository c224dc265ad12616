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

import jax
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
      payload:  tuple of ``[M, ...]`` arrays co-sorted with the keys (see
                ``bin_by_key``'s ``payload`` arg) — carried through the sort
                network, so no post-hoc ``x[order]`` gather is needed.
    """

    order: jnp.ndarray
    rank: jnp.ndarray
    slot: jnp.ndarray
    overflow: jnp.ndarray
    payload: tuple = ()


def run_starts(sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """``out[i]`` = first index of the equal-key run containing ``i`` in an
    ascending-sorted key array.

    Equivalent to ``searchsorted(sorted_keys, sorted_keys, side="left")`` but
    built from a compare-shift + ``cummax`` — a binary search lowers to
    ~log2(m) rounds of elementwise gathers, which this TPU backend runs at
    ~0.1 GB/s (probe: 8.45 of the flagship kNN's 16.5 ms was this one
    searchsorted; the argsort itself was ~0.1 ms — docs/PERFORMANCE.md)."""
    m = sorted_keys.shape[0]
    iota = jnp.arange(m, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_keys[1:] != sorted_keys[:-1]]
    )
    return jax.lax.cummax(jnp.where(is_start, iota, 0))


def bucket_boundaries(sorted_keys: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    """``b[v]`` = first index ``i`` with ``sorted_keys[i] >= v`` for
    ``v in [0, num_buckets]`` (so bucket ``v`` spans ``[b[v], b[v+1])``).

    Equivalent to ``searchsorted(sorted_keys, arange(num_buckets + 1))`` for
    keys in ``[0, num_buckets)`` but scatter + reverse-``cummin`` instead of
    a binary search (same gather pathology as ``run_starts``; table scatters
    with unique indices are fast on this backend — CLAUDE.md)."""
    m = sorted_keys.shape[0]
    iota = jnp.arange(m, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_keys[1:] != sorted_keys[:-1]]
    )
    # Run starts scatter their index at their key; non-starts get a unique
    # out-of-range slot (dropped) so unique_indices holds for the whole op.
    idx = jnp.where(is_start, sorted_keys, num_buckets + 1 + iota)
    b = (
        jnp.full((num_buckets + 1,), m, jnp.int32)
        .at[idx]
        .set(iota, mode="drop", unique_indices=True)
    )
    # Empty buckets take the NEXT present bucket's start (suffix minimum).
    return jax.lax.cummin(b, reverse=True)


def bin_by_key(
    keys: jnp.ndarray, num_keys: int, capacity: int, payload=()
) -> Binning:
    """Stable-sort ``keys`` and compute per-group ranks + capacity slots.

    ``payload`` arrays ride inside the sort network (``lax.sort`` variadic
    operands) instead of being permuted afterwards — a post-hoc ``x[order]``
    is an elementwise gather, and gathers with a minor dim of 3 additionally
    pad to 128 lanes on this backend (CLAUDE.md).
    """
    m = keys.shape[0]
    iota = jnp.arange(m, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(
        (keys, iota) + tuple(payload), num_keys=1, is_stable=True
    )
    sorted_keys, order = sorted_ops[0], sorted_ops[1]
    run_start = run_starts(sorted_keys)
    rank = jnp.arange(m, dtype=jnp.int32) - run_start.astype(jnp.int32)
    overflow = jnp.sum(rank >= capacity)
    slot = jnp.where(
        rank < capacity, sorted_keys * capacity + rank, num_keys * capacity
    )
    return Binning(
        order=order, rank=rank, slot=slot, overflow=overflow,
        payload=tuple(sorted_ops[2:]),
    )


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
