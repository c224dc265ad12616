"""Property tests for the shared sort-and-rank binning primitive.

``run_starts`` / ``bucket_boundaries`` replace ``jnp.searchsorted`` (round 3:
the binary search lowers to ~log2(m) rounds of elementwise gathers, which
this TPU backend runs pathologically slowly — 8.45 of the flagship kNN's
16.5 ms; see benchmarks/results/knn_decomp_r3.json). numpy's searchsorted is
the oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.ops.binning import (
    bin_by_key,
    bucket_boundaries,
    run_starts,
)


@pytest.mark.parametrize("seed", range(5))
def test_run_starts_matches_searchsorted(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, 4000))
    nb = int(rng.integers(1, 64))
    keys = np.sort(rng.integers(0, nb, m)).astype(np.int32)
    got = np.asarray(run_starts(jnp.asarray(keys)))
    assert np.array_equal(got, np.searchsorted(keys, keys, side="left"))


@pytest.mark.parametrize("seed", range(5))
def test_bucket_boundaries_matches_searchsorted(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, 4000))
    nb = int(rng.integers(1, 64))
    keys = np.sort(rng.integers(0, nb, m)).astype(np.int32)
    got = np.asarray(bucket_boundaries(jnp.asarray(keys), nb))
    want = np.searchsorted(keys, np.arange(nb + 1), side="left")
    assert np.array_equal(got, want)


def test_bucket_boundaries_empty_buckets():
    # Buckets with no members take the next present bucket's start.
    keys = jnp.asarray([3, 3, 7], jnp.int32)
    got = np.asarray(bucket_boundaries(keys, 10))
    want = np.searchsorted(np.asarray(keys), np.arange(11), side="left")
    assert np.array_equal(got, want)


def test_bin_by_key_ranks_and_overflow():
    keys = jnp.asarray([2, 0, 2, 2, 1, 0], jnp.int32)
    b = bin_by_key(keys, num_keys=3, capacity=2)
    sorted_keys = np.asarray(keys)[np.asarray(b.order)]
    assert np.array_equal(np.sort(np.asarray(keys)), sorted_keys)
    # rank counts within each key group, in stable sorted order
    assert np.array_equal(np.asarray(b.rank), [0, 1, 0, 0, 1, 2])
    assert int(b.overflow) == 1  # third '2' exceeds capacity 2
    # overflow item gets the out-of-bounds sentinel slot
    assert int(np.asarray(b.slot)[-1]) == 3 * 2
