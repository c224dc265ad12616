"""Runtime exactness guard on clustered (real-cosmology-like) data.

The bucketed kNN backends assume near-uniform occupancy; strong clustering
(the physics of cosmological collapse) silently violates it. These tests pin
the round-2 guard contract: the certificate must FAIL loudly on a clustered
distribution where the round-1 code silently degraded, and the rollout-scan
guard must either flag the failing steps or fall back to the exact search.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.featurize import (
    neighbor_search_certified,
    verify_neighbor_exactness,
)
from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    init_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic
from cosmology_gnn_simulation_tpu.rollout import rollout
from cosmology_gnn_simulation_tpu.training.trainer import default_model_config
from cosmology_gnn_simulation_tpu.types import NormalizationStats

N, K = 16384, 16  # N >= the bucketed-backend threshold


def clustered_positions(rng, n=N):
    """95% of mass inside a ball of radius ~one cell — guaranteed cell-table
    overflow for any near-uniform grid sizing."""
    n_cluster = int(0.95 * n)
    cluster = 0.5 + rng.normal(0, 0.01, (n_cluster, 3))
    background = rng.uniform(0, 1, (n - n_cluster, 3))
    return np.remainder(
        np.concatenate([cluster, background]), 1.0
    ).astype(np.float32)


def uniform_positions(rng, n=N):
    return rng.uniform(0, 1, (n, 3)).astype(np.float32)


def test_certificate_fails_on_clustered_passes_on_uniform(rng):
    _, exact = neighbor_search_certified(
        jnp.asarray(clustered_positions(rng)), K, 1.0, method="celllist"
    )
    assert not bool(exact)
    _, exact = neighbor_search_certified(
        jnp.asarray(uniform_positions(rng)), K, 1.0, method="celllist"
    )
    assert bool(exact)
    # Offline verifier agrees (strict raises).
    with pytest.raises(ValueError, match="certificate FAILED"):
        verify_neighbor_exactness(
            clustered_positions(rng), K, 1.0, method="celllist", strict=True
        )


def test_certified_matches_plain_search_when_exact(rng):
    pos = jnp.asarray(uniform_positions(rng))
    idx, exact = neighbor_search_certified(pos, K, 1.0, method="celllist")
    assert bool(exact)
    brute = knn_periodic(pos, K, 1.0, query_tile=4096)
    np.testing.assert_array_equal(
        np.sort(np.asarray(idx), axis=1), np.sort(np.asarray(brute), axis=1)
    )


@pytest.fixture(scope="module")
def tiny_model():
    model_config = default_model_config(
        window_size=5, latent_size=8, mlp_hidden_size=8,
        mlp_num_hidden_layers=1, num_message_passing_steps=1,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )
    return model_config, params, stats


def _window(rng, base):
    drift = rng.normal(0, 2e-4, (5, base.shape[0], 3)).cumsum(axis=0)
    pos = np.remainder(base[None] + drift, 1.0).astype(np.float32)
    temp = np.abs(rng.normal(1.0, 0.3, (5, base.shape[0], 1))).astype(
        np.float32
    )
    return jnp.asarray(pos), jnp.asarray(temp)


def test_rollout_guard_flags_clustered_steps(rng, tiny_model):
    model_config, params, stats = tiny_model
    pos, temp = _window(rng, clustered_positions(rng))
    out = rollout(
        params, model_config, pos, temp, stats, 2,
        num_neighbors=K, neighbor_method="celllist",
        exactness_guard="flag",
    )
    exact = np.asarray(out["neighbor_exactness"])
    assert exact.shape == (2,)
    assert not exact.any(), "clustered steps must be flagged inexact"

    # Uniform data: every step certified, and guard="off" omits the field.
    posu, tempu = _window(rng, uniform_positions(rng))
    out = rollout(
        params, model_config, posu, tempu, stats, 2,
        num_neighbors=K, neighbor_method="celllist",
    )
    assert np.asarray(out["neighbor_exactness"]).all()
    out = rollout(
        params, model_config, posu, tempu, stats, 2,
        num_neighbors=K, neighbor_method="celllist", exactness_guard="off",
    )
    assert "neighbor_exactness" not in out


def test_rollout_fallback_is_exact_on_clustered(rng, tiny_model):
    """On the distribution where the bucketed backend silently degrades, the
    fallback guard must reproduce the exact (bruteforce) rollout."""
    model_config, params, stats = tiny_model
    pos, temp = _window(rng, clustered_positions(rng))
    guarded = rollout(
        params, model_config, pos, temp, stats, 2,
        num_neighbors=K, neighbor_method="celllist",
        exactness_guard="fallback",
    )
    assert not np.asarray(guarded["neighbor_exactness"]).any()
    exact = rollout(
        params, model_config, pos, temp, stats, 2,
        num_neighbors=K, neighbor_method="bruteforce",
        exactness_guard="off",
    )
    np.testing.assert_allclose(
        np.asarray(guarded["Coordinates"]),
        np.asarray(exact["Coordinates"]),
        rtol=1e-6, atol=1e-6,
    )
    # And WITHOUT the fallback the degraded backend diverges — i.e. the
    # guard is protecting against a real failure, not a hypothetical one.
    degraded = rollout(
        params, model_config, pos, temp, stats, 2,
        num_neighbors=K, neighbor_method="celllist", exactness_guard="off",
    )
    assert not np.allclose(
        np.asarray(degraded["Coordinates"]),
        np.asarray(exact["Coordinates"]),
        rtol=1e-6, atol=1e-6,
    )
