"""Golden-parity tests for graph featurization against an independent numpy
oracle implementing the reference ``preprocess`` semantics
(data_utils.py:72-228), including the behavioral quirks: raw (non-min-image)
edge displacements, self-loop k-NN, noise-shifted targets."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from cosmology_gnn_simulation_tpu.data.synthetic import (
    generate_synthetic_simulation,
)
from cosmology_gnn_simulation_tpu.featurize import featurize, node_feature_size
from cosmology_gnn_simulation_tpu.metadata import compute_metadata
from cosmology_gnn_simulation_tpu.types import NormalizationStats


def numpy_preprocess_oracle(pos_tn3, temp_tn1, meta, target_pos, target_temp, k):
    """Reference-semantics featurizer in plain numpy (noise_std=0 path)."""
    box = meta["box_size"]
    dt = meta["dt"]
    pos = np.transpose(pos_tn3, (1, 0, 2)).astype(np.float64)  # [N, T, 3]
    temp = np.transpose(temp_tn1, (1, 0, 2)).astype(np.float64)
    pos = np.remainder(pos, box)

    disp = pos[:, 1:] - pos[:, :-1]
    disp[disp < -box / 2] += box
    disp[disp > box / 2] -= box
    vel = disp / dt

    recent = pos[:, -1]
    n = pos.shape[0]

    nvel = (vel - meta["vel_mean"]) / meta["vel_std"]
    ntemp = (temp - np.asarray(meta["temp_mean"])) / np.asarray(meta["temp_std"])
    nodes = np.concatenate([nvel.reshape(n, -1), ntemp.reshape(n, -1)], axis=-1)

    # Ghost-copy kNN (27 images).
    shifts = np.array(
        np.meshgrid(*([[-box, 0, box]] * 3), indexing="ij")
    ).reshape(3, -1).T
    extended = (recent[None] + shifts[:, None]).reshape(-1, 3)
    mapping = np.tile(np.arange(n), 27)
    neighbors = np.empty((n, k), dtype=np.int64)
    for i in range(n):
        d2 = ((extended - recent[i]) ** 2).sum(-1)
        neighbors[i] = mapping[np.argsort(d2, kind="stable")[:k]]

    # Raw displacement (data_utils.py:162) — deliberately not min-image.
    edge_disp = recent[neighbors] - recent[:, None]
    edge_dist = np.linalg.norm(edge_disp, axis=-1, keepdims=True)
    edges = np.concatenate([edge_disp, edge_dist], axis=-1)

    next_disp = target_pos - recent
    next_disp[next_disp < -box / 2] += box
    next_disp[next_disp > box / 2] -= box
    next_vel = next_disp / dt
    acc = (next_vel - vel[:, -1]) / dt
    acc = (acc - meta["acc_mean"]) / meta["acc_std"]

    rate = (target_temp - temp[:, -1]) / dt
    rate = (rate - np.asarray(meta["temp_rate_mean"])) / np.asarray(
        meta["temp_rate_std"]
    )
    return nodes, neighbors, edges, acc, rate


def test_featurize_matches_reference_oracle():
    sim = generate_synthetic_simulation(num_snapshots=8, num_particles=96, seed=3)
    meta = compute_metadata(sim)
    stats = NormalizationStats.from_metadata(meta)
    k = 6
    pos = sim["Coordinates"][:5]
    temp = sim["InternalEnergy"][:5]
    tpos = sim["Coordinates"][5]
    ttemp = sim["InternalEnergy"][5]

    graph = featurize(
        jnp.asarray(pos),
        jnp.asarray(temp),
        stats,
        jax.random.PRNGKey(0),
        noise_std=0.0,
        num_neighbors=k,
        target_position=jnp.asarray(tpos),
        target_temperature=jnp.asarray(ttemp),
        neighbor_query_tile=32,
    )
    nodes, neighbors, edges, acc, rate = numpy_preprocess_oracle(
        pos, temp, meta, tpos.astype(np.float64), ttemp.astype(np.float64), k
    )

    assert graph.nodes.shape == (96, node_feature_size(5))
    np.testing.assert_allclose(np.asarray(graph.nodes), nodes, atol=2e-4)
    # Neighbor sets identical (order may differ among exact ties).
    ours = np.asarray(graph.neighbors)
    for i in range(96):
        assert set(ours[i].tolist()) == set(neighbors[i].tolist())
    # Edge features: compare as sets via sorted rows (same neighbor order not
    # guaranteed) — sort both by neighbor index.
    ours_order = np.argsort(ours, axis=1)
    ref_order = np.argsort(neighbors, axis=1)
    ours_edges = np.take_along_axis(
        np.asarray(graph.edges), ours_order[..., None], axis=1
    )
    ref_edges = np.take_along_axis(edges, ref_order[..., None], axis=1)
    np.testing.assert_allclose(ours_edges, ref_edges, atol=2e-5)

    np.testing.assert_allclose(
        np.asarray(graph.target_acceleration), acc, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(graph.target_temp_rate), rate, atol=2e-3)


def test_featurize_noise_shifts_targets():
    """With noise, targets must be computed against the noised inputs and
    shifted by the final noise term (data_utils.py:180-182,204-206):
    acc_target = ((target+noise[-1] - recent_noised)/dt - v_last_noised)/dt."""
    sim = generate_synthetic_simulation(num_snapshots=8, num_particles=64, seed=4)
    meta = compute_metadata(sim)
    stats = NormalizationStats.from_metadata(meta)
    key = jax.random.PRNGKey(9)

    g_clean = featurize(
        jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]),
        stats, key, noise_std=0.0, num_neighbors=4,
        target_position=jnp.asarray(sim["Coordinates"][5]),
        target_temperature=jnp.asarray(sim["InternalEnergy"][5]),
        neighbor_query_tile=32,
    )
    g_noisy = featurize(
        jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]),
        stats, key, noise_std=1e-3, num_neighbors=4,
        target_position=jnp.asarray(sim["Coordinates"][5]),
        target_temperature=jnp.asarray(sim["InternalEnergy"][5]),
        neighbor_query_tile=32,
    )
    # Noise changes both inputs and targets.
    assert not np.allclose(np.asarray(g_clean.nodes), np.asarray(g_noisy.nodes))
    assert not np.allclose(
        np.asarray(g_clean.target_acceleration),
        np.asarray(g_noisy.target_acceleration),
    )
    # Same key + zero std reproduces exactly.
    g_clean2 = featurize(
        jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]),
        stats, key, noise_std=0.0, num_neighbors=4,
        target_position=jnp.asarray(sim["Coordinates"][5]),
        target_temperature=jnp.asarray(sim["InternalEnergy"][5]),
        neighbor_query_tile=32,
    )
    np.testing.assert_array_equal(
        np.asarray(g_clean.nodes), np.asarray(g_clean2.nodes)
    )


def test_featurize_jits_and_vmaps():
    sim = generate_synthetic_simulation(num_snapshots=8, num_particles=32, seed=5)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))

    @jax.jit
    def f(pos, temp, key):
        g = featurize(pos, temp, stats, key, noise_std=1e-4, num_neighbors=4,
                      neighbor_query_tile=16)
        return g.nodes, g.neighbors

    pos = jnp.asarray(sim["Coordinates"][:5])
    temp = jnp.asarray(sim["InternalEnergy"][:5])
    nodes, neighbors = f(pos, temp, jax.random.PRNGKey(0))
    assert nodes.shape == (32, 17)

    batched = jax.vmap(
        lambda k: featurize(pos, temp, stats, k, noise_std=1e-4,
                            num_neighbors=4, neighbor_query_tile=16).nodes
    )(jax.random.split(jax.random.PRNGKey(1), 3))
    assert batched.shape == (3, 32, 17)


def test_verify_neighbor_exactness_guard():
    from cosmology_gnn_simulation_tpu.featurize import (
        verify_neighbor_exactness,
    )

    rng = np.random.default_rng(0)
    # Uniform box at cell-list scale: certificate holds. (k=16 has good
    # concentration; k=8 at small N sits right at the safety boundary —
    # which is exactly what this guard exists to catch.)
    uniform = rng.uniform(0, 1, (20000, 3)).astype(np.float32)
    result = verify_neighbor_exactness(uniform, 16, 1.0, method="celllist")
    assert result["exact"] and result["overflow"] == 0

    # Pathologically clustered: all particles in one tiny ball -> overflow,
    # strict mode raises with remedies, non-strict warns.
    clustered = (
        0.5 + rng.normal(0, 1e-4, (20000, 3)).astype(np.float32)
    )
    with pytest.raises(ValueError, match="certificate FAILED"):
        verify_neighbor_exactness(clustered, 16, 1.0, method="celllist")
    with pytest.warns(UserWarning, match="certificate FAILED"):
        out = verify_neighbor_exactness(
            clustered, 16, 1.0, method="celllist", strict=False
        )
    assert not out["exact"]

    # Small N short-circuits to brute force (always exact).
    small = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    assert verify_neighbor_exactness(small, 8, 1.0)["exact"]
