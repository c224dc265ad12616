"""Clustered-distribution robustness of the halo and cell-block paths
(round-2 verdict item 7).

Cosmological data is clustered; the uniform-occupancy capacity plans must
either ADAPT (measured-occupancy sizing via ``choose_halo_config(
positions=...)``) or fail LOUDLY with actionable remedies — and the
bucketed aggregation paths must flag inexactness through the same
certificates the kNN guard uses, never silently degrade.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.data.synthetic import (
    generate_synthetic_simulation,
)
from cosmology_gnn_simulation_tpu.metadata import compute_metadata
from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    init_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.parallel.halo import (
    choose_halo_config,
    partition_windows,
    run_halo_rollout,
)
from cosmology_gnn_simulation_tpu.parallel.mesh import make_mesh
from cosmology_gnn_simulation_tpu.rollout import rollout
from cosmology_gnn_simulation_tpu.training.trainer import default_model_config
from cosmology_gnn_simulation_tpu.types import NormalizationStats

N, K = 4096, 4


def _clustered_positions(rng, n=N, concentration=0.6, sigma=0.04):
    """Multi-cluster cosmology-like distribution: ``concentration`` of the
    mass in 4 Gaussian blobs, the rest uniform background."""
    n_c = int(concentration * n)
    centers = rng.uniform(0, 1, (4, 3))
    which = rng.integers(0, 4, n_c)
    blob = centers[which] + rng.normal(0, sigma, (n_c, 3))
    background = rng.uniform(0, 1, (n - n_c, 3))
    return np.remainder(
        np.concatenate([blob, background]), 1.0
    ).astype(np.float32)


def _window(rng, base, steps=6):
    drift = rng.normal(0, 2e-4, (steps, N, 3)).cumsum(axis=0)
    pos = np.remainder(base[None] + drift, 1.0).astype(np.float32)
    temp = np.abs(rng.normal(1.0, 0.2, (steps, N, 1))).astype(np.float32)
    return pos, temp


@pytest.fixture(scope="module")
def model():
    sim = generate_synthetic_simulation(num_snapshots=6, num_particles=256,
                                        seed=0)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    mc = default_model_config(
        window_size=5, latent_size=16, mlp_hidden_size=16,
        mlp_num_hidden_layers=1, num_message_passing_steps=2,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), mc)
    return stats, mc, params


def test_uniform_plan_fails_loudly_adaptive_plan_fits():
    rng = np.random.default_rng(0)
    # Hard clustering: most mass in one x-slab.
    base = _clustered_positions(rng, concentration=0.9, sigma=0.02)
    pos, temp = _window(rng, base)

    hc_uniform = choose_halo_config(N, K, 2)
    with pytest.raises(ValueError, match="choose_halo_config\\(positions"):
        partition_windows(pos[:5], temp[:5], hc_uniform, 1.0)

    hc_adapt = choose_halo_config(N, K, 2, positions=base)
    assert hc_adapt.local_capacity > hc_uniform.local_capacity
    part = partition_windows(pos[:5], temp[:5], hc_adapt, 1.0)
    assert int(part["valid"].sum()) == N  # nothing dropped


def test_adaptive_capacities_cover_measured_occupancy():
    rng = np.random.default_rng(1)
    base = _clustered_positions(rng)
    hc = choose_halo_config(N, K, 4, positions=base)
    owner = np.clip((base[:, 0] * 4).astype(int), 0, 3)
    assert np.bincount(owner, minlength=4).max() <= hc.local_capacity
    g = hc.grid_size
    coords = np.clip((base * g).astype(int), 0, g - 1)
    cells = (coords[:, 0] * g + coords[:, 1]) * g + coords[:, 2]
    assert np.bincount(cells, minlength=g**3).max() <= hc.cell_capacity


def test_clustered_halo_rollout_preserves_particles_and_reports(model):
    """The adapted halo rollout on clustered data must conserve every
    particle and carry the exactness certificate; when the certificate
    holds, the trajectory must equal the single-device brute-force one."""
    stats, mc, params = model
    rng = np.random.default_rng(2)
    base = _clustered_positions(rng)
    pos, temp = _window(rng, base)
    stats = stats._replace(box_size=1.0) if hasattr(stats, "_replace") else stats

    hc = choose_halo_config(N, K, 2, positions=base)
    mesh = make_mesh((4, 2))
    traj, diag = run_halo_rollout(
        params, mc, pos[:5], temp[:5], stats, 2, mesh, hc, num_neighbors=K,
    )
    assert diag["overflow"] == 0 and diag["stranded"] == 0
    exact = traj["neighbor_exactness"]
    assert exact.shape == (2,)
    if bool(np.asarray(exact).all()):
        expected = rollout(
            params, mc, jnp.asarray(pos[:5]), jnp.asarray(temp[:5]), stats,
            2, num_neighbors=K, neighbor_method="bruteforce",
        )
        np.testing.assert_allclose(
            traj["Coordinates"], np.asarray(expected["Coordinates"]),
            rtol=2e-5, atol=2e-5,
        )


def test_cellblock_flags_clustered_inexactness(model):
    """The cell-block rollout's certificate must flag clustered frames
    (column overflow / dropped edges), matching the kNN guard's loudness."""
    stats, mc, params = model
    rng = np.random.default_rng(3)
    # Extreme: 95% of mass inside ~one cell.
    n_c = int(0.95 * N)
    base = np.remainder(
        np.concatenate([
            0.5 + rng.normal(0, 0.01, (n_c, 3)),
            rng.uniform(0, 1, (N - n_c, 3)),
        ]), 1.0,
    ).astype(np.float32)
    pos, temp = _window(rng, base)
    out = rollout(
        params, mc, jnp.asarray(pos[:5]), jnp.asarray(temp[:5]), stats, 2,
        num_neighbors=K, aggregation="cellblock",
    )
    exact = np.asarray(out["neighbor_exactness"])
    assert not exact.all(), "clustered cellblock steps must be flagged"
    # Never silent: every particle still gets a finite output.
    assert np.isfinite(np.asarray(out["Coordinates"])).all()
