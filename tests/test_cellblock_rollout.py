"""Cell-block rollout vs. the default gather rollout (same model/weights)."""

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
from cosmology_gnn_simulation_tpu.ops.cellblock import CellBlockSpec
from cosmology_gnn_simulation_tpu.rollout import rollout
from cosmology_gnn_simulation_tpu.training.trainer import default_model_config
from cosmology_gnn_simulation_tpu.types import NormalizationStats

SPEC = CellBlockSpec(
    grid_size=4, col_capacity=32, query_block=32, window=96, wrap_cap=32,
    h_block=128,
)


def _setup(n=256, latent=16):
    sim = generate_synthetic_simulation(num_snapshots=7, num_particles=n,
                                        seed=5)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    model_config = default_model_config(
        window_size=5, latent_size=latent, mlp_hidden_size=latent,
        mlp_num_hidden_layers=1, num_message_passing_steps=2,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    pos = jnp.asarray(sim["Coordinates"][:5])
    temp = jnp.asarray(sim["InternalEnergy"][:5])
    return params, model_config, pos, temp, stats


def test_cellblock_rollout_matches_gather():
    params, mc, pos, temp, stats = _setup()
    base = rollout(params, mc, pos, temp, stats, 3, num_neighbors=8)
    cb = rollout(
        params, mc, pos, temp, stats, 3, num_neighbors=8,
        aggregation="cellblock", cellblock_spec=SPEC,
    )
    assert bool(cb["neighbor_exactness"].all())
    # f32 carry (dtype=None): identical up to summation order, amplified
    # over 3 chaotic steps.
    np.testing.assert_allclose(
        np.asarray(cb["Coordinates"]), np.asarray(base["Coordinates"]),
        rtol=0, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cb["InternalEnergy"]), np.asarray(base["InternalEnergy"]),
        rtol=0, atol=5e-4,
    )
    # The first predicted frame should agree far more tightly (one model
    # application's worth of reordering noise only).
    np.testing.assert_allclose(
        np.asarray(cb["Coordinates"][5]), np.asarray(base["Coordinates"][5]),
        rtol=0, atol=1e-5,
    )


def test_cellblock_rollout_reuse_path():
    params, mc, pos, temp, stats = _setup()
    base = rollout(params, mc, pos, temp, stats, 4, num_neighbors=8,
                   reneighbor_every=2)
    cb = rollout(
        params, mc, pos, temp, stats, 4, num_neighbors=8,
        reneighbor_every=2, aggregation="cellblock", cellblock_spec=SPEC,
    )
    assert bool(cb["neighbor_exactness"].all())
    np.testing.assert_allclose(
        np.asarray(cb["Coordinates"]), np.asarray(base["Coordinates"]),
        rtol=0, atol=5e-4,
    )


def test_cellblock_rollout_auto_spec():
    params, mc, pos, temp, stats = _setup()
    out = rollout(params, mc, pos, temp, stats, 2, num_neighbors=8,
                  aggregation="cellblock")
    assert out["Coordinates"].shape == (7, 256, 3)
    assert np.isfinite(np.asarray(out["Coordinates"])).all()


def test_cellblock_rejects_fallback_guard():
    params, mc, pos, temp, stats = _setup()
    with pytest.raises(ValueError, match="fallback"):
        rollout(params, mc, pos, temp, stats, 2, num_neighbors=8,
                aggregation="cellblock", exactness_guard="fallback")

def test_cellblock_hybrid_rollout_matches_gather():
    """Hybrid mode: same S@window kernel, carry on particle rows."""
    params, mc, pos, temp, stats = _setup()
    base = rollout(params, mc, pos, temp, stats, 3, num_neighbors=8)
    cb = rollout(
        params, mc, pos, temp, stats, 3, num_neighbors=8,
        aggregation="cellblock_hybrid", cellblock_spec=SPEC,
    )
    assert bool(cb["neighbor_exactness"].all())
    np.testing.assert_allclose(
        np.asarray(cb["Coordinates"]), np.asarray(base["Coordinates"]),
        rtol=0, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cb["InternalEnergy"]), np.asarray(base["InternalEnergy"]),
        rtol=0, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cb["Coordinates"][5]), np.asarray(base["Coordinates"][5]),
        rtol=0, atol=1e-5,
    )


def test_cellblock_hybrid_matches_slots_mode():
    """Slot-space and hybrid forwards compute the same sums (modulo
    f32 summation order inside LN/MLP row layouts — tight tolerance)."""
    params, mc, pos, temp, stats = _setup()
    slots = rollout(
        params, mc, pos, temp, stats, 3, num_neighbors=8,
        aggregation="cellblock", cellblock_spec=SPEC,
    )
    hybrid = rollout(
        params, mc, pos, temp, stats, 3, num_neighbors=8,
        aggregation="cellblock_hybrid", cellblock_spec=SPEC,
    )
    np.testing.assert_allclose(
        np.asarray(hybrid["Coordinates"]), np.asarray(slots["Coordinates"]),
        rtol=0, atol=1e-5,
    )


def test_cellblock_hybrid_variable_rollout_matches_gather():
    """Variable per-column capacities (round 4) through the full hybrid
    rollout: identical trajectories to gather, certificate on every step."""
    params, mc, pos, temp, stats = _setup()
    base = rollout(params, mc, pos, temp, stats, 3, num_neighbors=8)
    cb = rollout(
        params, mc, pos, temp, stats, 3, num_neighbors=8,
        aggregation="cellblock_hybrid", cellblock_variable=True,
    )
    assert bool(cb["neighbor_exactness"].all())
    np.testing.assert_allclose(
        np.asarray(cb["Coordinates"]), np.asarray(base["Coordinates"]),
        rtol=0, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cb["Coordinates"][5]), np.asarray(base["Coordinates"][5]),
        rtol=0, atol=1e-5,
    )


def test_one_step_prediction_cellblock_matches_gather():
    """one_step_prediction --aggregation parity (CLI flag symmetry): the
    cell-block one-step path returns the gather path's prediction in the
    original particle order."""
    from cosmology_gnn_simulation_tpu.rollout import one_step_prediction

    params, mc, pos, temp, stats = _setup()
    base_p, base_t = one_step_prediction(
        params, mc, pos, temp, stats, num_neighbors=8
    )
    for mode in ("cellblock", "cellblock_hybrid"):
        cb_p, cb_t = one_step_prediction(
            params, mc, pos, temp, stats, num_neighbors=8,
            aggregation=mode, cellblock_spec=SPEC,
        )
        np.testing.assert_allclose(
            np.asarray(cb_p), np.asarray(base_p), rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(cb_t), np.asarray(base_t), rtol=0, atol=1e-5
        )
