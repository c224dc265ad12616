"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4d).

The strongest property we can test: sharded execution must produce the SAME
numbers as the single-device path (shard-invariance), for both inference and
a full training step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.data.synthetic import (
    generate_synthetic_simulation,
)
from cosmology_gnn_simulation_tpu.featurize import featurize
from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    apply_encode_process_decode,
    init_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.parallel.mesh import make_mesh
from cosmology_gnn_simulation_tpu.parallel.sharded import (
    make_data_parallel_train_step,
    make_particle_sharded_forward,
    shard_batch,
)
from cosmology_gnn_simulation_tpu.training.trainer import (
    TrainConfig,
    default_model_config,
    make_optimizer,
    make_train_step,
)
from cosmology_gnn_simulation_tpu.types import NormalizationStats
from cosmology_gnn_simulation_tpu.metadata import compute_metadata


@pytest.fixture(scope="module")
def setup():
    sim = generate_synthetic_simulation(num_snapshots=8, num_particles=64, seed=7)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    model_config = default_model_config(
        window_size=5,
        latent_size=16,
        mlp_hidden_size=16,
        mlp_num_hidden_layers=1,
        num_message_passing_steps=2,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    return sim, stats, model_config, params


def test_mesh_creation():
    mesh = make_mesh((4, 2))
    assert mesh.shape == {"data": 4, "particle": 2}
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())


def test_particle_sharded_forward_matches_single_device(setup):
    sim, stats, model_config, params = setup
    pos = jnp.asarray(sim["Coordinates"][:5])  # [5, 64, 3]
    temp = jnp.asarray(sim["InternalEnergy"][:5])

    # Single device reference.
    graph = featurize(
        pos, temp, stats, jax.random.PRNGKey(0), noise_std=0.0,
        num_neighbors=8, neighbor_query_tile=32,
    )
    expected = apply_encode_process_decode(params, graph, model_config)

    mesh = make_mesh((1, 8))
    forward = make_particle_sharded_forward(
        model_config, stats, mesh, num_neighbors=8, neighbor_query_tile=32
    )
    out = forward(params, pos, temp)
    np.testing.assert_allclose(
        np.asarray(out["acceleration"]),
        np.asarray(expected["acceleration"]),
        rtol=2e-5,
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["temp_rate"]),
        np.asarray(expected["temp_rate"]),
        rtol=2e-5,
        atol=2e-5,
    )


@pytest.mark.parametrize("mesh_shape", [(8, 1), (2, 4), (1, 8)])
def test_sharded_train_step_matches_single_device(setup, mesh_shape):
    sim, stats, model_config, params = setup
    tc = TrainConfig(
        num_neighbors=8,
        batch_size=8,
        noise_std=0.0,  # noise keys differ per shard by design; disable
        augment_prob=0.0,
        momentum_loss_weight=0.5,
        neighbor_query_tile=32,
    )
    optimizer = make_optimizer(tc, steps_per_epoch=1)
    opt_state = optimizer.init(params)

    # Batch of 8 windows from the synthetic sim.
    batch = {
        "positions": np.stack(
            [sim["Coordinates"][i: i + 5] for i in range(3)] * 3, axis=0
        )[:8],
        "temperatures": np.stack(
            [sim["InternalEnergy"][i: i + 5] for i in range(3)] * 3, axis=0
        )[:8],
        "target_positions": np.stack(
            [sim["Coordinates"][i + 5] for i in range(3)] * 3, axis=0
        )[:8],
        "target_temperatures": np.stack(
            [sim["InternalEnergy"][i + 5] for i in range(3)] * 3, axis=0
        )[:8],
    }
    keys = jax.random.split(jax.random.PRNGKey(5), 8)

    # Reference: the same sharded step on a trivial 1-device mesh.
    trivial_mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    ref_step = make_data_parallel_train_step(
        model_config, stats, tc, optimizer, trivial_mesh
    )
    ref_params, _, ref_metrics = ref_step(
        params, opt_state, shard_batch(batch, trivial_mesh), keys
    )

    mesh = make_mesh(mesh_shape)
    step = make_data_parallel_train_step(
        model_config, stats, tc, optimizer, mesh
    )
    new_params, _, metrics = step(
        params, opt_state, shard_batch(batch, mesh), keys
    )

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        )


def test_momentum_loss_exact_under_particle_sharding(setup):
    """The momentum PINN term is a nonlinear function of a global sum —
    the psum-inside-norm formulation must match the unsharded value."""
    sim, stats, model_config, params = setup
    tc = TrainConfig(
        num_neighbors=8,
        batch_size=1,
        noise_std=0.0,
        augment_prob=0.0,
        momentum_loss_weight=1.0,
        acc_loss_weight=0.0,
        temp_rate_loss_weight=0.0,
        neighbor_query_tile=32,
    )
    optimizer = make_optimizer(tc, steps_per_epoch=1)
    opt_state = optimizer.init(params)
    batch = {
        "positions": sim["Coordinates"][None, :5],
        "temperatures": sim["InternalEnergy"][None, :5],
        "target_positions": sim["Coordinates"][None, 5],
        "target_temperatures": sim["InternalEnergy"][None, 5],
    }
    keys = jax.random.split(jax.random.PRNGKey(1), 1)

    values = {}
    for shape in [(1, 1), (1, 8)]:
        devs = jax.devices() if shape != (1, 1) else jax.devices()[:1]
        mesh = make_mesh(shape, devices=devs)
        step = make_data_parallel_train_step(
            model_config, stats, tc, optimizer, mesh
        )
        _, _, metrics = step(params, opt_state, shard_batch(batch, mesh), keys)
        values[shape] = float(metrics["momentum"])
    assert values[(1, 8)] == pytest.approx(values[(1, 1)], rel=1e-5)
    assert values[(1, 1)] > 0


def test_sharded_rollout_matches_single_device(setup):
    from cosmology_gnn_simulation_tpu.parallel.sharded import (
        make_sharded_rollout,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout

    sim, stats, model_config, params = setup
    pos = jnp.asarray(sim["Coordinates"][:5])
    temp = jnp.asarray(sim["InternalEnergy"][:5])
    steps = 3

    expected = rollout(
        params, model_config, pos, temp, stats, steps,
        num_neighbors=8, neighbor_query_tile=32,
    )

    mesh = make_mesh((1, 8))
    sharded = make_sharded_rollout(
        model_config, stats, mesh, steps,
        num_neighbors=8, neighbor_query_tile=32,
    )
    out = sharded(params, pos, temp)
    np.testing.assert_allclose(
        np.asarray(out["Coordinates"]),
        np.asarray(expected["Coordinates"]),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["InternalEnergy"]),
        np.asarray(expected["InternalEnergy"]),
        rtol=2e-5, atol=2e-5,
    )


def test_sharded_eval_matches_single_device(setup):
    from cosmology_gnn_simulation_tpu.parallel.sharded import (
        make_sharded_eval_step,
    )
    from cosmology_gnn_simulation_tpu.training.trainer import make_eval_step

    sim, stats, model_config, params = setup
    tc = TrainConfig(
        num_neighbors=8, batch_size=2, momentum_loss_weight=0.5,
        neighbor_query_tile=32,
    )
    batch = {
        "positions": np.stack([sim["Coordinates"][i: i + 5] for i in range(2)]),
        "temperatures": np.stack(
            [sim["InternalEnergy"][i: i + 5] for i in range(2)]
        ),
        "target_positions": np.stack(
            [sim["Coordinates"][i + 5] for i in range(2)]
        ),
        "target_temperatures": np.stack(
            [sim["InternalEnergy"][i + 5] for i in range(2)]
        ),
    }
    single = make_eval_step(model_config, stats, tc)
    expected = single(params, batch)

    mesh = make_mesh((2, 4))
    sharded = make_sharded_eval_step(model_config, stats, tc, mesh)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    got = sharded(params, shard_batch(batch, mesh), keys)
    for key in ("loss", "acceleration", "temp_rate", "momentum"):
        np.testing.assert_allclose(
            float(got[key]), float(expected[key]), rtol=2e-5
        )


def test_sharded_rollout_reneighbor_every(setup):
    from cosmology_gnn_simulation_tpu.parallel.sharded import (
        make_sharded_rollout,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout

    sim, stats, model_config, params = setup
    pos = jnp.asarray(sim["Coordinates"][:5])
    temp = jnp.asarray(sim["InternalEnergy"][:5])
    mesh = make_mesh((1, 8))
    sharded = make_sharded_rollout(
        model_config, stats, mesh, 3,
        num_neighbors=8, neighbor_query_tile=32, reneighbor_every=2,
    )
    out = sharded(params, pos, temp)
    # Single-device reuse path is the parity target.
    expected = rollout(
        params, model_config, pos, temp, stats, 3,
        num_neighbors=8, neighbor_query_tile=32, reneighbor_every=2,
    )
    np.testing.assert_allclose(
        np.asarray(out["Coordinates"]),
        np.asarray(expected["Coordinates"]),
        rtol=2e-5, atol=2e-5,
    )
