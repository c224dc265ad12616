"""Pin the aggregation="auto" dispatch table (round-5 VERDICT item 5):
the measured-best backend per scale (docs/PERFORMANCE.md, train_r4.json)
must be what the default flags resolve to."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.ops.cellblock import choose_aggregation


@pytest.mark.parametrize(
    "n,training,expected",
    [
        # gather below the hybrid crossover (plan build beats the savings)
        (4_096, True, "gather"),
        (4_096, False, "gather"),
        (16_384, True, "gather"),
        # hybrid from 32k (train 117 vs 236 ms at 65k; rollout 29.3 vs 38.3)
        (32_768, True, "cellblock_hybrid"),
        (32_768, False, "cellblock_hybrid"),
        (65_536, True, "cellblock_hybrid"),
        (65_536, False, "cellblock_hybrid"),
        # slots at config-4 occupancies (rollout 744 vs 814 ms hybrid)
        (250_000, True, "cellblock"),
        (500_000, False, "cellblock"),
        (2_000_000, True, "cellblock"),
    ],
)
def test_dispatch_table_tpu(n, training, expected):
    assert (
        choose_aggregation(n, training=training, pruned=True, backend="tpu")
        == expected
    )


def test_non_tpu_and_unpruned_resolve_to_gather():
    for n in (4_096, 65_536, 2_000_000):
        assert (
            choose_aggregation(n, training=True, pruned=True, backend="cpu")
            == "gather"
        )
        assert (
            choose_aggregation(n, training=False, pruned=False, backend="tpu")
            == "gather"
        )


def test_auto_train_step_runs_on_cpu():
    """TrainConfig's default aggregation="auto" must resolve lazily from the
    first batch and train (on CPU it resolves to gather)."""
    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )
    from cosmology_gnn_simulation_tpu.metadata import compute_metadata
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig,
        default_model_config,
        make_optimizer,
        make_train_step,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    n = 128
    sim = generate_synthetic_simulation(num_snapshots=6, num_particles=n,
                                        seed=0)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    model_config = default_model_config(
        window_size=5, latent_size=8, mlp_hidden_size=8,
        mlp_num_hidden_layers=1, num_message_passing_steps=1,
    )
    tc = TrainConfig(num_neighbors=3, batch_size=1, noise_std=0.0)
    assert tc.aggregation == "auto"
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    optimizer = make_optimizer(tc, steps_per_epoch=1)
    opt_state = optimizer.init(params)
    step = make_train_step(model_config, stats, tc, optimizer)
    batch = {
        "positions": jnp.asarray(sim["Coordinates"][:5])[None],
        "temperatures": jnp.asarray(sim["InternalEnergy"][:5])[None],
        "target_positions": jnp.asarray(sim["Coordinates"][5])[None],
        "target_temperatures": jnp.asarray(sim["InternalEnergy"][5])[None],
    }
    params, opt_state, metrics = step(
        params, opt_state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))


def test_auto_rollout_runs_on_cpu():
    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )
    from cosmology_gnn_simulation_tpu.metadata import compute_metadata
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    n = 128
    sim = generate_synthetic_simulation(num_snapshots=6, num_particles=n,
                                        seed=1)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    model_config = default_model_config(
        window_size=5, latent_size=8, mlp_hidden_size=8,
        mlp_num_hidden_layers=1, num_message_passing_steps=1,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    out = rollout(
        params, model_config,
        jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]),
        stats, 2, num_neighbors=3, aggregation="auto",
    )
    assert out["Coordinates"].shape == (7, n, 3)
    assert np.isfinite(np.asarray(out["Coordinates"])).all()
