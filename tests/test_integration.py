"""End-to-end integration tests across subsystems: the rollout->HDF5
round-trip (a converted rollout is a fully valid training dataset,
rollout_conversion.py capability), and failure detection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosmology_gnn_simulation_tpu.data.dataset import SequenceDataset
from cosmology_gnn_simulation_tpu.data.hdf5 import (
    read_simulation,
    write_simulation,
)
from cosmology_gnn_simulation_tpu.data.synthetic import (
    generate_synthetic_simulation,
)
from cosmology_gnn_simulation_tpu.evaluation import convert_rollout_to_hdf5
from cosmology_gnn_simulation_tpu.metadata import compute_metadata
from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    init_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.rollout import rollout
from cosmology_gnn_simulation_tpu.training.trainer import (
    TrainConfig,
    Trainer,
    default_model_config,
)
from cosmology_gnn_simulation_tpu.types import NormalizationStats


def test_rollout_conversion_roundtrip_trains(tmp_path):
    """rollout -> .npy -> convert_rollout_to_hdf5 -> metadata ->
    SequenceDataset -> one training epoch. Proves the rollout output is a
    valid dataset in the full reference schema."""
    sim = generate_synthetic_simulation(num_snapshots=12, num_particles=40, seed=2)
    meta = compute_metadata(sim)
    stats = NormalizationStats.from_metadata(meta)
    config = default_model_config(
        window_size=5, latent_size=8, mlp_hidden_size=8,
        mlp_num_hidden_layers=1, num_message_passing_steps=1,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), config)

    out = rollout(
        params, config,
        jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]),
        stats, 7, num_neighbors=4, neighbor_query_tile=16,
    )
    rollout_dir = tmp_path / "rollout"
    rollout_dir.mkdir()
    np.save(rollout_dir / "rollout_coordinates.npy", np.asarray(out["Coordinates"]))
    np.save(rollout_dir / "rollout_temperatures.npy", np.asarray(out["InternalEnergy"]))

    converted_path = str(tmp_path / "rollout_as_dataset.hdf5")
    converted = convert_rollout_to_hdf5(
        str(rollout_dir), sim, meta["box_size"], meta["dt"], converted_path,
        window_size=5,
    )
    # Full schema present, velocity/acc reconstruction consistent.
    assert converted["Velocities"].shape == (12, 40, 3)
    assert converted["HydroAcceleration"].shape == (12, 40, 3)
    loaded = read_simulation(converted_path)
    np.testing.assert_allclose(
        loaded["Coordinates"], np.asarray(out["Coordinates"]), atol=1e-6
    )
    # Velocities at t>=1 match min-image finite differences of coordinates.
    c = np.asarray(out["Coordinates"])
    d = c[5] - c[4]
    d -= meta["box_size"] * np.round(d / meta["box_size"])
    np.testing.assert_allclose(
        loaded["Velocities"][5], d / meta["dt"], atol=1e-4
    )

    # The converted file trains.
    meta2 = compute_metadata(loaded)
    train_dir = tmp_path / "train"
    train_dir.mkdir()
    write_simulation(str(train_dir / "sim.hdf5"), loaded)
    ds = SequenceDataset(str(train_dir), 5, meta2)
    tc = TrainConfig(
        num_neighbors=4, batch_size=2, num_epochs=1,
        output_dir=str(tmp_path / "out"), neighbor_query_tile=16,
    )
    stats2 = NormalizationStats.from_metadata(meta2)
    trainer = Trainer(config, stats2, tc, steps_per_epoch=2)
    trainer.fit(ds, ds, verbose=False)
    assert np.isfinite(trainer.history["train_loss"][0])


def test_halt_on_nonfinite_loss(tmp_path):
    sim = generate_synthetic_simulation(num_snapshots=8, num_particles=24, seed=3)
    meta = compute_metadata(sim)
    sim_bad = dict(sim)
    bad = np.array(sim["InternalEnergy"], copy=True)
    bad[6] = np.nan  # poison a target frame
    sim_bad["InternalEnergy"] = bad
    train_dir = tmp_path / "train"
    train_dir.mkdir()
    write_simulation(str(train_dir / "sim.hdf5"), sim_bad)
    ds = SequenceDataset(str(train_dir), 5, meta)
    config = default_model_config(
        window_size=5, latent_size=8, mlp_hidden_size=8,
        mlp_num_hidden_layers=1, num_message_passing_steps=1,
    )
    stats = NormalizationStats.from_metadata(meta)
    tc = TrainConfig(
        num_neighbors=4, batch_size=1, num_epochs=1,
        output_dir=str(tmp_path / "out"), neighbor_query_tile=16,
    )
    trainer = Trainer(config, stats, tc, steps_per_epoch=1)
    with pytest.raises(FloatingPointError, match="Non-finite"):
        trainer.fit(ds, ds, verbose=False)
