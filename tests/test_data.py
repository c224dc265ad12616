"""Dataset / HDF5 / metadata tests (reference semantics:
dataloader.py:9-170, generate_metadata.py:6-48)."""

import json
import os

import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.data.dataset import SequenceDataset
from cosmology_gnn_simulation_tpu.data.hdf5 import (
    read_simulation,
    write_simulation,
)
from cosmology_gnn_simulation_tpu.data.synthetic import (
    generate_synthetic_simulation,
)
from cosmology_gnn_simulation_tpu.metadata import (
    compute_metadata,
    generate_metadata,
)


@pytest.fixture
def sim_dir(tmp_path):
    for i in range(2):
        sim = generate_synthetic_simulation(
            num_snapshots=10, num_particles=32, seed=i
        )
        write_simulation(str(tmp_path / f"sim{i}.hdf5"), sim)
    return tmp_path


def test_hdf5_roundtrip(tmp_path):
    sim = generate_synthetic_simulation(num_snapshots=6, num_particles=16)
    path = str(tmp_path / "sim.hdf5")
    write_simulation(path, sim)
    loaded = read_simulation(path)
    np.testing.assert_allclose(loaded["Coordinates"], sim["Coordinates"])
    assert loaded["InternalEnergy"].shape == (6, 16, 1)
    assert loaded["BoxSize"] == sim["BoxSize"]
    assert loaded["TimeStep"] == sim["TimeStep"]


def test_internal_energy_2d_normalized_to_3d(tmp_path):
    """2-D [T, N] InternalEnergy must be expanded to [T, N, 1]
    (dataloader.py:125-129)."""
    sim = generate_synthetic_simulation(num_snapshots=6, num_particles=16)
    sim["InternalEnergy"] = sim["InternalEnergy"][..., 0]  # make it 2-D
    path = str(tmp_path / "sim2d.hdf5")
    write_simulation(path, sim)
    loaded = read_simulation(path)
    assert loaded["InternalEnergy"].shape == (6, 16, 1)
    meta = compute_metadata(loaded)
    assert np.isscalar(meta["temp_mean"]) or isinstance(meta["temp_mean"], list)


def test_metadata_schema_and_stats(sim_dir):
    out = str(sim_dir / "metadata.json")
    meta = generate_metadata(str(sim_dir / "sim0.hdf5"), out)
    with open(out) as f:
        loaded = json.load(f)
    for key in [
        "temp_mean", "temp_std", "temp_rate_mean", "temp_rate_std",
        "vel_mean", "vel_std", "acc_mean", "acc_std", "box_size", "dt",
    ]:
        assert key in loaded
    assert loaded == meta
    # Scalar collapse of 3-axis stats (generate_metadata.py:22-30).
    assert isinstance(loaded["vel_mean"], float)
    assert isinstance(loaded["acc_std"], float)
    sim = read_simulation(str(sim_dir / "sim0.hdf5"))
    expected_vel_std = float(
        np.mean(np.std(sim["Velocities"].astype(np.float64), axis=(0, 1)))
    )
    assert loaded["vel_std"] == pytest.approx(expected_vel_std, rel=1e-6)


def test_dataset_windowing(sim_dir):
    meta = compute_metadata(read_simulation(str(sim_dir / "sim0.hdf5")))
    ds = SequenceDataset(str(sim_dir), window_size=5, metadata=meta)
    # 2 files x (10 - 5) sequences.
    assert len(ds) == 10
    sample = ds[0]
    assert sample["input"]["Coordinates"].shape == (5, 32, 3)
    assert sample["input"]["InternalEnergy"].shape == (5, 32, 1)
    assert sample["target"]["Coordinates"].shape == (32, 3)
    # Window slides by one frame.
    s0, s1 = ds[0], ds[1]
    np.testing.assert_array_equal(
        s0["input"]["Coordinates"][1:], s1["input"]["Coordinates"][:-1]
    )
    # Target is the frame after the window.
    raw = read_simulation(str(sim_dir / "sim0.hdf5"))
    np.testing.assert_array_equal(
        s0["target"]["Coordinates"], raw["Coordinates"][5]
    )
    # Second file's samples index into it (dataloader.py:105-110).
    s5 = ds[5]
    raw1 = read_simulation(str(sim_dir / "sim1.hdf5"))
    np.testing.assert_array_equal(
        s5["input"]["Coordinates"], raw1["Coordinates"][:5]
    )


def test_dataset_start_indices(sim_dir):
    meta = compute_metadata(read_simulation(str(sim_dir / "sim0.hdf5")))
    ds = SequenceDataset(
        str(sim_dir), window_size=5, metadata=meta, start_indices=[2, 7]
    )
    assert len(ds) == 2
    full = SequenceDataset(str(sim_dir), window_size=5, metadata=meta)
    np.testing.assert_array_equal(
        ds[0]["input"]["Coordinates"], full[2]["input"]["Coordinates"]
    )
    np.testing.assert_array_equal(
        ds[1]["input"]["Coordinates"], full[7]["input"]["Coordinates"]
    )
    with pytest.raises(AssertionError):
        SequenceDataset(
            str(sim_dir), window_size=5, metadata=meta, start_indices=[99]
        )


def test_dataset_batches(sim_dir):
    meta = compute_metadata(read_simulation(str(sim_dir / "sim0.hdf5")))
    ds = SequenceDataset(str(sim_dir), window_size=5, metadata=meta)
    batches = list(ds.batches(4, shuffle=True, seed=1))
    assert len(batches) == 2  # 10 samples -> 2 full batches of 4
    b = batches[0]
    assert b["positions"].shape == (4, 5, 32, 3)
    assert b["temperatures"].shape == (4, 5, 32, 1)
    assert b["target_positions"].shape == (4, 32, 3)
    assert b["target_temperatures"].shape == (4, 32, 1)
    # Same seed reproduces the batch order.
    again = list(ds.batches(4, shuffle=True, seed=1))
    np.testing.assert_array_equal(b["positions"], again[0]["positions"])


def test_dataset_shape_mismatch_rejected(tmp_path):
    write_simulation(
        str(tmp_path / "a.hdf5"),
        generate_synthetic_simulation(num_snapshots=10, num_particles=32),
    )
    write_simulation(
        str(tmp_path / "b.hdf5"),
        generate_synthetic_simulation(num_snapshots=10, num_particles=16),
    )
    with pytest.raises(ValueError, match="mismatch"):
        SequenceDataset(str(tmp_path), window_size=5, metadata={"dt": 1, "box_size": 1})


def test_dataset_missing_dir():
    with pytest.raises(OSError):
        SequenceDataset("/nonexistent_dir_xyz", window_size=5,
                        metadata={"dt": 1, "box_size": 1})
