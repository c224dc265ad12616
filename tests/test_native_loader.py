"""Native C++ window-loader tests: build, cache conversion, batch parity
with the pure-Python SequenceDataset, and the background prefetcher."""

import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.data import native_loader
from cosmology_gnn_simulation_tpu.data.dataset import SequenceDataset
from cosmology_gnn_simulation_tpu.data.hdf5 import write_simulation
from cosmology_gnn_simulation_tpu.data.synthetic import (
    generate_synthetic_simulation,
)
from cosmology_gnn_simulation_tpu.metadata import compute_metadata

pytestmark = pytest.mark.skipif(
    not native_loader.is_available(), reason="no C++ toolchain"
)


@pytest.fixture
def sim_dir(tmp_path):
    sims = []
    for i in range(2):
        sim = generate_synthetic_simulation(
            num_snapshots=9, num_particles=24, seed=i
        )
        write_simulation(str(tmp_path / f"sim{i}.hdf5"), sim)
        sims.append(sim)
    return tmp_path, sims


def test_open_and_metadata(sim_dir):
    path, sims = sim_dir
    loader = native_loader.open_directory(str(path), window_size=5)
    assert loader.num_particles == 24
    assert loader.num_snapshots == 9
    assert loader.box_size == pytest.approx(sims[0]["BoxSize"])
    assert loader.dt == pytest.approx(sims[0]["TimeStep"])
    assert len(loader) == 2 * (9 - 5)
    loader.close()


def test_batches_match_python_dataset(sim_dir):
    path, sims = sim_dir
    meta = compute_metadata(sims[0])
    py_ds = SequenceDataset(str(path), window_size=5, metadata=meta)
    loader = native_loader.open_directory(str(path), window_size=5)

    native = loader.get_batch([0, 3, 5])
    for i, seq in enumerate([0, 3, 5]):
        sample = py_ds[seq]
        np.testing.assert_array_equal(
            native["positions"][i], sample["input"]["Coordinates"]
        )
        np.testing.assert_array_equal(
            native["temperatures"][i], sample["input"]["InternalEnergy"]
        )
        np.testing.assert_array_equal(
            native["target_positions"][i], sample["target"]["Coordinates"]
        )
        np.testing.assert_array_equal(
            native["target_temperatures"][i],
            sample["target"]["InternalEnergy"],
        )
    loader.close()


def test_prefetch_iteration_covers_epoch(sim_dir):
    path, _ = sim_dir
    loader = native_loader.open_directory(str(path), window_size=5)
    batches = list(loader.batches(2, shuffle=True, seed=3))
    assert len(batches) == len(loader) // 2
    assert batches[0]["positions"].shape == (2, 5, 24, 3)
    # Shuffled epoch must cover distinct samples: compare against the same
    # shuffle order applied through the synchronous path.
    order = np.arange(len(loader), dtype=np.int64)
    np.random.default_rng(3).shuffle(order)
    expected_first = loader.get_batch(order[:2])
    np.testing.assert_array_equal(
        batches[0]["positions"], expected_first["positions"]
    )
    loader.close()


def test_bad_cache_rejected(tmp_path):
    bad = tmp_path / "bad.cgnn"
    bad.write_bytes(b"not a cache file at all....")
    with pytest.raises(ValueError, match="failed to open"):
        native_loader.NativeSequenceLoader([str(bad)], window_size=5)


def test_truncated_cache_rejected_safely(tmp_path):
    """Valid magic but truncated payload: must be rejected and leave the
    process healthy (the double-release itself is silent on Linux, so this
    exercises the path rather than proving its absence — map_file now
    populates outputs only after full validation)."""
    import struct

    bad = tmp_path / "truncated.cgnn"
    header = struct.pack("<qqqdd", 0x43474E4E53494D31, 10, 100, 1.0, 0.05)
    bad.write_bytes(header + b"\x00" * 64)  # far less than 10*100*16 bytes
    with pytest.raises(ValueError, match="failed to open"):
        native_loader.NativeSequenceLoader([str(bad)], window_size=5)
    # And the process is still healthy: a good loader opens fine afterwards.
    sim = generate_synthetic_simulation(num_snapshots=8, num_particles=16)
    write_simulation(str(tmp_path / "ok.hdf5"), sim)
    cache = native_loader.convert_hdf5_to_cache(
        str(tmp_path / "ok.hdf5"), str(tmp_path / "ok.cgnn")
    )
    loader = native_loader.NativeSequenceLoader([cache], window_size=5)
    assert len(loader) == 3
    loader.close()


def test_overflow_header_rejected(tmp_path):
    """Corrupt header with huge T/N must not pass validation via size_t
    overflow of T*N*16 (would SIGBUS on first batch access)."""
    import struct

    bad = tmp_path / "overflow.cgnn"
    header = struct.pack(
        "<qqqdd", 0x43474E4E53494D31, 1 << 60, 4, 1.0, 0.05
    )
    bad.write_bytes(header + b"\x00" * 64)
    with pytest.raises(ValueError, match="failed to open"):
        native_loader.NativeSequenceLoader([str(bad)], window_size=5)

    neg = tmp_path / "neg.cgnn"
    neg.write_bytes(
        struct.pack("<qqqdd", 0x43474E4E53494D31, -3, 16, 1.0, 0.05)
        + b"\x00" * 64
    )
    with pytest.raises(ValueError, match="failed to open"):
        native_loader.NativeSequenceLoader([str(neg)], window_size=5)


def test_extras_match_python_dataset(sim_dir):
    """v2 caches serve every ndim>0 field; extras mirror SequenceDataset."""
    path, sims = sim_dir
    meta = compute_metadata(sims[0])
    py_ds = SequenceDataset(str(path), window_size=5, metadata=meta)
    loader = native_loader.open_directory(str(path), window_size=5)
    assert set(loader.field_names) >= {
        "Coordinates", "InternalEnergy", "Velocities", "HydroAcceleration",
    }

    native = loader.get_batch([1, 6], include_extras=True)
    for name in loader.field_names[2:]:
        for i, seq in enumerate([1, 6]):
            sample = py_ds[seq]
            want_in = sample["input"][name]
            want_tg = sample["target"][name]
            if want_in.ndim == 2:  # scalar fields ride as [..., 1]
                want_in, want_tg = want_in[..., None], want_tg[..., None]
            np.testing.assert_array_equal(
                native["extra_inputs"][name][i], want_in
            )
            np.testing.assert_array_equal(
                native["extra_targets"][name][i], want_tg
            )

    # Prefetched epoch with extras: shapes and determinism.
    batches = list(
        loader.batches(2, shuffle=True, seed=7, include_extras=True)
    )
    assert len(batches) == len(loader) // 2
    vel = batches[0]["extra_inputs"]["Velocities"]
    assert vel.shape == (2, 5, 24, 3)
    order = np.arange(len(loader), dtype=np.int64)
    np.random.default_rng(7).shuffle(order)
    expected = loader.get_batch(order[:2], include_extras=True)
    np.testing.assert_array_equal(
        batches[0]["extra_inputs"]["Velocities"],
        expected["extra_inputs"]["Velocities"],
    )
    loader.close()


def test_v1_cache_still_readable(tmp_path):
    """Old 2-field caches (magic CGNNSIM1) keep working."""
    import struct

    sim = generate_synthetic_simulation(num_snapshots=8, num_particles=16)
    coords = np.ascontiguousarray(sim["Coordinates"], np.float32)
    energy = np.ascontiguousarray(sim["InternalEnergy"], np.float32)
    v1 = tmp_path / "v1.cgnn"
    with open(v1, "wb") as f:
        f.write(struct.pack(
            "<qqqdd", 0x43474E4E53494D31, 8, 16,
            float(sim["BoxSize"]), float(sim["TimeStep"]),
        ))
        f.write(coords.tobytes())
        f.write(energy.tobytes())
    loader = native_loader.NativeSequenceLoader([str(v1)], window_size=5)
    assert loader.field_names == ["Coordinates", "InternalEnergy"]
    batch = loader.get_batch([0])
    np.testing.assert_array_equal(batch["positions"][0], coords[:5])
    np.testing.assert_array_equal(
        batch["target_temperatures"][0], energy[5].reshape(16, 1)
    )
    loader.close()
