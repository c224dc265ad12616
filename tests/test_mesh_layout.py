"""Multi-host (DCN-aware) mesh layout — unit-tested with fake devices.

Real multi-process hardware is unavailable in this environment, so the pure
layout function ``hybrid_device_order`` is exercised with stand-in device
objects, and ``initialize_distributed`` with its no-coordinator fast path.
"""

from dataclasses import dataclass

import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.parallel.mesh import (
    hybrid_device_order,
    initialize_distributed,
    make_mesh,
)


@dataclass(frozen=True)
class FakeDevice:
    id: int
    process_index: int


def _devices(num_procs, per_proc):
    return [
        FakeDevice(id=p * per_proc + i, process_index=p)
        for p in range(num_procs)
        for i in range(per_proc)
    ]


def test_data_axis_spans_processes():
    devs = _devices(num_procs=2, per_proc=4)
    arr = hybrid_device_order(devs, (2, 4))  # (data, particle)
    assert arr.shape == (2, 4)
    # Each data row = one process (gradient all-reduce rides DCN)...
    for row in range(2):
        assert {d.process_index for d in arr[row]} == {row}
    # ...and each particle column crosses processes only along data.
    for col in range(4):
        assert [d.process_index for d in arr[:, col]] == [0, 1]


def test_hybrid_data_axis():
    # 4 processes x 2 local devices, data=8 (4 DCN x 2 ICI), particle=1.
    devs = _devices(4, 2)
    arr = hybrid_device_order(devs, (8, 1))
    # Process blocks are contiguous along data, in process order.
    assert [d.process_index for d in arr[:, 0]] == [0, 0, 1, 1, 2, 2, 3, 3]


def test_particle_axis_stays_local():
    devs = _devices(2, 4)
    arr = hybrid_device_order(devs, (2, 2, 2), data_axis=0)
    for i in range(2):
        procs = {d.process_index for d in arr[i].reshape(-1)}
        assert procs == {i}


def test_rejects_non_dcn_divisible_data_axis():
    devs = _devices(2, 4)
    with pytest.raises(ValueError, match="data axis"):
        hybrid_device_order(devs, (1, 8))


def test_rejects_uneven_processes():
    devs = _devices(2, 4)[:-1] + [FakeDevice(id=99, process_index=0)]
    with pytest.raises(ValueError, match="evenly"):
        hybrid_device_order(devs, (2, 4))


def test_rejects_wrong_product():
    with pytest.raises(ValueError, match="multiply"):
        hybrid_device_order(_devices(2, 4), (2, 3))


def test_initialize_distributed_noop_without_coordinator(monkeypatch):
    for var in (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    ):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False


def test_initialize_distributed_calls_jax(monkeypatch):
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.update(
            addr=coordinator_address, n=num_processes, pid=process_id
        )

    import jax

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    assert initialize_distributed("10.0.0.1:1234", 4, 1) is True
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 1}


def test_make_mesh_single_process_unchanged():
    mesh = make_mesh((1, 8))
    assert mesh.shape == {"data": 1, "particle": 8}


def test_shard_batch_process_local_mocked(monkeypatch):
    """Multi-process shard_batch assembles globals from process-local
    slices via jax.make_array_from_process_local_data (mocked — real
    multi-process hardware unavailable here)."""
    import jax
    import numpy as np

    from cosmology_gnn_simulation_tpu.parallel import sharded

    mesh = make_mesh((1, 8))
    batch = {
        "positions": np.zeros((2, 5, 16, 3), np.float32),
        "temperatures": np.zeros((2, 5, 16, 1), np.float32),
        "target_positions": np.zeros((2, 16, 3), np.float32),
        "target_temperatures": np.zeros((2, 16, 1), np.float32),
    }
    calls = []

    def fake_from_local(sharding, arr):
        calls.append((sharding, arr.shape))
        return jax.device_put(arr, sharding)  # single-process stand-in

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(
        jax, "make_array_from_process_local_data", fake_from_local
    )
    out = sharded.shard_batch(batch, mesh)
    assert len(calls) == 4  # every field went through the process-local path
    assert out["positions"].shape == (2, 5, 16, 3)

    # Global batch (local * process_count) must divide the data axis.
    import pytest

    mesh3 = make_mesh((8, 1))
    bad = {k: v[:1] for k, v in batch.items()}  # global batch = 2, axis 8
    with pytest.raises(ValueError, match="global batch"):
        sharded.shard_batch(bad, mesh3, process_local=True)
