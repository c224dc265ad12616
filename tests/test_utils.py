"""Tests for observability utilities, plotting artifacts, and aggregation."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.utils.profiling import StepTimer


def test_chunked_gather_sum_matches_direct(rng):
    """models._gather_sum must chunk without changing results."""
    from cosmology_gnn_simulation_tpu.models import encode_process_decode as epd

    values = jnp.asarray(rng.normal(size=(300, 8)).astype(np.float32))
    neighbors = jnp.asarray(rng.integers(0, 300, size=(300, 4)))
    direct = np.asarray(epd._gather_sum(values, neighbors))
    old = epd._GATHER_CHUNK_BYTES
    try:
        epd._GATHER_CHUNK_BYTES = 1024  # force chunking
        chunked = np.asarray(epd._gather_sum(values, neighbors))
    finally:
        epd._GATHER_CHUNK_BYTES = old
    np.testing.assert_allclose(chunked, direct, rtol=1e-6, atol=1e-6)


def test_step_timer_summary():
    timer = StepTimer()
    for _ in range(4):
        with timer.phase("work"):
            time.sleep(0.005)
    timer.record("manual", 1.5)
    s = timer.summary()
    assert s["work"]["count"] == 4
    assert s["work"]["mean_s"] >= 0.004
    assert s["manual"]["total_s"] == 1.5
    timer.reset()
    assert timer.summary() == {}


def test_plot_losses_writes_file(tmp_path):
    pytest.importorskip("matplotlib")
    from cosmology_gnn_simulation_tpu.training.plots import (
        plot_losses,
        plot_rollout_errors,
    )

    components = {
        "acc_train": [1.0, 0.5], "acc_val": [1.1, 0.6],
        "temp_rate_train": [2.0, 1.0], "temp_rate_val": [2.1, 1.1],
        "momentum_train": [0.1, 0.05], "momentum_val": [0.2, 0.1],
    }
    path = str(tmp_path / "losses.png")
    plot_losses([3.0, 1.5], [3.2, 1.7], path, components, [1e-4, 5e-5])
    assert os.path.getsize(path) > 1000

    epath = str(tmp_path / "errors.png")
    plot_rollout_errors(
        {"position_errors": [0.1, 0.2], "temperature_errors": [0.01, 0.02]},
        epath, window_size=1, box_size=1.0,
    )
    assert os.path.getsize(epath) > 1000
