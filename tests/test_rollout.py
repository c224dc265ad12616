"""Rollout engine tests: shape/layout parity with the reference trajectory
format, integration semantics, and the one-step evaluator."""

import jax
import jax.numpy as jnp
import numpy as np

from cosmology_gnn_simulation_tpu.data.synthetic import (
    generate_synthetic_simulation,
)
from cosmology_gnn_simulation_tpu.evaluation import (
    calculate_rollout_errors,
    validate_one_step,
)
from cosmology_gnn_simulation_tpu.metadata import compute_metadata
from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    init_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.rollout import (
    integrate_step,
    one_step_prediction,
    rollout,
)
from cosmology_gnn_simulation_tpu.training.trainer import default_model_config
from cosmology_gnn_simulation_tpu.types import NormalizationStats


def _setup(n=48, t=10, seed=11):
    sim = generate_synthetic_simulation(
        num_snapshots=t, num_particles=n, seed=seed
    )
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    config = default_model_config(
        window_size=5, latent_size=16, mlp_hidden_size=16,
        mlp_num_hidden_layers=1, num_message_passing_steps=2,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), config)
    return sim, stats, config, params


def test_rollout_shapes_and_seed_window():
    sim, stats, config, params = _setup()
    window = 5
    steps = 4
    out = rollout(
        params, config,
        jnp.asarray(sim["Coordinates"][:window]),
        jnp.asarray(sim["InternalEnergy"][:window]),
        stats, steps, num_neighbors=4, neighbor_query_tile=16,
    )
    assert out["Coordinates"].shape == (window + steps, 48, 3)
    assert out["InternalEnergy"].shape == (window + steps, 48, 1)
    # Seed window passes through untouched (render_rollout.py:32-37).
    np.testing.assert_allclose(
        np.asarray(out["Coordinates"][:window]),
        sim["Coordinates"][:window],
        atol=1e-6,
    )
    # Positions stay wrapped in [0, box).
    coords = np.asarray(out["Coordinates"])
    assert (coords >= 0).all() and (coords < stats.box_size).all()


def test_rollout_first_step_matches_one_step_prediction():
    sim, stats, config, params = _setup()
    window = 5
    out = rollout(
        params, config,
        jnp.asarray(sim["Coordinates"][:window]),
        jnp.asarray(sim["InternalEnergy"][:window]),
        stats, 1, num_neighbors=4, neighbor_query_tile=16,
    )
    pos1, temp1 = one_step_prediction(
        params, config,
        jnp.asarray(sim["Coordinates"][:window]),
        jnp.asarray(sim["InternalEnergy"][:window]),
        stats, num_neighbors=4,
    )
    np.testing.assert_allclose(
        np.asarray(out["Coordinates"][window]), np.asarray(pos1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["InternalEnergy"][window]), np.asarray(temp1), atol=1e-6
    )


def test_integrate_step_semantics():
    """v' = v + a dt; x' = wrap(x + v' dt); T' = T + rate dt
    (render_rollout.py:77-82), including the non-min-image recent-velocity
    quirk (:73)."""
    stats = NormalizationStats(
        temp_mean=jnp.asarray(0.0), temp_std=jnp.asarray(1.0),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(1.0),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(1.0),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(1.0),
        box_size=1.0, dt=0.1,
    )
    # Particle crossed the boundary between the last two frames:
    # prev=0.98, recent=0.02 (true displacement +0.04 via wrap).
    prev = jnp.array([[0.98, 0.5, 0.5]])
    recent = jnp.array([[0.02, 0.5, 0.5]])
    temp = jnp.array([[1.0]])
    acc = jnp.zeros((1, 3))
    rate = jnp.array([[2.0]])

    # Quirk path: velocity = (0.02-0.98)/0.1 = -9.6 (wrong but faithful).
    pos_q, temp_q = integrate_step(
        recent, prev, temp, acc, rate, stats, min_image_velocity=False
    )
    np.testing.assert_allclose(
        np.asarray(pos_q)[0, 0], np.remainder(0.02 + (-9.6) * 0.1, 1.0),
        rtol=1e-5,
    )
    # Fixed path: velocity = +0.04/0.1 = 0.4.
    pos_f, _ = integrate_step(
        recent, prev, temp, acc, rate, stats, min_image_velocity=True
    )
    np.testing.assert_allclose(
        np.asarray(pos_f)[0, 0], 0.02 + 0.4 * 0.1, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(temp_q), 1.0 + 2.0 * 0.1, rtol=1e-6)


def test_validate_one_step_runs_and_is_deterministic():
    sim, stats, config, params = _setup(t=12)
    r1 = validate_one_step(
        params, config, sim, stats, window_size=5, num_neighbors=4,
        num_timesteps=3, seed=0,
    )
    r2 = validate_one_step(
        params, config, sim, stats, window_size=5, num_neighbors=4,
        num_timesteps=3, seed=0,
    )
    assert r1["tested_timesteps"] == r2["tested_timesteps"]
    assert r1["position_error"] == r2["position_error"]
    assert len(r1["position_errors"]) == 3


def test_calculate_rollout_errors():
    pred = {"Coordinates": np.zeros((3, 4, 3)), "InternalEnergy": np.zeros((3, 4, 1))}
    truth = {
        "Coordinates": np.ones((3, 4, 3)),
        "InternalEnergy": np.ones((3, 4, 1)) * 2,
    }
    errors = calculate_rollout_errors(pred, truth)
    np.testing.assert_allclose(errors["position_errors"], [1.0] * 3)
    np.testing.assert_allclose(errors["temperature_errors"], [4.0] * 3)
    assert errors["mean_position_error"] == 1.0


def test_rollout_deterministic():
    """Identical inputs must produce identical trajectories (the reference
    needs cudnn-deterministic flags for this, render_rollout.py:164-168;
    jitted XLA is deterministic by construction)."""
    sim, stats, config, params = _setup()
    args = (
        params, config,
        jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]),
        stats, 3,
    )
    a = rollout(*args, num_neighbors=4, neighbor_query_tile=16)
    b = rollout(*args, num_neighbors=4, neighbor_query_tile=16)
    np.testing.assert_array_equal(
        np.asarray(a["Coordinates"]), np.asarray(b["Coordinates"])
    )


def test_reneighbor_every_matches_exact_when_static():
    """With reneighbor_every > 1 on a short rollout, step 0 re-neighbors and
    the reused lists stay valid while particles barely move — the R=1 and
    R=2 trajectories agree closely at the start and exactly at step 1."""
    sim, stats, config, params = _setup()
    args = (
        params, config,
        jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]),
        stats, 4,
    )
    exact = rollout(*args, num_neighbors=4, neighbor_query_tile=16,
                    reneighbor_every=1)
    reused = rollout(*args, num_neighbors=4, neighbor_query_tile=16,
                     reneighbor_every=2)
    # First predicted frame uses freshly-built neighbors in both: identical.
    np.testing.assert_allclose(
        np.asarray(exact["Coordinates"][5]),
        np.asarray(reused["Coordinates"][5]),
        atol=1e-6,
    )
    # Later frames stay close (neighbors drift slowly).
    drift = np.abs(
        np.asarray(exact["Coordinates"][-1]) - np.asarray(reused["Coordinates"][-1])
    ).max()
    assert drift < 0.05 * stats.box_size


def test_cell_sort_order_is_permutation():
    from cosmology_gnn_simulation_tpu.ops.cell_list import cell_sort_order

    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.random((512, 3), np.float32))
    order = np.asarray(cell_sort_order(pos, 4, 1.0))
    assert sorted(order.tolist()) == list(range(512))
    # Non-trivial at this scale (grid 5): actually reorders particles.
    assert (order != np.arange(512)).any()


def test_sorted_state_rollout_matches_unsorted():
    """Cell-sorted scan-state carriage is a pure layout optimization: the
    trajectories must be bit-identical to the unsorted gather path (each
    query's neighbor list keeps its distance order, so every aggregation
    sum is the same sequence of adds). Brute-force search keeps the
    min-index tie-break permutation-independent on tie-free data."""
    sim, stats, config, params = _setup(n=512, t=8, seed=5)
    args = (
        params, config,
        jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]),
        stats, 3,
    )
    kw = dict(num_neighbors=4, neighbor_query_tile=64,
              neighbor_method="bruteforce")
    plain = rollout(*args, sorted_state="off", **kw)
    srt = rollout(*args, sorted_state="on", **kw)
    np.testing.assert_array_equal(
        np.asarray(plain["Coordinates"]), np.asarray(srt["Coordinates"])
    )
    np.testing.assert_array_equal(
        np.asarray(plain["InternalEnergy"]),
        np.asarray(srt["InternalEnergy"]),
    )
    np.testing.assert_array_equal(
        np.asarray(plain["neighbor_exactness"]),
        np.asarray(srt["neighbor_exactness"]),
    )


def test_sorted_state_rollout_reneighbor_every():
    """The sorted path's R>1 variant re-sorts only at re-neighboring steps;
    it must match the unsorted R>1 path exactly."""
    sim, stats, config, params = _setup(n=512, t=8, seed=5)
    args = (
        params, config,
        jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]),
        stats, 4,
    )
    kw = dict(num_neighbors=4, neighbor_query_tile=64,
              neighbor_method="bruteforce", reneighbor_every=2)
    plain = rollout(*args, sorted_state="off", **kw)
    srt = rollout(*args, sorted_state="on", **kw)
    np.testing.assert_array_equal(
        np.asarray(plain["Coordinates"]), np.asarray(srt["Coordinates"])
    )
