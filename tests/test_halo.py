"""Halo-exchange spatial sharding tests (8-device virtual CPU mesh).

The contract (SURVEY.md §5 long-context row, VERDICT round-1 item 1): the
halo-decomposed path must produce the SAME numbers as the single-device
path — for graph construction, a full training step, and a multi-step
rollout with inter-slab migration — while only ever exchanging boundary
rows (no [N_global, .] intermediates; see test_halo_memory_scaling).
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
    make_halo_rollout,
    make_halo_train_step,
    partition_batch,
    partition_windows,
    run_halo_rollout,
    shard_halo_batch,
)
from cosmology_gnn_simulation_tpu.parallel.mesh import make_mesh
from cosmology_gnn_simulation_tpu.rollout import rollout
from cosmology_gnn_simulation_tpu.training.trainer import (
    TrainConfig,
    default_model_config,
    make_optimizer,
    make_train_step,
)
from cosmology_gnn_simulation_tpu.types import NormalizationStats

# N=4096 with k=4 supports a 12-layer exact cell grid: 4 slabs of 3 layers
# (halo_layers=1) or 2 slabs of 6 (halo_layers=2, the noised-training case).
N, K = 4096, 4


@pytest.fixture(scope="module")
def setup():
    sim = generate_synthetic_simulation(
        num_snapshots=12, num_particles=N, seed=3
    )
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


def test_choose_halo_config_geometry():
    hc = choose_halo_config(N, K, 4)
    assert hc.grid_size % hc.num_shards == 0
    assert hc.slab_layers >= 2 * hc.halo_layers
    assert hc.local_capacity * hc.num_shards >= N
    with pytest.raises(ValueError, match="slabs"):
        choose_halo_config(256, 16, 8)
    with pytest.raises(ValueError, match="num_shards"):
        choose_halo_config(N, K, 1)


def test_partition_windows_roundtrip(setup):
    sim, stats, _, _ = setup
    hc = choose_halo_config(N, K, 4)
    pos = sim["Coordinates"][:5]
    temp = sim["InternalEnergy"][:5]
    part = partition_windows(
        pos, temp, hc, stats.box_size,
        target_position=sim["Coordinates"][5],
        target_temperature=sim["InternalEnergy"][5],
    )
    assert part["positions"].shape == (5, 4 * hc.local_capacity, 3)
    assert part["valid"].sum() == N
    # Round-trip: every particle lands in exactly one slot, data intact.
    gid = part["gid"][part["valid"]]
    assert sorted(gid.tolist()) == list(range(N))
    np.testing.assert_array_equal(
        part["positions"][:, part["valid"]][:, np.argsort(gid)], pos
    )
    np.testing.assert_array_equal(
        part["target_positions"][part["valid"]][np.argsort(gid)],
        sim["Coordinates"][5],
    )
    # Slab assignment is spatial: each shard's particles lie in its x-slab.
    cap = hc.local_capacity
    for s in range(4):
        seg = slice(s * cap, (s + 1) * cap)
        xs = part["positions"][-1, seg][part["valid"][seg]][:, 0]
        owner = np.floor(xs / stats.box_size * 4).clip(0, 3)
        np.testing.assert_array_equal(owner, s)


def test_partition_capacity_overflow_is_loud(setup):
    sim, stats, _, _ = setup
    hc = choose_halo_config(N, K, 4)._replace(local_capacity=8)
    with pytest.raises(ValueError, match="local_capacity"):
        partition_windows(
            sim["Coordinates"][:5], sim["InternalEnergy"][:5], hc,
            stats.box_size,
        )


def test_halo_train_step_matches_single_device(setup):
    sim, stats, model_config, params = setup
    tc = TrainConfig(
        num_neighbors=K,
        batch_size=2,
        noise_std=0.0,  # per-shard noise keys differ by design; disable
        augment_prob=0.0,
        momentum_loss_weight=0.5,
        neighbor_query_tile=512,
    )
    optimizer = make_optimizer(tc, steps_per_epoch=1)
    opt_state = optimizer.init(params)
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
    keys = jax.random.split(jax.random.PRNGKey(5), 2)

    single_step = make_train_step(model_config, stats, tc, optimizer)
    p_single, _, m_single = single_step(
        params, opt_state, batch, jax.random.PRNGKey(5)
    )

    hc = choose_halo_config(N, K, 4)
    mesh = make_mesh((2, 4))
    halo_step = make_halo_train_step(
        model_config, stats, tc, optimizer, mesh, hc
    )
    part = partition_batch(batch, hc, stats.box_size)
    p_halo, _, m_halo = halo_step(
        params, opt_state, shard_halo_batch(part, mesh), keys
    )

    # NOTE: the single-device step draws per-sample PRNG subkeys internally;
    # with noise_std=0 and augment_prob=0 the keys are consumed by exact
    # zero draws, so losses and gradients must agree up to f32 reduction
    # order (the momentum term sums ~N large near-cancelling impulses, so
    # its split-sum-then-psum order shifts the total by ~1e-4 relative).
    for key, rtol in (("acceleration", 2e-4), ("temp_rate", 2e-4),
                      ("momentum", 1e-3), ("loss", 1e-3)):
        np.testing.assert_allclose(
            float(m_halo[key]), float(m_single[key]), rtol=rtol,
            err_msg=key,
        )
    flat_s, _ = jax.tree.flatten(p_single)
    flat_h, _ = jax.tree.flatten(p_halo)
    for a, b in zip(flat_h, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-6
        )


def test_halo_memory_scaling(setup):
    """O(N/P + halo) memory contract: the halo rollout's HLO must never
    materialize a GLOBAL [P*cap, latent] tensor — a regression to an
    all-gather of projected latents would otherwise pass every numeric
    test while destroying the config-5 scaling story."""
    sim, stats, model_config, params = setup
    latent = model_config.latent_size
    hc = choose_halo_config(N, K, 4)
    mesh = make_mesh((2, 4))
    fn = make_halo_rollout(model_config, stats, mesh, 2, hc, num_neighbors=K)
    part = partition_windows(
        np.asarray(sim["Coordinates"][:5], np.float32),
        np.asarray(sim["InternalEnergy"][:5], np.float32),
        hc, stats.box_size,
    )
    args = (
        params,
        jnp.asarray(part["positions"]),
        jnp.asarray(part["temperatures"]),
        jnp.asarray(part["valid"]),
        jnp.asarray(part["gid"]),
    )
    hlo = jax.jit(fn).lower(*args).as_text()
    n_global = hc.num_shards * hc.local_capacity
    # lower().as_text() is StableHLO: shapes print as tensor<AxBxdtype>.
    forbidden = f"tensor<{n_global}x{latent}x"
    assert forbidden not in hlo, (
        f"halo rollout HLO materializes a global latent tensor {forbidden}"
    )
    # The shard-local latent tensors it SHOULD hold instead do appear.
    assert f"tensor<{hc.local_capacity}x{latent}x" in hlo


def test_noised_halo_train_step_matches_single_device(setup):
    """With per-particle-gid noise keying, the NOISED halo step is
    numerically identical to the single-device step (round-2 verdict: the
    invariance contract must cover noise_std > 0, not just 0)."""
    sim, stats, model_config, params = setup
    tc = TrainConfig(
        num_neighbors=K,
        batch_size=4,
        noise_std=3e-4,
        augment_prob=0.0,  # single-device augments on device, halo on host
        momentum_loss_weight=0.5,
        partition_invariant_noise=True,  # single-device side of the contract
    )
    optimizer = make_optimizer(tc, steps_per_epoch=1)
    opt_state = optimizer.init(params)
    batch = {
        "positions": np.stack(
            [sim["Coordinates"][i % 2: i % 2 + 5] for i in range(4)]
        ),
        "temperatures": np.stack(
            [sim["InternalEnergy"][i % 2: i % 2 + 5] for i in range(4)]
        ),
        "target_positions": np.stack(
            [sim["Coordinates"][i % 2 + 5] for i in range(4)]
        ),
        "target_temperatures": np.stack(
            [sim["InternalEnergy"][i % 2 + 5] for i in range(4)]
        ),
    }
    single_step = make_train_step(model_config, stats, tc, optimizer)
    p_single, _, m_single = single_step(
        params, opt_state, batch, jax.random.PRNGKey(5)
    )

    hc = choose_halo_config(N, K, 2, noise=True)
    assert hc.halo_layers == 2
    mesh = make_mesh((4, 2))
    halo_step = make_halo_train_step(
        model_config, stats, tc, optimizer, mesh, hc
    )
    part = partition_batch(batch, hc, stats.box_size)
    # The same per-sample keys the single-device step derives internally.
    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    p_halo, _, m_halo = halo_step(
        params, opt_state, shard_halo_batch(part, mesh), keys
    )
    for key, rtol in (("acceleration", 2e-4), ("temp_rate", 2e-4),
                      ("momentum", 1e-3), ("loss", 1e-3)):
        np.testing.assert_allclose(
            float(m_halo[key]), float(m_single[key]), rtol=rtol, err_msg=key
        )
    flat_s, _ = jax.tree.flatten(p_single)
    flat_h, _ = jax.tree.flatten(p_halo)
    for a, b in zip(flat_h, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-6
        )


def test_halo_train_step_with_noise_runs(setup):
    sim, stats, model_config, params = setup
    tc = TrainConfig(
        num_neighbors=K, batch_size=2, noise_std=3e-4, augment_prob=1.0,
        momentum_loss_weight=0.1,
    )
    optimizer = make_optimizer(tc, steps_per_epoch=1)
    opt_state = optimizer.init(params)
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
    hc = choose_halo_config(N, K, 2, noise=True)
    assert hc.halo_layers == 2
    mesh = make_mesh((4, 2))
    halo_step = make_halo_train_step(
        model_config, stats, tc, optimizer, mesh, hc
    )
    # Host-side augmentation (reference dataloader.py:137-150 semantics).
    part = partition_batch(
        batch, hc, stats.box_size,
        augment_prob=1.0, rng=np.random.default_rng(0),
    )
    # batch_size 2 over data axis 4: replicate to fill the axis.
    part = {k: np.concatenate([v, v]) for k, v in part.items()}
    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    _, _, metrics = halo_step(
        params, opt_state, shard_halo_batch(part, mesh), keys
    )
    assert np.isfinite(float(metrics["loss"]))


# num_shards=2 exercises the degenerate ring where both halo neighbors are
# the SAME device; 8 shards need a finer grid than N=4096/k=4 supports and
# are covered by __graft_entry__'s dryrun at N=65,536.
@pytest.mark.parametrize("num_shards", [2, 4])
def test_halo_rollout_matches_single_device(setup, num_shards):
    sim, stats, model_config, params = setup
    pos = jnp.asarray(sim["Coordinates"][:5])
    temp = jnp.asarray(sim["InternalEnergy"][:5])
    steps = 4

    expected = rollout(
        params, model_config, pos, temp, stats, steps,
        num_neighbors=K, neighbor_query_tile=512,
    )

    hc = choose_halo_config(N, K, num_shards)
    mesh = make_mesh((8 // num_shards, num_shards))
    got, diag = run_halo_rollout(
        params, model_config, pos, temp, stats, steps, mesh, hc,
        num_neighbors=K,
    )
    assert diag["overflow"] == 0 and diag["stranded"] == 0
    assert got["neighbor_exactness"].all()
    np.testing.assert_allclose(
        got["Coordinates"], np.asarray(expected["Coordinates"]),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        got["InternalEnergy"], np.asarray(expected["InternalEnergy"]),
        rtol=2e-5, atol=2e-5,
    )


def test_halo_rollout_migration_occurs(setup):
    """The matched trajectories above must actually exercise migration —
    otherwise the test proves nothing about it."""
    sim, stats, model_config, params = setup
    hc = choose_halo_config(N, K, 4)
    mesh = make_mesh((2, 4))
    fn = make_halo_rollout(
        model_config, stats, mesh, 4, hc, num_neighbors=K
    )
    part = partition_windows(
        np.asarray(sim["Coordinates"][:5], np.float32),
        np.asarray(sim["InternalEnergy"][:5], np.float32),
        hc, stats.box_size,
    )
    outs, diag, exactness = fn(
        params,
        jnp.asarray(part["positions"]),
        jnp.asarray(part["temperatures"]),
        jnp.asarray(part["valid"]),
        jnp.asarray(part["gid"]),
    )
    # The per-step certificate holds on this well-behaved fixture.
    assert np.asarray(exactness).all()
    # Particle count is conserved every step...
    valid = np.asarray(outs["valid"])
    assert (valid.sum(axis=1) == N).all()
    # ...and ownership actually changes over the rollout (particles crossed
    # slab boundaries), so migration ran for real.
    gid0 = set(np.asarray(part["gid"])[: hc.local_capacity][
        np.asarray(part["valid"])[: hc.local_capacity]].tolist())
    gid_last = set(np.asarray(outs["gid"])[-1, : hc.local_capacity][
        valid[-1, : hc.local_capacity]].tolist())
    assert gid0 != gid_last, "no particle changed shard; weak test setup"
