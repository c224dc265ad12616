"""Halo x cell-block composition (round 4, VERDICT r3 item 2): each shard
of the halo decomposition runs its message-passing aggregation through the
selection-matrix MXU kernel over a LOCAL open-slab plan, and the result
must match both the single-device gather path and the single-device
cell-block path — rollout and training gradients alike — on the 8-device
virtual CPU mesh.
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
from cosmology_gnn_simulation_tpu.ops.cellblock import (
    choose_cellblock_spec_halo,
)
from cosmology_gnn_simulation_tpu.parallel.halo import (
    choose_halo_config,
    make_halo_train_step,
    partition_batch,
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
    hc = choose_halo_config(N, K, 4)
    spec = choose_cellblock_spec_halo(
        N, hc.grid_size, hc.slab_layers, hc.halo_layers, 4, h_block=128,
    )
    return sim, stats, model_config, params, hc, spec


def test_halo_cellblock_spec_geometry(setup):
    _, _, _, _, hc, spec = setup
    assert spec.gx == hc.slab_layers + 2 * hc.halo_layers
    assert not spec.periodic_x
    assert spec.num_columns == spec.gx * hc.grid_size


def test_halo_cellblock_rollout_matches_single_device(setup):
    sim, stats, model_config, params, hc, spec = setup
    pos = jnp.asarray(sim["Coordinates"][:5])
    temp = jnp.asarray(sim["InternalEnergy"][:5])
    steps = 3

    gather = rollout(
        params, model_config, pos, temp, stats, steps,
        num_neighbors=K, neighbor_query_tile=512,
    )
    single_cb = rollout(
        params, model_config, pos, temp, stats, steps,
        num_neighbors=K, aggregation="cellblock_hybrid",
    )
    mesh = make_mesh((2, 4))
    got, diag = run_halo_rollout(
        params, model_config, pos, temp, stats, steps, mesh, hc,
        num_neighbors=K, cellblock_spec=spec,
    )
    assert diag["overflow"] == 0 and diag["stranded"] == 0
    assert got["neighbor_exactness"].all()
    assert single_cb["neighbor_exactness"].all()
    # Same sums up to f32 summation order (window order vs k order),
    # amplified over the chaotic steps; the first predicted frame agrees
    # far tighter.
    for ref in (gather, single_cb):
        np.testing.assert_allclose(
            got["Coordinates"], np.asarray(ref["Coordinates"]),
            rtol=0, atol=5e-4,
        )
    np.testing.assert_allclose(
        got["Coordinates"][5], np.asarray(single_cb["Coordinates"][5]),
        rtol=0, atol=1e-5,
    )


def test_halo_cellblock_train_step_matches_single_device(setup):
    sim, stats, model_config, params, hc, spec = setup
    tc = TrainConfig(
        num_neighbors=K,
        batch_size=2,
        noise_std=0.0,
        augment_prob=0.0,
        momentum_loss_weight=0.5,
        neighbor_query_tile=512,
    )
    optimizer = make_optimizer(tc, steps_per_epoch=1)
    opt_state = optimizer.init(params)
    batch = {
        "positions": np.stack(
            [sim["Coordinates"][i: i + 5] for i in range(2)]
        ),
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

    mesh = make_mesh((2, 4))
    halo_step = make_halo_train_step(
        model_config, stats, tc, optimizer, mesh, hc, cellblock_spec=spec,
    )
    part = partition_batch(batch, hc, stats.box_size)
    p_halo, _, m_halo = halo_step(
        params, opt_state, shard_halo_batch(part, mesh), keys
    )

    # The aggregation sums run in window order (S matmul) instead of k
    # order, and the backward through S^T + ppermute reverses differently
    # — agreement is up to f32 reduction order (same tolerances as the
    # gather-path halo invariance test).
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
