"""Cell-block training vs. the gather path: same losses, same gradients.

The round-3 contract (VERDICT round-2 item 1): ``aggregation="cellblock"``
must train — the forward runs in slot space on the selection-matrix kernel
and the backward through the transposed table — and produce the same
numbers as the default gather path (losses are row-permutation invariant;
parameter updates agree up to f32 summation order).
"""

import jax
import jax.numpy as jnp
import numpy as np

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
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from cosmology_gnn_simulation_tpu.types import NormalizationStats

N, K = 512, 4


def _setup():
    sim = generate_synthetic_simulation(num_snapshots=8, num_particles=N,
                                        seed=11)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    model_config = default_model_config(
        window_size=5, latent_size=16, mlp_hidden_size=16,
        mlp_num_hidden_layers=1, num_message_passing_steps=2,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    batch = {
        "positions": np.stack([sim["Coordinates"][i:i + 5] for i in range(2)]),
        "temperatures": np.stack(
            [sim["InternalEnergy"][i:i + 5] for i in range(2)]
        ),
        "target_positions": np.stack(
            [sim["Coordinates"][i + 5] for i in range(2)]
        ),
        "target_temperatures": np.stack(
            [sim["InternalEnergy"][i + 5] for i in range(2)]
        ),
    }
    return stats, model_config, params, batch


def _common_tc(**kw):
    return TrainConfig(
        num_neighbors=K, batch_size=2, noise_std=3e-4, augment_prob=1.0,
        momentum_loss_weight=0.5, **kw,
    )


def test_cellblock_train_step_matches_gather():
    stats, mc, params, batch = _setup()
    key = jax.random.PRNGKey(7)

    tc_g = _common_tc()
    opt = make_optimizer(tc_g, steps_per_epoch=1)
    p_g, _, m_g = make_train_step(mc, stats, tc_g, opt)(
        params, opt.init(params), batch, key
    )

    tc_c = _common_tc(aggregation="cellblock")
    p_c, _, m_c = make_train_step(mc, stats, tc_c, opt)(
        params, opt.init(params), batch, key
    )
    assert float(m_c["cellblock_violations"]) == 0.0
    for k in ("loss", "acceleration", "temp_rate", "momentum"):
        np.testing.assert_allclose(
            float(m_c[k]), float(m_g[k]), rtol=2e-4, err_msg=k
        )
    flat_g, _ = jax.tree.flatten(p_g)
    flat_c, _ = jax.tree.flatten(p_c)
    for a, b in zip(flat_c, flat_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-6
        )


def test_cellblock_eval_step_matches_gather():
    stats, mc, params, batch = _setup()
    m_g = make_eval_step(mc, stats, _common_tc())(params, batch)
    m_c = make_eval_step(mc, stats, _common_tc(aggregation="cellblock"))(
        params, batch
    )
    for k in ("loss", "acceleration", "temp_rate"):
        np.testing.assert_allclose(
            float(m_c[k]), float(m_g[k]), rtol=2e-5, err_msg=k
        )


def test_cellblock_training_reduces_loss():
    stats, mc, params, batch = _setup()
    tc = _common_tc(aggregation="cellblock", learning_rate=1e-3,
                    final_learning_rate=1e-3)
    opt = make_optimizer(tc, steps_per_epoch=1)
    step = make_train_step(mc, stats, tc, opt)
    opt_state = opt.init(params)
    losses = []
    for i in range(8):
        params, opt_state, m = step(
            params, opt_state, batch, jax.random.PRNGKey(i)
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


import pytest


@pytest.mark.parametrize("variable", [False, True])
def test_cellblock_hybrid_train_step_matches_gather(variable):
    """Hybrid mode trains: the VJP chain is compact^T -> S^T kernel ->
    expand^T around the particle-space tail. ``variable`` additionally
    exercises the round-4 packed slot layout end-to-end through the
    train-step backward."""
    stats, mc, params, batch = _setup()
    key = jax.random.PRNGKey(7)

    tc_g = _common_tc()
    opt = make_optimizer(tc_g, steps_per_epoch=1)
    p_g, _, m_g = make_train_step(mc, stats, tc_g, opt)(
        params, opt.init(params), batch, key
    )

    tc_h = _common_tc(
        aggregation="cellblock_hybrid", cellblock_variable=variable
    )
    p_h, _, m_h = make_train_step(mc, stats, tc_h, opt)(
        params, opt.init(params), batch, key
    )
    assert float(m_h["cellblock_violations"]) == 0.0
    for k in ("loss", "acceleration", "temp_rate", "momentum"):
        np.testing.assert_allclose(
            float(m_h[k]), float(m_g[k]), rtol=2e-4, err_msg=k
        )
    flat_g, _ = jax.tree.flatten(p_g)
    flat_h, _ = jax.tree.flatten(p_h)
    for a, b in zip(flat_h, flat_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-6
        )
