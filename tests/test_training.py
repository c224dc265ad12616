"""Training-stack tests: losses, optimizer schedule, augmentation, and a
mini end-to-end fit (loss decreases, artifacts written) — the integration
strategy of SURVEY.md §4c."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.data.dataset import SequenceDataset
from cosmology_gnn_simulation_tpu.data.hdf5 import write_simulation
from cosmology_gnn_simulation_tpu.data.synthetic import (
    generate_synthetic_simulation,
)
from cosmology_gnn_simulation_tpu.metadata import compute_metadata
from cosmology_gnn_simulation_tpu.training.losses import (
    combined_loss,
    momentum_conservation_loss,
)
from cosmology_gnn_simulation_tpu.training.trainer import (
    TrainConfig,
    Trainer,
    _augment_axes,
    default_model_config,
    make_optimizer,
)
from cosmology_gnn_simulation_tpu.types import NormalizationStats
from cosmology_gnn_simulation_tpu.utils import checkpoint as ckpt_lib


def test_momentum_loss_values():
    # Two graphs: one with net impulse, one balanced.
    acc = jnp.asarray(
        [
            [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]],  # net = (2,0,0)
            [[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]],  # net = 0
        ]
    )
    dt = 0.5
    # per-graph: ||sum a*dt||^2 -> (2*0.5)^2 = 1 and 0; mean = 0.5; x weight 2.
    loss = momentum_conservation_loss(acc, dt, momentum_weight=2.0)
    assert float(loss) == pytest.approx(1.0)


def test_combined_loss_weights():
    preds = {
        "acceleration": jnp.ones((2, 4, 3)),
        "temp_rate": jnp.ones((2, 4, 1)) * 2,
    }
    tgt_acc = jnp.zeros((2, 4, 3))
    tgt_rate = jnp.zeros((2, 4, 1))
    total, comps = combined_loss(
        preds, tgt_acc, tgt_rate, dt=1.0,
        acc_weight=3.0, temp_rate_weight=0.5, momentum_weight=0.0,
    )
    assert float(comps["acceleration"]) == pytest.approx(1.0)
    assert float(comps["temp_rate"]) == pytest.approx(4.0)
    assert float(comps["momentum"]) == 0.0
    assert float(total) == pytest.approx(3.0 * 1.0 + 0.5 * 4.0)


def test_lr_schedule_matches_reference():
    """gamma = (final/initial)^(1/epochs), stepped per epoch
    (train.py:184-187,316)."""
    tc = TrainConfig(learning_rate=1e-3, final_learning_rate=1e-5, num_epochs=10)
    opt = make_optimizer(tc, steps_per_epoch=7)
    del opt
    gamma = (1e-5 / 1e-3) ** (1 / 10)
    # Probe the schedule through the optimizer's update scale on a known grad.
    import optax

    opt = make_optimizer(tc, steps_per_epoch=1)
    params = {"w": jnp.ones(())}
    state = opt.init(params)
    lrs = []
    for step in range(3):
        updates, state = opt.update({"w": jnp.ones(())}, state, params)
        # Adam normalizes the gradient to ~1 for a constant grad; the update
        # magnitude ~= lr.
        lrs.append(abs(float(updates["w"])))
    assert lrs[1] / lrs[0] == pytest.approx(gamma, rel=1e-3)
    assert lrs[2] / lrs[1] == pytest.approx(gamma, rel=1e-3)


def test_augment_axes_permutation_properties():
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (5, 10, 3))
    tgt = jax.random.uniform(jax.random.PRNGKey(2), (10, 3))
    # prob=0: identity.
    p0, t0 = _augment_axes(key, pos, tgt, 0.0)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(pos))
    # prob=1: some key produces a non-identity permutation; the same
    # permutation applies to input and target.
    found_nontrivial = False
    for i in range(10):
        k = jax.random.PRNGKey(i)
        p1, t1 = _augment_axes(k, pos, tgt, 1.0)
        # Set-equality of coordinates (permutation, not mutation).
        np.testing.assert_allclose(
            np.sort(np.asarray(p1), axis=-1), np.sort(np.asarray(pos), axis=-1)
        )
        if not np.allclose(np.asarray(p1), np.asarray(pos)):
            found_nontrivial = True
            # Input and target permuted consistently: find the perm from pos
            # and check it maps tgt too.
            for j in range(3):
                col = np.asarray(p1)[..., j]
                matches = [
                    np.allclose(col, np.asarray(pos)[..., m]) for m in range(3)
                ]
                m = int(np.argmax(matches))
                assert matches[m]
                np.testing.assert_allclose(
                    np.asarray(t1)[..., j], np.asarray(tgt)[..., m]
                )
    assert found_nontrivial


@pytest.fixture
def data_dirs(tmp_path):
    train_dir = tmp_path / "train"
    val_dir = tmp_path / "val"
    train_dir.mkdir()
    val_dir.mkdir()
    write_simulation(
        str(train_dir / "sim.hdf5"),
        generate_synthetic_simulation(num_snapshots=12, num_particles=48, seed=0),
    )
    write_simulation(
        str(val_dir / "sim.hdf5"),
        generate_synthetic_simulation(num_snapshots=12, num_particles=48, seed=1),
    )
    return train_dir, val_dir


def test_end_to_end_training_decreases_loss(data_dirs, tmp_path):
    train_dir, val_dir = data_dirs
    from cosmology_gnn_simulation_tpu.data.hdf5 import read_simulation

    meta = compute_metadata(read_simulation(str(train_dir / "sim.hdf5")))
    stats = NormalizationStats.from_metadata(meta)
    model_config = default_model_config(
        window_size=5, latent_size=16, mlp_hidden_size=16,
        mlp_num_hidden_layers=1, num_message_passing_steps=2,
    )
    out_dir = str(tmp_path / "out")
    tc = TrainConfig(
        num_neighbors=4, batch_size=2, num_epochs=3,
        learning_rate=1e-3, final_learning_rate=5e-4,
        noise_std=1e-4, momentum_loss_weight=0.1,
        output_dir=out_dir, save_every=2, neighbor_query_tile=16,
    )
    train_ds = SequenceDataset(str(train_dir), 5, meta)
    val_ds = SequenceDataset(str(val_dir), 5, meta)
    trainer = Trainer(model_config, stats, tc, len(train_ds) // 2)
    trainer.fit(train_ds, val_ds, verbose=False)

    h = trainer.history
    assert h["train_loss"][-1] < h["train_loss"][0]
    assert all(np.isfinite(v) for v in h["val_loss"])
    # Artifacts (train.py:329-387 parity).
    assert os.path.isdir(os.path.join(out_dir, "model_best"))
    assert os.path.isdir(os.path.join(out_dir, "model_final"))
    assert os.path.isdir(os.path.join(out_dir, "model_epoch_1"))
    with open(os.path.join(out_dir, "training_history.json")) as f:
        saved = json.load(f)
    assert saved["best_epoch"] >= 0
    assert len(saved["learning_rates"]) == 3

    # Checkpoint carries config and params restore identically.
    restored = ckpt_lib.load_checkpoint(os.path.join(out_dir, "model_final"))
    assert restored["config"]["model"]["latent_size"] == 16
    for a, b in zip(
        jax.tree.leaves(restored["params"]), jax.tree.leaves(trainer.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
