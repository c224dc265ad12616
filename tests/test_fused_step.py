"""Fused step-tail kernel (ops/fused_step.py) vs. the unfused oracle.

The kernel computes x + LN(node_mlp(relu(x @ w_self + agg + b0))) in one
Pallas pass; these tests pin it (interpret mode on CPU) against the
plain-XLA composition and against the full model forward with
``fused_tail`` off/on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    EncodeProcessDecodeConfig,
    apply_encode_process_decode,
    init_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.models.mlp import (
    apply_mlp,
    init_mlp,
    layer_norm,
)
from cosmology_gnn_simulation_tpu.ops.fused_step import fused_step_tail

from tests.test_model import make_graph, small_config


def _oracle(x, agg, node_params, dtype):
    latent = x.shape[-1]
    w = node_params["layers"][0]["w"]
    w_self = w[:latent]
    xm = x.astype(dtype) if dtype is not None else x
    h = jnp.dot(
        xm, w_self.astype(xm.dtype), preferred_element_type=jnp.float32
    )
    h = jax.nn.relu(h + agg.astype(jnp.float32) + node_params["layers"][0]["b"])
    for layer in node_params["layers"][1:-1]:
        hm = h.astype(dtype) if dtype is not None else h
        h = jax.nn.relu(
            jnp.dot(hm, layer["w"].astype(hm.dtype),
                    preferred_element_type=jnp.float32) + layer["b"]
        )
    hm = h.astype(dtype) if dtype is not None else h
    y = jnp.dot(
        hm, node_params["layers"][-1]["w"].astype(hm.dtype),
        preferred_element_type=jnp.float32,
    ) + node_params["layers"][-1]["b"]
    y = layer_norm(y, node_params["ln"])
    return (x.astype(jnp.float32) + y).astype(x.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("n", [64, 130])  # 130: non-multiple of row_block
def test_kernel_matches_oracle(dtype, n):
    latent = 32
    key = jax.random.PRNGKey(0)
    node_params = init_mlp(key, 2 * latent, latent, 2, latent, layer_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, latent))
    agg = jax.random.normal(jax.random.PRNGKey(2), (n, latent))
    got = fused_step_tail(x, agg, node_params, dtype=dtype, row_block=64)
    want = _oracle(x, agg, node_params, dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_bf16_carry():
    latent = 32
    node_params = init_mlp(
        jax.random.PRNGKey(0), 2 * latent, latent, 2, latent, layer_norm=True
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (96, latent)).astype(
        jnp.bfloat16
    )
    agg = jax.random.normal(jax.random.PRNGKey(2), (96, latent)).astype(
        jnp.bfloat16
    )
    got = fused_step_tail(x, agg, node_params, dtype=jnp.bfloat16,
                          row_block=32)
    assert got.dtype == jnp.bfloat16
    want = _oracle(x, agg, node_params, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_model_forward_fused_matches_unfused(dtype):
    graph = make_graph(jax.random.PRNGKey(3), n=96, k=6)
    config = small_config()
    params = init_encode_process_decode(jax.random.PRNGKey(4), config)
    base = apply_encode_process_decode(params, graph, config, dtype=dtype)
    fused = apply_encode_process_decode(
        params, graph, config._replace(fused_tail=True), dtype=dtype
    )
    tol = 1e-5 if dtype is None else 3e-2
    for k in base:
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(fused[k]), rtol=tol, atol=tol
        )


def test_fused_requires_pruned_mode():
    graph = make_graph(jax.random.PRNGKey(3), n=32, k=4)
    config = small_config(aggregate="edge_messages")._replace(fused_tail=True)
    params = init_encode_process_decode(jax.random.PRNGKey(4), config)
    with pytest.raises(ValueError, match="fused_tail"):
        apply_encode_process_decode(params, graph, config)


@pytest.mark.parametrize("n", [64, 130])  # 130: non-multiple of row_block
def test_grad_matches_oracle(n):
    """The fused recompute-backward kernel (round 4) against jax.grad of
    the unfused oracle — every input and every node-MLP/LN parameter."""
    latent = 32
    node_params = init_mlp(
        jax.random.PRNGKey(0), 2 * latent, latent, 2, latent, layer_norm=True
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (n, latent))
    agg = jax.random.normal(jax.random.PRNGKey(2), (n, latent))
    cot = jax.random.normal(jax.random.PRNGKey(3), (n, latent))

    def fused_loss(x, agg, p):
        return jnp.sum(
            fused_step_tail(x, agg, p, dtype=jnp.float32, row_block=64) * cot
        )

    def oracle_loss(x, agg, p):
        return jnp.sum(_oracle(x, agg, p, jnp.float32) * cot)

    got = jax.grad(fused_loss, argnums=(0, 1, 2))(x, agg, node_params)
    want = jax.grad(oracle_loss, argnums=(0, 1, 2))(x, agg, node_params)
    # The oracle's first-layer w grad covers only the w_self half here
    # (the oracle slices w[:latent] like the kernel); compare leaf-wise.
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4
        )


def test_grad_bf16_close():
    latent = 32
    node_params = init_mlp(
        jax.random.PRNGKey(0), 2 * latent, latent, 2, latent, layer_norm=True
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (96, latent))
    agg = jax.random.normal(jax.random.PRNGKey(2), (96, latent))

    def fused_loss(x, agg, p):
        return jnp.sum(
            jnp.square(
                fused_step_tail(x, agg, p, dtype=jnp.bfloat16, row_block=32)
            )
        )

    def oracle_loss(x, agg, p):
        return jnp.sum(jnp.square(_oracle(x, agg, p, jnp.bfloat16)))

    got = jax.grad(fused_loss, argnums=(0, 1, 2))(x, agg, node_params)
    want = jax.grad(oracle_loss, argnums=(0, 1, 2))(x, agg, node_params)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        g = np.asarray(g, np.float32)
        w = np.asarray(w, np.float32)
        # Scale-aware atol: bf16 recompute vs saved-intermediate rounding
        # differ in the last bf16 ulp of O(|w|_max) accumulations, which a
        # fixed atol misreads as error on near-zero elements.
        np.testing.assert_allclose(
            g, w, rtol=5e-2, atol=5e-2 * max(1.0, float(np.abs(w).max())),
        )


def test_model_grad_fused_matches_unfused():
    """End-to-end: grads of the full model forward (encoder + scan over MP
    steps + decoders) agree between fused_tail on/off — including the
    w_agg half of the first node layer, whose gradient combines the
    caller's z-projection path with the kernel's w_self path."""
    graph = make_graph(jax.random.PRNGKey(3), n=96, k=6)
    config = small_config()
    params = init_encode_process_decode(jax.random.PRNGKey(4), config)

    def loss(p, cfg):
        out = apply_encode_process_decode(p, graph, cfg, dtype=None)
        return jnp.sum(jnp.square(out["acceleration"])) + jnp.sum(
            jnp.square(out["temp_rate"])
        )

    base = jax.grad(loss)(params, config)
    fused = jax.grad(loss)(params, config._replace(fused_tail=True))
    for g, w in zip(jax.tree.leaves(fused), jax.tree.leaves(base)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4
        )


def test_train_step_fused_matches_unfused():
    """One full train step (featurize + vmap + loss + adam update) with
    TrainConfig.fused_tail forced on vs off, CPU interpret mode."""
    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )
    from cosmology_gnn_simulation_tpu.metadata import compute_metadata
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig,
        default_model_config,
        make_optimizer,
        make_train_step,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    sim = generate_synthetic_simulation(num_snapshots=8, num_particles=128,
                                        seed=5)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    mc = default_model_config(latent_size=16, mlp_hidden_size=16,
                              num_message_passing_steps=2)
    params = init_encode_process_decode(jax.random.PRNGKey(2), mc)
    batch = {
        "positions": jnp.asarray(sim["Coordinates"][:5])[None],
        "temperatures": jnp.asarray(sim["InternalEnergy"][:5])[None],
        "target_positions": jnp.asarray(sim["Coordinates"][5])[None],
        "target_temperatures": jnp.asarray(sim["InternalEnergy"][5])[None],
    }
    key = jax.random.PRNGKey(7)
    results = {}
    for fused in (False, True):
        tc = TrainConfig(
            num_neighbors=4, noise_std=0.0, augment_prob=0.0,
            fused_tail=fused,
        )
        opt = make_optimizer(tc, steps_per_epoch=1)
        step = make_train_step(mc, stats, tc, opt)
        opt_state = opt.init(params)
        new_params, _, metrics = step(params, opt_state, batch, key)
        results[fused] = (new_params, metrics["loss"])
    np.testing.assert_allclose(
        np.asarray(results[True][1]), np.asarray(results[False][1]),
        rtol=1e-4, atol=1e-5,
    )
    for g, w in zip(
        jax.tree.leaves(results[True][0]), jax.tree.leaves(results[False][0])
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-3, atol=2e-5
        )


def test_rollout_fused_tail_matches(tmp_path):
    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )
    from cosmology_gnn_simulation_tpu.metadata import compute_metadata
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    sim = generate_synthetic_simulation(num_snapshots=6, num_particles=128,
                                        seed=11)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    mc = default_model_config(latent_size=16, mlp_hidden_size=16,
                              num_message_passing_steps=2)
    params = init_encode_process_decode(jax.random.PRNGKey(2), mc)
    kwargs = dict(num_neighbors=4, num_steps=3)
    base = rollout(
        params, mc, jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]), stats,
        fused_tail=False, **kwargs,
    )
    fused = rollout(
        params, mc, jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]), stats,
        fused_tail=True, **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(base["Coordinates"]), np.asarray(fused["Coordinates"]),
        rtol=1e-4, atol=1e-5,
    )
