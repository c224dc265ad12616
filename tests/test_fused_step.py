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
