"""Golden parity: the JAX model vs an independent PyTorch implementation of
the reference's architecture semantics (written here from the behavioral
spec in SURVEY.md C9-C13, not copied from the reference):

* MLP = num_hidden_layers x (Linear -> ReLU) + final Linear, optional
  LayerNorm (graph_network.py:15-32,133-135);
* encoder: independent node/edge MLPs (:39-64);
* processor step: edge MLP on concat[x_src, x_dst, e]; aggregation =
  scatter-add of **sender node latents** x_j at receivers (PyG's default
  message, :92); node MLP on concat[x, agg]; additive residuals on both
  streams applied in the outer loop (:177-183);
* two decoder heads without LayerNorm (:151-152).

Weights are copied from the JAX pytree into the torch modules; outputs must
agree to float tolerance. This pins the whole numeric stack (weight layout,
LN epsilon, aggregation semantics, residual placement) against an
independent implementation in a different framework.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    EncodeProcessDecodeConfig,
    apply_encode_process_decode,
    init_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic
from cosmology_gnn_simulation_tpu.types import ParticleGraph


def torch_mlp(params, x, layer_norm):
    """Apply one of our MLP param subtrees with torch ops."""
    h = x
    layers = params["layers"]
    for layer in layers[:-1]:
        w = torch.from_numpy(np.asarray(layer["w"]))
        b = torch.from_numpy(np.asarray(layer["b"]))
        h = torch.relu(h @ w + b)
    w = torch.from_numpy(np.asarray(layers[-1]["w"]))
    b = torch.from_numpy(np.asarray(layers[-1]["b"]))
    h = h @ w + b
    if layer_norm:
        ln = params["ln"]
        h = torch.nn.functional.layer_norm(
            h,
            (h.shape[-1],),
            weight=torch.from_numpy(np.asarray(ln["scale"])),
            bias=torch.from_numpy(np.asarray(ln["bias"])),
            eps=1e-5,
        )
    return h


def torch_forward(params, config, nodes, edges, senders, receivers):
    """Reference-semantics Encode-Process-Decode in torch (edge list form)."""
    x = torch_mlp(params["encoder"]["node"], nodes, True)
    e = torch_mlp(params["encoder"]["edge"], edges, True)
    n = x.shape[0]
    for step in range(config.num_message_passing_steps):
        sp = jax.tree.map(lambda p: p[step], params["processor"])
        edge_in = torch.cat([x[senders], x[receivers], e], dim=-1)
        e_new = torch_mlp(sp["edge"], edge_in, True)
        # PyG default message: aggregate SENDER latents at receivers.
        agg = torch.zeros_like(x)
        agg.index_add_(0, receivers, x[senders])
        node_in = torch.cat([x, agg], dim=-1)
        x_new = torch_mlp(sp["node"], node_in, True)
        x = x + x_new
        e = e + e_new
    acc = torch_mlp(params["decoder_acc"], x, False)
    rate = torch_mlp(params["decoder_temp_rate"], x, False)
    return acc, rate


@pytest.mark.parametrize("mp_steps", [1, 4])
def test_jax_matches_independent_torch_implementation(mp_steps):
    rng = np.random.default_rng(0)
    n, k = 96, 6
    config = EncodeProcessDecodeConfig(
        node_input_size=17,
        edge_input_size=4,
        latent_size=24,
        mlp_hidden_size=24,
        mlp_num_hidden_layers=2,
        num_message_passing_steps=mp_steps,
        output_size=3,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(3), config)
    params = jax.tree.map(np.asarray, params)

    positions = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    neighbors = knn_periodic(positions, k, 1.0, query_tile=32)
    disp = jnp.take(positions, neighbors, axis=0) - positions[:, None, :]
    dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
    edges = jnp.concatenate([disp, dist], axis=-1)
    nodes = jnp.asarray(rng.normal(size=(n, 17)), jnp.float32)
    graph = ParticleGraph(
        nodes=nodes, neighbors=neighbors, edges=edges, positions=positions
    )

    jax_out = apply_encode_process_decode(params, graph, config)

    # Edge-list view of the regular graph: sender=neighbors[i,j], receiver=i.
    receivers = torch.from_numpy(
        np.repeat(np.arange(n), k).astype(np.int64)
    )
    senders = torch.from_numpy(np.asarray(neighbors).reshape(-1).astype(np.int64))
    torch_acc, torch_rate = torch_forward(
        params,
        config,
        torch.from_numpy(np.asarray(nodes)),
        torch.from_numpy(np.asarray(edges).reshape(n * k, 4)),
        senders,
        receivers,
    )

    np.testing.assert_allclose(
        np.asarray(jax_out["acceleration"]),
        torch_acc.numpy(),
        rtol=5e-4,
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jax_out["temp_rate"]),
        torch_rate.numpy(),
        rtol=5e-4,
        atol=5e-5,
    )
