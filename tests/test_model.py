import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    EncodeProcessDecodeConfig,
    apply_encode_process_decode,
    init_encode_process_decode,
    reference_apply_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.models.mlp import apply_mlp, init_mlp
from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic
from cosmology_gnn_simulation_tpu.types import ParticleGraph


def make_graph(key, n=64, k=5, node_dim=17):
    pk, nk, ek = jax.random.split(key, 3)
    positions = jax.random.uniform(pk, (n, 3))
    neighbors = knn_periodic(positions, k, 1.0, query_tile=32)
    disp = jnp.take(positions, neighbors, axis=0) - positions[:, None, :]
    dist = jnp.linalg.norm(disp, axis=-1, keepdims=True)
    edges = jnp.concatenate([disp, dist], axis=-1)
    nodes = jax.random.normal(nk, (n, node_dim))
    return ParticleGraph(
        nodes=nodes, neighbors=neighbors, edges=edges, positions=positions
    )


def small_config(aggregate="sender_latents"):
    return EncodeProcessDecodeConfig(
        node_input_size=17,
        edge_input_size=4,
        latent_size=32,
        mlp_hidden_size=32,
        mlp_num_hidden_layers=2,
        num_message_passing_steps=3,
        output_size=3,
        aggregate=aggregate,
    )


def test_mlp_shapes_and_relu():
    params = init_mlp(jax.random.PRNGKey(0), 7, 16, 2, 5)
    x = jax.random.normal(jax.random.PRNGKey(1), (11, 7))
    y = apply_mlp(params, x)
    assert y.shape == (11, 5)
    # 2 hidden + 1 output linear layers
    assert len(params["layers"]) == 3
    assert params["layers"][0]["w"].shape == (7, 16)
    assert params["layers"][2]["w"].shape == (16, 5)


def test_mlp_layer_norm_output_stats():
    params = init_mlp(jax.random.PRNGKey(0), 7, 64, 2, 64, layer_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (9, 7)) * 10
    y = np.asarray(apply_mlp(params, x))
    np.testing.assert_allclose(y.mean(axis=-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=-1), 1.0, atol=2e-2)


@pytest.mark.parametrize("aggregate", ["sender_latents", "edge_messages"])
def test_optimized_matches_reference_apply(aggregate):
    """The matmul-then-gather / split-weight restructurings must agree with
    the direct concat implementation to float tolerance."""
    config = small_config(aggregate)
    params = init_encode_process_decode(jax.random.PRNGKey(0), config)
    graph = make_graph(jax.random.PRNGKey(1))
    fast = apply_encode_process_decode(params, graph, config)
    ref = reference_apply_encode_process_decode(params, graph, config)
    np.testing.assert_allclose(
        np.asarray(fast["acceleration"]),
        np.asarray(ref["acceleration"]),
        rtol=2e-4,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(fast["temp_rate"]),
        np.asarray(ref["temp_rate"]),
        rtol=2e-4,
        atol=2e-4,
    )


def test_output_shapes():
    config = small_config()
    params = init_encode_process_decode(jax.random.PRNGKey(0), config)
    graph = make_graph(jax.random.PRNGKey(1), n=50, k=4)
    out = apply_encode_process_decode(params, graph, config)
    assert out["acceleration"].shape == (50, 3)
    assert out["temp_rate"].shape == (50, 1)


def test_processor_params_not_shared_across_steps():
    config = small_config()
    params = init_encode_process_decode(jax.random.PRNGKey(0), config)
    stacked = params["processor"]["edge"]["layers"][0]["w"]
    assert stacked.shape[0] == config.num_message_passing_steps
    assert not np.allclose(np.asarray(stacked[0]), np.asarray(stacked[1]))


def test_sender_latent_aggregation_quirk():
    """The reference's dead-edge-stream quirk (SURVEY.md C11): under
    'sender_latents' aggregation, edge features cannot influence predictions
    (node latents never read edge latents; decoders read nodes only). Under
    canonical 'edge_messages' they must."""
    graph = make_graph(jax.random.PRNGKey(1))
    graph_zero_edges = graph._replace(edges=jnp.zeros_like(graph.edges))

    for prune in (True, False):
        config = small_config("sender_latents")._replace(
            prune_dead_edge_stream=prune
        )
        params = init_encode_process_decode(jax.random.PRNGKey(0), config)
        out1 = apply_encode_process_decode(params, graph, config)
        out2 = apply_encode_process_decode(params, graph_zero_edges, config)
        np.testing.assert_array_equal(
            np.asarray(out1["acceleration"]), np.asarray(out2["acceleration"])
        )

    config_gns = small_config("edge_messages")
    params = init_encode_process_decode(jax.random.PRNGKey(0), config_gns)
    out1 = apply_encode_process_decode(params, graph, config_gns)
    out2 = apply_encode_process_decode(params, graph_zero_edges, config_gns)
    assert not np.allclose(
        np.asarray(out1["acceleration"]), np.asarray(out2["acceleration"])
    )


def test_pruned_matches_unpruned():
    """Skipping the dead edge stream must not change outputs at all."""
    graph = make_graph(jax.random.PRNGKey(1))
    cfg_pruned = small_config("sender_latents")
    cfg_full = cfg_pruned._replace(prune_dead_edge_stream=False)
    params = init_encode_process_decode(jax.random.PRNGKey(0), cfg_pruned)
    out_p = apply_encode_process_decode(params, graph, cfg_pruned)
    out_f = apply_encode_process_decode(params, graph, cfg_full)
    np.testing.assert_allclose(
        np.asarray(out_p["acceleration"]),
        np.asarray(out_f["acceleration"]),
        rtol=1e-6,
        atol=1e-6,
    )


def test_gradients_flow():
    # Canonical GNS mode: every parameter must receive gradient.
    config = small_config("edge_messages")
    params = init_encode_process_decode(jax.random.PRNGKey(0), config)
    graph = make_graph(jax.random.PRNGKey(1))

    def loss(p, cfg):
        out = apply_encode_process_decode(p, graph, cfg)
        return jnp.mean(out["acceleration"] ** 2) + jnp.mean(out["temp_rate"] ** 2)

    grads = jax.grad(loss)(params, config)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert all(np.abs(np.asarray(g)).max() > 0 for g in leaves)

    # Reference-quirk mode: edge-stream params get exactly zero gradient
    # (identical to torch autograd on the reference's dataflow).
    config_ref = small_config("sender_latents")._replace(
        prune_dead_edge_stream=False
    )
    params_ref = init_encode_process_decode(jax.random.PRNGKey(0), config_ref)
    grads_ref = jax.grad(loss)(params_ref, config_ref)
    edge_grads = jax.tree.leaves(grads_ref["encoder"]["edge"]) + jax.tree.leaves(
        grads_ref["processor"]["edge"]
    )
    assert all(np.abs(np.asarray(g)).max() == 0 for g in edge_grads)
    node_grads = jax.tree.leaves(grads_ref["encoder"]["node"])
    assert all(np.abs(np.asarray(g)).max() > 0 for g in node_grads)


def test_bfloat16_compute_close_to_fp32():
    config = small_config()
    params = init_encode_process_decode(jax.random.PRNGKey(0), config)
    graph = make_graph(jax.random.PRNGKey(1))
    full = apply_encode_process_decode(params, graph, config)
    half = apply_encode_process_decode(params, graph, config, dtype=jnp.bfloat16)
    err = np.abs(
        np.asarray(full["acceleration"]) - np.asarray(half["acceleration"])
    ).max()
    scale = np.abs(np.asarray(full["acceleration"])).max()
    assert err < 0.1 * scale + 0.05


@pytest.mark.parametrize("aggregate", ["sender_latents", "edge_messages"])
def test_bfloat16_carry_close_to_fp32(aggregate):
    """The bf16 residual-stream carry (the bandwidth lever the matmul-only
    dtype cast misses) stays within bf16 rounding of the f32 stream."""
    config = small_config(aggregate)._replace(carry_dtype="bfloat16")
    params = init_encode_process_decode(jax.random.PRNGKey(0), config)
    graph = make_graph(jax.random.PRNGKey(1))
    full = apply_encode_process_decode(
        params, graph, config._replace(carry_dtype=None)
    )
    half = apply_encode_process_decode(params, graph, config)
    err = np.abs(
        np.asarray(full["acceleration"]) - np.asarray(half["acceleration"])
    ).max()
    scale = np.abs(np.asarray(full["acceleration"])).max()
    assert err < 0.1 * scale + 0.05
    # Gradients flow through the cast carry.
    def loss(p):
        out = apply_encode_process_decode(p, graph, config)
        return jnp.sum(out["acceleration"] ** 2)

    grads = jax.grad(loss)(params)
    assert all(
        bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads)
    )


def test_globals_broadcast():
    """Globals concat onto every node before encoding
    (graph_network.py:166-175 parity)."""
    g_dim = 4
    config = small_config()._replace(node_input_size=17 + g_dim)
    params = init_encode_process_decode(jax.random.PRNGKey(0), config)
    graph = make_graph(jax.random.PRNGKey(1))
    glob = jax.random.normal(jax.random.PRNGKey(2), (g_dim,))
    g_with = graph._replace(globals_=glob)
    out = apply_encode_process_decode(params, g_with, config)
    assert out["acceleration"].shape == (64, 3)
    # Equivalent to manual concat.
    manual = graph._replace(
        nodes=jnp.concatenate(
            [graph.nodes, jnp.broadcast_to(glob[None], (64, g_dim))], axis=-1
        )
    )
    out2 = apply_encode_process_decode(params, manual, config)
    np.testing.assert_allclose(
        np.asarray(out["acceleration"]), np.asarray(out2["acceleration"]),
        rtol=1e-6,
    )
    # Changing globals changes the output.
    out3 = apply_encode_process_decode(
        params, graph._replace(globals_=glob + 1.0), config
    )
    assert not np.allclose(
        np.asarray(out["acceleration"]), np.asarray(out3["acceleration"])
    )
    # Reference oracle agrees too.
    ref = reference_apply_encode_process_decode(params, g_with, config)
    np.testing.assert_allclose(
        np.asarray(out["acceleration"]), np.asarray(ref["acceleration"]),
        rtol=2e-4, atol=2e-4,
    )


def test_remat_gradients_match():
    """jax.checkpoint over the processor scan changes memory, not math."""
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        apply_encode_process_decode,
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.featurize import featurize
    from cosmology_gnn_simulation_tpu.types import NormalizationStats
    from cosmology_gnn_simulation_tpu.metadata import compute_metadata
    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )

    sim = generate_synthetic_simulation(num_snapshots=6, num_particles=64,
                                        seed=7)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    graph = featurize(
        jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]),
        stats, jax.random.PRNGKey(0), num_neighbors=4,
    )
    mc = default_model_config(latent_size=16, mlp_hidden_size=16,
                              num_message_passing_steps=3)
    mc_r = mc._replace(remat=True)
    params = init_encode_process_decode(jax.random.PRNGKey(0), mc)

    def loss(p, cfg):
        out = apply_encode_process_decode(p, graph, cfg)
        return jnp.sum(out["acceleration"] ** 2) + jnp.sum(
            out["temp_rate"] ** 2
        )

    g0 = jax.grad(loss)(params, mc)
    g1 = jax.grad(loss)(params, mc_r)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        g0, g1,
    )


def test_remat_chunk_gradients_match():
    """Hierarchical (two-level) remat changes memory scheduling, not math;
    covers both the pruned and the unpruned processor scans."""
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        apply_encode_process_decode,
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.featurize import featurize
    from cosmology_gnn_simulation_tpu.types import NormalizationStats
    from cosmology_gnn_simulation_tpu.metadata import compute_metadata
    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )

    sim = generate_synthetic_simulation(num_snapshots=6, num_particles=64,
                                        seed=8)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    graph = featurize(
        jnp.asarray(sim["Coordinates"][:5]),
        jnp.asarray(sim["InternalEnergy"][:5]),
        stats, jax.random.PRNGKey(0), num_neighbors=4,
    )
    mc = default_model_config(latent_size=16, mlp_hidden_size=16,
                              num_message_passing_steps=4)

    def loss(p, cfg):
        out = apply_encode_process_decode(p, graph, cfg)
        return jnp.sum(out["acceleration"] ** 2) + jnp.sum(
            out["temp_rate"] ** 2
        )

    for base in (mc, mc._replace(prune_dead_edge_stream=False)):
        params = init_encode_process_decode(jax.random.PRNGKey(1), base)
        g0 = jax.grad(loss)(params, base)
        g1 = jax.grad(loss)(params, base._replace(remat_chunk=2))
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            g0, g1,
        )

    with pytest.raises(ValueError, match="remat_chunk"):
        apply_encode_process_decode(
            init_encode_process_decode(jax.random.PRNGKey(1), mc),
            graph, mc._replace(remat_chunk=3),
        )
