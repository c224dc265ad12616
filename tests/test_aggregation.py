"""Custom-VJP neighbor aggregation (sorted-edge, scatter-free backward):
forward equality, exact gradients vs autodiff of the native formulation,
duplicate-edge multiplicity, and end-to-end model-gradient agreement."""

import jax
import jax.numpy as jnp
import numpy as np

from cosmology_gnn_simulation_tpu.ops.aggregation import (
    aggregate_sender_latents,
    build_sorted_edges,
    gather_sender_rows,
)


def make_case(rng, n=120, k=7, h=5):
    z = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    neighbors = jnp.asarray(rng.integers(0, n, size=(n, k)).astype(np.int32))
    return z, neighbors


def test_forward_matches_native(rng):
    z, neighbors = make_case(rng)
    edges = build_sorted_edges(neighbors)
    out = aggregate_sender_latents(z, neighbors, edges)
    expected = jnp.take(z, neighbors, axis=0).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)
    rows = gather_sender_rows(z, neighbors, edges)
    np.testing.assert_allclose(
        np.asarray(rows), np.asarray(jnp.take(z, neighbors, axis=0)), rtol=1e-6
    )


def test_sorted_edges_structure(rng):
    _, neighbors = make_case(rng, n=40, k=4)
    edges = build_sorted_edges(neighbors)
    nb = np.asarray(neighbors)
    n, k = nb.shape
    order = np.asarray(edges.order)
    receivers = np.asarray(edges.receivers)
    boundaries = np.asarray(edges.boundaries)
    assert sorted(order.tolist()) == list(range(n * k))
    np.testing.assert_array_equal(receivers, order // k)
    senders_sorted = nb.reshape(-1)[order]
    assert (np.diff(senders_sorted) >= 0).all()
    for p in range(n):
        run = receivers[boundaries[p]: boundaries[p + 1]]
        # Receivers of p, WITH multiplicity (duplicate edges preserved).
        expected = sorted(
            [i for i in range(n) for j in range(k) if nb[i, j] == p]
        )
        assert sorted(run.tolist()) == expected, p


def test_gradient_matches_native_autodiff(rng):
    z, neighbors = make_case(rng)
    edges = build_sorted_edges(neighbors)
    cot = jnp.asarray(rng.normal(size=(120, 5)).astype(np.float32))

    def custom(z):
        return jnp.sum(aggregate_sender_latents(z, neighbors, edges) * cot)

    def native(z):
        return jnp.sum(jnp.take(z, neighbors, axis=0).sum(axis=1) * cot)

    g_custom = np.asarray(jax.grad(custom)(z))
    g_native = np.asarray(jax.grad(native)(z))
    # The prefix-difference backward carries ~ULP(prefix magnitude) rounding
    # (ops/aggregation.py docstring) — scale-aware bound, not bitwise.
    np.testing.assert_allclose(
        g_custom, g_native, rtol=1e-3, atol=1e-4 * np.abs(g_native).max()
    )


def test_gather_rows_gradient_matches_native(rng):
    z, neighbors = make_case(rng, n=90, k=6, h=8)
    edges = build_sorted_edges(neighbors)
    cot = jnp.asarray(rng.normal(size=(90, 6, 8)).astype(np.float32))

    def custom(z):
        return jnp.sum(gather_sender_rows(z, neighbors, edges) * cot)

    def native(z):
        return jnp.sum(jnp.take(z, neighbors, axis=0) * cot)

    gc = np.asarray(jax.grad(custom)(z))
    gn = np.asarray(jax.grad(native)(z))
    np.testing.assert_allclose(
        gc, gn, rtol=1e-3, atol=1e-4 * np.abs(gn).max()
    )


def test_duplicate_and_hub_edges_exact(rng):
    # Every particle lists particle 0 several times: in-degree(0) = n*k with
    # duplicates — the regime that overflowed the old capacity-bounded
    # reverse-adjacency design. The sorted-edge backward has no capacity.
    n, k, h = 30, 3, 4
    neighbors = jnp.zeros((n, k), jnp.int32)
    z = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    edges = build_sorted_edges(neighbors)
    cot = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))

    def custom(z):
        return jnp.sum(aggregate_sender_latents(z, neighbors, edges) * cot)

    def native(z):
        return jnp.sum(jnp.take(z, neighbors, axis=0).sum(axis=1) * cot)

    gc = np.asarray(jax.grad(custom)(z))
    gn = np.asarray(jax.grad(native)(z))
    np.testing.assert_allclose(
        gc, gn, rtol=1e-3, atol=1e-4 * np.abs(gn).max()
    )


def test_long_stream_precision_vs_float64(rng):
    """The chunked prefix sum must not accumulate rounding over a long edge
    stream: compare the float32 backward to a float64 numpy oracle."""
    n, k, h = 4096, 9, 3
    z = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    neighbors = jnp.asarray(rng.integers(0, n, size=(n, k)).astype(np.int32))
    edges = build_sorted_edges(neighbors)
    cot_np = rng.normal(size=(n, h)).astype(np.float32)
    cot = jnp.asarray(cot_np)

    g = jax.grad(
        lambda z: jnp.sum(aggregate_sender_latents(z, neighbors, edges) * cot)
    )(z)
    oracle = np.zeros((n, h), np.float64)
    nb = np.asarray(neighbors)
    for i in range(n):
        for j in range(k):
            oracle[nb[i, j]] += cot_np[i].astype(np.float64)
    scale = np.abs(oracle).max()
    np.testing.assert_allclose(
        np.asarray(g), oracle, rtol=1e-3, atol=1e-4 * scale
    )


def test_jit_and_vmap_compose(rng):
    z, neighbors = make_case(rng, n=64, k=5)
    edges = build_sorted_edges(neighbors)

    @jax.jit
    def f(z):
        return jax.grad(
            lambda z: jnp.sum(
                aggregate_sender_latents(z, neighbors, edges) ** 2
            )
        )(z)

    g = f(z)
    assert np.isfinite(np.asarray(g)).all()

    zb = jnp.stack([z, z + 1.0])
    nbrb = jnp.stack([neighbors, neighbors])

    @jax.jit
    def batched(zb, nbrb):
        def per(zz, nn):
            ee = build_sorted_edges(nn)
            return jax.grad(
                lambda z: jnp.sum(aggregate_sender_latents(z, nn, ee) ** 2)
            )(zz)

        return jax.vmap(per)(zb, nbrb)

    gb = batched(zb, nbrb)
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(g), rtol=1e-5)


def test_model_gradients_identical_with_sorted_edges(rng):
    """End-to-end: model param gradients with the custom-VJP path (sorted
    edges attached to the graph) must equal the native autodiff path — in
    both the pruned sender-latents mode and the unpruned/edge-messages modes
    (which also exercise gather_sender_rows)."""
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        apply_encode_process_decode,
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic
    from cosmology_gnn_simulation_tpu.types import ParticleGraph

    n, k = 80, 6
    positions = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    neighbors = knn_periodic(positions, k, 1.0, query_tile=32)
    disp = jnp.take(positions, neighbors, axis=0) - positions[:, None, :]
    edges = jnp.concatenate(
        [disp, jnp.linalg.norm(disp, axis=-1, keepdims=True)], axis=-1
    )
    nodes = jnp.asarray(rng.normal(size=(n, 17)).astype(np.float32))
    base = ParticleGraph(
        nodes=nodes, neighbors=neighbors, edges=edges, positions=positions
    )
    with_edges = base._replace(sorted_edges=build_sorted_edges(neighbors))

    for mode_kwargs in (
        {},  # pruned sender_latents (default)
        {"prune_dead_edge_stream": False},
        {"aggregate": "edge_messages"},
    ):
        config = default_model_config(
            window_size=5, latent_size=16, mlp_hidden_size=16,
            mlp_num_hidden_layers=1, num_message_passing_steps=3,
            **mode_kwargs,
        )
        params = init_encode_process_decode(jax.random.PRNGKey(0), config)

        def loss(p, g):
            out = apply_encode_process_decode(p, g, config)
            return (
                jnp.mean(out["acceleration"] ** 2)
                + jnp.mean(out["temp_rate"] ** 2)
            )

        g_native = jax.grad(loss)(params, base)
        g_custom = jax.grad(loss)(params, with_edges)
        for a, b in zip(jax.tree.leaves(g_native), jax.tree.leaves(g_custom)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-8)
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4 * scale)


def test_backward_h_tiled_matches_untiled(monkeypatch):
    """Big-stream H-tiling of the backward (slice-then-gather) is
    numerically identical to the untiled path."""
    import cosmology_gnn_simulation_tpu.ops.aggregation as agg

    rng = np.random.default_rng(11)
    n, k, h = 64, 4, 256
    nbr = jnp.asarray(rng.integers(0, n, size=(n, k)), jnp.int32)
    se = agg.build_sorted_edges(nbr)
    g = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    want = agg._tiled_gather_segment_sum(
        g, se.receivers, se.boundaries, jnp.float32
    )
    # Force the tiled path (limit below the stream size) — h_tile clamps to
    # the 128-lane floor, giving 2 tiles at h=256.
    monkeypatch.setattr(agg, "_BWD_STREAM_BYTES_LIMIT", 256)
    got = agg._tiled_gather_segment_sum(
        g, se.receivers, se.boundaries, jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6,
                               atol=1e-6)
