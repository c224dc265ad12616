"""Round-5 fused dense-query kNN (`build_cellblock(dense_search=...)`):
the search runs against the cell-block plan's own padded-column layout and
its output lanes rebase directly into S-table lanes. These tests pin:

  * exact neighbor sets — the S table's decoded sender multisets equal the
    brute-force k-NN sets on uniform random data (no distance ties);
  * the certificate components are clean on uniform data;
  * the dense-search rollout matches the gather rollout (same tolerances
    as the codes-path cell-block tests: window-order vs k-order f32 sums).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmology_gnn_simulation_tpu.ops.cellblock import (
    build_cellblock,
    choose_cellblock_spec,
    choose_dense_search_spec,
)
from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic

N, K = 2048, 8


@pytest.fixture(scope="module")
def dense_plan():
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.random((N, 3), np.float32))
    spec = choose_cellblock_spec(N, K)
    dspec = choose_dense_search_spec(N, spec)
    plan = build_cellblock(
        pos, None, 1.0, spec, dense_search=dspec, num_neighbors=K,
        interpret=True,
    )
    return pos, spec, plan


def _decode_neighbor_sets(spec, plan):
    """S table -> per-particle sender-id sets (numpy reference decode)."""
    order = np.asarray(plan.order)
    pos_of_slot = np.asarray(plan.particle_of_slot)
    pad_src = np.asarray(plan.pad_src)
    starts = np.asarray(plan.window_starts)  # [num_tiles, 9] flat rows
    s_table = np.asarray(plan.s_table)
    num_slots = spec.num_slots
    w = spec.window
    qb = spec.query_block
    n = order.shape[0]
    sets = {}
    for s in range(num_slots):
        if pos_of_slot[s] >= n:
            continue
        qid = order[pos_of_slot[s]]
        row = s_table[s]
        ids = []
        for lane in np.nonzero(row)[0]:
            j, off = divmod(lane, w)
            prow = starts[s // qb, j] + off
            src_slot = pad_src[prow]
            assert src_slot < num_slots, "S references an unused padded row"
            sidx = pos_of_slot[src_slot]
            assert sidx < n, "S references an empty slot"
            ids.extend([order[sidx]] * int(row[lane]))
        sets[int(qid)] = ids
    return sets


def test_dense_certificate_clean_on_uniform(dense_plan):
    _, _, plan = dense_plan
    assert int(plan.overflow) == 0
    assert int(plan.dropped_edges) == 0
    assert int(plan.search_window_overflow) == 0
    assert float(plan.search_excess) <= 0.0


def test_dense_neighbor_sets_match_bruteforce(dense_plan):
    pos, spec, plan = dense_plan
    ref = np.asarray(knn_periodic(pos, K, 1.0))
    sets = _decode_neighbor_sets(spec, plan)
    assert len(sets) == N
    mism = 0
    for qid, ids in sets.items():
        assert len(ids) == K, f"query {qid} has {len(ids)} senders"
        assert len(set(ids)) == K, f"query {qid} has duplicate senders"
        if set(ids) != set(ref[qid].tolist()):
            mism += 1
    assert mism == 0, f"{mism}/{N} rows differ from brute force"


def test_dense_reverse_table_is_exact_transpose(dense_plan):
    """with_reverse on the dense path: the sender packs are segment-decoded
    from the picks' absolute padded positions; reverse_mismatch == 0
    certifies S_rev == S^T edge-for-edge, and the custom-VJP backward
    through the dense plan matches the codes-path backward."""
    from cosmology_gnn_simulation_tpu.featurize import (
        neighbor_search_certified,
    )
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        cellblock_aggregate_slots,
        choose_dense_search_spec,
    )

    pos, spec, _ = dense_plan
    dspec = choose_dense_search_spec(N, spec)
    plan_d = build_cellblock(
        pos, None, 1.0, spec, dense_search=dspec, num_neighbors=K,
        with_reverse=True, interpret=True,
    )
    assert int(plan_d.reverse_mismatch) == 0
    assert int(plan_d.overflow) == 0 and int(plan_d.dropped_edges) == 0

    idx, _ = neighbor_search_certified(pos, K, 1.0, method="celllist")
    plan_c = build_cellblock(
        pos, idx, 1.0, spec, with_reverse=True, interpret=True,
    )
    assert int(plan_c.reverse_mismatch) == 0

    rng = np.random.default_rng(0)
    z = jnp.asarray(
        rng.normal(size=(spec.num_slots, 16)).astype(np.float32)
    )
    co = jnp.asarray(
        rng.normal(size=(spec.num_slots, 16)).astype(np.float32)
    )

    def agg(plan):
        def f(zz):
            out = cellblock_aggregate_slots(
                zz, plan, spec, carry_dtype=jnp.float32, interpret=True
            )
            return jnp.sum(out * co)

        return jax.grad(f)(z)

    # The plans sort identically (same key), so slot layouts agree; the
    # backward S^T @ co must match across the two build paths.
    np.testing.assert_allclose(
        np.asarray(agg(plan_d)), np.asarray(agg(plan_c)), rtol=0, atol=1e-5
    )


def test_dense_rollout_matches_gather():
    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )
    from cosmology_gnn_simulation_tpu.metadata import compute_metadata
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    n, k, steps = 4096, 4, 3
    sim = generate_synthetic_simulation(
        num_snapshots=8, num_particles=n, seed=3
    )
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    model_config = default_model_config(
        window_size=5, latent_size=16, mlp_hidden_size=16,
        mlp_num_hidden_layers=1, num_message_passing_steps=2,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    pos = jnp.asarray(sim["Coordinates"][:5])
    temp = jnp.asarray(sim["InternalEnergy"][:5])

    gather = rollout(
        params, model_config, pos, temp, stats, steps,
        num_neighbors=k, neighbor_query_tile=512,
    )
    dense = rollout(
        params, model_config, pos, temp, stats, steps,
        num_neighbors=k, aggregation="cellblock_hybrid",
        cellblock_search="dense",
    )
    assert dense["neighbor_exactness"].all()
    np.testing.assert_allclose(
        np.asarray(dense["Coordinates"]), np.asarray(gather["Coordinates"]),
        rtol=0, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(dense["Coordinates"][5]),
        np.asarray(gather["Coordinates"][5]),
        rtol=0, atol=1e-5,
    )


def test_dense_matches_codes_path_rollout():
    """Dense vs codes-path cell-block rollouts: same aggregation kernel,
    same windows — identical S tables up to distance-tie lane choices, so
    trajectories agree to f32 summation order."""
    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )
    from cosmology_gnn_simulation_tpu.metadata import compute_metadata
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    n, k, steps = 4096, 4, 2
    sim = generate_synthetic_simulation(
        num_snapshots=8, num_particles=n, seed=5
    )
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    model_config = default_model_config(
        window_size=5, latent_size=16, mlp_hidden_size=16,
        mlp_num_hidden_layers=1, num_message_passing_steps=2,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(1), model_config)
    pos = jnp.asarray(sim["Coordinates"][:5])
    temp = jnp.asarray(sim["InternalEnergy"][:5])

    codes = rollout(
        params, model_config, pos, temp, stats, steps,
        num_neighbors=k, aggregation="cellblock",
        cellblock_search="codes",
    )
    dense = rollout(
        params, model_config, pos, temp, stats, steps,
        num_neighbors=k, aggregation="cellblock",
        cellblock_search="dense",
    )
    assert dense["neighbor_exactness"].all()
    assert codes["neighbor_exactness"].all()
    np.testing.assert_allclose(
        np.asarray(dense["Coordinates"]), np.asarray(codes["Coordinates"]),
        rtol=0, atol=1e-5,
    )
