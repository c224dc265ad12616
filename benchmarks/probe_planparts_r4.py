"""Round 4: decompose the flagship plan build (build_cellblock, codes path)
into stages, in-scan, on real TPU — which of {binning/windows, codes gather,
s27 gather, const gather + pack + transpose, decode kernel, offsets
transpose + one-hot accumulate} actually costs the 6.4 ms?

Also a SAME-PROCESS A/B of the full hybrid rollout: fused decode kernel vs
the round-3 lax.map decode (process-to-process variance is ~0.5 ms, which
is the size of the effect in probe_fusedplan_r4).

Run from /root/repo on TPU: python benchmarks/probe_planparts_r4.py
Writes benchmarks/results/planparts_r4.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, K, WINDOW = 65536, 16, 5
SHORT, LONG = 10, 40


def main():
    from cosmology_gnn_simulation_tpu.featurize import (
        neighbor_search_certified,
    )
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.ops import cellblock as cb
    from cosmology_gnn_simulation_tpu.ops.binning import bucket_boundaries
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    print("backend:", jax.default_backend(), flush=True)
    results = {}
    rng = np.random.default_rng(0)
    spec = cb.choose_cellblock_spec(N, K)
    g = spec.grid_size
    cc, qb, w_cap, wrap = (spec.col_capacity, spec.query_block,
                           spec.window, spec.wrap_cap)
    tpc, ccp = spec.tiles_per_col, spec.padded_col
    num_cols, num_slots = spec.num_columns, spec.num_slots
    num_tiles = spec.num_tiles
    pos0 = jnp.asarray(rng.random((N, 3), np.float32))

    # Staged replica of build_cellblock's codes path (no spill — uniform).
    def plan_stage(pos, codes, cap, stage):
        n = pos.shape[0]
        k = codes.shape[1]
        inv_cell = g / jnp.asarray(1.0, pos.dtype)
        coords = jnp.clip(
            jnp.floor(pos * inv_cell).astype(jnp.int32), 0, g - 1
        )
        cell_id = (coords[:, 0] * g + coords[:, 1]) * g + coords[:, 2]
        sorted_cell, order = jax.lax.sort(
            (cell_id, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
            is_stable=True,
        )
        sorted_col = sorted_cell // g
        sorted_cz = sorted_cell % g
        gstart = bucket_boundaries(sorted_cell, g**3)
        col_start = gstart[::g]
        counts = (gstart[1:] - gstart[:-1]).reshape(num_cols, g)
        col_cnt = col_start[1:] - col_start[:-1]
        r = jnp.arange(n, dtype=jnp.int32) - jnp.take(col_start, sorted_col)
        q_ok = r < cc
        slot_of_sorted = jnp.where(q_ok, sorted_col * cc + r, num_slots)
        col_cnt_raw = col_start[1:] - col_start[:-1]
        slot_col = jnp.arange(num_slots, dtype=jnp.int32) // cc
        slot_r = jnp.arange(num_slots, dtype=jnp.int32) % cc
        particle_of_slot = jnp.where(
            slot_r < jnp.take(col_cnt_raw, slot_col),
            jnp.take(col_start[:-1], slot_col) + slot_r,
            n,
        )
        m = jnp.minimum(col_cnt, cc)
        cnt_last = counts[:, g - 1]
        cnt_first = counts[:, 0]
        c_pre = jnp.minimum(cnt_last, wrap)
        c_app = jnp.minimum(cnt_first, wrap)
        cstart_rel = jnp.clip(
            gstart[: num_cols * g].reshape(num_cols, g)
            - col_start[:-1, None], 0, cc,
        )
        cstart_ext = jnp.concatenate([cstart_rel, m[:, None]], axis=1)
        cstart_g1 = cstart_rel[:, g - 1]
        t_pad = jnp.arange(ccp, dtype=jnp.int32)[None, :]
        src_pre = cstart_g1[:, None] + t_pad
        src_main = t_pad - c_pre[:, None]
        src_app = t_pad - c_pre[:, None] - m[:, None]
        src = jnp.where(
            t_pad < c_pre[:, None], src_pre,
            jnp.where(
                t_pad < (c_pre + m)[:, None], src_main,
                jnp.where(t_pad < (c_pre + m + c_app)[:, None], src_app, cc),
            ),
        )
        cols = jnp.arange(num_cols, dtype=jnp.int32)[:, None]
        pad_src = jnp.where(src < cc, cols * cc + src, num_slots).reshape(-1)
        tile_col = jnp.arange(num_tiles, dtype=jnp.int32) // tpc
        tile_qt = jnp.arange(num_tiles, dtype=jnp.int32) % tpc
        a_row = tile_qt * qb
        m_tile = jnp.take(m, tile_col)
        has_rows = a_row < m_tile
        b_row = jnp.clip(
            jnp.minimum((tile_qt + 1) * qb, m_tile) - 1, a_row, None
        )
        base = jnp.take(col_start, tile_col)
        z_lo = jnp.take(sorted_cz, jnp.clip(base + a_row, 0, n - 1))
        z_hi = jnp.take(sorted_cz, jnp.clip(base + b_row, 0, n - 1))
        z_lo = jnp.where(has_rows, z_lo, 0)
        z_hi = jnp.where(has_rows, z_hi, 0)
        gx = tile_col // g
        gy = tile_col % g
        dxy = jnp.arange(9, dtype=jnp.int32)
        col_j = (
            ((gx[:, None] + dxy[None, :] // 3 - 1) % g) * g
            + (gy[:, None] + dxy[None, :] % 3 - 1) % g
        )
        cp_j = jnp.take(c_pre, col_j)
        m_j = jnp.take(m, col_j)
        ca_j = jnp.take(c_app, col_j)
        cg1_j = jnp.take(cstart_g1, col_j)
        start_lo = jnp.take_along_axis(
            jnp.take(cstart_ext, col_j.reshape(-1), axis=0).reshape(
                num_tiles, 9, g + 1
            ),
            jnp.broadcast_to(
                jnp.clip(z_lo - 1, 0, g)[:, None, None], (num_tiles, 9, 1)
            ),
            axis=2,
        )[..., 0]
        w_loc = jnp.where(z_lo[:, None] >= 1, cp_j + start_lo, 0)
        end_hi = jnp.take_along_axis(
            jnp.take(cstart_ext, col_j.reshape(-1), axis=0).reshape(
                num_tiles, 9, g + 1
            ),
            jnp.broadcast_to(
                jnp.clip(z_hi + 2, 0, g)[:, None, None], (num_tiles, 9, 1)
            ),
            axis=2,
        )[..., 0]
        end = jnp.where(
            z_hi[:, None] <= g - 2, cp_j + end_hi, cp_j + m_j + ca_j
        )
        w_loc = jnp.clip(w_loc // 16 * 16, 0, ccp - w_cap)
        window_starts = (col_j * ccp + w_loc).astype(jnp.int32)
        commons = (
            jnp.sum(window_starts[:1]).astype(jnp.float32)
            + pad_src[0].astype(jnp.float32)
            + slot_of_sorted[0].astype(jnp.float32)
            + particle_of_slot[0].astype(jnp.float32)
        )
        if stage == 0:
            return commons

        code_sentinel = 27 * cap
        codes_ext = jnp.concatenate(
            [codes.astype(jnp.int32),
             jnp.full((1, k), code_sentinel, jnp.int32)]
        )
        order_ext = jnp.concatenate([order, jnp.full((1,), n, jnp.int32)])
        orig_of_slot = jnp.take(order_ext, particle_of_slot, mode="clip")
        codes_slots = jnp.take(codes_ext, orig_of_slot, axis=0, mode="clip")
        if stage == 1:
            return commons + jnp.sum(codes_slots[:, :1]).astype(jnp.float32)

        cstart3 = cstart_rel.reshape(g, g, g)
        cstart27 = jnp.stack(
            [
                jnp.roll(cstart3, (-dx, -dy, -dz), axis=(0, 1, 2))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                for dz in (-1, 0, 1)
            ],
            axis=-1,
        ).reshape(g**3, 27)
        qz_slot = jnp.take(
            jnp.concatenate([sorted_cz, jnp.zeros((1,), jnp.int32)]),
            particle_of_slot, mode="clip",
        )
        slot_ids0 = jnp.arange(num_slots, dtype=jnp.int32)
        col_q_slot = slot_ids0 // cc
        s27_rows = jnp.take(cstart27, col_q_slot * g + qz_slot, axis=0)
        if stage == 2:
            return (
                commons
                + jnp.sum(codes_slots[:, :1]).astype(jnp.float32)
                + jnp.sum(s27_rows[:, :1]).astype(jnp.float32)
            )

        const = jnp.stack([w_loc, cp_j, m_j, ca_j, cg1_j], axis=2).astype(
            jnp.int32
        )
        const_rows = jnp.take(
            const.reshape(num_tiles, 45), slot_ids0 // qb, axis=0
        )
        invalid = 27 * cap + 9 * cc * g + 1
        codes2 = jnp.where(codes_slots >= 27 * cap, invalid, codes_slots)
        packed_aux = jnp.concatenate(
            [codes2, s27_rows, const_rows, qz_slot[:, None]], axis=1
        ).astype(jnp.int32)
        packed_t = packed_aux.T
        sub_pad = (-packed_t.shape[0]) % 8
        if sub_pad:
            packed_t = jnp.pad(packed_t, ((0, sub_pad), (0, 0)))
        if stage == 3:
            return commons + jnp.sum(packed_t[:, :1]).astype(jnp.float32)

        # stage 4: + decode kernel + transpose-back (dropped needs only the
        # offsets — XLA dead-codes the one-hot accumulate);
        # stage 5: full (+ _s_from_offsets accumulate).
        s_table, dropped = cb._s_from_codes_fused(
            packed_t, spec, k, cap, False
        )
        if stage == 4:
            return commons + dropped.astype(jnp.float32)
        return (
            commons
            + jnp.sum(s_table[:, :1].astype(jnp.int32)).astype(jnp.float32)
            + dropped.astype(jnp.float32)
        )

    # Pre-compute codes once OUTSIDE the timed bodies? No — codes must be
    # recomputed per scan step for realism; instead keep the search in
    # every body and difference against the search-only marginal.
    def scan_over(body, iters):
        @jax.jit
        def f(eps):
            def step(carry, _):
                pos = jnp.remainder(pos0 + carry * eps, 1.0)
                return carry + 1.0, body(pos)

            _, s = jax.lax.scan(step, 0.0, None, length=iters)
            return jnp.sum(s)

        return f

    def marg_body(body, k_s=6, k_l=22):
        f_s, f_l = scan_over(body, k_s), scan_over(body, k_l)

        def best_of(f):
            float(f(0.0).reshape(()))
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                float(f((rep + 1) * 1e-6).reshape(()))
                best = min(best, time.perf_counter() - t0)
            return best

        return (best_of(f_l) - best_of(f_s)) / (k_l - k_s) * 1e3

    def search_only(pos):
        _, codes, cap, spill, exact = neighbor_search_certified(
            pos, K, 1.0, method="pallas", with_codes=True, codes_only=True
        )
        return jnp.sum(codes[:1].astype(jnp.float32))

    base_ms = marg_body(search_only)
    results["search_ms"] = round(base_ms, 3)
    print("search:", base_ms, flush=True)

    for stage in (0, 1, 2, 3, 4, 5):
        def body(pos, stage=stage):
            _, codes, cap, spill, exact = neighbor_search_certified(
                pos, K, 1.0, method="pallas", with_codes=True,
                codes_only=True,
            )
            return plan_stage(pos, codes, cap, stage)

        ms = marg_body(body)
        results[f"stage{stage}_ms"] = round(ms - base_ms, 3)
        print(f"stage{stage}: {ms - base_ms:.3f}", flush=True)

    # ---- Same-process rollout A/B: fused kernel vs round-3 lax.map.
    model_config = default_model_config()
    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    base = rng.uniform(0, 1, (1, N, 3))
    drift = rng.normal(0, 5e-4, (WINDOW, N, 3)).cumsum(axis=0)
    positions = jnp.asarray(np.remainder(base + drift, 1.0), jnp.float32)
    temperatures = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (WINDOW, N, 1))), jnp.float32
    )

    @jax.jit
    def checksum(out):
        return (
            jnp.sum(out["Coordinates"][-1])
            + jnp.sum(out["InternalEnergy"][-1])
        )

    def run(steps, eps, **kw):
        out = rollout(
            params, model_config,
            jnp.remainder(positions + eps, 1.0), temperatures,
            stats, steps, num_neighbors=K, dtype=jnp.bfloat16, **kw,
        )
        return float(checksum(out))

    def measure(steps, **kw):
        run(steps, 0.0, **kw)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            run(steps, (rep + 1) * 1e-6, **kw)
            best = min(best, time.perf_counter() - t0)
        return best

    def marginal(tag, **kw):
        t_s = measure(SHORT, **kw)
        t_l = measure(LONG, **kw)
        per_step = (t_l - t_s) / (LONG - SHORT)
        results[tag] = {
            "ms_per_step": round(per_step * 1e3, 3),
            "psteps_per_s": round(N / per_step, 1),
        }
        print(tag, results[tag], flush=True)

    marginal("hybrid_fused", aggregation="cellblock_hybrid",
             s_build="kernel")
    marginal("hybrid_map", aggregation="cellblock_hybrid",
             s_build="kernel_map")

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/planparts_r4.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
