"""Round 4: DENSE-QUERY kNN select prototype — the 'query compaction +
per-query-block shared windows' structural idea from the round-3 headroom
list, measured before any production integration.

The production select kernel processes each cell's queries on CAPACITY rows
([cap=24, 27*cap+spill lanes] at the flagship spec) — mean occupancy 9.6
means ~60% of its per-pick VPU work runs on empty rows, and the 27-cell
candidate lanes carry their own capacity padding. This prototype:

  * bins queries once by (column, z-cell) — the cell-block plan's exact key;
  * packs each xy-column's particles DENSELY (plus z-wrap copies with
    pre-shifted z, exactly the plan's padded-column layout) into a
    lane-major [8*num_cols, CCP] coordinate table (sublanes = x/y/z fields);
  * tiles queries QB (=16) dense sorted rows at a time — no empty rows
    beyond each column's final partial tile;
  * per tile fetches its 9 neighbor columns' FULL padded rows, compacts
    each to the tile's z-window [start(z_lo-1), end(z_hi+1)) with a
    DYNAMIC in-kernel lane roll (pltpu.roll — no Element-lane alignment
    constraint, unlike windowed block fetches), and selects over
    [QB, 9*W] with the production kernel's masked re-min;
  * empty padded rows carry coordinate 4*box: their distance to any
    in-box query exceeds box^2, far outside any certifiable margin, so no
    validity plane is needed (a pick of one fails the certificate loudly).

Exactness: the window is a SUPERSET of each query's 27-cell neighborhood
(extra same-column candidates only sharpen the result; z-wrap duplicates
sit >= (G-3)/G * box away and can only be picked on rows that already fail
the margin certificate). Window truncation (span > W) and column overflow
(cnt > CC) are counted and would gate the certificate in production.

Measures, same-process on TPU: correctness vs the production pallas
backend (neighbor SETS via decoded ids, modulo exact-distance ties), and
the in-scan marginal of the dense search vs the production codes-only
search at the flagship spec, sweeping (QB, W).

Run from /root/repo: python benchmarks/probe_denseknn_r4.py [--cpu]
Writes benchmarks/results/denseknn_r4.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.float32(1e30)
_LANE = 128


def _round_up(x, m):
    return -(-x // m) * m


def dense_knn_codes(positions, k, box, g, CC, wrap, QB, W, interpret=False):
    """Prototype dense-query exact kNN. Returns (codes info dict) — all in
    SORTED order, plus the decode tables for correctness checks."""
    from cosmology_gnn_simulation_tpu.ops.binning import bucket_boundaries
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = positions.shape[0]
    num_cols = g * g
    CCP = _round_up(wrap + CC + wrap, _LANE)
    T = num_cols + -(-n // QB)  # hard bound on sum(ceil(min(cnt,CC)/QB))
    max_tiles_col = -(-CC // QB)
    fill = 4.0 * box

    inv_cell = g / box
    coords = jnp.clip(
        jnp.floor(positions * inv_cell).astype(jnp.int32), 0, g - 1
    )
    cell_id = (coords[:, 0] * g + coords[:, 1]) * g + coords[:, 2]
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_cell, order, sx, sy, sz = jax.lax.sort(
        (cell_id, iota, positions[:, 0], positions[:, 1], positions[:, 2]),
        num_keys=1, is_stable=True,
    )
    gstart = bucket_boundaries(sorted_cell, g**3)  # [g^3+1]
    col_start = gstart[::g]  # [num_cols+1]
    cnt = col_start[1:] - col_start[:-1]
    m = jnp.minimum(cnt, CC)
    sorted_col = sorted_cell // g
    sorted_cz = sorted_cell % g
    r_col = iota - jnp.take(col_start, sorted_col)
    r_cell = iota - jnp.take(gstart, sorted_cell)
    cnt_cell = (gstart[1:] - gstart[:-1]).reshape(num_cols, g)
    c_pre = jnp.minimum(cnt_cell[:, g - 1], wrap)
    c_app = jnp.minimum(cnt_cell[:, 0], wrap)
    overflow = jnp.sum(jnp.maximum(cnt - CC, 0))

    c_pre_i = jnp.take(c_pre, sorted_col)
    m_i = jnp.take(m, sorted_col)

    # ---- Lane-major padded coordinate table [8*num_cols, CCP]:
    # row 8*col + {0,1,2} = x,y,z; rows 3..7 unused (sublane-block floor).
    flat_sz = num_cols * CCP
    oob = flat_sz  # drop

    def put(tab, dst, val):
        return tab.at[dst].set(val, mode="drop")

    dst_main = jnp.where(
        r_col < CC, sorted_col * CCP + c_pre_i + r_col, oob
    )
    pre_m = (sorted_cz == g - 1) & (r_cell < wrap)
    dst_pre = jnp.where(pre_m, sorted_col * CCP + r_cell, oob)
    app_m = (sorted_cz == 0) & (r_cell < wrap) & (r_col < CC)
    dst_app = jnp.where(
        app_m, sorted_col * CCP + c_pre_i + m_i + r_cell, oob
    )
    tabs = []
    for vals, zshift in ((sx, 0.0), (sy, 0.0), (sz, 1.0)):
        t0 = jnp.full((flat_sz + 1,), fill, jnp.float32)
        t0 = put(t0, dst_main, vals)
        t0 = put(t0, dst_pre, vals - zshift * box)
        t0 = put(t0, dst_app, vals + zshift * box)
        tabs.append(t0[:flat_sz].reshape(num_cols, CCP))
    zero = jnp.zeros((num_cols, CCP), jnp.float32)
    tab = jnp.stack(
        [tabs[0], tabs[1], tabs[2], zero, zero, zero, zero, zero], axis=1
    ).reshape(num_cols * 8, CCP)

    # ---- Dense query tiles.
    tiles_per_col = -(-m // QB)  # ceil
    tile_ofs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(tiles_per_col).astype(jnp.int32)]
    )
    tile_col = jnp.zeros((T + 1,), jnp.int32)
    tile_row0 = jnp.zeros((T + 1,), jnp.int32)
    cols_iota = jnp.arange(num_cols, dtype=jnp.int32)
    for ti in range(max_tiles_col):
        sel = ti < tiles_per_col
        idx = jnp.where(sel, tile_ofs[:-1] + ti, T)
        tile_col = tile_col.at[idx].set(cols_iota, mode="drop")
        tile_row0 = tile_row0.at[idx].set(ti * QB, mode="drop")
    tile_col, tile_row0 = tile_col[:T], tile_row0[:T]
    t_used = tile_ofs[-1]
    t_iota = jnp.arange(T, dtype=jnp.int32)
    live = t_iota < t_used

    abs0 = jnp.take(col_start, tile_col) + tile_row0
    rows_t = jnp.clip(jnp.take(m, tile_col) - tile_row0, 0, QB)
    cz_ext = jnp.concatenate([sorted_cz, jnp.zeros((1,), jnp.int32)])
    z_lo = jnp.take(cz_ext, jnp.clip(abs0, 0, n), mode="clip")
    z_hi = jnp.take(
        cz_ext, jnp.clip(abs0 + jnp.maximum(rows_t, 1) - 1, 0, n),
        mode="clip",
    )
    z_lo = jnp.where(live & (rows_t > 0), z_lo, 0)
    z_hi = jnp.where(live & (rows_t > 0), z_hi, 0)

    # Queries in tile-dense order [T*QB, 8] (lanes 0..2 used), scatter-built.
    q_dst = jnp.where(
        r_col < CC,
        (jnp.take(tile_ofs, sorted_col) + r_col // QB) * QB + r_col % QB,
        T * QB,
    )
    qtab = jnp.zeros((T * QB + 1, 8), jnp.float32)
    qtab = qtab.at[q_dst].set(
        jnp.stack([sx, sy, sz] + [jnp.zeros_like(sx)] * 5, axis=1),
        mode="drop",
    )[: T * QB]
    qtab = jnp.pad(qtab, ((0, 0), (0, _LANE - 8)))

    # ---- Per-(tile, j) windows into the padded columns.
    gx = tile_col // g
    gy = tile_col % g
    dxy = jnp.arange(9, dtype=jnp.int32)
    dx = dxy[None, :] // 3 - 1
    dy = dxy[None, :] % 3 - 1
    cj = ((gx[:, None] + dx) % g) * g + (gy[:, None] + dy) % g  # [T, 9]
    sx_j = jnp.where(
        gx[:, None] + dx < 0, -1, jnp.where(gx[:, None] + dx >= g, 1, 0)
    )
    sy_j = jnp.where(
        gy[:, None] + dy < 0, -1, jnp.where(gy[:, None] + dy >= g, 1, 0)
    )
    cstart_rel = jnp.clip(
        gstart[: num_cols * g].reshape(num_cols, g)
        - col_start[:-1, None], 0, CC,
    ).astype(jnp.int32)
    cstart_ext = jnp.concatenate([cstart_rel, m[:, None]], axis=1)
    cp_j = jnp.take(c_pre, cj)
    m_j = jnp.take(m, cj)
    ca_j = jnp.take(c_app, cj)
    ce_flat = jnp.take(cstart_ext, cj.reshape(-1), axis=0).reshape(T, 9, g + 1)
    start_lo = jnp.take_along_axis(
        ce_flat,
        jnp.broadcast_to(jnp.clip(z_lo - 1, 0, g)[:, None, None], (T, 9, 1)),
        axis=2,
    )[..., 0]
    start = jnp.where(z_lo[:, None] >= 1, cp_j + start_lo, 0)
    end_hi = jnp.take_along_axis(
        ce_flat,
        jnp.broadcast_to(jnp.clip(z_hi + 2, 0, g)[:, None, None], (T, 9, 1)),
        axis=2,
    )[..., 0]
    end = jnp.where(z_hi[:, None] <= g - 2, cp_j + end_hi, cp_j + m_j + ca_j)
    w_loc = jnp.minimum(start, CCP - W)
    window_overflow = jnp.sum(
        jnp.where(live[:, None], jnp.maximum(end - start - W, 0), 0)
    )

    # ---- The dense select kernel.
    num_cand = 9 * W

    def kernel(cols_r, wloc_r, sxj_r, syj_r, lane0_r, box_r, q_ref, *refs):
        del lane0_r  # lane-index divisibility token, see tab_spec
        tab_refs = refs[:9]
        codes_ref, kth_ref = refs[9], refs[10]
        t = pl.program_id(0)
        bx = box_r[0]
        q = q_ref[...]
        qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        segs = []
        for j in range(9):
            w = tab_refs[j][...]  # [8, CCP]
            # Positive-shift form of roll(w, -wloc): lanes [wloc, wloc+W)
            # land at [0, W).
            w = pltpu.roll(w, CCP - wloc_r[t * 9 + j], 1)[:, :W]
            cx = w[0:1, :] + sxj_r[t * 9 + j].astype(jnp.float32) * bx
            cy = w[1:2, :] + syj_r[t * 9 + j].astype(jnp.float32) * bx
            cz = w[2:3, :]
            segs.append(
                (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
            )
        d2 = jnp.concatenate(segs, axis=1)  # [QB, 9W]

        codes = jnp.zeros((QB, _LANE), jnp.int32)
        cand_lane = jax.lax.broadcasted_iota(jnp.int32, (QB, num_cand), 1)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (QB, _LANE), 1)
        big_lane = jnp.int32(2**30)
        mm = jnp.full((QB, 1), -1.0, jnp.float32)
        lane_pick = jnp.full((QB, 1), -1, jnp.int32)
        for j in range(k):
            d2 = jnp.where(cand_lane == lane_pick, _BIG, d2)
            mm = jnp.min(d2, axis=1, keepdims=True)
            new_lane = jnp.min(
                jnp.where(d2 <= mm, cand_lane, big_lane),
                axis=1, keepdims=True,
            )
            lane_pick = jnp.where(mm < _BIG * 0.5, new_lane, num_cand)
            codes = jnp.where(out_lane == j, lane_pick, codes)
        codes_ref[0] = codes
        kth_ref[0] = mm[:, 0]

    q_spec = pl.BlockSpec((QB, _LANE), lambda t, c, w_, sx_, sy_, lz: (t, 0))

    def tab_spec(j):
        # The lane index is an opaque prefetched zero times CCP (a 128
        # multiple): Mosaic's window-param pass proves Element divisibility
        # only for mul-by-tile expressions — a literal 0 is rejected
        # ("couldn't prove that tiling (128) divides index").
        return pl.BlockSpec(
            (pl.Element(8), pl.Element(CCP)),
            lambda t, c, w_, sx_, sy_, lz, j=j: (
                c[t * 9 + j] * 8, lz[0] * CCP,
            ),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), q_spec]
        + [tab_spec(j) for j in range(9)],
        out_specs=[
            pl.BlockSpec(
                (1, QB, _LANE), lambda t, c, w_, sx_, sy_, lz: (t, 0, 0)
            ),
            pl.BlockSpec((1, QB), lambda t, c, w_, sx_, sy_, lz: (t, 0)),
        ],
    )
    lane0 = jnp.zeros((1,), jnp.int32)
    codes_t, kth_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, QB, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((T, QB), jnp.float32),
        ],
        interpret=interpret,
    )(cj.reshape(-1).astype(jnp.int32),
      w_loc.reshape(-1).astype(jnp.int32),
      sx_j.reshape(-1).astype(jnp.int32),
      sy_j.reshape(-1).astype(jnp.int32),
      lane0,
      jnp.asarray([box], jnp.float32),
      qtab,
      *([tab] * 9))

    return dict(
        codes=codes_t[..., :k], kth=kth_t, order=order,
        tile_col=tile_col, tile_row0=tile_row0, rows_t=rows_t,
        w_loc=w_loc, cj=cj, c_pre=c_pre, m=m, col_start=col_start,
        cstart_rel=cstart_rel, overflow=overflow,
        window_overflow=window_overflow, t_used=t_used, T=T, CCP=CCP,
    )


def decode_to_ids(res, k, g, CC, W, n):
    """codes (tile layout) -> neighbor particle ids per SORTED query row,
    as a numpy [n, k] array (only valid rows filled)."""
    codes = np.asarray(res["codes"])  # [T, QB, k]
    T, QB, _ = codes.shape
    order = np.asarray(res["order"])
    tile_col = np.asarray(res["tile_col"])
    tile_row0 = np.asarray(res["tile_row0"])
    rows_t = np.asarray(res["rows_t"])
    w_loc = np.asarray(res["w_loc"])
    cj = np.asarray(res["cj"])
    c_pre = np.asarray(res["c_pre"])
    m = np.asarray(res["m"])
    col_start = np.asarray(res["col_start"])
    cstart_rel = np.asarray(res["cstart_rel"])
    out = np.full((n, k), -1, np.int64)
    for t in range(int(res["t_used"])):
        for q in range(rows_t[t]):
            si = col_start[tile_col[t]] + tile_row0[t] + q
            ids = []
            for kk in range(k):
                lane = codes[t, q, kk]
                if lane >= 9 * W:
                    ids.append(-1)
                    continue
                j, wrow = lane // W, lane % W
                col = cj[t, j]
                p = w_loc[t, j] + wrow
                if p < c_pre[col]:
                    rank = cstart_rel[col, g - 1] + p
                elif p < c_pre[col] + m[col]:
                    rank = p - c_pre[col]
                else:
                    rank = p - c_pre[col] - m[col]
                ids.append(int(order[col_start[col] + rank]))
            out[si] = ids
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip_correctness", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic

    print("backend:", jax.default_backend(), flush=True)
    results = {}
    interpret = jax.default_backend() != "tpu"

    # ---- Correctness at small N vs brute force (sets, modulo exact ties).
    if not args.skip_correctness:
        n_small, k_small = 4096, 8
        rng = np.random.default_rng(3)
        pos = jnp.asarray(rng.random((n_small, 3), np.float32))
        grid = choose_cell_grid(n_small, k_small)
        g = grid.grid_size
        CC = _round_up(int(np.ceil(3.0 * n_small / (g * g))), 16)
        res = dense_knn_codes(
            pos, k_small, 1.0, g, CC, wrap=32, QB=16, W=96,
            interpret=interpret,
        )
        ids_sorted = decode_to_ids(res, k_small, g, CC, 96, n_small)
        order = np.asarray(res["order"])
        ref_ids = np.asarray(knn_periodic(pos, k_small, 1.0))
        mism = 0
        for si in range(n_small):
            mine = set(ids_sorted[si].tolist())
            want = set(ref_ids[order[si]].tolist())
            if mine != want:
                mism += 1
        results["correctness_n4096"] = {
            "mismatched_rows": mism,
            "overflow": int(res["overflow"]),
            "window_overflow": int(res["window_overflow"]),
            "t_used": int(res["t_used"]), "T": int(res["T"]),
        }
        print("correctness:", results["correctness_n4096"], flush=True)

    # ---- Flagship-spec timing sweep (TPU only; in-scan marginals).
    if jax.default_backend() == "tpu":
        from cosmology_gnn_simulation_tpu.featurize import (
            neighbor_search_certified,
        )

        N, K = 65536, 16
        grid = choose_cell_grid(N, K)
        g = grid.grid_size
        rng = np.random.default_rng(0)
        pos0 = jnp.asarray(rng.random((N, 3), np.float32))

        def scan_over(body, iters):
            @jax.jit
            def f(eps):
                def step(carry, _):
                    p = jnp.remainder(pos0 + carry * eps, 1.0)
                    return carry + 1.0, body(p)

                _, s = jax.lax.scan(step, 0.0, None, length=iters)
                return jnp.sum(s)

            return f

        def marg(body, k_s=6, k_l=22):
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

        def prod_search(p):
            _, codes, cap, spill, exact = neighbor_search_certified(
                p, K, 1.0, method="pallas", with_codes=True, codes_only=True
            )
            return jnp.sum(codes[:1].astype(jnp.float32))

        ms = marg(prod_search)
        results["production_search_ms"] = round(ms, 3)
        print("production search:", ms, flush=True)

        for QB, W in ((16, 96), (16, 128), (8, 80), (32, 128)):
            CC = 256

            def dense_body(p, QB=QB, W=W, CC=CC):
                res = dense_knn_codes(
                    p, K, 1.0, g, CC, wrap=32, QB=QB, W=W,
                    interpret=False,
                )
                return (
                    jnp.sum(res["codes"][:1, :1].astype(jnp.float32))
                    + res["kth"][0, 0]
                    + res["overflow"].astype(jnp.float32)
                    + res["window_overflow"].astype(jnp.float32)
                )

            try:
                ms = marg(dense_body)
                results[f"dense_QB{QB}_W{W}_ms"] = round(ms, 3)
                print(f"dense QB={QB} W={W}: {ms:.3f}", flush=True)
            except Exception as e:  # lowering/compile rejects
                results[f"dense_QB{QB}_W{W}_ms"] = f"FAILED: {e}"[:300]
                print(f"dense QB={QB} W={W} FAILED: {e}", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/denseknn_r4.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
