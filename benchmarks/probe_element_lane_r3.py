"""Minimal repro matrix for the Mosaic 'tiling (128) divides index' reject
on Element-indexed windows (round 3, reverse-table kernel bring-up).

Variants (all: one [M, L] int32 table, window block [W, L] at dynamic
16-aligned row starts, copy-out kernel, grid (T,)):
  A: L=128, lane index = lz[0]*128 (opaque prefetched zero)
  B: L=128, lane index = 0 (literal)
  C: L=5,   lane index = 0 (attempt-2 shape that previously passed)
  D: L=128, lane index = 0, 2-D out block (W, L) per tile (row-stacked)

Run from /root/repo (TPU): python benchmarks/probe_element_lane_r3.py
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, W = 4, 32
M = 512


def run(name, lane, nsp, out3d):
    l_dim = lane
    tbl = jnp.asarray(
        np.random.default_rng(0).integers(0, 100, (M, l_dim)), jnp.int32
    )
    starts16 = jnp.asarray([0, 2, 4, 6], jnp.int32)
    lane0 = jnp.zeros((1,), jnp.int32)

    def kernel(*refs):
        win_ref, out_ref = refs[-2], refs[-1]
        if out3d:
            out_ref[0] = win_ref[...]
        else:
            out_ref[...] = win_ref[...]

    if nsp == 2:
        win_idx = lambda t, st, lz: (st[t] * 16, lz[0] * 128)
        out_idx3 = lambda t, st, lz: (t, 0, 0)
        out_idx2 = lambda t, st, lz: (t, 0)
        args = (starts16, lane0, tbl)
    else:
        win_idx = lambda t, st: (st[t] * 16, 0)
        out_idx3 = lambda t, st: (t, 0, 0)
        out_idx2 = lambda t, st: (t, 0)
        args = (starts16, tbl)

    if out3d:
        out_spec = pl.BlockSpec((1, W, l_dim), out_idx3)
        out_shape = jax.ShapeDtypeStruct((T, W, l_dim), jnp.int32)
    else:
        out_spec = pl.BlockSpec((W, l_dim), out_idx2)
        out_shape = jax.ShapeDtypeStruct((T * W, l_dim), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(W), pl.Element(l_dim)), win_idx
            )
        ],
        out_specs=out_spec,
    )
    try:
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=False,
        )(*args)
        got = np.asarray(out).reshape(T, W, l_dim)
        want = np.stack(
            [np.asarray(tbl)[s * 16 : s * 16 + W] for s in (0, 2, 4, 6)]
        )
        ok = np.array_equal(got, want)
        print(f"{name}: OK exec, correct={ok}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    run("A_L128_lzmul_out3d", 128, 2, True)
    run("B_L128_lit0_out3d", 128, 1, True)
    run("C_L5_lit0_out3d", 5, 1, True)
    run("D_L128_lit0_out2d", 128, 1, False)
    run("E_L128_lzmul_out2d", 128, 2, False)


if __name__ == "__main__":
    main()


def run2(name, rows, nwin, out_qb, out_dtype):
    """Closer replica of the reverse kernel: odd row count, 9 windows,
    3-D int8 out with small lane minor."""
    l_dim = 128
    w = 128
    t_grid = 4
    sw = nwin * w
    tbl = jnp.asarray(
        np.random.default_rng(0).integers(0, 100, (rows, l_dim)), jnp.int32
    )
    starts16 = jnp.asarray(
        np.random.default_rng(1).integers(0, (rows - w) // 16, t_grid * nwin),
        jnp.int32,
    )
    lane0 = jnp.zeros((1,), jnp.int32)

    def kernel(st_ref, lz_ref, *refs):
        wins, out_ref = refs[:nwin], refs[nwin]
        t = pl.program_id(0)
        for j in range(nwin):
            acc = jnp.zeros((w, out_qb), jnp.int32)
            v = wins[j][:, 3:4]
            acc = acc + (
                v == jax.lax.broadcasted_iota(jnp.int32, (w, out_qb), 1)
            ).astype(jnp.int32)
            out_ref[0, j * w : (j + 1) * w, :] = acc.astype(out_dtype)

    def win_spec(j):
        return pl.BlockSpec(
            (pl.Element(w), pl.Element(l_dim)),
            lambda t, st, lz, j=j: (st[t * nwin + j] * 16, lz[0] * 128),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_grid,),
        in_specs=[win_spec(j) for j in range(nwin)],
        out_specs=pl.BlockSpec((1, sw, out_qb), lambda t, st, lz: (t, 0, 0)),
    )
    try:
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t_grid, sw, out_qb), out_dtype),
            interpret=False,
        )(starts16, lane0, *([tbl] * nwin))
        s = int(np.asarray(out).astype(np.int64).sum())
        print(f"{name}: OK exec, checksum={s}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def main2():
    print("backend:", jax.default_backend(), flush=True)
    run2("F_rows512_9win_qb32_i8", 512, 9, 32, jnp.int8)
    run2("G_rows9217_9win_qb32_i8", 9217, 9, 32, jnp.int8)
    run2("H_rows9217_1win_qb32_i8", 9217, 1, 32, jnp.int8)
    run2("I_rows9216_9win_qb32_i8", 9216, 9, 32, jnp.int8)


if __name__ == "__main__":
    pass
