"""Probe: can the cell-block REVERSE table be built by one big 2-D scatter?

The current reverse build (ops/cellblock.py::_build_reverse_table) re-reads
each tile's 9 candidate windows (an 11.6M-row gather of a minor-dim-33
table, ~360 ms standalone — benchmarks/results/cb_parts_r3.json) and
one-hot-matches senders on the MXU. But every edge's reverse coordinates
(sender slot, receiver's padded position in the sender tile's window) are
computable ARITHMETICALLY per edge during the forward S build; the table
could then be one scatter of E = N*k int8 ones.

CLAUDE.md: table scatters with unique indices are fast on this backend.
This probes the config-4 shape: 16M updates into a [645888, 3456] int8
table, 2-D indices (flat int32 would overflow at 2.23e9 entries).

Run from /root/repo (TPU): python benchmarks/probe_rev_scatter_r3.py
Writes benchmarks/results/rev_scatter_r3.json.
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

NUM_SLOTS = 645_888
S_WIDTH = 3456  # 9 * W(=384)
E = 16_000_000
REPS = 3


def timed(f, *args):
    out = f(*args, jnp.int32(0))
    jax.block_until_ready(out)
    best = float("inf")
    for rep in range(REPS):
        t0 = time.perf_counter()
        out = f(*args, jnp.int32(rep + 1))
        float(jnp.asarray(out).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    results = {}

    # Unique (row, col) pairs: sample rows ~uniform, cols distinct per
    # duplicate row occurrence is not guaranteed by this sampler, but the
    # true build's indices ARE unique (an edge (q, s) pins a unique
    # receiver image position); approximate with random pairs (collision
    # probability ~E/(rows*cols) ~ 0.7% — fine for timing).
    rows = jnp.asarray(rng.integers(0, NUM_SLOTS, E), jnp.int32)
    cols = jnp.asarray(rng.integers(0, S_WIDTH, E), jnp.int32)

    @jax.jit
    def scatter_set(rows_, cols_, eps):
        r = (rows_ + eps) % NUM_SLOTS
        tbl = jnp.zeros((NUM_SLOTS, S_WIDTH), jnp.int8)
        tbl = tbl.at[r, cols_].set(1, mode="drop", unique_indices=True)
        return jnp.sum(tbl[::4097, ::17].astype(jnp.int32))

    results["scatter2d_set_ms"] = round(timed(scatter_set, rows, cols), 1)
    print("scatter2d_set:", results["scatter2d_set_ms"], flush=True)

    @jax.jit
    def scatter_add(rows_, cols_, eps):
        r = (rows_ + eps) % NUM_SLOTS
        tbl = jnp.zeros((NUM_SLOTS, S_WIDTH), jnp.int8)
        tbl = tbl.at[r, cols_].add(1, mode="drop")
        return jnp.sum(tbl[::4097, ::17].astype(jnp.int32))

    results["scatter2d_add_ms"] = round(timed(scatter_add, rows, cols), 1)
    print("scatter2d_add:", results["scatter2d_add_ms"], flush=True)

    # Sorted-by-row variant (the build could emit edges in receiver-slot
    # order cheaply; does row-locality help scatters?)
    order = np.argsort(np.asarray(rows), kind="stable")
    rows_s = jnp.asarray(np.asarray(rows)[order])
    cols_s = jnp.asarray(np.asarray(cols)[order])
    results["scatter2d_set_rowsorted_ms"] = round(
        timed(scatter_set, rows_s, cols_s), 1
    )
    print("scatter2d_set_rowsorted:",
          results["scatter2d_set_rowsorted_ms"], flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/rev_scatter_r3.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote benchmarks/results/rev_scatter_r3.json", flush=True)


if __name__ == "__main__":
    main()
