"""Proxy-decompose the config-4 cell-block plan builds (fwd 249 ms /
with-reverse 1149 ms after the round-3 binning fix): measure standalone
proxies of each suspected hot op on the real chip so the next optimization
targets the true bottleneck.

Proxies (config-4 shapes: N=500k, k=32, G=29, CC=768, QB=192, W=384):
  * aux16m:   the [N*k]=16M elementwise gather  aux[neighbors]
  * nbr_sort: the [N, k] row-permutation  nbr_aux[order]
  * slotrows: the [num_slots, k] row gather  nbr_aux[particle_of_slot]
  * revrows:  the reverse build's [T*9W, k+1] row gather (11.6M rows of a
              minor-dim-33 table)
  * revdot:   the reverse build's batched one-hot dot_general
  * sort2:    the second full sort (sort_key_val(order, slot_of_sorted))

Run from /root/repo (TPU): python benchmarks/probe_cb_parts_r3.py
Writes benchmarks/results/cb_parts_r3.json.
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

N, K = 500_000, 32
G, CC, QB, W_CAP = 29, 768, 192, 384
NUM_COLS = G * G
NUM_SLOTS = NUM_COLS * CC  # 645,888
TPC = CC // QB
NUM_TILES = NUM_COLS * TPC
REPS = 3


def timed(f, *args):
    out = f(*args, jnp.float32(0.0))
    jax.block_until_ready(out)
    best = float("inf")
    for rep in range(REPS):
        t0 = time.perf_counter()
        out = f(*args, jnp.float32((rep + 1) * 1e-6))
        float(jnp.asarray(out).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    results = {}

    aux = jnp.asarray(rng.integers(0, NUM_SLOTS * G, N + 1), jnp.int32)
    neighbors = jnp.asarray(rng.integers(0, N, (N, K)), jnp.int32)
    order = jnp.asarray(rng.permutation(N), jnp.int32)
    pos = jnp.asarray(rng.integers(0, NUM_SLOTS, N), jnp.int32)

    @jax.jit
    def aux16m(aux, nb, eps):
        a = aux + eps.astype(jnp.int32)
        return jnp.sum(jnp.take(a, nb.reshape(-1), mode="clip")[::4097])

    results["aux16m_ms"] = round(timed(aux16m, aux, neighbors), 1)
    print("aux16m:", results["aux16m_ms"], flush=True)

    nbr_aux = jnp.asarray(
        rng.integers(0, NUM_SLOTS * G, (N, K)), jnp.int32
    )

    @jax.jit
    def nbr_sort(na, order, eps):
        a = na + eps.astype(jnp.int32)
        return jnp.sum(jnp.take(a, order, axis=0)[::4097, 0])

    results["nbr_rowperm_ms"] = round(timed(nbr_sort, nbr_aux, order), 1)
    print("nbr_rowperm:", results["nbr_rowperm_ms"], flush=True)

    particle_of_slot = jnp.asarray(
        rng.integers(0, N, NUM_SLOTS), jnp.int32
    )

    @jax.jit
    def slotrows(na, pos_, eps):
        a = na + eps.astype(jnp.int32)
        return jnp.sum(jnp.take(a, pos_, axis=0, mode="clip")[::4097, 0])

    results["slotrows_ms"] = round(timed(slotrows, nbr_aux, particle_of_slot), 1)
    print("slotrows:", results["slotrows_ms"], flush=True)

    num_padded = NUM_COLS * (CC + 2 * 64)
    packed_pad = jnp.asarray(
        rng.integers(0, NUM_SLOTS, (num_padded + 1, K + 1)), jnp.int32
    )
    rows = jnp.asarray(
        rng.integers(0, num_padded, (NUM_TILES, 9 * W_CAP)), jnp.int32
    )

    @jax.jit
    def revrows(pp, rows_, eps):
        a = pp + eps.astype(jnp.int32)
        win = jnp.take(a, rows_.reshape(-1), axis=0, mode="clip")
        return jnp.sum(win[::8191, 0])

    results["revrows_ms"] = round(timed(revrows, packed_pad, rows), 1)
    print("revrows:", results["revrows_ms"], flush=True)

    # Reverse one-hot contract proxy: chunked as in _build_reverse_table
    # (T_chunk tiles x [9W, k] senders one-hot-matched to QB query rows).
    f2 = max(d for d in range(1, 17) if QB % d == 0)
    f1 = QB // f2
    t_chunk = 16
    local = jnp.asarray(
        rng.integers(-QB, 2 * QB, (t_chunk, 9 * W_CAP, K)), jnp.int32
    )

    @jax.jit
    def revdot(local_, eps):
        lo = local_ + eps.astype(jnp.int32)
        valid = (lo >= 0) & (lo < QB)
        oh_hi = (
            jnp.clip(lo // f2, 0, f1 - 1)[..., None]
            == jnp.arange(f1, dtype=jnp.int32)
        ).astype(jnp.bfloat16) * jnp.where(
            valid[..., None], 1.0, 0.0
        ).astype(jnp.bfloat16)
        oh_lo = (
            (lo % f2)[..., None] == jnp.arange(f2, dtype=jnp.int32)
        ).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            oh_hi, oh_lo,
            dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(s[::7, ::11, 0, 0])

    per_chunk = timed(revdot, local)
    chunks = NUM_TILES / t_chunk
    results["revdot_chunk_ms"] = round(per_chunk, 1)
    results["revdot_total_est_ms"] = round(per_chunk * chunks, 1)
    print(f"revdot: {per_chunk:.1f} ms/chunk x {chunks:.0f} chunks "
          f"= {per_chunk * chunks:.0f} ms est", flush=True)

    keys = jnp.asarray(rng.permutation(N), jnp.int32)
    vals = jnp.asarray(rng.integers(0, NUM_SLOTS, N), jnp.int32)

    @jax.jit
    def sort2(k_, v_, eps):
        kk = k_ + eps.astype(jnp.int32)
        _, out = jax.lax.sort_key_val(kk, v_)
        return jnp.sum(out[::4097])

    results["sort2_ms"] = round(timed(sort2, keys, vals), 1)
    print("sort2:", results["sort2_ms"], flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/cb_parts_r3.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote benchmarks/results/cb_parts_r3.json", flush=True)


if __name__ == "__main__":
    main()
