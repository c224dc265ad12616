"""TPU micro-profile of aggregation-backward building blocks.

The round-1 train step at BASELINE config 2 (N=32k, k=16, H=128, 10 MP) is
dominated by the backward of the neighbor aggregation. Two exact strategies
exist (native XLA scatter-add transpose vs. reverse-adjacency gather+sum);
this script times the primitives each is built from so the round-2 kernel
work targets the true bottleneck:

  * scatter-add of [N*k, H] rows (the native gather transpose)
  * argsort of N*k int32 keys (sort cost floor)
  * [N, R] gather+sum at R in {k, 2k, 3k} (a reverse-table backward per step)
  * the sorted-edge build + 10-step prefix-difference backward chain
    (the shipped strategy, ops/aggregation.py)
  * forward [N, k] gather+sum (the floor)

Timing per CLAUDE.md: perturbed inputs per call, scalar checksum forced to
host, min over repeats; ~30 ms RPC floor applies to every row equally so the
marginal comparisons stand. Run: cd /root/repo && python
benchmarks/profile_backward_tpu.py
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

N, K, H = 32768, 16, 128
REPS = 5


def timeit(fn, *args):
    # Perturb every call (tunnel memoizes identical RPCs) and force the
    # scalar result to host (block_until_ready does not reliably block).
    float(fn(*args).reshape(()))
    best = float("inf")
    for rep in range(REPS):
        perturbed = [
            a + (rep + 1) * 1e-6 if jnp.issubdtype(a.dtype, jnp.floating)
            else a for a in args
        ]
        t0 = time.perf_counter()
        float(fn(*perturbed).reshape(()))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    nbr = jnp.asarray(
        rng.integers(0, N, size=(N, K)).astype(np.int32))
    edge_senders = nbr.reshape(-1)
    results = {}

    @jax.jit
    def fwd_gather_sum(z, nbr):
        return jnp.sum(jnp.take(z, nbr, axis=0).sum(axis=1))

    results["fwd_gather_sum"] = timeit(lambda z: fwd_gather_sum(z, nbr), g)

    @jax.jit
    def scatter_add(gg, senders):
        dz = jnp.zeros((N, H), jnp.float32)
        flat = jnp.repeat(gg, K, axis=0)  # cotangent per edge = g[receiver]
        return jnp.sum(dz.at[senders].add(flat))

    results["scatter_add_rows"] = timeit(
        lambda z: scatter_add(z, edge_senders), g)

    # The actual VJP XLA generates for take+sum:
    @jax.jit
    def native_vjp(z, gg):
        _, vjp = jax.vjp(lambda zz: jnp.take(zz, nbr, axis=0).sum(axis=1), z)
        return jnp.sum(vjp(gg)[0])

    results["native_take_sum_vjp"] = timeit(lambda z: native_vjp(z, g), g)

    @jax.jit
    def argsort_keys(senders):
        return jnp.sum(jnp.argsort(senders))

    results["argsort_Nk_int32"] = timeit(
        lambda z: argsort_keys(edge_senders + (z[0, 0] * 0).astype(jnp.int32)),
        g)

    from cosmology_gnn_simulation_tpu.ops.aggregation import (
        _segment_sum_sorted,
        build_sorted_edges,
    )

    @jax.jit
    def build_sorted(senders_nbr):
        e = build_sorted_edges(senders_nbr)
        return jnp.sum(e.order) + jnp.sum(e.boundaries)

    results["build_sorted_edges"] = timeit(lambda z: build_sorted(
        nbr + (z[0, 0] * 0).astype(jnp.int32)), g)

    sorted_edges = build_sorted_edges(nbr)

    @jax.jit
    def chain_sorted(z):
        def body(c, _):
            gath = jnp.take(c, sorted_edges.receivers, axis=0)
            return _segment_sum_sorted(
                gath, sorted_edges.boundaries, c.dtype), None
        out, _ = jax.lax.scan(body, z, None, length=10)
        return jnp.sum(out)

    results["chain10_sorted_bwd"] = timeit(chain_sorted, g)

    for r in (K, 2 * K, 3 * K):
        rev = jnp.asarray(
            rng.integers(0, N + 1, size=(N, r)).astype(np.int32))

        @jax.jit
        def rev_gather(gg, rv):
            padded = jnp.concatenate([gg, jnp.zeros_like(gg[:1])], axis=0)
            return jnp.sum(jnp.take(padded, rv, axis=0).sum(axis=1))

        results[f"rev_gather_R{r}"] = timeit(
            lambda z, rv=rev: rev_gather(z, rv), g)

    # 10-step chains: what the full backward would cost per strategy.
    @jax.jit
    def chain_native(z):
        def body(c, _):
            _, vjp = jax.vjp(
                lambda zz: jnp.take(zz, nbr, axis=0).sum(axis=1), c)
            return vjp(c)[0], None
        out, _ = jax.lax.scan(body, z, None, length=10)
        return jnp.sum(out)

    results["chain10_native_vjp"] = timeit(chain_native, g)

    rev48 = jnp.asarray(rng.integers(0, N + 1, size=(N, 48)).astype(np.int32))

    @jax.jit
    def chain_rev(z):
        def body(c, _):
            padded = jnp.concatenate([c, jnp.zeros_like(c[:1])], axis=0)
            return jnp.take(padded, rev48, axis=0).sum(axis=1), None
        out, _ = jax.lax.scan(body, z, None, length=10)
        return jnp.sum(out)

    results["chain10_rev_R48"] = timeit(chain_rev, g)

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()},
                     indent=2))


if __name__ == "__main__":
    main()
