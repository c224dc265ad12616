"""Does the TPU XLA row-gather exploit index locality?

The config-4 (N=500k, k=32, H=256) bottleneck is the neighbor gather+sum:
~176 ms/MP-step with *random* indices (91 Mrows/s — latency-bound, nowhere
near the ~800 GB/s HBM peak). Before building a Pallas cell-block kernel,
measure whether XLA's gather already runs faster when indices are:

  random   — uniform over [0, N)                        (round-1 baseline)
  banded   — within +/- band of the query row (what cell-sorted particle
             order + remapped neighbor ids would give for free)
  monotone — sorted ascending with repeats (the slot-table expand gather
             the cell-block kernel design needs)

Timing per CLAUDE.md: perturbed inputs each call, scalar checksum forced to
host, min over repeats; the ~30 ms RPC floor is reported alongside.

Run: cd /root/repo && python benchmarks/profile_gather_locality.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 4


def bench(fn, *args):
    fn(*args, 0.0).block_until_ready()
    best = float("inf")
    for rep in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args, (rep + 1) * 1e-6))
        best = min(best, time.perf_counter() - t0)
    return best


@functools.partial(jax.jit, static_argnames=("steps",))
def gather_sum(z, nbr, eps, steps=8):
    # Same chunked gather+sum as the production model path (an unchunked
    # [N, k, H] intermediate is ~15 GB at these shapes).
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        _gather_sum,
    )

    def body(carry, _):
        out = _gather_sum(carry, nbr)
        return out[: z.shape[0]].astype(z.dtype) * 1e-4 + carry + eps, None

    final, _ = jax.lax.scan(body, z + eps, None, length=steps)
    return jnp.sum(final[:1, :8].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("steps",))
def expand_gather(z, idx, eps, steps=8):
    # Monotone slot-expand: out[s] = z[idx[s]] (idx ascending, with repeats).
    def body(carry, _):
        out = jnp.take(carry, idx, axis=0)
        return carry + out[: z.shape[0]] * 1e-4 + eps, None

    final, _ = jax.lax.scan(body, z + eps, None, length=steps)
    return jnp.sum(final[:1, :8].astype(jnp.float32))


def floor_time():
    @jax.jit
    def tiny(x, eps):
        return jnp.sum(x + eps)

    x = jnp.zeros((8,), jnp.float32)
    return bench(lambda x, eps: tiny(x, eps), x)


def main():
    n, k, h = 500_000, 32, 256
    steps = 8
    rng = np.random.default_rng(0)
    floor = floor_time()
    print(f"RPC floor: {floor*1e3:.1f} ms")

    nbr_random = rng.integers(0, n, size=(n, k), dtype=np.int32)
    # Banded: what cell-sorted order gives. Band = 3 x-planes at G=29:
    # +/- 1.5 * N/G ~= 26k rows.
    band = int(1.5 * n / 29)
    nbr_banded = (
        np.arange(n, dtype=np.int64)[:, None]
        + rng.integers(-band, band, size=(n, k))
    ) % n
    nbr_banded = nbr_banded.astype(np.int32)
    # Tight band: +/- one cell column (~N/G^2 * 3 ~ 1.7k rows).
    tight = int(1.5 * n / 29**2 * 3)
    nbr_tight = (
        np.arange(n, dtype=np.int64)[:, None]
        + rng.integers(-tight, tight, size=(n, k))
    ) % n
    nbr_tight = nbr_tight.astype(np.int32)
    # Monotone expand: 1.3M slots drawn ascending over [0, n).
    n_slots = 1_300_000
    idx_mono = np.sort(rng.integers(0, n, size=(n_slots,))).astype(np.int32)

    for dtype in (jnp.float32, jnp.bfloat16):
        z = jnp.asarray(rng.standard_normal((n, h)), dtype=dtype)
        name = dtype.__name__
        for label, nbr in (
            ("random", nbr_random),
            ("banded26k", nbr_banded),
            ("tight1.7k", nbr_tight),
        ):
            t = bench(
                lambda z, nb, eps: gather_sum(z, nb, eps, steps=steps),
                z,
                jnp.asarray(nbr),
            )
            per = (t - floor) / steps
            rows = n * k / per / 1e6
            gbs = n * k * h * z.dtype.itemsize / per / 1e9
            print(
                f"gather+sum {label:10s} {name}: {per*1e3:7.2f} ms/step "
                f"{rows:6.0f} Mrows/s {gbs:6.0f} GB/s"
            )
        t = bench(
            lambda z, ix, eps: expand_gather(z, ix, eps, steps=steps),
            z,
            jnp.asarray(idx_mono),
        )
        per = (t - floor) / steps
        rows = n_slots / per / 1e6
        gbs = n_slots * h * z.dtype.itemsize / per / 1e9
        print(
            f"expand monotone {name}: {per*1e3:7.2f} ms/step "
            f"{rows:6.0f} Mrows/s {gbs:6.0f} GB/s (1.3M slots)"
        )


if __name__ == "__main__":
    main()
