"""Decompose the flagship rollout step (N=65,536, k=16, H=128, 10 MP) on
the real chip: where do the ~45 ms/step actually go?

Each component is measured by the marginal-scan method (scan the component
K_long vs K_short times inside one jit, difference the wall times): the
tunnel's ~30 ms RPC floor and the compile-time constant cancel. Components:

  * knn:        pallas cell-list kNN of perturbed positions
  * featurize:  node features + (no) edges from fixed neighbors
  * mp_unfused: one pruned processor step (z matmul + gather+sum + XLA tail)
  * mp_fused:   same with the fused step-tail kernel
  * gather:     the bf16 gather+sum alone
  * encdec:     encoder + both decoders
  * rollout marginal step with fused_tail on vs off (the end-to-end truth)

Run from /root/repo (TPU): python benchmarks/profile_flagship_r3.py
Writes benchmarks/results/flagship_decomp_r3.json.
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

N = 65536
K = 16
H = 128
REPS = 3


def marginal(make_fn, k_short=4, k_long=12):
    """make_fn(k) -> jitted fn(eps)->scalar; returns per-iteration seconds."""
    f_s, f_l = make_fn(k_short), make_fn(k_long)

    def best_of(f):
        float(f(0.0).reshape(()))
        best = float("inf")
        for rep in range(REPS):
            t0 = time.perf_counter()
            float(f((rep + 1) * 1e-6).reshape(()))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(f_l) - best_of(f_s)) / (k_long - k_short)


def main():
    from cosmology_gnn_simulation_tpu.featurize import featurize
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        _pruned_processor_step,
        apply_encode_process_decode,
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.models.mlp import apply_mlp
    from cosmology_gnn_simulation_tpu.ops.cell_list import choose_cell_grid
    from cosmology_gnn_simulation_tpu.ops.pallas_knn import pallas_cell_list_knn
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, N, 3))
    drift = rng.normal(0, 2e-4, (5, N, 3)).cumsum(axis=0)
    pos_seq = jnp.asarray(np.remainder(base + drift, 1.0).astype(np.float32))
    temp_seq = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (5, N, 1))).astype(np.float32))
    positions = pos_seq[-1]
    grid = choose_cell_grid(N, K)
    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )
    model_config = default_model_config()
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    nbr = jax.jit(lambda p: pallas_cell_list_knn(p, K, 1.0, grid))(positions)
    nbr = jax.block_until_ready(nbr)
    results = {}

    # --- kNN per call
    def make_knn(steps):
        @jax.jit
        def f(eps):
            def body(c, _):
                p = jnp.remainder(c + eps + 1e-7, 1.0)
                nb = pallas_cell_list_knn(p, K, 1.0, grid)
                return p, jnp.sum(nb[::4097, 0])
            _, outs = jax.lax.scan(body, positions, None, length=steps)
            return jnp.sum(outs).astype(jnp.float32).reshape(())
        return f

    results["knn_ms"] = marginal(make_knn) * 1e3
    print(f"knn: {results['knn_ms']:.2f} ms", flush=True)

    # --- featurize (no edges) per call
    def make_feat(steps):
        @jax.jit
        def f(eps):
            def body(c, _):
                pw = jnp.remainder(pos_seq + c * 1e-9 + eps, 1.0)
                g = featurize(
                    pw, temp_seq, stats, jax.random.PRNGKey(0),
                    noise_std=0.0, num_neighbors=K, neighbors=nbr,
                    build_edges=False,
                )
                return c + 1, jnp.sum(g.nodes[::4097, 0])
            _, outs = jax.lax.scan(body, 0.0, None, length=steps)
            return jnp.sum(outs).reshape(())
        return f

    results["featurize_ms"] = marginal(make_feat) * 1e3
    print(f"featurize: {results['featurize_ms']:.2f} ms", flush=True)

    # --- one message-passing step (scan over repeated single step params)
    step_params = jax.tree.map(lambda p: p[0], params["processor"])
    x0 = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))

    def make_mp(steps, fused):
        @jax.jit
        def f(eps):
            def body(c, _):
                out = _pruned_processor_step(
                    c + eps, nbr, step_params, jnp.bfloat16,
                    fused_tail=fused,
                )
                return (out if fused else c + out), None
            out, _ = jax.lax.scan(body, x0, None, length=steps)
            return jnp.sum(out[::4097]).reshape(())
        return f

    results["mp_unfused_ms"] = marginal(lambda s: make_mp(s, False)) * 1e3
    results["mp_fused_ms"] = marginal(lambda s: make_mp(s, True)) * 1e3
    print(f"mp step unfused: {results['mp_unfused_ms']:.2f} ms, "
          f"fused: {results['mp_fused_ms']:.2f} ms", flush=True)

    # --- bf16 gather+sum alone
    zb = x0.astype(jnp.bfloat16)

    def make_gather(steps):
        @jax.jit
        def f(eps):
            def body(c, _):
                agg = jnp.take(c, nbr, axis=0).sum(axis=1)
                return c + eps.astype(jnp.bfloat16) * agg[:, :1], jnp.sum(
                    agg[::4097, 0].astype(jnp.float32))
            _, outs = jax.lax.scan(body, zb, None, length=steps)
            return jnp.sum(outs).reshape(())
        return f

    results["gather_ms"] = marginal(make_gather) * 1e3
    print(f"gather+sum: {results['gather_ms']:.2f} ms", flush=True)

    # --- encoder + decoders
    nodes = jnp.asarray(rng.standard_normal((N, 17)).astype(np.float32))

    def make_encdec(steps):
        @jax.jit
        def f(eps):
            def body(c, _):
                x = apply_mlp(params["encoder"]["node"], nodes + c * 1e-9 + eps,
                              jnp.bfloat16)
                a = apply_mlp(params["decoder_acc"], x, jnp.bfloat16)
                t = apply_mlp(params["decoder_temp_rate"], x, jnp.bfloat16)
                return c + 1, jnp.sum(a[::4097, 0]) + jnp.sum(t[::4097, 0])
            _, outs = jax.lax.scan(body, 0.0, None, length=steps)
            return jnp.sum(outs).reshape(())
        return f

    results["encdec_ms"] = marginal(make_encdec) * 1e3
    print(f"encoder+decoders: {results['encdec_ms']:.2f} ms", flush=True)

    # --- full rollout marginal step, fused on/off
    for fused in (True, False):
        def make_roll(steps, fused=fused):
            @jax.jit
            def f(eps):
                out = rollout(
                    params, model_config,
                    jnp.remainder(pos_seq + eps, 1.0), temp_seq, stats,
                    steps, num_neighbors=K, dtype=jnp.bfloat16,
                    fused_tail=fused,
                )
                return jnp.sum(out["Coordinates"][-1]).reshape(())
            return f

        ms = marginal(make_roll, 4, 12) * 1e3
        results[f"rollout_step_{'fused' if fused else 'unfused'}_ms"] = ms
        print(f"rollout marginal step fused={fused}: {ms:.2f} ms "
              f"({N/ms*1e3/1e6:.2f}M psteps/s)", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    out_path = "benchmarks/results/flagship_decomp_r3.json"
    with open(out_path, "w") as f:
        json.dump({k: round(v, 3) for k, v in results.items()}, f, indent=2)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
