"""Round 5: the fused dense-query search+plan vs the production
search + codes-plan, at the flagship spec, on real TPU.

Measures (in-scan marginals, perturbed inputs, best-of-3):

  * research round A: codes-only pallas kNN + build_cellblock codes path
    (the round-4 production research round);
  * research round B: build_cellblock(dense_search=...) — ONE fused pass
    (sweeping the dense spec);
  * full hybrid rollout A/B: cellblock_search="codes" vs "dense", with the
    certificate asserted.

Run from /root/repo on TPU: python benchmarks/flagship_dense_r5.py
Writes benchmarks/results/flagship_dense_r5.json.
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
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        DenseSearchSpec,
        build_cellblock,
        choose_cellblock_spec,
        choose_dense_search_spec,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    print("backend:", jax.default_backend(), flush=True)
    results = {}
    rng = np.random.default_rng(0)
    spec = choose_cellblock_spec(N, K)
    dspec_auto = choose_dense_search_spec(N, spec)
    results["spec"] = dict(
        grid=spec.grid_size, cc=spec.col_capacity, qb=spec.query_block,
        window=spec.window, wrap=spec.wrap_cap,
        dense_qb=dspec_auto.query_block, dense_w=dspec_auto.window,
    )
    print("spec:", results["spec"], flush=True)
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

    def plan_checksum(plan):
        out = (
            jnp.sum(plan.s_table[:1].astype(jnp.int32)).astype(jnp.float32)
            + plan.overflow.astype(jnp.float32)
            + plan.dropped_edges.astype(jnp.float32)
        )
        if plan.search_excess is not None:
            out = out + plan.search_excess
            out = out + plan.search_window_overflow.astype(jnp.float32)
        return out

    # ---- A: production research round (search + codes plan).
    def research_codes(p):
        _, codes, cap, spill, exact = neighbor_search_certified(
            p, K, 1.0, method="pallas", with_codes=True, codes_only=True
        )
        plan = build_cellblock(
            p, None, 1.0, spec, neighbor_codes=codes, codes_cap=cap,
            codes_spill=spill,
        )
        return plan_checksum(plan) + exact.astype(jnp.float32)

    ms = marg(research_codes)
    results["research_codes_ms"] = round(ms, 3)
    print("research codes:", ms, flush=True)

    # ---- B: fused dense research round, dense-spec sweep.
    sweep = [
        (dspec_auto.query_block, dspec_auto.window),
        (16, 128),
        (32, 128),
        (48, 128),
        (64, 128),
        (32, 256),
    ]
    seen = set()
    first_ok = None
    for qb_s, w_s in sweep:
        if (qb_s, w_s) in seen:
            continue
        seen.add((qb_s, w_s))
        dspec = DenseSearchSpec(query_block=qb_s, window=w_s)

        def research_dense(p, dspec=dspec):
            plan = build_cellblock(
                p, None, 1.0, spec, dense_search=dspec, num_neighbors=K,
            )
            return plan_checksum(plan)

        try:
            ms = marg(research_dense)
            results[f"research_dense_QB{qb_s}_W{w_s}_ms"] = round(ms, 3)
            print(f"research dense QB={qb_s} W={w_s}: {ms:.3f}", flush=True)
            if first_ok is None:
                first_ok = dspec
        except Exception as e:
            results[f"research_dense_QB{qb_s}_W{w_s}_ms"] = (
                f"FAILED: {e}"[:300]
            )
            print(f"dense QB={qb_s} W={w_s} FAILED: {e}", flush=True)

    # One real (non-marginal) dense plan: certificate values on the fixture.
    if first_ok is not None:
        plan = jax.jit(
            lambda p: build_cellblock(
                p, None, 1.0, spec, dense_search=first_ok, num_neighbors=K
            )
        )(pos0)
        results["dense_certificate"] = dict(
            overflow=int(plan.overflow),
            dropped_edges=int(plan.dropped_edges),
            search_window_overflow=int(plan.search_window_overflow),
            search_excess=float(plan.search_excess),
        )
        print("dense certificate:", results["dense_certificate"], flush=True)

    # ---- Full hybrid rollout A/B.
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

    def run(steps, eps, search):
        out = rollout(
            params, model_config,
            jnp.remainder(positions + eps, 1.0), temperatures,
            stats, steps, num_neighbors=K, dtype=jnp.bfloat16,
            aggregation="cellblock_hybrid", cellblock_search=search,
        )
        exact = np.asarray(out["neighbor_exactness"])
        if not exact.all():
            results[f"rollout_{search}_exact_steps"] = exact.astype(
                int
            ).tolist()
            # Per-frame dense diagnostics on the produced trajectory: which
            # certificate component fails, at which step?
            if search == "dense":
                diag_fn = jax.jit(
                    lambda p: build_cellblock(
                        jnp.remainder(p, 1.0), None, 1.0, spec,
                        dense_search=first_ok, num_neighbors=K,
                    )
                )
                bad = [int(i) for i in np.nonzero(~exact)[0][:3]]
                for i in bad:
                    pl_ = diag_fn(out["Coordinates"][WINDOW + i - 1])
                    results[f"rollout_dense_diag_step{i}"] = dict(
                        overflow=int(pl_.overflow),
                        dropped=int(pl_.dropped_edges),
                        swo=int(pl_.search_window_overflow),
                        excess=float(pl_.search_excess),
                    )
                    print(i, results[f"rollout_dense_diag_step{i}"],
                          flush=True)
            raise AssertionError(f"certificate failed ({search})")
        return float(checksum(out))

    def measure(steps, search):
        run(steps, 0.0, search)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            run(steps, (rep + 1) * 1e-6, search)
            best = min(best, time.perf_counter() - t0)
        return best

    for search in ("codes", "dense"):
        try:
            t_s = measure(SHORT, search)
            t_l = measure(LONG, search)
            ms = (t_l - t_s) / (LONG - SHORT) * 1e3
            results[f"rollout_{search}_ms_per_step"] = round(ms, 3)
            results[f"rollout_{search}_psteps_per_s"] = round(N / ms * 1e3, 1)
            print(f"rollout {search}: {ms:.2f} ms/step", flush=True)
        except Exception as e:
            results[f"rollout_{search}_ms_per_step"] = f"FAILED: {e}"[:300]
            print(f"rollout {search} FAILED: {e}", flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/flagship_dense_r5.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
