"""Round 4b: decompose the flagship hybrid rollout step END-TO-END on real
TPU — where do the 29.8 ms/step actually go, measured (not inferred)?

Parts measured as in-scan marginals (perturbed inputs, best-of-3, long-short
iteration differencing so compile/RPC floors cancel):

  1. search            — codes-only pallas kNN alone
  2. search+plan       — + the REAL build_cellblock (production arguments)
  3. research          — + window permutes + inverse-id bookkeeping (the
                         full re-neighbor round as the rollout runs it)
  4. rollout mp=1      — full hybrid rollout with a 1-MP-step model
  5. rollout mp=10     — production model; (5-4)/9 = per-MP-step cost,
                         4 - research - 1*mp = encoder/decoders/featurize/
                         integrate/scan residual

Run from /root/repo on TPU: python benchmarks/probe_stepparts_r4.py
Writes benchmarks/results/stepparts_r4.json.
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


def main():
    from cosmology_gnn_simulation_tpu.featurize import (
        neighbor_search_certified,
    )
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.ops import cellblock as cb
    from cosmology_gnn_simulation_tpu.rollout import _permute_window, rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    print("backend:", jax.default_backend(), flush=True)
    results = {}
    rng = np.random.default_rng(0)
    spec = cb.choose_cellblock_spec(N, K)
    pos0 = jnp.asarray(rng.random((N, 3), np.float32))
    posw0 = jnp.asarray(
        np.remainder(
            rng.random((WINDOW, N, 3))[:1]
            + rng.normal(0, 5e-4, (WINDOW, N, 3)).cumsum(axis=0),
            1.0,
        ),
        jnp.float32,
    )
    tempw0 = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (WINDOW, N, 1))), jnp.float32
    )

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

    def do_search(pos):
        return neighbor_search_certified(
            pos, K, 1.0, method="pallas", with_codes=True, codes_only=True
        )

    def search_only(pos):
        _, codes, cap, spill, exact = do_search(pos)
        return jnp.sum(codes[:1].astype(jnp.float32))

    def search_plan(pos):
        _, codes, cap, spill, exact = do_search(pos)
        plan = cb.build_cellblock(pos, None, 1.0, spec, s_build="kernel",
                                  neighbor_codes=codes, codes_cap=cap,
                                  codes_spill=spill)
        return (
            jnp.sum(plan.s_table[:1, :1].astype(jnp.int32)).astype(
                jnp.float32)
            + plan.order[0].astype(jnp.float32)
            + plan.overflow.astype(jnp.float32)
        )

    def research_full(pos):
        # The rollout's research() body: plan + state permutes + inverse ids.
        _, codes, cap, spill, exact = do_search(pos)
        plan = cb.build_cellblock(pos, None, 1.0, spec, s_build="kernel",
                                  neighbor_codes=codes, codes_cap=cap,
                                  codes_spill=spill)
        # Tie the window to pos so the permutes can't hoist out of the scan.
        pos_w = posw0 + (pos[0, 0] - pos[0, 0]) * 0.0
        pos_w = pos_w.at[-1].set(pos)
        temp_w = tempw0
        pos_w = _permute_window(pos_w, plan.order)
        temp_w = _permute_window(temp_w, plan.order)
        iota = jnp.arange(N, dtype=jnp.int32)
        invp = jnp.zeros((N,), jnp.int32).at[plan.order].set(iota)
        inv_ids = jnp.take(invp, iota, axis=0)
        return (
            jnp.sum(plan.s_table[:1, :1].astype(jnp.int32)).astype(
                jnp.float32)
            + jnp.sum(pos_w[-1, :1]) + jnp.sum(temp_w[-1, :1])
            + inv_ids[0].astype(jnp.float32)
        )

    for tag, body in (("search", search_only), ("search_plan", search_plan),
                      ("research", research_full)):
        ms = marg_body(body)
        results[f"{tag}_ms"] = round(ms, 3)
        print(f"{tag}: {ms:.3f}", flush=True)

    # ---- Full rollout marginals at mp=1 and mp=10.
    stats = NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )

    @jax.jit
    def checksum(out):
        return (
            jnp.sum(out["Coordinates"][-1])
            + jnp.sum(out["InternalEnergy"][-1])
        )

    def rollout_ms(mp_steps):
        model_config = default_model_config(
            num_message_passing_steps=mp_steps
        )
        params = init_encode_process_decode(
            jax.random.PRNGKey(0), model_config
        )

        def run(steps, eps):
            out = rollout(
                params, model_config,
                jnp.remainder(posw0 + eps, 1.0), tempw0,
                stats, steps, num_neighbors=K, dtype=jnp.bfloat16,
                aggregation="cellblock_hybrid", s_build="kernel",
            )
            return float(checksum(out))

        def measure(steps):
            run(steps, 0.0)
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                run(steps, (rep + 1) * 1e-6)
                best = min(best, time.perf_counter() - t0)
            return best

        t_s, t_l = measure(10), measure(40)
        return (t_l - t_s) / 30 * 1e3

    ms1 = rollout_ms(1)
    results["rollout_mp1_ms"] = round(ms1, 3)
    print("rollout mp=1:", ms1, flush=True)
    ms10 = rollout_ms(10)
    results["rollout_mp10_ms"] = round(ms10, 3)
    per_mp = (ms10 - ms1) / 9.0
    results["per_mp_step_ms"] = round(per_mp, 3)
    results["residual_ms"] = round(ms1 - results["research_ms"] - per_mp, 3)
    print(json.dumps(results, indent=2), flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/stepparts_r4.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
