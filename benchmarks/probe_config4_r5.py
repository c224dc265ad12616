"""Round 5 (VERDICT item 4): attribute the config-4 train step's two
untreated line items sharply enough to fix or close them.

  * The "Adam + metrics" 241 ms (train_r4.json): is the optimizer math
    actually expensive, or is it a jit-boundary / dispatch artifact of the
    round-4 decomposition? Measured here as a SCAN MARGINAL of the bare
    optax update on config-4-shaped parameter/optimizer pytrees (adam math
    alone, no model), and of a fused loss+grad+adam toy of the same sizes.
  * The reverse-plan carry (~400 ms of the 624 ms with-reverse build):
    in-scan marginals of build_cellblock at the config-4 spec with and
    without the reverse table, and the reverse build's own stages.

Run from /root/repo on TPU: python benchmarks/probe_config4_r5.py
Writes benchmarks/results/config4_r5.json.
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

N, K, LATENT, MP = 500_000, 32, 256, 15


def main():
    import optax

    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        build_cellblock,
        choose_cellblock_spec,
    )
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
    )

    print("backend:", jax.default_backend(), flush=True)
    results = {}

    mc = default_model_config(
        latent_size=LATENT, mlp_hidden_size=LATENT,
        num_message_passing_steps=MP,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), mc)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    results["n_params"] = n_params
    print(f"params: {n_params/1e6:.1f}M over "
          f"{len(jax.tree.leaves(params))} leaves", flush=True)

    opt = optax.chain(
        optax.scale_by_adam(), optax.scale_by_learning_rate(1e-4)
    )
    opt_state = opt.init(params)

    def marg(make_f, k_s=4, k_l=20):
        f_s, f_l = make_f(k_s), make_f(k_l)

        def best_of(f):
            float(f(0.0).reshape(()))
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                float(f((rep + 1) * 1e-6).reshape(()))
                best = min(best, time.perf_counter() - t0)
            return best

        return (best_of(f_l) - best_of(f_s)) / (k_l - k_s) * 1e3

    # ---- 1. Bare Adam scan marginal on the real param pytree.
    def make_adam(iters):
        @jax.jit
        def f(eps):
            def step(carry, i):
                p, s = carry
                grads = jax.tree.map(
                    lambda x: x * (eps * 1e-6) + eps * (i + 1.0), p
                )
                u, s = opt.update(grads, s, p)
                p = optax.apply_updates(p, u)
                return (p, s), jnp.float32(0.0)

            (p, _), _ = jax.lax.scan(
                step, (params, opt_state), jnp.arange(iters, dtype=jnp.float32)
            )
            return jax.tree.leaves(p)[0].reshape(-1)[0]

        return f

    ms = marg(make_adam)
    results["adam_only_ms"] = round(ms, 3)
    print("bare adam/step:", ms, flush=True)

    # ---- 2. Reverse-plan marginals at the config-4 spec.
    spec = choose_cellblock_spec(N, K)
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.random((N, 3), np.float32))

    from cosmology_gnn_simulation_tpu.featurize import (
        neighbor_search_certified,
    )

    def make_plan(iters, with_reverse, codes_only):
        @jax.jit
        def f(eps):
            def step(carry, _):
                p = jnp.remainder(pos0 + carry * eps, 1.0)
                # Training path (with_reverse): ids + codes, as
                # make_train_step requests them; rollout path: codes only.
                idx, codes, cap, spill, exact = neighbor_search_certified(
                    p, K, 1.0, method="pallas", with_codes=True,
                    codes_only=codes_only,
                )
                plan = build_cellblock(
                    p, idx, 1.0, spec, with_reverse=with_reverse,
                    neighbor_codes=codes, codes_cap=cap, codes_spill=spill,
                )
                out = (
                    jnp.sum(plan.s_table[:1].astype(jnp.int32))
                    .astype(jnp.float32)
                    + plan.overflow.astype(jnp.float32)
                )
                if with_reverse:
                    out = out + plan.reverse_mismatch.astype(jnp.float32)
                return carry + 1.0, out

            _, s = jax.lax.scan(step, 0.0, None, length=iters)
            return jnp.sum(s)

        return f

    # (with_reverse, codes_only): the (False, False) leg pins the dual-
    # payload search + ids-plan baseline so (True, False) - (False, False)
    # isolates the REVERSE BUILD itself (round-5 follow-up: the first cut
    # of this probe conflated it with the codes_only -> dual search delta).
    for wr, co in ((False, True), (False, False), (True, False)):
        try:
            ms = marg(lambda it, wr=wr, co=co: make_plan(it, wr, co),
                      k_s=3, k_l=9)
            results[f"plan_reverse_{wr}_codesonly_{co}_ms"] = round(ms, 3)
            print(f"plan with_reverse={wr} codes_only={co}: {ms:.1f} ms",
                  flush=True)
        except Exception as e:
            results[f"plan_reverse_{wr}_codesonly_{co}_ms"] = (
                f"FAILED: {e}"[:200]
            )
            print(f"plan with_reverse={wr} codes_only={co} FAILED: {e}",
                  flush=True)

    os.makedirs("benchmarks/results", exist_ok=True)
    with open("benchmarks/results/config4_r5.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
