"""Round-4 TPU training-path probe (round-3 verdict item 4).

Gives the TRAIN path the rollout path's measurement treatment:

  * config-4 (N=500k, k=32, latent 256, 15 MP, cellblock slots,
    remat_chunk=5, bf16) decomposition — forward-loss only (plan without
    the reverse table), value_and_grad only (plan with reverse), and the
    full optimizer step, each fused-tail on/off where applicable. The
    differences attribute the 3,071 ms round-3 step to forward / backward /
    reverse-plan / adam.
  * flagship train row (N=65k, k=16, latent 128, 10 MP, B=1, bf16) —
    the ladder's missing row: gather (sorted-edge VJP) fused/unfused and
    cellblock_hybrid.
  * config-2 (N=32k) fused-tail A/B refresh of the round-2 131/143 ms row.

Timing per CLAUDE.md: perturbed inputs per call, scalar checksum forced to
host, min over repeats; one process for all sections (first compile in a
process is minutes — remote compile service).

Run from /root/repo (TPU): python benchmarks/probe_train_r4.py
  [--sections config2,flagship,config4]
Writes benchmarks/results/train_r4.json (merging over existing keys).

Reference anchor this beats: the torch train loop
``/root/reference/train.py:219-265`` (per-sample host preprocess ->
Batch.to(device) -> forward -> 3-part loss -> backward -> Adam).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 3
OUT = "benchmarks/results/train_r4.json"


def _fixture(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (1, n, 3))
    drift = rng.normal(0, 2e-4, (5, n, 3)).cumsum(axis=0)
    pos = jnp.asarray(np.remainder(base + drift, 1.0).astype(np.float32))
    temp = jnp.asarray(
        np.abs(rng.normal(1.0, 0.3, (5, n, 1))).astype(np.float32))
    # Next-frame targets: one more drift step.
    tpos = jnp.asarray(
        np.remainder(
            base[0] + drift[-1] + rng.normal(0, 2e-4, (n, 3)), 1.0
        ).astype(np.float32))
    return pos, temp, tpos, temp[-1]


def _stats():
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    return NormalizationStats(
        temp_mean=jnp.asarray(1.0), temp_std=jnp.asarray(0.3),
        temp_rate_mean=jnp.asarray(0.0), temp_rate_std=jnp.asarray(0.02),
        vel_mean=jnp.asarray(0.0), vel_std=jnp.asarray(0.06),
        acc_mean=jnp.asarray(0.0), acc_std=jnp.asarray(0.2),
        box_size=1.0, dt=0.05,
    )


def _time_train_step(step, params, opt_state, batch, tag):
    """Full train step timing: perturb positions per call, force params
    delta to host."""
    def run(eps):
        b = dict(batch)
        b["positions"] = jnp.remainder(batch["positions"] + eps, 1.0)
        p2, o2, m = step(params, opt_state, b, jax.random.PRNGKey(3))
        return float(jax.tree.leaves(p2)[0].reshape(-1)[0]), m

    t0 = time.perf_counter()
    _, m = run(0.0)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for rep in range(REPS):
        t0 = time.perf_counter()
        run((rep + 1) * 1e-6)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best*1e3:.0f} ms (compile+first {compile_s:.0f} s, "
          f"violations={float(m.get('cellblock_violations', -1.0))})",
          flush=True)
    return best * 1e3


def _make_train(n, k, latent, mp, aggregation, fused, remat_chunk=None,
                carry_dtype=None, stats=None, variable=False):
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig,
        default_model_config,
        make_optimizer,
        make_train_step,
    )

    mc = default_model_config(
        latent_size=latent, mlp_hidden_size=latent,
        num_message_passing_steps=mp,
        remat=remat_chunk is not None,
        remat_chunk=remat_chunk,
        carry_dtype=carry_dtype,
    )
    tc = TrainConfig(
        num_neighbors=k, batch_size=1, noise_std=3e-4, augment_prob=0.0,
        compute_dtype="bfloat16", aggregation=aggregation,
        momentum_loss_weight=1.0, fused_tail=fused,
        cellblock_variable=variable,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), mc)
    opt = make_optimizer(tc, steps_per_epoch=1)
    return make_train_step(mc, stats, tc, opt), params, opt.init(params), mc, tc


def _batch(pos, temp, tpos, ttemp):
    return {
        "positions": pos[None], "temperatures": temp[None],
        "target_positions": tpos[None], "target_temperatures": ttemp[None],
    }


def section_simple(results, n, k, latent, mp, tag, variants):
    stats = _stats()
    pos, temp, tpos, ttemp = _fixture(n)
    batch = _batch(pos, temp, tpos, ttemp)
    for name, (agg, fused, *rest) in variants.items():
        step, params, opt_state, _, _ = _make_train(
            n, k, latent, mp, agg, fused, stats=stats,
            variable=bool(rest and rest[0]))
        results[f"{tag}_{name}_ms"] = _time_train_step(
            step, params, opt_state, batch, f"{tag} {name}")


def section_config4(results, n=500_000, k=32, latent=256, mp=15):
    """Decomposition: fwd-loss / grad / full step on the cellblock path."""
    from cosmology_gnn_simulation_tpu.featurize import featurize
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        apply_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.ops.cellblock import (
        build_cellblock,
        choose_cellblock_spec,
    )
    from cosmology_gnn_simulation_tpu.training.losses import combined_loss

    stats = _stats()
    pos, temp, tpos, ttemp = _fixture(n)
    batch = _batch(pos, temp, tpos, ttemp)
    spec = choose_cellblock_spec(n, k)

    # Full train steps (the ladder row): fused tail on/off, plus the
    # round-4 variable packed layout (fused).
    for name, fused, variable in (
        ("fused", True, False),
        ("unfused", False, False),
        ("fused_variable", True, True),
    ):
        step, params, opt_state, mc, tc = _make_train(
            n, k, latent, mp, "cellblock", fused,
            remat_chunk=5, carry_dtype="bfloat16", stats=stats,
            variable=variable)
        results[f"config4_train_{name}_ms"] = _time_train_step(
            step, params, opt_state, batch, f"config4 train {name}")

    # Forward-loss only vs value_and_grad (same featurize/plan/remat
    # configuration as the train step; fused tail on).
    def loss_at(params, p, t, tp, tt, with_reverse, key):
        graph = featurize(
            p, t, stats, key, noise_std=3e-4, num_neighbors=k,
            target_position=tp, target_temperature=tt,
            build_reverse=False, build_edges=False, with_codes=True,
        )
        graph, codes, codes_cap, spill = graph
        plan = build_cellblock(
            graph.positions, graph.neighbors, stats.box_size, spec,
            with_reverse=with_reverse,
            neighbor_codes=codes, codes_cap=codes_cap, codes_spill=spill,
        )
        graph = graph._replace(
            nodes=jnp.take(graph.nodes, plan.order, axis=0), cellblock=plan)
        preds = apply_encode_process_decode(
            params, graph, mc, jnp.bfloat16, cellblock_spec=spec)
        total, _ = combined_loss(
            jax.tree.map(lambda a: a[None], preds),
            jnp.take(graph.target_acceleration, plan.order, axis=0)[None],
            jnp.take(graph.target_temp_rate, plan.order, axis=0)[None],
            stats.dt, momentum_weight=1.0,
        )
        return total

    _, params, _, mc, _ = _make_train(
        n, k, latent, mp, "cellblock", True,
        remat_chunk=5, carry_dtype="bfloat16", stats=stats)
    mc = mc._replace(fused_tail=True)
    key = jax.random.PRNGKey(3)

    fwd = jax.jit(lambda pr, p, eps: loss_at(
        pr, jnp.remainder(p + eps, 1.0), temp, tpos, ttemp, False, key))
    def _grad(pr, p, eps):
        grads = jax.grad(
            lambda q: loss_at(q, jnp.remainder(p + eps, 1.0), temp, tpos,
                              ttemp, True, key)
        )(pr)
        # Reduce over EVERY grad leaf — returning a single element would let
        # XLA dead-code-eliminate the rest of the backward.
        return sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree.leaves(grads))

    grad = jax.jit(_grad)

    def timeit(fn, tag):
        t0 = time.perf_counter()
        float(fn(params, pos, 0.0).reshape(()))
        c = time.perf_counter() - t0
        best = float("inf")
        for rep in range(REPS):
            t0 = time.perf_counter()
            float(fn(params, pos, (rep + 1) * 1e-6).reshape(()))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: {best*1e3:.0f} ms (compile+first {c:.0f} s)",
              flush=True)
        return best * 1e3

    results["config4_fwd_loss_ms"] = timeit(fwd, "config4 fwd-loss (no rev)")
    results["config4_grad_ms"] = timeit(grad, "config4 value_and_grad")
    results["config4_adam_ms"] = round(
        results["config4_train_fused_ms"] - results["config4_grad_ms"], 1)
    results["config4_backward_ms"] = round(
        results["config4_grad_ms"] - results["config4_fwd_loss_ms"], 1)
    print(
        f"decomposition: fwd {results['config4_fwd_loss_ms']:.0f} + "
        f"backward(+rev plan) {results['config4_backward_ms']:.0f} + "
        f"adam {results['config4_adam_ms']:.0f} ms", flush=True)


def main():
    global OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="config2,flagship,config4")
    ap.add_argument("--out", default=OUT,
                    help="results JSON (merged over existing keys); round-5 "
                         "reruns write train_r5.json to preserve the "
                         "round-4 numbers")
    args = ap.parse_args()
    OUT = args.out
    sections = set(args.sections.split(","))

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results.update(json.load(f))

    def flush():
        os.makedirs("benchmarks/results", exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    if "config2" in sections:
        section_simple(
            results, 32768, 16, 128, 10, "config2",
            {"gather_fused": ("gather", True),
             "gather_unfused": ("gather", False)},
        )
        flush()
    if "flagship" in sections:
        section_simple(
            results, 65536, 16, 128, 10, "flagship",
            {"gather_fused": ("gather", True),
             "gather_unfused": ("gather", False),
             "hybrid_fused": ("cellblock_hybrid", True),
             "hybrid_fused_variable": ("cellblock_hybrid", True, True)},
        )
        flush()
    if "config4" in sections:
        section_config4(results)
        flush()
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
