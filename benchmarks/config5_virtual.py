"""BASELINE config-5 evidence at FULL size on the virtual 8-device mesh
(round-2 verdict item 6: persist the N=2M claims as a reproducible driver
+ results JSON, and add the config-5-shaped TRAIN step that round 2 never
ran).

Runs on CPU with 8 virtual devices (the sharding program is identical to
the 8-chip TPU program; only the backend differs):

  * N=2,000,000 halo-exchange rollout, 10 steps, inter-slab migration:
    asserts all particles preserved, zero migration overflow/stranded,
    and the per-step neighbor-exactness certificate;
  * ONE config-5-shaped noised halo train step (latent 128, 10 MP steps,
    remat): finite loss, grads applied.

Usage (from /root/repo): python benchmarks/config5_virtual.py
  [--n 2000000] [--steps 10] [--skip_train] [--skip_rollout] [--cellblock]
Writes benchmarks/results/config5_virtual.json (with --cellblock:
config5_virtual_cellblock.json — per-shard cell-block MXU aggregation,
the round-4 halo x cellblock compose, through BOTH the rollout and the
S^T-VJP train step).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--latent", type=int, default=128)
    ap.add_argument("--mp", type=int, default=10)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--slab_layers", type=int, default=None,
                    help="cells per slab; default 5 at full size (coarser "
                         "than the uniform-tuned grid for margin), auto "
                         "below 1M particles (small-N smoke runs)")
    ap.add_argument("--capacity_multiplier", type=float, default=5.0,
                    help="cell-capacity headroom over mean occupancy. 5.0: "
                         "even with zeroed heads the fixture's convergent "
                         "seed velocities compress cells ballistically — "
                         "3x overflowed by 2/30 particles at steps 9/10 of "
                         "the 2M run (window-margin component held all "
                         "steps); 5x absorbs the 10-step infall")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_rollout", action="store_true")
    ap.add_argument("--cellblock", action="store_true",
                    help="run each shard's aggregation on the cell-block "
                         "MXU path (per-shard local plans over the "
                         "candidate slab; round-4 halo x cellblock "
                         "compose). Writes config5_virtual_cellblock.json")
    args = ap.parse_args()
    n, k = args.n, args.k

    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )
    from cosmology_gnn_simulation_tpu.metadata import compute_metadata
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.parallel.halo import (
        choose_halo_config,
        make_halo_rollout,
        make_halo_train_step,
        partition_batch,
        partition_windows,
        shard_halo_batch,
    )
    from cosmology_gnn_simulation_tpu.parallel.mesh import make_mesh
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig,
        default_model_config,
        make_optimizer,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    results = {"n": n, "k": k, "latent": args.latent, "mp_steps": args.mp,
               "devices": jax.device_count()}
    t0 = time.perf_counter()
    sim = generate_synthetic_simulation(num_snapshots=6, num_particles=n,
                                        seed=7)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    print(f"fixture generated in {time.perf_counter()-t0:.0f}s", flush=True)

    model_config = default_model_config(
        window_size=5, latent_size=args.latent, mlp_hidden_size=args.latent,
        num_message_passing_steps=args.mp, remat=True,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)

    # Zero the decoder heads: a RANDOM-init model predicts a spatially
    # correlated random force field whose convergent regions compress
    # particles exponentially — by rollout step 7-9 cells overflow their
    # 3x-mean capacity and the exactness certificate (correctly, loudly)
    # fails (measured round 3: cell_overflow 0,0,0,0,0,0,0,2,8,80; the
    # per-query window-margin component held ALL steps). No capacity
    # planner should absorb unphysical collapse; a TRAINED model predicts
    # near-zero denoising residuals. Zeroed heads give the physically
    # plausible analog — ballistic drift from the seed velocities — while
    # executing the IDENTICAL compute/comms path (full encoder + 10 MP
    # steps + decoders + migration every step), which is what this
    # artifact evidences at N=2M.
    for head in ("decoder_acc", "decoder_temp_rate"):
        last = params[head]["layers"][-1]
        last["w"] = jnp.zeros_like(last["w"])
        last["b"] = jnp.zeros_like(last["b"])

    # Coarser slabs (grid 40 vs the uniform-tuned 56) + extra cell
    # capacity: the fixture's attractor clustering plus 10 steps of
    # ballistic infall need more margin than the frame-0-calibrated
    # uniform grid provides.
    slab_layers = args.slab_layers
    if slab_layers is None and n >= 1_000_000:
        slab_layers = 5
    hc = choose_halo_config(n, k, 8, noise=True, slab_layers=slab_layers,
                            capacity_multiplier=args.capacity_multiplier)
    results["halo_config"] = {
        "grid": hc.grid_size, "local_capacity": hc.local_capacity,
        "halo_capacity": hc.halo_capacity, "halo_layers": hc.halo_layers,
        "cell_capacity": hc.cell_capacity,
    }
    print("halo config:", results["halo_config"], flush=True)
    cb_spec = None
    if args.cellblock:
        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            choose_cellblock_spec_halo,
        )
        cb_spec = choose_cellblock_spec_halo(
            n, hc.grid_size, hc.slab_layers, hc.halo_layers, 8
        )
        results["cellblock_spec"] = {
            "gx": cb_spec.gx, "grid_size": cb_spec.grid_size,
            "col_capacity": cb_spec.col_capacity,
            "query_block": cb_spec.query_block,
            "window": cb_spec.window,
            "num_slots": cb_spec.num_slots,
        }
        print("cellblock spec:", results["cellblock_spec"], flush=True)
    mesh = make_mesh((1, 8))

    out = ("benchmarks/results/config5_virtual_cellblock.json"
           if args.cellblock else "benchmarks/results/config5_virtual.json")

    def _flush():
        os.makedirs("benchmarks/results", exist_ok=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=2)

    # ---- Rollout: full config-5 size, inter-slab migration, certificate.
    if not args.skip_rollout:
        t0 = time.perf_counter()
        part = partition_windows(
            np.asarray(sim["Coordinates"][:5], np.float32),
            np.asarray(sim["InternalEnergy"][:5], np.float32),
            hc, stats.box_size,
        )
        results["partition_s"] = round(time.perf_counter() - t0, 1)
        fn = make_halo_rollout(model_config, stats, mesh, args.steps, hc,
                               num_neighbors=k,
                               with_certificate_components=True,
                               cellblock_spec=cb_spec)
        t0 = time.perf_counter()
        outs, diag, exactness, certs = fn(
            params,
            jnp.asarray(part["positions"]),
            jnp.asarray(part["temperatures"]),
            jnp.asarray(part["valid"]),
            jnp.asarray(part["gid"]),
        )
        valid_counts = np.asarray(outs["valid"]).sum(axis=1)
        results["rollout_total_s"] = round(time.perf_counter() - t0, 1)
        results["rollout_steps"] = args.steps
        results["particles_preserved"] = bool((valid_counts == n).all())
        results["migration_overflow"] = int(diag["overflow"])
        results["migration_stranded"] = int(diag["stranded"])
        results["neighbor_exactness_all_steps"] = bool(
            np.asarray(exactness).all()
        )
        results["certificate_components"] = {
            key: np.asarray(val).tolist() for key, val in certs.items()
        }
        print("per-step certificate components:", flush=True)
        for key, val in results["certificate_components"].items():
            print(f"  {key}: {val}", flush=True)
        print(
            f"rollout: {args.steps} steps in {results['rollout_total_s']}s, "
            f"preserved={results['particles_preserved']}, diag="
            f"{{overflow: {results['migration_overflow']}, stranded: "
            f"{results['migration_stranded']}}}, exact="
            f"{results['neighbor_exactness_all_steps']}", flush=True,
        )
        _flush()  # artifact survives a failed assertion below
        assert results["particles_preserved"]
        assert results["migration_overflow"] == 0
        assert results["migration_stranded"] == 0
        assert results["neighbor_exactness_all_steps"]

    # ---- Config-5-shaped train step (noised, remat).
    if not args.skip_train:
        # Fresh random init: the zeroed-head surgery above is rollout-only.
        params = init_encode_process_decode(
            jax.random.PRNGKey(0), model_config
        )
        tc = TrainConfig(num_neighbors=k, batch_size=1, noise_std=3e-4,
                         augment_prob=0.0, momentum_loss_weight=1.0)
        optimizer = make_optimizer(tc, steps_per_epoch=1)
        opt_state = optimizer.init(params)
        step = make_halo_train_step(model_config, stats, tc, optimizer,
                                    mesh, hc, cellblock_spec=cb_spec)
        batch = {
            "positions": np.asarray(sim["Coordinates"][:5], np.float32)[None],
            "temperatures": np.asarray(
                sim["InternalEnergy"][:5], np.float32)[None],
            "target_positions": np.asarray(
                sim["Coordinates"][5], np.float32)[None],
            "target_temperatures": np.asarray(
                sim["InternalEnergy"][5], np.float32)[None],
        }
        t0 = time.perf_counter()
        bpart = partition_batch(batch, hc, stats.box_size)
        keys = jax.random.split(jax.random.PRNGKey(5), 1)
        p_new, _, metrics = step(
            params, opt_state, shard_halo_batch(bpart, mesh), keys
        )
        metrics = {kk: float(vv) for kk, vv in metrics.items()}
        results["train_step_total_s"] = round(time.perf_counter() - t0, 1)
        results["train_metrics"] = metrics
        results["train_loss_finite"] = bool(np.isfinite(metrics["loss"]))
        delta = float(
            jnp.max(jnp.abs(jax.tree.leaves(p_new)[0]
                            - jax.tree.leaves(params)[0]))
        )
        results["params_updated"] = bool(delta > 0)
        print(f"train step: {results['train_step_total_s']}s, "
              f"metrics={metrics}", flush=True)
        assert results["train_loss_finite"] and results["params_updated"]

    _flush()
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
