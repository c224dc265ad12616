"""``python -m cosmology_gnn_simulation_tpu.cli.render_rollout`` — rollout
CLI (parity with ``/root/reference/render_rollout.py:145-241``): performs the
jitted rollout, computes per-step errors, writes the error plot, ``.npy``
trajectories and ``rollout_summary.txt``."""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np

from cosmology_gnn_simulation_tpu.cli.one_step_test import (
    add_model_flags,
    load_model_from_checkpoint,
)
from cosmology_gnn_simulation_tpu.data.hdf5 import read_simulation
from cosmology_gnn_simulation_tpu.evaluation import (
    calculate_rollout_errors,
    write_rollout_summary,
)
from cosmology_gnn_simulation_tpu.rollout import rollout
from cosmology_gnn_simulation_tpu.types import NormalizationStats


def main(argv=None):
    parser = argparse.ArgumentParser(description="Perform model rollout")
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--test_data", type=str, required=True)
    parser.add_argument("--metadata_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="rollout_results")
    parser.add_argument("--noise_std", type=float, default=0.0,
                        help="Accepted for reference-CLI parity but IGNORED "
                             "(rollouts always run noise-free, matching "
                             "render_rollout.py:44-52)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--no_strict_neighbors", action="store_true",
                        help="Downgrade a failed kNN exactness certificate "
                             "from an error to a warning")
    parser.add_argument("--exactness_guard", type=str, default="flag",
                        choices=["off", "flag", "fallback"],
                        help="In-scan per-step kNN exactness certificate: "
                             "flag = report failing steps; fallback = rerun "
                             "failing steps with exact brute force")
    parser.add_argument("--num_steps", type=int, default=None,
                        help="Steps to simulate (default: full trajectory)")
    parser.add_argument("--cellblock_variable", action="store_true",
                        help="variable per-column slot capacities for the "
                             "cellblock aggregation modes (packed layout, "
                             "~1.1x padding instead of the Poisson-tail "
                             "1.3-1.4x; identical semantics/certificates)")
    parser.add_argument("--aggregation", type=str, default="auto",
                        choices=["auto", "gather", "cellblock",
                                 "cellblock_hybrid"],
                        help="message-passing aggregation: 'gather' "
                             "(default), 'cellblock' (selection-matrix "
                             "MXU kernel, slot-space carry — the fast "
                             "path at N >= ~250k) or 'cellblock_hybrid' "
                             "(same kernel, particle-space carry — the "
                             "flagship-scale winner)")
    parser.add_argument("--reneighbor_every", type=int, default=1,
                        help="Rebuild the k-NN graph every R steps (R=1 = "
                             "reference semantics; R>1 trades exactness for "
                             "~1.3-1.5x throughput)")
    parser.add_argument("--sorted_state", type=str, default="auto",
                        choices=("auto", "on", "off"),
                        help="carry the rollout scan state in cell-sorted "
                             "order (identical numerics). Measured slower "
                             "at the flagship spec on this TPU, so "
                             "auto = off; 'on' forces it")
    parser.add_argument("--no_fused_tail", action="store_true",
                        help="Disable the fused step-tail Pallas kernel "
                             "(auto-enabled for pruned bf16 rollouts on "
                             "real TPU; ops/fused_step.py)")
    parser.add_argument("--spatial_shards", type=int, default=0,
                        help="Run the rollout spatially sharded over this "
                             "many devices with ppermute halo exchange "
                             "(0/1 = single device)")
    add_model_flags(parser)
    args = parser.parse_args(argv)
    if args.aggregation.startswith("cellblock") and args.exactness_guard == "fallback":
        parser.error(
            "--aggregation cellblock supports --exactness_guard flag/off "
            "only: brute-force fallback neighbors can exceed the one-cell "
            "window the selection matrices cover"
        )

    os.makedirs(args.output_dir, exist_ok=True)
    with open(args.metadata_path) as f:
        metadata = json.load(f)
    stats = NormalizationStats.from_metadata(metadata)
    print(f"Using time step (dt): {stats.dt}")
    print(f"Using box size: {stats.box_size}")

    if args.noise_std:
        print("WARNING: --noise_std is ignored by rollout (kept for "
              "reference-CLI parity; rollouts are always noise-free)")
    params, model_config = load_model_from_checkpoint(args.model_path, args)
    ground_truth = read_simulation(
        args.test_data, fields=["Coordinates", "InternalEnergy"]
    )
    total_time = ground_truth["Coordinates"].shape[0]
    num_steps = (
        args.num_steps
        if args.num_steps is not None
        else total_time - args.window_size
    )

    from cosmology_gnn_simulation_tpu.featurize import (
        verify_neighbor_exactness,
    )

    verify_neighbor_exactness(
        ground_truth["Coordinates"][args.window_size - 1],
        args.num_neighbors,
        stats.box_size,
        method=args.neighbor_method,
        strict=not args.no_strict_neighbors,
    )
    print("Performing rollout")
    spatial = args.spatial_shards or 0
    if spatial > 1:
        import jax

        from cosmology_gnn_simulation_tpu.parallel.halo import (
            choose_halo_config,
            run_halo_rollout,
        )
        from cosmology_gnn_simulation_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        if n_dev % spatial:
            raise ValueError(
                f"--spatial_shards {spatial} must divide device count {n_dev}"
            )
        hc = choose_halo_config(
            ground_truth["Coordinates"].shape[1], args.num_neighbors, spatial
        )
        mesh = make_mesh((n_dev // spatial, spatial))
        rollout_data, diag = run_halo_rollout(
            params,
            model_config,
            ground_truth["Coordinates"][: args.window_size],
            ground_truth["InternalEnergy"][: args.window_size],
            stats,
            num_steps,
            mesh,
            hc,
            num_neighbors=args.num_neighbors,
        )
        if diag["overflow"] or diag["stranded"]:
            print(f"WARNING: halo rollout capacity diagnostics {diag} != 0 "
                  "— results are approximate; raise the halo slacks")
    else:
        rollout_data = rollout(
            params,
            model_config,
            jnp.asarray(ground_truth["Coordinates"][: args.window_size]),
            jnp.asarray(ground_truth["InternalEnergy"][: args.window_size]),
            stats,
            num_steps,
            num_neighbors=args.num_neighbors,
            neighbor_method=args.neighbor_method,
            reneighbor_every=args.reneighbor_every,
            exactness_guard=args.exactness_guard,
            aggregation=args.aggregation,
            cellblock_variable=getattr(args, "cellblock_variable", False),
            fused_tail=False if args.no_fused_tail else None,
            sorted_state=args.sorted_state,
        )
    rollout_data = {k: np.asarray(v) for k, v in rollout_data.items()}
    exactness = rollout_data.pop("neighbor_exactness", None)
    if exactness is not None:
        inexact = int((~exactness.astype(bool)).sum())
        if inexact:
            if args.exactness_guard == "fallback":
                print(f"NOTE: {inexact}/{len(exactness)} steps failed the "
                      "bucketed-kNN certificate and were rerun with exact "
                      "brute force")
            elif args.aggregation.startswith("cellblock"):
                print(f"WARNING: {inexact}/{len(exactness)} rollout steps "
                      "failed the exactness certificate (kNN overflow/"
                      "cell-edge bound, cell-block slot overflow, or dropped "
                      "edges — clustered distribution?). Results are "
                      "approximate on those steps. Remedies: a larger "
                      "cellblock capacity (CellBlockSpec), --aggregation "
                      "gather, or --neighbor_method bruteforce.")
            else:
                print(f"WARNING: {inexact}/{len(exactness)} rollout steps "
                      "failed the kNN exactness certificate (clustered "
                      "distribution?) — neighbor graphs were approximate on "
                      "those steps. Rerun with --exactness_guard fallback "
                      "or --neighbor_method bruteforce.")
        else:
            certificate = (
                "kNN + cell-block exactness certificates"
                if args.aggregation.startswith("cellblock")
                else "kNN exactness certificate"
            )
            print(f"{certificate} held for every rollout step")

    print("Calculating errors")
    errors = calculate_rollout_errors(rollout_data, ground_truth)

    try:
        from cosmology_gnn_simulation_tpu.training.plots import (
            plot_rollout_errors,
        )

        plot_rollout_errors(
            errors,
            os.path.join(args.output_dir, "errors.png"),
            args.window_size,
            stats.box_size,
        )
    except Exception as exc:
        print(f"plotting skipped: {exc}")

    np.save(
        os.path.join(args.output_dir, "rollout_coordinates.npy"),
        rollout_data["Coordinates"],
    )
    np.save(
        os.path.join(args.output_dir, "rollout_temperatures.npy"),
        rollout_data["InternalEnergy"],
    )
    write_rollout_summary(
        os.path.join(args.output_dir, "rollout_summary.txt"),
        errors,
        model_path=args.model_path,
        test_data=args.test_data,
        num_particles=rollout_data["Coordinates"].shape[1],
        window_size=args.window_size,
        num_steps=num_steps,
        dt=stats.dt,
        box_size=stats.box_size,
    )
    print(f"Evaluation complete. Results saved to {args.output_dir}")
    return errors


if __name__ == "__main__":
    main()
