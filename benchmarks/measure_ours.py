"""Measure THIS framework on the same fixtures/configs as
``measure_reference.py`` — the matched-MSE + same-hardware-throughput side
of the BASELINE comparison.

Modes:
  throughput  — jitted rollout s/step and train s/batch on CPU at the same
                ladder of N as the reference measurement (same single core,
                same data), plus the N=65,536 point the TPU headline uses.
  train       — train on the exact fixture dataset `measure_reference.py
                train` used (same windows, same hyperparameters, same noise)
                and evaluate one-step integrated-space MSE over ALL start
                indices of the same test trajectory.

Run with `JAX_PLATFORMS=cpu` (throughput/train CPU modes) so measurements
are same-hardware against the reference's CPU numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

# Force CPU BEFORE the first device query: this environment pins
# JAX_PLATFORMS=axon and a sitecustomize imports jax at interpreter start,
# so the env-var route alone is ignored (see tests/conftest.py, CLAUDE.md).
# Same-hardware comparison against the reference's CPU numbers requires CPU.
if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

RESULTS_DIR = os.path.join(HERE, "results")
FIXTURE_DIR = os.path.join(HERE, "fixtures")


def _fixture(n, snapshots, seed, path):
    from cosmology_gnn_simulation_tpu.data.hdf5 import write_simulation
    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )

    if not os.path.exists(path):
        write_simulation(path, generate_synthetic_simulation(
            num_snapshots=snapshots, num_particles=n, seed=seed))
    return path


def mode_throughput(args):
    """Same-hardware (CPU) rollout/train timings at the reference's ladder."""
    from cosmology_gnn_simulation_tpu.data.hdf5 import read_simulation
    from cosmology_gnn_simulation_tpu.metadata import generate_metadata
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.rollout import rollout
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig,
        default_model_config,
        make_optimizer,
        make_train_step,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    os.makedirs(RESULTS_DIR, exist_ok=True)
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    sizes = [int(s) for s in args.sizes.split(",")]
    steps = args.steps
    model_config = default_model_config()  # reference defaults
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    rollout_points, train_points = [], []
    for n in sizes:
        sim_path = _fixture(n, 5 + steps, 1, os.path.join(
            FIXTURE_DIR, f"throughput_n{n}.hdf5"))
        meta = generate_metadata(sim_path, os.path.join(
            FIXTURE_DIR, f"throughput_n{n}_metadata_ours.json"))
        stats = NormalizationStats.from_metadata(meta)
        sim = read_simulation(sim_path)
        pos = jnp.asarray(sim["Coordinates"][:5])
        temp = jnp.asarray(sim["InternalEnergy"][:5])

        def run(num_steps):
            out = rollout(params, model_config, pos, temp, stats, num_steps,
                          num_neighbors=16)
            jax.block_until_ready(out)
            return out

        run(1)  # compile both scan lengths? lengths differ -> compile steps
        run(steps)  # compile the measured length
        t0 = time.perf_counter()
        run(steps)
        per_step = (time.perf_counter() - t0) / steps
        r = {"n": n, "steps": steps, "s_per_step": per_step,
             "particle_steps_per_s": n / per_step}
        print(f"ours rollout   N={n}: {per_step:.3f} s/step "
              f"({r['particle_steps_per_s']:.0f} particle-steps/s)",
              flush=True)
        rollout_points.append(r)

        tc = TrainConfig(num_neighbors=16, batch_size=1, noise_std=3e-4)
        optimizer = make_optimizer(tc, steps_per_epoch=1)
        opt_state = optimizer.init(params)
        train_step = make_train_step(model_config, stats, tc, optimizer)
        batch = {
            "positions": np.asarray(sim["Coordinates"][:5])[None],
            "temperatures": np.asarray(sim["InternalEnergy"][:5])[None],
            "target_positions": np.asarray(sim["Coordinates"][5])[None],
            "target_temperatures": np.asarray(sim["InternalEnergy"][5])[None],
        }
        p2, o2, m = train_step(params, opt_state, batch,
                               jax.random.PRNGKey(0))
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for i in range(steps):
            p2, o2, m = train_step(p2, o2, batch, jax.random.PRNGKey(i))
        jax.block_until_ready(m)
        per_batch = (time.perf_counter() - t0) / steps
        t = {"n": n, "batches": steps, "batch_size": 1,
             "s_per_batch": per_batch}
        print(f"ours trainstep N={n}: {per_batch:.3f} s/batch", flush=True)
        train_points.append(t)
        with open(os.path.join(RESULTS_DIR, "ours_cpu_throughput.json"),
                  "w") as f:
            json.dump({"rollout": rollout_points,
                       "train_step": train_points}, f, indent=2)
    print("written to benchmarks/results/ours_cpu_throughput.json")


def mode_train(args):
    """Train on the reference-run's exact fixtures; report one-step MSE."""
    from cosmology_gnn_simulation_tpu.data.dataset import SequenceDataset
    from cosmology_gnn_simulation_tpu.data.hdf5 import read_simulation
    from cosmology_gnn_simulation_tpu.evaluation import validate_one_step
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig,
        Trainer,
        default_model_config,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    os.makedirs(RESULTS_DIR, exist_ok=True)
    n, window = args.n, 5
    train_dir = os.path.join(FIXTURE_DIR, f"mse_train_n{n}")
    val_dir = os.path.join(FIXTURE_DIR, f"mse_val_n{n}")
    test_path = os.path.join(FIXTURE_DIR, f"mse_test_n{n}.hdf5")
    meta_path = os.path.join(FIXTURE_DIR, f"mse_metadata_n{n}.json")
    for path in (train_dir, val_dir, test_path, meta_path):
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} missing — run measure_reference.py train first so "
                "both frameworks use the identical fixture data"
            )
    with open(meta_path) as f:
        meta = json.load(f)
    stats = NormalizationStats.from_metadata(meta)

    model_config = default_model_config(
        window_size=window,
        latent_size=args.latent,
        mlp_hidden_size=args.latent,
        mlp_num_hidden_layers=2,
        num_message_passing_steps=args.mp_steps,
    )
    suffix = f"_{args.compute_dtype}" if args.compute_dtype else ""
    tc = TrainConfig(
        num_neighbors=args.k,
        batch_size=2,
        window_size=window,
        noise_std=args.noise_std,
        num_epochs=args.epochs,
        learning_rate=1e-3,
        final_learning_rate=1e-4,
        seed=args.seed,
        augment_prob=1.0,
        compute_dtype=args.compute_dtype,
        output_dir=os.path.join(
            RESULTS_DIR, f"ours_model_n{n}_s{args.seed}{suffix}"
        ),
    )
    train_ds = SequenceDataset(train_dir, window, meta)
    val_ds = SequenceDataset(val_dir, window, meta)
    trainer = Trainer(model_config, stats, tc, len(train_ds) // 2)
    t0 = time.perf_counter()
    params = trainer.fit(train_ds, val_ds, verbose=True)
    train_time = time.perf_counter() - t0

    test = read_simulation(test_path)
    max_start = test["Coordinates"].shape[0] - window - 1
    result = validate_one_step(
        params, model_config, test, stats, window,
        num_neighbors=args.k, num_timesteps=max_start, seed=0,
    )
    summary = {
        "n": n, "k": args.k, "seed": args.seed, "latent": args.latent, "mp_steps": args.mp_steps,
        "epochs": args.epochs, "noise_std": args.noise_std,
        "compute_dtype": args.compute_dtype,
        "train_wall_s": train_time,
        "one_step_position_mse": result["position_error"],
        "one_step_temperature_mse": result["temperature_error"],
        "platform": jax.default_backend(),
    }
    out = os.path.join(
        RESULTS_DIR, f"ours_mse_n{n}_s{args.seed}{suffix}.json"
    )
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"written to {out}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="mode", required=True)
    p = sub.add_parser("throughput")
    p.add_argument("--sizes", default="2048,4096,8192,16384,65536")
    p.add_argument("--steps", type=int, default=3)
    p.set_defaults(func=mode_throughput)
    p = sub.add_parser("train")
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--latent", type=int, default=64)
    p.add_argument("--mp_steps", type=int, default=5)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--noise_std", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tpu", action="store_true",
                   help="run on the TPU instead of forcing CPU")
    p.add_argument("--compute_dtype", type=str, default=None,
                   help="e.g. bfloat16 — the TPU training precision policy "
                        "(matmuls + the aggregation gather carried in bf16)")
    p.set_defaults(func=mode_train)
    args = parser.parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
