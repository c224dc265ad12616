"""Measure the PyTorch reference on this machine's CPU.

The reference's PyG/torch_cluster/torch_scatter stack is not installable here
(no network egress), so this driver runs the reference's OWN code from
`/root/reference` through the minimal dependency shim in `ref_shim/`
(see ref_shim/README.md for the substitution audit). Everything timed below
executes the reference's unmodified functions: `data_utils.preprocess`,
`graph_network.EncodeProcessDecode`, `render_rollout.rollout`,
`train.momentum_conservation_loss`.

Modes:
  throughput  — rollout s/step and train s/step at a ladder of N, plus a
                cost-model fit (a*N^2 for the 27x-ghost kNN + b*N for the
                rest) extrapolated to N=65,536 (the BASELINE headline size).
  train       — run the reference's full `train.train()` on a fixture
                dataset, then its `one_step_test.validate_one_step` — the
                accuracy anchor for the matched-MSE comparison.

Run with `JAX_PLATFORMS=cpu` so the interpreter-level jax import (this
machine's sitecustomize) does not touch the single-tenant TPU.

Results land in benchmarks/results/ as JSON; BASELINE.md summarizes them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(HERE, "ref_shim"))
sys.path.insert(0, REPO)  # for the synthetic fixture generator
sys.path.insert(0, "/root/reference")

os.environ.setdefault("MPLBACKEND", "Agg")

import numpy as np  # noqa: E402
import torch  # noqa: E402

RESULTS_DIR = os.path.join(HERE, "results")
FIXTURE_DIR = os.path.join(HERE, "fixtures")


def make_fixture(n_particles: int, snapshots: int, seed: int, path: str):
    from cosmology_gnn_simulation_tpu.data.hdf5 import write_simulation
    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )

    if not os.path.exists(path):
        sim = generate_synthetic_simulation(
            num_snapshots=snapshots, num_particles=n_particles, seed=seed
        )
        write_simulation(path, sim)
    return path


def make_metadata(sim_path: str, out_path: str):
    from generate_metadata import generate_metadata  # reference's own

    generate_metadata(sim_path, out_path)
    with open(out_path) as f:
        return json.load(f)


def build_model(latent=128, hidden=128, layers=2, mp_steps=10):
    from graph_network import EncodeProcessDecode

    torch.manual_seed(0)
    return EncodeProcessDecode(
        latent_size=latent,
        mlp_hidden_size=hidden,
        mlp_num_hidden_layers=layers,
        num_message_passing_steps=mp_steps,
        output_size=3,
    )


def measure_rollout(n: int, steps: int, window: int = 5) -> dict:
    """Time the reference's rollout loop (render_rollout.py:26-90) per step."""
    import h5py
    from render_rollout import rollout

    sim_path = make_fixture(n, window + steps, seed=1, path=os.path.join(
        FIXTURE_DIR, f"throughput_n{n}.hdf5"))
    meta = make_metadata(sim_path, os.path.join(
        FIXTURE_DIR, f"throughput_n{n}_metadata.json"))
    with h5py.File(sim_path, "r") as f:
        data = {
            "Coordinates": torch.tensor(f["Coordinates"][:]),
            "InternalEnergy": torch.tensor(f["InternalEnergy"][:]),
        }
    model = build_model()  # reference defaults (config.py:16-23); k=16 is
    # hardcoded inside rollout (render_rollout.py:50)

    # Warm-up: one step (LazyLinear materialization + allocator warm-up).
    warm = {k: v[: window + 1] for k, v in data.items()}
    rollout(model, warm, meta, 0.0, meta["dt"], meta["box_size"],
            window_size=window)

    t0 = time.perf_counter()
    rollout(model, data, meta, 0.0, meta["dt"], meta["box_size"],
            window_size=window)
    elapsed = time.perf_counter() - t0
    per_step = elapsed / steps
    return {
        "n": n, "steps": steps, "s_per_step": per_step,
        "particle_steps_per_s": n / per_step,
    }


def measure_train_step(n: int, num_batches: int, window: int = 5,
                       batch_size: int = 1) -> dict:
    """Time the reference's training inner loop (train.py:219-265): per-sample
    host preprocess -> Batch -> forward -> 3-part loss -> backward -> Adam."""
    import h5py
    import torch_geometric as pyg
    from data_utils import preprocess
    from train import momentum_conservation_loss

    sim_path = make_fixture(n, window + num_batches * batch_size + 1, seed=2,
                            path=os.path.join(FIXTURE_DIR, f"train_n{n}.hdf5"))
    meta = make_metadata(sim_path, os.path.join(
        FIXTURE_DIR, f"train_n{n}_metadata.json"))
    with h5py.File(sim_path, "r") as f:
        coords = torch.tensor(f["Coordinates"][:])
        energy = torch.tensor(f["InternalEnergy"][:])

    model = build_model()
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-4)
    loss_fn = torch.nn.MSELoss()

    def one_batch(start):
        graphs = []
        for b in range(batch_size):
            s = start + b
            graphs.append(preprocess(
                position_seq=coords[s: s + window],
                target_position=coords[s + window],
                temperature_seq=energy[s: s + window],
                target_temperature=energy[s + window],
                metadata=meta, noise_std=3e-4, num_neighbors=16,
                dt=meta["dt"], box_size=meta["box_size"],
            ))
        batch_graph = pyg.data.Batch.from_data_list(graphs)
        predictions = model(batch_graph)
        acc_loss = loss_fn(predictions["acceleration"], batch_graph.y_acc)
        temp_loss = loss_fn(predictions["temp_rate"], batch_graph.y_temp_rate)
        mom_loss = momentum_conservation_loss(
            predictions["acceleration"], batch_graph, meta["dt"], 0.0)
        loss = acc_loss + temp_loss + mom_loss
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()

    one_batch(0)  # warm-up (LazyLinear materialization)
    t0 = time.perf_counter()
    for i in range(num_batches):
        one_batch(1 + i * batch_size)
    per_batch = (time.perf_counter() - t0) / num_batches
    return {
        "n": n, "batches": num_batches, "batch_size": batch_size,
        "s_per_batch": per_batch,
        "particle_updates_per_s": n * batch_size / per_batch,
    }


def fit_and_extrapolate(points, target_n: int):
    """Least-squares fit s_per_step = a*N^2 + b*N (27x-ghost kNN is O(N*27N),
    the model/edge work is O(N*k)); extrapolate to target_n."""
    ns = np.array([p["n"] for p in points], dtype=np.float64)
    ts = np.array([p["s_per_step"] for p in points], dtype=np.float64)
    A = np.stack([ns**2, ns], axis=1)
    coef, *_ = np.linalg.lstsq(A, ts, rcond=None)
    a, b = float(coef[0]), float(coef[1])
    pred = a * target_n**2 + b * target_n
    return {"a_quadratic": a, "b_linear": b, "target_n": target_n,
            "s_per_step_extrapolated": pred,
            "particle_steps_per_s_extrapolated": target_n / pred}


def mode_throughput(args):
    os.makedirs(RESULTS_DIR, exist_ok=True)
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    sizes = [int(s) for s in args.sizes.split(",")]
    rollout_points, train_points = [], []
    partial_path = os.path.join(RESULTS_DIR, "reference_throughput_partial.json")
    for n in sizes:
        r = measure_rollout(n, steps=args.steps)
        print(f"rollout   N={n}: {r['s_per_step']:.3f} s/step "
              f"({r['particle_steps_per_s']:.0f} particle-steps/s)", flush=True)
        rollout_points.append(r)
        t = measure_train_step(n, num_batches=args.steps)
        print(f"trainstep N={n}: {t['s_per_batch']:.3f} s/batch", flush=True)
        train_points.append(t)
        with open(partial_path, "w") as f:  # survive interruption
            json.dump({"rollout": rollout_points, "train_step": train_points},
                      f, indent=2)
    result = {
        "machine": "single-core CPU (this container), torch "
                   + torch.__version__,
        "threads": torch.get_num_threads(),
        "rollout": rollout_points,
        "train_step": train_points,
        "rollout_fit_65536": fit_and_extrapolate(rollout_points, 65536),
        "train_fit_32768": fit_and_extrapolate(
            [{"n": p["n"], "s_per_step": p["s_per_batch"]}
             for p in train_points], 32768),
    }
    out = os.path.join(RESULTS_DIR, "reference_throughput.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print(f"written to {out}")


def mode_train(args):
    """Full reference training + one-step eval on the matched-MSE fixture."""
    os.makedirs(RESULTS_DIR, exist_ok=True)
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    n, window = args.n, 5
    train_dir = os.path.join(FIXTURE_DIR, f"mse_train_n{n}")
    val_dir = os.path.join(FIXTURE_DIR, f"mse_val_n{n}")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)
    make_fixture(n, 20, seed=10, path=os.path.join(train_dir, "sim0.hdf5"))
    make_fixture(n, 20, seed=11, path=os.path.join(train_dir, "sim1.hdf5"))
    make_fixture(n, 12, seed=12, path=os.path.join(val_dir, "sim0.hdf5"))
    test_path = make_fixture(
        n, 20, seed=13, path=os.path.join(FIXTURE_DIR, f"mse_test_n{n}.hdf5"))
    meta_path = os.path.join(FIXTURE_DIR, f"mse_metadata_n{n}.json")
    meta = make_metadata(os.path.join(train_dir, "sim0.hdf5"), meta_path)

    out_dir = os.path.join(RESULTS_DIR, f"reference_model_n{n}_s{args.seed}")
    argv = [
        "train.py",
        "--train_dir", train_dir, "--val_dir", val_dir,
        "--metadata_path", meta_path, "--output_dir", out_dir,
        "--num_neighbors", str(args.k), "--batch_size", "2",
        "--window_size", str(window),
        "--latent_size", str(args.latent),
        "--mlp_hidden_size", str(args.latent),
        "--mlp_num_hidden_layers", "2",
        "--num_message_passing_steps", str(args.mp_steps),
        "--noise_std", str(args.noise_std),
        "--num_epochs", str(args.epochs),
        "--learning_rate", "1e-3", "--final_learning_rate", "1e-4",
        "--device", "cpu", "--seed", str(args.seed),
    ]
    import train as ref_train

    t0 = time.perf_counter()
    old_argv = sys.argv
    sys.argv = argv
    try:
        ref_train.train()
    finally:
        sys.argv = old_argv
    train_time = time.perf_counter() - t0

    # One-step evaluation with the reference's own evaluator
    # (one_step_test.py:26-124), noise 0, seeded start indices.
    from one_step_test import load_model, validate_one_step

    class A:  # the args namespace load_model expects
        latent_size = args.latent
        mlp_hidden_size = args.latent
        mlp_num_hidden_layers = 2
        num_message_passing_steps = args.mp_steps
        output_size = 3
        device = "cpu"

    model = load_model(os.path.join(out_dir, "model_best.pth"), A)
    np.random.seed(123)
    # num_timesteps > max_start_idx makes the evaluator cover EVERY start
    # index (one_step_test.py:41-43) — no sampling noise in the comparison.
    result = validate_one_step(
        model, test_path, meta, window, "cpu",
        num_neighbors=args.k, num_timesteps=10_000, noise_std=0.0,
    )
    summary = {
        "n": n, "k": args.k, "seed": args.seed, "latent": args.latent,
        "mp_steps": args.mp_steps, "epochs": args.epochs,
        "noise_std": args.noise_std,
        "train_wall_s": train_time,
        "one_step_position_mse": float(result["position_error"]),
        "one_step_temperature_mse": float(result["temperature_error"]),
        "fixture": {"train_dir": train_dir, "val_dir": val_dir,
                    "test": test_path, "metadata": meta_path},
    }
    out = os.path.join(RESULTS_DIR, f"reference_mse_n{n}_s{args.seed}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    print(f"written to {out}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="mode", required=True)
    p = sub.add_parser("throughput")
    p.add_argument("--sizes", default="2048,4096,8192")
    p.add_argument("--steps", type=int, default=3)
    p.set_defaults(func=mode_throughput)
    p = sub.add_parser("train")
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--latent", type=int, default=64)
    p.add_argument("--mp_steps", type=int, default=5)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--noise_std", type=float, default=3e-4)
    p.set_defaults(func=mode_train)
    args = parser.parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
