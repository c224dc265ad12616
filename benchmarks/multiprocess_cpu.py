"""REAL multi-process execution check (round-2 verdict item 5).

Round 2's ``initialize_distributed`` / ``hybrid_device_order`` /
process-local batch placement were exercised only with fake device objects.
This driver runs the genuine article on CPU: TWO OS processes, a local gRPC
coordinator, 4 virtual devices each, a (data=2, particle=4) mesh whose data
axis spans the processes (the DCN layout ``make_mesh`` produces), and ONE
halo-exchange train step on a shared deterministic fixture — then asserts
the resulting parameters match a single-process 8-device run of the same
step bit-for-nearly (rtol 1e-6: same program, different collective
topology).

Reference counterpart: the ABSENT distributed-comms row of SURVEY.md §2/§5
(the reference installs NCCL and never imports it, ``setup_env.sh:22``).

Usage (from /root/repo):
    python benchmarks/multiprocess_cpu.py            # full driver
    python benchmarks/multiprocess_cpu.py --mode worker --process_id 0 ...
Writes benchmarks/results/multiprocess_cpu.json.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (data=4, particle=2): the data axis spans the two processes (2 samples
# each over "DCN"), the 2 halo slabs stay process-local ("ICI") — N=4096/k=4
# supports 2 noised slabs (halo_layers=2) but not 4.
N, K, B_GLOBAL, SHARDS = 4096, 4, 4, 2
LATENT = 16
SEED = 3


def _compute_step(out_path: str):
    """Runs inside an initialized (or single-process) JAX runtime: one halo
    train step on the deterministic fixture; process 0 writes params+metrics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )
    from cosmology_gnn_simulation_tpu.metadata import compute_metadata
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.parallel.halo import (
        choose_halo_config,
        make_halo_train_step,
        partition_batch,
        shard_halo_batch,
    )
    from cosmology_gnn_simulation_tpu.parallel.mesh import make_mesh
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig,
        default_model_config,
        make_optimizer,
    )
    from cosmology_gnn_simulation_tpu.types import NormalizationStats

    sim = generate_synthetic_simulation(num_snapshots=5 + B_GLOBAL,
                                        num_particles=N, seed=SEED)
    stats = NormalizationStats.from_metadata(compute_metadata(sim))
    model_config = default_model_config(
        window_size=5, latent_size=LATENT, mlp_hidden_size=LATENT,
        mlp_num_hidden_layers=1, num_message_passing_steps=2,
    )
    params = init_encode_process_decode(jax.random.PRNGKey(0), model_config)
    tc = TrainConfig(num_neighbors=K, batch_size=B_GLOBAL, noise_std=3e-4,
                     augment_prob=0.0, momentum_loss_weight=0.5)
    optimizer = make_optimizer(tc, steps_per_epoch=1)
    opt_state = optimizer.init(params)

    hc = choose_halo_config(N, K, SHARDS, noise=True)
    mesh = make_mesh((B_GLOBAL, SHARDS))
    step = make_halo_train_step(model_config, stats, tc, optimizer, mesh, hc)

    batch = {
        "positions": np.stack(
            [sim["Coordinates"][i:i + 5] for i in range(B_GLOBAL)]
        ),
        "temperatures": np.stack(
            [sim["InternalEnergy"][i:i + 5] for i in range(B_GLOBAL)]
        ),
        "target_positions": np.stack(
            [sim["Coordinates"][i + 5] for i in range(B_GLOBAL)]
        ),
        "target_temperatures": np.stack(
            [sim["InternalEnergy"][i + 5] for i in range(B_GLOBAL)]
        ),
    }
    part = partition_batch(batch, hc, stats.box_size)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(5), B_GLOBAL))

    nproc = jax.process_count()
    if nproc > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        b_local = B_GLOBAL // nproc
        lo = jax.process_index() * b_local
        local_part = {k: v[lo:lo + b_local] for k, v in part.items()}
        sharded = shard_halo_batch(local_part, mesh)
        keys = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), keys[lo:lo + b_local]
        )
    else:
        sharded = shard_halo_batch(part, mesh)

    p_new, _, metrics = step(params, opt_state, sharded, keys)
    p_flat = [np.asarray(x) for x in jax.tree.leaves(p_new)]
    metrics = {k: float(v) for k, v in metrics.items()}
    print(
        f"process {jax.process_index()}/{nproc}: "
        f"devices={jax.local_device_count()} local / {jax.device_count()} "
        f"global, metrics={metrics}", flush=True,
    )
    if jax.process_index() == 0:
        np.savez(out_path, *p_flat, **{f"m_{k}": v for k, v in metrics.items()})


def _run_worker(args):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cosmology_gnn_simulation_tpu.parallel.mesh import (
        initialize_distributed,
    )

    assert initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    ), "initialize_distributed returned False despite explicit coordinator"
    _compute_step(args.out)


def _run_reference(args):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    _compute_step(args.out)


def _driver():
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    tmp = tempfile.mkdtemp()
    ref_path = os.path.join(tmp, "ref.npz")
    mp_path = os.path.join(tmp, "mp.npz")

    def env(n_dev):
        e = dict(os.environ)
        e["JAX_PLATFORMS"] = "cpu"
        e["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
        e.pop("PYTHONPATH", None)
        return e

    print("running single-process 8-device reference...", flush=True)
    subprocess.run(
        [sys.executable, __file__, "--mode", "reference", "--out", ref_path],
        cwd=repo, env=env(8), check=True, timeout=900,
    )

    print(f"spawning 2 workers (coordinator localhost:{port})...", flush=True)
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--mode", "worker",
             "--process_id", str(i), "--num_processes", "2",
             "--coordinator", f"localhost:{port}",
             "--out", mp_path],
            cwd=repo, env=env(4),
        )
        for i in range(2)
    ]
    for p in procs:
        rc = p.wait(timeout=900)
        assert rc == 0, f"worker exited with {rc}"

    ref = np.load(ref_path)
    mp = np.load(mp_path)
    param_keys = [k for k in ref.files if not k.startswith("m_")]
    max_rel = 0.0
    for k in param_keys:
        a, b = ref[k], mp[k]
        denom = np.maximum(np.abs(a), 1e-8)
        max_rel = max(max_rel, float(np.max(np.abs(a - b) / denom)))
    metric_diff = {
        k[2:]: abs(float(ref[k]) - float(mp[k]))
        for k in ref.files if k.startswith("m_")
    }
    ok = max_rel < 1e-5
    result = {
        "processes": 2,
        "devices_per_process": 4,
        "mesh": "(data=4 over DCN, particle=2 over ICI)",
        "halo_shards": SHARDS,
        "n_particles": N,
        "param_leaves_compared": len(param_keys),
        "max_param_rel_diff_vs_single_process": max_rel,
        "metric_abs_diffs": metric_diff,
        "ok": bool(ok),
    }
    os.makedirs(os.path.join(repo, "benchmarks", "results"), exist_ok=True)
    out = os.path.join(repo, "benchmarks", "results", "multiprocess_cpu.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2), flush=True)
    if not ok:
        raise SystemExit("multi-process params diverged from single-process")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="driver",
                    choices=["driver", "worker", "reference"])
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.mode == "driver":
        _driver()
    elif args.mode == "worker":
        _run_worker(args)
    else:
        _run_reference(args)


if __name__ == "__main__":
    main()
