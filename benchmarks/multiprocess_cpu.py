"""REAL multi-process execution check (round-2 verdict item 5; round 5
generalizes to N processes and adds a multi-process halo ROLLOUT leg).

Round 2's ``initialize_distributed`` / ``hybrid_device_order`` /
process-local batch placement were exercised only with fake device objects.
This driver runs the genuine article on CPU: ``--processes`` OS processes
(2 or 4), a local gRPC coordinator, ``8 // processes`` virtual devices
each, and on that runtime:

  * ONE halo-exchange TRAIN step on a (data=4, particle=2) mesh whose data
    axis spans the processes (the DCN layout ``make_mesh`` produces) — the
    resulting parameters must match a single-process 8-device run of the
    same step (rtol 1e-5: same program, different collective topology);
  * a 2-step halo ROLLOUT on a (1, 8) mesh whose PARTICLE axis spans the
    processes (slabs ride "DCN") — compared through layout-invariant
    gid-weighted trajectory checksums (slot layouts legitimately differ as
    particles migrate), with the per-step exactness certificate asserted.

Reference counterpart: the ABSENT distributed-comms row of SURVEY.md §2/§5
(the reference installs NCCL and never imports it, ``setup_env.sh:22``).

Usage (from /root/repo):
    python benchmarks/multiprocess_cpu.py [--processes 2]
    python benchmarks/multiprocess_cpu.py --mode worker --process_id 0 ...
Writes benchmarks/results/multiprocess_cpu_p{P}.json (and the legacy
multiprocess_cpu.json name for P=2).
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

# Train leg: (data=4, particle=2) — the data axis spans the processes (one
# or two samples each over "DCN"), the 2 halo slabs stay process-local for
# P=2 ("ICI") and process-local trivially for P=4. N=4096/k=4 supports 2
# noised slabs (halo_layers=2) but not 4.
N, K, B_GLOBAL, SHARDS = 4096, 4, 4, 2
# The rollout leg needs 8 slabs of >= 2 cell layers — N=4096's exact grid
# (9 layers at k=4) cannot host them, so it uses its own larger fixture.
N_ROLLOUT, ROLLOUT_SHARDS, ROLLOUT_STEPS = 32768, 8, 2
LATENT = 16
SEED = 3
TOTAL_DEVICES = 8


def _fixture():
    import jax
    import numpy as np

    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )
    from cosmology_gnn_simulation_tpu.metadata import compute_metadata
    from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
        init_encode_process_decode,
    )
    from cosmology_gnn_simulation_tpu.training.trainer import (
        default_model_config,
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
    return sim, stats, model_config, params


def _train_leg(sim, stats, model_config, params):
    import jax
    import numpy as np

    from cosmology_gnn_simulation_tpu.parallel.halo import (
        choose_halo_config,
        make_halo_train_step,
        partition_batch,
        shard_halo_batch,
    )
    from cosmology_gnn_simulation_tpu.parallel.mesh import make_mesh
    from cosmology_gnn_simulation_tpu.training.trainer import (
        TrainConfig,
        make_optimizer,
    )

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
    return p_flat, metrics


def _rollout_leg(sim, stats, model_config, params):
    """2-step halo rollout with the PARTICLE axis spanning the processes.

    Returns layout-invariant checksums: slot layouts differ legitimately
    between topologies as particles migrate, so the comparison is through
    gid-weighted valid-masked sums (invariant to slot permutation and slab
    assignment), plus the exactness certificate and overflow diagnostics.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cosmology_gnn_simulation_tpu.parallel.halo import (
        choose_halo_config,
        make_halo_rollout,
        partition_windows,
    )
    from cosmology_gnn_simulation_tpu.parallel.mesh import make_mesh

    from cosmology_gnn_simulation_tpu.data.synthetic import (
        generate_synthetic_simulation,
    )

    sim = generate_synthetic_simulation(
        num_snapshots=5, num_particles=N_ROLLOUT, seed=SEED + 1
    )
    hc = choose_halo_config(N_ROLLOUT, K, ROLLOUT_SHARDS)
    mesh = make_mesh((1, ROLLOUT_SHARDS))
    fn = make_halo_rollout(
        model_config, stats, mesh, ROLLOUT_STEPS, hc, num_neighbors=K
    )
    part = partition_windows(
        np.asarray(sim["Coordinates"][:5], np.float32),
        np.asarray(sim["InternalEnergy"][:5], np.float32),
        hc, stats.box_size,
    )
    nproc = jax.process_count()
    if nproc > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rows = ROLLOUT_SHARDS * hc.local_capacity
        r_local = rows // nproc
        lo = jax.process_index() * r_local

        def g(arr, spec, axis):
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(lo, lo + r_local)
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), np.asarray(arr)[tuple(sl)]
            )

        args = (
            params,
            g(part["positions"], P(None, "particle", None), 1),
            g(part["temperatures"], P(None, "particle", None), 1),
            g(part["valid"], P("particle"), 0),
            g(part["gid"], P("particle"), 0),
        )
    else:
        args = (
            params,
            jnp.asarray(part["positions"]),
            jnp.asarray(part["temperatures"]),
            jnp.asarray(part["valid"]),
            jnp.asarray(part["gid"]),
        )

    outs, diag, exactness = fn(*args)

    @jax.jit
    def checksums(outs):
        w = (outs["gid"] % 97 + 1).astype(jnp.float32)[..., None]
        v = outs["valid"].astype(jnp.float32)[..., None]
        return {
            "pos_sum": jnp.sum(outs["positions"] * w * v),
            "temp_sum": jnp.sum(outs["temperatures"] * w * v),
            "valid_count": jnp.sum(outs["valid"].astype(jnp.int32)),
        }

    cs = {k: float(v) for k, v in checksums(outs).items()}
    cs["exactness_all"] = bool(np.asarray(exactness).all())
    cs.update({f"diag_{k}": int(v) for k, v in diag.items()})
    return cs


def _compute_step(out_path: str):
    """Runs inside an initialized (or single-process) JAX runtime: the train
    and rollout legs; process 0 writes params + metrics + checksums."""
    import jax
    import numpy as np

    sim, stats, model_config, params = _fixture()
    p_flat, metrics = _train_leg(sim, stats, model_config, params)
    rollout_cs = _rollout_leg(sim, stats, model_config, params)

    nproc = jax.process_count()
    print(
        f"process {jax.process_index()}/{nproc}: "
        f"devices={jax.local_device_count()} local / {jax.device_count()} "
        f"global, metrics={metrics}, rollout={rollout_cs}", flush=True,
    )
    if jax.process_index() == 0:
        np.savez(
            out_path, *p_flat,
            **{f"m_{k}": v for k, v in metrics.items()},
            **{f"r_{k}": float(v) for k, v in rollout_cs.items()},
        )


def _run_worker(args):
    n_dev = TOTAL_DEVICES // args.num_processes
    os.environ.setdefault(
        "XLA_FLAGS", f"--xla_force_host_platform_device_count={n_dev}"
    )
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
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={TOTAL_DEVICES}",
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    _compute_step(args.out)


def _driver(processes: int):
    import numpy as np

    assert TOTAL_DEVICES % processes == 0 and B_GLOBAL % processes == 0
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
        cwd=repo, env=env(TOTAL_DEVICES), check=True, timeout=1800,
    )

    print(f"spawning {processes} workers (coordinator localhost:{port})...",
          flush=True)
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--mode", "worker",
             "--process_id", str(i), "--num_processes", str(processes),
             "--coordinator", f"localhost:{port}",
             "--out", mp_path],
            cwd=repo, env=env(TOTAL_DEVICES // processes),
        )
        for i in range(processes)
    ]
    for p in procs:
        rc = p.wait(timeout=1800)
        assert rc == 0, f"worker exited with {rc}"

    ref = np.load(ref_path)
    mp = np.load(mp_path)
    param_keys = [k for k in ref.files if not k.startswith(("m_", "r_"))]
    max_rel = 0.0
    for k in param_keys:
        a, b = ref[k], mp[k]
        denom = np.maximum(np.abs(a), 1e-8)
        max_rel = max(max_rel, float(np.max(np.abs(a - b) / denom)))
    metric_diff = {
        k[2:]: abs(float(ref[k]) - float(mp[k]))
        for k in ref.files if k.startswith("m_")
    }
    rollout_rel = {}
    for k in ref.files:
        if not k.startswith("r_"):
            continue
        a, b = float(ref[k]), float(mp[k])
        rollout_rel[k[2:]] = abs(a - b) / max(abs(a), 1e-8)
    rollout_exact_ok = (
        float(ref["r_exactness_all"]) == 1.0
        and float(mp["r_exactness_all"]) == 1.0
    )
    ok = (
        max_rel < 1e-5
        and rollout_exact_ok
        and all(v < 1e-5 for v in rollout_rel.values())
    )
    result = {
        "processes": processes,
        "devices_per_process": TOTAL_DEVICES // processes,
        "mesh_train": f"(data={B_GLOBAL} over DCN, particle={SHARDS})",
        "mesh_rollout": f"(1, {ROLLOUT_SHARDS}) — slabs span the processes",
        "halo_shards": SHARDS,
        "n_particles": N,
        "param_leaves_compared": len(param_keys),
        "max_param_rel_diff_vs_single_process": max_rel,
        "metric_abs_diffs": metric_diff,
        "rollout_checksum_rel_diffs": rollout_rel,
        "rollout_exactness_all_steps": rollout_exact_ok,
        "ok": bool(ok),
    }
    os.makedirs(os.path.join(repo, "benchmarks", "results"), exist_ok=True)
    names = [f"multiprocess_cpu_p{processes}.json"]
    if processes == 2:
        names.append("multiprocess_cpu.json")  # legacy artifact name
    for name in names:
        with open(os.path.join(repo, "benchmarks", "results", name),
                  "w") as f:
            json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2), flush=True)
    if not ok:
        raise SystemExit("multi-process run diverged from single-process")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="driver",
                    choices=["driver", "worker", "reference"])
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.mode == "driver":
        _driver(args.processes)
    elif args.mode == "worker":
        _run_worker(args)
    else:
        _run_reference(args)


if __name__ == "__main__":
    main()
