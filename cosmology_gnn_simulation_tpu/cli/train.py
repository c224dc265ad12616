"""``python -m cosmology_gnn_simulation_tpu.cli.train`` — training entry
point (CLI parity with ``python train.py`` in the reference,
``/root/reference/train.py:391-392``)."""

from __future__ import annotations

from cosmology_gnn_simulation_tpu.config import get_config
from cosmology_gnn_simulation_tpu.data.dataset import SequenceDataset
from cosmology_gnn_simulation_tpu.training.trainer import (
    TrainConfig,
    Trainer,
    default_model_config,
)
from cosmology_gnn_simulation_tpu.types import NormalizationStats
from cosmology_gnn_simulation_tpu.utils import checkpoint as ckpt_lib


def main(argv=None):
    args = get_config(argv)
    stats = NormalizationStats.from_metadata(args.metadata)
    print(f"Using time step (dt): {stats.dt}")
    print(f"Using box size: {stats.box_size}")

    if getattr(args, "native_loader", False):
        from cosmology_gnn_simulation_tpu.data import native_loader

        if native_loader.is_available():
            train_dataset = native_loader.open_directory(
                args.train_dir, args.window_size
            )
            val_dataset = native_loader.open_directory(
                args.val_dir, args.window_size
            )
            print("Using native C++ batch loader")
        else:
            print("Native loader unavailable; falling back to Python loader")
            train_dataset = val_dataset = None
    else:
        train_dataset = val_dataset = None
    if train_dataset is None:
        # Restrict to the two fields the model consumes (the dataset can
        # serve every HDF5 field, but loading Velocities/HydroAcceleration
        # per cached file would triple IO for no training benefit).
        model_fields = ("Coordinates", "InternalEnergy")
        train_dataset = SequenceDataset(
            args.train_dir, args.window_size, args.metadata,
            fields=model_fields,
        )
        val_dataset = SequenceDataset(
            args.val_dir, args.window_size, args.metadata,
            fields=model_fields,
        )

    model_config = default_model_config(
        window_size=args.window_size,
        latent_size=args.latent_size,
        mlp_hidden_size=args.mlp_hidden_size,
        mlp_num_hidden_layers=args.mlp_num_hidden_layers,
        num_message_passing_steps=args.num_message_passing_steps,
        output_size=args.output_size,
        aggregate=args.aggregate,
        remat=getattr(args, "remat", False),
        remat_chunk=getattr(args, "remat_chunk", None),
        carry_dtype=getattr(args, "carry_dtype", None),
    )
    train_config = TrainConfig(
        num_neighbors=args.num_neighbors,
        batch_size=args.batch_size,
        window_size=args.window_size,
        noise_std=args.noise_std,
        num_epochs=args.num_epochs,
        learning_rate=args.learning_rate,
        final_learning_rate=args.final_learning_rate,
        weight_decay=args.weight_decay,
        seed=args.seed,
        save_every=args.save_every,
        augment_prob=args.augment_prob,
        acc_loss_weight=args.acc_loss_weight,
        temp_rate_loss_weight=args.temp_rate_loss_weight,
        momentum_loss_weight=args.momentum_loss_weight,
        output_dir=args.output_dir,
        compute_dtype=args.compute_dtype,
        neighbor_method=args.neighbor_method,
        strict_neighbor_check=not args.no_strict_neighbors,
        aggregation=getattr(args, "aggregation", "auto"),
        cellblock_variable=getattr(args, "cellblock_variable", False),
        fused_tail=getattr(args, "fused_tail", None),
    )
    if train_config.aggregation.startswith("cellblock") and (
        getattr(args, "spatial_shards", 0) > 1
        or getattr(args, "data_parallel", False)
        or getattr(args, "distributed", False)
    ):
        raise SystemExit(
            "--aggregation cellblock is single-device only (the slot-space "
            "forward is incompatible with particle/data sharding); drop the "
            "--spatial_shards/--data_parallel/--distributed flags"
        )
    steps_per_epoch = max(len(train_dataset) // args.batch_size, 1)

    init_params = None
    if args.pretrained_model:
        try:
            restored = ckpt_lib.load_checkpoint(args.pretrained_model)
            init_params = restored["params"]
            print(f"Starting from pretrained model: {args.pretrained_model}")
        except Exception as exc:
            # The reference continues with random weights on load failure
            # (train.py:99-105); we keep the behavior but make it loud.
            print(f"Error loading pretrained model ({exc}); "
                  "continuing with random init")

    if getattr(args, "distributed", False):
        from cosmology_gnn_simulation_tpu.parallel.mesh import (
            initialize_distributed,
        )

        if initialize_distributed():
            import jax

            print(
                f"Multi-process runtime: process "
                f"{jax.process_index()}/{jax.process_count()}, "
                f"{jax.local_device_count()} local devices (data axis over "
                f"DCN, particle axis over ICI)"
            )
        else:
            print("--distributed: no coordinator configured; "
                  "running single-process")

    mesh = None
    halo = None
    spatial = getattr(args, "spatial_shards", 0) or 0
    if spatial > 1:
        import jax

        from cosmology_gnn_simulation_tpu.parallel.halo import (
            choose_halo_config,
        )
        from cosmology_gnn_simulation_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        if n_dev % spatial:
            raise ValueError(
                f"--spatial_shards {spatial} must divide the device count "
                f"{n_dev}"
            )
        mesh = make_mesh((n_dev // spatial, spatial))
        try:
            # Size capacities from measured occupancies (clustered data
            # overflows the uniform plan at partition time otherwise).
            first = next(iter(train_dataset.batches(1, shuffle=False)))
            sample_positions = first["positions"][0, -1]
        except StopIteration:
            sample_positions = None
        halo = choose_halo_config(
            train_dataset.num_particles, args.num_neighbors, spatial,
            noise=args.noise_std > 0,
            positions=sample_positions,
            box=float(stats.box_size),
        )
        print(
            f"Halo-sharded training: {spatial} spatial shards x "
            f"{n_dev // spatial} data shards; grid {halo.grid_size}, "
            f"halo {halo.halo_layers} layer(s)"
        )
    elif getattr(args, "data_parallel", False):
        import jax

        from cosmology_gnn_simulation_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        mesh = make_mesh((n_dev, 1))
        print(f"Data-parallel training over {n_dev} devices")

    trainer = Trainer(
        model_config, stats, train_config, steps_per_epoch, init_params,
        mesh=mesh, halo=halo,
    )
    start_epoch = 0
    if args.resume:
        start_epoch = trainer.restore(args.resume)
        print(f"Resumed from {args.resume}; continuing at epoch {start_epoch}")
    trainer.fit(train_dataset, val_dataset, start_epoch=start_epoch)
    return trainer


if __name__ == "__main__":
    main()
