"""Jitted training loop.

Where the reference runs per-sample host-side graph building inside the batch
loop and crosses to the device once per batch (``/root/reference/train.py:
219-265``), the entire step here — device-side axis-permutation augmentation,
noise, k-NN graph construction, forward, 3-component loss, backward, Adam
update — is a single jitted, vmapped function. One compilation, zero
host-side featurization.

Replicated training semantics:
* Adam (torch defaults) + optional L2 weight decay folded into the gradient,
  matching ``torch.optim.Adam(weight_decay=...)`` (``train.py:183``);
* per-epoch exponential LR decay with gamma = (final/initial)^(1/epochs)
  (``train.py:184-187,316``);
* xyz axis-permutation augmentation with probability ``augment_prob`` per
  sample, applied to input and target coordinates (``dataloader.py:137-150``
  — run here on device; velocities are derived from coordinates inside
  featurization, so permuting coordinates covers every 3-vector field);
* validation with noise_std forced to 0 (``train.py:304``);
* best/periodic/final checkpoints + ``training_history.json``
  (``train.py:329-387``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosmology_gnn_simulation_tpu.featurize import featurize, node_feature_size
from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    EncodeProcessDecodeConfig,
    apply_encode_process_decode,
    init_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.training.losses import combined_loss
from cosmology_gnn_simulation_tpu.types import NormalizationStats
from cosmology_gnn_simulation_tpu.utils import checkpoint as ckpt_lib

# All 6 permutations of the xyz axes (dataloader.py:141-150 draws
# torch.randperm(3); uniform over these).
_AXIS_PERMS = np.array(
    [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]],
    dtype=np.int32,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (defaults = reference ``config.py:16-36``)."""

    num_neighbors: int = 16
    batch_size: int = 1
    window_size: int = 5
    noise_std: float = 0.0
    num_epochs: int = 10
    learning_rate: float = 1e-4
    final_learning_rate: float = 1e-4
    weight_decay: float = 0.0
    seed: int = 42
    save_every: int = 10
    augment_prob: float = 1.0
    acc_loss_weight: float = 1.0
    temp_rate_loss_weight: float = 1.0
    momentum_loss_weight: float = 0.0
    output_dir: str = "model_output"
    compute_dtype: Optional[str] = None  # e.g. "bfloat16"
    neighbor_query_tile: int = 512
    neighbor_method: str = "auto"
    # Abort (True) vs warn (False) when the bucketed-kNN exactness
    # certificate fails on the first batch — clustered data can silently
    # degrade neighbor graphs otherwise.
    strict_neighbor_check: bool = True
    # Custom-VJP aggregation: sort the edge stream by sender once per graph
    # so the backward pass is a prefix-sum difference instead of a TPU
    # scatter-add (ops/aggregation.py). Exact for any neighbor table.
    build_reverse: bool = True
    # Message-passing aggregation backend: "gather" (fused gather+sum with
    # the sorted-edge VJP), "cellblock" (selection-matrix MXU kernel,
    # ops/cellblock.py, slot-space carry — the big-N path; BASELINE
    # config 4 training at N=500k/H=256 is bandwidth-bound on the gather)
    # or "cellblock_hybrid" (same kernel, particle-space carry — trades
    # per-step expand/compact gathers for the slot-padding row tax; the
    # flagship-scale winner). Cellblock training builds the reverse
    # selection table once per graph so the backward is the same kernel
    # transposed; exactness is certified per batch
    # (``cellblock_violations`` metric, checked at epoch end).
    # "auto" (default) resolves by particle count on first batch via
    # ops.cellblock.choose_aggregation — the measured dispatch table:
    # gather below 32k / non-TPU / unpruned models, hybrid to 250k,
    # slots above.
    aggregation: str = "auto"
    # Variable per-column slot capacities for the cellblock layouts
    # (ops/cellblock.py CellBlockSpec.slot_budget): cuts the slot-padding
    # row tax from the Poisson tail (~1.3-1.4x) to the QB-rounding floor
    # (~1.1x). Same semantics/certificates; cubic-periodic specs only.
    cellblock_variable: bool = False
    # Fused step-tail Pallas kernel in the TRAIN step (ops/fused_step.py;
    # differentiable since round 4 — fused recompute-backward with in-VMEM
    # weight-grad accumulation). None = auto: on for real-TPU pruned bf16
    # training, off elsewhere (interpret mode is correct but slow on CPU;
    # f32 in-kernel matmuls are a Mosaic accuracy hazard on real TPU).
    fused_tail: Optional[bool] = None
    # Key training noise per GLOBAL particle id instead of per row stream
    # (ops/noise.py): the noise a particle receives is then independent of
    # data layout, so single-device and halo-sharded training produce
    # IDENTICAL numbers. The halo path always uses gid keying; setting this
    # makes the single-device path match it (same distribution either way).
    partition_invariant_noise: bool = False
    # Failure detection (reference has none, SURVEY.md §5): abort the run
    # with a clear report when the loss goes non-finite.
    halt_on_nonfinite: bool = True
    # Optional jax.profiler trace of one epoch, written under output_dir.
    profile_epoch: Optional[int] = None


def _augment_axes(key: jax.Array, positions, target_positions, augment_prob):
    """Random xyz permutation with probability ``augment_prob`` (on device)."""
    pk, uk = jax.random.split(key)
    perm = jnp.asarray(_AXIS_PERMS)[jax.random.randint(pk, (), 0, 6)]
    perm = jnp.where(
        jax.random.uniform(uk) < augment_prob, perm, jnp.arange(3)
    )
    return positions[..., perm], target_positions[..., perm]


def make_train_step(
    model_config: EncodeProcessDecodeConfig,
    stats: NormalizationStats,
    train_config: TrainConfig,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Build the jitted train step: ``(params, opt_state, batch, key) ->
    (params, opt_state, metrics)``. ``batch`` holds ``positions [B,T,N,3]``,
    ``temperatures [B,T,N,1]``, ``target_positions [B,N,3]``,
    ``target_temperatures [B,N,1]``."""
    tc = train_config
    dtype = jnp.dtype(tc.compute_dtype) if tc.compute_dtype else None
    if tc.aggregation not in ("auto", "gather", "cellblock",
                              "cellblock_hybrid"):
        raise ValueError(f"unknown aggregation: {tc.aggregation}")
    if tc.aggregation == "auto":
        # Resolve from the first batch's particle count (static per run —
        # batch shapes are fixed), then build the real step once.
        state = {}

        def dispatching_step(params, opt_state, batch, key):
            if "step" not in state:
                from cosmology_gnn_simulation_tpu.ops.cellblock import (
                    choose_aggregation,
                )

                resolved = choose_aggregation(
                    batch["positions"].shape[2],
                    training=True,
                    pruned=(
                        model_config.aggregate == "sender_latents"
                        and model_config.prune_dead_edge_stream
                    ),
                )
                state["step"] = make_train_step(
                    model_config, stats,
                    dataclasses.replace(tc, aggregation=resolved), optimizer,
                )
            return state["step"](params, opt_state, batch, key)

        return dispatching_step
    if tc.aggregation.startswith("cellblock") and not (
        model_config.aggregate == "sender_latents"
        and model_config.prune_dead_edge_stream
    ):
        raise ValueError(
            "aggregation='cellblock' requires the pruned sender_latents mode"
        )
    # The pruned sender-latents model never reads edge features — skip
    # their [N, k, 4] gather in the hot loop.
    pruned = (
        model_config.aggregate == "sender_latents"
        and model_config.prune_dead_edge_stream
    )
    need_edges = not pruned
    fused = tc.fused_tail
    if fused is None:
        # Same auto rule as rollout(): the kernel is bf16-only on real TPU
        # and interpret-slow on CPU.
        fused = (
            pruned
            and jax.default_backend() == "tpu"
            and dtype is not None
            and jnp.dtype(dtype) == jnp.bfloat16
        )
    elif fused and not pruned:
        raise ValueError("fused_tail requires the pruned sender_latents mode")
    if fused:
        model_config = model_config._replace(fused_tail=True)

    def per_sample(params, pos, temp, tpos, ttemp, key):
        aug_key, feat_key = jax.random.split(key)
        pos, tpos = _augment_axes(aug_key, pos, tpos, tc.augment_prob)
        noise_gids = (
            jnp.arange(pos.shape[1], dtype=jnp.int32)
            if tc.partition_invariant_noise else None
        )
        cellblock = tc.aggregation.startswith("cellblock")
        graph = featurize(
            pos,
            temp,
            stats,
            feat_key,
            noise_std=tc.noise_std,
            num_neighbors=tc.num_neighbors,
            target_position=tpos,
            target_temperature=ttemp,
            neighbor_query_tile=tc.neighbor_query_tile,
            neighbor_method=tc.neighbor_method,
            build_reverse=tc.build_reverse and not cellblock,
            build_edges=need_edges,
            noise_gids=noise_gids,
            with_codes=cellblock,
            # The cell-block pipeline never reads neighbor IDS — request
            # the kNN kernel's single-payload codes mode (round 5: the
            # dual id+code carriage costs ~200 ms per config-4 train step,
            # config4_r5.json; other backends still return ids + no codes
            # and the plan build takes its aux path).
            codes_only=cellblock and not need_edges,
        )
        codes = codes_cap = spill = None
        if cellblock:
            # Pallas-kNN candidate codes (same grid as the cell-block spec
            # below — both use choose_cell_grid(n, k)): the plan build
            # decodes sender slots arithmetically instead of the
            # pathological aux[neighbors] gather. None on CPU backends.
            graph, codes, codes_cap, spill = graph
        if not cellblock:
            preds = apply_encode_process_decode(
                params, graph, model_config, dtype
            )
            return (
                preds, graph.target_acceleration, graph.target_temp_rate,
                jnp.zeros((), jnp.int32),
            )
        # Cell-block training: plan + BOTH selection tables (forward and
        # its transpose for the custom VJP) built once per graph, rows
        # permuted into cell-sorted order. The losses are row-permutation
        # invariant, so targets are permuted instead of un-permuting preds.
        from cosmology_gnn_simulation_tpu.ops.cellblock import (
            build_cellblock,
            choose_cellblock_spec,
        )

        spec = choose_cellblock_spec(
            pos.shape[1], tc.num_neighbors,
            variable=tc.cellblock_variable,
        )
        plan = build_cellblock(
            graph.positions, graph.neighbors, stats.box_size, spec,
            with_reverse=True,
            neighbor_codes=codes, codes_cap=codes_cap, codes_spill=spill,
        )
        graph = graph._replace(
            nodes=jnp.take(graph.nodes, plan.order, axis=0),
            cellblock=plan,
        )
        preds = apply_encode_process_decode(
            params, graph, model_config, dtype, cellblock_spec=spec,
            cellblock_mode=(
                "hybrid" if tc.aggregation == "cellblock_hybrid" else "slots"
            ),
        )
        violations = (
            plan.overflow
            + plan.dropped_edges
            + jnp.abs(plan.reverse_mismatch)
        )
        return (
            preds,
            jnp.take(graph.target_acceleration, plan.order, axis=0),
            jnp.take(graph.target_temp_rate, plan.order, axis=0),
            violations,
        )

    def loss_fn(params, batch, key):
        keys = jax.random.split(key, batch["positions"].shape[0])
        preds, tgt_acc, tgt_rate, violations = jax.vmap(
            per_sample, in_axes=(None, 0, 0, 0, 0, 0)
        )(
            params,
            batch["positions"],
            batch["temperatures"],
            batch["target_positions"],
            batch["target_temperatures"],
            keys,
        )
        total, components = combined_loss(
            preds,
            tgt_acc,
            tgt_rate,
            stats.dt,
            acc_weight=tc.acc_loss_weight,
            temp_rate_weight=tc.temp_rate_loss_weight,
            momentum_weight=tc.momentum_loss_weight,
        )
        if tc.aggregation.startswith("cellblock"):
            components = dict(components)
            components["cellblock_violations"] = jnp.max(violations).astype(
                jnp.float32
            )
        return total, components

    @jax.jit
    def train_step(params, opt_state, batch, key):
        (loss, components), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, **components}
        return params, opt_state, metrics

    return train_step


def make_eval_step(
    model_config: EncodeProcessDecodeConfig,
    stats: NormalizationStats,
    train_config: TrainConfig,
) -> Callable:
    """Validation step: no noise, no augmentation, no grad
    (``validation.py:18-90`` semantics)."""
    tc = train_config
    dtype = jnp.dtype(tc.compute_dtype) if tc.compute_dtype else None
    if tc.aggregation == "auto":
        state = {}

        def dispatching_eval(params, batch):
            if "step" not in state:
                from cosmology_gnn_simulation_tpu.ops.cellblock import (
                    choose_aggregation,
                )

                resolved = choose_aggregation(
                    batch["positions"].shape[2],
                    training=True,
                    pruned=(
                        model_config.aggregate == "sender_latents"
                        and model_config.prune_dead_edge_stream
                    ),
                )
                state["step"] = make_eval_step(
                    model_config, stats,
                    dataclasses.replace(tc, aggregation=resolved),
                )
            return state["step"](params, batch)

        return dispatching_eval
    zero_key = jax.random.PRNGKey(0)
    need_edges = not (
        model_config.aggregate == "sender_latents"
        and model_config.prune_dead_edge_stream
    )

    def per_sample(params, pos, temp, tpos, ttemp):
        graph = featurize(
            pos,
            temp,
            stats,
            zero_key,
            noise_std=0.0,
            num_neighbors=tc.num_neighbors,
            target_position=tpos,
            target_temperature=ttemp,
            neighbor_query_tile=tc.neighbor_query_tile,
            neighbor_method=tc.neighbor_method,
            build_edges=need_edges,
            with_codes=tc.aggregation.startswith("cellblock"),
            codes_only=(
                tc.aggregation.startswith("cellblock") and not need_edges
            ),
        )
        if tc.aggregation.startswith("cellblock"):
            from cosmology_gnn_simulation_tpu.ops.cellblock import (
                build_cellblock,
                choose_cellblock_spec,
            )

            graph, codes, codes_cap, spill = graph
            spec = choose_cellblock_spec(
                pos.shape[1], tc.num_neighbors,
                variable=tc.cellblock_variable,
            )
            plan = build_cellblock(
                graph.positions, graph.neighbors, stats.box_size, spec,
                neighbor_codes=codes, codes_cap=codes_cap,
                codes_spill=spill,
            )
            graph = graph._replace(
                nodes=jnp.take(graph.nodes, plan.order, axis=0),
                cellblock=plan,
            )
            preds = apply_encode_process_decode(
                params, graph, model_config, dtype, cellblock_spec=spec,
                cellblock_mode=(
                    "hybrid" if tc.aggregation == "cellblock_hybrid"
                    else "slots"
                ),
            )
            return (
                preds,
                jnp.take(graph.target_acceleration, plan.order, axis=0),
                jnp.take(graph.target_temp_rate, plan.order, axis=0),
            )
        preds = apply_encode_process_decode(params, graph, model_config, dtype)
        return preds, graph.target_acceleration, graph.target_temp_rate

    @jax.jit
    def eval_step(params, batch):
        preds, tgt_acc, tgt_rate = jax.vmap(
            per_sample, in_axes=(None, 0, 0, 0, 0)
        )(
            params,
            batch["positions"],
            batch["temperatures"],
            batch["target_positions"],
            batch["target_temperatures"],
        )
        total, components = combined_loss(
            preds,
            tgt_acc,
            tgt_rate,
            stats.dt,
            acc_weight=tc.acc_loss_weight,
            temp_rate_weight=tc.temp_rate_loss_weight,
            momentum_weight=tc.momentum_loss_weight,
        )
        return {"loss": total, **components}

    return eval_step


def make_optimizer(
    train_config: TrainConfig, steps_per_epoch: int
) -> optax.GradientTransformation:
    """Adam + per-epoch exponential decay (``train.py:183-187``)."""
    tc = train_config
    gamma = (tc.final_learning_rate / tc.learning_rate) ** (1.0 / tc.num_epochs)

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return tc.learning_rate * gamma**epoch

    transforms = []
    if tc.weight_decay:
        transforms.append(optax.add_decayed_weights(tc.weight_decay))
    transforms += [optax.scale_by_adam(), optax.scale_by_learning_rate(schedule)]
    return optax.chain(*transforms)


class Trainer:
    """Epoch-driven trainer with the reference's observability artifacts:
    per-epoch prints, best/periodic/final checkpoints, loss-dashboard plots,
    ``training_history.json`` (``train.py:208-387``)."""

    def __init__(
        self,
        model_config: EncodeProcessDecodeConfig,
        stats: NormalizationStats,
        train_config: TrainConfig,
        steps_per_epoch: int,
        init_params: Any = None,
        mesh=None,
        halo=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with (data, particle)
        axes — training steps then run sharded via ``shard_map`` (gradient
        psum over ICI); ``batch_size`` must be divisible by the data-axis
        size. Without a mesh, single-device jitted steps are used.

        ``halo``: optional ``parallel.halo.HaloConfig`` — particles are then
        SPATIALLY decomposed into slabs with ``ppermute`` halo exchange
        (O(N/P + halo) per device) instead of index-sharded with per-step
        all-gathers; requires ``mesh`` with a matching particle-axis size.
        The xyz augmentation then runs host-side during partitioning."""
        self.model_config = model_config
        self.stats = stats
        self.tc = train_config
        self.mesh = mesh
        self.halo = halo
        if halo is not None and mesh is None:
            raise ValueError("halo sharding requires a mesh")
        self.key = jax.random.PRNGKey(train_config.seed)
        self.key, init_key = jax.random.split(self.key)
        self.params = (
            init_params
            if init_params is not None
            else init_encode_process_decode(init_key, model_config)
        )
        self.optimizer = make_optimizer(train_config, steps_per_epoch)
        self.opt_state = self.optimizer.init(self.params)
        if mesh is not None and halo is not None:
            from cosmology_gnn_simulation_tpu.parallel.halo import (
                make_halo_eval_step,
                make_halo_train_step,
            )

            if train_config.batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {train_config.batch_size} must divide by "
                    f"data-axis size {mesh.shape['data']}"
                )
            self.train_step = make_halo_train_step(
                model_config, stats, train_config, self.optimizer, mesh, halo
            )
            self.eval_step = make_halo_eval_step(
                model_config, stats, train_config, mesh, halo
            )
            self._host_rng = np.random.default_rng(train_config.seed)
        elif mesh is not None:
            from cosmology_gnn_simulation_tpu.parallel.sharded import (
                make_data_parallel_train_step,
            )

            if train_config.batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {train_config.batch_size} must divide by "
                    f"data-axis size {mesh.shape['data']}"
                )
            from cosmology_gnn_simulation_tpu.parallel.sharded import (
                make_sharded_eval_step,
            )

            self.train_step = make_data_parallel_train_step(
                model_config, stats, train_config, self.optimizer, mesh
            )
            # Per-sample metrics so tail batches can be padded + masked
            # (full-val-set coverage, like single-device eval).
            self.eval_step = make_sharded_eval_step(
                model_config, stats, train_config, mesh, per_sample=True
            )
        else:
            self.train_step = make_train_step(
                model_config, stats, train_config, self.optimizer
            )
            self.eval_step = make_eval_step(model_config, stats, train_config)
        self.history: Dict[str, Any] = {
            "train_loss": [],
            "val_loss": [],
            "learning_rates": [],
            "component_losses": {
                "acc_train": [], "acc_val": [],
                "temp_rate_train": [], "temp_rate_val": [],
                "momentum_train": [], "momentum_val": [],
            },
            "best_epoch": -1,
            "best_val_loss": float("inf"),
        }

    def _config_dict(self) -> Dict:
        return {
            "model": self.model_config._asdict(),
            "train": dataclasses.asdict(self.tc),
        }

    def fit(
        self,
        train_dataset,
        val_dataset,
        *,
        verbose: bool = True,
        start_epoch: int = 0,
    ):
        tc = self.tc
        os.makedirs(tc.output_dir, exist_ok=True)
        plots_dir = os.path.join(tc.output_dir, "plots")
        os.makedirs(plots_dir, exist_ok=True)
        gamma = (tc.final_learning_rate / tc.learning_rate) ** (
            1.0 / tc.num_epochs
        )
        h = self.history

        from cosmology_gnn_simulation_tpu.utils.profiling import StepTimer

        self.step_timer = StepTimer()
        self._check_neighbor_exactness(train_dataset, verbose)
        dropped = len(train_dataset) % tc.batch_size
        if dropped and verbose:
            # Deliberate deviation from the reference (whose train DataLoader
            # has no drop_last): fixed batch shapes keep the step at exactly
            # one compilation. The tail samples rotate with the shuffle seed,
            # so no window is systematically excluded across epochs.
            print(
                f"NOTE: {dropped} tail training sample(s) per epoch are "
                f"dropped to keep batch shapes static "
                f"(dataset {len(train_dataset)} % batch_size {tc.batch_size})."
            )

        for epoch in range(start_epoch, tc.num_epochs):
            profiling = tc.profile_epoch == epoch
            if profiling:
                jax.profiler.start_trace(
                    os.path.join(tc.output_dir, "profile")
                )
            current_lr = tc.learning_rate * gamma**epoch
            h["learning_rates"].append(current_lr)
            epoch_metrics = []
            t0 = time.perf_counter()
            batch_iter = train_dataset.batches(
                tc.batch_size, shuffle=True, seed=tc.seed + epoch
            )
            bar = None
            if verbose:
                try:  # per-batch progress like the reference (train.py:212)
                    from tqdm import tqdm

                    bar = tqdm(batch_iter, desc=f"Epoch {epoch}", leave=False)
                    batch_iter = bar
                except ImportError:
                    pass
            for count, batch in enumerate(batch_iter, start=1):
                self.key, step_key = jax.random.split(self.key)
                if self.halo is not None:
                    from cosmology_gnn_simulation_tpu.parallel.halo import (
                        partition_batch,
                        shard_halo_batch,
                    )

                    keys = jax.random.split(
                        step_key, batch["positions"].shape[0]
                    )
                    part = partition_batch(
                        batch, self.halo, self.stats.box_size,
                        augment_prob=tc.augment_prob, rng=self._host_rng,
                    )
                    self.params, self.opt_state, metrics = self.train_step(
                        self.params, self.opt_state,
                        shard_halo_batch(part, self.mesh), keys,
                    )
                elif self.mesh is not None:
                    from cosmology_gnn_simulation_tpu.parallel.sharded import (
                        shard_batch,
                    )

                    keys = jax.random.split(
                        step_key, batch["positions"].shape[0]
                    )
                    self.params, self.opt_state, metrics = self.train_step(
                        self.params,
                        self.opt_state,
                        shard_batch(batch, self.mesh),
                        keys,
                    )
                else:
                    self.params, self.opt_state, metrics = self.train_step(
                        self.params, self.opt_state, batch, step_key
                    )
                epoch_metrics.append(metrics)
                if bar is not None and count % 10 == 0:
                    # Fetching metrics syncs the device; do it sparsely
                    # (train.py:274-281 parity).
                    bar.set_postfix({
                        "loss": float(metrics["loss"]),
                        "acc_loss": float(metrics["acceleration"]),
                        "temp_rate_loss": float(metrics["temp_rate"]),
                    })
            if profiling:
                jax.block_until_ready(self.params)
                jax.profiler.stop_trace()
            self.step_timer.record("train_epoch", time.perf_counter() - t0)
            if not epoch_metrics:
                raise ValueError(
                    f"Epoch {epoch} produced zero batches: the dataset has "
                    f"{len(train_dataset)} windows but batch_size="
                    f"{tc.batch_size} (the remainder is dropped). Reduce "
                    "batch_size or add data."
                )
            train_avg = {
                k: float(np.mean([np.asarray(m[k]) for m in epoch_metrics]))
                for k in epoch_metrics[0]
            }
            if tc.halt_on_nonfinite and not np.isfinite(train_avg["loss"]):
                raise FloatingPointError(
                    f"Non-finite training loss at epoch {epoch}: "
                    f"{train_avg} — inspect data/LR; rerun with "
                    "utils.profiling.enable_nan_debugging() to localize."
                )
            if train_avg.get("cellblock_violations", 0.0) > 0:
                msg = (
                    f"Cell-block aggregation certificate failed during epoch "
                    f"{epoch} (column overflow / dropped edges / reverse "
                    f"mismatch > 0): gradients are approximate on this "
                    f"particle distribution. Remedies: aggregation='gather', "
                    f"or a CellBlockSpec with more capacity/window headroom."
                )
                if tc.strict_neighbor_check:
                    raise ValueError(msg)
                print(f"WARNING: {msg}")

            val_avg = self.evaluate(val_dataset)

            h["train_loss"].append(train_avg["loss"])
            h["val_loss"].append(val_avg["loss"])
            cl = h["component_losses"]
            cl["acc_train"].append(train_avg["acceleration"])
            cl["acc_val"].append(val_avg["acceleration"])
            cl["temp_rate_train"].append(train_avg["temp_rate"])
            cl["temp_rate_val"].append(val_avg["temp_rate"])
            cl["momentum_train"].append(train_avg["momentum"])
            cl["momentum_val"].append(val_avg["momentum"])

            if verbose:
                print(
                    f"Epoch {epoch}: training loss = {train_avg['loss']:.6f}, "
                    f"validation loss = {val_avg['loss']:.6f}, "
                    f"learning rate = {current_lr:.2e}, "
                    f"epoch time = {time.perf_counter() - t0:.1f}s"
                )

            if val_avg["loss"] < h["best_val_loss"]:
                h["best_val_loss"] = val_avg["loss"]
                h["best_epoch"] = epoch
                self.save("model_best", epoch)
                if verbose:
                    print(
                        "New best model saved with validation loss: "
                        f"{val_avg['loss']:.6f}"
                    )

            if epoch % 5 == 0:
                self._plot(os.path.join(plots_dir, f"losses_epoch_{epoch}.png"))
            if (epoch + 1) % tc.save_every == 0 or epoch == tc.num_epochs - 1:
                self.save(f"model_epoch_{epoch}", epoch)

        self._plot(os.path.join(tc.output_dir, "plots", "losses_final.png"))
        # Reload best, save final (train.py:361-368).
        best_path = os.path.join(tc.output_dir, "model_best")
        if os.path.exists(best_path):
            restored = ckpt_lib.load_checkpoint(
                best_path, template={"params": self.params}
            )
            self.params = restored["params"]
        self.save("model_final", tc.num_epochs - 1)
        with open(
            os.path.join(tc.output_dir, "training_history.json"), "w"
        ) as f:
            json.dump(h, f, indent=4)
        return self.params

    def _check_neighbor_exactness(self, dataset, verbose: bool) -> None:
        """One-time runtime certificate that the bucketed kNN backends are
        exact for THIS particle distribution (clustered data can violate the
        capacity/cell-edge assumptions silently). Raises by default
        (``strict_neighbor_check=False`` downgrades to a warning)."""
        tc = self.tc
        if tc.neighbor_method == "bruteforce":
            return
        try:
            from cosmology_gnn_simulation_tpu.featurize import (
                verify_neighbor_exactness,
            )

            batch = next(iter(dataset.batches(1, shuffle=False)))
            result = verify_neighbor_exactness(
                batch["positions"][0, -1],
                tc.num_neighbors,
                self.stats.box_size,
                method=tc.neighbor_method,
                strict=tc.strict_neighbor_check,
            )
            if verbose and not result.get("exact", True):
                print("WARNING: neighbor-search exactness certificate failed "
                      f"({result}); see featurize.verify_neighbor_exactness")
        except StopIteration:
            pass

    def evaluate(self, dataset) -> Dict[str, float]:
        """Average metrics over the FULL validation set (the reference's val
        DataLoader has no drop_last, train.py:157-162 — the tail batch is
        evaluated too). Sharded eval pads the tail batch to the static batch
        size and masks the padding out of the per-sample metrics, so sharded
        and single-device runs report the same value."""
        metrics = []
        bs = self.tc.batch_size
        for batch in dataset.batches(bs, shuffle=False, drop_remainder=False):
            if self.halo is not None:
                from cosmology_gnn_simulation_tpu.parallel.halo import (
                    partition_batch,
                    shard_halo_batch,
                )

                real = batch["positions"].shape[0]
                if real < bs:
                    batch = {
                        k: np.concatenate(
                            [v, np.repeat(v[-1:], bs - real, axis=0)]
                        )
                        for k, v in batch.items()
                    }
                part = partition_batch(batch, self.halo, self.stats.box_size)
                per_sample = self.eval_step(
                    self.params, shard_halo_batch(part, self.mesh)
                )
                metrics.append({
                    k: float(np.mean(np.asarray(v)[:real]))
                    for k, v in per_sample.items()
                })
            elif self.mesh is not None:
                from cosmology_gnn_simulation_tpu.parallel.sharded import (
                    shard_batch,
                )

                real = batch["positions"].shape[0]
                if real < bs:
                    batch = {
                        k: np.concatenate(
                            [v, np.repeat(v[-1:], bs - real, axis=0)]
                        )
                        for k, v in batch.items()
                    }
                keys = jax.random.split(jax.random.PRNGKey(0), bs)
                per_sample = self.eval_step(
                    self.params, shard_batch(batch, self.mesh), keys
                )
                metrics.append({
                    k: float(np.mean(np.asarray(v)[:real]))
                    for k, v in per_sample.items()
                })
            else:
                metrics.append(self.eval_step(self.params, batch))
        if not metrics:
            raise ValueError(
                f"Validation produced zero batches: dataset has "
                f"{len(dataset)} windows, batch_size={self.tc.batch_size}."
            )
        return {
            k: float(np.mean([np.asarray(m[k]) for m in metrics]))
            for k in metrics[0]
        }

    def save(self, name: str, epoch: int = 0) -> str:
        path = ckpt_lib.save_checkpoint(
            self.tc.output_dir,
            name,
            self.params,
            self.opt_state,
            epoch=epoch,
            rng_key=self.key,
            config=self._config_dict(),
        )
        with open(os.path.join(path, "history.json"), "w") as f:
            json.dump(self.history, f)
        return path

    def restore(self, path: str) -> int:
        """Full resume (params + optimizer state + epoch + PRNG + history) —
        unlike the reference's weights-only --pretrained_model restart which
        silently resets Adam moments and the LR schedule (train.py:178-187,
        SURVEY.md §5). Returns the epoch to resume FROM (last completed + 1).
        """
        template = {
            "params": self.params,
            "opt_state": self.opt_state,
            "epoch": np.asarray(0),
            "rng_key": jax.random.key_data(self.key),
        }
        restored = ckpt_lib.load_checkpoint_with_template(path, template)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.key = jax.random.wrap_key_data(restored["rng_key"])
        history_path = os.path.join(path, "history.json")
        start_epoch = int(restored["epoch"]) + 1
        if os.path.exists(history_path):
            with open(history_path) as f:
                self.history = json.load(f)
            # The checkpoint may be earlier than the last recorded epoch
            # (e.g. model_best): truncate per-epoch series to start_epoch
            # entries so fit() appends without duplicating/misaligning.
            for series in ("train_loss", "val_loss", "learning_rates"):
                self.history[series] = self.history[series][:start_epoch]
            cl = self.history.get("component_losses", {})
            for name in cl:
                cl[name] = cl[name][:start_epoch]
        return start_epoch

    def _plot(self, path: str) -> None:
        try:
            from cosmology_gnn_simulation_tpu.training.plots import plot_losses

            plot_losses(
                self.history["train_loss"],
                self.history["val_loss"],
                path,
                self.history["component_losses"],
                self.history["learning_rates"],
            )
        except Exception as exc:  # plotting is best-effort observability
            print(f"plotting skipped: {exc}")


def default_model_config(
    window_size: int = 5,
    latent_size: int = 128,
    mlp_hidden_size: int = 128,
    mlp_num_hidden_layers: int = 2,
    num_message_passing_steps: int = 10,
    output_size: int = 3,
    aggregate: str = "sender_latents",
    prune_dead_edge_stream: bool = True,
    remat: bool = False,
    remat_chunk: Optional[int] = None,
    carry_dtype: Optional[str] = None,
) -> EncodeProcessDecodeConfig:
    return EncodeProcessDecodeConfig(
        node_input_size=node_feature_size(window_size),
        edge_input_size=4,
        latent_size=latent_size,
        mlp_hidden_size=mlp_hidden_size,
        mlp_num_hidden_layers=mlp_num_hidden_layers,
        num_message_passing_steps=num_message_passing_steps,
        output_size=output_size,
        aggregate=aggregate,
        prune_dead_edge_stream=prune_dead_edge_stream,
        remat=remat,
        remat_chunk=remat_chunk,
        carry_dtype=carry_dtype,
    )
