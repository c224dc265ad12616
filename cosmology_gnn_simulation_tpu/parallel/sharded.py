"""Sharded training/forward over a (data, particle) device mesh.

The reference is strictly single-process, single-device (SURVEY.md §2: no
``torch.distributed`` anywhere). This module adds the TPU-native scale-out:

* **Data parallelism** — the sample batch is sharded over the ``data`` mesh
  axis; gradients are summed with ``psum`` over ICI.
* **Particle (spatial/graph) parallelism** — the workload's analog of
  sequence/context parallelism: each device owns ``N / P_particle``
  particles. Graph construction all-gathers only the ``[N, 3]`` recent
  positions; per message-passing step, only the *projected* ``[N, H]``
  latents are all-gathered (the heavy ``[N, k, H]`` edge tensors stay
  shard-local). Exact — not an approximation; halo-exchange (``ppermute``
  of boundary particles only) is the planned bandwidth optimization.

Both axes compose; a single ``shard_map``'d step handles (1, P), (P, 1) and
(Pd, Pp) meshes uniformly.

Loss semantics under sharding (kept exact vs. the reference definitions):
* acceleration / temp-rate MSE: per-shard means combined with ``pmean``
  (equal shard sizes => true global mean, ``train.py:255-256``);
* momentum PINN loss: the per-graph impulse is summed over *all* particle
  shards with ``psum`` **inside** the squared norm — the loss is a nonlinear
  function of the global sum and cannot be decomposed per-shard
  (``train.py:107-118``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cosmology_gnn_simulation_tpu.featurize import featurize
from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    EncodeProcessDecodeConfig,
    apply_encode_process_decode,
)
from cosmology_gnn_simulation_tpu.training.trainer import (
    TrainConfig,
    _augment_axes,
)
from cosmology_gnn_simulation_tpu.types import NormalizationStats

DATA_AXIS = "data"
PARTICLE_AXIS = "particle"


def _sharded_per_sample_losses(
    params,
    batch,
    keys,
    *,
    model_config: EncodeProcessDecodeConfig,
    stats: NormalizationStats,
    tc: TrainConfig,
    dtype,
):
    """Per-sample loss components inside shard_map. ``batch`` arrays are
    shard-local: positions [B_l, T, N_l, 3], etc. Returns ``(acc_se,
    temp_se, momentum)`` as ``[B_l]`` vectors; acc/temp are already global
    per-sample node means (pmean over the particle axis), momentum is the
    global per-graph impulse penalty (unweighted)."""

    def per_sample(pos, temp, tpos, ttemp, key):
        aug_key, feat_key = jax.random.split(key)
        # The axis permutation must be identical across particle shards of a
        # sample (aug_key is shared), but the random-walk noise must be iid
        # per particle — fold the shard index into the featurize key.
        feat_key = jax.random.fold_in(
            feat_key, jax.lax.axis_index(PARTICLE_AXIS)
        )
        pos, tpos = _augment_axes(aug_key, pos, tpos, tc.augment_prob)
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
            particle_axis=PARTICLE_AXIS,
        )
        preds = apply_encode_process_decode(
            params, graph, model_config, dtype, particle_axis=PARTICLE_AXIS
        )
        acc_se = jnp.mean((preds["acceleration"] - graph.target_acceleration) ** 2)
        temp_se = jnp.mean((preds["temp_rate"] - graph.target_temp_rate) ** 2)
        # Global per-graph impulse: sum over every particle shard.
        local_impulse = jnp.sum(preds["acceleration"] * stats.dt, axis=0)
        global_impulse = jax.lax.psum(local_impulse, PARTICLE_AXIS)
        momentum = jnp.sum(global_impulse**2)
        return acc_se, temp_se, momentum

    acc_se, temp_se, momentum = jax.vmap(per_sample)(
        batch["positions"],
        batch["temperatures"],
        batch["target_positions"],
        batch["target_temperatures"],
        keys,
    )
    # Particle-shard means are equal-weight partial means -> pmean completes
    # the global per-sample node mean.
    acc_se = jax.lax.pmean(acc_se, PARTICLE_AXIS)
    temp_se = jax.lax.pmean(temp_se, PARTICLE_AXIS)
    return acc_se, temp_se, momentum


def _sharded_loss(
    params,
    batch,
    keys,
    *,
    model_config: EncodeProcessDecodeConfig,
    stats: NormalizationStats,
    tc: TrainConfig,
    dtype,
):
    """Global scalar loss inside shard_map; identical on every device."""
    acc_se, temp_se, momentum = _sharded_per_sample_losses(
        params, batch, keys,
        model_config=model_config, stats=stats, tc=tc, dtype=dtype,
    )
    # Mean over local batch, then over data shards.
    acc_loss = jax.lax.pmean(jnp.mean(acc_se), DATA_AXIS)
    temp_loss = jax.lax.pmean(jnp.mean(temp_se), DATA_AXIS)
    momentum_loss = tc.momentum_loss_weight * jax.lax.pmean(
        jnp.mean(momentum), DATA_AXIS
    )
    total = (
        tc.acc_loss_weight * acc_loss
        + tc.temp_rate_loss_weight * temp_loss
        + momentum_loss
    )
    components = {
        "acceleration": acc_loss,
        "temp_rate": temp_loss,
        "momentum": momentum_loss,
    }
    return total, components


def make_data_parallel_train_step(
    model_config: EncodeProcessDecodeConfig,
    stats: NormalizationStats,
    train_config: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable:
    """Build the sharded train step for a (data, particle) mesh.

    Returns jitted ``(params, opt_state, batch, keys) ->
    (params, opt_state, metrics)`` where ``batch`` is globally shaped
    ([B, T, N, 3], ...) and ``keys`` is ``[B]`` of PRNG keys; jit's
    in_shardings place B over ``data`` and N over ``particle``.
    """
    tc = train_config
    dtype = jnp.dtype(tc.compute_dtype) if tc.compute_dtype else None

    batch_specs = {
        "positions": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "temperatures": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "target_positions": P(DATA_AXIS, PARTICLE_AXIS, None),
        "target_temperatures": P(DATA_AXIS, PARTICLE_AXIS, None),
    }

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), batch_specs, P(DATA_AXIS)),
        out_specs=(P(), P()),
    )
    def sharded_value_and_grad(params, batch, keys):
        (loss, components), grads = jax.value_and_grad(
            _sharded_loss, has_aux=True
        )(
            params,
            batch,
            keys,
            model_config=model_config,
            stats=stats,
            tc=tc,
            dtype=dtype,
        )
        # Each device's grad covers only the loss terms flowing through its
        # local compute; the total gradient is their sum.
        grads = jax.lax.psum(grads, (DATA_AXIS, PARTICLE_AXIS))
        return (loss, components), grads

    @jax.jit
    def train_step(params, opt_state, batch, keys):
        (loss, components), grads = sharded_value_and_grad(params, batch, keys)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, **components}

    return train_step


def make_sharded_eval_step(
    model_config: EncodeProcessDecodeConfig,
    stats: NormalizationStats,
    train_config: TrainConfig,
    mesh: Mesh,
    *,
    per_sample: bool = False,
) -> Callable:
    """Sharded validation step (noise 0, no augmentation, no grad) so
    end-of-epoch evaluation scales like training instead of falling back to
    one device.

    With ``per_sample=True`` the step returns ``[B]`` vectors instead of
    batch-mean scalars — callers can pad a tail batch to the mesh-divisible
    size and mask out the padding, so sharded eval covers the full
    validation set (the reference's val DataLoader has no ``drop_last``)."""
    tc = dataclasses.replace(train_config, noise_std=0.0, augment_prob=0.0)
    dtype = jnp.dtype(tc.compute_dtype) if tc.compute_dtype else None

    batch_specs = {
        "positions": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "temperatures": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "target_positions": P(DATA_AXIS, PARTICLE_AXIS, None),
        "target_temperatures": P(DATA_AXIS, PARTICLE_AXIS, None),
    }

    out_specs = P(DATA_AXIS) if per_sample else P()

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), batch_specs, P(DATA_AXIS)),
        out_specs=out_specs,
    )
    def sharded_eval(params, batch, keys):
        if per_sample:
            acc_se, temp_se, momentum = _sharded_per_sample_losses(
                params, batch, keys,
                model_config=model_config, stats=stats, tc=tc, dtype=dtype,
            )
            momentum = tc.momentum_loss_weight * momentum
            total = (
                tc.acc_loss_weight * acc_se
                + tc.temp_rate_loss_weight * temp_se
                + momentum
            )
            return {
                "loss": total,
                "acceleration": acc_se,
                "temp_rate": temp_se,
                "momentum": momentum,
            }
        total, components = _sharded_loss(
            params, batch, keys,
            model_config=model_config, stats=stats, tc=tc, dtype=dtype,
        )
        return {"loss": total, **components}

    @jax.jit
    def eval_step(params, batch, keys):
        return sharded_eval(params, batch, keys)

    return eval_step


def make_particle_sharded_forward(
    model_config: EncodeProcessDecodeConfig,
    stats: NormalizationStats,
    mesh: Mesh,
    *,
    num_neighbors: int = 16,
    dtype=None,
    neighbor_query_tile: int = 512,
) -> Callable:
    """Particle-sharded inference: ``(params, position_seq [T,N,3],
    temperature_seq [T,N,1]) -> {'acceleration' [N,3], 'temp_rate' [N,1]}``
    with N sharded over the ``particle`` axis (data axis replicated)."""

    zero_key = jax.random.PRNGKey(0)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, PARTICLE_AXIS, None),
            P(None, PARTICLE_AXIS, None),
        ),
        out_specs={
            "acceleration": P(PARTICLE_AXIS, None),
            "temp_rate": P(PARTICLE_AXIS, None),
        },
    )
    def forward(params, position_seq, temperature_seq):
        graph = featurize(
            position_seq,
            temperature_seq,
            stats,
            zero_key,
            noise_std=0.0,
            num_neighbors=num_neighbors,
            neighbor_query_tile=neighbor_query_tile,
            particle_axis=PARTICLE_AXIS,
        )
        return apply_encode_process_decode(
            params, graph, model_config, dtype, particle_axis=PARTICLE_AXIS
        )

    return jax.jit(forward)


def make_sharded_rollout(
    model_config: EncodeProcessDecodeConfig,
    stats: NormalizationStats,
    mesh: Mesh,
    num_steps: int,
    *,
    num_neighbors: int = 16,
    min_image_velocity: bool = False,
    dtype=None,
    neighbor_query_tile: int = 512,
    neighbor_method: str = "auto",
    reneighbor_every: int = 1,
) -> Callable:
    """Particle-sharded multi-step rollout (BASELINE config 5: millions of
    particles spatially partitioned over the mesh).

    Returns jitted ``(params, initial_positions [W, N, 3],
    initial_temperatures [W, N, 1]) -> {"Coordinates": [W+S, N, 3],
    "InternalEnergy": [W+S, N, 1]}`` with N sharded over the ``particle``
    axis. The whole scan runs inside one ``shard_map``: each step
    all-gathers only the [N, 3] positions (k-NN) and the projected [N, H]
    latents (message passing); trajectories, integration, and edge tensors
    stay shard-local.
    """
    from cosmology_gnn_simulation_tpu.featurize import neighbor_search
    from cosmology_gnn_simulation_tpu.ops.periodic import wrap_positions
    from cosmology_gnn_simulation_tpu.rollout import integrate_step

    if reneighbor_every < 1:
        raise ValueError(
            f"reneighbor_every must be >= 1, got {reneighbor_every}"
        )
    zero_key = jax.random.PRNGKey(0)
    reuse = reneighbor_every > 1

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, PARTICLE_AXIS, None),
            P(None, PARTICLE_AXIS, None),
        ),
        out_specs={
            "Coordinates": P(None, PARTICLE_AXIS, None),
            "InternalEnergy": P(None, PARTICLE_AXIS, None),
        },
    )
    def rollout_fn(params, initial_positions, initial_temperatures):
        def step(pos_window, temp_window, neighbors):
            graph = featurize(
                pos_window,
                temp_window,
                stats,
                zero_key,
                noise_std=0.0,
                num_neighbors=num_neighbors,
                neighbor_query_tile=neighbor_query_tile,
                neighbor_method=neighbor_method,
                particle_axis=PARTICLE_AXIS,
                neighbors=neighbors,
            )
            preds = apply_encode_process_decode(
                params, graph, model_config, dtype, particle_axis=PARTICLE_AXIS
            )
            acceleration = preds["acceleration"] * stats.acc_std + stats.acc_mean
            temp_rate = (
                preds["temp_rate"] * stats.temp_rate_std + stats.temp_rate_mean
            )
            new_position, new_temperature = integrate_step(
                pos_window[-1],
                pos_window[-2],
                temp_window[-1],
                acceleration,
                temp_rate,
                stats,
                min_image_velocity=min_image_velocity,
            )
            return (
                jnp.concatenate([pos_window[1:], new_position[None]], axis=0),
                jnp.concatenate(
                    [temp_window[1:], new_temperature[None]], axis=0
                ),
                graph.neighbors,
                (new_position, new_temperature),
            )

        init_windows = (
            initial_positions.astype(jnp.float32),
            initial_temperatures.astype(jnp.float32),
        )

        if not reuse:
            def body(carry, _):
                pos_window, temp_window = carry
                pos_window, temp_window, _, out = step(
                    pos_window, temp_window, None
                )
                return (pos_window, temp_window), out

            _, (positions, temperatures) = jax.lax.scan(
                body, init_windows, None, length=num_steps
            )
        else:
            def search(pos_window):
                local = wrap_positions(pos_window[-1], stats.box_size)
                gathered = jax.lax.all_gather(
                    local, PARTICLE_AXIS, tiled=True
                )
                return neighbor_search(
                    gathered,
                    num_neighbors,
                    stats.box_size,
                    queries=local,
                    method=neighbor_method,
                    query_tile=neighbor_query_tile,
                )

            def body(carry, step_index):
                pos_window, temp_window, neighbors = carry
                neighbors = jax.lax.cond(
                    (step_index % reneighbor_every == 0) & (step_index > 0),
                    lambda pw, nb: search(pw),
                    lambda pw, nb: nb,
                    pos_window,
                    neighbors,
                )
                pos_window, temp_window, neighbors, out = step(
                    pos_window, temp_window, neighbors
                )
                return (pos_window, temp_window, neighbors), out

            init = (*init_windows, search(init_windows[0]))
            _, (positions, temperatures) = jax.lax.scan(
                body, init, jnp.arange(num_steps)
            )
        return {
            "Coordinates": jnp.concatenate([init_windows[0], positions], axis=0),
            "InternalEnergy": jnp.concatenate(
                [init_windows[1], temperatures], axis=0
            ),
        }

    return jax.jit(rollout_fn)


def shard_batch(batch, mesh: Mesh, *, process_local: Optional[bool] = None):
    """Place a host batch dict onto the mesh with the train-step shardings.

    Validates divisibility up front (batch over the data axis, particles
    over the particle axis) so failures are clear errors rather than opaque
    XLA sharding exceptions at the first step.

    ``process_local``: in a multi-process runtime (``jax.distributed``, data
    axis over DCN — see ``parallel.mesh``), each process passes only ITS
    slice of the global batch (global batch = process-local batch stacked in
    process order along the data axis); the global arrays are assembled
    without cross-host transfers via
    ``jax.make_array_from_process_local_data``. Default: auto (on iff
    ``jax.process_count() > 1``).
    """
    if process_local is None:
        process_local = jax.process_count() > 1
    b = batch["positions"].shape[0]
    n = batch["positions"].shape[2]
    if process_local:
        b *= jax.process_count()
    if b % mesh.shape[DATA_AXIS]:
        raise ValueError(
            f"global batch size {b} not divisible by data-axis size "
            f"{mesh.shape[DATA_AXIS]}"
        )
    if n % mesh.shape[PARTICLE_AXIS]:
        raise ValueError(
            f"particle count {n} not divisible by particle-axis size "
            f"{mesh.shape[PARTICLE_AXIS]}"
        )
    specs = {
        "positions": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "temperatures": P(DATA_AXIS, None, PARTICLE_AXIS, None),
        "target_positions": P(DATA_AXIS, PARTICLE_AXIS, None),
        "target_temperatures": P(DATA_AXIS, PARTICLE_AXIS, None),
    }
    if process_local:
        return {
            name: jax.make_array_from_process_local_data(
                NamedSharding(mesh, specs[name]), np.asarray(arr)
            )
            for name, arr in batch.items()
        }
    return {
        name: jax.device_put(arr, NamedSharding(mesh, specs[name]))
        for name, arr in batch.items()
    }
