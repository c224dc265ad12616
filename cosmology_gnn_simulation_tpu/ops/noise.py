"""Random-walk training noise.

Replicates the denoising-curriculum noise of the reference
(``/root/reference/data_utils.py:36-70``): i.i.d. velocity-space noise of
scale ``noise_std / sqrt(T-1)`` accumulated twice (velocity walk, then
position walk x dt), with zero noise at the first frame. Temperature noise is
the same scheme scaled by ``temp_rate_std``.

Pure functions of an explicit PRNG key — fully jittable, reproducible, and
vmappable over a batch (unlike the reference's global-RNG ``torch.randn``).

Two keying modes:

* stream (default, ``gids=None``): one key draws the whole ``[N, T-1, D]``
  block — the cheapest form, but the draw a particle receives depends on its
  ROW POSITION, so different data layouts (e.g. spatial shards) get
  different noise.
* per-particle (``gids`` given): row ``i``'s draws come from
  ``fold_in(key, gids[i])`` — a pure function of the particle's GLOBAL id,
  independent of row order, padding, or shard layout. This is what makes
  noised halo-sharded training numerically IDENTICAL to single-device
  training (tests/test_halo.py pins it). Cost is one batched threefry over
  the same number of elements — same bandwidth class as the stream draw.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _iid_normal(key, shape, dtype, gids):
    if gids is None:
        return jax.random.normal(key, shape, dtype)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, gids)
    return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(keys)


def _double_cumsum_walk(
    key: jax.Array, shape, scale, dt, dtype=jnp.float32, gids=None
) -> jnp.ndarray:
    """Draw iid noise of ``scale``, cumsum twice over time axis 1, scale by dt,
    and prepend a zero frame. ``shape`` is ``[N, T-1, D]``; returns
    ``[N, T, D]``."""
    steps = shape[1]
    iid = _iid_normal(key, shape, dtype, gids) * (scale / jnp.sqrt(steps))
    walk = jnp.cumsum(iid, axis=1)  # velocity/rate-space random walk
    accumulated = jnp.cumsum(walk, axis=1) * dt  # position/temperature space
    zero = jnp.zeros_like(accumulated[:, :1])
    return jnp.concatenate([zero, accumulated], axis=1)


def random_walk_position_noise(
    key: jax.Array,
    position_seq: jnp.ndarray,
    noise_std,
    dt,
    gids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Position-space random-walk noise (``data_utils.py:36-54``).

    Args:
      position_seq: ``[N, T, 3]`` particle-major position history.
      noise_std: velocity-noise standard deviation (0 disables).
      dt: timestep.
      gids: optional ``[N]`` int global particle ids — switches to
        layout-invariant per-particle keying (module docstring).

    Returns:
      ``[N, T, 3]`` noise with zeros at ``t=0``.
    """
    n, t, d = position_seq.shape
    scale = jnp.asarray(noise_std, position_seq.dtype)
    return _double_cumsum_walk(
        key, (n, t - 1, d), scale, dt, position_seq.dtype, gids
    )


def random_walk_temperature_noise(
    key: jax.Array,
    temperature_seq: jnp.ndarray,
    noise_std,
    temp_rate_std,
    dt,
    gids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Temperature-space random-walk noise (``data_utils.py:57-70``).

    The reference scales the iid draws by ``noise_std * temp_rate_std`` where
    ``temp_rate_std`` may be a scalar or per-feature vector.
    """
    n, t, d = temperature_seq.shape
    scale = jnp.asarray(noise_std, temperature_seq.dtype) * jnp.asarray(
        temp_rate_std, temperature_seq.dtype
    )
    return _double_cumsum_walk(
        key, (n, t - 1, d), scale, dt, temperature_seq.dtype, gids
    )
