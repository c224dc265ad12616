"""Random-walk training noise.

Replicates the denoising-curriculum noise of the reference
(``/root/reference/data_utils.py:36-70``): i.i.d. velocity-space noise of
scale ``noise_std / sqrt(T-1)`` accumulated twice (velocity walk, then
position walk x dt), with zero noise at the first frame. Temperature noise is
the same scheme scaled by ``temp_rate_std``.

Pure functions of an explicit PRNG key — fully jittable, reproducible, and
vmappable over a batch (unlike the reference's global-RNG ``torch.randn``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _double_cumsum_walk(
    key: jax.Array, shape, scale, dt, dtype=jnp.float32
) -> jnp.ndarray:
    """Draw iid noise of ``scale``, cumsum twice over time axis 1, scale by dt,
    and prepend a zero frame. ``shape`` is ``[N, T-1, D]``; returns
    ``[N, T, D]``."""
    steps = shape[1]
    iid = jax.random.normal(key, shape, dtype) * (scale / jnp.sqrt(steps))
    walk = jnp.cumsum(iid, axis=1)  # velocity/rate-space random walk
    accumulated = jnp.cumsum(walk, axis=1) * dt  # position/temperature space
    zero = jnp.zeros_like(accumulated[:, :1])
    return jnp.concatenate([zero, accumulated], axis=1)


def random_walk_position_noise(
    key: jax.Array, position_seq: jnp.ndarray, noise_std, dt
) -> jnp.ndarray:
    """Position-space random-walk noise (``data_utils.py:36-54``).

    Args:
      position_seq: ``[N, T, 3]`` particle-major position history.
      noise_std: velocity-noise standard deviation (0 disables).
      dt: timestep.

    Returns:
      ``[N, T, 3]`` noise with zeros at ``t=0``.
    """
    n, t, d = position_seq.shape
    scale = jnp.asarray(noise_std, position_seq.dtype)
    return _double_cumsum_walk(key, (n, t - 1, d), scale, dt, position_seq.dtype)


def random_walk_temperature_noise(
    key: jax.Array, temperature_seq: jnp.ndarray, noise_std, temp_rate_std, dt
) -> jnp.ndarray:
    """Temperature-space random-walk noise (``data_utils.py:57-70``).

    The reference scales the iid draws by ``noise_std * temp_rate_std`` where
    ``temp_rate_std`` may be a scalar or per-feature vector.
    """
    n, t, d = temperature_seq.shape
    scale = jnp.asarray(noise_std, temperature_seq.dtype) * jnp.asarray(
        temp_rate_std, temperature_seq.dtype
    )
    return _double_cumsum_walk(key, (n, t - 1, d), scale, dt, temperature_seq.dtype)
