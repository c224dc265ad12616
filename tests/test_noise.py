import jax
import jax.numpy as jnp
import numpy as np

from cosmology_gnn_simulation_tpu.ops.noise import (
    random_walk_position_noise,
    random_walk_temperature_noise,
)


def test_zero_std_gives_zero_noise():
    key = jax.random.PRNGKey(0)
    seq = jnp.ones((10, 5, 3))
    noise = random_walk_position_noise(key, seq, 0.0, dt=0.1)
    np.testing.assert_array_equal(np.asarray(noise), 0.0)


def test_first_frame_noise_is_zero():
    key = jax.random.PRNGKey(1)
    seq = jnp.zeros((100, 6, 3))
    noise = np.asarray(random_walk_position_noise(key, seq, 1.0, dt=0.1))
    np.testing.assert_array_equal(noise[:, 0], 0.0)
    assert np.abs(noise[:, 1:]).max() > 0


def test_random_walk_statistics():
    """The final-frame *velocity* noise (cumulative sum of T-1 iid draws of
    std noise_std/sqrt(T-1)) must have std ~= noise_std — the property the
    scheme is built for (data_utils.py:45-51)."""
    key = jax.random.PRNGKey(2)
    n, t = 50_000, 6
    dt = 0.25
    noise_std = 0.7
    seq = jnp.zeros((n, t, 3))
    noise = np.asarray(random_walk_position_noise(key, seq, noise_std, dt))
    # Recover velocity noise at the last step: (pos_noise diff)/dt.
    vel_noise_last = (noise[:, -1] - noise[:, -2]) / dt
    measured = vel_noise_last.std()
    assert abs(measured - noise_std) / noise_std < 0.02


def test_temperature_noise_scaled_by_rate_std():
    key = jax.random.PRNGKey(3)
    n, t = 20_000, 6
    dt = 0.1
    seq = jnp.zeros((n, t, 1))
    a = np.asarray(random_walk_temperature_noise(key, seq, 1.0, 2.0, dt))
    b = np.asarray(random_walk_temperature_noise(key, seq, 1.0, 4.0, dt))
    # Same key => identical draws; doubling temp_rate_std doubles the noise.
    np.testing.assert_allclose(b, 2 * a, rtol=1e-5)
