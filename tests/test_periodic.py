import jax.numpy as jnp
import numpy as np

from cosmology_gnn_simulation_tpu.ops.periodic import (
    min_image_displacement,
    periodic_displacement,
    wrap_positions,
)


def reference_single_correction(d, box):
    """The reference's paired conditional correction
    (data_utils.py:104-105), as a numpy oracle."""
    d = np.array(d, dtype=np.float64)
    d[d < -box / 2] += box
    d[d > box / 2] -= box
    return d


def test_wrap_positions_range(rng):
    x = rng.uniform(-3, 3, size=(100, 3)).astype(np.float32)
    wrapped = np.asarray(wrap_positions(jnp.asarray(x), 1.0))
    assert (wrapped >= 0).all() and (wrapped < 1.0).all()
    # Wrapping preserves value modulo box.
    np.testing.assert_allclose(
        np.remainder(x, 1.0), wrapped, rtol=1e-6, atol=1e-6
    )


def test_min_image_matches_reference_correction(rng):
    box = 1.0
    # Differences of wrapped coords are always in (-box, box).
    d = rng.uniform(-0.999, 0.999, size=(1000,)).astype(np.float32)
    ours = np.asarray(min_image_displacement(jnp.asarray(d), box))
    ref = reference_single_correction(d, box)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_min_image_half_box_magnitude(rng):
    box = 2.5
    d = rng.uniform(-box, box, size=(500, 3)).astype(np.float32)
    out = np.asarray(min_image_displacement(jnp.asarray(d), box))
    assert (np.abs(out) <= box / 2 + 1e-5).all()


def test_periodic_displacement_antisymmetric(rng):
    box = 1.0
    a = rng.uniform(0, box, size=(50, 3)).astype(np.float32)
    b = rng.uniform(0, box, size=(50, 3)).astype(np.float32)
    dab = np.asarray(periodic_displacement(jnp.asarray(a), jnp.asarray(b), box))
    dba = np.asarray(periodic_displacement(jnp.asarray(b), jnp.asarray(a), box))
    np.testing.assert_allclose(dab, -dba, atol=1e-6)
