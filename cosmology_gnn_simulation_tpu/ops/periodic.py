"""Periodic-box geometry primitives.

The reference handles periodicity two ways: a single ±box correction of raw
displacements (``/root/reference/data_utils.py:103-105``) and ``remainder``
wrapping of positions (``data_utils.py:92``). Both are reproduced here as
pure JAX ops. The single-correction form equals the full minimum-image
convention whenever ``|d| < 1.5 * box``, which always holds for differences
of wrapped coordinates (``|d| < box``) — so we use the branch-free
``d - box * round(d / box)`` form, which XLA fuses into surrounding
elementwise work.
"""

from __future__ import annotations

import jax.numpy as jnp


def wrap_positions(positions: jnp.ndarray, box_size) -> jnp.ndarray:
    """Wrap coordinates into ``[0, box)`` (``data_utils.py:92``,
    ``render_rollout.py:81``)."""
    return jnp.remainder(positions, box_size)


def min_image_displacement(displacement: jnp.ndarray, box_size) -> jnp.ndarray:
    """Map raw displacements to their minimum-image equivalents.

    Equivalent to the reference's paired conditional corrections
    (``data_utils.py:40-41``, ``:104-105``, ``:186-187``) for any
    ``|d| < 1.5 * box``.
    """
    return displacement - box_size * jnp.round(displacement / box_size)


def periodic_displacement(a: jnp.ndarray, b: jnp.ndarray, box_size) -> jnp.ndarray:
    """Minimum-image displacement ``a - b`` in a periodic box."""
    return min_image_displacement(a - b, box_size)
