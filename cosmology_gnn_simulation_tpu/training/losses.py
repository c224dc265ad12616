"""Loss stack — capability parity with the reference
(``/root/reference/train.py:107-118,193,255-260``; duplicated in
``validation.py:5-16``).

* Acceleration / temperature-rate MSE on **normalized** predictions
  (``train.py:255-256``).
* Momentum-conservation PINN loss: per graph, the squared norm of the total
  normalized-acceleration impulse ``sum_particles(a * dt)``, averaged over
  the batch, times a weight (``train.py:107-118`` — note it operates on
  normalized accelerations, replicated as-is).
* Combined: ``w_acc * L_acc + w_temp * L_temp + L_momentum``
  (``train.py:258-260``; default weights 1/1/0, ``config.py:34-36``).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def momentum_conservation_loss(
    accelerations: jnp.ndarray, dt, momentum_weight
) -> jnp.ndarray:
    """Per-graph momentum PINN penalty. ``accelerations`` is ``[N, 3]``
    (single graph) or ``[B, N, 3]`` (batch; mean over B, matching the
    reference's sum-over-graphs / num_graphs)."""
    velocity_changes = accelerations * dt
    total = jnp.sum(velocity_changes, axis=-2)  # [3] or [B, 3]
    per_graph = jnp.sum(total**2, axis=-1)
    return momentum_weight * jnp.mean(per_graph)


def combined_loss(
    predictions: Dict[str, jnp.ndarray],
    target_acceleration: jnp.ndarray,
    target_temp_rate: jnp.ndarray,
    dt,
    *,
    acc_weight=1.0,
    temp_rate_weight=1.0,
    momentum_weight=0.0,
):
    """Returns ``(total, components)`` where components has the per-term
    (unweighted for acc/temp, weighted for momentum — as logged by the
    reference) scalar losses."""
    acc_loss = jnp.mean(
        (predictions["acceleration"] - target_acceleration) ** 2
    )
    temp_rate_loss = jnp.mean((predictions["temp_rate"] - target_temp_rate) ** 2)
    momentum_loss = momentum_conservation_loss(
        predictions["acceleration"], dt, momentum_weight
    )
    total = acc_weight * acc_loss + temp_rate_weight * temp_rate_loss + momentum_loss
    return total, {
        "acceleration": acc_loss,
        "temp_rate": temp_rate_loss,
        "momentum": momentum_loss,
    }
