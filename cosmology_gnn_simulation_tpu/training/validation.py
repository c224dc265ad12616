"""Standalone validation API — parity with the reference's ``validation.py``
(``/root/reference/validation.py:18-90``): average combined + per-component
losses over a dataset, with noise forced to zero.

(The training loop uses the same jitted eval step via ``Trainer.evaluate``;
this module is the direct functional equivalent of ``validate(...)`` for
users who drive it themselves.)
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from cosmology_gnn_simulation_tpu.models.encode_process_decode import (
    EncodeProcessDecodeConfig,
)
from cosmology_gnn_simulation_tpu.training.trainer import (
    TrainConfig,
    make_eval_step,
)
from cosmology_gnn_simulation_tpu.types import NormalizationStats


def validate(
    params,
    dataset,
    model_config: EncodeProcessDecodeConfig,
    stats: NormalizationStats,
    *,
    batch_size: int = 1,
    num_neighbors: int = 16,
    acc_loss_weight: float = 1.0,
    temp_rate_loss_weight: float = 1.0,
    momentum_loss_weight: float = 0.0,
    compute_dtype=None,
) -> Tuple[float, Dict[str, float]]:
    """Returns ``(avg_combined_loss, component_losses)`` like the reference's
    ``validate`` (noise_std = 0, no augmentation, no gradients)."""
    tc = TrainConfig(
        num_neighbors=num_neighbors,
        batch_size=batch_size,
        acc_loss_weight=acc_loss_weight,
        temp_rate_loss_weight=temp_rate_loss_weight,
        momentum_loss_weight=momentum_loss_weight,
        compute_dtype=compute_dtype,
    )
    eval_step = make_eval_step(model_config, stats, tc)
    metrics = []
    for batch in dataset.batches(batch_size, shuffle=False):
        metrics.append(eval_step(params, batch))
    if not metrics:
        # Same contract as Trainer.evaluate: an empty validation set is a
        # configuration error, not an infinite loss.
        raise ValueError(
            f"Validation produced zero batches: dataset has "
            f"{len(dataset)} windows, batch_size={batch_size}."
        )
    avg = {
        key: float(np.mean([np.asarray(m[key]) for m in metrics]))
        for key in metrics[0]
    }
    return avg["loss"], {
        "acceleration": avg["acceleration"],
        "temp_rate": avg["temp_rate"],
        "momentum": avg["momentum"],
    }
