"""Device-mesh helpers.

The reference has **no** distributed support of any kind (SURVEY.md §2: NCCL
installed but never imported, single-process single-device training). This
module is the TPU-native "communication backend": a thin abstraction over
``jax.sharding.Mesh`` + XLA collectives riding ICI. Axis conventions:

* ``data``    — batch (sample) data parallelism;
* ``particle``— spatial/graph parallelism: particles sharded over devices,
                the GNN analog of sequence/context parallelism.

PP/EP/TP-over-latent have no counterpart in this workload (no pipeline-depth
imbalance at 10 MP steps, no experts, latent <= 256); they are deliberately
N/A rather than silently missing — see SURVEY.md §2 "Parallelism" row.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "particle"),
    devices=None,
) -> Mesh:
    """Create a mesh over the visible devices.

    Default: all devices on the ``data`` axis, ``particle`` axis size 1.
    Pass e.g. ``axis_sizes=(1, 8)`` for pure particle (spatial) sharding, or
    ``(2, 4)`` for 2-way data x 4-way particle hybrid.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(
            f"axis_sizes {tuple(axis_sizes)} must multiply to device count {n}"
        )
    dev_array = np.array(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)
