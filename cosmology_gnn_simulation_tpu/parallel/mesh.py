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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-process (multi-host / multi-slice) JAX.

    Call once at program start on every host before any device query. With
    no arguments, relies on the cluster environment (TPU pod metadata /
    ``JAX_COORDINATOR_ADDRESS`` etc. — ``jax.distributed.initialize``'s
    auto-detection). Returns True if a multi-process runtime was set up,
    False when running single-process (no coordinator configured): the
    single-host path stays dependency-free.

    The reference has no distributed story at all (SURVEY.md §2: NCCL
    installed, never imported); this plus the DCN-aware ``make_mesh`` below
    is its TPU-native replacement.
    """
    configured = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not configured:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def hybrid_device_order(
    devices: Sequence,
    axis_sizes: Sequence[int],
    data_axis: int = 0,
) -> np.ndarray:
    """Order devices into a mesh array so the *data* axis spans processes
    (DCN — gradient all-reduce tolerates the slower network) while every
    other axis (``particle`` halo exchange, latent collectives) stays within
    a process's devices (ICI).

    Pure layout logic over objects exposing ``.process_index`` — unit-
    testable with fakes on a single host (multi-process hardware is not
    available in this environment; see tests/test_mesh_layout.py).
    """
    devices = list(devices)
    n = len(devices)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(
            f"axis_sizes {tuple(axis_sizes)} must multiply to device count {n}"
        )
    procs = sorted({d.process_index for d in devices})
    per_proc = n // len(procs)
    by_proc = {p: [] for p in procs}
    for d in devices:
        by_proc[d.process_index].append(d)
    if any(len(v) != per_proc for v in by_proc.values()):
        raise ValueError("devices are not evenly distributed over processes")
    if axis_sizes[data_axis] % len(procs) != 0:
        raise ValueError(
            f"data axis size {axis_sizes[data_axis]} not divisible by "
            f"process count {len(procs)} — the data axis must span DCN"
        )
    inner_sizes = list(axis_sizes)
    inner_sizes[data_axis] //= len(procs)
    if int(np.prod(inner_sizes)) != per_proc:
        raise ValueError(
            f"per-process axis sizes {tuple(inner_sizes)} must multiply to "
            f"local device count {per_proc}"
        )
    # Outer (DCN) dimension first along the data axis, processes in index
    # order; within a process, devices are ordered by id (deterministic and
    # ICI-contiguous for standard TPU enumerations — callers needing a custom
    # within-process order should build the mesh array themselves).
    blocks = [
        np.array(sorted(by_proc[p], key=lambda d: d.id)).reshape(inner_sizes)
        for p in procs
    ]
    return np.concatenate(blocks, axis=data_axis)


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "particle"),
    devices=None,
) -> Mesh:
    """Create a mesh over the visible devices.

    Default: all devices on the ``data`` axis, ``particle`` axis size 1.
    Pass e.g. ``axis_sizes=(1, 8)`` for pure particle (spatial) sharding, or
    ``(2, 4)`` for 2-way data x 4-way particle hybrid.

    Multi-process (after ``initialize_distributed``): the data axis is laid
    out across processes (DCN) and the remaining axes across each process's
    local devices (ICI) — ``hybrid_device_order``. Single-process keeps the
    plain reshape (any axis order is ICI).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    num_procs = len({d.process_index for d in devices})
    if num_procs > 1:
        # The DCN (cross-process) axis is normally the data axis; for pure
        # spatial sharding (data axis 1, e.g. a config-5 rollout over more
        # slabs than one host's chips) the particle axis spans DCN instead —
        # halo ppermutes then ride the slower network, which the slab
        # decomposition tolerates (boundary-cells-only traffic).
        dcn_axis = list(axis_names).index("data")
        if axis_sizes[dcn_axis] % num_procs != 0:
            candidates = [
                i for i, s in enumerate(axis_sizes) if s % num_procs == 0
            ]
            if not candidates:
                raise ValueError(
                    f"no mesh axis in {tuple(axis_sizes)} is divisible by "
                    f"the process count {num_procs}"
                )
            dcn_axis = candidates[0]
        dev_array = hybrid_device_order(
            devices, axis_sizes, data_axis=dcn_axis
        )
    else:
        if int(np.prod(axis_sizes)) != n:
            raise ValueError(
                f"axis_sizes {tuple(axis_sizes)} must multiply to device "
                f"count {n}"
            )
        dev_array = np.array(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)
