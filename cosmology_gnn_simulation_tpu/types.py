"""Core pytree container types.

The reference packs graphs into ``torch_geometric.data.Data`` objects with a
ragged ``edge_index`` (``/root/reference/data_utils.py:217-227``). On TPU we
exploit the regularity of k-NN graphs (exactly ``k`` incoming edges per node,
self-loop included) and use dense static-shape arrays instead.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class ParticleGraph(NamedTuple):
    """A static-shape particle-interaction graph.

    Attributes:
      nodes:       ``[N, F]`` per-particle features (normalized velocity
                   history + normalized temperature history).
      neighbors:   ``[N, k]`` int32 — ``neighbors[i, j]`` is the particle index
                   of the j-th nearest neighbor of particle i (minimum-image
                   metric; ``neighbors[i, 0] == i``, the self-loop). Edge
                   (sender=neighbors[i, j], receiver=i) mirrors the reference's
                   ``edge_index`` (``data_utils.py:149-152``).
      edges:       ``[N, k, 4]`` per-edge features: raw displacement
                   ``pos[sender] - pos[receiver]`` (deliberately NOT
                   minimum-image, replicating ``data_utils.py:162``) plus its
                   Euclidean norm.
      positions:   ``[N, 3]`` most-recent (noised, wrapped) positions.
      target_acceleration: ``[N, 3]`` normalized target acceleration, or None
                   at inference (``data_utils.py:184-197``).
      target_temp_rate: ``[N, 1]`` normalized target temperature rate, or None
                   (``data_utils.py:208-214``).
      globals_:    optional ``[G]`` global feature vector, broadcast-
                   concatenated onto every node by the encoder (the
                   reference's ``globals`` pass-through,
                   ``graph_network.py:166-175`` — never populated by its
                   pipeline, supported for model-API parity).
      sorted_edges: optional sender-sorted edge stream
                   (``ops.aggregation.SortedEdges``) enabling the fast exact
                   scatter-free custom-VJP aggregation during training — see
                   ``ops/aggregation.py``.
      cellblock:   optional per-graph cell-block plan
                   (``ops.cellblock.CellBlockGraph``). When set, the graph's
                   particle rows are in CELL-SORTED order and the pruned
                   sender-latents aggregation runs as selection-matrix
                   matmuls on the MXU (``ops/cellblock.py``) — the big-N
                   path where HBM row gathers are latency-bound.
    """

    nodes: jnp.ndarray
    neighbors: jnp.ndarray
    edges: jnp.ndarray
    positions: jnp.ndarray
    target_acceleration: Optional[jnp.ndarray] = None
    target_temp_rate: Optional[jnp.ndarray] = None
    globals_: Optional[jnp.ndarray] = None
    sorted_edges: Optional["jnp.ndarray"] = None
    cellblock: Optional["jnp.ndarray"] = None

    @property
    def num_particles(self) -> int:
        return self.nodes.shape[0]

    @property
    def num_neighbors(self) -> int:
        return self.neighbors.shape[1]


class NormalizationStats(NamedTuple):
    """Normalization statistics (the ``metadata.json`` schema of
    ``/root/reference/generate_metadata.py:32-43``), as JAX-ready arrays.

    ``temp_*`` stats may be scalars or per-feature vectors (the reference
    stores whatever ``np.mean(..., axis=(0, 1)).tolist()`` yields);
    ``vel_*`` / ``acc_*`` are collapsed to scalars
    (``generate_metadata.py:22-30``).
    """

    temp_mean: jnp.ndarray
    temp_std: jnp.ndarray
    temp_rate_mean: jnp.ndarray
    temp_rate_std: jnp.ndarray
    vel_mean: jnp.ndarray
    vel_std: jnp.ndarray
    acc_mean: jnp.ndarray
    acc_std: jnp.ndarray
    box_size: float
    dt: float

    @classmethod
    def from_metadata(cls, metadata: dict) -> "NormalizationStats":
        """Build from a parsed ``metadata.json`` dict."""

        def arr(x):
            return jnp.asarray(np.asarray(x, dtype=np.float32))

        return cls(
            temp_mean=arr(metadata["temp_mean"]),
            temp_std=arr(metadata["temp_std"]),
            temp_rate_mean=arr(metadata["temp_rate_mean"]),
            temp_rate_std=arr(metadata["temp_rate_std"]),
            vel_mean=arr(metadata["vel_mean"]),
            vel_std=arr(metadata["vel_std"]),
            acc_mean=arr(metadata["acc_mean"]),
            acc_std=arr(metadata["acc_std"]),
            box_size=float(
                metadata["box_size"][0]
                if isinstance(metadata["box_size"], (list, tuple))
                else metadata["box_size"]
            ),
            dt=float(metadata["dt"]),
        )
