"""TPU-native learned cosmological particle simulator.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
PyTorch-Geometric reference ``mattpan-peregrinus/Cosmology_GNN_Simulation``:
a GNS-style learned simulator ("Learning to Simulate", arXiv:2002.09405)
predicting per-particle 3-D acceleration and internal-energy (temperature)
rate for SPH particles in a periodic box.

Design highlights (TPU-first, not a port):

* The k-NN graph over the periodic box is **regular**: every particle has
  exactly ``k`` neighbors (self-loop included, matching the reference's
  effective neighbor set — see ``/root/reference/data_utils.py:147-152``).
  We therefore represent the graph as a dense ``[N, k]`` neighbor-index
  array. Message aggregation becomes a gather + sum over the ``k`` axis —
  no scatter ops at all, static shapes, MXU-friendly.
* Neighbor search runs **on device inside jit**: minimum-image distance
  arithmetic replaces the reference's 27x host-side ghost-copy trick
  (``data_utils.py:9-33``).
* The full rollout (re-neighboring, M message-passing steps,
  un-normalization, semi-implicit Euler integration, periodic wrap) runs
  inside a single ``jax.lax.scan`` — zero host/device round-trips per step,
  vs. two per step in the reference (``render_rollout.py:39-85``).
* Multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map``: data
  parallelism over sample batches and particle-dimension sharding with XLA
  collectives over ICI.
"""

__version__ = "0.1.0"

from cosmology_gnn_simulation_tpu.types import ParticleGraph, NormalizationStats

__all__ = ["ParticleGraph", "NormalizationStats", "__version__"]
