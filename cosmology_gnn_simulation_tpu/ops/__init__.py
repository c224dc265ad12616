from cosmology_gnn_simulation_tpu.ops.periodic import (
    min_image_displacement,
    periodic_displacement,
    wrap_positions,
)
from cosmology_gnn_simulation_tpu.ops.noise import (
    random_walk_position_noise,
    random_walk_temperature_noise,
)
from cosmology_gnn_simulation_tpu.ops.neighbors import knn_periodic

__all__ = [
    "min_image_displacement",
    "periodic_displacement",
    "wrap_positions",
    "random_walk_position_noise",
    "random_walk_temperature_noise",
    "knn_periodic",
]
