from cosmology_gnn_simulation_tpu.parallel.mesh import (
    make_mesh,
    device_count,
)
from cosmology_gnn_simulation_tpu.parallel.sharded import (
    make_data_parallel_train_step,
    make_particle_sharded_forward,
)

__all__ = [
    "make_mesh",
    "device_count",
    "make_data_parallel_train_step",
    "make_particle_sharded_forward",
]
