from cosmology_gnn_simulation_tpu.data.hdf5 import (
    FIELD_NAMES,
    read_simulation,
    write_simulation,
)
from cosmology_gnn_simulation_tpu.data.dataset import SequenceDataset
from cosmology_gnn_simulation_tpu.data.synthetic import generate_synthetic_simulation

__all__ = [
    "FIELD_NAMES",
    "read_simulation",
    "write_simulation",
    "SequenceDataset",
    "generate_synthetic_simulation",
]
